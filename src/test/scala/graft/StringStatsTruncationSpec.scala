package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** STRING STATS TRUNCATION (Delta's 32-char rule): stored string
  * min/max are capped at a 32-code-point prefix with a distinct tag
  * ([[LogLake.StringTruncTag]]), so a long-text corpus table's
  * manifest stays metadata-sized instead of copying each file's two
  * extreme DOCUMENTS. Both stats consumers stay sound: file skipping
  * treats the truncated min as a lower bound and the prefix-
  * incremented max as a strict upper bound (keep-on-uncertainty); the
  * metadata-only MIN/MAX rewrite REFUSES the tag and falls back to
  * the scan — never a truncated answer. */
class StringStatsTruncationSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"strunc-$name").toString + "/t"

  private def isLocal(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case _: LocalRelation => () }.nonEmpty

  private def textStats(dir: String): Seq[LogLake.ColStats] =
    LogLake.pruneFiles(dir, "text", null, null)._1
      .flatMap(_.stats.get("text"))

  test("multi-KB text column stores bounded stats; manifest stays metadata-sized") {
    val dir = tmp("bounded")
    // 40 docs of ~10 KB each — untruncated stats would copy ~20 KB of
    // document text into EVERY file's manifest entry
    val docs = (1 to 40).map(i =>
      (i.toLong, s"doc-$i " + ("lorem ipsum dolor sit amet " * 400)))
      .toDF("id", "text")
    LogLake.create(spark, dir, docs.repartition(4))
    val stats = textStats(dir)
    assert(stats.nonEmpty)
    stats.foreach { s =>
      assert(s.tpe == LogLake.StringTruncTag, s"expected truncated tag, got $s")
      assert(s.min.codePointCount(0, s.min.length) <= 32, s"min too long: ${s.min}")
      assert(s.max.codePointCount(0, s.max.length) <= 32, s"max too long: ${s.max}")
    }
    // the whole log (manifest + any checkpoint) stays small
    val logDir = new java.io.File(dir, "_loglake")
    val logBytes = logDir.listFiles().filter(_.isFile).map(_.length()).sum
    assert(logBytes < 64 * 1024,
      s"log grew to $logBytes bytes — stats are copying document text")
  }

  test("short strings keep exact stats and the exact tag") {
    val dir = tmp("exact")
    LogLake.create(spark, dir,
      Seq((1L, "alpha"), (2L, "omega")).toDF("id", "text").repartition(1))
    val Seq(s) = textStats(dir)
    assert(s.tpe == "string" && s.min == "alpha" && s.max == "omega")
  }

  test("skipping stays sound on an adversarial shared-prefix corpus") {
    val dir = tmp("prefix")
    val shared = "P" * 32 // identical first 32 cps across ALL docs
    // file A: shared+aaa…, file B: shared+zzz… — indistinguishable
    // after truncation; both must be KEPT for any probe under the
    // shared prefix (conservative), and the row must still be found
    val a = (1 to 20).map(i => (i.toLong, shared + f"aaa$i%04d" + "x" * 100))
    val b = (1 to 20).map(i => (100L + i, shared + f"zzz$i%04d" + "y" * 100))
    LogLake.create(spark, dir, a.toDF("id", "text").repartition(1))
    LogLake.append(spark, dir, b.toDF("id", "text").repartition(1))
    // exact needle inside file A, beyond the truncation horizon
    val needle = shared + "aaa0007" + "x" * 100
    val hit = spark.read.format("loglake").load(dir)
      .filter($"text" === needle)
    assert(hit.count() == 1L, "truncated stats must never prune the match")
    // both files survive the needle's range (shared prefix ⇒ can't split)
    val (keptN, total) = LogLake.pruneFiles(dir, "text", needle, needle)
    assert(total == 2 && keptN.size == 2)
    // a probe clearly BELOW the shared prefix prunes everything
    val (keptLow, _) = LogLake.pruneFiles(dir, "text", "A", "B")
    assert(keptLow.isEmpty, "out-of-range probe must prune both files")
    // any probe UNDER the shared prefix keeps both — files sharing
    // their first 32 cps are indistinguishable by design
    val (keptIn, _) = LogLake.pruneFiles(dir, "text", shared + "b", null)
    assert(keptIn.size == 2, "shared-prefix files cannot be split")
  }

  test("distinct-prefix long strings still prune under truncated stats") {
    val dir = tmp("split")
    val a = (1 to 20).map(i => (i.toLong, "a" * 40 + f"$i%04d"))
    val b = (1 to 20).map(i => (100L + i, "z" * 40 + f"$i%04d"))
    LogLake.create(spark, dir, a.toDF("id", "text").repartition(1))
    LogLake.append(spark, dir, b.toDF("id", "text").repartition(1))
    // probe between the prefixes: prunes A (max bound a*31+b), keeps B
    val (kept, total) = LogLake.pruneFiles(dir, "text", "m", null)
    assert(total == 2 && kept.size == 1,
      s"expected only the z-file kept, got ${kept.size}")
    // needle inside B beyond the truncation horizon still found
    assert(spark.read.format("loglake").load(dir)
      .filter($"text" === ("z" * 40 + "0013")).count() == 1L)
  }

  test("metadata-only MIN/MAX refuses truncated stats; COUNT(col) still collapses") {
    val dir = tmp("refuse")
    val docs = (1 to 30).map(i =>
      (i.toLong, if (i % 5 == 0) null else "Z" * 40 + f"$i%04d"))
      .toDF("id", "text")
    LogLake.create(spark, dir, docs)
    assert(textStats(dir).forall(_.tpe == LogLake.StringTruncTag))
    // MIN/MAX must fall back to the scan AND return full-length values
    val mm = spark.read.format("loglake").load(dir)
      .groupBy().agg(min("text").as("mn"), max("text").as("mx"))
    assert(!isLocal(mm),
      s"truncated stats must refuse the metadata-only rewrite:\n${mm.queryExecution.optimizedPlan}")
    val r = mm.head()
    assert(r.getString(0) == "Z" * 40 + "0001" && r.getString(1) == "Z" * 40 + "0029")
    // null counts stay exact under truncation: COUNT(col) collapses
    val cnt = spark.read.format("loglake").load(dir)
      .groupBy().agg(count(col("text")).as("nn"), count(lit(1)).as("cnt"))
    assert(isLocal(cnt),
      s"COUNT over a truncated column must stay metadata-only:\n${cnt.queryExecution.optimizedPlan}")
    assert(cnt.as[(Long, Long)].head() == ((24L, 30L)))
  }

  test("surrogate pairs never split at the truncation boundary") {
    val dir = tmp("surrogate")
    // 31 BMP chars, then an astral char (2 UTF-16 units) straddling
    // the 32-cp boundary, then tail — the cut must land on a code
    // point boundary, not mid-pair
    val doc = "s" * 31 + new String(Character.toChars(0x1F600)) + "tail" * 20
    LogLake.create(spark, dir, Seq((1L, doc)).toDF("id", "text"))
    val Seq(s) = textStats(dir)
    assert(s.tpe == LogLake.StringTruncTag)
    Seq(s.min, s.max).foreach { v =>
      assert(!Character.isHighSurrogate(v.last),
        s"stored stat ends in an unpaired surrogate: ${v.codePointCount(0, v.length)} cps")
    }
    // and the bound still admits the row
    assert(spark.read.format("loglake").load(dir)
      .filter($"text" === doc).count() == 1L)
  }

  test("loglake.stats.stringPrefixLength: 0 disables truncation, custom length honored") {
    val dirOff = tmp("off")
    LogLake.createEmpty(dirOff,
      Seq((1L, "x")).toDF("id", "text").schema)
    LogLake.setTableProperties(dirOff,
      Map("loglake.stats.stringPrefixLength" -> "0"))
    val long = "exact " + "e" * 100
    LogLake.append(spark, dirOff, Seq((1L, long)).toDF("id", "text"))
    val Seq(sOff) = textStats(dirOff)
    assert(sOff.tpe == "string" && sOff.min == long,
      "prefixLength 0 must store exact stats")
    // custom cap of 8 code points
    val dir8 = tmp("cap8")
    LogLake.createEmpty(dir8, Seq((1L, "x")).toDF("id", "text").schema)
    LogLake.setTableProperties(dir8,
      Map("loglake.stats.stringPrefixLength" -> "8"))
    LogLake.append(spark, dir8, Seq((1L, "abcdefghij-tail")).toDF("id", "text"))
    val Seq(s8) = textStats(dir8)
    assert(s8.tpe == LogLake.StringTruncTag)
    assert(s8.min == "abcdefgh" && s8.max == "abcdefgi",
      s"8-cp truncation with prefix-incremented max, got $s8")
  }

  test("CONVERT collects truncated stats too") {
    val base = Files.createTempDirectory("strunc-convert").toString + "/t"
    val docs = (1 to 10).map(i => (i.toLong, "c" * 50 + i)).toDF("id", "text")
    docs.repartition(1).write.parquet(base)
    LogLake.convert(spark, base, statsCols = Seq("text"))
    val stats = textStats(base)
    assert(stats.nonEmpty && stats.forall(s =>
      s.tpe == LogLake.StringTruncTag &&
        s.max.codePointCount(0, s.max.length) <= 32))
    // the adversarial read still finds its row
    assert(spark.read.format("loglake").load(base)
      .filter($"text" === ("c" * 50 + "7")).count() == 1L)
  }
}
