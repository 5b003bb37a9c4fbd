package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Adversarial-corpus fixture (VERDICT r4 #5): a degenerate variant of
  * the harness tables engineered to hit every edge class that has ever
  * produced a latent divergence — empty and whitespace-only documents,
  * sub-shingle-width documents, exact duplicates, ONE giant near-dup
  * cluster (40 members sharing a base text), singleton documents, a
  * pathological repeated-token document, a payload that starts with a
  * container magic number, NULL group keys (lang/source/label), a
  * one-row group, a zero-norm embedding, and exact embedding ties.
  *
  * The TPC-H-ish tables and `events` are copied byte-for-byte (events
  * carries TIMESTAMP(NANOS), which Spark can read but not write);
  * `documents` and `embeddings` — the corpus the LLM-pipeline operators
  * run on — are replaced. Written as single parquet FILES so both
  * Spark and the DuckDB oracle read the fixture identically:
  *
  * ```
  * sbt "runMain graft.tools.DegenFixture /root/testdata/sf0.001 /tmp/degen"
  * sbt "runMain graft.Verify /tmp/degen /tmp/verify_degen"
  * python3 tools/check.py /tmp/degen /tmp/verify_degen
  * ```
  *
  * DegenerateCorpusSpec drives the full registry over this fixture
  * in-suite (crash-free + run-to-run determinism); the DuckDB gate
  * above is the cross-engine half, run per round.
  */
object DegenFixture {

  private val CopyTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events")

  // deterministic filler vocabulary for singleton/long docs — plain
  // arithmetic over the id, no RNG (the fixture must be reproducible)
  private val Words = Vector("data", "pipeline", "quality", "signal", "filter",
    "token", "corpus", "sample", "metric", "shard", "batch", "stream", "vector",
    "index", "query", "joins", "merge", "windowed", "order", "bucket")

  private def synthText(seed: Long, n: Int): String =
    (0 until n).map(i => Words(((seed * 31 + i * 17) % Words.size).toInt.abs))
      .mkString(" ")

  /** Exactly 32 code points — the string-stats truncation horizon. */
  private val TruncPrefix32 = "shared-prefix-0123456789-abcdef!"

  def build(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    CopyTables.foreach { t =>
      Files.copy(Paths.get(s"$srcDir/$t.parquet"), Paths.get(s"$outDir/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    writeSingleFile(spark, documentsDf(spark), s"$outDir/documents.parquet")
    writeSingleFile(spark, embeddingsDf(spark), s"$outDir/embeddings.parquet")
  }

  private def documentsDf(spark: SparkSession) = {
    val base = synthText(997L, 50) // shared by the giant near-dup cluster
    def doc(id: Long, text: String, lang: String = "en",
        source: String = "srcA"): Row =
      Row(id, text, lang, source, text.length.toLong)

    val rows: Seq[Row] =
      Seq(
        doc(1L, ""),                                   // empty
        doc(2L, "  \t  \n   "),                        // whitespace-only
        doc(3L, "solo"),                               // below shingle width
        doc(4L, "alpha beta", lang = "de"),            // 2 words < 3-gram
        doc(5L, "the quick brown fox jumps over the lazy dog again and again"),
        doc(6L, "the quick brown fox jumps over the lazy dog again and again"),
        doc(7L, Seq.fill(120)("spam").mkString(" ")),  // repeated single token
        doc(8L, "¿dónde está… the—em-dash; §§ 数据 管道 «quotes» !!!", lang = "zh"),
        doc(9L, "GIF89a pretender payload that is not an image at all"),
        Row(71L, synthText(71L, 24), null, null, synthText(71L, 24).length.toLong),
        doc(72L, synthText(72L, 30), lang = "ko", source = "srcSolo"), // one-row groups
        doc(70L, synthText(70L, 1500), lang = "fr"),   // very long doc
        // ids 73..79 (round 13): adversarial STRING-STATS-TRUNCATION
        // shapes — q147's bounded-stats table must stay skipping-sound
        // on hostile text, cross-engine. A ≥32-cp SHARED PREFIX whose
        // members differ only past the truncation horizon (their
        // truncated MIN/MAX collide; only the strunc-tag refusal keeps
        // metadata-only MIN/MAX honest), docs of exactly 32 and 33
        // code points (the boundary where truncation starts), a
        // surrogate PAIR straddling the horizon (truncation must not
        // split it), and U+D7FF / U+E000 boundary text (prefixIncrement
        // hops the surrogate gap exactly there).
        doc(73L, TruncPrefix32),
        doc(74L, TruncPrefix32 + "z"),
        doc(75L, TruncPrefix32 + "alpha beyond the truncation horizon"),
        doc(76L, TruncPrefix32 + "omega far past the stats boundary", lang = "pt"),
        doc(77L, "0123456789012345678901234567890" +
          "😀😀 surrogate pair at the horizon"),
        doc(78L, "0123456789012345678901234567890\uD7FF tail beyond the gap hop"),
        doc(79L, "0123456789012345678901234567890\uE000 just above the hop target",
          lang = "pt")
      ) ++
      // ids 10..49: the giant near-dup cluster — same base, tiny suffix
      (10L to 49L).map(i => doc(i, s"$base variant v$i",
        lang = if (i % 2 == 0) "en" else "es", source = s"src${i % 3}")) ++
      // ids 50..69: singletons, pairwise-dissimilar
      (50L to 69L).map(i => doc(i, synthText(i * 7919L, 40 + (i % 13).toInt),
        lang = Seq("en", "de", "fr", "es", "zh")((i % 5).toInt),
        source = s"src${i % 4}"))

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.sortBy(_.getLong(0))).asJava), schema)
  }

  private def embeddingsDf(spark: SparkSession) = {
    val dim = 64
    def synth(seed: Long): Array[Float] =
      Array.tabulate(dim)(j => (((seed * 31 + j * 17) % 97) - 48) / 48.0f)
    val unit = Array.tabulate(dim)(j => if (j == 0) 1.0f else 0.0f)

    val rows: Seq[Row] =
      Seq(
        Row(1L, Array.fill(dim)(0.0f).toSeq, Integer.valueOf(0)),   // zero norm
        Row(2L, unit.toSeq, Integer.valueOf(1)),                    // exact tie pair
        Row(3L, unit.toSeq, Integer.valueOf(1)),
        Row(4L, unit.map(_ * 2.0f).toSeq, Integer.valueOf(1)),      // same direction
        Row(5L, Array.fill(dim)(0.125f).toSeq, Integer.valueOf(2)),
        Row(6L, unit.map(-_).toSeq, Integer.valueOf(2)),            // antipode
        Row(7L, synth(7L).toSeq, null),                             // NULL label
        Row(8L, synth(8L).toSeq, Integer.valueOf(9))                // one-row label
      ) ++
      (9L to 40L).map(i => Row(i, synth(i).toSeq,
        Integer.valueOf((i % 6).toInt)))

    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
  }

  /** Write as ONE parquet FILE at `dest` (not a directory) so DuckDB's
    * `read_parquet('<dest>')` and Spark read the fixture identically. */
  private def writeSingleFile(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
    val tmp = Files.createTempDirectory("degen-stage").toString + "/d"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
    Files.move(part.toPath, Paths.get(dest), StandardCopyOption.REPLACE_EXISTING)
    new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "/tmp/degen"
    val spark = graft.Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    build(spark, src, out)
    println(s"[degen] fixture written to $out")
    spark.stop()
  }
}
