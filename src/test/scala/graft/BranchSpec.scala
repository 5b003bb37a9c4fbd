package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** WRITABLE BRANCHES (Iceberg branches / write-audit-publish):
  * [[LogLake.createBranch]] stages a fully writable head of the table;
  * every write API works against [[LogLake.branchDir]] unchanged and
  * stays invisible to main; [[LogLake.publishBranch]] lands the net
  * delta as one atomic main commit through the logical conflict rules
  * (append-only branches compose with anything; rewriting branches
  * rebase over blind appends and conflict loudly on overlap). Live
  * branches pin vacuum and metadata retention like tags. */
class BranchSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"llbranch-$name").toString + "/t"

  private def sample(from: Int, to: Int): DataFrame =
    (from to to).map(i => (i.toLong, s"v$i")).toDF("k", "v")

  private def readMain(dir: String): DataFrame =
    spark.read.format("loglake").load(dir)

  private def readBranch(dir: String, name: String): DataFrame =
    spark.read.format("loglake").load(LogLake.branchDir(dir, name))

  test("write-audit-publish: branch writes stay invisible, publish lands atomically") {
    val dir = tmp("wap")
    LogLake.create(spark, dir, sample(1, 50))
    val base = LogLake.createBranch(spark, dir, "staging")
    assert(base == 1L && LogLake.branches(dir) == Map("staging" -> 1L))
    // the branch reads the base snapshot without copying a byte
    assert(readBranch(dir, "staging").count() == 50)
    // WRITE to the branch through the ordinary API
    LogLake.append(spark, LogLake.branchDir(dir, "staging"), sample(51, 80))
    // AUDIT: branch sees staged rows, main does not
    assert(readBranch(dir, "staging").count() == 80)
    assert(readMain(dir).count() == 50, "main must not see unpublished rows")
    // PUBLISH: one atomic commit, branch retired
    val v = LogLake.publishBranch(spark, dir, "staging")
    assert(readMain(dir).count() == 80)
    assert(LogLake.branches(dir).isEmpty, "published branch must be dropped")
    assert(readMain(dir).agg(sum("k")).head().getLong(0) == (1 to 80).sum)
    // audit trail: a `branch` row at creation, a `publish` row whose
    // readVersion is the base (rebase distance = v - base - 1)
    val hist = LogLake.history(dir)
    assert(hist.exists(_.op == "branch"))
    val pub = hist.find(_.version == v).get
    assert(pub.op == "publish" && pub.readVersion == base)
  }

  test("append-only publish composes with main commits made meanwhile") {
    val dir = tmp("compose")
    LogLake.create(spark, dir, sample(1, 10))
    LogLake.createBranch(spark, dir, "ingest")
    LogLake.append(spark, LogLake.branchDir(dir, "ingest"), sample(11, 20))
    // main moves on while the branch is being audited — a DELETE even
    LogLake.append(spark, dir, sample(101, 110))
    LogLake.delete(spark, dir, $"k" <= 5L)
    val before = readMain(dir).count() // 5 + 10
    LogLake.publishBranch(spark, dir, "ingest")
    assert(readMain(dir).count() == before + 10,
      "blind publish must compose with interleaved main commits")
  }

  test("rewriting branch: rebases over blind appends, conflicts loudly on overlap") {
    val dir = tmp("rewrite")
    LogLake.create(spark, dir, sample(1, 100).repartition(4))
    LogLake.createBranch(spark, dir, "fix")
    // REWRITE on the branch (delete half)
    LogLake.delete(spark, LogLake.branchDir(dir, "fix"), $"k" % 2L === 0L)
    // main gets a blind append meanwhile — publish must rebase over it
    LogLake.append(spark, dir, sample(201, 210))
    val v = LogLake.publishBranch(spark, dir, "fix")
    assert(readMain(dir).count() == 50 + 10)
    val pub = LogLake.history(dir).find(_.version == v).get
    assert(pub.op == "publish_rewrite")
    // now a conflicting interleave: branch rewrites files that a main
    // DELETE also rewrites → loud snapshot conflict, nothing committed
    val dir2 = tmp("conflict")
    LogLake.create(spark, dir2, sample(1, 100).repartition(2))
    LogLake.createBranch(spark, dir2, "fix2")
    LogLake.delete(spark, LogLake.branchDir(dir2, "fix2"), $"k" <= 50L)
    LogLake.delete(spark, dir2, $"k" > 90L) // touches the same files
    val mainCount = readMain(dir2).count()
    val e = intercept[java.io.IOException] {
      LogLake.publishBranch(spark, dir2, "fix2")
    }
    assert(e.getMessage.contains("conflict"), e.getMessage)
    assert(readMain(dir2).count() == mainCount, "failed publish must change nothing")
    // the branch survives a failed publish, still readable
    assert(readBranch(dir2, "fix2").count() == 50)
  }

  test("merge-on-read branch delete publishes its deletion vector") {
    val dir = tmp("dv")
    LogLake.create(spark, dir, sample(1, 40).repartition(1))
    LogLake.createBranch(spark, dir, "mor")
    LogLake.delete(spark, LogLake.branchDir(dir, "mor"), $"k" <= 10L, mor = true)
    assert(readBranch(dir, "mor").count() == 30)
    LogLake.publishBranch(spark, dir, "mor")
    assert(readMain(dir).count() == 30,
      "published DV must mask the same rows on main")
  }

  test("vacuum keeps branch-referenced files; retention clamps to the branch base") {
    val dir = tmp("pin")
    LogLake.create(spark, dir, sample(1, 50))
    LogLake.createBranch(spark, dir, "hold")
    // main OVERWRITES — the original generation is only referenced by
    // the branch now
    LogLake.overwrite(spark, dir, sample(500, 520))
    val swept = LogLake.vacuum(dir, olderThanMs = -60000L)
    assert(swept.isEmpty, s"branch-referenced files must survive, swept: $swept")
    assert(readBranch(dir, "hold").count() == 50, "branch must read after vacuum")
    // retention: many commits + cleanup must keep the log at/below base
    (1 to 15).foreach(i => LogLake.append(spark, dir, sample(i, i)))
    LogLake.cleanupMetadata(dir, olderThanMs = -60000L)
    val vs = LogLake.history(dir).map(_.version)
    assert(vs.head <= 2L, s"log below the branch base must be retained, got ${vs.head}")
    // drop the branch: storage + log float free on the next pass
    LogLake.dropBranch(dir, "hold")
    assert(LogLake.vacuum(dir, olderThanMs = -60000L).nonEmpty,
      "dropped branch releases the pinned generation")
    LogLake.cleanupMetadata(dir, olderThanMs = -60000L)
    assert(LogLake.history(dir).map(_.version).head > 2L)
  }

  test("two branches publish concurrently: both land or conflict loudly, never corrupt") {
    val dir = tmp("race")
    LogLake.create(spark, dir, sample(1, 40).repartition(4))
    LogLake.createBranch(spark, dir, "ingestA")
    LogLake.createBranch(spark, dir, "ingestB")
    LogLake.append(spark, LogLake.branchDir(dir, "ingestA"), sample(101, 110))
    LogLake.append(spark, LogLake.branchDir(dir, "ingestB"), sample(201, 215))
    // both publishes race from separate threads — append-only, so BOTH
    // must land (blind appends compose); the commit CAS serializes them
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val futs = Seq("ingestA", "ingestB").map(b => pool.submit(
      new java.util.concurrent.Callable[Long] {
        override def call(): Long = LogLake.publishBranch(spark, dir, b)
      }))
    val versions = futs.map(_.get())
    pool.shutdown()
    assert(versions.toSet.size == 2, s"publishes must serialize, got $versions")
    assert(readMain(dir).count() == 40 + 10 + 15)
    assert(LogLake.branches(dir).isEmpty)
    assert(readMain(dir).agg(sum("k")).head().getLong(0) ==
      (1 to 40).sum + (101 to 110).sum.toLong + (201 to 215).sum)
  }

  test("a branch of a shallow clone references the ORIGINAL files, not a doubled path") {
    // regression: cloneShallow used to prefix `$base/` unconditionally,
    // so a clone-of-a-clone (or a branch of a clone — same substrate)
    // produced malformed double-absolute paths
    val src = tmp("orig"); val c1 = tmp("clone1"); val c2 = tmp("clone2")
    LogLake.create(spark, src, sample(1, 30))
    LogLake.cloneShallow(spark, src, c1)
    LogLake.cloneShallow(spark, c1, c2) // clone of a clone
    assert(spark.read.format("loglake").load(c2).count() == 30)
    LogLake.createBranch(spark, c1, "wip") // branch of a clone
    LogLake.append(spark, LogLake.branchDir(c1, "wip"), sample(31, 35))
    LogLake.publishBranch(spark, c1, "wip")
    assert(spark.read.format("loglake").load(c1).count() == 35)
    assert(spark.read.format("loglake").load(src).count() == 30)
  }

  test("concurrent same-name creates: exactly one wins, the rest fail loudly") {
    val dir = tmp("dupname")
    LogLake.create(spark, dir, sample(1, 10))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val results = (1 to 4).map(_ => pool.submit(
      new java.util.concurrent.Callable[Either[Throwable, Long]] {
        override def call(): Either[Throwable, Long] =
          try Right(LogLake.createBranch(spark, dir, "dup"))
          catch { case e: Throwable => Left(e) }
      })).map(_.get())
    pool.shutdown()
    val (failed, won) = results.partition(_.isLeft)
    def detail: String = results.map {
      case Right(v) => s"WON($v)"
      case Left(e) => s"${e.getClass.getSimpleName}: ${e.getMessage}"
    }.mkString("\n  ")
    assert(won.size == 1,
      s"exactly one concurrent create may win, got ${won.size}:\n  $detail")
    assert(failed.forall(_.left.exists(
      _.getMessage.contains("already exists"))), s"losers:\n  $detail")
    assert(LogLake.branches(dir) == Map("dup" -> 1L))
    assert(readBranch(dir, "dup").count() == 10, "the winner's clone is intact")
  }

  test("OPTIMIZE on a branch publishes as main compaction — rows identical, files consolidated") {
    val dir = tmp("optpub")
    LogLake.create(spark, dir, sample(1, 60).repartition(6)) // 6 small files
    val filesBefore = LogLake.pruneFiles(dir, "k", null, null)._2
    LogLake.createBranch(spark, dir, "maint")
    // compact ON THE BRANCH: removes the clone-inherited parent files,
    // adds branch-local consolidated ones
    LogLake.optimize(spark, LogLake.branchDir(dir, "maint"), 1)
    val v = LogLake.publishBranch(spark, dir, "maint")
    assert(LogLake.history(dir).find(_.version == v).exists(_.op == "publish_rewrite"))
    assert(readMain(dir).count() == 60)
    assert(readMain(dir).agg(sum("k")).head().getLong(0) == (1 to 60).sum)
    val filesAfter = LogLake.pruneFiles(dir, "k", null, null)._2
    assert(filesAfter < filesBefore,
      s"published compaction must consolidate: $filesBefore -> $filesAfter")
    // the retired small files reclaim once nothing pins them
    assert(LogLake.vacuum(dir, olderThanMs = -60000L).nonEmpty)
    assert(readMain(dir).count() == 60)
  }

  test("option(branch, name) addresses the branch head for read, write, and streaming") {
    val dir = tmp("opt")
    LogLake.create(spark, dir, sample(1, 10))
    LogLake.createBranch(spark, dir, "staging")
    // write THROUGH the option — no branchDir knowledge needed
    sample(11, 15).write.format("loglake").mode("append")
      .option("branch", "staging").save(dir)
    assert(spark.read.format("loglake").option("branch", "staging")
      .load(dir).count() == 15)
    assert(readMain(dir).count() == 10, "main stays isolated")
    // time travel composes: branch v1 is the clone snapshot
    assert(spark.read.format("loglake").option("branch", "staging")
      .option("versionAsOf", "1").load(dir).count() == 10)
    // an unknown branch is loud
    val e = intercept[IllegalArgumentException] {
      spark.read.format("loglake").option("branch", "ghost").load(dir)
    }
    assert(e.getMessage.contains("no branch 'ghost'"))
    LogLake.publishBranch(spark, dir, "staging")
    assert(readMain(dir).count() == 15)
  }

  test("branch DDL: CREATE/PUBLISH/DROP BRANCH + SHOW BRANCHES on a path target") {
    val dir = tmp("ddl")
    LogLake.create(spark, dir, sample(1, 20))
    spark.sql(s"ALTER TABLE '$dir' CREATE BRANCH staging")
    LogLake.append(spark, LogLake.branchDir(dir, "staging"), sample(21, 30))
    val shown = spark.sql(s"SHOW BRANCHES '$dir'").collect()
    assert(shown.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("staging", 1L)))
    assert(shown.head.getLong(2) == 2L, "branch head = clone + one append")
    assert(readMain(dir).count() == 20)
    val v = spark.sql(s"ALTER TABLE '$dir' PUBLISH BRANCH staging")
      .collect().head.getLong(0)
    assert(readMain(dir).count() == 30 && v == LogLake.currentVersion(dir))
    assert(spark.sql(s"SHOW BRANCHES '$dir'").count() == 0L)
    spark.sql(s"ALTER TABLE '$dir' CREATE BRANCH scrap AS OF VERSION 1")
    assert(spark.read.format("loglake")
      .load(LogLake.branchDir(dir, "scrap")).count() == 20)
    spark.sql(s"ALTER TABLE '$dir' DROP BRANCH scrap")
    assert(LogLake.branches(dir).isEmpty)
  }

  test("additive branch schema publishes: main gains the column, old files NULL-fill") {
    val dir = tmp("evolve")
    LogLake.create(spark, dir, sample(1, 10))
    LogLake.createBranch(spark, dir, "stage")
    // the branch's APPEND evolves the schema (new nullable column) —
    // the ordinary append-time evolution path, just on the branch head
    LogLake.append(spark, LogLake.branchDir(dir, "stage"),
      (11 to 15).map(i => (i.toLong, s"v$i", s"t$i")).toDF("k", "v", "tag"))
    assert(readMain(dir).columns.toSeq == Seq("k", "v"), "main not evolved yet")
    val v = LogLake.publishBranch(spark, dir, "stage")
    // schema evolution never publishes blind — it must validate
    assert(LogLake.history(dir).find(_.version == v)
      .exists(_.op == "publish_rewrite"))
    val main = readMain(dir)
    assert(main.columns.toSeq == Seq("k", "v", "tag"))
    assert(main.count() == 15)
    assert(main.filter($"k" <= 10L && $"tag".isNull).count() == 10,
      "old main files must NULL-fill the published column")
    assert(main.filter($"tag".isNotNull).count() == 5)
    // a schema-only branch change (ALTER ADD COLUMN, no data) publishes too
    LogLake.createBranch(spark, dir, "meta")
    LogLake.addColumn(LogLake.branchDir(dir, "meta"),
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.IntegerType))
    LogLake.publishBranch(spark, dir, "meta")
    assert(readMain(dir).columns.toSeq == Seq("k", "v", "tag", "extra"))
    assert(readMain(dir).filter($"extra".isNull).count() == 15)
  }

  test("additive publish under column mapping keeps the branch's physical name") {
    val dir = tmp("evolve-mapped")
    LogLake.create(spark, dir, sample(1, 8))
    LogLake.renameColumn(spark, dir, "v", "label") // activates mapping
    LogLake.createBranch(spark, dir, "stage")
    LogLake.append(spark, LogLake.branchDir(dir, "stage"),
      (9 to 12).map(i => (i.toLong, s"v$i", Option(i * 10L)))
        .toDF("k", "label", "score"))
    LogLake.publishBranch(spark, dir, "stage")
    val main = readMain(dir)
    assert(main.columns.toSeq == Seq("k", "label", "score"))
    // the branch files were written under the branch-assigned PHYSICAL
    // name; a regenerated one would read these rows back as NULL
    assert(main.filter($"score".isNotNull).count() == 4)
    assert(main.agg(sum("score")).head().getLong(0) == (9 to 12).map(_ * 10L).sum)
    assert(main.filter($"k" <= 8L && $"score".isNull).count() == 8)
  }

  test("publish refuses retype/drop divergence; dropBranch discards staged work") {
    val dir = tmp("guards")
    LogLake.create(spark, dir,
      (1 to 10).map(i => (i, s"v$i")).toDF("k", "v")) // k is INT here
    // retype on the branch (widen k int->long) must NOT publish
    LogLake.createBranch(spark, dir, "s")
    LogLake.widenColumn(spark, LogLake.branchDir(dir, "s"), "k",
      org.apache.spark.sql.types.LongType)
    val e = intercept[IllegalArgumentException] {
      LogLake.publishBranch(spark, dir, "s")
    }
    assert(e.getMessage.contains("changed column k"), e.getMessage)
    LogLake.dropBranch(dir, "s")
    assert(LogLake.branches(dir).isEmpty)
    assert(!new java.io.File(LogLake.branchDir(dir, "s")).exists)
    assert(readMain(dir).count() == 10)
    // a branch that DROPPED a main column must not publish either
    LogLake.createBranch(spark, dir, "d")
    LogLake.renameColumn(spark, LogLake.branchDir(dir, "d"), "v", "w")
    LogLake.dropColumn(spark, LogLake.branchDir(dir, "d"), "w")
    val e2 = intercept[IllegalArgumentException] {
      LogLake.publishBranch(spark, dir, "d")
    }
    assert(e2.getMessage.contains("missing main columns"), e2.getMessage)
    LogLake.dropBranch(dir, "d")
    // name rules + duplicates are refused
    intercept[IllegalArgumentException] { LogLake.createBranch(spark, dir, "bad name") }
    LogLake.createBranch(spark, dir, "b1")
    intercept[IllegalArgumentException] { LogLake.createBranch(spark, dir, "b1") }
  }
}
