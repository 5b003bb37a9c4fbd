package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** DISTRIBUTED METADATA PLANNING (Delta's state-reconstruction-as-a-
  * Spark-job posture): `planFilesDistributed` prunes checkpoint parts
  * on EXECUTORS and applies the manifest tail as a broadcast delta —
  * the driver receives only survivors. The contract pinned here:
  * byte-identical answers to the driver path (`pruneFiles`) across
  * body formats and a hostile tail (update, remove,
  * remove-then-re-add, fresh adds after the checkpoint), the same
  * total-active count, and the same opt-in routing through the table
  * property.
  */
class DistributedPlanSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"lldp-$name").toString + "/t"

  /** 12 single-file key-banded commits (checkpoint at v10), then a
    * hostile tail ON TOP of the checkpoint: an update-in-place
    * (overwriting append is not a thing — use MoR delete + re-append),
    * a remove via COW delete, and fresh adds. */
  private def build(format: String, partSize: String): String = {
    val dir = tmp(format)
    LogLake.createEmpty(dir, Seq((1L, "x")).toDF("k", "v").schema)
    LogLake.setTableProperties(dir, Map(
      "loglake.checkpoint.format" -> format,
      "loglake.checkpoint.partSizeFiles" -> partSize))
    (0 until 12).foreach(i =>
      LogLake.append(spark, dir,
        Seq((i * 100L, s"a$i"), (i * 100L + 50L, s"b$i")).toDF("k", "v")
          .repartition(1)))
    // tail beyond the v10+ checkpoint: a COW delete rewrites one
    // checkpointed file (update), drops another outright (remove), a
    // MoR delete attaches a DV, and two fresh appends add new paths
    LogLake.delete(spark, dir, col("k") === 150L)          // rewrite file
    LogLake.delete(spark, dir, col("k").between(200L, 299L)) // drop file
    LogLake.delete(spark, dir, col("k") === 450L, mor = true) // DV update
    LogLake.append(spark, dir, Seq((2000L, "t1")).toDF("k", "v"))
    LogLake.append(spark, dir, Seq((2100L, "t2")).toDF("k", "v"))
    dir
  }

  private def check(dir: String): Unit = {
    LogLake.clearSnapshotCache() // force the cold, job-backed path
    for ((lo, hi) <- Seq((null, null), (100L, 199L), (400L, 500L),
        (2000L, 2100L), (5000L, 9000L))) {
      val (dKept, dTotal) =
        LogLake.pruneFilesDistributed(spark, dir, "k", lo, hi)
      LogLake.clearSnapshotCache()
      val (kept, total) = LogLake.pruneFiles(dir, "k", lo, hi)
      assert(dTotal == total.toLong, s"[$lo,$hi] total $dTotal != $total")
      assert(dKept.map(_.path).sorted == kept.map(_.path).sorted,
        s"[$lo,$hi] kept sets differ")
      // the survivors carry the TAIL's view of updated files (DVs,
      // rewritten stats), not the checkpoint's stale entries
      assert(dKept.toSet == kept.toSet, s"[$lo,$hi] AddFile fields differ")
      LogLake.clearSnapshotCache()
    }
  }

  test("distributed prune == driver prune across a hostile tail (json parts)") {
    check(build("json", "3"))
  }

  test("distributed prune == driver prune (parquet parts)") {
    check(build("parquet", "3"))
  }

  test("distributed prune == driver prune (single-file checkpoint)") {
    check(build("parquet", "1000000"))
  }

  test("pruneFiles routes through the job under loglake.planning.distributed") {
    val dir = build("parquet", "3")
    LogLake.setTableProperties(dir,
      Map("loglake.planning.distributed" -> "true"))
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    val (kept, total) = LogLake.pruneFiles(dir, "k", 100L, 199L)
    // the routed path never resolves a snapshot — the assemble counter
    // must not move (the driver path would bump it)
    assert(LogLake.snapshotAssembles.get() == before,
      "distributed routing must not materialize the snapshot")
    LogLake.clearSnapshotCache()
    LogLake.setTableProperties(dir,
      Map("loglake.planning.distributed" -> "false"))
    val (kept2, total2) = LogLake.pruneFiles(dir, "k", 100L, 199L)
    assert(kept.map(_.path).sorted == kept2.map(_.path).sorted &&
      total == total2)
  }

  test("planFilesDistributed applies arbitrary predicates and the feature gate") {
    val dir = build("parquet", "3")
    LogLake.clearSnapshotCache()
    val (dvFiles, total) =
      LogLake.planFilesDistributed(spark, dir)(_.dv.nonEmpty)
    assert(dvFiles.size == 1 && total > 10,
      s"expected exactly the MoR file, got ${dvFiles.size} of $total")
  }
}
