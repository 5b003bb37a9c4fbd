package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** CHECKPOINT WRITE AS A JOB (the write-side twin of distributed
  * planning): with `loglake.planning.distributed = true` and a
  * previous parquet checkpoint, the next checkpoint derives from it
  * on executors — old parts re-read and re-sliced per task, the tail
  * applied as a broadcast delta, the driver writing only the
  * tail-adds part. Pinned here: the path really engages (counter),
  * the result resolves identically to a driver-written twin across a
  * hostile inter-checkpoint window (COW rewrite, MoR DV, idempotent
  * txn), and the header (txns/schema) survives the footer-derived
  * hand-off. */
class DistributedCheckpointSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"lldc-$name").toString + "/t"

  /** createEmpty(v1) + 12 appends (v2..v13, checkpoint at v10) + COW
    * delete (v14) + MoR delete (v15) + txn append (v16) + 4 appends
    * (v17..v20 → checkpoint at v20). */
  private def build(distributed: Boolean): String = {
    val dir = tmp(if (distributed) "dist" else "drv")
    LogLake.createEmpty(dir, Seq((1L, "x")).toDF("k", "v").schema)
    LogLake.setTableProperties(dir, Map(
      "loglake.checkpoint.format" -> "parquet",
      "loglake.checkpoint.partSizeFiles" -> "4",
      "loglake.planning.distributed" -> distributed.toString))
    (0 until 12).foreach(i =>
      LogLake.append(spark, dir,
        Seq((i * 100L, s"a$i"), (i * 100L + 50L, s"b$i")).toDF("k", "v")
          .repartition(1)))
    LogLake.delete(spark, dir, col("k") === 150L)            // COW rewrite
    LogLake.delete(spark, dir, col("k") === 450L, mor = true) // DV
    LogLake.append(spark, dir, Seq((3000L, "t")).toDF("k", "v"),
      txnId = "job-dc:epoch-1")
    (0 until 4).foreach(i =>
      LogLake.append(spark, dir, Seq((4000L + i, s"z$i")).toDF("k", "v")
        .repartition(1)))
    dir
  }

  test("the v20 checkpoint writes on executors and resolves exactly") {
    val before = LogLake.distributedCheckpointWrites.get()
    val dir = build(distributed = true)
    assert(LogLake.distributedCheckpointWrites.get() > before,
      "the distributed checkpoint writer must have engaged at v20")
    val parts = new java.io.File(dir, "_loglake").listFiles()
      .filter(_.getName.matches("""chk-0*20\.p\d+-of-\d+\.parquet"""))
    assert(parts.length >= 2, s"expected a v20 parquet group, got " +
      new java.io.File(dir, "_loglake").listFiles().map(_.getName)
        .filter(_.startsWith("chk-")).mkString(","))
    // cold resolve THROUGH the distributed-written group
    // (27 rows: 24 appended + 1 txn + 4 z − COW k=150 − DV k=450)
    LogLake.clearSnapshotCache()
    val df = spark.read.format("loglake").load(dir)
    assert(df.count() == 27L)
    assert(df.filter(col("k") === 150L || col("k") === 450L).count() == 0L)
    // txn map rode the footer-derived header: a replayed epoch no-ops
    LogLake.clearSnapshotCache()
    LogLake.append(spark, dir, Seq((3000L, "t")).toDF("k", "v"),
      txnId = "job-dc:epoch-1")
    LogLake.clearSnapshotCache()
    assert(spark.read.format("loglake").load(dir).count() == 27L,
      "a replayed txn after a cold resolve through the distributed " +
        "checkpoint must no-op")
  }

  test("distributed-written and driver-written checkpoints resolve identically") {
    val (dd, jd) = (build(distributed = true), build(distributed = false))
    LogLake.clearSnapshotCache()
    def rows(dir: String) = spark.read.format("loglake").load(dir)
      .orderBy("k", "v").collect().toSeq
    assert(rows(dd) == rows(jd))
    // and time travel through both v20 groups agrees
    def at15(dir: String) = spark.read.format("loglake")
      .option("versionAsOf", "15").load(dir).orderBy("k", "v").collect().toSeq
    assert(at15(dd) == at15(jd))
  }

  test("generation 1 bootstraps from the manifest log as a job") {
    // NO previous checkpoint exists at v10 — the bootstrap path must
    // engage (counter), and the group must replay resolve's exact
    // semantics: a COW delete (removed paths gone), a RESTORE (the
    // removed path RE-ADDED — re-insertion ordering), in-window
    // updates, and an idempotent txn in the header
    val before = LogLake.distributedCheckpointWrites.get()
    val dir = tmp("boot")
    LogLake.createEmpty(dir, Seq((1L, "x")).toDF("k", "v").schema)
    LogLake.setTableProperties(dir, Map(
      "loglake.checkpoint.format" -> "parquet",
      "loglake.checkpoint.partSizeFiles" -> "4",
      // force the bootstrap JOB at toy scale (auto-select would route
      // this fixture to the driver replay)
      "loglake.checkpoint.bootstrapJobMinManifestBytes" -> "0",
      "loglake.planning.distributed" -> "true"))
    (0 until 5).foreach(i =>
      LogLake.append(spark, dir,
        Seq((i * 100L, s"a$i"), (i * 100L + 50L, s"b$i")).toDF("k", "v")
          .repartition(1)))                                  // v2..v6
    LogLake.delete(spark, dir, col("k") === 200L)            // v7: COW
    LogLake.restore(spark, dir, 6L)                          // v8: re-adds v7's removed path
    LogLake.append(spark, dir, Seq((900L, "t")).toDF("k", "v"),
      txnId = "job-boot:epoch-1")                            // v9
    LogLake.append(spark, dir, Seq((950L, "z")).toDF("k", "v")) // v10 → checkpoint
    assert(LogLake.distributedCheckpointWrites.get() == before + 1,
      "generation 1 must bootstrap as a job")
    val chk = new java.io.File(dir, "_loglake").listFiles()
      .map(_.getName).filter(n => n.startsWith("chk-") && n.contains("10"))
    assert(chk.nonEmpty, "a v10 checkpoint group must exist")
    // cold resolve THROUGH the bootstrapped group
    LogLake.clearSnapshotCache()
    val df = spark.read.format("loglake").load(dir)
    assert(df.count() == 12L) // 10 appended + t + z; restore undid the delete
    assert(df.filter(col("k") === 200L).count() == 1L,
      "the restored (re-added) file must be live through the bootstrap group")
    // the txn map rode the header: a replayed epoch no-ops
    LogLake.append(spark, dir, Seq((900L, "t")).toDF("k", "v"),
      txnId = "job-boot:epoch-1")
    LogLake.clearSnapshotCache()
    assert(spark.read.format("loglake").load(dir).count() == 12L)
    // generation 2 derives FROM the bootstrapped group on executors
    (0 until 10).foreach(i =>
      LogLake.append(spark, dir, Seq((5000L + i, s"g$i")).toDF("k", "v")))
    assert(LogLake.distributedCheckpointWrites.get() == before + 2,
      "generation 2 must derive from the bootstrapped group as a job")
    LogLake.clearSnapshotCache()
    assert(spark.read.format("loglake").load(dir).count() == 22L)
    // file ORDER through the bootstrap equals the driver replay's:
    // resolve at v10 via the checkpoint vs via manifests alone (v9
    // predates the group, so its resolve is a pure manifest replay,
    // and v10 = v9 + one append — same prefix order)
    val viaChk = LogLake.activeState(dir, Some(10L))._1.map(_.path)
    val viaLog = LogLake.activeState(dir, Some(9L))._1.map(_.path)
    assert(viaChk.dropRight(1) == viaLog,
      "bootstrap part order must equal the manifest replay order")
  }

  test("bootstrap auto-select: a small manifest log takes the driver replay") {
    // under the DEFAULT loglake.checkpoint.bootstrapJobMinManifestBytes
    // threshold a toy log must pick the cheaper driver replay (the job
    // pays ~2x where the replay still fits, BASELINE.md) — and the
    // replay's parquet group must serve the lazy plan identically
    val before = LogLake.distributedCheckpointWrites.get()
    val dir = tmp("autosel")
    LogLake.createEmpty(dir, Seq((1L, "x")).toDF("k", "v").schema)
    LogLake.setTableProperties(dir, Map(
      "loglake.checkpoint.format" -> "parquet",
      "loglake.checkpoint.partSizeFiles" -> "4",
      "loglake.planning.distributed" -> "true"))
    (0 until 11).foreach(i =>
      LogLake.append(spark, dir, Seq((i.toLong, s"v$i")).toDF("k", "v")
        .repartition(1)))                        // v2..v12, chk at v10
    assert(LogLake.distributedCheckpointWrites.get() == before,
      "below the byte threshold the driver replay must be chosen")
    assert(new java.io.File(dir, "_loglake").listFiles()
      .exists(_.getName.matches("""chk-0*10\.p\d+-of-\d+\.parquet""")),
      "the replay must still write the parquet group")
    LogLake.clearSnapshotCache()
    val assembles = LogLake.snapshotAssembles.get()
    val df = spark.read.format("loglake").load(dir)
    assert(df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location
    }.get.isInstanceOf[graft.sources.LazyLogLakeFileIndex],
      "the replay-written group must still unlock the lazy plan")
    assert(df.count() == 11L)
    assert(LogLake.snapshotAssembles.get() == assembles)
  }
}
