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
}
