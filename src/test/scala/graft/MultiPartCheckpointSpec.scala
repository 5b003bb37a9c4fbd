package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** MULTI-PART CHECKPOINTS (Delta's multi-part checkpoint design):
  * above `loglake.checkpoint.partSizeFiles` active files the
  * checkpoint splits into N parallel-written part files; a reader
  * uses the group only when every part exists, so a torn group
  * degrades to an earlier checkpoint or full manifest replay — never
  * to a torn state. */
class MultiPartCheckpointSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"llmpc-$name").toString + "/t"

  private def parts(dir: String): Seq[java.io.File] =
    new java.io.File(dir, "_loglake").listFiles()
      .filter(_.getName.matches("""chk-\d{20}\.p\d+-of-\d+\.json""")).toSeq.sortBy(_.getName)

  private def build(dir: String): Unit = {
    LogLake.createEmpty(dir, Seq((1L, "x")).toDF("k", "v").schema)
    LogLake.setTableProperties(dir,
      Map("loglake.checkpoint.partSizeFiles" -> "3"))
    // 10 single-file appends cross the checkpoint interval (10) with
    // ~10 active files → ⌈10/3⌉ = 4 parts
    (1 to 10).foreach(i =>
      LogLake.append(spark, dir, Seq((i.toLong, s"v$i")).toDF("k", "v")
        .repartition(1)))
  }

  test("a checkpoint above partSizeFiles splits; the parallel-read resolve is exact") {
    val dir = tmp("split")
    build(dir)
    val ps = parts(dir)
    assert(ps.size >= 2, s"expected a multi-part checkpoint, got ${ps.map(_.getName)}")
    assert(ps.forall(_.getName.contains(s"-of-${ps.size}")))
    // cold resolve through the part group equals the manifest truth
    LogLake.clearSnapshotCache()
    val df = spark.read.format("loglake").load(dir)
    assert(df.count() == 10L)
    assert(df.agg(sum("k")).head().getLong(0) == 55L)
    // stats survive the round-trip: pruning still works from the parts
    val (kept, total) = LogLake.pruneFiles(dir, "k", 9L, 10L)
    assert(total >= 10 && kept.size <= 2, s"kept ${kept.size} of $total")
    // appends after the checkpoint replay the tail on top of the parts
    LogLake.append(spark, dir, Seq((11L, "v11")).toDF("k", "v"))
    LogLake.clearSnapshotCache()
    assert(spark.read.format("loglake").load(dir).count() == 11L)
  }

  test("a torn part group is skipped, not misread") {
    val dir = tmp("torn")
    build(dir)
    val ps = parts(dir)
    assert(ps.size >= 2)
    assert(ps.head.delete(), "could not tear the group")
    LogLake.clearSnapshotCache()
    // resolve falls back to full manifest replay — same answer, loud
    // about nothing
    assert(spark.read.format("loglake").load(dir).count() == 10L)
  }

  test("metadata retention sweeps part files, torn leftovers included") {
    val dir = tmp("sweep")
    build(dir)
    // push past a second checkpoint so the first group expires
    (11 to 20).foreach(i =>
      LogLake.append(spark, dir, Seq((i.toLong, s"v$i")).toDF("k", "v")
        .repartition(1)))
    val before = parts(dir).map(_.getName)
    assert(before.exists(_.startsWith("chk-00000000000000000010")) &&
      before.exists(_.startsWith("chk-00000000000000000020")), s"got $before")
    val swept = LogLake.cleanupMetadata(dir, olderThanMs = -60000L)
    assert(swept.exists(_.contains("chk-00000000000000000010")),
      s"expired part group must sweep, got $swept")
    val after = parts(dir).map(_.getName)
    assert(after.nonEmpty && after.forall(_.startsWith("chk-00000000000000000020")),
      s"got $after")
    LogLake.clearSnapshotCache()
    assert(spark.read.format("loglake").load(dir).count() == 20L)
  }
}
