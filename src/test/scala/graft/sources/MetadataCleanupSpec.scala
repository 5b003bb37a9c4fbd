package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Metadata retention ([[graft.sources.LogLake.cleanupMetadata]] —
  * Delta's `logRetentionDuration`): expired manifests/checkpoints are
  * deleted below a retention-floor checkpoint, every retained version
  * still resolves, and every surface that would need the expired
  * history (time travel, change feed, stream restart) fails loudly
  * naming the retained span — never silently partial. */
class MetadataCleanupSpec extends SparkTestBase {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"metaclean-$name").toString + "/t"

  /** 25 single-row commits → checkpoints at v10 and v20. */
  private def build25(dir: String): Unit = {
    LogLake.create(spark, dir, spark.range(1).select(col("id").as("k")))
    (2 to 25).foreach { i =>
      LogLake.append(spark, dir,
        spark.range(1).select((col("id") + i).as("k")))
    }
  }

  private def logFiles(dir: String): Set[String] =
    new java.io.File(dir, "_loglake").listFiles()
      .filter(_.isFile).map(_.getName).toSet

  test("cleanup keeps a contiguous suffix from the newest expired checkpoint") {
    val dir = tmp("suffix")
    build25(dir)
    // dryRun lists without deleting
    val dry = LogLake.cleanupMetadata(dir, olderThanMs = -60000L, dryRun = true)
    assert(dry.nonEmpty && logFiles(dir).size >= 27, "dryRun must not delete")
    val swept = LogLake.cleanupMetadata(dir, olderThanMs = -60000L)
    assert(swept.toSet == dry.toSet)
    // floor = newest checkpoint (v20): manifests 1..19 and chk-10 gone
    val names = logFiles(dir)
    assert(!names.contains(f"${1L}%020d.json") && !names.contains(f"${19L}%020d.json"))
    assert(!names.contains(f"chk-${10L}%020d.json"), "the expired checkpoint must go")
    assert(names.contains(f"${20L}%020d.json"), "the floor manifest must survive")
    assert(names.contains(f"chk-${20L}%020d.json"), "the floor checkpoint must survive")
    // latest read unchanged
    assert(spark.read.format("loglake").load(dir).count() == 25L)
    // the floor version and everything above still time-travel
    assert(LogLake.snapshot(spark, dir, asOf = Some(20L)).count() == 20L)
    assert(LogLake.snapshot(spark, dir, asOf = Some(23L)).count() == 23L)
    // below the floor: loud, names the retained span
    val e = intercept[IllegalArgumentException] {
      LogLake.snapshot(spark, dir, asOf = Some(19L)).count()
    }
    assert(e.getMessage.contains("retained log") && e.getMessage.contains("20..25"))
    // history is truncated to the retained span, ascending
    val hist = LogLake.history(dir).map(_.version)
    assert(hist == (20L to 25L))
  }

  test("change feed and manifest ranges below the floor fail loudly") {
    val dir = tmp("feed")
    build25(dir)
    LogLake.cleanupMetadata(dir, olderThanMs = -60000L)
    // full-history feed (fromV = 0) can no longer be served
    val e1 = intercept[IllegalArgumentException] {
      LogLake.changeFeed(spark, dir, 0L, 25L).count()
    }
    assert(e1.getMessage.contains("retained log"))
    // a retained-range feed works: versions 21..25 are 5 single-row inserts
    assert(LogLake.changeFeed(spark, dir, 20L, 25L).count() == 5L)
    // the streaming planner's range read is guarded the same way
    val e2 = intercept[IllegalArgumentException] {
      LogLake.manifestRange(dir, 5L, 25L)
    }
    assert(e2.getMessage.contains("retained log"))
    assert(LogLake.manifestRange(dir, 20L, 25L).size == 5)
  }

  test("no expired checkpoint -> no-op; young history is never swept") {
    val dir = tmp("noop")
    LogLake.create(spark, dir, spark.range(3).select(col("id").as("k")))
    (2 to 5).foreach(_ => LogLake.append(spark, dir,
      spark.range(1).select(col("id").as("k"))))
    // no checkpoint yet (interval 10)
    assert(LogLake.cleanupMetadata(dir, olderThanMs = -60000L).isEmpty)
    val dir2 = tmp("young")
    build25(dir2)
    // a generous horizon keeps everything: no checkpoint is old enough
    assert(LogLake.cleanupMetadata(dir2, olderThanMs = 7L * 24 * 3600 * 1000).isEmpty)
    assert(LogLake.snapshot(spark, dir2, asOf = Some(1L)).count() == 1L)
  }

  test("loglake.logRetentionMs auto-cleans at checkpoint time") {
    val dir = tmp("auto")
    LogLake.create(spark, dir, spark.range(1).select(col("id").as("k")))
    LogLake.setTableProperties(dir, Map("loglake.logRetentionMs" -> "-60000"))
    (2 to 20).foreach { i =>
      LogLake.append(spark, dir,
        spark.range(1).select((col("id") + i).as("k")))
    }
    // the v20 checkpoint ran cleanup: floor 20, manifests 1..19 gone
    val hist = LogLake.history(dir).map(_.version)
    assert(hist == Seq(20L), s"auto-cleanup should keep only v20, got $hist")
    assert(spark.read.format("loglake").load(dir).count() == 20L)
    // later commits append to the retained suffix as usual
    LogLake.append(spark, dir, spark.range(1).select(col("id").as("k")))
    assert(spark.read.format("loglake").load(dir).count() == 21L)
  }
}
