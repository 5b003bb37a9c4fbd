package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** Opportunistic post-commit compaction (Delta's autoCompact):
  * appends into a `loglake.autoCompact=true` table trigger an inline
  * incremental OPTIMIZE once enough sub-threshold files accumulate —
  * metadata-only trigger check, best-effort execution. */
class AutoCompactSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"autocompact-$name").toString + "/t"

  private def kv(from: Int, n: Int): DataFrame =
    spark.range(from, from + n).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v")).coalesce(1)

  test("off by default: small appends accumulate files") {
    val dir = tmp("off")
    LogLake.create(spark, dir, kv(0, 10))
    (1 to 5).foreach(i => LogLake.append(spark, dir, kv(i * 10, 10)))
    assert(LogLake.history(dir).map(_.op).count(_ == "optimize") == 0)
    assert(LogLake.activeState(dir)._1.size == 6)
  }

  test("threshold crossing triggers an inline incremental optimize") {
    val dir = tmp("on")
    LogLake.create(spark, dir, kv(0, 10))
    LogLake.setTableProperties(dir, Map(
      "loglake.autoCompact" -> "true",
      "loglake.autoCompact.minNumFiles" -> "4"))
    (1 to 4).foreach(i => LogLake.append(spark, dir, kv(i * 10, 10)))
    val ops = LogLake.history(dir).map(_.op)
    assert(ops.count(_ == "optimize") >= 1,
      s"expected an auto-compaction commit, got $ops")
    assert(LogLake.activeState(dir)._1.size < 5,
      s"small files not compacted: ${LogLake.activeState(dir)._1.size}")
    // content survives the re-layout
    assert(LogLake.snapshot(spark, dir).count() == 50L)
    assert(LogLake.snapshot(spark, dir).agg(sum("k")).head().getLong(0) ==
      (0L until 50L).sum)
  }

  test("files above the size threshold never re-compact") {
    val dir = tmp("big")
    LogLake.create(spark, dir, kv(0, 10))
    LogLake.setTableProperties(dir, Map(
      "loglake.autoCompact" -> "true",
      "loglake.autoCompact.minNumFiles" -> "3",
      "loglake.autoCompact.smallFileBytes" -> "1")) // nothing is smaller
    (1 to 4).foreach(i => LogLake.append(spark, dir, kv(i * 10, 10)))
    assert(LogLake.history(dir).map(_.op).count(_ == "optimize") == 0,
      "no file is below the threshold — no compaction")
    assert(LogLake.activeState(dir)._1.size == 5)
  }
}
