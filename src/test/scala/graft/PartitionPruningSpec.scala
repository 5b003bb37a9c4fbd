package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.model.Tables

/** Partition-layout writes + partition pruning: the other half of the
  * scan-reduction story next to predicate pushdown. A 100 TB corpus is
  * laid out as `dt=…/lang=…` directories; a query filtering on those
  * columns must touch only the matching directories — visible in the
  * plan as `PartitionFilters` and measurable as the number of files the
  * scan actually lists. Also covers dynamic partition overwrite (the
  * idempotent daily-backfill write mode: replacing one day's partition
  * leaves every other day's files untouched).
  */
class PartitionPruningSpec extends SparkTestBase {

  private val base = "/tmp/graft_partitioned"

  test("partitioned write + static partition pruning in the scan") {
    val out = s"$base/events_by_day"
    Tables.events(spark, sfDir)
      .withColumn("dt", to_date(col("ts")))
      .write.partitionBy("dt").mode("overwrite").parquet(out)

    val days = spark.read.parquet(out).select("dt").distinct().count()
    assert(days > 5, s"expected a multi-day layout, got $days partitions")

    val one = spark.read.parquet(out).filter(col("dt") === "2024-01-03")
    val scan = one.queryExecution.executedPlan.collectLeaves().head
    val scanStr = scan.toString
    assert(scanStr.contains("PartitionFilters") && scanStr.contains("2024-01-03"),
      s"expected the dt predicate in PartitionFilters, got:\n$scanStr")

    // the pruned scan must list only the one matching directory's files
    val fileScan = scan.asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
    val selected = fileScan.relation.location.listFiles(
      fileScan.partitionFilters, fileScan.dataFilters)
    assert(selected.size == 1,
      s"expected exactly 1 selected partition dir, got ${selected.size}")

    // and correctness: pruned read == full-scan filter
    val full = Tables.events(spark, sfDir)
      .filter(to_date(col("ts")) === "2024-01-03").count()
    assert(one.count() == full)
  }

  test("dynamic partition overwrite replaces only the written day") {
    val out = s"$base/events_dpo"
    val ev = Tables.events(spark, sfDir).withColumn("dt", to_date(col("ts")))
    ev.write.partitionBy("dt").mode("overwrite").parquet(out)
    val before = spark.read.parquet(out).count()
    val day3Before = spark.read.parquet(out)
      .filter(col("dt") === "2024-01-03").count()

    // backfill one day (from the upstream source — Spark refuses to
    // overwrite a path it is also reading) with dynamic overwrite:
    // only that partition moves
    val s2 = Sessions.derived(spark,
      "spark.sql.sources.partitionOverwriteMode" -> "dynamic")
    Tables.events(s2, sfDir).withColumn("dt", to_date(col("ts")))
      .filter(col("dt") === "2024-01-03")
      .write.partitionBy("dt").mode("overwrite").parquet(out)

    val after = spark.read.parquet(out).count()
    assert(after == before,
      s"dynamic overwrite of one day must not drop other days: $before -> $after")
    assert(spark.read.parquet(out).filter(col("dt") === "2024-01-03").count() == day3Before)
  }

  override def afterAll(): Unit = {
    // best-effort temp cleanup; directory layout is per-suite
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(rm(_)) finally s.close()
      }
      Files.deleteIfExists(p)
    }
    rm(Paths.get(base))
    super.afterAll()
  }
}
