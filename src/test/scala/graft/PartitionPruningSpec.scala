package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** Partition pruning through the REAL `partitionSchema` on the native
  * loglake read path ([[graft.sources.LogLakeFileIndex]]): partition
  * predicates are applied exactly at planning (one `PartitionDirectory`
  * per manifest tuple), the user-visible schema keeps its declared
  * column order (overlapped-partition-column merge), and — the 100 TB
  * payoff — a star join's dim filter DYNAMICALLY prunes fact partitions
  * at runtime via Spark's `PartitionPruning` rule + the reused
  * broadcast (`DynamicPruningExpression` on the scan). */
class PartitionPruningSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"dpp-$name").toString + "/t"

  /** Orders-like fact: `k` sequential, `part` one of n values, several
    * files per partition (one create + appends). */
  private def makeFact(dir: String, parts: Int, rowsPerCommit: Int, commits: Int): Unit = {
    def gen(off: Int): DataFrame =
      spark.range(rowsPerCommit).select(
        (col("id") + off).as("k"),
        concat(lit("p"), col("id") % parts).as("part"),
        (col("id") * 7 % 100).as("amt"))
    LogLake.create(spark, dir, gen(0), partitionBy = Seq("part"))
    (1 until commits).foreach(i => LogLake.append(spark, dir, gen(i * rowsPerCommit)))
  }

  /** All FileSourceScanExec nodes, descending through AQE stages. */
  private def fileScans(plan: SparkPlan): Seq[FileSourceScanExec] = {
    val out = scala.collection.mutable.ArrayBuffer[FileSourceScanExec]()
    def go(p: SparkPlan): Unit = p.foreach {
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => go(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => go(r.child)
      case s: FileSourceScanExec => out += s
      case _ =>
    }
    go(plan)
    out.toSeq
  }

  test("schema order and values are unchanged by the partition-aware index") {
    val dir = tmp("roundtrip")
    makeFact(dir, 3, 30, 2)
    val t = spark.read.format("loglake").load(dir)
    // declared order: k, part, amt — partition col stays in place
    assert(t.schema.fieldNames.toSeq == Seq("k", "part", "amt"))
    val got = t.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length == 60)
    assert(got.take(3).toSeq == Seq((0L, "p0", 0L), (1L, "p1", 7L), (2L, "p2", 14L)))
    // every partition value served from the manifest matches the data
    assert(t.filter(col("part") === "p1").select("k").as[Long].collect().sorted
      .forall(_ % 3 == 1))
  }

  test("a static partition predicate prunes to the matching partitions' files") {
    val dir = tmp("static")
    makeFact(dir, 4, 40, 3)
    val t = spark.read.format("loglake").load(dir)
    val q = t.filter(col("part") === "p2").groupBy().agg(sum("amt").as("s"))
    // partition filter shows up as a PartitionFilters entry, not a data filter
    val scanStr = q.queryExecution.executedPlan.toString
    assert(scanStr.contains("PartitionFilters"), scanStr)
    q.collect()
    val scans = fileScans(q.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    val total = LogLake.activeState(dir)._1.size
    val read = scans.map(_.metrics("numFiles").value).sum
    assert(read < total, s"read $read of $total files — no partition pruning")
    // 3 commits × 1 file per live partition ⇒ a quarter of the files
    assert(read == total / 4, s"read $read of $total")
  }

  test("a NULL partition value round-trips and IS NULL prunes to it") {
    val dir = tmp("nulls")
    val df = spark.range(20).select(col("id").as("k"),
      when(col("id") % 4 === 0, concat(lit("p"), col("id") % 2)).as("part"))
    LogLake.create(spark, dir, df, partitionBy = Seq("part"))
    val t = spark.read.format("loglake").load(dir)
    assert(t.filter(col("part").isNull).count() == 15L)
    assert(t.filter(col("part") === "p0").count() == 5L) // 0,4,8,12,16
    assert(t.count() == 20L)
  }

  test("typed (non-string) partition columns serve exact values") {
    val dir = tmp("typed")
    val df = spark.range(30).select(col("id").as("k"),
      (col("id") % 5).as("bucket"),
      date_add(lit(java.sql.Date.valueOf("2026-01-01")), (col("id") % 3).cast("int")).as("d"))
    LogLake.create(spark, dir, df, partitionBy = Seq("bucket", "d"))
    val t = spark.read.format("loglake").load(dir)
    assert(t.schema("bucket").dataType.simpleString == "bigint")
    assert(t.schema("d").dataType.simpleString == "date")
    assert(t.filter(col("bucket") === 2L && col("d") === lit(java.sql.Date.valueOf("2026-01-03")))
      .select("k").as[Long].collect().sorted.toSeq == Seq(2L, 17L))
    // full table re-aggregates identically through partition values
    assert(t.groupBy("bucket").count().orderBy("bucket").as[(Long, Long)].collect()
      .toSeq == (0L to 4L).map(b => (b, 6L)))
  }

  test("a star join's dim filter dynamically prunes fact partitions (DPP)") {
    val dir = tmp("dpp")
    makeFact(dir, 4, 40, 3)
    val fact = spark.read.format("loglake").load(dir)
    // the dim must be FILE-backed: a LocalRelation dim gets its filter
    // constant-folded away before PartitionPruning looks for one
    val dimPath = tmp("dpp-dim")
    Seq(("p0", "keep"), ("p1", "drop"), ("p2", "drop"), ("p3", "drop"))
      .toDF("part", "cls").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val q = fact.join(broadcast(dim), Seq("part"))
      .filter(col("cls") === "keep")
      .groupBy("part").agg(sum("amt").as("s"))
    q.collect()
    val plan = q.queryExecution.executedPlan
    val scans = fileScans(plan).filter(_.relation.location.isInstanceOf[graft.sources.LogLakeFileIndex])
    assert(scans.nonEmpty, plan.toString)
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning])),
      s"no dynamic pruning filter on the fact scan:\n$plan")
    val total = LogLake.activeState(dir)._1.size
    val read = scan.metrics("numFiles").value
    assert(read == total / 4,
      s"DPP read $read of $total files — expected ${total / 4}")
  }
}
