package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.Sessions
import graft.model.Tables
import graft.sources.LogLake

/** Dynamic partition pruning, measured (round-11 surface): a
  * partitioned loglake fact star-joined to a file-backed dim whose
  * filter survives to runtime. Compares the same query with DPP on vs
  * off (`spark.sql.optimizer.dynamicPartitionPruning.enabled`) and
  * reports bytes read + wall time per leg — the evidence that the
  * planted `DynamicPruningExpression` actually prevents fact I/O, not
  * just that it appears in the plan. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.DppProbe"`. */
object DppProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // fact: lineitem partitioned by l_returnflag (3 tuples), several
    // commits so each partition holds several files
    val dir = Files.createTempDirectory("dppprobe").toString + "/t"
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_returnflag", "l_extendedprice", "l_quantity")
    LogLake.create(spark, dir, li.filter(col("l_orderkey") % 3 === 0),
      partitionBy = Seq("l_returnflag"))
    (1 to 2).foreach(i =>
      LogLake.append(spark, dir, li.filter(col("l_orderkey") % 3 === i)))

    val dimDir = Files.createTempDirectory("dppprobe-dim").toString + "/d"
    Seq(("R", "keep"), ("A", "drop"), ("N", "drop"))
      .toDF("l_returnflag", "cls").write.parquet(dimDir)

    def factScans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val out = scala.collection.mutable.ArrayBuffer[FileSourceScanExec]()
      def go(x: SparkPlan): Unit = x.foreach {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => go(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => go(r.child)
        case sc: FileSourceScanExec
          if sc.relation.location.isInstanceOf[graft.sources.LogLakeFileIndex] => out += sc
        case _ =>
      }
      go(p); out.toSeq
    }

    def run(dpp: Boolean): (Long, Long, Double, Long) = {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", dpp)
      val fact = spark.read.format("loglake").load(dir)
      val dim = spark.read.parquet(dimDir)
      val q = fact.join(broadcast(dim), Seq("l_returnflag"))
        .filter(col("cls") === "keep")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("qty"),
          sum("l_extendedprice").as("rev"), avg("l_orderkey").as("ok"))
      val t0 = System.nanoTime()
      val rows = q.collect().map(_.getLong(1)).sum
      val ms = (System.nanoTime() - t0) / 1000000L
      val scan = factScans(q.queryExecution.executedPlan).head
      val files = scan.metrics("numFiles").value
      val mb = scan.metrics("filesSize").value / 1048576.0
      (ms, files, mb, rows)
    }

    run(dpp = true) // warm JIT + parquet footers off both paths
    run(dpp = false)
    val (msOn, filesOn, mbOn, rowsOn) = run(dpp = true)
    val (msOff, filesOff, mbOff, rowsOff) = run(dpp = false)
    require(rowsOn == rowsOff, s"row mismatch: $rowsOn vs $rowsOff")
    val total = LogLake.activeState(dir)._1.size
    println(f"""{"probe":"dpp","files_total":$total,"rows":$rowsOn,""" +
      f""""dpp_on":{"ms":$msOn,"files_read":$filesOn,"mb_scanned":$mbOn%.2f},""" +
      f""""dpp_off":{"ms":$msOff,"files_read":$filesOff,"mb_scanned":$mbOff%.2f}}""")
    spark.stop()
  }
}
