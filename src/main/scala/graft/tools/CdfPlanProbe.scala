package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{Sessions, model}
import graft.sources.LogLake

/** Plan evidence for the streaming CDF's per-batch scan scoping (r18,
  * VERDICT r17 #4): rebuilds q122's fixture history (append, append,
  * MoR delete, MoR update) and dumps, for each admitted version range,
  * the batch DataFrame the stream's micro-batch resolves to — its
  * FileScans must read ONLY that range's change files / touched data
  * files, never the table through its DVs.
  *
  * Usage: runMain graft.tools.CdfPlanProbe <sfDir> <outFile>
  */
object CdfPlanProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outFile) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = Files.createTempDirectory("graft-cdfprobe").toString + "/t"
    val ord = model.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    LogLake.create(spark, src, ord.filter(col("o_orderkey") % 3 =!= 2),
      statsCols = Seq("o_orderkey"))                                   // v1
    LogLake.append(spark, src, ord.filter(col("o_orderkey") % 3 === 2)) // v2
    LogLake.delete(spark, src, col("o_orderkey") % 7 === 0, mor = true) // v3
    LogLake.update(spark, src, col("o_orderkey") % 5 === 0,
      Map("o_orderstatus" -> lit("U")), mor = true)                     // v4
    val sb = new StringBuilder
    for (v <- 1L to 4L) {
      // (fromV, toV] — one admitted commit per micro-batch, as
      // maxVersionsPerTrigger=1 paces q122
      val batch = LogLake.changeFeed(spark, src, v - 1L, v)
      sb ++= s"===== changeFeed version $v (one micro-batch's read) =====\n"
      sb ++= batch.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb ++= "\n"
    }
    Files.writeString(java.nio.file.Paths.get(outFile), sb.toString)
    println(s"wrote $outFile (fixture at $src)")
    spark.stop()
  }
}
