package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions

/** Prints the round count the large-star/small-star CC uses on q83's
  * actual near-dup graph at each scale factor — the number behind the
  * "round-count-dominated, not diameter-dominated" claim in BASELINE.md.
  */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val d = s"/root/testdata/sf$sf"
      val pairs = graft.ops.Sim.minhashPairs(graft.ops.Sim.shingleRows(spark, d))
        .select(col("d1").as("a"), col("d2").as("b"))
      val nodes = graft.model.Tables.documents(spark, d).select(col("doc_id").as("node"))
      val (labels, rounds) = graft.ops.Cc.connectedComponents(nodes, pairs)
      val clusters = labels.agg(countDistinct("lbl")).head().getLong(0)
      labels.unpersist()
      spark.catalog.clearCache()
      println(s"""{"sf":"$sf","rounds":$rounds,"clusters":$clusters}""")
    }
    spark.stop()
  }
}
