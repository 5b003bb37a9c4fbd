package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.model.Tables
import graft.ops.RankPick

/** Stage-by-stage timing of the distributed rank-pick kernel on q49's
  * input, to find where wall-clock goes at local scale. */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 3) {
      println(s"--- round $round")
      val li = Tables.lineitem(spark, d)
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      time("scan-count")(li.write.mode("overwrite").format("noop").save())
      val part = li.select(col("l_returnflag"), col("l_quantity"))
        .repartitionByRange(32, col("l_returnflag"), col("l_quantity"))
        .withColumn("pid", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cnt = time("cnt-agg")(
        part.groupBy("pid", "l_returnflag").agg(count(lit(1)).as("c")).collect())
      println(s"  summary rows: ${cnt.length}")
      val one = time("kernel-qty")(
        RankPick.valuesAtRanks(li, "l_returnflag", "l_quantity",
          Seq("median" -> RankPick.MedianRank, "p90" -> RankPick.discRank(9, 10)))
          .collect())
      println(s"  kernel rows: ${one.length}")
      time("kernel-both-noop") {
        val qty = RankPick.valuesAtRanks(li, "l_returnflag", "l_quantity",
          Seq("median_qty" -> RankPick.discRank(1, 2), "p90_qty" -> RankPick.discRank(9, 10)))
        val price = RankPick.valuesAtRanks(li, "l_returnflag", "l_extendedprice",
          Seq("median_price" -> RankPick.discRank(1, 2)))
        RankPick.pivotLabels(qty.unionByName(price), "l_returnflag",
            Seq("median_qty", "p90_qty", "median_price"))
          .drop("n").orderBy("l_returnflag")
          .write.mode("overwrite").format("noop").save()
      }
      part.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
