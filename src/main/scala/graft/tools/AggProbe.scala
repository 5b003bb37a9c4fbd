package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sessions
import graft.model.Tables
import graft.functions.Det._

/** Dev probe: isolate where q01-style aggregation time goes at sf0.1 —
  * bare scan vs double sums vs exact-decimal sums. */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, sfDir)
    def time(name: String)(df: => DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-22s min=${ts.min}%.3f s")
    }
    time("scan-only")(li.select("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax"))
    time("count-only")(li.groupBy("l_returnflag", "l_linestatus").agg(count(lit(1))))
    time("double-sums")(li.groupBy("l_returnflag", "l_linestatus").agg(
      sum("l_quantity"), sum("l_extendedprice"),
      sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
      sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))))
    def dec(c: org.apache.spark.sql.Column) =
      sum(c.cast(org.apache.spark.sql.types.DecimalType(38, 6))).cast("double")
    time("decimal-sums")(li.groupBy("l_returnflag", "l_linestatus").agg(
      dec(col("l_quantity")), dec(col("l_extendedprice")),
      dec(col("l_extendedprice") * (lit(1) - col("l_discount"))),
      dec(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))))
    // unscaled-long path: one compact decimal(18,6) conversion per row,
    // then plain long sums
    def u6(c: org.apache.spark.sql.Column) =
      (c.cast(org.apache.spark.sql.types.DecimalType(18, 6)) * lit(1000000L)).cast("long")
    def f6(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftBridge.column(graft.expressions.ToFixed6(
        org.apache.spark.sql.GraftBridge.expression(c.cast("double"))))
    time("fixed6-long-sums")(li.groupBy("l_returnflag", "l_linestatus").agg(
      sum(f6(col("l_quantity"))), sum(f6(col("l_extendedprice"))),
      sum(f6(col("l_extendedprice") * (lit(1) - col("l_discount")))),
      sum(f6(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))))))
    time("fixed6-dsum")(li.groupBy("l_returnflag", "l_linestatus").agg(
      dsum(col("l_quantity")), dsum(col("l_extendedprice")),
      dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
      dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))))
    time("unscaled-long-sums")(li.groupBy("l_returnflag", "l_linestatus").agg(
      sum(u6(col("l_quantity"))), sum(u6(col("l_extendedprice"))),
      sum(u6(col("l_extendedprice") * (lit(1) - col("l_discount")))),
      sum(u6(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))))))
    // 3-limb split (22 bits each): overflow-safe long sums at any scale
    def limbs(c: org.apache.spark.sql.Column) = {
      val v = u6(c)
      Seq(v.bitwiseAND(0x3FFFFFL), shiftright(v, 22).bitwiseAND(0x3FFFFFL), shiftright(v, 44))
    }
    time("split3-sums")(li.groupBy("l_returnflag", "l_linestatus").agg(
      limbs(col("l_quantity")).map(sum) ++
      limbs(col("l_extendedprice")).map(sum) ++
      limbs(col("l_extendedprice") * (lit(1) - col("l_discount"))).map(sum) ++
      limbs(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).map(sum)
      match { case Seq(h, t @ _*) => h; },
      (limbs(col("l_quantity")).map(sum) ++
       limbs(col("l_extendedprice")).map(sum) ++
       limbs(col("l_extendedprice") * (lit(1) - col("l_discount"))).map(sum) ++
       limbs(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).map(sum)).tail: _*))
    spark.stop()
  }
}
