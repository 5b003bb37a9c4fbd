package graft

import org.apache.spark.sql.functions._
import graft.model.Tables

/** Mergeability is what makes sketches the 100 TB default: per-shard
  * (here per-day) HLL sketches can be stored, then UNIONED later to
  * answer "distinct over any date range" without rescanning events —
  * the pre-aggregation pattern every metrics store uses. The union's
  * estimate must agree with sketching the raw stream directly, and both
  * must sit within HLL error of the exact count.
  */
class SketchMergeSpec extends SparkTestBase {

  test("per-day HLL sketches union to the direct sketch's estimate") {
    val e = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("d"), col("user_id"))

    val daily = e.groupBy("d")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val merged = daily
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)

    val direct = e
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est"))
      .collect()(0).getLong(0)

    val exact = e.select("user_id").distinct().count()

    assert(merged == direct,
      s"union of daily sketches ($merged) must equal the direct sketch ($direct)")
    // lgConfigK=12 -> rsd ~1.6%; allow 3 sigma
    val tol = math.max(3, (exact * 0.05).toLong)
    assert(math.abs(merged - exact) <= tol,
      s"sketch estimate $merged not within $tol of exact $exact")
  }
}
