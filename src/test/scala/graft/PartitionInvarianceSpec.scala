package graft

/** Results must be independent of physical parallelism: the same query
  * at 2 vs 7 shuffle partitions (co-prime, so every hash boundary
  * moves) must produce byte-identical ordered rows. This is the
  * cluster-resize / AQE-replan safety property the determinism contract
  * (exact decimal sums, total ORDER BY, engine-stable hashing) exists
  * to provide — checked here on the queries whose shapes are most
  * partition-sensitive: salted aggregation, window sorts, iterative
  * label propagation, max_by compaction, exact statistics.
  */
class PartitionInvarianceSpec extends SparkTestBase {

  private val sensitive = Seq(
    "q28_salted_agg",      // salt spreads groups across partitions
    "q49_percentile_disc", // window sort + broadcast counts
    "q85_contamination",   // persisted shingle index, multi-branch
    "q87_salted_join",     // salted join + derived-session conf
    "q90_scd2_merge",      // full-outer join + generate
    "q91_cdc_compact",     // max_by partial aggregation
    "q95_corr_covar",      // decimal sufficient statistics
    "q96_percentile_cont", // interpolated ranks
    "q105_mad_outliers",   // two chained rank-pick kernels + threshold agg
    "q108_lm_quality",     // corpus-joined model, dsum mean of ratios
    "q109_containment")    // LSH-band candidates + array intersection

  test("sensitive queries are invariant to shuffle partition count") {
    val a = Sessions.derived(spark, "spark.sql.shuffle.partitions" -> "2")
    val b = Sessions.derived(spark, "spark.sql.shuffle.partitions" -> "7")
    sensitive.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ra = fn(a, sfDir).collect().toSeq
      val rb = fn(b, sfDir).collect().toSeq
      assert(ra == rb,
        s"$name differs between 2 and 7 shuffle partitions " +
          s"(first diff: ${ra.zip(rb).find(p => p._1 != p._2)})")
      assert(ra.nonEmpty, s"$name returned no rows — vacuous invariance")
    }
  }
}
