package graft

import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** Cache hygiene: a long-lived session running the whole registry must
  * not accumulate pinned plans. Two invariants:
  *
  *  1. Operators that persist INTERNALLY (both the action and the
  *     persist live inside one call — loglake's CDF merge, connected
  *     components) unpersist before returning: the session cache is
  *     empty the moment the call is back, no harness help needed.
  *
  *  2. Registry queries that hand back a LAZY frame over a persisted
  *     intermediate (the documented pattern: RankPick's range-shuffle
  *     reuse, q42's shingle table) are freed by the harness-level
  *     `spark.catalog.clearCache()` both Verify and Bench run after
  *     every query's action — this spec replays that exact sequence
  *     and pins that nothing survives it.
  */
class CacheHygieneSpec extends SparkTestBase {
  import spark.implicits._

  test("internally-persisting operators leave the cache empty on return") {
    spark.catalog.clearCache()
    val dir = java.nio.file.Files
      .createTempDirectory("cache-hygiene").toString + "/t"
    LogLake.create(spark, dir, Seq(1L -> "a", 2L -> "b").toDF("k", "v"))
    LogLake.setTableProperties(dir,
      Map("loglake.enableChangeDataFeed" -> "true"))
    LogLake.merge(spark, dir, Seq(2L -> "B", 9L -> "z").toDF("k", "v"), Seq("k"))
    assert(spark.sharedState.cacheManager.isEmpty,
      "CDF merge left a persisted plan behind")

    // connectedComponents returns a PERSISTED labels frame by contract
    // (the caller materializes then unpersists, as q83 does) — but its
    // iteration internals must all be freed already
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("node")
    val edges = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L).toDF("a", "b")
    val (labels, _) = ops.Cc.connectedComponents(nodes, edges)
    labels.unpersist()
    assert(spark.sharedState.cacheManager.isEmpty,
      "connected components leaked an iteration intermediate")
  }

  test("lazily-persisting registry queries are fully freed by the harness clearCache") {
    val persistingQueries =
      Seq("q42_ngram_jaccard", "q96_percentile_cont", "q105_mad_outliers")
    persistingQueries.foreach { name =>
      spark.catalog.clearCache()
      val df = SparkEntry.queries(name)(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
      // the pattern under test: the query's action pinned something…
      assert(!spark.sharedState.cacheManager.isEmpty,
        s"$name no longer persists — drop it from this spec")
      // …and the harness hygiene step frees ALL of it
      spark.catalog.clearCache()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name survives clearCache — leaked pinned plan")
    }
  }
}
