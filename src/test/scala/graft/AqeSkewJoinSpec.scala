package graft

import org.apache.spark.sql.functions._
import graft.model.Tables

/** AQE runtime skew handling — the adaptive complement of q87's explicit
  * salting: no query rewrite, the engine observes actual partition sizes
  * at the shuffle boundary and splits oversized partitions into multiple
  * tasks (each joined against a duplicated slice of the other side).
  * events' ~15-user keyspace makes every user a skewed partition once
  * the thresholds are scaled down to test-data sizes; at 100 TB the
  * default 256 MB thresholds trip on real hot keys the same way.
  */
class AqeSkewJoinSpec extends SparkTestBase {

  test("AQE splits skewed partitions in a shuffle join") {
    val s2 = Sessions.derived(spark,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB")

    // Three preconditions the rule needs, each a real-cluster given:
    // (1) multiple map blocks per shuffle partition (a single-file scan
    //     yields ONE mapper and nothing to split) — repartition(8);
    // (2) a genuinely hot key — user 1 inflated ~40x;
    // (3) the SMJ children must be Sort-over-shuffle-stage directly:
    //     OptimizeSkewedJoin pattern-matches SMJ(Sort(Stage),
    //     Sort(Stage)), so an aggregate interposed on either side (its
    //     output already satisfies the distribution) opts that join out
    //     of skew splitting — hence a filtered projection, not a
    //     groupBy, as the dim side here.
    val src = Tables.events(s2, sfDir)
      .select("user_id", "event_id", "value")
      .withColumn("dup",
        explode(sequence(lit(0), when(col("user_id") === 1, 40).otherwise(0))))
      .drop("dup")
      .repartition(8)
    val ev = src
    val dim = src.filter(col("event_id") % 97 === 0)
      .select(col("user_id"), col("value").as("v2"))
    val joined = ev.join(dim, Seq("user_id"))

    // materialize THROUGH the same QueryExecution (count() would build
    // a new one and leave this plan un-finalized), then inspect it
    val n = joined.collect().length.toLong
    val plainSrc = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "value")
      .withColumn("dup",
        explode(sequence(lit(0), when(col("user_id") === 1, 40).otherwise(0))))
      .drop("dup")
    val expected = plainSrc
      .join(
        plainSrc.filter(col("event_id") % 97 === 0)
          .select(col("user_id"), col("value").as("v2")),
        Seq("user_id"))
      .count()
    assert(n == expected, s"skew-split join changed the result: $n != $expected")
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"expected AQE skew-split markers in the final plan, got:\n$finalPlan")
  }
}
