package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.AsofJoin

/** Native as-of join ([[graft.plans.SortMergeAsofJoinExec]]) semantics:
  * last right row with equal key and time <= left time, LEFT OUTER,
  * SQL null semantics — checked on hand-built edge cases, against the
  * composed union-timeline plan on real data, and across partition
  * counts (co-partitioning correctness).
  */
class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def quotes = Seq(
    // (key, time, quote)
    (1L, 10L, "q1@10"), (1L, 20L, "q1@20"), (1L, 30L, "q1@30"),
    (2L, 15L, "q2@15"),
    (4L, 5L, "q4@5")
  ).toDF("k", "t", "quote")

  private def trades = Seq(
    // (key, time, trade)
    (1L, 5L, "before-any"),   // no quote yet -> null
    (1L, 20L, "exact"),       // equal time matches (<=)
    (1L, 25L, "between"),     // latest earlier quote = 20
    (1L, 99L, "after-all"),   // latest = 30
    (2L, 14L, "just-before"), // 15 > 14 -> null
    (3L, 50L, "no-such-key")  // key absent -> null
  ).toDF("k", "t", "trade")

  test("as-of left join: exact/between/none/missing-key cases") {
    val out = AsofJoin.asofLeft(
        trades, quotes.withColumnRenamed("k", "qk").withColumnRenamed("t", "qt"),
        Seq("k"), Seq("qk"), "t", "qt")
      .select("k", "t", "trade", "qt", "quote")
      .orderBy("k", "t")
      .collect()
    assert(out.toSeq === Seq(
      Row(1L, 5L, "before-any", null, null),
      Row(1L, 20L, "exact", 20L, "q1@20"),
      Row(1L, 25L, "between", 20L, "q1@20"),
      Row(1L, 99L, "after-all", 30L, "q1@30"),
      Row(2L, 14L, "just-before", null, null),
      Row(3L, 50L, "no-such-key", null, null)))
  }

  test("null keys and null times never match (SQL semantics)") {
    val l = Seq[(java.lang.Long, java.lang.Long, String)](
      (null, 10L, "null-key"), (1L, null, "null-time"), (1L, 10L, "ok"))
      .toDF("k", "t", "tag")
    val r = Seq[(java.lang.Long, java.lang.Long, String)](
      (null, 5L, "r-null-key"), (1L, null, "r-null-time"), (1L, 7L, "r-ok"))
      .toDF("rk", "rt", "rtag")
    val out = AsofJoin.asofLeft(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("tag", "rtag").orderBy("tag").collect()
    assert(out.toSeq === Seq(
      Row("null-key", null), Row("null-time", null), Row("ok", "r-ok")))
  }

  test("empty right side leaves every left row unmatched") {
    val out = AsofJoin.asofLeft(
        trades, quotes.filter(lit(false))
          .withColumnRenamed("k", "qk").withColumnRenamed("t", "qt"),
        Seq("k"), Seq("qk"), "t", "qt")
      .collect()
    assert(out.length === 6 && out.forall(_.isNullAt(4)))
  }

  test("generic path (string key) agrees with the long fast path's semantics") {
    val l = trades.withColumn("ks", concat(lit("k"), col("k"))).drop("k")
    val r = quotes.withColumn("rks", concat(lit("k"), col("k"))).drop("k")
      .withColumnRenamed("t", "qt")
    val out = AsofJoin.asofLeft(l, r, Seq("ks"), Seq("rks"), "t", "qt")
      .select("ks", "t", "trade", "quote").orderBy("ks", "t").collect()
    assert(out.toSeq === Seq(
      Row("k1", 5L, "before-any", null),
      Row("k1", 20L, "exact", "q1@20"),
      Row("k1", 25L, "between", "q1@20"),
      Row("k1", 99L, "after-all", "q1@30"),
      Row("k2", 14L, "just-before", null),
      Row("k3", 50L, "no-such-key", null)))
  }

  test("matches the composed union-timeline plan on real data, any partitioning") {
    val od = model.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"), col("o_orderdate").cast("timestamp").as("o_orderdate"))
      .agg(max("o_orderkey").as("matched_orderkey"))
    val ev = model.Tables.events(spark, sfDir).select("event_id", "user_id", "ts")

    // composed reference: one keyed timeline, carry last order forward
    val w = Window.partitionBy("k").orderBy("t", "side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val composed = od
      .select(col("o_custkey").as("k"), col("o_orderdate").as("t"), lit(0).as("side"),
        lit(null).cast("long").as("event_id"), col("matched_orderkey").as("ord_key"))
      .unionByName(ev.select(col("user_id").as("k"), col("ts").as("t"), lit(1).as("side"),
        col("event_id"), lit(null).cast("long").as("ord_key")))
      .withColumn("m", last("ord_key", ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("m").as("matched_orderkey"))

    for (parts <- Seq(1, 7)) {
      val native = AsofJoin.asofLeft(
          ev.repartition(parts), od.repartition(parts),
          Seq("user_id"), Seq("o_custkey"), "ts", "o_orderdate")
        .select("event_id", "matched_orderkey")
      assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
        s"native as-of join diverges from composed plan at $parts partitions")
    }
  }

  test("direct self-join is rejected, not silently wrong") {
    val q = quotes
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofLeft(q, q, Seq("k"), Seq("k"), "t", "t")
    }
    assert(e.getMessage.contains("share attribute id"))
    // the documented workaround — re-alias one side for fresh ids (and
    // fresh names, to clear the collision guard) — must work
    val aliased = q.select(q.columns.map(c => col(c).as("r_" + c)): _*)
    val ok = AsofJoin.asofLeft(q, aliased, Seq("k"), Seq("r_k"), "t", "r_t")
    assert(ok.count() === quotes.count())
  }

  test("colliding output column names are rejected") {
    val r = quotes.select(col("k"), col("t"), col("quote").as("q2"))
      .select(quotes.columns.map { // fresh ids but same k/t names
        case "quote" => col("q2").as("quote2"); case c => col(c).as(c)
      }.toSeq: _*)
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofLeft(quotes, r, Seq("k"), Seq("k"), "t", "t")
    }
    assert(e.getMessage.contains("both sides"))
  }

  test("plans as SortMergeAsofJoin with co-partitioned exchanges") {
    val df = AsofJoin.asofLeft(
      trades, quotes.withColumnRenamed("k", "qk").withColumnRenamed("t", "qt"),
      Seq("k"), Seq("qk"), "t", "qt")
    df.collect() // finalize AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeAsofJoin"), plan)
  }
}
