package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.model.Tables._
import graft.functions.Det._

/** Multi-dimensional aggregation (rollup / cube / grouping sets) and
  * window functions (ranking, frames, lag/lead). Absent from the
  * reference (SURVEY.md §2.2 — no GROUP BY or window anywhere); these are
  * the analytics layer over the sensor-stream analog (`events`).
  *
  * Scale notes: window partitions are keyed on high-cardinality columns
  * (user, customer) so state per partition stays small; rollup/cube
  * expand rows *after* partial aggregation (Expand over grouped data).
  * Group columns are COALESCE'd to 'ALL' so no NULL sort-key ordering
  * differences between engines arise.
  */
object Analytic {

  val all: Seq[Q] = Seq(
    // --- q10: rollup with grouping_id.
    Q(
      "q10_rollup",
      """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, rf, ls""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          grouping_id().cast("bigint").as("gid"),
          count(lit(1)).as("cnt"),
          dsum(col("l_quantity")).as("sum_qty"))
        .select(
          col("gid"),
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("cnt"), col("sum_qty"))
        .orderBy("gid", "rf", "ls")
    },

    // --- q11: cube over two order dimensions.
    Q(
      "q11_cube",
      """SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin
    ) { (s, d) =>
      orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
          grouping_id().cast("bigint").as("gid"),
          count(lit(1)).as("cnt"),
          dsum(col("o_totalprice")).as("sum_price"))
        .select(
          col("gid"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("cnt"), col("sum_price"))
        .orderBy("gid", "status", "priority")
    },

    // --- q12: explicit GROUPING SETS via SQL.
    Q(
      "q12_grouping_sets",
      """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, rf, ls""".stripMargin
    ) { (s, d) =>
      lineitem(s, d).createOrReplaceTempView("gs_lineitem")
      s.sql(
        """SELECT CAST(grouping_id() AS BIGINT) AS gid,
          |  COALESCE(l_returnflag, 'ALL') AS rf,
          |  COALESCE(l_linestatus, 'ALL') AS ls,
          |  COUNT(*) AS cnt
          |FROM gs_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY gid, rf, ls""".stripMargin)
    },

    // --- q27: generator / lateral view (UDTF class): posexplode the
    // first 4 embedding dims into rows, aggregate per position.
    Q(
      "q27_posexplode",
      """SELECT CAST(pos AS INTEGER) AS pos, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) / COUNT(val) AS avg_val
        |FROM (
        |  SELECT p.pos AS pos, embedding[p.pos] AS val
        |  FROM embeddings, LATERAL (SELECT unnest(range(1, 5)) AS pos) p
        |)
        |GROUP BY pos
        |ORDER BY pos""".stripMargin
    ) { (s, d) =>
      embeddings(s, d)
        .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 4)))
        .select((col("pos") + 1).as("pos"), col("col").as("val"))
        .groupBy("pos")
        .agg(count(lit(1)).as("cnt"), davg(col("val").cast("double")).as("avg_val"))
        .orderBy("pos")
    },

    // --- q29: statistical aggregates from exact moments — stddev and
    // variance assembled from decimal-exact Σx and Σx² with the SAME
    // final float formula on both engines (built-in stddev/var use
    // engine-specific accumulation orders and can't hash-match).
    Q(
      "q29_moment_stats",
      """SELECT l_returnflag,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS mean_qty,
        |  (CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE)
        |    - CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
        |      * CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*))
        |    / (COUNT(*) - 1) AS var_qty,
        |  sqrt((CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE)
        |    - CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
        |      * CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*))
        |    / (COUNT(*) - 1)) AS stddev_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      val agg = lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("s1"),
          dsum(col("l_quantity") * col("l_quantity")).as("s2"))
      val variance = (col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)
      agg.select(
          col("l_returnflag"), col("n"),
          (col("s1") / col("n")).as("mean_qty"),
          variance.as("var_qty"),
          sqrt(variance).as("stddev_qty"))
        .orderBy("l_returnflag")
    },

    // --- q49: discrete percentiles (median / p90) — order statistics
    // that RETURN actual data values, so no interpolation float math
    // can diverge between engines (unlike percentile_cont).
    //
    // Computed rank-based rather than with `percentile_disc(...)`:
    // Spark's percentile aggregate buffers every value of a group in
    // one aggregation buffer, which a 100 TB group blows straight
    // through. The sort is RANGE-PARTITIONED on (group, value) — NOT a
    // per-group window, whose parallelism is the number of groups
    // (three return flags over 100 TB = three tasks sorting ~33 TB
    // each). `RankPick.valuesAtRanks` locates each target rank
    // ceil(p·n) — percentile_disc's "smallest v with cume_dist ≥ p",
    // integer arithmetic so no float rounding can shift a rank — from a
    // metadata-sized per-partition count summary and ranks only the few
    // candidate slices. The price percentile needs its own value order,
    // hence a second kernel pass; the two tiny outputs union and pivot.
    Q(
      "q49_percentile_disc",
      """SELECT l_returnflag,
        |  quantile_disc(l_quantity, 0.5) AS median_qty,
        |  quantile_disc(l_quantity, 0.9) AS p90_qty,
        |  quantile_disc(l_extendedprice, 0.5) AS median_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      val li = lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      val qty = RankPick.valuesAtRanks(li, "l_returnflag", "l_quantity",
        Seq("median_qty" -> RankPick.discRank(1, 2),
          "p90_qty" -> RankPick.discRank(9, 10)))
      val price = RankPick.valuesAtRanks(li, "l_returnflag", "l_extendedprice",
        Seq("median_price" -> RankPick.discRank(1, 2)))
      RankPick.pivotLabels(qty.unionByName(price), "l_returnflag",
          Seq("median_qty", "p90_qty", "median_price"))
        .drop("n")
        .orderBy("l_returnflag")
    },

    // --- q96: percentile_cont — the interpolated (SQL-standard
    // continuous) complement of q49's percentile_disc, same distributed
    // shape: range-partitioned rank location (parallelism ∝ partitions,
    // not groups — see q49/RankPick), ONE extra value picked per
    // percentile (the rank above) and a final linear interpolation
    // v_lo + frac·(v_hi − v_lo). The oracle mirrors the interpolation
    // EXPRESSION rather than calling quantile_cont, so both engines run
    // the identical IEEE ops (built-ins differ in interpolation
    // associativity at the last ulp).
    Q(
      "q96_percentile_cont",
      """WITH c AS (
        |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY l_returnflag
        |), r AS (
        |  SELECT l.l_returnflag, l.l_quantity, l.l_extendedprice, c.n,
        |         ROW_NUMBER() OVER (PARTITION BY l.l_returnflag ORDER BY l.l_quantity) AS rq,
        |         ROW_NUMBER() OVER (PARTITION BY l.l_returnflag ORDER BY l.l_extendedprice) AS rp
        |  FROM lineitem l JOIN c ON c.l_returnflag = l.l_returnflag
        |), a AS (
        |  SELECT l_returnflag, MAX(n) AS n,
        |    MAX(CASE WHEN rq = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1 THEN l_quantity END) AS vq50l,
        |    MAX(CASE WHEN rq = CAST(floor((n - 1) * 0.5) AS BIGINT) + 2 THEN l_quantity END) AS vq50h,
        |    MAX(CASE WHEN rq = CAST(floor((n - 1) * 0.9) AS BIGINT) + 1 THEN l_quantity END) AS vq90l,
        |    MAX(CASE WHEN rq = CAST(floor((n - 1) * 0.9) AS BIGINT) + 2 THEN l_quantity END) AS vq90h,
        |    MAX(CASE WHEN rp = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1 THEN l_extendedprice END) AS vp50l,
        |    MAX(CASE WHEN rp = CAST(floor((n - 1) * 0.5) AS BIGINT) + 2 THEN l_extendedprice END) AS vp50h
        |  FROM r GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, n,
        |  CASE WHEN (n - 1) * 0.5 = floor((n - 1) * 0.5) THEN vq50l
        |       ELSE vq50l + ((n - 1) * 0.5 - floor((n - 1) * 0.5)) * (vq50h - vq50l) END AS p50_qty,
        |  CASE WHEN (n - 1) * 0.9 = floor((n - 1) * 0.9) THEN vq90l
        |       ELSE vq90l + ((n - 1) * 0.9 - floor((n - 1) * 0.9)) * (vq90h - vq90l) END AS p90_qty,
        |  CASE WHEN (n - 1) * 0.5 = floor((n - 1) * 0.5) THEN vp50l
        |       ELSE vp50l + ((n - 1) * 0.5 - floor((n - 1) * 0.5)) * (vp50h - vp50l) END AS p50_price
        |FROM a
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      val li = lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      val qty = RankPick.valuesAtRanks(li, "l_returnflag", "l_quantity", Seq(
        "vq50l" -> "CAST(floor((n - 1) * 0.5) AS BIGINT) + 1",
        "vq50h" -> "CAST(floor((n - 1) * 0.5) AS BIGINT) + 2",
        "vq90l" -> "CAST(floor((n - 1) * 0.9) AS BIGINT) + 1",
        "vq90h" -> "CAST(floor((n - 1) * 0.9) AS BIGINT) + 2"))
      val price = RankPick.valuesAtRanks(li, "l_returnflag", "l_extendedprice", Seq(
        "vp50l" -> "CAST(floor((n - 1) * 0.5) AS BIGINT) + 1",
        "vp50h" -> "CAST(floor((n - 1) * 0.5) AS BIGINT) + 2"))
      val a = RankPick.pivotLabels(qty.unionByName(price), "l_returnflag",
        Seq("vq50l", "vq50h", "vq90l", "vq90h", "vp50l", "vp50h"))
      // frac = 0 (single-row groups, or p·(n−1) landing on a rank) must
      // short-circuit to v_lo: the rank-above value may not exist, and
      // 0 · NULL = NULL would swallow the answer
      a.select(
          col("l_returnflag"), col("n"),
          expr("CASE WHEN (n - 1) * 0.5 = floor((n - 1) * 0.5) THEN vq50l " +
            "ELSE vq50l + ((n - 1) * 0.5 - floor((n - 1) * 0.5)) * (vq50h - vq50l) END").as("p50_qty"),
          expr("CASE WHEN (n - 1) * 0.9 = floor((n - 1) * 0.9) THEN vq90l " +
            "ELSE vq90l + ((n - 1) * 0.9 - floor((n - 1) * 0.9)) * (vq90h - vq90l) END").as("p90_qty"),
          expr("CASE WHEN (n - 1) * 0.5 = floor((n - 1) * 0.5) THEN vp50l " +
            "ELSE vp50l + ((n - 1) * 0.5 - floor((n - 1) * 0.5)) * (vp50h - vp50l) END").as("p50_price"))
        .orderBy("l_returnflag")
    },

    // --- q74: approximate percentiles — the at-scale companion of q49:
    // a mergeable fixed-size sketch (Greenwald-Khanna) per group, one
    // partial+final aggregation pass, no sort at all. Like the HLL in
    // q09 it is engine-specific (no DuckDB twin), so the driver records
    // a rows-only check; the ScalaTest spec bounds its error against
    // q49's exact ranks instead.
    Q.noOracle("q74_approx_quantile") { (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("median_qty_approx"),
          percentile_approx(col("l_quantity"), lit(0.9), lit(10000)).as("p90_qty_approx"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("median_price_approx"))
        .orderBy("l_returnflag")
    },

    // --- q13: ranking window — top-3 orders per market segment.
    Q(
      "q13_window_topk",
      """SELECT c_mktsegment, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders JOIN customer ON c_custkey = o_custkey
        |) WHERE rn <= 3
        |ORDER BY c_mktsegment, rn""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .join(customer(s, d), col("c_custkey") === col("o_custkey"))
        .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
        .orderBy("c_mktsegment", "rn")
    },

    // --- q56: ranking-family completeness — dense_rank, ntile,
    // percent_rank, cume_dist (rank arithmetic only: (rank-1)/(n-1)
    // and rank/n divide identical integers on both engines).
    Q(
      "q56_rank_family",
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  CAST(DENSE_RANK() OVER w AS INTEGER) AS drank,
        |  CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cume
        |FROM orders
        |WHERE o_orderkey % 101 = 0
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderstatus, drank, o_orderkey""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .filter(col("o_orderkey") % 101 === 0)
        .select(
          col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          dense_rank().over(w).as("drank"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_orderstatus", "drank", "o_orderkey")
    },

    // --- q57: ordered string aggregation (LISTAGG class): nations per
    // region as a deterministic sorted CSV (sort_array + array_join ≙
    // string_agg ORDER BY).
    Q(
      "q57_string_agg",
      """SELECT r_name,
        |  CAST(COUNT(*) AS BIGINT) AS n_nations,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin
    ) { (s, d) =>
      broadcast(region(s, d))
        .join(nation(s, d), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          count(lit(1)).as("n_nations"),
          array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"))
        .orderBy("r_name")
    },

    // --- q14: frame window — rolling 4-row sum/avg of event values per
    // user (the reference's sensor-analytics analog; decimal-exact frame
    // sums so segment-tree vs streaming frame evaluation can't diverge).
    Q(
      "q14_window_rolling",
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |  CAST(COUNT(value) OVER w AS BIGINT) AS roll_cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS roll_sum,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
        |    / COUNT(value) OVER w AS roll_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
      events(s, d)
        .select(
          col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("value"),
          count(col("value")).over(w).as("roll_cnt"),
          dsumOver(col("value"), w).as("roll_sum"))
        .withColumn("roll_avg", col("roll_sum") / col("roll_cnt"))
        .orderBy("user_id", "event_id")
    },

    // --- q75: RANGE-frame window — trailing 1-hour sum on the event
    // timeline. Unlike q14's ROWS frame (fixed row count), the frame
    // here is value-based: all events within 3600 s of the current
    // event's time, however many there are, and time-ties are peers on
    // both engines by definition of RANGE. Ordering is on the epoch-µs
    // BIGINT (never raw timestamps — interval frame arithmetic and tz
    // rendering differ across engines; integer range offsets cannot).
    Q(
      "q75_range_frame",
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS hour_cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS hour_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-3600000000L, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("value"))
        .select(
          col("user_id"), col("event_id"), col("ts_us"),
          count(lit(1)).over(w).as("hour_cnt"),
          dsumOver(col("value"), w).as("hour_sum"))
        .orderBy("user_id", "event_id")
    },

    // --- q15: lag/lead — per-user deltas between consecutive readings.
    Q(
      "q15_lag_lead",
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |  value - LAG(value) OVER w AS delta_prev,
        |  LEAD(value) OVER w AS next_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .select(
          col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("value"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta_prev"),
          lead(col("value"), 1).over(w).as("next_value"))
        .orderBy("user_id", "event_id")
    },

    // --- q86: windowed distinct counts — per-day DAU plus trailing-7-day
    // WAU, the canonical sliding-distinct. Exact sliding distinct cannot
    // run as a window frame (COUNT(DISTINCT) OVER is unsupported and
    // would buffer the frame anyway); the scale shape is a BOUNDED
    // explode: each event contributes its user to the <= 7 day-labels
    // whose trailing window covers it, then a (day,user) dedup runs
    // map-side partial before the shuffle — so the wire carries at most
    // 7 x |daily actives| rows, never 7 x |events|. The day list to
    // label against is data-derived and tiny (one row per day) ->
    // broadcast semi restriction, no inequality join anywhere.
    Q(
      "q86_windowed_distinct",
      """WITH e AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d, user_id FROM events
        |), days AS (
        |  SELECT DISTINCT d FROM e
        |), dau AS (
        |  SELECT d, CAST(COUNT(*) AS BIGINT) AS n_events,
        |         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM e GROUP BY d
        |), wau AS (
        |  SELECT days.d, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS wau
        |  FROM days JOIN e ON e.d BETWEEN days.d - 6 AND days.d
        |  GROUP BY days.d
        |)
        |SELECT dau.d, dau.n_events, dau.dau, wau.wau
        |FROM dau JOIN wau USING (d)
        |ORDER BY d""".stripMargin
    ) { (s, d) =>
      // (day,user) projection feeds three branches (days, dau, wau) —
      // persist the 2-column intermediate instead of re-scanning events
      val e = events(s, d).select(to_date(col("ts")).as("d"), col("user_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val days = e.select("d").distinct()
      val dau = e.groupBy("d")
        .agg(count(lit(1)).as("n_events"), countDistinct("user_id").as("dau"))
      val wau = e
        .withColumn("off", explode(sequence(lit(0), lit(6))))
        .select(date_add(col("d"), col("off")).as("d"), col("user_id"))
        .join(broadcast(days), Seq("d"))
        .groupBy("d")
        .agg(countDistinct("user_id").as("wau"))
      dau.join(wau, Seq("d"))
        .select(col("d"), col("n_events"), col("dau"), col("wau"))
        .orderBy("d")
    },

    // --- q88: equi-width histogram (width_bucket) — the numeric
    // profiling pass a 100 TB pipeline runs before choosing ANY other
    // bucketing/clipping threshold. Constant bucket edges mean this is
    // a pure single-pass partial+final aggregation with a fixed (21)
    // group count: map-side combine collapses each partition to <= 21
    // rows, the shuffle is measured in kilobytes regardless of input
    // size. Bounds 0..105000 / 21 give an exact 5000.0 double bucket
    // width, so Spark's width_bucket and the oracle's floor division
    // are the same IEEE ops — bit-identical bucket ids.
    Q(
      "q88_histogram",
      """SELECT CAST(floor(l_extendedprice / 5000.0) AS INTEGER) + 1 AS bucket,
        |       CAST((CAST(floor(l_extendedprice / 5000.0) AS INTEGER)) * 5000.0 AS DOUBLE) AS lo_edge,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS total,
        |       MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
        |FROM lineitem
        |GROUP BY 1, 2
        |ORDER BY bucket""".stripMargin
    ) { (s, d) =>
      val b = width_bucket(col("l_extendedprice"), lit(0.0), lit(105000.0), lit(21L))
        .cast("int")
      lineitem(s, d)
        .select(col("l_extendedprice"), b.as("bucket"))
        .withColumn("lo_edge", ((col("bucket") - 1) * 5000.0).cast("double"))
        .groupBy("bucket", "lo_edge")
        .agg(
          count(lit(1)).as("n"),
          dsum(col("l_extendedprice")).as("total"),
          min("l_extendedprice").as("lo"),
          max("l_extendedprice").as("hi"))
        .orderBy("bucket")
    },

    // --- q93: strict-sequence funnel (view → click → purchase): per
    // user, the earliest view, the earliest click AFTER that view, the
    // earliest purchase AFTER that click. Each stage is a filtered
    // partial+final min-aggregation joined on the user key — the type
    // filter pushes to the scan, the join key is the natural
    // partitioning, and nothing ever sorts the raw event log. stage is
    // how deep the user converted.
    Q(
      "q93_funnel",
      """WITH v AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS view_ts
        |  FROM events WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS click_ts
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.view_ts
        |  GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_ts
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.click_ts
        |  GROUP BY e.user_id
        |)
        |SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
        |       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
        |                 WHEN c.user_id IS NOT NULL THEN 2
        |                 ELSE 1 END AS INTEGER) AS stage
        |FROM v LEFT JOIN c ON c.user_id = v.user_id
        |       LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY v.user_id""".stripMargin
    ) { (s, d) =>
      val e = events(s, d).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts_us").as("view_ts"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts_us") > col("view_ts"))
        .groupBy("user_id").agg(min("ts_us").as("click_ts"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("ts_us") > col("click_ts"))
        .groupBy("user_id").agg(min("ts_us").as("purchase_ts"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .withColumn("stage",
          when(col("purchase_ts").isNotNull, 3)
            .when(col("click_ts").isNotNull, 2).otherwise(1))
        .select("user_id", "view_ts", "click_ts", "purchase_ts", "stage")
        .orderBy("user_id")
    },

    // --- q94: cohort retention — users grouped by first-activity day,
    // retention = distinct users active at day offsets 0–7. Two
    // aggregations: cohort assignment is a per-user min (user-sized,
    // tiny next to the event log), joined back on the user key, then a
    // (cohort, offset, user) dedup runs map-side partial before the
    // final count — the same bounded-shuffle shape as q86.
    Q(
      "q94_retention",
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
        |), cohort AS (
        |  SELECT user_id, MIN(d) AS cohort_d FROM e GROUP BY user_id
        |), act AS (
        |  SELECT DISTINCT c.cohort_d, e.d - c.cohort_d AS offset_days, e.user_id
        |  FROM e JOIN cohort c ON c.user_id = e.user_id
        |  WHERE e.d - c.cohort_d BETWEEN 0 AND 7
        |)
        |SELECT cohort_d, CAST(offset_days AS BIGINT) AS offset_days,
        |       CAST(COUNT(*) AS BIGINT) AS n_active
        |FROM act
        |GROUP BY cohort_d, offset_days
        |ORDER BY cohort_d, offset_days""".stripMargin
    ) { (s, d) =>
      val e = events(s, d).select(col("user_id"), to_date(col("ts")).as("d"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cohort = e.groupBy("user_id").agg(min("d").as("cohort_d"))
      e.join(cohort, Seq("user_id"))
        .withColumn("offset_days", datediff(col("d"), col("cohort_d")).cast("long"))
        .filter(col("offset_days").between(0, 7))
        .select("cohort_d", "offset_days", "user_id").distinct()
        .groupBy("cohort_d", "offset_days")
        .agg(count(lit(1)).as("n_active"))
        .orderBy("cohort_d", "offset_days")
    },

    // --- q95: correlation / covariance from EXACT decimal sums — the
    // built-in corr() accumulates doubles in partition order, so its
    // last-ulp result varies with the split layout (non-deterministic
    // at scale, and never bit-equal to another engine). Instead the six
    // sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are computed in
    // TRUE decimal arithmetic — the inputs are 2-dp values, so the
    // DECIMAL(18,2) cast is exact and products/sums stay exact (note
    // NOT the fixed6 kernel: price² ≈ 10¹⁰ would push its ×10⁶ fixed-
    // point beyond double's 2⁵³ exact range) — and the final corr/covar
    // formula runs once on those six scalars: identical IEEE ops in
    // both engines. One caveat pins the output contract at 12 dp: the
    // decimal→double CAST of a sum whose unscaled value exceeds 2⁵³
    // (Σprice² ≈ 7·10¹² at scale 4) is double-rounded by DuckDB
    // (int128→double, then /10⁴) but single-rounded by the JVM's
    // BigDecimal — a 1-ulp divergence ROUND(…, 12) absorbs (the
    // statistic itself is exact to ~15 significant digits).
    // One partial+final pass.
    Q(
      "q95_corr_covar",
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, n,
        |  ROUND((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 12) AS corr_qty_price,
        |  ROUND((sxy - sx * sy / n) / (n - 1), 6) AS covar_samp_qty_price
        |FROM s
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val qd = col("l_quantity").cast(DecimalType(18, 2))
      val pd = col("l_extendedprice").cast(DecimalType(18, 2))
      val stats = lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(qd).cast("double").as("sx"),
          sum(pd).cast("double").as("sy"),
          sum(qd * pd).cast("double").as("sxy"),
          sum(qd * qd).cast("double").as("sxx"),
          sum(pd * pd).cast("double").as("syy"))
      stats.select(
          col("l_returnflag"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
                 (col("n") * col("syy") - col("sy") * col("sy"))), 12)
            .as("corr_qty_price"),
          round((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1), 6)
            .as("covar_samp_qty_price"))
        .orderBy("l_returnflag")
    },

    // --- q105: robust outlier detection via median/MAD — the anomaly
    // gate that survives the anomalies themselves (mean/stddev z-scores
    // are dragged by the outliers they hunt; the median absolute
    // deviation is 50%-breakdown robust). Exact medians run as q49's
    // distributed rank-pick (`RankPick.valuesAtRanks`: range-partitioned
    // rank location, parallelism ∝ partitions not groups, no
    // aggregation buffer to blow through at 100 TB) — once over value
    // order, once over deviation order. Both picked values are raw
    // doubles (no arithmetic), so cross-engine equality is exact; the
    // 5·MAD threshold compare runs the same IEEE ops on both sides.
    Q(
      "q105_mad_outliers",
      """WITH m AS (
        |  SELECT event_type, quantile_disc(value, 0.5) AS med,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY event_type
        |), dv AS (
        |  SELECT e.event_type, abs(e.value - m.med) AS dev, m.med, m.n
        |  FROM events e JOIN m USING (event_type)
        |), md AS (
        |  SELECT event_type, quantile_disc(dev, 0.5) AS mad FROM dv GROUP BY event_type
        |)
        |SELECT dv.event_type, MAX(dv.n) AS n, MAX(dv.med) AS med, MAX(md.mad) AS mad,
        |  CAST(SUM(CASE WHEN dv.dev > 5 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM dv JOIN md USING (event_type)
        |GROUP BY dv.event_type
        |ORDER BY dv.event_type""".stripMargin
    ) { (s, d) =>
      val ev = events(s, d).select(col("event_type"), col("value"))
      val med = RankPick.pivotLabels(
          RankPick.valuesAtRanks(ev, "event_type", "value",
            Seq("med" -> RankPick.MedianRank)),
          "event_type", Seq("med"))
      // dev feeds BOTH the MAD rank-pick and the final threshold agg:
      // lazy persist so the deviation table is computed once (the
      // intermediate a 100 TB run would materialize), not re-derived
      // from a fresh events scan per consumer
      val dv = ev.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("value") - col("med")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mad = RankPick.pivotLabels(
          RankPick.valuesAtRanks(dv, "event_type", "dev",
            Seq("mad" -> RankPick.MedianRank)),
          "event_type", Seq("mad"))
        .drop("n")
      dv.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
          max("n").as("n"),
          max("med").as("med"),
          max("mad").as("mad"),
          sum(when(col("dev") > lit(5) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy("event_type")
    }
  )
}
