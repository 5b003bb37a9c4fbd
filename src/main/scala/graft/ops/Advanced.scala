package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.model.Tables._
import graft.functions.Det._

/** Operators Spark has no single built-in for, composed the way they
  * scale — as-of join, range join, pivot, correlated subqueries.
  *
  * - As-of join: NOT the naive `join(key, t2<=t1) + max` (that fans out
  *   m×n per key before aggregating). Instead: union both sides into one
  *   keyed timeline, single shuffle+sort per key, carry the last order
  *   forward with `last(ignoreNulls)` — the same one-pass merge a
  *   time-series store does, linear at 100 TB.
  * - Range join: bucketize time so the predicate becomes an equi-join on
  *   (key, bucket) with a residual filter — candidate pairs drop from
  *   |key group|² to |bucket|², the standard interval-bucketing trick.
  */
object Advanced {

  val all: Seq[Q] = Seq(
    // --- q50: as-of join — each event matched to the user's latest order
    // with o_orderdate <= ts (DuckDB oracle uses its native ASOF JOIN).
    Q(
      "q50_asof_join",
      """WITH od AS (
        |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate
        |)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |       od.o_orderkey AS matched_orderkey,
        |       epoch_us(od.o_orderdate) AS matched_date_us
        |FROM events e ASOF LEFT JOIN od
        |  ON e.user_id = od.o_custkey AND od.o_orderdate <= e.ts
        |ORDER BY e.event_id""".stripMargin
    ) { (s, d) =>
      // dedupe the right side to one order per (custkey, date): max orderkey
      val od = orders(s, d)
        .groupBy(col("o_custkey").as("k"), col("o_orderdate").as("t"))
        .agg(max("o_orderkey").as("ord_key"))
        .select(col("k"), col("t"), lit(0).as("side"),
          lit(null).cast("long").as("event_id"),
          col("ord_key"), col("t").as("ord_date"))
      val ev = events(s, d)
        .select(col("user_id").as("k"), col("ts").as("t"), lit(1).as("side"),
          col("event_id"),
          lit(null).cast("long").as("ord_key"),
          lit(null).cast("timestamp").as("ord_date"))
      // one timeline per key; orders sort before events at equal t (side
      // 0 < 1) so `<=` semantics hold; last non-null carries forward.
      val w = Window.partitionBy("k").orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      od.unionByName(ev)
        .withColumn("matched_orderkey", last("ord_key", ignoreNulls = true).over(w))
        .withColumn("matched_date", last("ord_date", ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(
          col("event_id"), col("k").as("user_id"), unix_micros(col("t")).as("ts_us"),
          col("matched_orderkey"), unix_micros(col("matched_date")).as("matched_date_us"))
        .orderBy("event_id")
    },

    // --- q64: the SAME as-of semantics as q50, through the engine's
    // native operator (graft.plans.AsofJoin → SortMergeAsofJoinExec):
    // co-partition by key, sort by (key, time), one streaming merge
    // pass — no union row inflation, no window state. The DuckDB oracle
    // is identical to q50's, so the custom operator is cross-checked
    // against both the composed plan and DuckDB's native ASOF JOIN.
    Q(
      "q64_asof_native",
      """WITH od AS (
        |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate
        |)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |       od.o_orderkey AS matched_orderkey,
        |       epoch_us(od.o_orderdate) AS matched_date_us
        |FROM events e ASOF LEFT JOIN od
        |  ON e.user_id = od.o_custkey AND od.o_orderdate <= e.ts
        |ORDER BY e.event_id""".stripMargin
    ) { (s, d) =>
      val od = orders(s, d)
        // NTZ → TIMESTAMP (identity instant under the UTC session) so the
        // merge compares like-typed times and unix_micros applies
        .groupBy(col("o_custkey"), col("o_orderdate").cast("timestamp").as("o_orderdate"))
        .agg(max("o_orderkey").as("matched_orderkey"))
      val ev = events(s, d).select("event_id", "user_id", "ts")
      graft.plans.AsofJoin
        .asofLeft(ev, od, Seq("user_id"), Seq("o_custkey"), "ts", "o_orderdate")
        .select(
          col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("matched_orderkey"),
          unix_micros(col("o_orderdate")).as("matched_date_us"))
        .orderBy("event_id")
    },

    // --- q51: range join — events within the next hour, same user,
    // bucketized to hour grains (each candidate is in bucket b or b+1).
    Q(
      "q51_range_join",
      """SELECT a.event_id, a.user_id, COUNT(b.event_id) AS cnt_next_hour
        |FROM events a LEFT JOIN events b
        |  ON b.user_id = a.user_id
        | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |GROUP BY a.event_id, a.user_id
        |ORDER BY a.event_id""".stripMargin
    ) { (s, d) =>
      val e = events(s, d).select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("bkt", expr("unix_micros(ts) div 3600000000"))
      // each probe event looks in its own hour-bucket and the next one
      val probes = e
        .withColumn("jbkt", explode(array(col("bkt"), col("bkt") + 1)))
        .select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"), col("jbkt"))
      val cands = e.select(col("user_id"), col("event_id").as("b_id"),
        col("ts").as("b_ts"), col("bkt").as("jbkt"))
      probes.join(cands, Seq("user_id", "jbkt"), "left")
        .groupBy(col("a_id").as("event_id"), col("user_id"))
        .agg(sum(when(
          col("b_ts") > col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"), 1).otherwise(0))
          .as("cnt_next_hour"))
        .orderBy("event_id")
    },

    // --- q52: pivot — per-user average value by event type (the oracle
    // is the equivalent conditional aggregation).
    Q(
      "q52_pivot",
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type='click'    THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) / COUNT(CASE WHEN event_type='click'    THEN value END) AS click,
        |  CAST(SUM(CASE WHEN event_type='error'    THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) / COUNT(CASE WHEN event_type='error'    THEN value END) AS error,
        |  CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) / COUNT(CASE WHEN event_type='purchase' THEN value END) AS purchase,
        |  CAST(SUM(CASE WHEN event_type='signup'   THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) / COUNT(CASE WHEN event_type='signup'   THEN value END) AS signup,
        |  CAST(SUM(CASE WHEN event_type='view'     THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) / COUNT(CASE WHEN event_type='view'     THEN value END) AS view
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(davg(col("value")))
        .orderBy("user_id")
    },

    // --- q72: unpivot (melt) — the inverse of q52: wide per-flag
    // measure columns back to tall (flag, measure, value) rows. The
    // unpivot itself is a zero-shuffle map-side Expand over the (tiny)
    // aggregated table; all heavy lifting stays in the preceding
    // partial+final aggregation.
    Q(
      "q72_unpivot",
      s"""WITH wide AS (
         |  SELECT l_returnflag,
         |         ${oSum("l_quantity")} AS sum_qty,
         |         ${oSum("l_extendedprice")} AS sum_price,
         |         ${oSum("l_discount")} AS sum_disc
         |  FROM lineitem GROUP BY l_returnflag
         |)
         |SELECT l_returnflag, measure, value
         |FROM (UNPIVOT wide ON sum_qty, sum_price, sum_disc
         |      INTO NAME measure VALUE value)
         |ORDER BY l_returnflag, measure""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          dsum(col("l_discount")).as("sum_disc"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "measure", "value")
        .orderBy("l_returnflag", "measure")
    },

    // --- q54: time-series gap fill — a generated month calendar LEFT
    // JOINed against sparse monthly revenue, missing months filled with
    // zeros. The calendar side is rows-from-nothing (sequence +
    // explode), the canonical downsample-with-gaps pattern.
    Q(
      "q54_gapfill",
      """WITH sparse AS (
        |  SELECT date_trunc('month', o_orderdate) AS month,
        |         COUNT(*) AS cnt,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS rev
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 450000
        |  GROUP BY 1
        |), b AS (
        |  SELECT min(CAST(date_trunc('month', o_orderdate) AS DATE)) AS lo,
        |         max(CAST(date_trunc('month', o_orderdate) AS DATE)) AS hi
        |  FROM orders
        |), cal AS (
        |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS month FROM b
        |)
        |SELECT cal.month, COALESCE(sparse.cnt, 0) AS cnt, COALESCE(sparse.rev, 0.0) AS rev
        |FROM cal LEFT JOIN sparse ON sparse.month = cal.month
        |ORDER BY cal.month""".stripMargin
    ) { (s, d) =>
      val o = orders(s, d)
      val sparse = o
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 450000)
        .groupBy(trunc(col("o_orderdate").cast("date"), "month").as("month"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("rev"))
      val cal = o
        .agg(
          min(trunc(col("o_orderdate").cast("date"), "month")).as("lo"),
          max(trunc(col("o_orderdate").cast("date"), "month")).as("hi"))
        .select(explode(expr("sequence(lo, hi, INTERVAL 1 MONTH)")).as("month"))
      cal.join(sparse, Seq("month"), "left")
        .select(col("month"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          coalesce(col("rev"), lit(0.0)).as("rev"))
        .orderBy("month")
    },

    // --- q55: batch sessionization — gap-based session ids per user
    // (new session when > 30 min idle), then per-session stats. The
    // lag + running-sum window composite is the batch twin of the
    // streaming session_window in graft.streaming.Streams.
    Q(
      "q55_sessionize",
      """WITH marked AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
        |         OR LAG(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, event_id, ts_us,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_id
        |  FROM marked
        |)
        |SELECT user_id, session_id,
        |  COUNT(*) AS n_events,
        |  MIN(ts_us) AS start_us,
        |  MAX(ts_us) AS end_us,
        |  (MAX(ts_us) - MIN(ts_us)) / 1000000.0 AS duration_s
        |FROM sess
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin
    ) { (s, d) =>
      // both windows order by (ts_us, event_id) — order-isomorphic to
      // (ts, event_id) but syntactically identical between the two
      // specs, so Catalyst satisfies the second Window with the first
      // one's output ordering (one sort, not two)
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val marked = events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
        .withColumn("is_new",
          when(col("ts_us") - lag(col("ts_us"), 1).over(w) > 1800000000L ||
               lag(col("ts_us"), 1).over(w).isNull, 1).otherwise(0))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      marked
        .withColumn("session_id", sum(col("is_new")).over(wRun).cast("int"))
        .groupBy("user_id", "session_id")
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"),
          max(col("ts_us")).as("end_us"),
          ((max(col("ts_us")) - min(col("ts_us"))) / lit(1000000.0)).as("duration_s"))
        .orderBy("user_id", "session_id")
    },

    // --- q53: correlated scalar subquery — orders 1.5× above their
    // customer's decimal-exact average (Catalyst decorrelates this into
    // an aggregate + join; no per-row re-execution).
    Q(
      "q53_corr_subquery",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(o2.o_totalprice)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      orders(s, d).createOrReplaceTempView("sq_orders")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM sq_orders o
          |WHERE o_totalprice > 1.5 * (
          |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(o2.o_totalprice)
          |  FROM sq_orders o2 WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // --- q78: time-series resample + linear interpolation — regularize
    // each (machine, sensor) series onto an hourly grid, interpolating
    // between the surrounding readings. The surrounding readings come
    // from TWO passes of the native as-of join (plans.AsofJoin):
    // backward for the latest reading <= grid point, and forward via
    // time negation (as-of backward on -t IS as-of forward on t), so
    // one operator serves both directions. Scale shape: the grid is
    // generated distributed (sequence+explode per series, no driver
    // loop); each as-of is one co-partitioned sort-merge pass; the
    // DuckDB oracle uses its native ASOF JOIN both ways, cross-checking
    // our operator against an independent implementation AGAIN in the
    // forward direction.
    Q(
      "q78_interp_resample",
      """WITH rd AS (
        |  SELECT machine_id, sensor, t_stamp, MAX(reading) AS reading
        |  FROM (
        |    SELECT concat('M', CAST((user_id % 3) + 1 AS VARCHAR)) AS machine_id,
        |           event_type AS sensor,
        |           value AS reading,
        |           epoch_us(ts) / 1000000.0 AS t_stamp
        |    FROM events)
        |  GROUP BY machine_id, sensor, t_stamp
        |), b AS (
        |  SELECT machine_id, sensor,
        |         CAST(ceil(MIN(t_stamp) / 3600) AS BIGINT) AS h0,
        |         CAST(floor(MAX(t_stamp) / 3600) AS BIGINT) AS h1
        |  FROM rd GROUP BY machine_id, sensor
        |), grid AS (
        |  SELECT machine_id, sensor,
        |         CAST(unnest(range(h0, h1 + 1)) * 3600 AS DOUBLE) AS g
        |  FROM b
        |), p AS (
        |  SELECT grid.machine_id, grid.sensor, grid.g,
        |         rd.t_stamp AS tp, rd.reading AS vp
        |  FROM grid ASOF LEFT JOIN rd
        |    ON grid.machine_id = rd.machine_id AND grid.sensor = rd.sensor
        |   AND rd.t_stamp <= grid.g
        |), n AS (
        |  SELECT grid.machine_id, grid.sensor, grid.g,
        |         rd.t_stamp AS tn, rd.reading AS vn
        |  FROM grid ASOF LEFT JOIN rd
        |    ON grid.machine_id = rd.machine_id AND grid.sensor = rd.sensor
        |   AND rd.t_stamp >= grid.g
        |)
        |SELECT p.machine_id, p.sensor, p.g,
        |       CASE WHEN n.tn = p.tp THEN p.vp
        |            ELSE p.vp + (n.vn - p.vp) * ((p.g - p.tp) / (n.tn - p.tp))
        |       END AS v
        |FROM p JOIN n ON p.machine_id = n.machine_id
        |            AND p.sensor = n.sensor AND p.g = n.g
        |ORDER BY p.machine_id, p.sensor, p.g""".stripMargin
    ) { (s, d) =>
      val rd = graft.pipeline.Pipeline.sensorReadings(s, d)
        .groupBy("machine_id", "sensor", "t_stamp")
        .agg(max("reading").as("reading"))
      val grid = rd.groupBy("machine_id", "sensor")
        .agg(
          ceil(min("t_stamp") / 3600).cast("long").as("h0"),
          floor(max("t_stamp") / 3600).cast("long").as("h1"))
        // a series that never crosses an hour boundary has h0 > h1: the
        // oracle's range() is empty there, but Spark's sequence() runs
        // BACKWARDS — guard, or phantom grid rows appear
        .filter(col("h0") <= col("h1"))
        .select(col("machine_id"), col("sensor"),
          explode(sequence(col("h0"), col("h1"))).as("h"))
        .select(col("machine_id"), col("sensor"),
          (col("h") * 3600).cast("double").as("g"))
        .withColumn("neg_g", -col("g"))
      val prevR = rd.select(
        col("machine_id").as("pm"), col("sensor").as("ps"),
        col("t_stamp").as("tp"), col("reading").as("vp"))
      val nextR = rd.select(
        col("machine_id").as("nm"), col("sensor").as("ns"),
        (-col("t_stamp")).as("neg_tn"), col("t_stamp").as("tn"),
        col("reading").as("vn"))
      val withPrev = graft.plans.AsofJoin.asofLeft(
        grid, prevR, Seq("machine_id", "sensor"), Seq("pm", "ps"), "g", "tp")
      val withBoth = graft.plans.AsofJoin.asofLeft(
        withPrev, nextR, Seq("machine_id", "sensor"), Seq("nm", "ns"), "neg_g", "neg_tn")
      withBoth.select(
        col("machine_id"), col("sensor"), col("g"),
        when(col("tn") === col("tp"), col("vp"))
          .otherwise(col("vp") + (col("vn") - col("vp")) *
            ((col("g") - col("tp")) / (col("tn") - col("tp")))).as("v"))
        .orderBy("machine_id", "sensor", "g")
    },

    // --- q79: exponentially-weighted moving average (bounded kernel):
    // per-user EWMA of event values over the trailing 8 observations,
    // decay 0.75. True EWMA is a recursion no SQL window expresses;
    // the K-term kernel is its standard bounded form (weight beyond 8
    // terms < 0.76) — and unlike the recursion it is PARALLEL: one
    // window sort per key, each row a fixed dot product, identical
    // IEEE arithmetic on both engines (0.75^i are dyadic, written as
    // exact literals, summed in fixed order).
    Q(
      "q79_ewma", {
        val ws = (0 until 8).map(i => math.pow(0.75, i))
        val num = (0 until 8).map(i =>
          if (i == 0) s"COALESCE(value * ${ws(0)}, 0.0)"
          else s"COALESCE(LAG(value, $i) OVER w * ${ws(i)}, 0.0)")
          .mkString(" + ")
        val den = (0 until 8).map(i =>
          if (i == 0) s"(CASE WHEN value IS NULL THEN 0.0 ELSE ${ws(0)} END)"
          else s"(CASE WHEN LAG(value, $i) OVER w IS NULL THEN 0.0 ELSE ${ws(i)} END)")
          .mkString(" + ")
        s"""SELECT event_id, user_id, ($num) / NULLIF(($den), 0.0) AS ewma
           |FROM events
           |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
           |ORDER BY event_id""".stripMargin
      }
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ws = (0 until 8).map(i => math.pow(0.75, i))
      def term(i: Int) =
        if (i == 0) col("value") * ws(0) else lag(col("value"), i).over(w) * ws(i)
      def weight(i: Int) = {
        val x = if (i == 0) col("value") else lag(col("value"), i).over(w)
        when(x.isNull, 0.0).otherwise(ws(i))
      }
      val num = (1 until 8).foldLeft(coalesce(term(0), lit(0.0))) {
        (acc, i) => acc + coalesce(term(i), lit(0.0))
      }
      val den = (1 until 8).foldLeft(weight(0): org.apache.spark.sql.Column)((acc, i) => acc + weight(i))
      events(s, d)
        // den = 0.0 when a row's value and all 7 lags are NULL: Spark's
        // non-ANSI 0/0 is NULL but DuckDB's IEEE float division is NaN —
        // emit NULL explicitly on both engines (oracle uses NULLIF)
        .select(col("event_id"), col("user_id"),
          when(den > 0.0, num / den).as("ewma"))
        .orderBy("event_id")
    },

    // --- q90: SCD2 dimension merge (the parquet-era MERGE INTO): apply
    // a deterministic update batch (20% attribute changes + ~5% new
    // keys, both derived by id hash so the oracle reproduces them) to
    // the customer dimension, emitting history rows — changed keys
    // close their old version (valid_to=2) and insert the new one,
    // unmatched keys pass through, new keys insert. Scale shape: ONE
    // full-outer shuffle join on the key, then each joined row expands
    // to its 1–2 output versions through a Generate — the dim is
    // scanned once, never re-joined per branch (the UNION-of-branches
    // formulation the oracle uses would scan it four times).
    Q(
      "q90_scd2_merge",
      s"""WITH dim AS (SELECT * FROM customer),
         |upd AS (
         |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal,
         |         'SEG' || CAST(c_custkey % 3 AS VARCHAR) AS c_mktsegment
         |  FROM dim WHERE ${oH60("'upd:' || CAST(c_custkey AS VARCHAR)")} % 10 < 2
         |), ins AS (
         |  SELECT c_custkey + 10000000 AS c_custkey, 'NEW ' || c_name AS c_name,
         |         c_nationkey, 500.0 AS c_acctbal, 'SEG_NEW' AS c_mktsegment
         |  FROM dim WHERE ${oH60("'new:' || CAST(c_custkey AS VARCHAR)")} % 20 = 0
         |), batch AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
         |diff AS (
         |  SELECT d.c_custkey,
         |         d.c_name AS o_name, d.c_nationkey AS o_nationkey,
         |         d.c_acctbal AS o_acctbal, d.c_mktsegment AS o_mktsegment,
         |         b.c_name AS n_name, b.c_nationkey AS n_nationkey,
         |         b.c_acctbal AS n_acctbal, b.c_mktsegment AS n_mktsegment,
         |         (d.c_name <> b.c_name OR d.c_nationkey <> b.c_nationkey
         |          OR d.c_acctbal <> b.c_acctbal OR d.c_mktsegment <> b.c_mktsegment) AS changed
         |  FROM dim d JOIN batch b USING (c_custkey)
         |)
         |SELECT c_custkey, o_name AS c_name, o_nationkey AS c_nationkey,
         |       o_acctbal AS c_acctbal, o_mktsegment AS c_mktsegment,
         |       CAST(1 AS BIGINT) AS valid_from, CAST(2 AS BIGINT) AS valid_to, FALSE AS is_current
         |FROM diff WHERE changed
         |UNION ALL
         |SELECT c_custkey, n_name, n_nationkey, n_acctbal, n_mktsegment,
         |       CAST(2 AS BIGINT), CAST(NULL AS BIGINT), TRUE
         |FROM diff WHERE changed
         |UNION ALL
         |SELECT c_custkey, o_name, o_nationkey, o_acctbal, o_mktsegment,
         |       CAST(1 AS BIGINT), CAST(NULL AS BIGINT), TRUE
         |FROM diff WHERE NOT changed
         |UNION ALL
         |SELECT d.c_custkey, d.c_name, d.c_nationkey, d.c_acctbal, d.c_mktsegment,
         |       CAST(1 AS BIGINT), CAST(NULL AS BIGINT), TRUE
         |FROM dim d WHERE NOT EXISTS (SELECT 1 FROM batch b WHERE b.c_custkey = d.c_custkey)
         |UNION ALL
         |SELECT b.c_custkey, b.c_name, b.c_nationkey, b.c_acctbal, b.c_mktsegment,
         |       CAST(2 AS BIGINT), CAST(NULL AS BIGINT), TRUE
         |FROM batch b WHERE NOT EXISTS (SELECT 1 FROM dim d WHERE d.c_custkey = b.c_custkey)
         |ORDER BY c_custkey, valid_from""".stripMargin
    ) { (s, d) =>
      val attrs = Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      val dim = customer(s, d)
      val upd = dim
        .filter(h60(concat(lit("upd:"), col("c_custkey").cast("string"))) % 10 < 2)
        .select(
          col("c_custkey"), col("c_name"), col("c_nationkey"),
          (col("c_acctbal") + 100.0).as("c_acctbal"),
          concat(lit("SEG"), (col("c_custkey") % 3).cast("string")).as("c_mktsegment"))
      val ins = dim
        .filter(h60(concat(lit("new:"), col("c_custkey").cast("string"))) % 20 === 0)
        .select(
          (col("c_custkey") + 10000000L).as("c_custkey"),
          concat(lit("NEW "), col("c_name")).as("c_name"),
          col("c_nationkey"), lit(500.0).as("c_acctbal"), lit("SEG_NEW").as("c_mktsegment"))
      val batch = upd.unionByName(ins)
      val o = dim.select(col("c_custkey") +: attrs.map(a => col(a).as(s"o_$a")): _*)
      val n = batch.select(col("c_custkey") +: attrs.map(a => col(a).as(s"n_$a")): _*)
      val nullTo = lit(null).cast("bigint")
      def version(pfx: String, from: Int, to: org.apache.spark.sql.Column, cur: Boolean) =
        struct(
          col(s"${pfx}c_name").as("c_name"), col(s"${pfx}c_nationkey").as("c_nationkey"),
          col(s"${pfx}c_acctbal").as("c_acctbal"), col(s"${pfx}c_mktsegment").as("c_mktsegment"),
          lit(from.toLong).as("valid_from"), to.as("valid_to"), lit(cur).as("is_current"))
      val changed = attrs
        .map(a => col(s"o_$a") =!= col(s"n_$a"))
        .reduce(_ || _)
      o.join(n, Seq("c_custkey"), "full_outer")
        .withColumn("versions",
          when(col("o_c_name").isNull, array(version("n_", 2, nullTo, cur = true)))
            .when(col("n_c_name").isNull, array(version("o_", 1, nullTo, cur = true)))
            .when(changed, array(
              version("o_", 1, lit(2L), cur = false),
              version("n_", 2, nullTo, cur = true)))
            .otherwise(array(version("o_", 1, nullTo, cur = true))))
        .select(col("c_custkey"), explode(col("versions")).as("v"))
        .select(col("c_custkey"), col("v.*"))
        .orderBy("c_custkey", "valid_from")
    },

    // --- q91: CDC changelog compaction — keep the latest version per
    // (user_id, event_type) key, treating events as an upsert stream.
    // Deliberately an AGGREGATE (max_by over a single wide ordering
    // scalar: ts_us·10⁶ + event_id, decimal so it cannot overflow), not
    // a row_number window: partial max_by combines map-side, so each
    // partition ships one candidate row per key instead of sorting the
    // full changelog — at 100 TB that is the difference between a
    // key-sized shuffle and a data-sized sort. The same shape Kafka log
    // compaction / a CDC materializer uses.
    Q(
      "q91_cdc_compact",
      """WITH c AS (
        |  SELECT user_id, event_type,
        |         CAST(epoch_us(ts) AS HUGEINT) * 1000000 + event_id AS ord,
        |         value, epoch_us(ts) AS ts_us, event_id
        |  FROM events
        |)
        |SELECT user_id, event_type,
        |       max_by(value, ord) AS last_value,
        |       CAST(max_by(ts_us, ord) AS BIGINT) AS last_ts_us,
        |       CAST(max_by(event_id, ord) AS BIGINT) AS last_event_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_versions
        |FROM c
        |GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val ord = (unix_micros(col("ts")).cast(DecimalType(38, 0)) * 1000000)
        .+(col("event_id")).as("ord")
      events(s, d)
        .select(col("user_id"), col("event_type"), ord,
          col("value"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
        .groupBy("user_id", "event_type")
        .agg(
          max_by(col("value"), col("ord")).as("last_value"),
          max_by(col("ts_us"), col("ord")).as("last_ts_us"),
          max_by(col("event_id"), col("ord")).as("last_event_id"),
          count(lit(1)).as("n_versions"))
        .orderBy("user_id", "event_type")
    },

    // --- q97: batch sessionization via the BUILT-IN session_window —
    // the operator surface q55 composes by hand (lag → gap flag →
    // cumulative session id). session_window runs as a dedicated
    // merging-session aggregation: one shuffle on the user key, sessions
    // merged in-place without materializing per-event session ids — at
    // 100 TB the composed form pays a full window sort THEN an
    // aggregation, while this is aggregation-only. Spark defines the
    // window end as last_event + gap, so the oracle emits
    // max(ts)+gap, not max(ts).
    Q(
      "q97_session_window",
      """WITH marked AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
        |         OR LAG(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sess AS (
        |  SELECT user_id, ts_us,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |                      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM marked
        |)
        |SELECT user_id,
        |  MIN(ts_us) AS start_us,
        |  MAX(ts_us) + 1800000000 AS wend_us,
        |  COUNT(*) AS n_events
        |FROM sess
        |GROUP BY user_id, session_id
        |ORDER BY user_id, start_us""".stripMargin
    ) { (s, d) =>
      events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("user_id"),
          unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("wend_us"),
          col("n_events"))
        .orderBy("user_id", "start_us")
    },

    // --- q102: time-weighted average — the correct mean for
    // irregularly-sampled sensor/metric series (a reading "holds" until
    // the next one, so each value is weighted by how long it was
    // current; an unweighted AVG over-counts bursts). One window shuffle
    // on the series key, then a plain aggregate. Determinism: the
    // value×duration products are summed as exact DECIMAL(38,0) fixed-
    // point (value at 10⁻⁶ resolution × integer microseconds — a
    // long×long product can reach 10²¹ and overflow, decimal cannot),
    // so the sum is order-independent and bit-identical to the oracle;
    // the single final division is pinned with ROUND.
    Q(
      "q102_time_weighted_avg",
      """WITH seq AS (
        |  SELECT user_id, value, epoch_us(ts) AS ts_us,
        |    LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_us
        |  FROM events
        |)
        |SELECT user_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_holds,
        |  CAST(SUM(next_us - ts_us) AS BIGINT) AS dur_us,
        |  ROUND(CAST(SUM(CAST(CAST(round(value * 1e6) AS BIGINT) AS DECIMAL(38,0))
        |                 * (next_us - ts_us)) AS DOUBLE)
        |        / 1e6 / SUM(next_us - ts_us), 12) AS twa_value
        |FROM seq
        |WHERE next_us IS NOT NULL
        |GROUP BY user_id
        |HAVING SUM(next_us - ts_us) > 0
        |ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .select(col("user_id"), col("value"), unix_micros(col("ts")).as("ts_us"),
          lead(unix_micros(col("ts")), 1).over(w).as("next_us"))
        .filter(col("next_us").isNotNull)
        .withColumn("dt", col("next_us") - col("ts_us"))
        .withColumn("v6",
          round(col("value") * 1e6).cast("long").cast(DecimalType(38, 0)))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_holds"),
          sum(col("dt")).as("dur_us"),
          round(sum(col("v6") * col("dt")).cast("double") / 1e6 / sum(col("dt")), 12)
            .as("twa_value"))
        .filter(col("dur_us") > 0)
        .orderBy("user_id")
    },

    // --- q104: Z-order (Morton) clustering key — the multi-dimensional
    // data-layout primitive: writing a 100 TB table sorted by the
    // bit-interleaved key clusters rows that are close in BOTH
    // dimensions into the same files, so min/max file statistics prune
    // scans for predicates on EITHER column (a single-column sort only
    // prunes one). The key is a pure bit-twiddling Column expression
    // (codegen'd shifts/masks, no UDF); the audit below groups by
    // z-bucket and reports each bucket's bounding box — locality means
    // small boxes. The same expression would feed
    // `df.orderBy(zorder).write` as a repartitionByRange clustering key.
    Q(
      "q104_zorder_layout", {
        def oz(c: String, off: Int) = (0 until 8)
          .map(i => s"((($c >> $i) & 1) << ${2 * i + off})")
          .mkString(" + ")
        s"""WITH z AS (
           |  SELECT ${oz("(l_partkey % 256)", 1)} + ${oz("(l_suppkey % 256)", 0)} AS zv,
           |         l_partkey % 256 AS px, l_suppkey % 256 AS sx
           |  FROM lineitem
           |)
           |SELECT zv // 1024 AS z_bucket,
           |  CAST(COUNT(*) AS BIGINT) AS cnt,
           |  MIN(px) AS min_px, MAX(px) AS max_px,
           |  MIN(sx) AS min_sx, MAX(sx) AS max_sx,
           |  CAST((MAX(px) - MIN(px) + 1) * (MAX(sx) - MIN(sx) + 1) AS BIGINT) AS bbox_area
           |FROM z
           |GROUP BY z_bucket
           |ORDER BY z_bucket""".stripMargin
      }
    ) { (s, d) =>
      def interleave(c: org.apache.spark.sql.Column, off: Int) = (0 until 8)
        .map(i => shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), 2 * i + off))
        .reduce((a, b) => a + b)
      val li = lineitem(s, d)
        .select(pmod(col("l_partkey"), lit(256L)).as("px"),
          pmod(col("l_suppkey"), lit(256L)).as("sx"))
        .withColumn("zv", interleave(col("px"), 1) + interleave(col("sx"), 0))
      li.groupBy((col("zv") / 1024).cast("long").as("z_bucket"))
        .agg(
          count(lit(1)).as("cnt"),
          min("px").as("min_px"), max("px").as("max_px"),
          min("sx").as("min_sx"), max("sx").as("max_sx"),
          ((max("px") - min("px") + 1) * (max("sx") - min("sx") + 1))
            .cast("long").as("bbox_area"))
        .orderBy("z_bucket")
    },

    // --- q132: PAGERANK over the nation trade graph (customer nation →
    // supplier nation across every lineitem, plus a self-loop per
    // nation so no node dangles), 3 unrolled power iterations at
    // damping 0.85. ALL arithmetic is EXACT-INTEGER: scores live in
    // 10^12 fixed-point micro-units and every step is integer
    // division/multiplication, identically parenthesized in both
    // engines — associative, shuffle-order-proof, hash-exact with zero
    // float tolerance. Scale shape: each iteration is one equi-join of
    // the edge list against a V-sized rank table + a partial+final sum
    // by dst — the textbook distributed PageRank step (edges sharded,
    // ranks broadcast-or-shuffled by key); iterations are a fixed
    // unrolled count, no driver-side convergence loop.
    Q(
      "q132_pagerank",
      """WITH nodes AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS v FROM nation
        |), e0 AS (
        |  SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
        |                  CAST(s.s_nationkey AS BIGINT) AS dst
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |), edges AS (
        |  SELECT src, dst FROM e0 UNION SELECT v, v FROM nodes
        |), outdeg AS (
        |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
        |), p0 AS (
        |  SELECT v, 1000000000000 // (SELECT COUNT(*) FROM nodes) AS p
        |  FROM nodes
        |), i1 AS (
        |  SELECT n.v, 3 * (1000000000000 // (SELECT COUNT(*) FROM nodes)) // 20
        |           + (17 * COALESCE(c.sc, 0)) // 20 AS p
        |  FROM nodes n LEFT JOIN (
        |    SELECT e.dst AS v2, CAST(SUM(pp.p // d.deg) AS BIGINT) AS sc
        |    FROM edges e JOIN p0 pp ON e.src = pp.v JOIN outdeg d ON e.src = d.src
        |    GROUP BY e.dst
        |  ) c ON n.v = c.v2
        |), i2 AS (
        |  SELECT n.v, 3 * (1000000000000 // (SELECT COUNT(*) FROM nodes)) // 20
        |           + (17 * COALESCE(c.sc, 0)) // 20 AS p
        |  FROM nodes n LEFT JOIN (
        |    SELECT e.dst AS v2, CAST(SUM(pp.p // d.deg) AS BIGINT) AS sc
        |    FROM edges e JOIN i1 pp ON e.src = pp.v JOIN outdeg d ON e.src = d.src
        |    GROUP BY e.dst
        |  ) c ON n.v = c.v2
        |), i3 AS (
        |  SELECT n.v, 3 * (1000000000000 // (SELECT COUNT(*) FROM nodes)) // 20
        |           + (17 * COALESCE(c.sc, 0)) // 20 AS p
        |  FROM nodes n LEFT JOIN (
        |    SELECT e.dst AS v2, CAST(SUM(pp.p // d.deg) AS BIGINT) AS sc
        |    FROM edges e JOIN i2 pp ON e.src = pp.v JOIN outdeg d ON e.src = d.src
        |    GROUP BY e.dst
        |  ) c ON n.v = c.v2
        |)
        |SELECT v AS nation, CAST(p AS BIGINT) AS pr
        |FROM i3 ORDER BY nation""".stripMargin
    ) { (s, d) =>
      val nodes = nation(s, d).select(col("n_nationkey").cast("long").as("v"))
      val e0 = lineitem(s, d).select("l_orderkey", "l_suppkey")
        .join(orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d).select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier(s, d).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").cast("long").as("src"),
          col("s_nationkey").cast("long").as("dst"))
      val edges = e0
        .unionByName(nodes.select(col("v").as("src"), col("v").as("dst")))
        .distinct()
      val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val n = nodes.count() // 25 nations at every SF — a tiny eager count
      val base = 3L * (1000000000000L / n) / 20L
      var pr = nodes.select(col("v"), lit(1000000000000L / n).as("p"))
      for (_ <- 1 to 3) {
        val contrib = edges
          .join(pr.withColumnRenamed("v", "src"), Seq("src"))
          .join(outdeg, Seq("src"))
          .select(col("dst"), expr("p div deg").as("c"))
          .groupBy("dst").agg(sum("c").as("sc"))
        pr = nodes.join(contrib, nodes("v") === contrib("dst"), "left")
          .select(col("v"),
            (lit(base) + expr("(17 * coalesce(sc, 0L)) div 20")).as("p"))
      }
      pr.select(col("v").as("nation"), col("p").cast("long").as("pr"))
        .orderBy("nation")
    },

    // --- q133: SINGLE-SOURCE SHORTEST PATHS over the weighted nation
    // trade graph — min-plus relaxation (distributed Bellman-Ford),
    // 3 unrolled rounds from source nation 0. Edge weight = the
    // cheapest single shipment between the two nations (MIN l_quantity,
    // an exact integer), so distances stay in exact-integer arithmetic
    // and hash bit-identically. Each round is one edges⋈dist equi-join
    // + a min-by-dst — the scalable SSSP step (edges sharded by src,
    // frontier shuffled by key); unreached nodes surface as NULL, and
    // 3 rounds bound the path length exactly like the oracle's
    // unrolling. The trade graph is near-complete, so 3 hops already
    // stabilizes most of the frontier — the point is the operator
    // shape, not a convergence loop.
    Q(
      "q133_shortest_path",
      """WITH e0 AS (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
        |         CAST(s.s_nationkey AS BIGINT) AS dst,
        |         CAST(MIN(l.l_quantity) AS BIGINT) AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2
        |), nodes AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS v FROM nation
        |), d0 AS (
        |  SELECT v, CASE WHEN v = 0 THEN CAST(0 AS BIGINT) ELSE NULL END AS dist
        |  FROM nodes
        |), d1 AS (
        |  SELECT n.v, LEAST(COALESCE(n.dist, 9223372036854775807),
        |                    COALESCE(r.nd, 9223372036854775807)) AS raw
        |  FROM d0 n LEFT JOIN (
        |    SELECT e.dst AS v2, MIN(p.dist + e.w) AS nd
        |    FROM e0 e JOIN d0 p ON e.src = p.v WHERE p.dist IS NOT NULL
        |    GROUP BY e.dst
        |  ) r ON n.v = r.v2
        |), d1n AS (
        |  SELECT v, CASE WHEN raw = 9223372036854775807 THEN NULL ELSE raw END AS dist FROM d1
        |), d2 AS (
        |  SELECT n.v, LEAST(COALESCE(n.dist, 9223372036854775807),
        |                    COALESCE(r.nd, 9223372036854775807)) AS raw
        |  FROM d1n n LEFT JOIN (
        |    SELECT e.dst AS v2, MIN(p.dist + e.w) AS nd
        |    FROM e0 e JOIN d1n p ON e.src = p.v WHERE p.dist IS NOT NULL
        |    GROUP BY e.dst
        |  ) r ON n.v = r.v2
        |), d2n AS (
        |  SELECT v, CASE WHEN raw = 9223372036854775807 THEN NULL ELSE raw END AS dist FROM d2
        |), d3 AS (
        |  SELECT n.v, LEAST(COALESCE(n.dist, 9223372036854775807),
        |                    COALESCE(r.nd, 9223372036854775807)) AS raw
        |  FROM d2n n LEFT JOIN (
        |    SELECT e.dst AS v2, MIN(p.dist + e.w) AS nd
        |    FROM e0 e JOIN d2n p ON e.src = p.v WHERE p.dist IS NOT NULL
        |    GROUP BY e.dst
        |  ) r ON n.v = r.v2
        |)
        |SELECT v AS nation,
        |       CASE WHEN raw = 9223372036854775807 THEN NULL
        |            ELSE CAST(raw AS BIGINT) END AS dist
        |FROM d3 ORDER BY nation""".stripMargin
    ) { (s, d) =>
      val inf = Long.MaxValue
      val nodes = nation(s, d).select(col("n_nationkey").cast("long").as("v"))
      val e0 = lineitem(s, d).select("l_orderkey", "l_suppkey", "l_quantity")
        .join(orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d).select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier(s, d).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(col("c_nationkey").cast("long").as("src"),
          col("s_nationkey").cast("long").as("dst"))
        .agg(min(col("l_quantity")).cast("long").as("w"))
      var dist = nodes.select(col("v"),
        when(col("v") === 0L, lit(0L)).otherwise(lit(null).cast("long")).as("dist"))
      for (_ <- 1 to 3) {
        val relaxed = e0.join(
            dist.filter(col("dist").isNotNull).withColumnRenamed("v", "src"),
            Seq("src"))
          .groupBy(col("dst").as("v2"))
          .agg(min(col("dist") + col("w")).as("nd"))
        dist = dist.join(relaxed, dist("v") === relaxed("v2"), "left")
          .select(col("v"),
            least(coalesce(col("dist"), lit(inf)), coalesce(col("nd"), lit(inf))).as("raw"))
          .select(col("v"),
            when(col("raw") === inf, lit(null).cast("long"))
              .otherwise(col("raw")).as("dist"))
      }
      dist.select(col("v").as("nation"), col("dist"))
        .orderBy("nation")
    }
  )
}
