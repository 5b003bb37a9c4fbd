package graft.ops

import org.apache.spark.sql.functions._
import graft.Q
import graft.model.Tables._
import graft.functions.Det._

/** Core relational operators over the harness tables: scan, filter,
  * projection, hash aggregation, every join flavor, set ops, sort/top-k.
  * (Capability audit: SURVEY.md §2.2 — the reference has projection only,
  * `/root/reference/consumer/sensor_data_consumer.py:116-122`; the rest is
  * the analytics surface this engine supplies.)
  *
  * Scale notes: dims (`region`, `nation`) are explicitly broadcast;
  * fact-fact joins shuffle on their keys and rely on AQE for skew; every
  * aggregate uses exact decimal sums (see [[graft.functions.Det]]) so
  * results are partition-order-independent — a 1000-executor cluster
  * produces the same bits as local[32].
  */
object Relational {

  val all: Seq[Q] = Seq(
    // --- q01: pricing summary (TPC-H Q1 shape): scan → filter → hash agg.
    // Partial aggregation is map-side; 6 groups → tiny shuffle at any SF.
    Q(
      "q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // --- q02: predicate pushdown + column pruning; both filters reach the
    // parquet scan (verify via .explain: PushedFilters on l_shipdate).
    Q(
      "q02_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |       CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .filter(
          col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")) &&
          col("l_discount") > 0.05)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_shipdate").cast("date").as("ship_date"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // --- q03: 3-way fact join + agg + top-k (TPC-H Q3 shape). customer is
    // filtered before the join (segment predicate pushed to scan); the
    // orders⋈lineitem join shuffles on orderkey.
    Q(
      "q03_shipping_priority",
      """SELECT l_orderkey,
        |  CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  CAST(o_orderdate AS DATE) AS order_date
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin
    ) { (s, d) =>
      customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < to_timestamp(lit("1998-03-15 00:00:00")))
        .join(lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > to_timestamp(lit("1996-03-15 00:00:00")))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("order_date"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select("l_orderkey", "revenue", "order_date")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    },

    // --- q04: star join with explicit broadcast of the two dim tables —
    // at 100 TB region/nation stay KB-sized, so the 5-way join costs one
    // fact shuffle (orders⋈lineitem) plus broadcast hash joins.
    Q(
      "q04_region_revenue",
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM region
        |JOIN nation   ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders   ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin
    ) { (s, d) =>
      broadcast(region(s, d))
        .join(broadcast(nation(s, d)), col("n_regionkey") === col("r_regionkey"))
        .join(customer(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(orders(s, d), col("o_custkey") === col("c_custkey"))
        .join(lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("r_name", "n_name")
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },

    // --- q05: left-semi join (EXISTS). The semi join short-circuits on
    // first match — no fan-out, output bounded by the left side.
    Q(
      "q05_semi_join",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_discount >= 0.09)
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      orders(s, d)
        .join(
          lineitem(s, d).filter(col("l_discount") >= 0.09),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // --- q06: left-anti join (NOT EXISTS): customers with no recent order.
    Q(
      "q06_anti_join",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      customer(s, d)
        .join(
          orders(s, d).filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01 00:00:00"))),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // --- q07: left outer join + agg with empty-group handling.
    Q(
      "q07_outer_join_agg",
      """SELECT c_custkey,
        |  COUNT(o_orderkey) AS order_cnt,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      customer(s, d)
        .join(orders(s, d), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("order_cnt"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
        .orderBy("c_custkey")
    },

    // --- q08: distinct aggregation (exact). Catalyst expands this into a
    // two-phase aggregate; the distinct keyspace (25 nations) is tiny.
    Q(
      "q08_distinct_agg",
      """SELECT c_mktsegment,
        |  COUNT(*) AS n_customers,
        |  COUNT(DISTINCT c_nationkey) AS n_nations,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin
    ) { (s, d) =>
      customer(s, d)
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_customers"),
          countDistinct(col("c_nationkey")).as("n_nations"),
          davg(col("c_acctbal")).as("avg_bal"))
        .orderBy("c_mktsegment")
    },

    // --- q09: approximate distinct (HLL). No oracle: DuckDB's approx HLL
    // yields different estimates; driver rows-only check. At 100 TB this
    // is the right default for cardinality (no exact-distinct shuffle).
    Q.noOracle("q09_approx_distinct") { (s, d) =>
      orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          approx_count_distinct(col("o_custkey"), 0.01).as("approx_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },

    // --- q24: custom typed UDAF (Aggregator extension point): exact
    // weighted mean of price by quantity — see
    // [[graft.functions.WeightedMean]] for the determinism contract.
    Q(
      "q24_custom_udaf",
      s"""SELECT l_returnflag,
         |  ${graft.functions.WeightedMean.oracle("l_extendedprice", "l_quantity")} AS wavg_price,
         |  COUNT(*) AS cnt
         |FROM lineitem
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          graft.functions.WeightedMean(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    },

    // --- q28: salted two-phase aggregation — the skew pattern. events
    // has ~15 distinct users, so a plain groupBy(user_id) funnels whole
    // users into single tasks; salting by event_id%16 spreads the
    // partial aggregation across 16× more keys, and the exact decimal
    // partials merge to bit-identical results (the oracle is the PLAIN
    // group-by — proving salting is semantics-free).
    Q(
      "q28_salted_agg",
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value) AS avg_value
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val partial = events(s, d)
        .withColumn("salt", pmod(col("event_id"), lit(16)))
        .groupBy("user_id", "salt")
        .agg(
          count(lit(1)).as("pc"),           // all rows (oracle COUNT(*))
          count(col("value")).as("pv"),     // non-null (oracle COUNT(value))
          sum(col("value").cast(DecimalType(38, 6))).as("ps"))
      partial
        .groupBy("user_id")
        .agg(
          sum(col("pc")).as("n_events"),
          (sum(col("ps")).cast("double") / sum(col("pv"))).as("avg_value"))
        .orderBy("user_id")
    },

    // --- q16: global sort + limit (top-k). Spark runs TakeOrderedAndProject:
    // per-partition heap + driver merge — no full sort at scale.
    Q(
      "q16_top_orders",
      """SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS order_date
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin
    ) { (s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate").cast("date").as("order_date"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // --- q17: set operations (UNION distinct / INTERSECT / EXCEPT).
    Q(
      "q17_set_ops",
      """SELECT op, cnt FROM (
        |  SELECT 'union_distinct' AS op, COUNT(*) AS cnt FROM (
        |    SELECT DISTINCT c_custkey FROM (
        |      SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |      UNION ALL
        |      SELECT c_custkey FROM customer WHERE c_acctbal > 5000))
        |  UNION ALL
        |  SELECT 'intersect', COUNT(*) FROM (
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |    INTERSECT
        |    SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |  UNION ALL
        |  SELECT 'except', COUNT(*) FROM (
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |    EXCEPT
        |    SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |) ORDER BY op""".stripMargin
    ) { (s, d) =>
      val auto = customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
      val rich = customer(s, d).filter(col("c_acctbal") > 5000).select("c_custkey")
      val u = auto.union(rich).distinct().agg(count(lit(1)).as("cnt"))
        .select(lit("union_distinct").as("op"), col("cnt"))
      val i = auto.intersect(rich).agg(count(lit(1)).as("cnt"))
        .select(lit("intersect").as("op"), col("cnt"))
      val e = auto.except(rich).agg(count(lit(1)).as("cnt"))
        .select(lit("except").as("op"), col("cnt"))
      u.unionByName(i).unionByName(e).orderBy("op")
    },

    // --- q71: multiset set ops (EXCEPT ALL / INTERSECT ALL) — the
    // bag-semantics counterparts of q17, preserving multiplicity. The
    // result multisets are re-aggregated to (op, priority, count) so the
    // output is small and totally ordered regardless of scale.
    Q(
      "q71_set_ops_all",
      """WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE o_totalprice > 300000),
        |     b AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderdate >= DATE '1997-01-01')
        |SELECT op, p, cnt FROM (
        |  SELECT 'except_all' AS op, p, COUNT(*) AS cnt FROM (
        |    SELECT p FROM a EXCEPT ALL SELECT p FROM b) GROUP BY p
        |  UNION ALL
        |  SELECT 'intersect_all', p, COUNT(*) FROM (
        |    SELECT p FROM a INTERSECT ALL SELECT p FROM b) GROUP BY p
        |) ORDER BY op, p""".stripMargin
    ) { (s, d) =>
      val a = orders(s, d).filter(col("o_totalprice") > 300000)
        .select(col("o_orderpriority").as("p"))
      val b = orders(s, d).filter(col("o_orderdate") >= lit("1997-01-01").cast("date"))
        .select(col("o_orderpriority").as("p"))
      val ea = a.exceptAll(b).groupBy("p").agg(count(lit(1)).as("cnt"))
        .select(lit("except_all").as("op"), col("p"), col("cnt"))
      val ia = a.intersectAll(b).groupBy("p").agg(count(lit(1)).as("cnt"))
        .select(lit("intersect_all").as("op"), col("p"), col("cnt"))
      ea.unionByName(ia).orderBy("op", "p")
    },

    // --- q84: runtime bloom-filter join — the 100 TB shuffle-join
    // pattern when the dim is too big to broadcast. A selective filter
    // on `part` makes Catalyst's InjectRuntimeFilter build a bloom
    // filter over the surviving p_partkeys and push `might_contain`
    // into the lineitem scan, so most fact rows die at the scan instead
    // of crossing the shuffle. Thresholds are lowered via a derived
    // session because the production defaults (10 GB application-side
    // scan) only trip at real scale; semantics are untouched — the
    // oracle is the PLAIN join (bloom false positives are re-checked by
    // the join itself). `BloomJoinSpec` asserts the filter is actually
    // in the optimized plan.
    Q(
      "q84_bloom_join",
      """SELECT p.p_brand, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_size <= 10 AND p.p_type = 'PROMO'
        |GROUP BY p.p_brand
        |ORDER BY p.p_brand""".stripMargin
    ) { (s, d) =>
      val s2 = graft.Sessions.derived(s,
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
      val p = part(s2, d)
        .filter(col("p_size") <= 10 && col("p_type") === "PROMO")
        .select("p_partkey", "p_brand")
      lineitem(s2, d)
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n_items"),
          graft.functions.Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy("p_brand")
    },

    // --- q87: salted skew JOIN (the join-side counterpart of q28's
    // salted agg). events has ~15 users, so a shuffle join keyed on
    // user_id alone lands each user's millions of rows in ONE task;
    // salting the fact side by event_id%8 and exploding the per-user
    // dim ×8 spreads every user over 8 tasks with zero semantic change
    // (oracle = the plain join). Broadcast is disabled in the derived
    // session because this pattern exists precisely for dims too big to
    // broadcast — with a broadcastable dim you'd broadcast instead.
    // AQE skew-split is the runtime alternative; explicit salting is
    // the deterministic-partitioning variant that also fixes skew in
    // the SORT within each task.
    Q(
      "q87_salted_join",
      """WITH ua AS (
        |  SELECT user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value) AS avg_v
        |  FROM events GROUP BY user_id
        |)
        |SELECT e.user_id, COUNT(*) AS n_above,
        |       CAST(MAX(e.value - ua.avg_v) AS DOUBLE) AS max_excess
        |FROM events e JOIN ua ON e.user_id = ua.user_id
        |WHERE e.value > ua.avg_v
        |GROUP BY e.user_id
        |ORDER BY e.user_id""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val s2 = graft.Sessions.derived(s,
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      val ev = events(s2, d)
      val ua = ev.groupBy("user_id")
        .agg((sum(col("value").cast(DecimalType(38, 6))).cast("double") / count(col("value"))).as("avg_v"))
        .withColumn("salt", explode(sequence(lit(0), lit(7))))
      ev.select(col("user_id"), col("value"), col("event_id"))
        .withColumn("salt", pmod(col("event_id"), lit(8)).cast("int"))
        .join(ua, Seq("user_id", "salt"))
        .filter(col("value") > col("avg_v"))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_above"),
          max(col("value") - col("avg_v")).cast("double").as("max_excess"))
        .orderBy("user_id")
    },

    // --- q99: referential-integrity audit — orphan counts across the
    // star schema's foreign keys, the data-quality check every
    // warehouse load gate runs. Each FK edge costs exactly ONE pass
    // over the fact: a left join against the dim's (distinct) key set
    // feeds a single aggregate computing total rows and null-dim
    // orphans together — not an anti join plus a separate count scan.
    // The per-FK results union into one report row each; nothing is
    // ever collected. The synthetic data is referentially clean — the
    // audit proves ZERO orphans, which is exactly what the gate
    // asserts in production.
    Q(
      "q99_integrity_audit",
      """SELECT 'lineitem.l_orderkey->orders' AS fk,
        |       CAST((SELECT COUNT(*) FROM lineitem l
        |             WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_orphans,
        |       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_rows
        |UNION ALL
        |SELECT 'orders.o_custkey->customer',
        |       CAST((SELECT COUNT(*) FROM orders o
        |             WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
        |       CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
        |UNION ALL
        |SELECT 'lineitem.l_partkey->part',
        |       CAST((SELECT COUNT(*) FROM lineitem l
        |             WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) AS BIGINT),
        |       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
        |ORDER BY fk""".stripMargin
    ) { (s, d) =>
      def audit(fk: String, fact: org.apache.spark.sql.DataFrame, key: String,
          dim: org.apache.spark.sql.DataFrame, dimKey: String) = {
        val dimKeys = dim.select(col(dimKey)).distinct()
        fact.select(col(key))
          .join(dimKeys, col(key) === col(dimKey), "left")
          .agg(
            sum(when(col(dimKey).isNull, 1L).otherwise(0L)).as("n_orphans"),
            count(lit(1)).as("n_rows"))
          .select(lit(fk).as("fk"), col("n_orphans"), col("n_rows"))
      }
      val li = lineitem(s, d)
      audit("lineitem.l_orderkey->orders", li, "l_orderkey", orders(s, d), "o_orderkey")
        .unionByName(audit("orders.o_custkey->customer", orders(s, d), "o_custkey",
          customer(s, d), "c_custkey"))
        .unionByName(audit("lineitem.l_partkey->part", li, "l_partkey",
          part(s, d), "p_partkey"))
        .orderBy("fk")
    },

    // --- q100: incremental aggregate maintenance — the materialized-
    // view pattern: the base window's PARTIAL aggregates (sum/count/
    // min/max per key, stored once) merge with the delta batch's
    // partials by RE-AGGREGATION, never rescanning the base. The query
    // computes both halves' partials and merges; the oracle aggregates
    // the full table directly — hash-equality IS the algebraic proof
    // that merge(partial(base), partial(delta)) = agg(base ∪ delta),
    // the property that makes nightly incremental pipelines correct.
    // Sums are decimal-exact so the merge is associativity-safe.
    Q(
      "q100_incremental_agg",
      """SELECT user_id,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total,
        |  MIN(value) AS min_v, MAX(value) AS max_v
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val cutoff = "2024-01-15"
      def partials(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("user_id").agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(38, 6))).as("dsum"),
          min("value").as("min_v"),
          max("value").as("max_v"))
      val e = events(s, d)
      val base = partials(e.filter(to_date(col("ts")) < cutoff))
      val delta = partials(e.filter(to_date(col("ts")) >= cutoff))
      base.unionByName(delta)
        .groupBy("user_id")
        .agg(
          sum("n").as("n"),
          sum("dsum").cast("double").as("total"),
          min("min_v").as("min_v"),
          max("max_v").as("max_v"))
        .orderBy("user_id")
    },

    // --- q107: recursive CTE — iterative SQL (hierarchy walks,
    // transitive closure, graph reachability) runs natively in Spark
    // 4's WITH RECURSIVE: each iteration is a distributed join/union
    // step materialized by the engine, the same loop-until-fixpoint
    // execution q83's label propagation hand-rolls for connected
    // components. The walk here is a binary ancestry chain (node →
    // node/2 until 0, ~log₂ key depth ≤ 15 iterations at any SF);
    // per start key it aggregates the chain's depth and path sum.
    // Recursion depth is bounded and data-independent-per-row, so the
    // plan is iteration-count × (scan-sized map + union) — no shuffle
    // inside an iteration (the step is a pure projection).
    Q(
      "q107_recursive_cte",
      """WITH RECURSIVE anc AS (
        |  SELECT p_partkey AS start_key, p_partkey AS node, 0 AS depth
        |  FROM part WHERE p_partkey % 7 = 0
        |  UNION ALL
        |  SELECT start_key, node // 2, depth + 1 FROM anc WHERE node > 0
        |)
        |SELECT start_key,
        |  CAST(MAX(depth) AS INTEGER) AS steps,
        |  CAST(SUM(node) AS BIGINT) AS path_sum
        |FROM anc
        |GROUP BY start_key
        |ORDER BY start_key""".stripMargin
    ) { (s, d) =>
      s.sql(
        s"""WITH RECURSIVE anc AS (
           |  SELECT p_partkey AS start_key, p_partkey AS node, 0 AS depth
           |  FROM parquet.`$d/part.parquet` WHERE p_partkey % 7 = 0
           |  UNION ALL
           |  SELECT start_key, node DIV 2, depth + 1 FROM anc WHERE node > 0
           |)
           |SELECT start_key,
           |  CAST(MAX(depth) AS INT) AS steps,
           |  SUM(node) AS path_sum
           |FROM anc
           |GROUP BY start_key
           |ORDER BY start_key""".stripMargin)
    }
  )
}
