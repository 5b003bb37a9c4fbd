package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.Q
import graft.model.Tables._
import graft.functions.Det._
import graft.sources.LogLake

/** Registry queries that run THROUGH the native ACID table layer
  * ([[graft.sources.LogLake]]): each invocation builds a fresh loglake
  * table from the harness parquet, drives real commits (create / merge /
  * append) against it, and reads the result back through the snapshot /
  * time-travel API. The DuckDB oracle replays the same end state with
  * plain SQL over the source table — so the hash gate checks the whole
  * write→commit→read path, not just the final projection. Queries are
  * necessarily EAGER at construction (commits are actions); Bench times
  * the full transaction pipeline, which is the honest cost of a MERGE.
  */
object Lake {

  // every query-scratch table dir is tracked and removed at JVM exit —
  // the queries hand back lazy frames over these dirs, so the earliest
  // safe deletion point is process teardown
  private val scratchDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    scratchDirs.forEach { d =>
      try deleteRecursively(d) catch { case _: Exception => () }
    }
  }, "graft-lake-scratch-cleanup"))

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(); ()
  }

  private[ops] def freshDir(tag: String): String = {
    val p = Files.createTempDirectory(s"graft-loglake-$tag")
    scratchDirs.add(p.toFile)
    p.toString + "/t"
  }

  val all: Seq[Q] = Seq(
    // --- q111: MERGE upsert through the commit log. v1 = orders; one
    // MERGE updates every 10th order (status → 'R', price + 5.00) and
    // inserts a synthetic row per 100th order (negated key, status 'N');
    // the snapshot after the merge is aggregated per status. The oracle
    // computes the same end state declaratively. Only files containing
    // a matched key are rewritten (file-level upsert, the Delta MERGE
    // shape) — at 100 TB the rewrite cost is proportional to the
    // touched-file volume, not the table.
    Q(
      "q111_loglake_merge",
      s"""WITH merged AS (
         |  SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'R' ELSE o_orderstatus END AS o_orderstatus,
         |         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 5.0 ELSE o_totalprice END AS o_totalprice
         |  FROM orders
         |  UNION ALL
         |  SELECT 'N' AS o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 100 = 0
         |)
         |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total
         |FROM merged GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q111")
      val ord = orders(s, d).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      LogLake.create(s, dir, ord, statsCols = Seq("o_orderkey"))
      val upd = ord.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_orderstatus", lit("R"))
        .withColumn("o_totalprice", col("o_totalprice") + lit(5.0d))
      val ins = ord.filter(col("o_orderkey") % 100 === 0)
        .select((-col("o_orderkey")).as("o_orderkey"), col("o_custkey"),
          lit("N").as("o_orderstatus"), col("o_totalprice"), col("o_orderdate"))
      LogLake.merge(s, dir, upd.unionByName(ins), keyCols = Seq("o_orderkey"),
        statsCols = Seq("o_orderkey"))
      LogLake.snapshot(s, dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    },

    // --- q112: append + time travel. v1 = pre-1998 orders, v2 appends
    // the rest; the query aggregates the TIME-TRAVELLED v1 snapshot per
    // year and carries the CURRENT snapshot's row count alongside, so
    // the oracle checks both versions through one result: the v1 read
    // must see none of v2's files, the current read all of them.
    Q(
      "q112_loglake_timetravel",
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         |       CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total,
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS cur_rows
         |FROM orders
         |WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY yr
         |ORDER BY yr""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q112")
      val ord = orders(s, d).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      val cut = to_timestamp(lit("1998-01-01 00:00:00"))
      LogLake.create(s, dir, ord.filter(col("o_orderdate") < cut),
        statsCols = Seq("o_orderdate"))
      LogLake.append(s, dir, ord.filter(col("o_orderdate") >= cut))
      val v1 = LogLake.snapshot(s, dir, asOf = Some(1L))
        .groupBy(year(col("o_orderdate")).cast("int").as("yr"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
      val cur = LogLake.snapshot(s, dir)
        .agg(count(lit(1)).as("cur_rows"))
      v1.crossJoin(cur).orderBy("yr")
    },

    // --- q113: OPTIMIZE ZORDER under the hash gate. Build the table
    // hash-partitioned (every file spans both dimensions — unprunable),
    // OPTIMIZE ZORDER BY (o_custkey, o_totalprice), then answer a
    // 2-D range query THROUGH the stats-pruned scan. The oracle is the
    // same range aggregate straight off `orders`, so the gate certifies
    // that the rewrite changed the LAYOUT and nothing else; the files
    // the scan skipped are reported alongside (pruned > 0 is asserted
    // by LogLakeSpec; here the VALUES prove correctness under pruning).
    Q(
      "q113_loglake_optimize",
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total,
         |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
         |FROM orders
         |WHERE o_custkey BETWEEN 100 AND 500""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q113")
      val ord = orders(s, d).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      LogLake.create(s, dir, ord.repartition(8), statsCols = Seq("o_custkey"))
      LogLake.optimize(s, dir, numFiles = 8,
        zorderCols = Seq("o_custkey", "o_totalprice"),
        statsCols = Seq("o_custkey", "o_totalprice"))
      LogLake.scanRange(s, dir, "o_custkey", 100L, 500L)
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"),
          countDistinct(col("o_custkey")).as("n_cust"))
    },

    // --- q114: change-data-feed READ over the commit log — the CDC
    // consumption side (q91 is the compaction side). Same MERGE as
    // q111; the feed between v1 and v2 must surface exactly the old row
    // of every update as a delete, the new row as an insert, and each
    // inserted row once — the rows the merge merely COPIED while
    // rewriting their files must cancel out of the diff entirely. The
    // oracle enumerates the expected change set declaratively.
    Q(
      "q114_loglake_changes",
      s"""WITH ch AS (
         |  SELECT 'insert' AS change_type, 'R' AS o_orderstatus,
         |         o_totalprice + 5.0 AS o_totalprice
         |  FROM orders WHERE o_orderkey % 10 = 0
         |  UNION ALL
         |  SELECT 'insert', 'N', o_totalprice FROM orders WHERE o_orderkey % 100 = 0
         |  UNION ALL
         |  SELECT 'delete', o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 10 = 0
         |)
         |SELECT change_type, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total
         |FROM ch GROUP BY change_type, o_orderstatus
         |ORDER BY change_type, o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q114")
      val ord = orders(s, d).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      LogLake.create(s, dir, ord, statsCols = Seq("o_orderkey"))
      val upd = ord.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_orderstatus", lit("R"))
        .withColumn("o_totalprice", col("o_totalprice") + lit(5.0d))
      val ins = ord.filter(col("o_orderkey") % 100 === 0)
        .select((-col("o_orderkey")).as("o_orderkey"), col("o_custkey"),
          lit("N").as("o_orderstatus"), col("o_totalprice"), col("o_orderdate"))
      LogLake.merge(s, dir, upd.unionByName(ins), keyCols = Seq("o_orderkey"))
      LogLake.changeFeed(s, dir, 1L, 2L)
        .groupBy(col("_change_type").as("change_type"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .orderBy("change_type", "o_orderstatus")
    },

    // --- q115: the format-registered read/write path. Orders land via
    // `df.write.format("loglake")` range-partitioned on o_custkey with
    // manifest stats, and the query reads back through
    // `spark.read.format("loglake")` — the native parquet scan behind a
    // manifest-driven FileIndex, so the filter below prunes FILES at
    // planning time (LogLakeProviderSpec asserts the scan's numFiles)
    // and still reaches parquet for row-group pruning. The oracle runs
    // the same filtered aggregate straight off the source table: the
    // hash gate certifies the write→manifest→skipping-scan loop loses
    // and invents nothing.
    Q(
      "q115_loglake_provider",
      s"""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total
         |FROM orders
         |WHERE o_custkey BETWEEN 100 AND 500
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q115")
      orders(s, d).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .repartitionByRange(8, col("o_custkey"))
        .write.format("loglake").mode("errorifexists")
        .option("statsColumns", "o_custkey").save(dir)
      s.read.format("loglake").load(dir)
        .filter(col("o_custkey") >= 100L && col("o_custkey") <= 500L)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    },

    // --- q116: row-level DELETE then UPDATE (copy-on-write) as table
    // transactions: delete drops one customer-slice of 'F' orders,
    // update re-prices one slice of 'O' orders; the snapshot after both
    // commits aggregates per status. Only files CONTAINING a matched
    // row rewrite (LogLakeSpec asserts untouched files carry over);
    // the oracle states the end state declaratively.
    Q(
      "q116_loglake_delete_update",
      s"""WITH after_del AS (
         |  SELECT * FROM orders
         |  WHERE NOT (o_orderstatus = 'F' AND o_custkey % 7 = 0)
         |), after_upd AS (
         |  SELECT o_orderstatus,
         |         CASE WHEN o_orderstatus = 'O' AND o_custkey % 5 = 0
         |              THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice
         |  FROM after_del
         |)
         |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total
         |FROM after_upd GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q116")
      val ord = orders(s, d).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      LogLake.create(s, dir, ord.repartition(8), statsCols = Seq("o_custkey"))
      LogLake.delete(s, dir,
        col("o_orderstatus") === "F" && col("o_custkey") % 7 === 0)
      LogLake.update(s, dir,
        col("o_orderstatus") === "O" && col("o_custkey") % 5 === 0,
        set = Map("o_totalprice" -> (col("o_totalprice") + lit(10.0d))))
      LogLake.snapshot(s, dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    },

    // --- q117: RESTORE as a new commit. v1 = full orders; v2 deletes
    // every 3rd order; v3 restores to v1 — so the final snapshot must
    // equal the ORIGINAL table exactly (the oracle is a plain aggregate
    // of `orders`), while history keeps all three versions (the delete
    // stays reachable by time travel; the restored version count rides
    // along as proof the log grew to 3).
    Q(
      "q117_loglake_restore",
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         |       CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total,
         |       CAST(3 AS BIGINT) AS versions
         |FROM orders
         |GROUP BY yr
         |ORDER BY yr""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q117")
      val ord = orders(s, d).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      LogLake.create(s, dir, ord, statsCols = Seq("o_orderkey"))
      LogLake.delete(s, dir, col("o_orderkey") % 3 === 0)
      LogLake.restore(s, dir, toVersion = 1L)
      LogLake.snapshot(s, dir)
        .groupBy(year(col("o_orderdate")).cast("int").as("yr"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"),
          lit(LogLake.currentVersion(dir)).as("versions"))
        .orderBy("yr")
    },

    // --- q118: the loglake STREAMING SOURCE end-to-end. The source
    // table accumulates two appends plus a row-level UPDATE (a
    // rewriting commit — the from-version-1 replay would refuse it), so
    // the stream takes `initialSnapshot` — first batch = current state,
    // then per-commit tail — paced one commit per micro-batch by
    // `maxVersionsPerTrigger`. Drain 1 lands the snapshot in a second
    // loglake table through the native exactly-once sink; a late append
    // then arrives via drain 2 on the SAME checkpoint (incremental, no
    // re-delivery). The oracle recomputes the end state declaratively:
    // rows whose key was present at update time (key % 3 ≠ 2) and
    // divisible by 10 carry the updated status. At 100 TB this is the
    // warehouse-to-downstream CDC tail: per-trigger work is bounded by
    // admitted commit volume, never by table size.
    Q(
      "q118_loglake_stream",
      s"""WITH end_state AS (
         |  SELECT CASE WHEN o_orderkey % 10 = 0 AND o_orderkey % 3 <> 2
         |              THEN 'S' ELSE o_orderstatus END AS o_orderstatus,
         |         o_totalprice
         |  FROM orders
         |)
         |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total
         |FROM end_state GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin
    ) { (s, d) =>
      val src = freshDir("q118-src"); val dst = freshDir("q118-dst")
      val chk = freshDir("q118-chk")
      val ord = orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      LogLake.create(s, src, ord.filter(col("o_orderkey") % 3 === 0),
        statsCols = Seq("o_orderkey"))
      LogLake.append(s, src, ord.filter(col("o_orderkey") % 3 === 1))
      LogLake.update(s, src, col("o_orderkey") % 10 === 0,
        Map("o_orderstatus" -> lit("S")))
      def drain(): Unit = {
        val q = s.readStream.format("loglake")
          .option("initialSnapshot", "true")
          .option("maxVersionsPerTrigger", "1").load(src)
          .writeStream.format("loglake").option("path", dst)
          .option("checkpointLocation", chk)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(300000)
      }
      drain() // the snapshot, update applied
      LogLake.append(s, src, ord.filter(col("o_orderkey") % 3 === 2))
      drain() // tail increment on the same checkpoint — exactly-once
      LogLake.snapshot(s, dst)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    },

    // --- q119: DELETE/UPDATE through DELETION VECTORS (merge-on-read).
    // v2 masks every 7th order with a per-file position sidecar — zero
    // data files rewritten (the spec proves that invariant); v3 updates
    // every remaining 5th order the same way, appending only the
    // updated rows. The snapshot read applies the vectors via an
    // anti-join on (file, row_index). At 100 TB this is the point-
    // delete path: write volume is the deleted POSITIONS, not the
    // touched files — copy-on-write (q116) rewrites file-volume
    // instead. The oracle recomputes the end state declaratively.
    Q(
      "q119_loglake_dv",
      s"""WITH end_state AS (
         |  SELECT CASE WHEN o_orderkey % 5 = 0 THEN 'U' ELSE o_orderstatus END
         |           AS o_orderstatus,
         |         o_totalprice
         |  FROM orders WHERE o_orderkey % 7 <> 0
         |)
         |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total
         |FROM end_state GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q119")
      val ord = orders(s, d).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      LogLake.create(s, dir, ord, statsCols = Seq("o_orderkey"))
      LogLake.delete(s, dir, col("o_orderkey") % 7 === 0, mor = true)
      LogLake.update(s, dir, col("o_orderkey") % 5 === 0,
        Map("o_orderstatus" -> lit("U")), mor = true)
      LogLake.snapshot(s, dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    },

    // --- q120: STREAMING READ over a table with ACTIVE deletion
    // vectors — the post-MERGE stream restart a real user hits first.
    // The source table takes a merge-on-read DELETE (every 7th order)
    // and a merge-on-read UPDATE (every 5th remaining → 'U') before the
    // stream starts; the `initialSnapshot` first batch must read
    // THROUGH the vectors (scan anti-join DV positions — no OPTIMIZE
    // required first), then a late append arrives incrementally on the
    // same checkpoint. Deleted rows must not resurrect in the sink
    // table. At 100 TB the DV side is deleted-position volume (bytes),
    // broadcast against a native vectorized scan of the snapshot.
    Q(
      "q120_loglake_dv_stream",
      s"""WITH end_state AS (
         |  SELECT CASE WHEN o_orderkey % 5 = 0 AND o_orderkey % 3 <> 2
         |              THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
         |         o_totalprice
         |  FROM orders
         |  WHERE NOT (o_orderkey % 7 = 0 AND o_orderkey % 3 <> 2)
         |)
         |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total
         |FROM end_state GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin
    ) { (s, d) =>
      val src = freshDir("q120-src"); val dst = freshDir("q120-dst")
      val chk = freshDir("q120-chk")
      val ord = orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      LogLake.create(s, src, ord.filter(col("o_orderkey") % 3 =!= 2),
        statsCols = Seq("o_orderkey"))
      LogLake.delete(s, src, col("o_orderkey") % 7 === 0, mor = true)
      LogLake.update(s, src, col("o_orderkey") % 5 === 0,
        Map("o_orderstatus" -> lit("U")), mor = true)
      def drain(): Unit = {
        val q = s.readStream.format("loglake")
          .option("initialSnapshot", "true")
          .option("maxVersionsPerTrigger", "1").load(src)
          .writeStream.format("loglake").option("path", dst)
          .option("checkpointLocation", chk)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(300000)
      }
      drain() // snapshot batch reads through the active DVs
      LogLake.append(s, src, ord.filter(col("o_orderkey") % 3 === 2))
      drain() // plain append tail on the same checkpoint
      LogLake.snapshot(s, dst)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    },

    // --- q121: the SCHEMA-EVOLUTION READ MATRIX. v1 writes (o_orderkey,
    // o_totalprice); v2 appends rows carrying a NEW nullable column
    // o_note (additive evolution — the only legal append-side change).
    // Old files have no o_note values, so every read surface must
    // NULL-fill them under the evolved schema: `snapshot`, `scanRange`
    // (stats skipping + exact predicate), `changeFeed` (the v2 inserts
    // carry notes), and the STREAMING source (replays v1's pre-evolution
    // files under the frozen evolved schema) landed through the
    // exactly-once sink. One frame tags each leg so the oracle checks
    // all four reads in a single hash. At 100 TB evolution is a
    // metadata-only commit — no old file is rewritten, which is exactly
    // why the read path must do the NULL-filling.
    Q(
      "q121_loglake_evolution",
      s"""WITH base AS (
         |  SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_note
         |  FROM orders WHERE o_orderkey % 3 <> 2
         |), evolved AS (
         |  SELECT o_orderkey, o_totalprice,
         |         'n' || CAST(o_orderkey % 5 AS VARCHAR) AS o_note
         |  FROM orders WHERE o_orderkey % 3 = 2
         |), full_t AS (
         |  SELECT * FROM base UNION ALL SELECT * FROM evolved
         |)
         |SELECT 'cdc' AS path, coalesce(o_note, '-') AS o_note,
         |       CAST(COUNT(*) AS BIGINT) AS cnt, ${oSum("o_totalprice")} AS total
         |FROM evolved GROUP BY 1, 2
         |UNION ALL
         |SELECT 'range', coalesce(o_note, '-'), CAST(COUNT(*) AS BIGINT),
         |       ${oSum("o_totalprice")}
         |FROM full_t WHERE o_orderkey <= 3000 GROUP BY 1, 2
         |UNION ALL
         |SELECT 'snapshot', coalesce(o_note, '-'), CAST(COUNT(*) AS BIGINT),
         |       ${oSum("o_totalprice")}
         |FROM full_t GROUP BY 1, 2
         |UNION ALL
         |SELECT 'stream', coalesce(o_note, '-'), CAST(COUNT(*) AS BIGINT),
         |       ${oSum("o_totalprice")}
         |FROM full_t GROUP BY 1, 2
         |ORDER BY path, o_note""".stripMargin
    ) { (s, d) =>
      val src = freshDir("q121-src"); val dst = freshDir("q121-dst")
      val chk = freshDir("q121-chk")
      val ord = orders(s, d).select("o_orderkey", "o_totalprice")
      LogLake.create(s, src, ord.filter(col("o_orderkey") % 3 =!= 2),
        statsCols = Seq("o_orderkey"))
      LogLake.append(s, src, ord.filter(col("o_orderkey") % 3 === 2)
        .withColumn("o_note",
          concat(lit("n"), (col("o_orderkey") % 5).cast("string"))))
      // streaming leg: replay the whole history (append-only) under the
      // frozen post-evolution schema into a second table
      val q = s.readStream.format("loglake").load(src)
        .writeStream.format("loglake").option("path", dst)
        .option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(300000)
      def leg(tag: String, df: org.apache.spark.sql.DataFrame) =
        df.groupBy(coalesce(col("o_note"), lit("-")).as("o_note"))
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
          .select(lit(tag).as("path"), col("o_note"), col("cnt"), col("total"))
      leg("snapshot", LogLake.snapshot(s, src))
        .unionByName(leg("range",
          LogLake.scanRange(s, src, "o_orderkey", null, 3000L)))
        .unionByName(leg("cdc", LogLake.changeFeed(s, src, 1L, 2L)
          .filter(col("_change_type") === "insert")))
        .unionByName(leg("stream", LogLake.snapshot(s, dst)))
        .orderBy("path", "o_note")
    },

    // --- q122: STREAMING CHANGE DATA FEED (`readChangeFeed=true`) —
    // the Delta table_changes surface as a stream. The history mixes
    // every commit class: two appends, a merge-on-read DELETE (every
    // 7th order), a merge-on-read UPDATE (every 5th remaining → 'U').
    // Each micro-batch (paced one commit per trigger) delivers that
    // commit's row-level events — inserts for appended rows, delete
    // events for DV-masked pre-images, update_preimage/update_postimage
    // pairs for the update commit (Delta's table_changes labels)
    // — landed exactly-once in a second table and aggregated by
    // (version, change type, status). The oracle recomputes every
    // commit's event set declaratively. At 100 TB per-trigger read
    // cost is the CHANGED-file volume (pre-images resolve through the
    // DVs), never table size — the CDC fan-out pattern.
    Q(
      "q122_loglake_cdf_stream",
      s"""WITH src AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         |)
         |SELECT CAST(1 AS BIGINT) AS v, 'insert' AS ct, o_orderstatus,
         |       CAST(COUNT(*) AS BIGINT) AS cnt, ${oSum("o_totalprice")} AS total
         |FROM src WHERE o_orderkey % 3 <> 2 GROUP BY o_orderstatus
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), 'insert', o_orderstatus,
         |       CAST(COUNT(*) AS BIGINT), ${oSum("o_totalprice")}
         |FROM src WHERE o_orderkey % 3 = 2 GROUP BY o_orderstatus
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), 'delete', o_orderstatus,
         |       CAST(COUNT(*) AS BIGINT), ${oSum("o_totalprice")}
         |FROM src WHERE o_orderkey % 7 = 0 GROUP BY o_orderstatus
         |UNION ALL
         |SELECT CAST(4 AS BIGINT), 'update_preimage', o_orderstatus,
         |       CAST(COUNT(*) AS BIGINT), ${oSum("o_totalprice")}
         |FROM src WHERE o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
         |GROUP BY o_orderstatus
         |UNION ALL
         |SELECT CAST(4 AS BIGINT), 'update_postimage', 'U',
         |       CAST(COUNT(*) AS BIGINT), ${oSum("o_totalprice")}
         |FROM src WHERE o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
         |ORDER BY v, ct, o_orderstatus""".stripMargin
    ) { (s, d) =>
      val src = freshDir("q122-src"); val dst = freshDir("q122-dst")
      val chk = freshDir("q122-chk")
      val ord = orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      LogLake.create(s, src, ord.filter(col("o_orderkey") % 3 =!= 2),
        statsCols = Seq("o_orderkey"))                                   // v1
      LogLake.append(s, src, ord.filter(col("o_orderkey") % 3 === 2))    // v2
      LogLake.delete(s, src, col("o_orderkey") % 7 === 0, mor = true)    // v3
      LogLake.update(s, src, col("o_orderkey") % 5 === 0,
        Map("o_orderstatus" -> lit("U")), mor = true)                    // v4
      val q = s.readStream.format("loglake")
        .option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", "1").load(src)
        .writeStream.format("loglake").option("path", dst)
        .option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(300000)
      LogLake.snapshot(s, dst)
        .groupBy(col("_commit_version").as("v"), col("_change_type").as("ct"),
          col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .orderBy("v", "ct", "o_orderstatus")
    },

    // --- q124: SHALLOW CLONE under the gate. The clone's v1 manifest
    // references the source snapshot by absolute path (zero data
    // copied — the spec proves the zero-copy invariant; this query
    // proves the SEMANTICS): after cloning, source and clone each take
    // a different append and must diverge independently, while
    // versionAsOf=1 on the clone still reads the exact cloned
    // snapshot. Three tagged aggregate legs in one oracle hash. At
    // 100 TB a clone is a metadata-only commit — the dev/experiment
    // branch-a-table operation.
    Q(
      "q124_loglake_clone",
      s"""WITH base AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         |  WHERE o_orderkey % 2 = 0
         |), src_t AS (
         |  SELECT o_orderstatus, o_totalprice FROM base
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 2 = 1
         |), clone_t AS (
         |  SELECT o_orderstatus, o_totalprice FROM base
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 4 = 1
         |)
         |SELECT 'clone' AS tbl, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total
         |FROM clone_t GROUP BY o_orderstatus
         |UNION ALL
         |SELECT 'clone_v1', o_orderstatus, CAST(COUNT(*) AS BIGINT),
         |       ${oSum("o_totalprice")}
         |FROM base GROUP BY o_orderstatus
         |UNION ALL
         |SELECT 'src', o_orderstatus, CAST(COUNT(*) AS BIGINT),
         |       ${oSum("o_totalprice")}
         |FROM src_t GROUP BY o_orderstatus
         |ORDER BY tbl, o_orderstatus""".stripMargin
    ) { (s, d) =>
      val src = freshDir("q124-src"); val dst = freshDir("q124-dst")
      val ord = orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      LogLake.create(s, src, ord.filter(col("o_orderkey") % 2 === 0),
        statsCols = Seq("o_orderkey"))
      LogLake.cloneShallow(s, src, dst)
      LogLake.append(s, src, ord.filter(col("o_orderkey") % 2 === 1))
      LogLake.append(s, dst, ord.filter(col("o_orderkey") % 4 === 1))
      def leg(tag: String, df: org.apache.spark.sql.DataFrame) =
        df.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
          .select(lit(tag).as("tbl"), col("o_orderstatus"), col("cnt"), col("total"))
      leg("clone", LogLake.snapshot(s, dst))
        .unionByName(leg("clone_v1", LogLake.snapshot(s, dst, Some(1L))))
        .unionByName(leg("src", LogLake.snapshot(s, src)))
        .orderBy("tbl", "o_orderstatus")
    },

    // --- q125: the SQL front door, end to end. The q111 MERGE end
    // state produced through `spark.sql` ALONE — CTAS into the
    // `loglake` DSv2 catalog, `MERGE INTO … WHEN MATCHED UPDATE SET * /
    // WHEN NOT MATCHED INSERT *` lowered by the analyzer rule onto the
    // same commit-log upsert as the path API, and the final aggregate
    // read back through the catalog identifier (which the rule swaps
    // onto the native pushdown scan). Same oracle as q111: the gate
    // proves SQL and path API are ONE engine, not two. At 100 TB the
    // SQL layer adds only analyzer work — every data plan is identical
    // to the path API's.
    Q(
      "q125_loglake_sql",
      s"""WITH merged AS (
         |  SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'R' ELSE o_orderstatus END AS o_orderstatus,
         |         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 5.0 ELSE o_totalprice END AS o_totalprice
         |  FROM orders
         |  UNION ALL
         |  SELECT 'N' AS o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 100 = 0
         |)
         |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total
         |FROM merged GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin
    ) { (s, d) =>
      val ns = "q125_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      val wh = s.conf.get("spark.sql.catalog.loglake.warehouse")
      scratchDirs.add(new java.io.File(s"$wh/$ns"))
      s.sql(s"CREATE NAMESPACE loglake.$ns")
      orders(s, d).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .createOrReplaceTempView("q125_orders")
      s.sql(s"CREATE TABLE loglake.$ns.t AS SELECT * FROM q125_orders")
      s.sql(
        s"""MERGE INTO loglake.$ns.t AS t
           |USING (
           |  SELECT o_orderkey, o_custkey, 'R' AS o_orderstatus,
           |         o_totalprice + 5.0D AS o_totalprice, o_orderdate
           |  FROM q125_orders WHERE o_orderkey % 10 = 0
           |  UNION ALL
           |  SELECT -o_orderkey AS o_orderkey, o_custkey, 'N' AS o_orderstatus,
           |         o_totalprice, o_orderdate
           |  FROM q125_orders WHERE o_orderkey % 100 = 0
           |) AS src
           |ON t.o_orderkey = src.o_orderkey
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      s.sql(
        s"""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
           |FROM loglake.$ns.t
           |GROUP BY o_orderstatus
           |ORDER BY o_orderstatus""".stripMargin)
    },

    // --- q126: COLUMN MAPPING (rename/drop) under the hash gate, as an
    // evolved-read matrix. History: v1 create (even orderkeys, columns
    // o_orderkey/o_custkey/o_orderstatus/o_totalprice), v2 RENAME
    // o_totalprice → price (metadata-only — zero bytes rewritten), v3
    // append the odd orderkeys under the NEW name, v4 DROP o_custkey.
    // Four read paths must agree with the oracle: the current snapshot
    // (old files served under the renamed/dropped schema), a stats-
    // skipped range scan ON THE RENAMED column (stats are keyed by
    // physical name, so skipping survives the rename), the change feed
    // across the rename boundary, and a streaming replay of the whole
    // history under the frozen post-DDL schema, plus a time-travel leg
    // at v1 reading the ORIGINAL schema. At 100 TB rename/drop stay
    // manifest-sized commits; only the logical→physical projection is
    // added to reads.
    Q(
      "q126_loglake_colmap",
      s"""WITH renamed AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice AS price FROM orders
         |)
         |SELECT 'cdc' AS path, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("price")} AS total
         |FROM renamed GROUP BY o_orderstatus
         |UNION ALL
         |SELECT 'range', o_orderstatus, CAST(COUNT(*) AS BIGINT),
         |       ${oSum("price")}
         |FROM renamed WHERE price >= 50000 GROUP BY o_orderstatus
         |UNION ALL
         |SELECT 'snapshot', o_orderstatus, CAST(COUNT(*) AS BIGINT),
         |       ${oSum("price")}
         |FROM renamed GROUP BY o_orderstatus
         |UNION ALL
         |SELECT 'stream', o_orderstatus, CAST(COUNT(*) AS BIGINT),
         |       ${oSum("price")}
         |FROM renamed GROUP BY o_orderstatus
         |UNION ALL
         |SELECT 'v1', o_orderstatus, CAST(COUNT(*) AS BIGINT),
         |       ${oSum("o_totalprice")}
         |FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_orderstatus
         |ORDER BY path, o_orderstatus""".stripMargin
    ) { (s, d) =>
      val src = freshDir("q126-src"); val dst = freshDir("q126-dst")
      val chk = freshDir("q126-chk")
      val ord = orders(s, d).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      LogLake.create(s, src, ord.filter(col("o_orderkey") % 2 === 0),
        statsCols = Seq("o_orderkey", "o_totalprice"))
      LogLake.renameColumn(s, src, "o_totalprice", "price")
      LogLake.append(s, src, ord.filter(col("o_orderkey") % 2 === 1)
        .withColumnRenamed("o_totalprice", "price"))
      LogLake.dropColumn(s, src, "o_custkey")
      // streaming leg: replay v1..v4 under the frozen post-DDL schema
      // (pre-rename commits resolve by PHYSICAL name) into a 2nd table
      val q = s.readStream.format("loglake").load(src)
        .writeStream.format("loglake").option("path", dst)
        .option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(300000)
      def leg(tag: String, df: org.apache.spark.sql.DataFrame, price: String) =
        df.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"), dsum(col(price)).as("total"))
          .select(lit(tag).as("path"), col("o_orderstatus"), col("cnt"),
            col("total"))
      leg("snapshot", LogLake.snapshot(s, src), "price")
        .unionByName(leg("range",
          LogLake.scanRange(s, src, "price", 50000.0d, null), "price"))
        .unionByName(leg("cdc", LogLake.changeFeed(s, src, 0L, 4L)
          .filter(col("_change_type") === "insert"), "price"))
        .unionByName(leg("stream", LogLake.snapshot(s, dst), "price"))
        .unionByName(leg("v1", LogLake.snapshot(s, src, Some(1L)), "o_totalprice"))
        .orderBy("path", "o_orderstatus")
    },

    // --- q127: IDENTITY PARTITION COLUMNS under the gate. The table is
    // created PARTITIONED BY o_orderstatus (half the orders), appended
    // (the other half — appends re-cluster by the spec, no option
    // needed), then `DELETE WHERE o_orderstatus = 'P'` drops the whole
    // P partition METADATA-ONLY: the commit carries removes and zero
    // adds, no data read or written at any table size — the Delta
    // partition-DELETE contract, proven structurally in
    // PartitionedTableSpec and semantically here. Legs: the current
    // snapshot per status, a partition-pruned single-status scan (the
    // identity min=max stats admit exactly that partition's files), and
    // a time-travel read at v2 where the dropped partition still
    // exists. At 100 TB the partition tuple lives in the manifest and
    // the data files alike, so planning prunes partitions without a
    // filesystem listing and reads stay one native vectorized scan.
    Q(
      "q127_loglake_partition",
      s"""SELECT 'pruned' AS leg, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total
         |FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderstatus
         |UNION ALL
         |SELECT 'snapshot', o_orderstatus, CAST(COUNT(*) AS BIGINT),
         |       ${oSum("o_totalprice")}
         |FROM orders WHERE o_orderstatus <> 'P' GROUP BY o_orderstatus
         |UNION ALL
         |SELECT 'v2', o_orderstatus, CAST(COUNT(*) AS BIGINT),
         |       ${oSum("o_totalprice")}
         |FROM orders GROUP BY o_orderstatus
         |ORDER BY leg, o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q127")
      val ord = orders(s, d).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      LogLake.create(s, dir, ord.filter(col("o_orderkey") % 2 === 0),
        statsCols = Seq("o_orderkey"), partitionBy = Seq("o_orderstatus"))
      LogLake.append(s, dir, ord.filter(col("o_orderkey") % 2 === 1))   // v2
      LogLake.delete(s, dir, col("o_orderstatus") === "P")              // v3: metadata-only
      def leg(tag: String, df: org.apache.spark.sql.DataFrame) =
        df.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
          .select(lit(tag).as("leg"), col("o_orderstatus"), col("cnt"),
            col("total"))
      leg("snapshot", LogLake.snapshot(s, dir))
        .unionByName(leg("pruned", s.read.format("loglake").load(dir)
          .filter(col("o_orderstatus") === "F")))
        .unionByName(leg("v2", LogLake.snapshot(s, dir, Some(2L))))
        .orderBy("leg", "o_orderstatus")
    },

    // --- q128: replaceWhere — Delta's selective OVERWRITE, the backfill
    // primitive. v1 creates orders partitioned by status; v2 replaces
    // the WHOLE 'O' partition with re-priced rows (×0.9) — a pure
    // partition predicate, so the old files drop METADATA-ONLY and the
    // commit cost is the new data's volume; v3 replaces an arbitrary
    // keyed slice (every 10th order → +1.0) — the general path rewrites
    // only files containing a match, keeping their survivors. The
    // oracle derives the end state as one CASE expression (v3 wins on
    // overlap — later commit, replaced region). At 100 TB this is how
    // a pipeline re-runs one day/partition: cost ∝ the replaced region,
    // never the table.
    Q(
      "q128_loglake_replace_where",
      s"""WITH endstate AS (
         |  SELECT o_orderstatus,
         |         CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice + 1.0
         |              WHEN o_orderstatus = 'O' THEN o_totalprice * 0.9
         |              ELSE o_totalprice END AS o_totalprice
         |  FROM orders
         |)
         |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total
         |FROM endstate GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q128")
      val ord = orders(s, d).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      LogLake.create(s, dir, ord, statsCols = Seq("o_orderkey"),
        partitionBy = Seq("o_orderstatus"))                              // v1
      LogLake.overwriteWhere(s, dir,
        ord.filter(col("o_orderstatus") === "O")
          .withColumn("o_totalprice", col("o_totalprice") * lit(0.9d)),
        col("o_orderstatus") === "O")                                    // v2: metadata-only region
      LogLake.overwriteWhere(s, dir,
        ord.filter(col("o_orderkey") % 10 === 3)
          .withColumn("o_totalprice", col("o_totalprice") + lit(1.0d)),
        col("o_orderkey") % 10 === 3)                                    // v3: rewrite region
      LogLake.snapshot(s, dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    },

    // --- q129: WRITE-TIME CDC FOR MERGE (Delta's AddCDCFile under
    // `delta.enableChangeDataFeed`, here `loglake.enableChangeDataFeed`).
    // A MERGE mixes updates and genuine inserts in one commit, and the
    // read-side diff cannot tell them apart — row identity exists only
    // at write time. With the table property set, the MERGE records its
    // labeled change rows (update_preimage / update_postimage / insert)
    // as change files in the commit, and `changeFeed` serves them
    // directly: exact labels, no diff, read cost = the change volume,
    // never the rewritten files. v1 creates orders sans the %3=2 keys;
    // v2 merges a source that UPDATES every 5th present order (status →
    // 'M') and INSERTS the %3=2 rows. One frame checks the labeled feed
    // AND the post-merge snapshot in a single hash. At 100 TB the CDC
    // write adds only the changed rows' volume to the merge — the price
    // Delta documents for CDF — and downstream consumers never re-read
    // the rewritten files.
    Q(
      "q129_loglake_merge_cdf",
      s"""WITH src AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         |), base AS (
         |  SELECT * FROM src WHERE o_orderkey % 3 <> 2
         |), matched AS (
         |  SELECT * FROM base WHERE o_orderkey % 5 = 0
         |), ins AS (
         |  SELECT * FROM src WHERE o_orderkey % 3 = 2
         |), snap AS (
         |  SELECT CASE WHEN o_orderkey % 5 = 0 THEN 'M' ELSE o_orderstatus END
         |           AS o_orderstatus, o_totalprice
         |  FROM base
         |  UNION ALL SELECT o_orderstatus, o_totalprice FROM ins
         |)
         |SELECT 'cdc' AS leg, 'insert' AS ct, o_orderstatus,
         |       CAST(COUNT(*) AS BIGINT) AS cnt, ${oSum("o_totalprice")} AS total
         |FROM ins GROUP BY o_orderstatus
         |UNION ALL
         |SELECT 'cdc', 'update_preimage', o_orderstatus,
         |       CAST(COUNT(*) AS BIGINT), ${oSum("o_totalprice")}
         |FROM matched GROUP BY o_orderstatus
         |UNION ALL
         |SELECT 'cdc', 'update_postimage', 'M',
         |       CAST(COUNT(*) AS BIGINT), ${oSum("o_totalprice")}
         |FROM matched
         |UNION ALL
         |SELECT 'snapshot', '-', o_orderstatus,
         |       CAST(COUNT(*) AS BIGINT), ${oSum("o_totalprice")}
         |FROM snap GROUP BY o_orderstatus
         |ORDER BY leg, ct, o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q129")
      val ord = orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = ord.filter(col("o_orderkey") % 3 =!= 2)
      LogLake.create(s, dir, base, statsCols = Seq("o_orderkey"))        // v1
      LogLake.setTableProperties(dir,
        Map("loglake.enableChangeDataFeed" -> "true"))
      val source = base.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderstatus", lit("M"))
        .unionByName(ord.filter(col("o_orderkey") % 3 === 2))
      LogLake.merge(s, dir, source, Seq("o_orderkey"))                   // v2
      val cdc = LogLake.changeFeed(s, dir, 1L, 2L)
        .groupBy(col("_change_type").as("ct"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .select(lit("cdc").as("leg"), col("ct"), col("o_orderstatus"),
          col("cnt"), col("total"))
      val snap = LogLake.snapshot(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .select(lit("snapshot").as("leg"), lit("-").as("ct"),
          col("o_orderstatus"), col("cnt"), col("total"))
      cdc.unionByName(snap).orderBy("leg", "ct", "o_orderstatus")
    },

    // --- q130: DESCRIBE HISTORY under the gate — the audit trail as
    // data. The history is built to make every metric DECLARATIVELY
    // derivable: partitioned writes re-cluster one file per live
    // partition (so num_added_files = distinct statuses in the write),
    // and the v3 partition DELETE drops whole files metadata-only (so
    // num_removed_rows = the partition's row count, num_added_files =
    // 0 — the proof the delete moved no data). Metrics come from one
    // manifest walk with an incrementally-maintained state (removed
    // paths resolve to their pre-commit row counts) — manifest-sized
    // at any table scale, the same reason Delta's DESCRIBE HISTORY is
    // instant on 100 TB tables. Timestamps/txnIds are real but
    // nondeterministic, so the oracle pins the deterministic columns.
    Q(
      "q130_loglake_history",
      s"""WITH src AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         |), base AS (
         |  SELECT * FROM src WHERE o_orderkey % 3 <> 2
         |), slice AS (
         |  SELECT * FROM src WHERE o_orderkey % 3 = 2
         |)
         |SELECT CAST(1 AS BIGINT) AS version, 'create' AS operation,
         |       CAST(0 AS BIGINT) AS read_version,
         |       (SELECT CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM base)
         |         AS num_added_files,
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS num_added_rows,
         |       CAST(0 AS BIGINT) AS num_removed_files,
         |       CAST(0 AS BIGINT) AS num_removed_rows,
         |       CAST(0 AS BIGINT) AS num_change_files
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), 'append', CAST(1 AS BIGINT),
         |       (SELECT CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM slice),
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM slice),
         |       CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), 'delete', CAST(2 AS BIGINT),
         |       CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         |       (SELECT CAST(
         |          CASE WHEN EXISTS(SELECT 1 FROM base WHERE o_orderstatus = 'O')
         |               THEN 1 ELSE 0 END +
         |          CASE WHEN EXISTS(SELECT 1 FROM slice WHERE o_orderstatus = 'O')
         |               THEN 1 ELSE 0 END AS BIGINT)),
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM src
         |        WHERE o_orderstatus = 'O'),
         |       CAST(0 AS BIGINT)
         |ORDER BY version""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q130")
      val ord = orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      LogLake.create(s, dir, ord.filter(col("o_orderkey") % 3 =!= 2),
        statsCols = Seq("o_orderkey"), partitionBy = Seq("o_orderstatus"))  // v1
      LogLake.append(s, dir, ord.filter(col("o_orderkey") % 3 === 2))      // v2
      LogLake.delete(s, dir, col("o_orderstatus") === "O")                 // v3: metadata-only
      LogLake.historyDf(s, dir).select(
        col("version"), col("operation"),
        col("readVersion").as("read_version"),
        col("numAddedFiles").as("num_added_files"),
        col("numAddedRows").as("num_added_rows"),
        col("numRemovedFiles").as("num_removed_files"),
        col("numRemovedRows").as("num_removed_rows"),
        col("numChangeFiles").as("num_change_files"))
        .orderBy("version")
    },

    // --- q131: CONVERT TO LOGLAKE — Delta's CONVERT, the adoption
    // path: a plain parquet directory (written by any engine) becomes
    // a loglake table IN PLACE. Zero data bytes are rewritten at any
    // size; one metadata-sized aggregate collects per-file row counts
    // and o_orderkey stats so file skipping works from commit v1 — the
    // scanRange leg proves it (skipping + exact predicate over a mix
    // of converted originals and post-convert appends). At 100 TB this
    // is how an existing lake migrates: a manifest write, not a
    // rewrite.
    Q(
      "q131_loglake_convert",
      s"""WITH src AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         |)
         |SELECT 'range' AS leg, o_orderstatus,
         |       CAST(COUNT(*) AS BIGINT) AS cnt, ${oSum("o_totalprice")} AS total
         |FROM src WHERE o_orderkey <= 3000 GROUP BY o_orderstatus
         |UNION ALL
         |SELECT 'snapshot', o_orderstatus,
         |       CAST(COUNT(*) AS BIGINT), ${oSum("o_totalprice")}
         |FROM src GROUP BY o_orderstatus
         |ORDER BY leg, o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q131")
      val ord = orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      ord.filter(col("o_orderkey") % 3 =!= 2).write.parquet(dir) // plain parquet
      LogLake.convert(s, dir, statsCols = Seq("o_orderkey"))     // v1: adopt in place
      LogLake.append(s, dir, ord.filter(col("o_orderkey") % 3 === 2)) // v2
      def leg(tag: String, df: org.apache.spark.sql.DataFrame) =
        df.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
          .select(lit(tag).as("leg"), col("o_orderstatus"), col("cnt"), col("total"))
      leg("snapshot", LogLake.snapshot(s, dir))
        .unionByName(leg("range",
          LogLake.scanRange(s, dir, "o_orderkey", null, 3000L)))
        .orderBy("leg", "o_orderstatus")
    },

    // --- q134: GENERATED PARTITION COLUMN (Delta's GENERATED ALWAYS
    // AS + generated-partition pattern). The table declares
    // `o_year = year(o_orderdate)` and partitions by it; the writer
    // supplies only the NATURAL columns — the engine derives the
    // partition key at write, clusters one file per year, and a later
    // partition-predicate DELETE on the derived column drops whole
    // files metadata-only. This is the canonical warehouse layout at
    // 100 TB (daily/yearly partition dropping with zero data IO) where
    // the pipeline never computes its own partition key — the table
    // contract does. The oracle derives the same end state from raw
    // orders.
    Q(
      "q134_loglake_generated",
      s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         |       CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total
         |FROM orders
         |WHERE year(o_orderdate) <> 1995
         |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q134")
      val ord = orders(s, d).select("o_orderkey", "o_orderdate", "o_totalprice")
      val schema = ord.withColumn("o_year", year(col("o_orderdate"))).schema
      LogLake.createEmpty(dir, schema, partitionBy = Seq("o_year"))     // v1
      LogLake.setGeneratedColumn(s, dir, "o_year", "year(o_orderdate)")
      LogLake.append(s, dir, ord)          // v2: o_year derived + clustered
      LogLake.delete(s, dir, col("o_year") === 1995)  // v3: metadata-only
      LogLake.snapshot(s, dir)
        .groupBy("o_year")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_year")
    },

    // --- q135: the round-11 SQL DDL parity surface, end to end in
    // `spark.sql` ALONE — CREATE TABLE with column-level GENERATED
    // ALWAYS AS (expr) and GENERATED ALWAYS AS IDENTITY clauses (the
    // Delta clauses the stock grammar lacks, grafted via the delegating
    // parser), ALTER TABLE ADD CONSTRAINT enforcing every later write,
    // and INSERT INTO … REPLACE WHERE backfilling one partition region
    // (metadata-only region drop + fresh identity values for the
    // replacement rows). The oracle replays the same end state from raw
    // orders; the rid_rows leg proves every surviving row carries an
    // engine-assigned identity value. At 100 TB this is the standard
    // governed-warehouse shape: derived partition key, constraint-gated
    // ingest, partition-scoped backfill with zero data IO outside the
    // region.
    Q(
      "q135_loglake_sql_ddl",
      s"""WITH base AS (
         |  SELECT o_orderkey, o_orderdate, o_totalprice,
         |         CAST(year(o_orderdate) AS INT) AS o_year
         |  FROM orders
         |), final AS (
         |  SELECT * FROM base WHERE o_year <> 1995
         |  UNION ALL
         |  SELECT o_orderkey, o_orderdate, o_totalprice + 10.0, o_year
         |  FROM base WHERE o_year = 1995
         |)
         |SELECT o_year, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total,
         |       CAST(COUNT(*) AS BIGINT) AS rid_rows
         |FROM final GROUP BY o_year ORDER BY o_year""".stripMargin
    ) { (s, d) =>
      val ns = "q135_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      val wh = s.conf.get("spark.sql.catalog.loglake.warehouse")
      scratchDirs.add(new java.io.File(s"$wh/$ns"))
      s.sql(s"CREATE NAMESPACE loglake.$ns")
      s.sql(
        s"""CREATE TABLE loglake.$ns.t (
           |  o_orderkey BIGINT,
           |  o_orderdate TIMESTAMP,
           |  o_totalprice DOUBLE,
           |  o_year INT GENERATED ALWAYS AS (year(o_orderdate)),
           |  rid BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1 INCREMENT BY 1)
           |) USING loglake PARTITIONED BY (o_year)""".stripMargin)
      s.sql(s"ALTER TABLE loglake.$ns.t ADD CONSTRAINT price_pos " +
        "CHECK (o_totalprice > 0)")
      orders(s, d).select("o_orderkey", "o_orderdate", "o_totalprice")
        .createOrReplaceTempView("q135_orders")
      s.sql(s"INSERT INTO loglake.$ns.t (o_orderkey, o_orderdate, " +
        "o_totalprice, o_year) SELECT o_orderkey, o_orderdate, " +
        "o_totalprice, CAST(year(o_orderdate) AS INT) FROM q135_orders")
      s.sql(s"INSERT INTO loglake.$ns.t REPLACE WHERE o_year = 1995 " +
        "SELECT o_orderkey, o_orderdate, o_totalprice + 10.0, " +
        "CAST(year(o_orderdate) AS INT) FROM q135_orders " +
        "WHERE year(o_orderdate) = 1995")
      s.sql(
        s"""SELECT o_year, CAST(COUNT(*) AS BIGINT) AS cnt,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total,
           |       CAST(SUM(CASE WHEN rid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS rid_rows
           |FROM loglake.$ns.t
           |GROUP BY o_year ORDER BY o_year""".stripMargin)
    },

    // --- q136: WRITE-TIME ROW TRACKING (Delta row IDs) under the
    // gate — the labeled MERGE feed with the CDC property ABSENT.
    // Every row gets a stable identity at first write (manifest base +
    // row_index — zero write cost); the merge rewrite materializes
    // surviving rows' ids, so the change feed joins added and removed
    // rows ON IDENTITY: carried rows cancel exactly, updates surface
    // as pre/postimage pairs, inserts label correctly — no write-time
    // change files, no read-side ambiguity. The feed is consumed
    // through the STREAMING CDF source into a second table (real
    // checkpointed micro-batches), then aggregated next to the
    // snapshot. Same oracle shape as q129, proving row tracking and
    // write-time CDC produce the identical labeled feed by different
    // means. At 100 TB the labeling read costs the merge's
    // changed-file volume — same as the diff it replaces — and the
    // id-join broadcast side is manifest-sized.
    Q(
      "q136_loglake_row_tracking",
      s"""WITH src AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         |), base AS (
         |  SELECT * FROM src WHERE o_orderkey % 3 <> 2
         |), matched AS (
         |  SELECT * FROM base WHERE o_orderkey % 5 = 0
         |), ins AS (
         |  SELECT * FROM src WHERE o_orderkey % 3 = 2
         |), snap AS (
         |  SELECT CASE WHEN o_orderkey % 5 = 0 THEN 'M' ELSE o_orderstatus END
         |           AS o_orderstatus, o_totalprice
         |  FROM base
         |  UNION ALL SELECT o_orderstatus, o_totalprice FROM ins
         |)
         |SELECT 'feed' AS leg, 'insert' AS ct, o_orderstatus,
         |       CAST(COUNT(*) AS BIGINT) AS cnt, ${oSum("o_totalprice")} AS total
         |FROM ins GROUP BY o_orderstatus
         |UNION ALL
         |SELECT 'feed', 'update_preimage', o_orderstatus,
         |       CAST(COUNT(*) AS BIGINT), ${oSum("o_totalprice")}
         |FROM matched GROUP BY o_orderstatus
         |UNION ALL
         |SELECT 'feed', 'update_postimage', 'M',
         |       CAST(COUNT(*) AS BIGINT), ${oSum("o_totalprice")}
         |FROM matched
         |UNION ALL
         |SELECT 'snapshot', '-', o_orderstatus,
         |       CAST(COUNT(*) AS BIGINT), ${oSum("o_totalprice")}
         |FROM snap GROUP BY o_orderstatus
         |ORDER BY leg, ct, o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q136"); val dst = freshDir("q136-dst")
      val chk = freshDir("q136-chk")
      val ord = orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = ord.filter(col("o_orderkey") % 3 =!= 2)
      LogLake.createEmpty(dir, base.schema)                              // v1
      LogLake.setTableProperties(dir,
        Map("loglake.enableRowTracking" -> "true"))
      LogLake.append(s, dir, base, statsCols = Seq("o_orderkey"))        // v2
      val source = base.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderstatus", lit("M"))
        .unionByName(ord.filter(col("o_orderkey") % 3 === 2))
      LogLake.merge(s, dir, source, Seq("o_orderkey"))                   // v3
      require(LogLake.history(dir).last.cdc.isEmpty,
        "q136 must label WITHOUT write-time CDC files")
      val q = s.readStream.format("loglake")
        .option("readChangeFeed", "true")
        .option("startingVersion", "3").load(dir)
        .writeStream.format("loglake").option("path", dst)
        .option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(300000)
      val feed = LogLake.snapshot(s, dst)
        .groupBy(col("_change_type").as("ct"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .select(lit("feed").as("leg"), col("ct"), col("o_orderstatus"),
          col("cnt"), col("total"))
      val snap = LogLake.snapshot(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .select(lit("snapshot").as("leg"), lit("-").as("ct"),
          col("o_orderstatus"), col("cnt"), col("total"))
      feed.unionByName(snap).orderBy("leg", "ct", "o_orderstatus")
    },

    // --- q137: the GENERAL MERGE clause matrix (Delta's full surface:
    // conditional matched UPDATE/DELETE, conditional INSERT of
    // arbitrary expressions, WHEN NOT MATCHED BY SOURCE UPDATE/DELETE)
    // — one full-outer join over touched-file volume drives every
    // clause as a single codegen'd CASE walk; NOT MATCHED BY SOURCE
    // widens the touched set only to files its clause conditions'
    // stats admit. The oracle replays the five-way row classification
    // declaratively. At 100 TB the rewrite cost stays touched-file +
    // source volume; the clause walk adds zero extra passes.
    Q(
      "q137_loglake_merge_clauses",
      s"""WITH base AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         |  WHERE o_orderkey % 3 <> 2
         |), src AS (
         |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
         |), final AS (
         |  SELECT CASE WHEN s.o_orderkey IS NOT NULL THEN 'U'
         |              WHEN b.o_totalprice >= 50000 THEN 'S'
         |              ELSE b.o_orderstatus END AS st,
         |         CASE WHEN s.o_orderkey IS NOT NULL
         |              THEN b.o_totalprice + s.o_totalprice
         |              ELSE b.o_totalprice END AS tp,
         |         CASE WHEN s.o_orderkey IS NOT NULL THEN b.o_totalprice < 200000
         |              ELSE b.o_totalprice >= 50000 END AS keep
         |  FROM base b LEFT JOIN src s ON b.o_orderkey = s.o_orderkey
         |  UNION ALL
         |  SELECT 'I', s.o_totalprice * 2, s.o_totalprice < 150000
         |  FROM src s LEFT JOIN base b ON b.o_orderkey = s.o_orderkey
         |  WHERE b.o_orderkey IS NULL
         |)
         |SELECT st AS o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("tp")} AS total
         |FROM final WHERE keep GROUP BY st
         |ORDER BY o_orderstatus""".stripMargin
    ) { (s, d) =>
      import LogLake.MergeClause._
      val dir = freshDir("q137")
      val ord = orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      LogLake.create(s, dir, ord.filter(col("o_orderkey") % 3 =!= 2),
        statsCols = Seq("o_orderkey", "o_totalprice"))             // v1
      LogLake.mergeClauses(s, dir,
        ord.filter(col("o_orderkey") % 2 === 0)
          .select("o_orderkey", "o_totalprice"),
        Seq("o_orderkey"),
        Seq(
          MatchedDelete(Some(col("target.o_totalprice") >= 200000d)),
          MatchedUpdate(None, Map(
            "o_orderstatus" -> lit("U"),
            "o_totalprice" ->
              (col("target.o_totalprice") + col("source.o_totalprice")))),
          NotMatchedInsert(Some(col("source.o_totalprice") < 150000d), Map(
            "o_orderkey" -> col("source.o_orderkey"),
            "o_orderstatus" -> lit("I"),
            "o_totalprice" -> (col("source.o_totalprice") * 2d))),
          NotMatchedBySourceDelete(Some(col("target.o_totalprice") < 50000d)),
          NotMatchedBySourceUpdate(None, Map(
            "o_orderstatus" -> lit("S")))))                        // v2
      LogLake.snapshot(s, dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    },

    // --- q138: METADATA-ONLY COUNTS (Delta's
    // OptimizeMetadataOnlyDeltaQuery): unfiltered count(*), GROUP BY
    // partition column + count(*), and partition-predicate-filtered
    // count(*) over a partitioned loglake table all collapse to
    // LocalRelations answered from the manifest — the query REQUIRES
    // the collapsed plan (a scan would fail the run, not just slow
    // it). The oracle recomputes the same counts the honest way. At
    // 100 TB these are the dashboard queries that cost zero data
    // bytes at any table size.
    Q(
      "q138_loglake_metadata_counts",
      s"""WITH base AS (
         |  SELECT o_orderkey, o_orderstatus FROM orders
         |)
         |SELECT 'total' AS leg, '-' AS o_orderstatus,
         |       CAST(COUNT(*) AS BIGINT) AS cnt FROM base
         |UNION ALL
         |SELECT 'by_part', o_orderstatus, CAST(COUNT(*) AS BIGINT)
         |FROM base GROUP BY o_orderstatus
         |UNION ALL
         |SELECT 'filtered', '-', CAST(COUNT(*) AS BIGINT)
         |FROM base WHERE o_orderstatus <> 'O'
         |ORDER BY leg, o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q138")
      val ord = orders(s, d).select("o_orderkey", "o_orderstatus")
      LogLake.create(s, dir, ord, partitionBy = Seq("o_orderstatus"))
      def requireLocal(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        require(df.queryExecution.optimizedPlan.collectFirst {
          case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
        }.nonEmpty, s"q138: plan kept a scan:\n${df.queryExecution.optimizedPlan}")
        df
      }
      val t = s.read.format("loglake").load(dir)
      val total = requireLocal(t.groupBy().count())
        .select(lit("total").as("leg"), lit("-").as("o_orderstatus"),
          col("count").as("cnt"))
      val byPart = requireLocal(t.groupBy("o_orderstatus").count())
        .select(lit("by_part").as("leg"), col("o_orderstatus"),
          col("count").as("cnt"))
      val filtered = requireLocal(
        t.filter(col("o_orderstatus") =!= "O").groupBy().count())
        .select(lit("filtered").as("leg"), lit("-").as("o_orderstatus"),
          col("count").as("cnt"))
      total.unionByName(byPart).unionByName(filtered)
        .orderBy("leg", "o_orderstatus")
    },

    // --- q139: DYNAMIC PARTITION PRUNING over a partitioned loglake
    // fact. The FileIndex surfaces a REAL partitionSchema (values from
    // the manifest tuples, declared column order preserved by the
    // overlapped-partition-column merge), so Spark's PartitionPruning
    // rule plants a DynamicPruningSubquery on the fact scan: the dim
    // filter's surviving keys — known only at runtime, via the reused
    // broadcast — prune fact partitions BEFORE any fact bytes are
    // read. The query REQUIRES the planted filter (a plan without it
    // fails the run). At 100 TB this is the star-join pattern: a
    // 1000-executor fact scan drops to the dim-selected partitions
    // with zero extra passes.
    Q(
      "q139_loglake_dpp",
      s"""WITH dim(o_orderstatus, cls) AS (
         |  VALUES ('F', 'keep'), ('O', 'drop'), ('P', 'drop')
         |)
         |SELECT o.o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o.o_totalprice")} AS total
         |FROM orders o JOIN dim d ON o.o_orderstatus = d.o_orderstatus
         |WHERE d.cls = 'keep'
         |GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val dir = freshDir("q139")
      val ord = orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      LogLake.create(s, dir, ord, partitionBy = Seq("o_orderstatus"))
      // the dim must be file-backed: a LocalRelation dim is constant-
      // folded before PartitionPruning looks for a selective filter
      val dimDir = freshDir("q139dim")
      Seq(("F", "keep"), ("O", "drop"), ("P", "drop")).toDF("o_orderstatus", "cls")
        .write.parquet(dimDir)
      val fact = s.read.format("loglake").load(dir)
      val dim = s.read.parquet(dimDir)
      val q = fact.join(broadcast(dim), Seq("o_orderstatus"))
        .filter(col("cls") === "keep")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
      require(q.queryExecution.optimizedPlan.exists(_.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))),
        s"q139: no dynamic pruning filter planted:\n${q.queryExecution.optimizedPlan}")
      q
    },

    // --- q140: METADATA-ONLY MIN/MAX/COUNT(col) (the rest of Delta's
    // OptimizeMetadataOnlyDeltaQuery surface): ungrouped min/max over
    // stats-covered columns, non-null counts via per-file null counts,
    // min/max of the partition column itself (tuple values — no stats
    // needed), and a partition-filtered variant — each REQUIRED to
    // collapse to a LocalRelation (a kept scan fails the run, not just
    // slows it). The oracle recomputes every aggregate honestly. At
    // 100 TB these answer from the manifest regardless of table size;
    // a DV'd or stats-less column keeps the scan (spec-pinned).
    Q(
      "q140_loglake_metadata_minmax",
      """SELECT g.key_lo, g.key_hi, g.cnt, g.st_lo, g.st_hi,
        |       f.price_lo, f.price_hi
        |FROM (SELECT CAST(min(o_orderkey) AS BIGINT) AS key_lo,
        |             CAST(max(o_orderkey) AS BIGINT) AS key_hi,
        |             CAST(count(o_orderkey) AS BIGINT) AS cnt,
        |             min(o_orderstatus) AS st_lo,
        |             max(o_orderstatus) AS st_hi FROM orders) g
        |CROSS JOIN (SELECT min(o_totalprice) AS price_lo,
        |                   max(o_totalprice) AS price_hi
        |            FROM orders WHERE o_orderstatus = 'F') f""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q140")
      val ord = orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      LogLake.create(s, dir, ord,
        statsCols = Seq("o_orderkey", "o_totalprice"),
        partitionBy = Seq("o_orderstatus"))
      def requireLocal(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        require(df.queryExecution.optimizedPlan.collectFirst {
          case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
        }.nonEmpty, s"q140: plan kept a scan:\n${df.queryExecution.optimizedPlan}")
        df
      }
      val t = s.read.format("loglake").load(dir)
      val global = requireLocal(t.groupBy().agg(
        min("o_orderkey").as("key_lo"), max("o_orderkey").as("key_hi"),
        count(col("o_orderkey")).as("cnt"),
        min("o_orderstatus").as("st_lo"), max("o_orderstatus").as("st_hi")))
      val filtered = requireLocal(t.filter(col("o_orderstatus") === "F")
        .groupBy().agg(min("o_totalprice").as("price_lo"),
          max("o_totalprice").as("price_hi")))
      global.crossJoin(filtered)
    },

    // --- q141: METADATA RETENTION (Delta's logRetentionDuration). 25
    // commits (orders sliced by o_orderkey % 25) cross two checkpoint
    // boundaries; cleanupMetadata then drops the log below the newest
    // checkpoint (v20). The query reads BOTH retained surfaces through
    // the truncated log — the latest snapshot per status, and the v20
    // floor via time travel — while the builder asserts the sweep
    // really happened and the history is exactly the 20..25 suffix.
    // At one commit a minute, an uncleaned log is ~0.5M manifests a
    // year and the per-read listing degrades with table AGE; retention
    // keeps it proportional to the window. The oracle replays both
    // states declaratively (v20 = slices 0..19).
    Q(
      "q141_loglake_log_cleanup",
      s"""SELECT l.o_orderstatus, l.cnt, l.total, f.floor_rows, f.floor_total
         |FROM (SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |             ${oSum("o_totalprice")} AS total
         |      FROM orders GROUP BY o_orderstatus) l
         |CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS floor_rows,
         |                   ${oSum("o_totalprice")} AS floor_total
         |            FROM orders WHERE o_orderkey % 25 <= 19) f
         |ORDER BY l.o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q141")
      // cache the 3-column projection for the 25-commit loop: the cost
      // under measure is the COMMIT protocol across checkpoint
      // boundaries, not 25 re-scans of the source parquet
      val ord = orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice").persist()
      try {
        LogLake.create(s, dir, ord.filter(col("o_orderkey") % 25 === 0),
          statsCols = Seq("o_orderkey"))
        (1 to 24).foreach(i => LogLake.append(s, dir,
          ord.filter(col("o_orderkey") % 25 === i)))
      } finally ord.unpersist()
      val swept = LogLake.cleanupMetadata(dir, olderThanMs = -60000L)
      require(swept.nonEmpty, "q141: cleanup must sweep the expired log")
      require(LogLake.history(dir).map(_.version) == (20L to 25L),
        s"q141: retained log must be the 20..25 suffix, got " +
          LogLake.history(dir).map(_.version).mkString(","))
      val latest = LogLake.snapshot(s, dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
      val floor = LogLake.snapshot(s, dir, asOf = Some(20L))
        .agg(count(lit(1)).as("floor_rows"),
          dsum(col("o_totalprice")).as("floor_total"))
      latest.crossJoin(floor).orderBy("o_orderstatus")
    },

    // --- q142: HASH-BUCKETED ACID TABLES (Hive/Spark bucketing on the
    // loglake format). Both sides of a custkey join are created
    // bucketed INTO 8 BUCKETS on the key; every write conforms to the
    // create-time spec (one repartition whose partition-id expression
    // IS the bucket-id definition, the id rides the file NAME), and
    // the native scan surfaces HashPartitioning — so the join plans
    // with NO exchange under either table, which the builder REQUIRES
    // structurally (a shuffling plan fails the run, not just slows
    // it). An extra append per side proves multi-file buckets still
    // co-locate. At 100 TB this converts the recurring fact⋈dim join
    // from a full network re-shuffle of both tables into a local
    // per-bucket merge — the single biggest repeated-query win a table
    // layout can buy. Oracle = the plain join (bucketing is pure
    // layout; semantics are untouched).
    Q(
      "q142_loglake_bucketed_join",
      s"""SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o.o_totalprice")} AS total
         |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin
    ) { (s, d) =>
      // broadcast disabled: the pattern exists for sides too big to
      // broadcast; AQE off so the exchange (or its absence) is
      // structurally checkable pre-execution
      val s2 = graft.Sessions.derived(s,
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false")
      val ordDir = freshDir("q142o"); val custDir = freshDir("q142c")
      val ord = orders(s2, d).select("o_orderkey", "o_custkey", "o_totalprice")
      val cust = customer(s2, d).select("c_custkey", "c_mktsegment")
      LogLake.create(s2, ordDir, ord.filter(col("o_orderkey") % 2 === 0),
        bucketBy = Seq("o_custkey"), numBuckets = 8)
      LogLake.append(s2, ordDir, ord.filter(col("o_orderkey") % 2 === 1))
      LogLake.create(s2, custDir, cust.filter(col("c_custkey") % 2 === 0),
        bucketBy = Seq("c_custkey"), numBuckets = 8)
      LogLake.append(s2, custDir, cust.filter(col("c_custkey") % 2 === 1))
      val q = s2.read.format("loglake").load(ordDir)
        .join(s2.read.format("loglake").load(custDir),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .orderBy("c_mktsegment")
      val smj = q.queryExecution.executedPlan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }.getOrElse(throw new IllegalStateException(
        s"q142: expected a sort-merge join:\n${q.queryExecution.executedPlan}"))
      val shuffles = smj.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      require(shuffles.isEmpty,
        s"q142: bucketed join must not shuffle either side:\n$smj")
      q
    },

    // --- q143: TYPE WIDENING (Delta's typeWidening): the table is
    // created NARROW (int key, decimal(12,2) price), two ALTER COLUMN
    // TYPE commits widen to bigint / decimal(20,4) METADATA-ONLY (the
    // builder asserts zero data commits), and an append lands rows
    // that only fit the wide types (keys beyond int range, 4-decimal
    // prices). The final aggregate reads old narrow parquet and new
    // wide parquet through ONE schema — the vectorized reader promotes
    // the old files in place. At 100 TB this is the schema migration
    // that never rewrites: the alternative is a full-table rewrite to
    // relax a type. Oracle replays the same union declaratively.
    Q(
      "q143_loglake_type_widening",
      s"""WITH t AS (
         |  SELECT CAST(o_orderkey AS BIGINT) AS k,
         |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(20,4)) AS price,
         |         o_orderstatus AS st
         |  FROM orders
         |  UNION ALL
         |  SELECT CAST(o_orderkey AS BIGINT) + 10000000000,
         |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(20,4))
         |           + CAST(0.0025 AS DECIMAL(20,4)),
         |         o_orderstatus
         |  FROM orders WHERE o_orderkey % 100 = 0
         |)
         |SELECT st, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       CAST(MAX(k) AS BIGINT) AS max_k, ${oSum("price")} AS total
         |FROM t GROUP BY st ORDER BY st""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.types.{DecimalType, LongType}
      val dir = freshDir("q143")
      val ord = orders(s, d)
      LogLake.create(s, dir, ord.select(
        col("o_orderkey").cast("int").as("k"),
        col("o_totalprice").cast(DecimalType(12, 2)).as("price"),
        col("o_orderstatus").as("st")), statsCols = Seq("k"))
      val v0 = LogLake.currentVersion(dir)
      LogLake.widenColumn(s, dir, "k", LongType)
      LogLake.widenColumn(s, dir, "price", DecimalType(20, 4))
      require(LogLake.currentVersion(dir) == v0 + 2 &&
        LogLake.history(dir).takeRight(2).forall(_.adds.isEmpty),
        "q143: widening must be two metadata-only commits")
      LogLake.append(s, dir, ord.filter(col("o_orderkey") % 100 === 0).select(
        (col("o_orderkey") + lit(10000000000L)).as("k"),
        (col("o_totalprice").cast(DecimalType(12, 2)).cast(DecimalType(20, 4))
          + lit(0.0025).cast(DecimalType(20, 4))).cast(DecimalType(20, 4)).as("price"),
        col("o_orderstatus").as("st")))
      s.read.format("loglake").load(dir)
        .groupBy("st")
        .agg(count(lit(1)).as("cnt"), max("k").as("max_k"),
          dsum(col("price")).as("total"))
        .orderBy("st")
    },

    // --- q145: NAMED TAGS (Iceberg refs) + vacuum pinning. v1 is
    // tagged 'baseline', a full overwrite then RETIRES every v1 file,
    // and an immediate zero-retention vacuum runs — the tag must pin
    // the retired generation (builder requires the sweep found NOTHING
    // to reclaim), and the final result joins the CURRENT state with a
    // `VERSION AS OF 'baseline'` read whose files only still exist
    // because of the pin. At 100 TB tags are how a lakehouse keeps
    // auditable point-in-time snapshots without suspending vacuum:
    // the pin costs one metadata resolve per tag at vacuum time, and
    // dropping the tag releases the storage on the next pass. Oracle
    // replays both states declaratively.
    Q(
      "q145_loglake_tags",
      s"""SELECT cur.o_orderstatus, cur.cnt, cur.total,
         |       b.base_rows, b.base_total
         |FROM (SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |             ${oSum("o_totalprice")} AS total
         |      FROM orders WHERE o_orderkey % 3 <> 0
         |      GROUP BY o_orderstatus) cur
         |CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS base_rows,
         |                   ${oSum("o_totalprice")} AS base_total
         |            FROM orders) b
         |ORDER BY cur.o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q145")
      val ord = orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      LogLake.create(s, dir, ord)
      LogLake.setTag(dir, "baseline")
      LogLake.overwrite(s, dir, ord.filter(col("o_orderkey") % 3 =!= 0))
      val swept = LogLake.vacuum(dir, olderThanMs = -60000L, spark = s)
      require(swept.isEmpty,
        s"q145: the tag must pin the retired generation, vacuum swept $swept")
      val current = s.read.format("loglake").load(dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
      val baseline = s.read.format("loglake")
        .option("versionAsOf", "baseline").load(dir)
        .agg(count(lit(1)).as("base_rows"),
          dsum(col("o_totalprice")).as("base_total"))
      current.crossJoin(baseline).orderBy("o_orderstatus")
    },

    // --- q146: WRITABLE BRANCHES (Iceberg branches / Delta WAP).
    // Main holds orders; a 'staging' branch is created and a derived
    // batch is appended TO THE BRANCH while main takes an unrelated
    // append of its own. The builder REQUIRES isolation (main never
    // sees the staged rows pre-publish), then publishes: the
    // append-only branch composes with the interleaved main commit as
    // one atomic blind-append commit (zero data rewritten — publish
    // moves files by rename, metadata-sized on rename-capable
    // stores). At 100 TB this is the write-audit-publish pattern: a
    // pipeline stages a day's ingest on a branch, audits it with full
    // query power, and promotes it without ever exposing partial
    // state. Oracle replays main ∪ main-append ∪ branch-append.
    Q(
      "q146_loglake_branch_wap",
      s"""WITH t AS (
         |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS price
         |  FROM orders
         |  UNION ALL
         |  SELECT o_orderkey + 30000000000, 'M', o_totalprice
         |  FROM orders WHERE o_orderkey % 11 = 0
         |  UNION ALL
         |  SELECT o_orderkey + 20000000000, 'B', o_totalprice + 1.5
         |  FROM orders WHERE o_orderkey % 7 = 0
         |)
         |SELECT st, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       CAST(MAX(k) AS BIGINT) AS max_k, ${oSum("price")} AS total
         |FROM t GROUP BY st ORDER BY st""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q146")
      val ord = orders(s, d).select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        col("o_totalprice").as("price"))
      LogLake.create(s, dir, ord)
      LogLake.createBranch(s, dir, "staging")
      // stage on the branch; main takes its own append meanwhile
      LogLake.append(s, LogLake.branchDir(dir, "staging"),
        ord.filter(col("k") % 7 === 0).select(
          (col("k") + lit(20000000000L)).as("k"), lit("B").as("st"),
          (col("price") + lit(1.5)).as("price")))
      LogLake.append(s, dir,
        ord.filter(col("k") % 11 === 0).select(
          (col("k") + lit(30000000000L)).as("k"), lit("M").as("st"),
          col("price")))
      val staged = ord.filter(col("k") % 7 === 0).count()
      val mainPre = s.read.format("loglake").load(dir).count()
      require(mainPre == ord.count() + ord.filter(col("k") % 11 === 0).count(),
        "q146: staged branch rows leaked into main before publish")
      val v = LogLake.publishBranch(s, dir, "staging")
      require(LogLake.branches(dir).isEmpty &&
        LogLake.history(dir).find(_.version == v).exists(_.op == "publish"),
        "q146: publish must land as one blind-append commit and retire the branch")
      require(s.read.format("loglake").load(dir).count() == mainPre + staged,
        "q146: published rows missing from main")
      s.read.format("loglake").load(dir)
        .groupBy("st")
        .agg(count(lit(1)).as("cnt"), max("k").as("max_k"),
          dsum(col("price")).as("total"))
        .orderBy("st")
    },

    // --- q147: STRING STATS TRUNCATION on a real text corpus (the
    // round-12 Delta-32-char rule). The documents table — the exact
    // shape this engine targets at 100 TB — lands in a loglake table
    // whose default stats now store BOUNDED text min/max (≤ 32 code
    // points, `strunc`-tagged) instead of copying each file's two
    // extreme documents into the manifest; the builder REQUIRES the
    // bound and the tag. The query then proves both stats consumers
    // stay sound through truncation: an exact-equality needle on a
    // >100-char document (far beyond the truncation horizon) still
    // finds every match, and per-language aggregates over the
    // truncated-stats files are exact. Oracle replays over the raw
    // parquet.
    Q(
      "q147_loglake_text_stats",
      s"""WITH needle AS (
         |  SELECT text FROM documents WHERE length(text) > 100
         |  ORDER BY doc_id LIMIT 1
         |), hits AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS needle_hits
         |  FROM documents a JOIN needle n ON a.text = n.text
         |)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |       CAST(MIN(doc_id) AS BIGINT) AS min_id,
         |       (SELECT needle_hits FROM hits) AS needle_hits
         |FROM documents WHERE length(text) > 32
         |GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q147")
      val docs = documents(s, d)
        .select("doc_id", "text", "lang", "source", "n_chars")
      LogLake.create(s, dir, docs.repartition(4))
      // the contract this query exists to pin: text stats are BOUNDED
      // and tagged — the manifest never carries whole documents
      val textStats = LogLake.pruneFiles(dir, "text", null, null)._1
        .flatMap(_.stats.get("text"))
      require(textStats.nonEmpty &&
        textStats.forall(st => st.tpe == "null" ||
          (st.min.codePointCount(0, st.min.length) <= 32 &&
            st.max.codePointCount(0, st.max.length) <= 32)),
        "q147: text stats must be truncated to the 32-cp bound")
      require(textStats.exists(_.tpe == LogLake.StringTruncTag),
        "q147: a corpus of >32-char documents must carry the strunc tag")
      val lake = s.read.format("loglake").load(dir)
      val needle = lake.filter(length(col("text")) > 100)
        .orderBy("doc_id").limit(1).select(col("text").as("ntext"))
      val hits = lake.join(broadcast(needle), col("text") === col("ntext"))
        .agg(count(lit(1)).as("needle_hits"))
      lake.filter(length(col("text")) > 32)
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"),
          sum("n_chars").cast("long").as("sum_chars"),
          min("doc_id").as("min_id"))
        .crossJoin(hits)
        .orderBy("lang")
    },

    // --- q148: BRANCH PUBLISH WITH ADDITIVE SCHEMA EVOLUTION (round
    // 13; Iceberg branches carry schema through publish). A 'enrich'
    // branch appends rows bearing a NEW nullable column (`prio`) —
    // the ordinary append-time evolution, just on the branch head —
    // while main takes an unrelated append of its own. Publish lands
    // as ONE validated `publish_rewrite` commit: main gains the
    // column, every pre-existing file NULL-fills it at read, the
    // interleaved main append composes (the winner kept the schema
    // the publish's decisions were made under), and zero data bytes
    // move (file adoption is metadata renames). At 100 TB this is the
    // WAP pipeline that stages a new feature column on a branch and
    // promotes it atomically — no main rewrite, no read downtime.
    // Oracle replays base ∪ main-append (prio NULL) ∪ branch rows.
    Q(
      "q148_loglake_branch_evolve",
      s"""WITH t AS (
         |  SELECT o_orderkey AS k, o_orderstatus AS st,
         |         o_totalprice AS price, CAST(NULL AS VARCHAR) AS prio
         |  FROM orders
         |  UNION ALL
         |  SELECT o_orderkey + 40000000000, 'M', o_totalprice,
         |         CAST(NULL AS VARCHAR)
         |  FROM orders WHERE o_orderkey % 13 = 0
         |  UNION ALL
         |  SELECT o_orderkey + 50000000000, 'E', o_totalprice + 2.5,
         |         o_orderpriority
         |  FROM orders WHERE o_orderkey % 5 = 0
         |)
         |SELECT st, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       CAST(COUNT(prio) AS BIGINT) AS n_prio,
         |       MAX(prio) AS max_prio, ${oSum("price")} AS total
         |FROM t GROUP BY st ORDER BY st""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q148")
      val ord = orders(s, d).select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        col("o_totalprice").as("price"), col("o_orderpriority"))
      LogLake.create(s, dir, ord.drop("o_orderpriority"))
      LogLake.createBranch(s, dir, "enrich")
      // the branch append EVOLVES the schema: new nullable prio column
      LogLake.append(s, LogLake.branchDir(dir, "enrich"),
        ord.filter(col("k") % 5 === 0).select(
          (col("k") + lit(50000000000L)).as("k"), lit("E").as("st"),
          (col("price") + lit(2.5)).as("price"),
          when(lit(true), col("o_orderpriority")).as("prio")))
      // main moves on meanwhile — the evolved publish must compose
      LogLake.append(s, dir,
        ord.filter(col("k") % 13 === 0).select(
          (col("k") + lit(40000000000L)).as("k"), lit("M").as("st"),
          col("price")))
      require(!s.read.format("loglake").load(dir).columns.contains("prio"),
        "q148: the staged column leaked into main before publish")
      val v = LogLake.publishBranch(s, dir, "enrich")
      require(LogLake.history(dir).find(_.version == v)
        .exists(_.op == "publish_rewrite"),
        "q148: schema evolution must publish as a VALIDATED commit")
      val lake = s.read.format("loglake").load(dir)
      require(lake.columns.contains("prio"),
        "q148: main must gain the published column")
      lake.groupBy("st")
        .agg(count(lit(1)).as("cnt"),
          count(col("prio")).as("n_prio"),
          max("prio").as("max_prio"),
          dsum(col("price")).as("total"))
        .orderBy("st")
    },

    // --- q149: PURE-SQL WAP through the branch ident (round 13;
    // Iceberg's `db.t.branch_<name>` addressing). The whole
    // write-audit-publish cycle runs in `spark.sql` ALONE: CREATE
    // BRANCH, INSERT INTO the branch ident, a rewriting DELETE on the
    // branch ident, audit SELECTs proving isolation, PUBLISH BRANCH —
    // no DataFrame API anywhere. The branch ident resolves through the
    // catalog to the branch's own table directory, so every DML
    // lowering (insert/merge/update/delete) reuses the exact path-API
    // commit primitives; nothing here is a second engine. At 100 TB
    // the cycle's cost is the branch's own writes + one metadata
    // publish commit. Oracle replays base-minus-deleted ∪ staged.
    Q(
      "q149_loglake_sql_branch",
      s"""WITH t AS (
         |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS price
         |  FROM orders WHERE o_orderkey % 3 <> 1
         |  UNION ALL
         |  SELECT o_orderkey + 60000000000, 'S', o_totalprice + 0.25
         |  FROM orders WHERE o_orderkey % 9 = 0
         |)
         |SELECT st, CAST(COUNT(*) AS BIGINT) AS cnt, ${oSum("price")} AS total
         |FROM t GROUP BY st ORDER BY st""".stripMargin
    ) { (s, d) =>
      val ns = "q149_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      val wh = s.conf.get("spark.sql.catalog.loglake.warehouse")
      scratchDirs.add(new java.io.File(s"$wh/$ns"))
      s.sql(s"CREATE NAMESPACE loglake.$ns")
      s.sql(s"CREATE TABLE loglake.$ns.t (k BIGINT, st STRING, price DOUBLE)")
      orders(s, d).select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        col("o_totalprice").as("price"))
        .createOrReplaceTempView("q149_orders")
      s.sql(s"INSERT INTO loglake.$ns.t SELECT k, st, price FROM q149_orders")
      s.sql(s"ALTER TABLE loglake.$ns.t CREATE BRANCH staging")
      // stage new rows and a rewrite ON THE BRANCH, in SQL
      s.sql(s"INSERT INTO loglake.$ns.t.branch_staging " +
        "SELECT k + 60000000000, 'S', price + 0.25 FROM q149_orders " +
        "WHERE k % 9 = 0")
      s.sql(s"DELETE FROM loglake.$ns.t.branch_staging WHERE k % 3 = 1")
      // audit: isolation both ways, in SQL
      val mainCnt = s.sql(s"SELECT COUNT(*) FROM loglake.$ns.t")
        .head().getLong(0)
      require(mainCnt == orders(s, d).count(),
        "q149: staged branch work leaked into main before publish")
      s.sql(s"ALTER TABLE loglake.$ns.t PUBLISH BRANCH staging")
      s.sql(
        s"""SELECT st, CAST(COUNT(*) AS BIGINT) AS cnt,
           |       CAST(SUM(CAST(price AS DECIMAL(38,6))) AS DOUBLE) AS total
           |FROM loglake.$ns.t
           |GROUP BY st ORDER BY st""".stripMargin)
    },

    // --- q151: PARQUET CHECKPOINT BODIES end-to-end (round 13;
    // Delta's parquet checkpoints). The table sets
    // `loglake.checkpoint.format = parquet` + a small part budget, 12
    // commits cross the checkpoint interval, and the builder REQUIRES
    // the resulting checkpoint to be a multi-part PARQUET group
    // (structural, like q142's no-exchange check) before clearing the
    // snapshot cache so the measured read COLD-RESOLVES through the
    // columnar bodies: per-status aggregate over the full snapshot
    // plus a narrow key-range leg whose file skipping runs off stats
    // that round-tripped through parquet (the builder also requires
    // the pruning really skipped). At 100 TB the checkpoint is the
    // dominating metadata object an object store bills for — parquet
    // bodies are ~10× smaller than JSON at identical resolve cost and
    // column-chunked for ranged reads (BASELINE.md A/B). Oracle
    // replays the same state declaratively.
    Q(
      "q151_loglake_parquet_chk",
      s"""SELECT l.o_orderstatus, l.cnt, l.total, f.band_rows, f.band_total
         |FROM (SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |             ${oSum("o_totalprice")} AS total
         |      FROM orders GROUP BY o_orderstatus) l
         |CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS band_rows,
         |                   ${oSum("o_totalprice")} AS band_total
         |            FROM orders WHERE o_orderkey BETWEEN 100 AND 199) f
         |ORDER BY l.o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q151")
      val ord = orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice").persist()
      // contiguous KEY-RANGE slices (12 equal-width bands over the
      // actual key span — one metadata-sized max() to size them), so
      // each file covers a narrow o_orderkey band and the range leg
      // below can actually skip — %-residue slices would give every
      // file near-global min/max and nothing to prune
      val width = ord.agg(max("o_orderkey")).head().getLong(0) / 12L + 1L
      def slice(i: Int) = ord.filter(
        (col("o_orderkey") / lit(width)).cast("long") === i)
      try {
        LogLake.create(s, dir, slice(0), statsCols = Seq("o_orderkey"))
        LogLake.setTableProperties(dir, Map(
          "loglake.checkpoint.format" -> "parquet",
          "loglake.checkpoint.partSizeFiles" -> "4"))
        (1 to 11).foreach(i => LogLake.append(s, dir, slice(i)))
      } finally ord.unpersist()
      val parts = new java.io.File(dir, "_loglake").listFiles()
        .filter(_.getName.matches("""chk-\d{20}\.p\d+-of-\d+\.parquet"""))
      require(parts.length >= 2,
        s"q151: expected a multi-part parquet checkpoint group, got " +
          new java.io.File(dir, "_loglake").listFiles()
            .map(_.getName).filter(_.startsWith("chk-")).mkString(","))
      LogLake.clearSnapshotCache() // the read below cold-resolves the group
      val (kept, total) = LogLake.pruneFiles(dir, "o_orderkey", 100L, 199L)
      require(total >= 12 && kept.size < total,
        s"q151: stats skipping must survive the parquet round-trip " +
          s"(kept ${kept.size} of $total)")
      val latest = LogLake.snapshot(s, dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
      val band = LogLake.snapshot(s, dir)
        .filter(col("o_orderkey").between(100L, 199L))
        .agg(count(lit(1)).as("band_rows"),
          dsum(col("o_totalprice")).as("band_total"))
      latest.crossJoin(band).orderBy("o_orderstatus")
    },

    // --- q152: LAZY 10⁸-FILE READ PLAN (round 13; Delta's
    // state-reconstruction-as-a-job). `loglake.planning.distributed`
    // routes the format("loglake") read through LazyLogLakeFileIndex:
    // construction reads checkpoint part FOOTERS + the ≤10-commit
    // manifest tail — never the body — and every scan's file skipping
    // runs as a Spark job over the parts, survivors-only to the
    // driver. The builder REQUIRES the lazy index structurally, that
    // the banded filter really skipped files through the job, and
    // that NO snapshot was assembled end to end (the assemble counter
    // is the proof). At 100 TB / 10⁸ files the eager resolved state
    // is gigabytes of driver heap; this plan's driver cost is the
    // survivor list of each query's own filters. Oracle replays the
    // same state declaratively.
    Q(
      "q152_loglake_lazy_plan",
      s"""SELECT l.o_orderstatus, l.cnt, l.total, f.band_rows, f.band_total
         |FROM (SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |             ${oSum("o_totalprice")} AS total
         |      FROM orders GROUP BY o_orderstatus) l
         |CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS band_rows,
         |                   ${oSum("o_totalprice")} AS band_total
         |            FROM orders WHERE o_orderkey BETWEEN 300 AND 499) f
         |ORDER BY l.o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q152")
      val ord = orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice").persist()
      val width = ord.agg(max("o_orderkey")).head().getLong(0) / 12L + 1L
      def slice(i: Int) = ord.filter(
        (col("o_orderkey") / lit(width)).cast("long") === i)
      try {
        LogLake.create(s, dir, slice(0), statsCols = Seq("o_orderkey"))
        LogLake.setTableProperties(dir, Map(
          "loglake.checkpoint.format" -> "parquet",
          "loglake.checkpoint.partSizeFiles" -> "4",
          "loglake.planning.distributed" -> "true"))
        (1 to 11).foreach(i => LogLake.append(s, dir, slice(i)))
      } finally ord.unpersist()
      LogLake.clearSnapshotCache() // nothing cached: the lazy gate is live
      val assembles = LogLake.snapshotAssembles.get()
      val full = s.read.format("loglake").load(dir)
      def idx(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.collectFirst {
          case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
            sc.relation.location
        }.get
      require(idx(full).isInstanceOf[graft.sources.LazyLogLakeFileIndex],
        s"q152: expected the lazy index, got ${idx(full).getClass.getSimpleName}")
      val latest = full.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
      val banded = s.read.format("loglake").load(dir)
        .filter(col("o_orderkey").between(300L, 499L))
      banded.count() // execute once: the job-backed skipping runs now
      val li = idx(banded).asInstanceOf[graft.sources.LazyLogLakeFileIndex]
      require(li.lastScanFiles >= 0 && li.planJobs >= 1,
        "q152: the banded scan must plan through the distributed job")
      require(LogLake.snapshotAssembles.get() == assembles,
        "q152: the lazy plan must never assemble table state")
      val band = banded.agg(count(lit(1)).as("band_rows"),
        dsum(col("o_totalprice")).as("band_total"))
      latest.crossJoin(band).orderBy("o_orderstatus")
    },

    // --- q153: LAZY PLAN OVER THE CANONICAL 100 TB LAYOUT (round 14)
    // — an identity-PARTITIONED table under distributed planning. The
    // read plans through LazyLogLakeFileIndex with a REAL
    // partitionSchema: partition predicates admit against the
    // snapshot's DISTINCT-TUPLE set (one metadata-sized job; exact
    // evaluation on the driver over tuples, never files), the skipping
    // job prunes by tuple membership, and — the star-join payoff —
    // Spark's PartitionPruning rule still plants a DynamicPruningSubquery
    // on the fact scan, so the dim filter's surviving keys prune fact
    // partitions at runtime through the reused broadcast. The builder
    // REQUIRES the lazy index, the planted DPP filter, and ZERO
    // snapshot assembles end to end. At 10⁸ files the driver holds
    // tuples (~10³) and survivors, never table state.
    Q(
      "q153_loglake_lazy_partitioned_dpp",
      s"""WITH dim(o_orderstatus, cls) AS (
         |  VALUES ('F', 'keep'), ('O', 'drop'), ('P', 'keep')
         |)
         |SELECT o.o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o.o_totalprice")} AS total
         |FROM orders o JOIN dim d ON o.o_orderstatus = d.o_orderstatus
         |WHERE d.cls = 'keep'
         |GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val dir = freshDir("q153")
      val ord = orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice").persist()
      val width = ord.agg(max("o_orderkey")).head().getLong(0) / 12L + 1L
      def slice(i: Int) = ord.filter(
        (col("o_orderkey") / lit(width)).cast("long") === i)
      try {
        LogLake.create(s, dir, slice(0), partitionBy = Seq("o_orderstatus"),
          statsCols = Seq("o_orderkey"))
        LogLake.setTableProperties(dir, Map(
          "loglake.checkpoint.format" -> "parquet",
          "loglake.checkpoint.partSizeFiles" -> "4",
          "loglake.planning.distributed" -> "true"))
        (1 to 11).foreach(i => LogLake.append(s, dir, slice(i)))
      } finally ord.unpersist()
      val dimDir = freshDir("q153dim")
      Seq(("F", "keep"), ("O", "drop"), ("P", "keep"))
        .toDF("o_orderstatus", "cls").write.parquet(dimDir)
      LogLake.clearSnapshotCache() // nothing cached: the lazy gate is live
      val assembles = LogLake.snapshotAssembles.get()
      val fact = s.read.format("loglake").load(dir)
      val idx = fact.queryExecution.executedPlan.collectFirst {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
          sc.relation.location
      }.get
      require(idx.isInstanceOf[graft.sources.LazyLogLakeFileIndex],
        s"q153: expected the lazy index, got ${idx.getClass.getSimpleName}")
      require(idx.partitionSchema.fieldNames.sameElements(Array("o_orderstatus")),
        "q153: the lazy index must surface the real partitionSchema")
      val q = fact.join(broadcast(s.read.parquet(dimDir)), Seq("o_orderstatus"))
        .filter(col("cls") === "keep")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
      require(q.queryExecution.optimizedPlan.exists(_.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))),
        s"q153: no dynamic pruning filter planted:\n${q.queryExecution.optimizedPlan}")
      q.count() // execute once: DPP admission + the skipping job run now
      require(LogLake.snapshotAssembles.get() == assembles,
        "q153: the partitioned lazy plan must never assemble table state")
      q
    },

    // --- q154: THE MERGE-ON-READ WINDOW UNDER DISTRIBUTED PLANNING
    // (round 14). A MoR DELETE drops a deletion-vector sidecar onto a
    // 12-commit parquet-checkpoint table with
    // loglake.planning.distributed=true; the read must NOT fall back
    // to eager state assembly: it plans through LogLakeLazyDvRelation
    // — file skipping as a job over the checkpoint parts, survivors
    // carrying their DV names into the masking plan. The builder
    // REQUIRES the lazy DV relation, job-backed skipping on a banded
    // filter, and ZERO snapshot assembles; deleted rows must not
    // resurrect. The oracle replays the surviving state declaratively.
    Q(
      "q154_loglake_lazy_dv",
      s"""SELECT l.o_orderstatus, l.cnt, l.total, f.band_rows, f.band_total
         |FROM (SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |             ${oSum("o_totalprice")} AS total
         |      FROM orders WHERE o_orderkey % 97 <> 0
         |      GROUP BY o_orderstatus) l
         |CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS band_rows,
         |                   ${oSum("o_totalprice")} AS band_total
         |            FROM orders
         |            WHERE o_orderkey BETWEEN 300 AND 499
         |              AND o_orderkey % 97 <> 0) f
         |ORDER BY l.o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q154")
      val ord = orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice").persist()
      val width = ord.agg(max("o_orderkey")).head().getLong(0) / 12L + 1L
      def slice(i: Int) = ord.filter(
        (col("o_orderkey") / lit(width)).cast("long") === i)
      try {
        LogLake.create(s, dir, slice(0), statsCols = Seq("o_orderkey"))
        LogLake.setTableProperties(dir, Map(
          "loglake.checkpoint.format" -> "parquet",
          "loglake.checkpoint.partSizeFiles" -> "4",
          "loglake.planning.distributed" -> "true"))
        (1 to 11).foreach(i => LogLake.append(s, dir, slice(i)))
      } finally ord.unpersist()
      // the MoR window: sidecars only, no data file rewritten
      LogLake.delete(s, dir, col("o_orderkey") % 97 === 0, mor = true)
      LogLake.clearSnapshotCache()
      val assembles = LogLake.snapshotAssembles.get()
      def relOf(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.optimizedPlan.collectFirst {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation
        }.get
      val full = s.read.format("loglake").load(dir)
      require(relOf(full).isInstanceOf[graft.sources.LogLakeLazyDvRelation],
        s"q154: expected the lazy DV relation, got ${relOf(full).getClass.getSimpleName}")
      val latest = full.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
      val banded = s.read.format("loglake").load(dir)
        .filter(col("o_orderkey").between(300L, 499L))
      banded.count() // execute once: the job-backed skipping runs now
      val rel = relOf(banded).asInstanceOf[graft.sources.LogLakeLazyDvRelation]
      require(rel.planJobs >= 1,
        "q154: the banded scan must plan through the distributed job")
      require(LogLake.snapshotAssembles.get() == assembles,
        "q154: the MoR window must never assemble table state")
      val band = banded.agg(count(lit(1)).as("band_rows"),
        dsum(col("o_totalprice")).as("band_total"))
      latest.crossJoin(band).orderBy("o_orderstatus")
    },

    // --- q155: DISTRIBUTED WRITE-PATH DISCOVERY (round 14). MERGE,
    // UPDATE and DELETE against a loglake.planning.distributed
    // parquet-checkpoint table discover their candidate and touched
    // files through the checkpoint-part prune (key-envelope / stats
    // constraints evaluated on executors) — the builder pins the
    // snapshot-assemble counter flat across all three mutations, so a
    // selective upsert against a 10⁸-file table provably never
    // materializes table state on the driver. The oracle replays the
    // same mutations declaratively: keys ≡ 0 (mod 131) upserted to
    // 10× price, keys ≡ 0 (mod 173) deleted, keys in [1000, 1099]
    // get status 'X'.
    Q(
      "q155_loglake_distributed_write",
      s"""WITH state AS (
         |  SELECT o_orderkey,
         |         CASE WHEN o_orderkey BETWEEN 1000 AND 1099 THEN 'X'
         |              ELSE o_orderstatus END AS o_orderstatus,
         |         CASE WHEN o_orderkey % 131 = 0 THEN o_totalprice * 10
         |              ELSE o_totalprice END AS o_totalprice
         |  FROM orders WHERE o_orderkey % 173 <> 0
         |)
         |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total
         |FROM state GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q155")
      val ord = orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice").persist()
      val width = ord.agg(max("o_orderkey")).head().getLong(0) / 12L + 1L
      def slice(i: Int) = ord.filter(
        (col("o_orderkey") / lit(width)).cast("long") === i)
      val upserts = ord.filter(col("o_orderkey") % 131 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 10)
      try {
        LogLake.create(s, dir, slice(0), statsCols = Seq("o_orderkey"))
        LogLake.setTableProperties(dir, Map(
          "loglake.checkpoint.format" -> "parquet",
          "loglake.checkpoint.partSizeFiles" -> "4",
          "loglake.planning.distributed" -> "true"))
        (1 to 11).foreach(i => LogLake.append(s, dir, slice(i)))
        LogLake.clearSnapshotCache()
        val assembles = LogLake.snapshotAssembles.get()
        LogLake.merge(s, dir, upserts, keyCols = Seq("o_orderkey"))
        LogLake.delete(s, dir, col("o_orderkey") % 173 === 0)
        LogLake.update(s, dir, col("o_orderkey").between(1000L, 1099L),
          Map("o_orderstatus" -> lit("X")))
        require(LogLake.snapshotAssembles.get() == assembles,
          "q155: distributed write discovery must never assemble table state")
      } finally ord.unpersist()
      s.read.format("loglake").load(dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    },

    // --- q156: BUCKETED TABLES UNDER THE LAZY PLAN (round 15). The
    // q142 shuffle-free-join contract and the q152 never-assemble
    // contract compose: a hash-bucketed fact with
    // loglake.planning.distributed=true and a parquet checkpoint plans
    // through LazyLogLakeFileIndex (bucket ids ride the file names the
    // skipping job returns; the relation hands the planner the same
    // BucketSpec the eager index does), so a per-customer aggregate
    // and its join back to the fact run with ZERO exchange below the
    // join — while the driver never materializes table state. The
    // builder REQUIRES the lazy index on every fact scan, a
    // sort-merge join with no shuffle under it, a job-backed plan, and
    // a flat snapshot-assemble counter. At 100 TB this is the
    // recurring fact⋈fact/fact⋈dim co-location win surviving the
    // 10⁸-file metadata posture. Oracle = the same self-join
    // declaratively (bucketing is pure layout).
    Q(
      "q156_loglake_lazy_bucketed",
      s"""WITH per_cust AS (
         |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cust_orders
         |  FROM orders GROUP BY o_custkey
         |)
         |SELECT p.cust_orders, CAST(COUNT(*) AS BIGINT) AS n_orders,
         |       ${oSum("o.o_totalprice")} AS total
         |FROM orders o JOIN per_cust p ON o.o_custkey = p.o_custkey
         |GROUP BY p.cust_orders ORDER BY p.cust_orders""".stripMargin
    ) { (s, d) =>
      val s2 = graft.Sessions.derived(s,
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false")
      val dir = freshDir("q156")
      val ord = orders(s2, d)
        .select("o_orderkey", "o_custkey", "o_totalprice").persist()
      val width = ord.agg(max("o_orderkey")).head().getLong(0) / 12L + 1L
      def slice(i: Int) = ord.filter(
        (col("o_orderkey") / lit(width)).cast("long") === i)
      try {
        LogLake.create(s2, dir, slice(0), statsCols = Seq("o_orderkey"),
          bucketBy = Seq("o_custkey"), numBuckets = 8)
        LogLake.setTableProperties(dir, Map(
          "loglake.checkpoint.format" -> "parquet",
          "loglake.checkpoint.partSizeFiles" -> "32",
          "loglake.planning.distributed" -> "true"))
        (1 to 11).foreach(i => LogLake.append(s2, dir, slice(i)))
      } finally ord.unpersist()
      LogLake.clearSnapshotCache() // nothing cached: the lazy gate is live
      val assembles = LogLake.snapshotAssembles.get()
      val fact = s2.read.format("loglake").load(dir)
      val perCust = s2.read.format("loglake").load(dir)
        .groupBy("o_custkey").agg(count(lit(1)).as("cust_orders"))
      val joined = fact.join(perCust, "o_custkey")
      val q = joined.groupBy("cust_orders")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy("cust_orders")
      val locs = q.queryExecution.executedPlan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
          sc.relation.location
      }
      require(locs.nonEmpty &&
        locs.forall(_.isInstanceOf[graft.sources.LazyLogLakeFileIndex]),
        s"q156: every fact scan must take the lazy index, got " +
          locs.map(_.getClass.getSimpleName).mkString(", "))
      val smj = q.queryExecution.executedPlan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }.getOrElse(throw new IllegalStateException(
        s"q156: expected a sort-merge join:\n${q.queryExecution.executedPlan}"))
      require(smj.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }.isEmpty,
        s"q156: the bucketed lazy join must not shuffle either side:\n$smj")
      q.count() // execute once: the listFiles jobs run now
      require(locs.exists(
        _.asInstanceOf[graft.sources.LazyLogLakeFileIndex].planJobs >= 1),
        "q156: the bucketed scan must plan through the distributed job")
      require(LogLake.snapshotAssembles.get() == assembles,
        "q156: the bucketed lazy plan must never assemble table state")
      q
    },

    // --- q159: MERGE SCHEMA EVOLUTION (round 16 — Delta's autoMerge,
    // gated by loglake.merge.schemaEvolution). One MERGE whose source
    // carries a column the table lacks (o_prio) evolves the schema IN
    // THE SAME COMMIT: updated rows get values, carried rows read NULL
    // out of their untouched old files, inserts land with the column.
    // The read back through the evolved snapshot aggregates all three
    // row classes per status — one hash certifies the evolution, the
    // NULL-fill, and the merge semantics together. The oracle computes
    // the same end state declaratively. At 100 TB this is a
    // metadata-weight operation: only matched files rewrite (same as
    // q111); the widened schema costs one manifest, never a backfill.
    Q(
      "q159_loglake_merge_evolve",
      s"""WITH merged AS (
         |  SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'R' ELSE o_orderstatus END AS o_orderstatus,
         |         o_totalprice,
         |         CASE WHEN o_orderkey % 10 = 0 THEN o_orderkey % 3 END AS o_prio
         |  FROM orders
         |  UNION ALL
         |  SELECT 'N', o_totalprice, o_orderkey % 3
         |  FROM orders WHERE o_orderkey % 100 = 0
         |)
         |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       ${oSum("o_totalprice")} AS total,
         |       CAST(SUM(o_prio) AS BIGINT) AS prio_sum,
         |       CAST(COUNT(o_prio) AS BIGINT) AS prio_n
         |FROM merged GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q159")
      val ord = orders(s, d).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      LogLake.create(s, dir, ord, statsCols = Seq("o_orderkey"))
      LogLake.setTableProperties(dir,
        Map("loglake.merge.schemaEvolution" -> "true"))
      val upd = ord.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_orderstatus", lit("R"))
        .withColumn("o_prio", col("o_orderkey") % 3)
      val ins = ord.filter(col("o_orderkey") % 100 === 0)
        .select((-col("o_orderkey")).as("o_orderkey"), col("o_custkey"),
          lit("N").as("o_orderstatus"), col("o_totalprice"),
          (col("o_orderkey") % 3).as("o_prio"))
      LogLake.merge(s, dir, upd.unionByName(ins), keyCols = Seq("o_orderkey"),
        statsCols = Seq("o_orderkey"))
      val out = LogLake.snapshot(s, dir)
      require(out.schema.fieldNames.contains("o_prio") &&
        out.schema("o_prio").nullable,
        "q159: the merge must have evolved the schema additively")
      out.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"),
          sum("o_prio").cast("long").as("prio_sum"),
          count("o_prio").as("prio_n"))
        .orderBy("o_orderstatus")
    },

    // --- q164: CREATE OR REPLACE + column DEFAULTs + time travel
    // (VERDICT r16 #5). A table grows a column with a DEFAULT; an
    // append that OMITS the column gets the write-time fill while the
    // pre-default rows stay NULL (defaults never rewrite history);
    // then `CREATE OR REPLACE TABLE … AS …` atomically swaps schema +
    // contents in ONE commit and the PRE-replace generation stays
    // servable by version. Output = post-replace rows ∪ time-traveled
    // pre-replace rows — the oracle replays both generations from the
    // source parquet, so the hash certifies the fill values, the
    // NULL/default split, the replace query, and the preserved
    // history together. At 100 TB: the replace costs one commit +
    // the new contents' write; the old generation costs nothing until
    // retention reclaims it.
    Q(
      "q164_replace_defaults",
      s"""WITH base AS (
         |  SELECT o_orderkey AS k, o_custkey AS cust FROM orders
         |  WHERE o_orderkey % 10 = 0
         |), late AS (
         |  SELECT o_orderkey AS k, o_custkey AS cust FROM orders
         |  WHERE o_orderkey % 10 = 1
         |), pre AS (
         |  SELECT k, cust, CAST(NULL AS VARCHAR) AS src FROM base
         |  UNION ALL SELECT k, cust, 'late' FROM late
         |), post AS (
         |  SELECT k, cust * 2 AS v FROM pre
         |  WHERE src IS NOT NULL OR k % 20 = 0
         |)
         |SELECT 'post' AS era, k, v, CAST(NULL AS VARCHAR) AS src FROM post
         |UNION ALL
         |SELECT 'pre' AS era, k, cust AS v, src FROM pre
         |ORDER BY era, k""".stripMargin
    ) { (s, d) =>
      val dir = freshDir("q164")
      def slice(m: Int) = orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_custkey").as("cust"))
        .filter(col("k") % 10 === m)
      LogLake.create(s, dir, slice(0))
      LogLake.addColumn(dir, org.apache.spark.sql.types.StructField("src",
        org.apache.spark.sql.types.StringType, nullable = true))
      s.sql(s"ALTER TABLE '$dir' ALTER COLUMN src SET DEFAULT 'late'")
      // the append OMITS src — the write-time fill supplies 'late'
      LogLake.append(s, dir, slice(1))
      val vPre = LogLake.currentVersion(dir)
      LogLake.snapshot(s, dir).createOrReplaceTempView("q164_pre")
      s.sql(s"CREATE OR REPLACE TABLE '$dir' AS " +
        "SELECT k, cust * 2 AS v FROM q164_pre " +
        "WHERE src IS NOT NULL OR k % 20 = 0")
      require(LogLake.currentVersion(dir) == vPre + 1,
        "q164: the replace must be exactly ONE commit — no drop+create")
      val post = LogLake.snapshot(s, dir)
      require(post.schema.fieldNames.toSeq == Seq("k", "v"),
        "q164: the replace must have swapped the schema")
      val pre = LogLake.snapshot(s, dir, asOf = Some(vPre))
      post.select(lit("post").as("era"), col("k"), col("v"),
          lit(null).cast("string").as("src"))
        .unionByName(pre.select(lit("pre").as("era"), col("k"),
          col("cust").as("v"), col("src")))
        .orderBy("era", "k")
    }
  )
}
