package graft

import java.util.UUID

import org.apache.spark.sql.functions._
import graft.sources.LogLake

/** The SQL front door ([[graft.sources.LogLakeCatalog]] +
  * [[graft.sources.LogLakeSqlRule]]): every ACID primitive reachable
  * through `spark.sql` alone, and SQL reads planning onto the SAME
  * native pushdown scan as the path API. */
class LogLakeCatalogSpec extends SparkTestBase {

  import spark.implicits._

  private def freshDb(): String = {
    val db = "db" + UUID.randomUUID().toString.replace("-", "").take(10)
    spark.sql(s"CREATE NAMESPACE loglake.$db")
    db
  }

  test("CREATE / INSERT / SELECT / VERSION AS OF / TIMESTAMP AS OF round-trip in pure SQL") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO loglake.$db.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO loglake.$db.t VALUES (3, 'c')")

    assert(spark.sql(s"SELECT v FROM loglake.$db.t ORDER BY k")
      .as[String].collect().toSeq == Seq("a", "b", "c"))
    // v1 = empty create, v2 = first insert, v3 = second
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.t VERSION AS OF 1")
      .head().getLong(0) == 0L)
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.t VERSION AS OF 2")
      .head().getLong(0) == 2L)
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.t TIMESTAMP AS OF current_timestamp()")
      .head().getLong(0) == 3L)

    // catalog metadata surfaces
    assert(spark.sql(s"SHOW TABLES IN loglake.$db").count() == 1L)
    assert(spark.sql(s"DESCRIBE TABLE loglake.$db.t")
      .filter(col("col_name") === "k").count() == 1L)
  }

  test("SQL reads plan onto the native pushdown scan (FileScan + PushedFilters), not an opaque RDD") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.p (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO loglake.$db.p SELECT id, concat('r', id) FROM range(1000)")
    val plan = spark.sql(s"SELECT v FROM loglake.$db.p WHERE k = 7")
      .queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet") || plan.contains("Scan parquet"),
      s"SQL read must hit the native parquet path, got:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,7)]"),
      s"filter must push to the scan, got:\n$plan")
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT in pure SQL") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.c (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO loglake.$db.c VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"ALTER TABLE loglake.$db.c ADD CONSTRAINT k_pos CHECK (k > 0)")
    val dir = spark.sql(s"DESCRIBE DETAIL loglake.$db.c")
      .select("location").as[String].head()
    assert(LogLake.checkConstraints(dir) == Map("k_pos" -> "k > 0"))
    // enforced on later SQL inserts, nothing committed on violation
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO loglake.$db.c VALUES (-5, 'x')")
    }
    assert(e.getMessage.contains("k_pos"))
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.c").as[Long].head() == 2L)
    // add-time validation scans existing data
    val bad = intercept[Exception] {
      spark.sql(s"ALTER TABLE loglake.$db.c ADD CONSTRAINT k_big CHECK (k > 10)")
    }
    assert(bad.getMessage.contains("existing data violates"))
    // drop lifts enforcement
    spark.sql(s"ALTER TABLE loglake.$db.c DROP CONSTRAINT k_pos")
    spark.sql(s"INSERT INTO loglake.$db.c VALUES (-5, 'x')")
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.c").as[Long].head() == 3L)
  }

  test("CREATE TABLE with GENERATED ALWAYS AS (expr) and AS IDENTITY clauses in pure SQL") {
    val db = freshDb()
    spark.sql(
      s"""CREATE TABLE loglake.$db.g (
         |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2),
         |  a BIGINT NOT NULL,
         |  b BIGINT GENERATED ALWAYS AS (a * 2 + 1),
         |  part STRING
         |) USING loglake PARTITIONED BY (part)""".stripMargin)
    val dir = spark.sql(s"DESCRIBE DETAIL loglake.$db.g")
      .select("location").as[String].head()
    assert(LogLake.identityColumns(dir).keySet == Set("id"))
    assert(LogLake.generatedColumns(dir) == Map("b" -> "a * 2 + 1"))
    assert(LogLake.partitionColumns(dir) == Seq("part"))
    // INSERT with a column list: id omitted → assigned from the declared
    // range (Spark pads the omitted column with NULLs; all-NULL is the
    // unambiguous omitted shape); b supplied and validated
    spark.sql(s"INSERT INTO loglake.$db.g (a, b, part) VALUES " +
      "(1, 3, 'x'), (2, 5, 'y'), (3, 7, 'x')")
    val got = spark.sql(s"SELECT id, a, b, part FROM loglake.$db.g ORDER BY a")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 2L, 3L))
    assert(got.map(_._1).toSet.subsetOf(Set(10L, 12L, 14L)), s"ids: $got")
    assert(got.map(_._3) == Seq(3L, 5L, 7L))
    // a supplied identity VALUE still rejects (ALWAYS semantics)
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO loglake.$db.g VALUES (99, 4, 9, 'x')")
    }
    assert(e.getMessage.contains("IDENTITY"))
    // a wrong generated value rejects on the staged pass
    val g = intercept[Exception] {
      spark.sql(s"INSERT INTO loglake.$db.g (a, b, part) VALUES (4, 1000, 'x')")
    }
    assert(g.getMessage.contains("__generated_b"))
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.g").as[Long].head() == 3L)
  }

  test("INSERT INTO ... REPLACE WHERE replaces exactly the predicate's region in SQL") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.r (k BIGINT, part STRING) " +
      "PARTITIONED BY (part)")
    spark.sql(s"INSERT INTO loglake.$db.r VALUES (1, 'x'), (2, 'y'), (3, 'x')")
    spark.sql(s"INSERT INTO loglake.$db.r REPLACE WHERE part = 'x' " +
      "SELECT * FROM VALUES (10, 'x'), (11, 'x') AS t(k, part)")
    assert(spark.sql(s"SELECT k FROM loglake.$db.r ORDER BY k")
      .as[Long].collect().toSeq == Seq(2L, 10L, 11L))
    // rows outside the region reject loudly, nothing committed
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO loglake.$db.r REPLACE WHERE part = 'x' " +
        "SELECT * FROM VALUES (20, 'z') AS t(k, part)")
    }
    assert(e.getMessage.contains("OUTSIDE the replaced region"))
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.r").as[Long].head() == 3L)
    // a parenthesized predicate still splits at the top-level SELECT
    // (subqueries inside the predicate are out of scope, as in Delta's
    // replaceWhere — the expression parser has no subquery form)
    spark.sql(s"INSERT INTO loglake.$db.r REPLACE WHERE " +
      s"(part = 'y' OR part = 'zz') SELECT * FROM VALUES (30, 'y') AS t(k, part)")
    assert(spark.sql(s"SELECT k FROM loglake.$db.r ORDER BY k")
      .as[Long].collect().toSeq == Seq(10L, 11L, 30L))
  }

  test("SHOW PARTITIONS lists the manifest's live partition inventory") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.sp (k BIGINT, part STRING) " +
      "PARTITIONED BY (part)")
    spark.sql(s"INSERT INTO loglake.$db.sp VALUES (1, 'x'), (2, 'y'), (3, 'x')")
    val rows = spark.sql(s"SHOW PARTITIONS loglake.$db.sp")
      .select("partition", "num_rows").as[(String, Long)].collect().toSeq.sorted
    assert(rows == Seq("part=x" -> 2L, "part=y" -> 1L))
    // a partition DELETE drops its row from the inventory (metadata-only)
    spark.sql(s"DELETE FROM loglake.$db.sp WHERE part = 'x'")
    assert(spark.sql(s"SHOW PARTITIONS loglake.$db.sp")
      .select("partition").as[String].collect().toSeq == Seq("part=y"))
  }

  test("the pushdown-less fallback scan warns exactly once per session") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.w (k BIGINT)")
    spark.sql(s"INSERT INTO loglake.$db.w VALUES (1), (2)")
    val dir = spark.sql(s"DESCRIBE DETAIL loglake.$db.w")
      .select("location").as[String].head()
    // this session HAS GraftExtensions, so the analyzer rule serves SQL
    // reads natively — drive the fallback V1Scan directly, as a session
    // without the extensions would
    val table = graft.sources.LogLakeV2Table(dir, None, s"loglake.$db.w")
    val before = graft.sources.LogLakeV2Table.fallbackWarnings.get()
    def scanOnce(): Unit = {
      val scan = table.newScanBuilder(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Collections.emptyMap())).build()
      scan.asInstanceOf[org.apache.spark.sql.connector.read.V1Scan]
        .toV1TableScan[org.apache.spark.sql.sources.BaseRelation
          with org.apache.spark.sql.sources.TableScan](spark.sqlContext)
      ()
    }
    scanOnce(); scanOnce() // second scan in the same session stays quiet
    assert(graft.sources.LogLakeV2Table.fallbackWarnings.get() == before + 1,
      "expected exactly one fallback warning per session")
  }

  test("a string literal containing 'SHALLOW CLONE' is not claimed by the graft parser") {
    // the delegating parser must claim only identifier-shaped targets —
    // a stock CTAS whose literal mentions CLONE parses as plain SQL
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.lit AS " +
      "SELECT 'a SHALLOW CLONE b' AS v, 1 AS k")
    assert(spark.sql(s"SELECT v FROM loglake.$db.lit")
      .as[String].head() == "a SHALLOW CLONE b")
  }

  test("MERGE INTO / UPDATE / DELETE lower onto the commit log; CTAS and INSERT OVERWRITE work") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO loglake.$db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")

    spark.sql(
      s"""MERGE INTO loglake.$db.t AS t
         |USING (SELECT 2L AS k, 'B' AS v UNION ALL SELECT 9L, 'i') AS s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(s"SELECT v FROM loglake.$db.t ORDER BY k")
      .as[String].collect().toSeq == Seq("a", "B", "c", "i"))

    spark.sql(s"UPDATE loglake.$db.t SET v = upper(v) WHERE k <= 2")
    spark.sql(s"DELETE FROM loglake.$db.t WHERE k = 3")
    assert(spark.sql(s"SELECT v FROM loglake.$db.t ORDER BY k")
      .as[String].collect().toSeq == Seq("A", "B", "i"))

    // the SQL ops really are commits: full history, time travel intact
    val ops = LogLake.history(s"/tmp/graft_loglake_warehouse/$db/t").map(_.op)
    assert(ops == Seq("create", "append", "merge", "update", "delete"))

    spark.sql(s"CREATE TABLE loglake.$db.t2 AS SELECT k, v FROM loglake.$db.t WHERE k <> 2")
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.t2").head().getLong(0) == 2L)
    spark.sql(s"INSERT OVERWRITE loglake.$db.t2 SELECT k, v FROM loglake.$db.t")
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.t2").head().getLong(0) == 3L)

    spark.sql(s"DROP TABLE loglake.$db.t2")
    assert(spark.sql(s"SHOW TABLES IN loglake.$db").count() == 1L)
  }

  test("the full MERGE clause matrix lowers through SQL") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.t (k BIGINT, v STRING, n BIGINT)")
    spark.sql(s"INSERT INTO loglake.$db.t VALUES " +
      "(1, 'a', 10), (2, 'b', 20), (3, 'c', 30), (4, 'd', 40)")
    spark.sql(
      s"""MERGE INTO loglake.$db.t AS t
         |USING (SELECT 1L AS k, 'A' AS v, 11L AS n
         |       UNION ALL SELECT 2L, 'B', 22L
         |       UNION ALL SELECT 9L, 'z', 90L
         |       UNION ALL SELECT 8L, 'y', 1L) AS s
         |ON t.k = s.k
         |WHEN MATCHED AND t.n >= 20 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = upper(s.v), n = t.n + s.n
         |WHEN NOT MATCHED AND s.n >= 10 THEN INSERT (k, v, n) VALUES (s.k, s.v, s.n * 2)
         |WHEN NOT MATCHED BY SOURCE AND t.n >= 40 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = concat(v, '!')""".stripMargin)
    // 1 updated (A, 21); 2 deleted (n>=20); 3 NMBS-updated (c!); 4
    // NMBS-deleted; 9 inserted doubled; 8 fails the insert condition
    assert(spark.sql(s"SELECT k, v, n FROM loglake.$db.t ORDER BY k")
      .as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "A", 21L), (3L, "c!", 30L), (9L, "z", 180L)))
  }

  test("non-equi MERGE ON and writes to time-travelled snapshots fail loudly") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO loglake.$db.t VALUES (1, 'a')")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO loglake.$db.t AS t
           |USING (SELECT 1L AS k, 'x' AS v) AS s
           |ON t.k < s.k
           |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e.getMessage.contains("equi-key"))
    val e2 = intercept[Exception] {
      spark.sql(s"DELETE FROM loglake.$db.t VERSION AS OF 1 WHERE k = 1")
    }
    // either our guard or Spark's own time-travel-DML rejection is fine
    assert(e2 != null)
  }

  test("TBLPROPERTIES persist through CREATE / ALTER SET / UNSET and gate CDF merges") {
    val db = freshDb()
    spark.sql(s"""CREATE TABLE loglake.$db.t (k BIGINT, v STRING)
                 | TBLPROPERTIES ('loglake.enableChangeDataFeed' = 'true')""".stripMargin)
    val dir = spark.sql(s"DESCRIBE TABLE EXTENDED loglake.$db.t")
      .filter(col("col_name") === "Location")
      .select("data_type").as[String].head()
      .stripPrefix("file:")
    assert(LogLake.tableProperties(dir)
      .get("loglake.enableChangeDataFeed").contains("true"))
    // SHOW TBLPROPERTIES reads the store back through the catalog
    val shown = spark.sql(s"SHOW TBLPROPERTIES loglake.$db.t")
      .as[(String, String)].collect().toMap
    assert(shown.get("loglake.enableChangeDataFeed").contains("true"))
    // the property actually gates the write path: a SQL MERGE records CDC
    spark.sql(s"INSERT INTO loglake.$db.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(
      s"""MERGE INTO loglake.$db.t AS t
         |USING (SELECT 2L AS k, 'B' AS v) AS s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(LogLake.history(dir).last.cdc.nonEmpty)
    spark.sql(s"ALTER TABLE loglake.$db.t SET TBLPROPERTIES ('x' = '1')")
    assert(LogLake.tableProperties(dir).get("x").contains("1"))
    spark.sql(s"ALTER TABLE loglake.$db.t UNSET TBLPROPERTIES ('x')")
    assert(!LogLake.tableProperties(dir).contains("x"))
  }

  test("DESCRIBE HISTORY / DETAIL work on catalog identifiers and quoted paths") {
    val db = freshDb()
    spark.sql(s"""CREATE TABLE loglake.$db.h (k BIGINT, v STRING)
                 | PARTITIONED BY (v) TBLPROPERTIES ('who' = 'me')""".stripMargin)
    spark.sql(s"INSERT INTO loglake.$db.h VALUES (1, 'a'), (2, 'b'), (3, 'a')")
    spark.sql(s"DELETE FROM loglake.$db.h WHERE v = 'b'")

    val hist = spark.sql(s"DESCRIBE HISTORY loglake.$db.h")
      .select("version", "operation", "numAddedRows", "numRemovedRows")
      .as[(Long, String, Long, Long)].collect().toSeq
    // newest first; v1 = CREATE TABLE (0 rows), v2 = insert, v3 = delete
    assert(hist == Seq(
      (3L, "delete", 0L, 1L),
      (2L, "append", 3L, 0L),
      (1L, "create", 0L, 0L)))
    // the partition delete moved no data: zero files added
    assert(spark.sql(s"DESC HISTORY loglake.$db.h")
      .filter(col("operation") === "delete")
      .select("numAddedFiles").as[Long].head() == 0L)

    // rebase auditability: VALIDATING (Serializable2PC) ops carry
    // rebaseDistance (version − readVersion − 1; how many winners the
    // logical conflict rules validated this commit over); blind ops
    // (create/append) were never validated against anything, so their
    // rows are NULL — the count would overstate the audit signal
    val audit = spark.sql(s"DESCRIBE HISTORY loglake.$db.h")
      .select("version", "operation", "readVersion", "rebaseDistance")
      .as[(Long, String, Long, Option[Long])].collect().toSeq
    assert(audit.forall { case (v, op, rv, d) =>
      if (op == "delete") d.contains(math.max(0L, v - rv - 1L))
      else d.isEmpty })
    assert(audit.collect { case (_, "delete", _, d) => d } == Seq(Some(0L)),
      "an uncontended serial delete must show zero rebase distance")
    assert(spark.sql(s"DESCRIBE HISTORY loglake.$db.h")
      .filter(col("version") === 3L)
      .select("tableFeatures").as[Seq[String]].head()
      .contains("partitionColumns"))

    val det = spark.sql(s"DESCRIBE DETAIL loglake.$db.h").collect().head
    assert(det.getAs[String]("format") == "loglake")
    assert(det.getAs[Long]("version") == 3L)
    assert(det.getAs[Long]("numRows") == 2L)
    assert(det.getSeq[String](det.fieldIndex("partitionColumns")).toSeq == Seq("v"))
    assert(det.getAs[Map[String, String]]("properties").get("who").contains("me"))

    // quoted-path form resolves the same table
    val loc = det.getAs[String]("location")
    assert(spark.sql(s"DESCRIBE HISTORY '$loc'").count() == 3L)
    // the delegating parser leaves stock DESCRIBE forms untouched
    assert(spark.sql(s"DESCRIBE TABLE loglake.$db.h").count() > 0L)
    val e = intercept[Exception] {
      spark.sql("DESCRIBE HISTORY not_a_catalog.tbl")
    }
    assert(e.getMessage.contains("loglake"))
  }

  test("OPTIMIZE / VACUUM / RESTORE run as SQL on the commit log") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.m (k BIGINT, v STRING)")
    // several small commits → several small files
    (1 to 4).foreach(i =>
      spark.sql(s"INSERT INTO loglake.$db.m VALUES ($i, 'r$i')"))
    val opt = spark.sql(s"OPTIMIZE loglake.$db.m ZORDER BY (k)").collect().head
    assert(opt.getAs[Long]("numFilesAfter") < opt.getAs[Long]("numFilesBefore"))
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.m")
      .as[Long].head() == 4L)

    // RESTORE rolls back to v2 (first insert) as a NEW commit — done
    // BEFORE vacuum, while the old generation is still materialized
    val res = spark.sql(
      s"RESTORE TABLE loglake.$db.m TO VERSION AS OF 2").collect().head
    assert(res.getAs[Long]("restoredVersion") == 2L)
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.m")
      .as[Long].head() == 1L)
    assert(spark.sql(s"DESCRIBE HISTORY loglake.$db.m")
      .select("operation").as[String].head() == "restore")

    // the restore orphaned the optimize generation + later inserts:
    // DRY RUN names them, real VACUUM reclaims the same set, the
    // active snapshot is unharmed
    val dry = spark.sql(s"VACUUM loglake.$db.m RETAIN 0.0 HOURS DRY RUN")
      .as[String].collect()
    assert(dry.nonEmpty)
    val swept = spark.sql(s"VACUUM loglake.$db.m RETAIN 0.0 HOURS")
      .as[String].collect()
    assert(swept.sorted.sameElements(dry.sorted))
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.m")
      .as[Long].head() == 1L)

    // and restoring INTO the reclaimed generation fails loudly — the
    // Delta VACUUM-vs-RESTORE contract
    val e = intercept[java.io.IOException] {
      spark.sql(s"RESTORE TABLE loglake.$db.m TO VERSION AS OF 5")
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("CREATE TABLE ... SHALLOW|DEEP CLONE in SQL") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.src (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO loglake.$db.src VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"CREATE TABLE loglake.$db.sh SHALLOW CLONE loglake.$db.src")
    spark.sql(s"CREATE TABLE loglake.$db.dp DEEP CLONE loglake.$db.src")
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.sh").as[Long].head() == 2L)
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.dp").as[Long].head() == 2L)
    // clones diverge independently
    spark.sql(s"INSERT INTO loglake.$db.dp VALUES (3, 'c')")
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.src").as[Long].head() == 2L)
    // plain CREATE TABLE is untouched by the clone grammar
    spark.sql(s"CREATE TABLE loglake.$db.plain (k BIGINT)")
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.plain").as[Long].head() == 0L)
  }

  test("OPTIMIZE WHERE scopes to a partition region; RESTORE TO TIMESTAMP resolves the commit clock") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.w (k BIGINT, part STRING) PARTITIONED BY (part)")
    // two commits per partition → two files per partition
    spark.sql(s"INSERT INTO loglake.$db.w VALUES (1, 'x'), (2, 'y')")
    spark.sql(s"INSERT INTO loglake.$db.w VALUES (3, 'x'), (4, 'y')")
    val dir = spark.sql(s"DESCRIBE DETAIL loglake.$db.w")
      .select("location").as[String].head()
    val before = LogLake.activeState(dir)._1
    assert(before.count(_.partitionValues("part") == "x") == 2)
    val yFiles = before.filter(_.partitionValues("part") == "y").map(_.path).toSet

    spark.sql(s"OPTIMIZE loglake.$db.w WHERE part = 'x'")
    val after = LogLake.activeState(dir)._1
    // x compacted to one file; y untouched (same paths)
    assert(after.count(_.partitionValues("part") == "x") == 1)
    assert(after.filter(_.partitionValues("part") == "y").map(_.path).toSet == yFiles)
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.w").as[Long].head() == 4L)
    // non-partition predicates are rejected loudly
    val e = intercept[Exception] {
      spark.sql(s"OPTIMIZE loglake.$db.w WHERE k = 1")
    }
    assert(e.getMessage.contains("partition columns only"))

    // RESTORE TO TIMESTAMP: v2's commit time through the in-commit clock
    val t2 = LogLake.commitTimestamp(dir, 2L).getTime
    val res = spark.sql(
      s"RESTORE TABLE loglake.$db.w TO TIMESTAMP AS OF '$t2'").collect().head
    assert(res.getAs[Long]("restoredVersion") == 2L)
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.w").as[Long].head() == 2L)
  }

  test("pure-SQL WAP: branch_<name> ident drives INSERT/MERGE/DELETE/SELECT on the branch head") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.w (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO loglake.$db.w VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql(s"ALTER TABLE loglake.$db.w CREATE BRANCH staging")
    // WRITE: plain INSERT INTO the branch ident
    spark.sql(s"INSERT INTO loglake.$db.w.branch_staging VALUES (4, 'd'), (5, 'e')")
    // MERGE INTO the branch ident (clause lowering, same rule path)
    spark.sql(
      s"""MERGE INTO loglake.$db.w.branch_staging t
         |USING (SELECT CAST(5 AS BIGINT) AS k, 'E' AS v
         |       UNION ALL SELECT CAST(6 AS BIGINT), 'f') s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // DELETE FROM the branch ident
    spark.sql(s"DELETE FROM loglake.$db.w.branch_staging WHERE k = 1")
    // AUDIT in SQL: branch sees staged state, main is untouched
    assert(spark.sql(
      s"SELECT v FROM loglake.$db.w.branch_staging ORDER BY k")
      .as[String].collect().toSeq == Seq("b", "c", "d", "E", "f"))
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.w").as[Long].head() == 3L,
      "main must not see staged rows")
    // branch time travel: v1 = the clone snapshot
    assert(spark.sql(
      s"SELECT count(*) FROM loglake.$db.w.branch_staging VERSION AS OF 1")
      .as[Long].head() == 3L)
    // PUBLISH closes the cycle; the branch ident stops resolving
    spark.sql(s"ALTER TABLE loglake.$db.w PUBLISH BRANCH staging")
    assert(spark.sql(s"SELECT v FROM loglake.$db.w ORDER BY k")
      .as[String].collect().toSeq == Seq("b", "c", "d", "E", "f"))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM loglake.$db.w.branch_staging").collect()
    }
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.toLowerCase.contains("not found"), e.getMessage)
  }

  test("CREATE TABLE ... NOT NULL is enforced on INSERT") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.n (k BIGINT NOT NULL, v STRING)")
    spark.sql(s"INSERT INTO loglake.$db.n VALUES (1, 'a')")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO loglake.$db.n VALUES (CAST(NULL AS BIGINT), 'x')")
    }
    // our staged-write invariant or Spark's own output resolver — either
    // rejection is fine, but the row must not land
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.n").as[Long].head() == 1L)
  }

  test("CREATE OR REPLACE TABLE ... AS is one atomic commit with preserved time travel") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.r (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO loglake.$db.r VALUES (1, 'a'), (2, 'b')")
    val vPre = spark.sql(s"DESCRIBE HISTORY loglake.$db.r")
      .agg(org.apache.spark.sql.functions.max("version")).as[Long].head()
    spark.sql(s"CREATE OR REPLACE TABLE loglake.$db.r AS " +
      s"SELECT k * 10 AS kk FROM loglake.$db.r")
    // exactly one commit — drop+create would reset the log instead
    val hist = spark.sql(s"DESCRIBE HISTORY loglake.$db.r")
    assert(hist.agg(org.apache.spark.sql.functions.max("version"))
      .as[Long].head() == vPre + 1)
    assert(spark.sql(s"SELECT kk FROM loglake.$db.r ORDER BY kk")
      .as[Long].collect().toSeq == Seq(10L, 20L))
    // the pre-replace generation still serves, old schema and all
    assert(spark.sql(
      s"SELECT v FROM loglake.$db.r VERSION AS OF $vPre ORDER BY k")
      .as[String].collect().toSeq == Seq("a", "b"))
    // and a replace of a table that does not exist yet is a CREATE
    spark.sql(s"CREATE OR REPLACE TABLE loglake.$db.fresh AS SELECT 7 AS x")
    assert(spark.sql(s"SELECT x FROM loglake.$db.fresh").as[Int].head() == 7)
  }

  test("ALTER COLUMN SET DEFAULT fills omitted columns on append; DROP DEFAULT stops it") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.dft (k BIGINT, src STRING)")
    spark.sql(s"INSERT INTO loglake.$db.dft VALUES (1, 'explicit')")
    spark.sql(s"ALTER TABLE loglake.$db.dft ALTER COLUMN src SET DEFAULT 'filled'")
    // the Scala append path omitting the column takes the fill
    val dir = spark.sql(s"DESCRIBE DETAIL loglake.$db.dft")
      .select("location").as[String].head()
    LogLake.append(spark, dir, Seq(2L).toDF("k"))
    assert(spark.sql(s"SELECT src FROM loglake.$db.dft WHERE k = 2")
      .as[String].head() == "filled")
    // a frame that CARRIES the column is untouched
    LogLake.append(spark, dir, Seq((3L, "mine")).toDF("k", "src"))
    assert(spark.sql(s"SELECT src FROM loglake.$db.dft WHERE k = 3")
      .as[String].head() == "mine")
    spark.sql(s"ALTER TABLE loglake.$db.dft ALTER COLUMN src DROP DEFAULT")
    val miss = intercept[IllegalArgumentException] {
      LogLake.append(spark, dir, Seq(4L).toDF("k"))
    }
    assert(miss.getMessage.contains("missing table columns"),
      "after DROP DEFAULT an omitted column must refuse loudly again")
    // a default must be constant — column references refuse
    val e = intercept[IllegalArgumentException] {
      LogLake.setColumnDefault(spark, dir, "src", "concat('x', src)")
    }
    assert(e.getMessage.contains("constant"))
  }
}
