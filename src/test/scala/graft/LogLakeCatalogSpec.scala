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

  test("unsupported MERGE shapes and writes to time-travelled snapshots fail loudly") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO loglake.$db.t VALUES (1, 'a')")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO loglake.$db.t AS t
           |USING (SELECT 1L AS k, 'x' AS v) AS s
           |ON t.k = s.k
           |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e.getMessage.contains("canonical upsert"))
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
}
