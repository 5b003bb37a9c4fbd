package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.LogLake

/** `df.writeStream.toTable("loglake.ns.t")` — the DSv2 STREAMING_WRITE
  * path: executors spool epochs to parquet, the driver's epoch commit
  * adopts them through the shared stats/constraint pass, exactly-once
  * via the stream txnId. */
class StreamToTableSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDb(): String = {
    val db = "db" + java.util.UUID.randomUUID().toString.replace("-", "").take(10)
    spark.sql(s"CREATE NAMESPACE loglake.$db")
    db
  }

  private def tableDir(db: String, t: String): String =
    spark.sql(s"DESCRIBE DETAIL loglake.$db.$t")
      .select("location").as[String].head()

  private def chk(): String =
    java.nio.file.Files.createTempDirectory("totable-chk").toString

  test("toTable lands epochs exactly-once with stats and no second data write") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.s (k BIGINT, v STRING)")
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(1L -> "a", 2L -> "b")
    val cp = chk()
    def run(): Unit = {
      val q = mem.toDF().toDF("k", "v").writeStream
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .toTable(s"loglake.$db.s")
      q.awaitTermination(120000)
    }
    run()
    assert(spark.sql(s"SELECT k, v FROM loglake.$db.s ORDER BY k")
      .as[(Long, String)].collect().toSeq == Seq(1L -> "a", 2L -> "b"))
    // restart on the same checkpoint: nothing new → no duplicate commit
    run()
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.s").as[Long].head() == 2L)
    mem.addData(3L -> "c")
    run()
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.s").as[Long].head() == 3L)

    val dir = tableDir(db, "s")
    // every commit is a plain append; stats continuity not required for
    // toTable (no prior stats on this table), but the files must have
    // row counts and live in data/
    val m = LogLake.history(dir).filter(_.op == "append")
    assert(m.nonEmpty)
    assert(m.flatMap(_.adds).forall(a => a.rows > 0 && a.path.startsWith("data/")))
    // no spool leftovers
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sessionState.newHadoopConf())
    val tmp = new Path(dir, s"${LogLake.LogDir}/_tmp")
    val leftovers = f.listStatus(tmp).filter(_.getPath.getName.startsWith("stream-"))
    assert(leftovers.isEmpty, leftovers.map(_.getPath.getName).mkString(","))
  }

  test("toTable into a table with an identity column fails loudly before spooling") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.idt (k BIGINT, v STRING)")
    LogLake.setIdentityColumn(tableDir(db, "idt"), "k")
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(1L -> "a")
    val e = intercept[Exception] {
      mem.toDF().toDF("k", "v").writeStream
        .option("checkpointLocation", chk())
        .trigger(Trigger.AvailableNow())
        .toTable(s"loglake.$db.idt")
        .awaitTermination(120000)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("IDENTITY")),
      s"expected the identity rejection, got: ${msgs(e).mkString(" | ")}")
    // nothing committed, nothing spooled
    assert(LogLake.currentVersion(tableDir(db, "idt")) == 1L)
  }

  test("toTable into a partitioned table re-clusters each epoch") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.p (k BIGINT, part STRING) PARTITIONED BY (part)")
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(1L -> "x", 2L -> "y", 3L -> "x")
    val q = mem.toDF().toDF("k", "part").writeStream
      .option("checkpointLocation", chk())
      .trigger(Trigger.AvailableNow())
      .toTable(s"loglake.$db.p")
    q.awaitTermination(120000)
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.p").as[Long].head() == 3L)
    val dir = tableDir(db, "p")
    val adds = LogLake.history(dir).filter(_.op == "append").flatMap(_.adds)
    // one file per live partition for the epoch, each with its tuple
    assert(adds.map(_.partitionValues("part")).sorted == Seq("x", "y"))
  }

  test("toTable enforces CHECK constraints per epoch") {
    val db = freshDb()
    spark.sql(s"CREATE TABLE loglake.$db.c (k BIGINT, v STRING)")
    LogLake.addCheckConstraint(spark, tableDir(db, "c"), "pos", "k > 0")
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(-5L -> "bad")
    val q = mem.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", chk())
      .trigger(Trigger.AvailableNow())
      .toTable(s"loglake.$db.c")
    val e = intercept[Exception] { q.awaitTermination(120000) }
    assert(e.getMessage != null)
    assert(spark.sql(s"SELECT count(*) FROM loglake.$db.c").as[Long].head() == 0L)
  }
}
