package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.LogLake

/** TYPE WIDENING (Delta's typeWidening feature): `ALTER COLUMN … TYPE`
  * moves a column to a strictly wider type as a metadata-only commit —
  * zero data rewritten at any table size; old files keep their narrow
  * parquet type and the vectorized reader promotes at scan time. The
  * refusal matrix (partition / bucket-hash / identity / constraint-
  * referenced columns, and anything not lossless) is the correctness
  * surface: a widened bucket column would silently re-home rows
  * (murmur3 is width-sensitive), so it must never be allowed. */
class TypeWideningSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"llwiden-$name").toString + "/t"

  private def narrow(n: Int): DataFrame =
    (1 to n).map(i => (i, i.toFloat / 2, s"v$i")).toDF("k", "x", "v")
      .select(col("k").cast("int"), col("x").cast("float"), col("v"))

  test("int->long and float->double: metadata-only, old files promote, wide appends land") {
    val dir = tmp("basic")
    LogLake.create(spark, dir, narrow(100), statsCols = Seq("k"))
    val before = LogLake.currentVersion(dir)
    LogLake.widenColumn(spark, dir, "k", LongType)
    LogLake.widenColumn(spark, dir, "x", DoubleType)
    // two schema commits, zero data files touched
    assert(LogLake.currentVersion(dir) == before + 2)
    assert(LogLake.history(dir).last.features.contains("typeWidening"))
    val widened = spark.read.format("loglake").load(dir)
    assert(widened.schema("k").dataType == LongType)
    assert(widened.schema("x").dataType == DoubleType)
    // beyond-int-range rows now fit
    LogLake.append(spark, dir,
      Seq((10_000_000_000L, 1.5d, "big")).toDF("k", "x", "v"))
    val out = spark.read.format("loglake").load(dir)
    assert(out.count() == 101)
    assert(out.agg(max("k")).head().getLong(0) == 10_000_000_000L)
    assert(out.agg(sum("x")).head().getDouble(0) == (1 to 100).map(_ / 2.0).sum + 1.5)
    // time travel BEFORE the widen still serves the narrow schema
    assert(LogLake.snapshot(spark, dir, asOf = Some(before))
      .schema("k").dataType == IntegerType)
  }

  test("stats skipping still prunes old narrow files after the widen") {
    val dir = tmp("prune")
    LogLake.create(spark, dir, narrow(50).filter(col("k") <= 25), statsCols = Seq("k"))
    LogLake.append(spark, dir, narrow(50).filter(col("k") > 25))
    LogLake.widenColumn(spark, dir, "k", LongType)
    val q = spark.read.format("loglake").load(dir).filter(col("k") === 30L)
    assert(q.count() == 1)
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.metrics("numFiles").value < 4,
      s"old-tag stats must still prune narrow files, scanned " +
        s"${scan.metrics("numFiles").value}")
  }

  test("integral->decimal and decimal growth widen; narrowing and lossy moves refuse") {
    val dir = tmp("dec")
    val df = (1 to 10).map(i => (i, BigDecimal(i) / 4))
      .toDF("k", "d").select(col("k"), col("d").cast(DecimalType(5, 2)).as("d"))
    LogLake.create(spark, dir, df)
    LogLake.widenColumn(spark, dir, "k", DecimalType(12, 2))
    LogLake.widenColumn(spark, dir, "d", DecimalType(12, 4))
    val out = spark.read.format("loglake").load(dir)
    assert(out.schema("k").dataType == DecimalType(12, 2))
    assert(out.agg(sum("d")).head().getDecimal(0) ==
      new java.math.BigDecimal("13.7500"))
    for ((c, t) <- Seq(("k", IntegerType), ("d", DecimalType(6, 3)),
        ("k", StringType))) {
      val e = intercept[IllegalArgumentException] {
        LogLake.widenColumn(spark, dir, c, t)
      }
      assert(e.getMessage.contains("not a lossless widening"))
    }
    // same-type ALTER is an idempotent no-op (re-run migrations), not
    // an error and not a new commit
    val v = LogLake.currentVersion(dir)
    assert(LogLake.widenColumn(spark, dir, "k", DecimalType(12, 2)) == v)
    assert(LogLake.currentVersion(dir) == v)
  }

  test("refusals: partition, bucket-hash, identity, constraint-referenced columns") {
    val pDir = tmp("refpart")
    LogLake.create(spark, pDir, narrow(10).withColumn("p", col("k") % 2),
      partitionBy = Seq("p"))
    assert(intercept[IllegalArgumentException] {
      LogLake.widenColumn(spark, pDir, "p", LongType)
    }.getMessage.contains("partition column"))

    val bDir = tmp("refbkt")
    LogLake.create(spark, bDir, narrow(10), bucketBy = Seq("k"), numBuckets = 4)
    assert(intercept[IllegalArgumentException] {
      LogLake.widenColumn(spark, bDir, "k", LongType)
    }.getMessage.contains("bucket column"))

    val cDir = tmp("refcon")
    LogLake.create(spark, cDir, narrow(10))
    LogLake.addCheckConstraint(spark, cDir, "k_pos", "k > 0")
    assert(intercept[IllegalArgumentException] {
      LogLake.widenColumn(spark, cDir, "k", LongType)
    }.getMessage.contains("constraint"))
  }

  test("widened table reads through the merge-on-read (DV) fallback path too") {
    val dir = tmp("dv")
    LogLake.create(spark, dir, narrow(40))
    LogLake.widenColumn(spark, dir, "k", LongType)
    LogLake.delete(spark, dir, col("k") === 5L) // MoR: plants a DV
    val out = spark.read.format("loglake").load(dir)
    assert(out.count() == 39)
    assert(out.schema("k").dataType == LongType)
    assert(out.agg(max("k")).head().getLong(0) == 40L)
  }

  test("SQL: ALTER TABLE ... ALTER COLUMN ... TYPE through the catalog") {
    val db = s"widensql${System.nanoTime() % 100000}"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS loglake.$db")
    spark.sql(s"CREATE TABLE loglake.$db.w (k INT, v STRING) USING loglake")
    spark.sql(s"INSERT INTO loglake.$db.w VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"ALTER TABLE loglake.$db.w ALTER COLUMN k TYPE BIGINT")
    val df = spark.sql(s"SELECT k FROM loglake.$db.w ORDER BY k")
    assert(df.schema("k").dataType == LongType)
    assert(df.as[Long].collect().toSeq == Seq(1L, 2L))
    spark.sql(s"DROP TABLE loglake.$db.w")
    spark.sql(s"DROP NAMESPACE loglake.$db")
  }
}
