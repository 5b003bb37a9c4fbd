package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness parquet tables (`/root/repo/FIXTURES.md` §B).
  *
  * Plain `spark.read.parquet` keeps the scan declarative so Catalyst can
  * push filters and prune columns down to the parquet reader — at 100 TB
  * the scan, not the operator tree, dominates, so nothing here must defeat
  * pushdown (no per-row lambdas, no eager caching).
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark cannot read
    * natively; sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
    * and this loader converts nanos → microsecond TimestampType with
    * `div` — integral division truncating toward zero. That matches
    * DuckDB's ns→µs parquet read on BOTH sides of the epoch: verified
    * empirically (DuckDB 1.0, pyarrow TIMESTAMP(NANOS) fixture) that
    * -1500 ns reads as -1 µs (truncation), not -2 µs (floor), so
    * pre-1970 timestamps round identically in both engines.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
}
