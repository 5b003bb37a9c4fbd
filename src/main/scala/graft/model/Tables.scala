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
  /** Inferred schema per (dir, table), cached for the JVM's lifetime:
    * plain `spark.read.parquet` re-infers the schema on EVERY call — a
    * driver-side footer read + file listing per query construction,
    * ~1000 of them across one bench run (157 queries × their table
    * loads × 3 iterations) for immutable fixture files. The cache key
    * includes the directory, so sf0.001/sf0.01/sf0.1 (and amplified
    * copies) never cross-contaminate; passing the inferred schema back
    * via `.schema(...)` produces the identical resolved relation with
    * inference skipped. (r18 — guide §1.2, remove repeated work.) */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      org.apache.spark.sql.types.StructType]()

  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent((dir, name),
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")

  /** `events.ts` has shipped as two different parquet physical types across
    * harness revisions, so the loader probes the resolved Spark type instead
    * of assuming one:
    *
    *  - TIMESTAMP(NANOS): Spark cannot read it natively; sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong=true`, the column resolves as
    *    `LongType`, and we convert nanos → microsecond TimestampType with
    *    `div` — integral division truncating toward zero. That matches
    *    DuckDB's ns→µs parquet read on BOTH sides of the epoch: verified
    *    empirically (DuckDB 1.0, pyarrow TIMESTAMP(NANOS) fixture) that
    *    -1500 ns reads as -1 µs (truncation), not -2 µs (floor).
    *  - TIMESTAMP(MICROS) w/o UTC adjustment: resolves as `TimestampNTZType`;
    *    cast to session-local `TimestampType` — sessions pin UTC, so it is
    *    the same instant DuckDB reads and rendering/hashing is unchanged.
    *  - TIMESTAMP(MICROS) UTC-adjusted: resolves as `TimestampType`; pass
    *    through.
    *
    * Anything else fails loudly (see `FixtureCanarySpec` for the standing
    * drift guard).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType =>
        raw
      case other =>
        throw new IllegalStateException(
          s"events.ts fixture drift: expected LongType (nanosAsLong), TimestampNTZType " +
            s"or TimestampType, got $other — update graft.model.Tables.events")
    }
  }
}
