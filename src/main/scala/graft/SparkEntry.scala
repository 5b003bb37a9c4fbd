package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are registered per operator module; each carries its DuckDB
  * oracle SQL (or None for approximate/non-SQL ops → rows-only check).
  */
object SparkEntry {

  /** Every registered query, in module order. */
  val registry: Seq[Q] =
    ops.Relational.all ++
    ops.Analytic.all ++
    ops.Scalars.all ++
    ops.Text.all ++
    ops.Sim.all ++
    ops.AnnLake.all ++
    ops.Advanced.all ++
    ops.Multimodal.all ++
    ops.Lake.all ++
    pipeline.Pipeline.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
