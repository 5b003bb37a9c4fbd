package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` surface: wraps a raw Catalyst Expression
  * into a public Column (and back), a LogicalPlan into a DataFrame, and
  * exposes a frame's analyzed plan — for graft's custom expressions and
  * custom operators. Lives in the o.a.s.sql package solely to satisfy
  * the access scope — no Spark internals are modified.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The FULLY-CONVERTED Catalyst tree of a Column. [[expression]]
    * hands back a lazy `ColumnNodeExpression` wrapper whose `children`
    * are empty — fine for embedding (the analyzer unwraps it later),
    * silently wrong for tree INSPECTION: `collect`/`transform` see a
    * leaf and find nothing. Any code walking a Column's tree (e.g. the
    * partition-predicate classifier) must use this instead. */
  def catalystExpression(c: Column): Expression =
    classic.GraftNodeConverter.toCatalyst(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Re-root a frame on its executed RDD (a flat LogicalRDD): cuts the
    * accumulated logical plan so iterative algorithms (q83's connected
    * components) pay O(1) analysis per round instead of re-analyzing a
    * plan that deepens every round. Consuming the result executes the
    * source frame's plan — persist it first so that read hits cache,
    * not a recompute. InternalRow passthrough: no Row conversion.
    */
  def truncateLineage(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema)
  }

  /** Re-tag a batch relation as a streaming scan. A V1 streaming
    * `Source.getBatch` must hand MicroBatchExecution a frame whose
    * relation carries `isStreaming = true` (asserted since Spark 4) —
    * this is FileStreamSource's own move when it wraps its per-batch
    * file list in a `LogicalRelation(…, isStreaming = true)`. */
  def asStreamingScan(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val plan = ds.queryExecution.analyzed match {
      case lr: execution.datasources.LogicalRelation => lr.copy(isStreaming = true)
      case other => other
    }
    ofRows(ds.sparkSession, plan)
  }

  /** The frame's executed plan as an InternalRow RDD (lazy), for
    * `needConversion = false` relations that hand rows straight back
    * to the engine. */
  def toInternalRdd(df: DataFrame): org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd

  /** A DataFrame over a raw InternalRow RDD — the write half of
    * [[toInternalRdd]], for operators that index/transform rows on the
    * codegen codec without a per-row external-Row round-trip (loglake's
    * identity assignment). Rows must match `schema` physically. */
  def internalDf(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)

  /** Streaming-tag an ARBITRARY batch plan by re-rooting it on its
    * executed RDD (lazy — nothing runs until the micro-batch does).
    * [[asStreamingScan]] only re-tags a top-level `LogicalRelation`;
    * a deletion-vector-masked loglake read is a join (parquet scan
    * anti-join DV positions), so its analyzed root is a Project over a
    * Join and needs the tag on a fresh leaf instead. The join still
    * plans and executes with the session's optimizer (broadcast of the
    * tiny DV side included) when the RDD is materialized. */
  def asStreamingRdd(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }

  /** An empty, streaming-tagged frame (a batch with no committed data
    * still needs the streaming tag — see [[asStreamingScan]]). */
  def emptyStreamingFrame(spark: SparkSession, schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      cs.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
      schema, isStreaming = true)
  }
}
