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
}
