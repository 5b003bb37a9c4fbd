package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.expressions.ScaledDotProduct

/** Vector math over `array<float>` embedding columns.
  *
  * Dot products run through [[graft.expressions.ScaledDotProduct]] — a
  * custom whole-stage-codegen expression that fixed-point-scales each
  * product (⌊aᵢ·bᵢ·10¹²⌋) and sums exact longs, so the result is
  * order-independent, bit-identical across engines, and a primitive
  * loop in generated code (no per-element boxing, unlike the
  * `aggregate(zip_with(...))` HOF fold it replaced).
  */
object Vec {
  private val Scale = ScaledDotProduct.Scale

  /** Raw scaled dot product as a long: Σ ⌊aᵢ·bᵢ·10¹²⌋. */
  def sdot(a: Column, b: Column): Column =
    GraftBridge.column(ScaledDotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Deterministic dot product of two float arrays, as double. */
  def ddot(a: Column, b: Column): Column =
    sdot(a, b).cast(DoubleType) / lit(Scale)

  /** Deterministic L2 norm. */
  def dnorm(a: Column): Column = sqrt(ddot(a, a))

  // ---- DuckDB twins (identical fixed-point arithmetic) ----
  def oSdot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), " +
      s"i -> CAST(floor(CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE) * $Scale) AS BIGINT)))"
  def oDdot(a: String, b: String): String =
    s"(CAST(${oSdot(a, b)} AS DOUBLE) / $Scale)"
  def oDnorm(a: String): String = s"sqrt(${oDdot(a, a)})"
}
