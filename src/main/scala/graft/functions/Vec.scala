package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Vector math over `array<float>` embedding columns, with the same
  * exact-decimal accumulation trick as [[Det]]: per-element products are
  * exact IEEE doubles, rounded once to DECIMAL(38,12) and summed exactly,
  * so a dot product is bit-identical across engines and partitionings.
  * Higher-order functions only — no UDF, no collect.
  */
object Vec {
  // Element products at (25,12); accumulator at (37,12) so Spark's
  // decimal-addition result type is exactly (38,12) — scale preserved,
  // no precision-triggered rounding — then cast back losslessly.
  private val DecP = DecimalType(25, 12)
  private val DecA = DecimalType(37, 12)

  /** Deterministic dot product of two float arrays, as double. */
  def ddot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast(DoubleType) * y.cast(DoubleType)).cast(DecP)),
      lit(0).cast(DecA),
      (acc, v) => (acc + v).cast(DecA)).cast(DoubleType)

  /** Deterministic L2 norm. */
  def dnorm(a: Column): Column = sqrt(ddot(a, a))

  // ---- DuckDB twins ----
  def oDdot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, len($a)+1), " +
      s"i -> CAST(CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE) AS DECIMAL(25,12)))) AS DOUBLE)"
  def oDnorm(a: String): String = s"sqrt(${oDdot(a, a)})"
}
