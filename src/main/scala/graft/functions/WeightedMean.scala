package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregation (the `Aggregator[IN, BUF, OUT]` extension
  * point): exact weighted mean. Weights and weighted values accumulate
  * as BigDecimal rounded to scale 6 — the same rounding as the oracle's
  * `CAST(x AS DECIMAL(38,6))` — so merge order (partial aggregation,
  * AQE re-plans, executor count) cannot change the result. The final
  * double division happens once, on identical operands in both engines.
  */
object WeightedMean {

  final case class Buf(wsum: BigDecimal, w: BigDecimal)

  private val agg = new Aggregator[(Double, Double), Buf, Double] {
    override def zero: Buf = Buf(BigDecimal(0), BigDecimal(0))
    override def reduce(b: Buf, in: (Double, Double)): Buf = {
      val (value, weight) = in
      Buf(
        b.wsum + BigDecimal(value * weight).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        b.w + BigDecimal(weight).setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }
    override def merge(a: Buf, b: Buf): Buf = Buf(a.wsum + b.wsum, a.w + b.w)
    override def finish(r: Buf): Double = r.wsum.toDouble / r.w.toDouble
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: `weightedMean(value, weight)`. */
  def apply(value: Column, weight: Column): Column = {
    val fn = udaf(agg, Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    fn(value, weight)
  }

  /** Oracle twin. */
  def oracle(value: String, weight: String): String =
    s"CAST(SUM(CAST(($value) * ($weight) AS DECIMAL(38,6))) AS DOUBLE) / " +
      s"CAST(SUM(CAST(($weight) AS DECIMAL(38,6))) AS DOUBLE)"
}
