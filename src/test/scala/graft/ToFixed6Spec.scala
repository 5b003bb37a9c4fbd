package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Decimal, DecimalType}
import graft.expressions.ToFixed6
import graft.functions.Det

/** ToFixed6 must be indistinguishable from `CAST(x AS DECIMAL(18,6))`:
  * the fast path's guard band has to route every ambiguous value to the
  * Decimal-backed slow path. Checked three ways: a pure-scala oracle
  * sweep over adversarial doubles, a codegen'd DataFrame comparison, and
  * end-to-end dsum equality against decimal summation on real data.
  */
class ToFixed6Spec extends SparkTestBase {
  import spark.implicits._

  /** The reference: exactly what Spark's Cast does for double→decimal. */
  private def castOracle(x: Double): Option[Long] = {
    if (x.isNaN || x.isInfinite) return None
    val d = Decimal(x)
    if (d.changePrecision(18, 6)) Some(d.toUnscaledLong) else None
  }

  private def computeOpt(x: Double): Option[Long] = {
    val v = ToFixed6.compute(x)
    if (v == ToFixed6.NullSentinel) None else Some(v)
  }

  test("compute matches the decimal cast on boundary-adversarial values") {
    val rnd = new scala.util.Random(421)
    val adversarial = Seq.newBuilder[Double]
    // exact 6-dp rounding boundaries k + 0.5 ulp-of-scale, and neighbors
    for (_ <- 1 to 20000) {
      val k = rnd.nextLong() % 1000000000000L
      val base = k / 1e6 + (if (rnd.nextBoolean()) 5e-7 else -5e-7)
      adversarial += base
      adversarial += java.lang.Math.nextUp(base)
      adversarial += java.lang.Math.nextDown(base)
    }
    // uniform magnitudes across the whole double range incl. overflow
    for (_ <- 1 to 20000) {
      adversarial += java.lang.Double.longBitsToDouble(rnd.nextLong())
    }
    // specials
    adversarial ++= Seq(0.0, -0.0, 5e-7, -5e-7, 1.0000005, -1.0000005,
      123.4567895, 1e12, -1e12, 1e12 - 0.0000001, 999999999999.9999994,
      Double.MinPositiveValue, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MaxValue, -Double.MaxValue)
    var checked = 0
    adversarial.result().foreach { x =>
      val got = computeOpt(x)
      val want = castOracle(x)
      assert(got === want, f"x=$x%.17g bits=${java.lang.Double.doubleToRawLongBits(x)}")
      checked += 1
    }
    assert(checked > 80000)
  }

  test("codegen'd column path matches the decimal cast column-for-column") {
    val rnd = new scala.util.Random(99)
    // in-range values only: the reference cast THROWS on overflow under
    // ANSI mode (the session default); overflow equivalence is covered
    // by the pure-scala sweep above against changePrecision
    val xs = Seq.fill(50000)(rnd.nextDouble() * 2e6 - 1e6) ++
      Seq.fill(1000)(rnd.nextInt(2000000).toDouble / 2 + 5e-7)
    val df = xs.toDF("x")
    val f6 = GraftBridge.column(ToFixed6(GraftBridge.expression(col("x"))))
    val ref = (col("x").cast(DecimalType(18, 6)) * lit(1000000L)).cast("long")
    val bad = df.select(f6.as("a"), ref.as("b"))
      .where(!(col("a") <=> col("b"))).count()
    assert(bad === 0L)
  }

  test("dsum over lineitem equals decimal summation exactly") {
    val li = model.Tables.lineitem(spark, sfDir)
    def dec(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(38, 6))).cast("double")
    val exprs = Seq(
      col("l_quantity"), col("l_extendedprice"),
      col("l_extendedprice") * (lit(1) - col("l_discount")),
      col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
    val a = li.groupBy("l_returnflag", "l_linestatus")
      .agg(Det.dsum(exprs.head), exprs.tail.map(Det.dsum): _*)
      .orderBy("l_returnflag", "l_linestatus").collect()
    val b = li.groupBy("l_returnflag", "l_linestatus")
      .agg(dec(exprs.head), exprs.tail.map(dec): _*)
      .orderBy("l_returnflag", "l_linestatus").collect()
    assert(a.toSeq === b.toSeq) // bit-identical doubles, not approx
  }

  test("nulls and empty groups behave like the decimal path") {
    val df = Seq[(String, java.lang.Double)](
      ("a", 1.5), ("a", null), ("b", null)).toDF("k", "x")
    val r = df.groupBy("k").agg(Det.dsum(col("x")).as("s"))
      .orderBy("k").collect()
    assert(r(0).getDouble(1) === 1.5)
    assert(r(1).isNullAt(1)) // all-null group sums to null, as decimal does
  }
}
