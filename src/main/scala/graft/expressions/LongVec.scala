package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Whole-stage-codegen twins of the `array<long>` lambda kernels the
  * ANN path leans on. Spark's higher-order functions (`ArrayAggregate`,
  * `ZipWith`) are CodegenFallback: every evaluation walks an
  * interpreted expression tree and allocates per element — measured
  * ~15 % of executor CPU across the ANN-heavy queries (r17 JFR,
  * ArrayAggregate.eval + ZipWith.eval). These compile to primitive
  * loops inside the enclosing WholeStageCodegen stage.
  *
  * Null semantics are EXACTLY the HOF forms they replace (the oracle
  * replays the same math, so the bit-for-bit contract is load-bearing):
  *
  * - [[LongDotProduct]] ≡ `aggregate(zip_with(a, b, (x,y) => x*y),
  *   0L, (acc,v) => acc+v)`: `zip_with` pads the shorter array with
  *   nulls and a null product poisons the running sum, so the result
  *   is NULL iff the lengths differ or any element in either array is
  *   null; otherwise Σ aᵢ·bᵢ over exact longs (Java wrap semantics,
  *   same as Spark's non-ANSI long multiply/add).
  * - [[LongZipSub]]/[[LongZipAdd]] ≡ `zip_with(a, b, (x,y) => x∓y)`:
  *   output length max(len), element NULL where either side is
  *   missing or null.
  */
abstract class LongArrayBinary extends BinaryExpression {
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
}

case class LongDotProduct(left: Expression, right: Expression)
    extends LongArrayBinary {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "ldot"
}

abstract class LongZipArith extends LongArrayBinary {
  /** "+" or "-" — spliced into both eval and generated code. */
  protected def opChar: String

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.max(nx, ny)
    val out = new Array[Any](n)
    var i = 0
    val sub = opChar == "-"
    while (i < n) {
      out(i) =
        if (i >= nx || i >= ny || x.isNullAt(i) || y.isNullAt(i)) null
        else if (sub) x.getLong(i) - y.getLong(i)
        else x.getLong(i) + y.getLong(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $n = java.lang.Math.max($na, $nb);
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($i < $na && $i < $nb && !$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $out[$i] = java.lang.Long.valueOf($a.getLong($i) $opChar $b.getLong($i));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
}

case class LongZipSub(left: Expression, right: Expression) extends LongZipArith {
  override protected def opChar: String = "-"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongZipSub =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "lzip_sub"
}

case class LongZipAdd(left: Expression, right: Expression) extends LongZipArith {
  override protected def opChar: String = "+"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongZipAdd =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "lzip_add"
}

/** `transform(e, v => floor(v.cast(double) / nrm * 1e6).cast(long))`
  * as a primitive codegen loop — the normalized-integer-space
  * projection every ANN build and query runs per corpus row
  * (`AnnIndex.normalized`). Identical arithmetic and evaluation order:
  * `(long) Math.floor(((double) eᵢ / nrm) * 1e6)`, null elements stay
  * null. `ArrayTransform` is CodegenFallback; this isn't. */
case class NormScale(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{DoubleType, FloatType}

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"norm_scale expects (array<float>, double), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i))
        out(i) = math.floor(x.getFloat(i).toDouble / nrm * 1.0e6).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $out[$i] = java.lang.Long.valueOf((long) java.lang.Math.floor(
         |      ((double) $a.getFloat($i) / $b) * 1.0e6));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NormScale =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "norm_scale"
}
