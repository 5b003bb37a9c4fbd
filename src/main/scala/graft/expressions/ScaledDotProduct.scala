package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Whole-stage-codegen dot product over two `array<float>` columns,
  * fixed-point scaled: returns Σᵢ ⌊aᵢ·bᵢ·10¹²⌋ as a long.
  *
  * Why fixed-point: float summation order is engine-dependent, so a raw
  * double dot product can't be oracle-checked. Flooring each product to
  * an integer makes the sum exact and associative — bit-identical on any
  * partitioning and replayable in DuckDB SQL
  * (`SUM(CAST(floor(a[i]*b[i]*1e12) AS BIGINT))`). |aᵢ·bᵢ|·10¹² < 2⁵³
  * keeps the floor exact; 64-dim sums stay far below 2⁶³.
  *
  * Why an Expression and not a UDF/HOF: the interpreted
  * `aggregate(zip_with(...))` fold allocates per element and falls out
  * of codegen (ArrayAggregate is CodegenFallback); this compiles to a
  * primitive loop inside the enclosing WholeStageCodegen stage — the
  * hot path for 100 TB ANN scoring.
  */
case class ScaledDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  import ScaledDotProduct.Scale

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"scaled_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      // null elements contribute nothing — matches the oracle, where a
      // NULL element makes its product term NULL and list_sum skips it
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += math.floor(x.getFloat(i).toDouble * y.getFloat(i).toDouble * Scale).toLong
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    ${ev.value} += (long) java.lang.Math.floor(
         |      (double) $a.getFloat($i) * (double) $b.getFloat($i) * ${ScaledDotProduct.Scale});
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScaledDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "scaled_dot"
}

object ScaledDotProduct {
  /** The single fixed-point scale: eval, codegen, Vec, and the DuckDB
    * oracle fragments all reference this one constant. */
  final val Scale = 1.0e12
}
