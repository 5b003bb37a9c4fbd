package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-stage-codegen 60-bit md5 hash: the first 15 hex characters of
  * `md5(input)` as a positive long — exactly
  * `conv(substring(md5(c), 1, 15), 16, 10)` (see
  * [[graft.functions.Det.h60]]), and exactly DuckDB's
  * `CAST('0x' || substr(md5(c),1,15) AS BIGINT)`, but without the
  * per-row costs of that composition: Spark's `md5` instantiates a new
  * `MessageDigest` per value and renders a 32-char hex string that
  * `substring`+`conv` immediately re-parse. This expression reuses a
  * thread-local digest and assembles the 60-bit value straight from the
  * digest bytes (15 hex chars = the first 7.5 bytes, big-endian).
  *
  * h60 is the portability kernel of every dedup / MinHash / LSH / split
  * operator (md5 is md5 in every engine, unlike xxhash64/murmur whose
  * seeds and variants differ), so this is the hottest scalar in the
  * text-similarity suite. Bit-equality with the composed form is
  * asserted in FunctionsSpec.
  */
case class Md560(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_60 expects string or binary, got ${t.simpleString}")
  }

  // def, not val: evaluated only after the child is resolved (a strict
  // val would call dataType on an unresolved attribute at construction)
  private def fromString = child.dataType == StringType

  override protected def nullSafeEval(x: Any): Any =
    if (fromString) Md560.hash60(x.asInstanceOf[UTF8String].getBytes)
    else Md560.hash60(x.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Md560.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, x => {
      val bytes = if (fromString) s"$x.getBytes()" else x
      s"${ev.value} = $cls.hash60($bytes);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Md560 =
    copy(child = newChild)

  override def prettyName: String = "md5_60"
}

object Md560 {
  private val localDigest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** First 60 bits of md5(bytes), as a (non-negative) long — the value
    * of the first 15 hex characters of the standard digest rendering. */
  def hash60(bytes: Array[Byte]): Long = {
    val md = localDigest.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }
}
