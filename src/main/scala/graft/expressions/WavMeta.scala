package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native WAV (RIFF/WAVE) header metadata — the audio half of the
  * container-parsing story ([[ImageMeta]] is the image half): sample
  * rate, byte rate, declared data length, and the derived duration are
  * pure byte arithmetic over the published RIFF layout, no codec
  * library. A proper chunk WALK (not fixed offsets): `fmt ` and `data`
  * may be separated by LIST/INFO/fact chunks, chunks are word-aligned,
  * and a truncated or alien buffer yields NULL, never an exception —
  * a corpus audit classifies, it doesn't die. Pixel/PCM decode stays
  * out of scope (that is the documented stub); duration is what a
  * corpus audit needs and it lives entirely in the header.
  *
  * Returns `struct<sample_rate:int, byte_rate:int, data_len:bigint,
  * duration_ms:bigint>` with `duration_ms = data_len·1000 / byte_rate`
  * (integer division, exact for the synthetic corpus construction).
  */
object WavMeta {

  val schema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("byte_rate", IntegerType, nullable = false),
    StructField("data_len", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], p: Int, s: String): Boolean =
    b(p) == s.charAt(0) && b(p + 1) == s.charAt(1) &&
      b(p + 2) == s.charAt(2) && b(p + 3) == s.charAt(3)

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 44) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var p = 12
    var sampleRate = -1
    var byteRate = -1
    var dataLen = -1L
    // walk chunks until both fmt and data are seen (data length is
    // DECLARED — the payload itself may be elsewhere or truncated)
    while (p + 8 <= b.length && (byteRate < 0 || dataLen < 0)) {
      val size = le32(b, p + 4)
      if (tag(b, p, "fmt ")) {
        if (p + 20 > b.length) return null
        sampleRate = le32(b, p + 12).toInt
        byteRate = le32(b, p + 16).toInt
      } else if (tag(b, p, "data")) {
        dataLen = size
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      val advance = 8L + size + (size & 1L)
      if (advance <= 0 || p + advance > Int.MaxValue) return null
      p += advance.toInt
    }
    if (byteRate <= 0 || dataLen < 0) return null
    new GenericInternalRow(Array[Any](
      sampleRate, byteRate, dataLen, dataLen * 1000L / byteRate))
  }
}

/** `wav_meta(binary)` — see [[WavMeta.parse]]. */
case class WavMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WavMeta.schema

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_meta expects binary, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(b: Any): Any =
    WavMeta.parse(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WavMeta.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = $cls.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): WavMetaExpr =
    copy(child = newChild)

  override def prettyName: String = "wav_meta"
}
