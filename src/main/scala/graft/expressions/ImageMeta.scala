package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native image-header metadata: format + pixel dimensions parsed from
  * the leading bytes of a binary column — pure byte arithmetic over the
  * published container layouts (PNG IHDR, GIF logical screen
  * descriptor, JPEG SOF segment walk), no codec library. This is the
  * REAL half of the multimodal story (the pixel decode behind
  * [[graft.ops.Multimodal.stubDecode]] stays stubbed — no codec libs in
  * this environment); dimension/format extraction is what a corpus
  * audit actually needs, and it never touches pixel data.
  *
  * Returns `struct<format:string, width:int, height:int>`, NULL when
  * the bytes match none of the supported signatures. Runs as a single
  * static call inside whole-stage codegen.
  *
  * Formats (all public specs):
  *  - PNG: 8-byte signature, then the IHDR chunk — width/height are
  *    big-endian int32 at offsets 16/20.
  *  - GIF (87a/89a): 6-byte version signature, then the logical screen
  *    descriptor — width/height little-endian uint16 at offsets 6/8.
  *  - JPEG: SOI marker, then a marker-segment walk to the first SOFn
  *    (C0–CF except C4/C8/CC) — height/width big-endian uint16 after
  *    the segment's precision byte. Standalone markers (RSTn/TEM) have
  *    no length and are skipped; a walk that reaches SOS or runs out of
  *    bytes yields NULL rather than a guess.
  */
object ImageMeta {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  private def be32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)

  private def be16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))

  /** NULL (not an exception) for unrecognized/truncated bytes — a
    * corpus scan classifies, it must not die on one corrupt blob. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    // PNG: 89 50 4E 47 0D 0A 1A 0A, IHDR must be the first chunk
    if (b.length >= 24 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return row("png", be32(b, 16), be32(b, 20))
    // GIF87a / GIF89a
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    // JPEG: FF D8, then walk marker segments to the first SOFn
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var p = 2
      while (p + 1 < b.length) {
        if ((b(p) & 0xff) != 0xff) return null // desynced, not a marker
        // fill bytes: consecutive FFs pad before a marker
        while (p + 1 < b.length && (b(p + 1) & 0xff) == 0xff) p += 1
        if (p + 1 >= b.length) return null
        val m = b(p + 1) & 0xff
        p += 2
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          // SOFn: len(2) precision(1) height(2) width(2)
          if (p + 6 >= b.length) return null
          return row("jpeg", be16(b, p + 5), be16(b, p + 3))
        }
        if (m == 0xda || m == 0xd9) return null // SOS/EOI before any SOF
        if ((m >= 0xd0 && m <= 0xd7) || m == 0x01) {
          // RSTn / TEM: standalone, no length word
        } else {
          if (p + 1 >= b.length) return null
          val len = be16(b, p)
          if (len < 2) return null
          p += len
        }
      }
      return null
    }
    null
  }
}

/** `image_meta(binary)` — see [[ImageMeta.parse]]. */
case class ImageMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageMeta.schema

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_meta expects binary, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(b: Any): Any =
    ImageMeta.parse(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ImageMeta.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = $cls.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): ImageMetaExpr =
    copy(child = newChild)

  override def prettyName: String = "image_meta"
}
