package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Confluent-framed Avro wire codec for the reference's `PLCData`
  * record (`/root/reference/schema/schema.avsc:1-11`): a flat
  * `{machine_id: string, sensor: string, reading: double, t_stamp:
  * double}` record, exactly what the reference producer serializes via
  * `AvroSerializer` (`/root/reference/producer/sensor_data_producer.py:33-36,67`)
  * and the consumer deserializes
  * (`/root/reference/consumer/sensor_data_consumer.py:38-41,94-102`).
  *
  * Wire layout (Confluent Schema Registry framing + Avro binary body):
  *   byte 0        magic 0x00
  *   bytes 1-4     schema id, big-endian int
  *   body          zigzag-varint-length-prefixed UTF-8 for each string,
  *                 then 8 little-endian IEEE-754 bytes per double
  *
  * The spark-avro jar is absent from this environment, but the record
  * is flat enough that a deterministic ~100-line codec closes the
  * R3/R6 capability gap (SURVEY.md §2.1) with full codegen: both
  * expressions compile to a static call inside whole-stage codegen, so
  * encode/decode live in the same generated loop as the rest of the
  * pipeline — no UDF boundary, no serializer framework.
  *
  * Decode is PERMISSIVE: a malformed buffer (wrong magic, truncation,
  * negative or oversized length) yields NULL rather than failing the
  * job — corrupt records on a 100 TB ingest are routed to a quarantine
  * filter (`WHERE decoded IS NULL`), not a retry storm.
  */
object AvroPlcCodec {

  /** Result schema of [[AvroDecodePlc]] — the reference wire schema. */
  val schema: StructType = StructType(Seq(
    StructField("machine_id", StringType, nullable = false),
    StructField("sensor", StringType, nullable = false),
    StructField("reading", DoubleType, nullable = false),
    StructField("t_stamp", DoubleType, nullable = false)))

  private def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)

  private def varintLen(z: Long): Int = {
    var v = z; var n = 1
    while ((v & ~0x7fL) != 0) { v >>>= 7; n += 1 }
    n
  }

  private def writeVarint(buf: Array[Byte], pos: Int, z: Long): Int = {
    var v = z; var p = pos
    while ((v & ~0x7fL) != 0) {
      buf(p) = ((v & 0x7f) | 0x80).toByte; v >>>= 7; p += 1
    }
    buf(p) = v.toByte
    p + 1
  }

  private def writeDoubleLE(buf: Array[Byte], pos: Int, d: Double): Int = {
    var bits = java.lang.Double.doubleToLongBits(d)
    var p = pos; var i = 0
    while (i < 8) { buf(p) = bits.toByte; bits >>>= 8; p += 1; i += 1 }
    p
  }

  def encode(machineId: UTF8String, sensor: UTF8String,
      reading: Double, tStamp: Double, schemaId: Int): Array[Byte] = {
    val m = machineId.getBytes
    val s = sensor.getBytes
    val zm = zigzag(m.length.toLong)
    val zs = zigzag(s.length.toLong)
    val buf = new Array[Byte](
      5 + varintLen(zm) + m.length + varintLen(zs) + s.length + 16)
    buf(0) = 0x00
    buf(1) = (schemaId >>> 24).toByte
    buf(2) = (schemaId >>> 16).toByte
    buf(3) = (schemaId >>> 8).toByte
    buf(4) = schemaId.toByte
    var p = writeVarint(buf, 5, zm)
    System.arraycopy(m, 0, buf, p, m.length); p += m.length
    p = writeVarint(buf, p, zs)
    System.arraycopy(s, 0, buf, p, s.length); p += s.length
    p = writeDoubleLE(buf, p, reading)
    writeDoubleLE(buf, p, tStamp)
    buf
  }

  /** Decode a Confluent-framed PLCData buffer; null on any malformation. */
  def decode(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 5 + 1 + 1 + 16 || bytes(0) != 0x00) return null
    var p = 5
    // machine_id
    var z = 0L; var shift = 0; var b = 0
    do {
      if (p >= bytes.length || shift > 63) return null
      b = bytes(p) & 0xff; z |= (b & 0x7fL) << shift; shift += 7; p += 1
    } while ((b & 0x80) != 0)
    // bound-check on the LONG before narrowing: a crafted varint can
    // decode to ~2^31, and `p + mLen` in Int overflows negative and
    // slips past a naive `> bytes.length` check (then indexes negative)
    val mLenL = (z >>> 1) ^ -(z & 1)
    if (mLenL < 0 || mLenL > bytes.length - p) return null
    val mLen = mLenL.toInt
    val mid = UTF8String.fromBytes(bytes, p, mLen); p += mLen
    // sensor
    z = 0L; shift = 0
    do {
      if (p >= bytes.length || shift > 63) return null
      b = bytes(p) & 0xff; z |= (b & 0x7fL) << shift; shift += 7; p += 1
    } while ((b & 0x80) != 0)
    val sLenL = (z >>> 1) ^ -(z & 1)
    if (sLenL < 0 || sLenL > bytes.length - p) return null
    val sLen = sLenL.toInt
    val sensor = UTF8String.fromBytes(bytes, p, sLen); p += sLen
    // two little-endian doubles, and nothing may trail them
    if (p + 16 != bytes.length) return null
    var bits1 = 0L; var bits2 = 0L; var i = 0
    while (i < 8) { bits1 |= (bytes(p + i) & 0xffL) << (8 * i); i += 1 }
    i = 0
    while (i < 8) { bits2 |= (bytes(p + 8 + i) & 0xffL) << (8 * i); i += 1 }
    new GenericInternalRow(Array[Any](
      mid, sensor,
      java.lang.Double.longBitsToDouble(bits1),
      java.lang.Double.longBitsToDouble(bits2)))
  }

  /** Schema id from the Confluent header (−1 if the frame is invalid) —
    * what a registry-aware reader dispatches on. */
  def schemaId(bytes: Array[Byte]): Int =
    if (bytes == null || bytes.length < 5 || bytes(0) != 0x00) -1
    else ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
      ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
}

/** R3: serialize the 4 PLCData fields to Confluent-framed Avro binary
  * (the reference producer's `avro_serializer(data, ...)`,
  * `/root/reference/producer/sensor_data_producer.py:67`).
  */
case class AvroEncodePlc(
    machineId: Expression, sensor: Expression,
    reading: Expression, tStamp: Expression,
    schemaId: Int = 1) extends QuaternaryExpression {

  override def first: Expression = machineId
  override def second: Expression = sensor
  override def third: Expression = reading
  override def fourth: Expression = tStamp

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(StringType, StringType, DoubleType, DoubleType)
    val actual = children.map(_.dataType)
    if (actual == expected) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"avro_encode_plc expects (string, string, double, double), got " +
        actual.map(_.simpleString).mkString("(", ", ", ")"))
  }

  override protected def nullSafeEval(m: Any, s: Any, r: Any, t: Any): Any =
    AvroPlcCodec.encode(
      m.asInstanceOf[UTF8String], s.asInstanceOf[UTF8String],
      r.asInstanceOf[Double], t.asInstanceOf[Double], schemaId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = AvroPlcCodec.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (m, s, r, t) =>
      s"${ev.value} = $cls.encode($m, $s, $r, $t, $schemaId);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): AvroEncodePlc =
    copy(machineId = newFirst, sensor = newSecond,
      reading = newThird, tStamp = newFourth)

  override def prettyName: String = "avro_encode_plc"
}

/** R6: deserialize Confluent-framed Avro binary back to the PLCData
  * struct (the reference consumer's `avro_deserializer`,
  * `/root/reference/consumer/sensor_data_consumer.py:94-102`); NULL for
  * malformed buffers (permissive mode).
  */
case class AvroDecodePlc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AvroPlcCodec.schema

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"avro_decode_plc expects binary, got ${t.simpleString}")
  }

  override protected def nullSafeEval(b: Any): Any =
    AvroPlcCodec.decode(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = AvroPlcCodec.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = $cls.decode($b);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): AvroDecodePlc =
    copy(child = newChild)

  override def prettyName: String = "avro_decode_plc"
}
