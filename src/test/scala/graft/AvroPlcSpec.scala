package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String
import graft.expressions.AvroPlcCodec

/** Round-trip and malformation properties for the Confluent-framed Avro
  * PLCData codec (R3/R6, `/root/reference/schema/schema.avsc:1-11`). */
object AvroPlcProps extends Properties("graft.avro_plc") {

  // strings up to a few hundred chars (covers the 1-byte/2-byte varint
  // length boundary at 64), including unicode
  private val genStr: Gen[String] = Gen.frequency(
    4 -> Gen.alphaNumStr.map(_.take(200)),
    1 -> Gen.listOf(Gen.oneOf('µ', '→', '世', 'ß', 'a')).map(_.mkString.take(200)),
    1 -> Gen.const(""))

  private val genDouble: Gen[Double] = Gen.frequency(
    6 -> Gen.choose(-1e12, 1e12),
    1 -> Gen.oneOf(0.0, -0.0, Double.MinPositiveValue,
      Double.MaxValue, Double.NaN,
      Double.PositiveInfinity, Double.NegativeInfinity))

  property("encode . decode = id on the sensor schema") =
    Prop.forAll(genStr, genStr, genDouble, genDouble, Gen.choose(0, Int.MaxValue)) {
      (m, s, r, t, id) =>
        val bytes = AvroPlcCodec.encode(
          UTF8String.fromString(m), UTF8String.fromString(s), r, t, id)
        val row = AvroPlcCodec.decode(bytes)
        row != null &&
          row.getUTF8String(0).toString == m &&
          row.getUTF8String(1).toString == s &&
          java.lang.Double.doubleToLongBits(row.getDouble(2)) ==
            java.lang.Double.doubleToLongBits(r) &&
          java.lang.Double.doubleToLongBits(row.getDouble(3)) ==
            java.lang.Double.doubleToLongBits(t) &&
          AvroPlcCodec.schemaId(bytes) == id
    }

  property("encoded size matches the framing arithmetic q76's oracle uses") =
    Prop.forAll(genStr, genStr, genDouble, genDouble) { (m, s, r, t) =>
      val mB = m.getBytes("UTF-8").length
      val sB = s.getBytes("UTF-8").length
      def varint(n: Int) = if (2L * n < 128) 1 else if (2L * n < 16384) 2 else 3
      val bytes = AvroPlcCodec.encode(
        UTF8String.fromString(m), UTF8String.fromString(s), r, t, 1)
      bytes.length == 5 + varint(mB) + mB + varint(sB) + sB + 16
    }

  property("any prefix truncation decodes to null, never garbage") =
    Prop.forAll(genStr, genStr, genDouble, genDouble) { (m, s, r, t) =>
      val bytes = AvroPlcCodec.encode(
        UTF8String.fromString(m), UTF8String.fromString(s), r, t, 1)
      (0 until bytes.length).forall(n =>
        AvroPlcCodec.decode(java.util.Arrays.copyOf(bytes, n)) == null)
    }

  property("wrong magic byte or trailing bytes decode to null") =
    Prop.forAll(genStr, genDouble) { (m, r) =>
      val bytes = AvroPlcCodec.encode(
        UTF8String.fromString(m), UTF8String.fromString("s"), r, r, 1)
      val badMagic = bytes.clone(); badMagic(0) = 1
      val trailing = java.util.Arrays.copyOf(bytes, bytes.length + 1)
      AvroPlcCodec.decode(badMagic) == null &&
        AvroPlcCodec.decode(trailing) == null &&
        AvroPlcCodec.decode(null) == null &&
        AvroPlcCodec.schemaId(badMagic) == -1
    }

  property("crafted huge-varint lengths decode to null, never crash") = {
    // zigzag varint FE FF FF FF 0F decodes to ~Int.MaxValue; a naive
    // `p + len > bytes.length` bounds check overflows Int and indexes
    // negative (found by review; regression-pinned here)
    val frame = new Array[Byte](30)
    frame(0) = 0x00
    frame(5) = 0xFE.toByte; frame(6) = 0xFF.toByte; frame(7) = 0xFF.toByte
    frame(8) = 0xFF.toByte; frame(9) = 0x0F
    Prop(AvroPlcCodec.decode(frame) == null)
  }
}

/** The codec as registered SQL functions + Column API, on a real session
  * (codegen path — the generated code calls the same static kernel). */
class AvroPlcSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  test("SQL roundtrip through avro_encode_plc/avro_decode_plc (codegen)") {
    val out = spark.sql(
      """SELECT avro_decode_plc(avro_encode_plc('M1', 'temp', 21.5d, 1.7e9d)) AS r"""
    ).select("r.machine_id", "r.sensor", "r.reading", "r.t_stamp").head()
    assert(out.getString(0) === "M1")
    assert(out.getString(1) === "temp")
    assert(out.getDouble(2) === 21.5)
    assert(out.getDouble(3) === 1.7e9)
  }

  test("malformed buffers land in the NULL quarantine, valid ones survive") {
    import graft.functions.Wire._
    import spark.implicits._
    val df = Seq(("M1", "rpm", 3000.0, 1.7e9), ("M2", "temp", 20.0, 1.7e9))
      .toDF("machine_id", "sensor", "reading", "t_stamp")
    val enc = df.select(avroEncodePlc(col("machine_id"), col("sensor"),
      col("reading"), col("t_stamp")).as("rec"))
    // corrupt the M1 record's magic byte (its machine_id byte, frame
    // offset 8, is '1'); the M2 record must still decode
    val corrupted = enc.withColumn("rec",
      when(expr("substring(rec, 8, 1)") === lit("1".getBytes),
        concat(lit(Array[Byte](9)), expr("substring(rec, 2, length(rec) - 1)")))
        .otherwise(col("rec")))
    val decoded = corrupted.select(avroDecodePlc(col("rec")).as("r"))
    assert(decoded.filter(col("r").isNull).count() === 1)
    assert(decoded.filter(col("r").isNotNull).count() === 1)
  }
}
