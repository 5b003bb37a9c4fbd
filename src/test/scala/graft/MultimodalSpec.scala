package graft

import graft.expressions.ImageMeta
import graft.ops.Multimodal

class MultimodalSpec extends SparkTestBase {

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def meta(b: Array[Byte]): Option[(String, Int, Int)] =
    Option(ImageMeta.parse(b)).map(r =>
      (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2)))

  test("image_meta parses real PNG magic + IHDR bytes") {
    // genuine PNG prefix: signature, IHDR length/type, 1920x1080 BE32
    val png = hx("89504E470D0A1A0A 0000000D 49484452 00000780 00000438 08 06 000000")
    assert(meta(png) == Some(("png", 1920, 1080)))
  }

  test("image_meta parses GIF87a and GIF89a logical screen descriptors (little-endian)") {
    val gif89 = "GIF89a".getBytes("US-ASCII") ++ hx("4001 C800 F7 00 00") // 320x200 LE
    assert(meta(gif89) == Some(("gif", 320, 200)))
    val gif87 = "GIF87a".getBytes("US-ASCII") ++ hx("0005 D002 00 00 00") // 1280x720 LE
    assert(meta(gif87) == Some(("gif", 1280, 720)))
  }

  test("image_meta walks JPEG markers (APP0, DQT) to the first SOF") {
    // SOI, APP0/JFIF (len 16), DQT (len 5, dummy), SOF0: 8-bit 480x640
    val jpeg = hx("FFD8" +
      "FFE0 0010 4A46494600 0101 00 0048 0048 00 00" +
      "FFDB 0005 00 01 02" +
      "FFC0 0011 08 01E0 0280 03 011100 021101 031101")
    assert(meta(jpeg) == Some(("jpeg", 640, 480)))
  }

  test("image_meta yields NULL for truncated, desynced, or non-image bytes") {
    assert(meta("plain text payload".getBytes("UTF-8")).isEmpty)
    assert(meta(hx("89504E470D0A1A0A 0000000D 49484452 000007")).isEmpty) // truncated IHDR
    assert(meta(hx("FFD8 FFDA 0002")).isEmpty) // SOS before any SOF
    assert(meta(hx("FFD8 00 11 22")).isEmpty)  // desynced marker stream
    assert(meta(Array.empty[Byte]).isEmpty)
    assert(meta(null).isEmpty)
  }

  test("image_meta runs as a codegen SQL function over a DataFrame") {
    import spark.implicits._
    val png = hx("89504E470D0A1A0A 0000000D 49484452 00000780 00000438 08 06 000000")
    val rows = Seq(("png", png), ("txt", "hello".getBytes("UTF-8")))
      .toDF("tag", "b")
      .selectExpr("tag", "image_meta(b) AS m")
      .selectExpr("tag", "m.format", "m.width", "m.height")
      .collect()
    val byTag = rows.map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(byTag("png") == Some("png"))
    assert(byTag("txt").isEmpty)
    assert(rows.find(_.getString(0) == "png").get.getInt(2) == 1920)
  }

  test("stubDecode is deterministic and shape-stable") {
    val b = "hello world".getBytes("UTF-8")
    val f1 = Multimodal.stubDecode(b)
    val f2 = Multimodal.stubDecode(b)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.length === 4)
    assert(f1(0) === 11.0f) // first feature = byte length
  }

  test("extractFeatures runs partition-local over binary media") {
    val feats = Multimodal.extractFeatures(Multimodal.media(spark, sfDir)).collect()
    assert(feats.length === 500)
    assert(feats.forall(_.feature.length == 4))
    assert(feats.map(_.media_type).toSet === Set("image", "audio", "video"))
    // feature(0) is the byte length of the payload — never zero here
    assert(feats.forall(_.feature(0) > 0))
  }
}
