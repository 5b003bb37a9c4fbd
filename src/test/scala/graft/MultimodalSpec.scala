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

  private def wavMeta(b: Array[Byte]): Option[(Int, Int, Long, Long)] =
    Option(graft.expressions.WavMeta.parse(b)).map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))

  test("wav_meta parses a canonical RIFF/WAVE header") {
    // PCM stereo 16 kHz 16-bit (byte rate 32000), data length 64000 → 2000 ms
    val wav = "RIFF".getBytes("US-ASCII") ++ hx("24FA0000") ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ hx("10000000 0100 0200 803E0000 007D0000 0400 1000") ++
      "data".getBytes("US-ASCII") ++ hx("00FA0000")
    assert(wavMeta(wav) == Some((16000, 32000, 64000L, 2000L)))
  }

  test("wav_meta walks interleaved chunks (LIST before fmt, odd-size padding)") {
    val wav = "RIFF".getBytes("US-ASCII") ++ hx("40000000") ++
      "WAVE".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ hx("05000000 4141414141 00") ++ // odd size + pad
      "fmt ".getBytes("US-ASCII") ++ hx("10000000 0100 0100 80BB0000 00EE0200 0200 1000") ++
      "data".getBytes("US-ASCII") ++ hx("00D00700")
    // mono 48 kHz 16-bit: byte rate 0x2EE00 = 192000; data 0x7D000 = 512000 → 2666 ms
    assert(wavMeta(wav) == Some((48000, 192000, 512000L, 2666L)))
  }

  test("wav_meta yields NULL for truncated, alien, or zero-rate buffers") {
    assert(wavMeta("RIFFxxxxWAVEfmt ".getBytes("US-ASCII")).isEmpty) // truncated
    assert(wavMeta("not audio at all, just some text padding!!".getBytes("US-ASCII")).isEmpty)
    val zeroRate = "RIFF".getBytes("US-ASCII") ++ hx("24000000") ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ hx("10000000 0100 0200 803E0000 00000000 0400 1000") ++
      "data".getBytes("US-ASCII") ++ hx("00FA0000")
    assert(wavMeta(zeroRate).isEmpty, "a zero byte rate must not divide")
    assert(wavMeta(null).isEmpty)
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
