package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.model.Tables._
import graft.functions.Det._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns plus typed metadata, with decode / feature-extraction as
  * partition-local batch functions. The actual codec decode is STUBBED
  * (no image/audio libraries in this environment) behind
  * [[Multimodal.stubDecode]] — a deterministic fake — but the Spark-side
  * plumbing (schema, binary columns, mapPartitions batching, feature
  * aggregation) is real and tested.
  *
  * Scale notes: binary payloads stay columnar in parquet; metadata-only
  * queries never deserialize the blob (column pruning drops it at the
  * scan). Feature extraction runs per-partition with no driver
  * round-trip.
  */
object Multimodal {

  /** Typed row for the decoded-feature path. */
  final case class MediaFeature(doc_id: Long, media_type: String, feature: Array[Float])

  /** The media table: harness documents re-cast as binary payloads with
    * a deterministic modality assignment. */
  def media(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("content"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"))

  /** STUB decoder — stands in for a real codec (e.g. JPEG → pixels).
    * Deterministic fake: 4 features derived from the byte content's
    * length and a rolling byte hash, so tests and re-runs agree. */
  def stubDecode(bytes: Array[Byte]): Array[Float] = {
    var h = 1125899906842597L // fake "decode": rolling hash over bytes
    var i = 0
    while (i < bytes.length) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
    Array(
      bytes.length.toFloat,
      ((h & 0xffff) / 65536.0).toFloat,
      (((h >>> 16) & 0xffff) / 65536.0).toFloat,
      (((h >>> 32) & 0xffff) / 65536.0).toFloat)
  }

  /** Partition-local feature extraction (the mapInPandas analog): one
    * decoder instance per partition, rows streamed through it. */
  def extractFeatures(
      df: DataFrame,
      decode: Array[Byte] => Array[Float] = stubDecode): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select("doc_id", "media_type", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, mt, bytes) => MediaFeature(id, mt, decode(bytes)) }
      }
  }

  // ---- synthetic container construction (q60/q61): image-typed docs
  // get a REAL PNG/GIF/JPEG container header — correct magic numbers,
  // chunk/descriptor/segment layout, hash-derived dimensions in the
  // right byte order — prepended to the payload, and the engine then
  // parses the dimensions BACK natively with the codegen `image_meta`
  // expression. The oracle mirrors the dimension ARITHMETIC (it derives
  // the same numbers the header carries), so the hash gate proves the
  // construct→parse round-trip is lossless; parsing of real-world
  // fixture bytes (incl. JPEG APP0/DQT marker walks) is pinned in
  // MultimodalSpec.

  private def imageMetaCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.ImageMetaExpr(org.apache.spark.sql.GraftBridge.expression(c)))

  private def wavMetaCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.WavMetaExpr(org.apache.spark.sql.GraftBridge.expression(c)))

  private def be32u(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 8, "0"))
  private def be16u(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 4, "0"))
  private def le16u(c: org.apache.spark.sql.Column) = {
    val h4 = lpad(hex(c), 4, "0")
    unhex(concat(substring(h4, 3, 2), substring(h4, 1, 2)))
  }
  private def le32u(c: org.apache.spark.sql.Column) = {
    val h8 = lpad(hex(c), 8, "0")
    unhex(concat(substring(h8, 7, 2), substring(h8, 5, 2),
      substring(h8, 3, 2), substring(h8, 1, 2)))
  }

  /** media() + `fp` (payload fingerprint) + `packed` (container bytes:
    * real headers for image AND audio rows, bare payload for video).
    * Image formats cycle png/gif/jpeg (doc_id % 9 ∈ {0, 3, 6}); audio
    * rows get a well-formed RIFF/WAVE header (PCM, 16 kHz stereo 16-bit
    * → byte rate 32 000) whose DECLARED data length encodes the
    * hash-derived duration exactly (dur·32 bytes at 32 000 B/s). */
  private def withContainers(df: DataFrame): DataFrame = {
    val wA = lit(160) + h60(concat(lit("w:"), col("fp"))) % 1760
    val hA = lit(90) + h60(concat(lit("h:"), col("fp"))) % 990
    val durA = lit(1000) + h60(concat(lit("d:"), col("fp"))) % 600000
    val imageHeader =
      // PNG: signature + IHDR length/type + BE32 dims + depth/color/crc filler
      when(col("doc_id") % 9 === 0,
        concat(unhex(lit("89504E470D0A1A0A0000000D49484452")),
          be32u(wA), be32u(hA), unhex(lit("0806000000"))))
      // GIF89a: version + LE16 logical-screen dims + flags filler
      .when(col("doc_id") % 9 === 3,
        concat(lit("GIF89a").cast("binary"), le16u(wA), le16u(hA), unhex(lit("00"))))
      // JPEG: SOI + SOF0 (len 17, precision 8, BE16 height THEN width,
      // 3 component specs)
      .otherwise(
        concat(unhex(lit("FFD8FFC0001108")), be16u(hA), be16u(wA),
          unhex(lit("03011100021101031101"))))
    // RIFF size + "WAVE" + canonical 16-byte PCM fmt chunk
    // (tag, size 16, format 1, channels 2, rate 16000, byte rate 32000,
    // align 4, bits 16) + "data" + declared length
    val wavHeader = concat(
      lit("RIFF").cast("binary"), le32u(durA * 32 + 36),
      unhex(lit("57415645666D74201000000001000200803E0000007D00000400100064617461")),
      le32u(durA * 32))
    df.withColumn("fp", md5(col("content")))
      .withColumn("packed",
        when(col("media_type") === "image", concat(imageHeader, col("content")))
          .when(col("media_type") === "audio", concat(wavHeader, col("content")))
          .otherwise(col("content")))
  }

  val all: Seq[Q] = Seq(
    // --- q60: metadata extraction over binary media columns — byte
    // length, content fingerprint, image format/dimensions parsed
    // NATIVELY from the container header bytes by the codegen
    // `image_meta` expression, and audio duration parsed NATIVELY from
    // the RIFF/WAVE header by `wav_meta` (declared data length ÷ byte
    // rate — a real chunk walk, not fixed offsets). Only video duration
    // stays hash-derived (video containers carry duration in
    // codec-specific tables the stub doesn't build).
    Q(
      "q60_multimodal_meta",
      """WITH m AS (
        |  SELECT doc_id,
        |    (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
        |    CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        |    md5(text) AS fp
        |  FROM documents
        |)
        |SELECT doc_id, media_type, byte_len, fp,
        |  CASE WHEN media_type = 'image'
        |       THEN CASE WHEN doc_id % 9 = 0 THEN 'png'
        |                 WHEN doc_id % 9 = 3 THEN 'gif'
        |                 ELSE 'jpeg' END
        |       END AS format,
        |  CASE WHEN media_type = 'image'
        |       THEN CAST(160 + (CAST('0x' || substr(md5(concat('w:', fp)), 1, 15) AS BIGINT) % 1760) AS INTEGER)
        |       END AS width,
        |  CASE WHEN media_type = 'image'
        |       THEN CAST(90 + (CAST('0x' || substr(md5(concat('h:', fp)), 1, 15) AS BIGINT) % 990) AS INTEGER)
        |       END AS height,
        |  CASE WHEN media_type <> 'image'
        |       THEN 1000 + (CAST('0x' || substr(md5(concat('d:', fp)), 1, 15) AS BIGINT) % 600000)
        |       END AS duration_ms
        |FROM m
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      withContainers(media(s, d))
        .withColumn("meta",
          // gate on the modality so an adversarial text payload that
          // happens to start with a container signature can never
          // surface as an "image" (mirrors the oracle's CASE exactly)
          when(col("media_type") === "image", imageMetaCol(col("packed"))))
        .select(
          col("doc_id"), col("media_type"),
          length(col("content")).as("byte_len"), col("fp"),
          col("meta.format").as("format"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          when(col("media_type") === "audio",
            wavMetaCol(col("packed")).getField("duration_ms"))
            .when(col("media_type") === "video",
              lit(1000) + h60(concat(lit("d:"), col("fp"))) % 600000)
            .as("duration_ms"))
        .orderBy("doc_id")
    },

    // --- q62: frame sampling — split each payload into 4 equal-size
    // "frames" (the video-frame / audio-segment sampling pattern) and
    // fingerprint each. Chunking is pure integer arithmetic on the
    // payload, so the oracle replays it; the real decode stays stubbed.
    Q(
      "q62_frame_sample",
      """SELECT doc_id, CAST(pos AS INTEGER) AS pos,
        |  CAST(clen AS INTEGER) AS frame_len,
        |  md5(substr(text, CAST(pos * clen + 1 AS INTEGER), CAST(clen AS INTEGER))) AS frame_fp
        |FROM (
        |  SELECT doc_id, text, len(text) // 4 AS clen FROM documents
        |), (SELECT unnest(range(0, 4)) AS pos)
        |ORDER BY doc_id, pos""".stripMargin
    ) { (s, d) =>
      documents(s, d)
        .withColumn("clen", expr("length(text) div 4"))
        .withColumn("pos", explode(sequence(lit(0), lit(3))))
        .select(
          col("doc_id"), col("pos"), col("clen").cast("int").as("frame_len"),
          md5(expr("substring(text, pos * clen + 1, clen)")).as("frame_fp"))
        .orderBy("doc_id", "pos")
    },

    // --- q61: feature aggregation per modality. The expression-side
    // fake feature mirrors the stubDecode idea (hash-derived, exact) so
    // the oracle can replay it; the mapPartitions path is unit-tested.
    // Image rows additionally aggregate the NATIVELY PARSED container
    // width (`image_meta` over the constructed header) — the oracle
    // derives the same number arithmetically, so the parse is in the
    // hash gate here too.
    Q(
      "q61_multimodal_features",
      """WITH m AS (
        |  SELECT doc_id,
        |    (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
        |    octet_length(encode(text)) AS byte_len,
        |    (CAST('0x' || substr(md5(concat('f0:', md5(text))), 1, 15) AS BIGINT) % 1000) / 1000.0 AS f0,
        |    160 + (CAST('0x' || substr(md5(concat('w:', md5(text))), 1, 15) AS BIGINT) % 1760) AS w
        |  FROM documents
        |)
        |SELECT media_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(byte_len AS DECIMAL(38,6))) AS DOUBLE) / COUNT(byte_len) AS avg_bytes,
        |  CAST(SUM(CAST(f0 AS DECIMAL(38,6))) AS DOUBLE) / COUNT(f0) AS avg_f0,
        |  CASE WHEN media_type = 'image'
        |       THEN CAST(SUM(CAST(w AS DECIMAL(38,6))) AS DOUBLE) / COUNT(w)
        |       END AS avg_width
        |FROM m GROUP BY media_type
        |ORDER BY media_type""".stripMargin
    ) { (s, d) =>
      withContainers(media(s, d))
        .select(
          col("media_type"),
          length(col("content")).as("byte_len"),
          (h60(concat(lit("f0:"), col("fp"))) % 1000 / lit(1000.0)).as("f0"),
          when(col("media_type") === "image",
            imageMetaCol(col("packed")).getField("width")).as("w"))
        .groupBy("media_type")
        .agg(
          count(lit(1)).as("cnt"),
          davg(col("byte_len")).as("avg_bytes"),
          davg(col("f0")).as("avg_f0"),
          davg(col("w")).as("avg_width"))
        .orderBy("media_type")
    }
  )
}
