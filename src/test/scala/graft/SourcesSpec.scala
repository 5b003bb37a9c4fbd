package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Det._
import graft.pipeline.Pipeline

/** File-format coverage beyond parquet: CSV and JSON sources round-trip
  * the sensor readings losslessly (doubles survive via shortest-repr
  * printing + exact parse).
  */
class SourcesSpec extends SparkTestBase {

  test("csv and json sources round-trip the readings exactly") {
    val df = Pipeline.sensorReadings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    df.write.option("header", "true").csv(s"$dir/csv")
    df.write.json(s"$dir/json")
    val csv = spark.read.option("header", "true").schema(df.schema).csv(s"$dir/csv")
    val json = spark.read.schema(df.schema).json(s"$dir/json")
    def fingerprint(x: DataFrame): (Long, Double, Double, Double) = (
      x.count(),
      x.select(dsum(col("reading"))).head().getDouble(0),
      x.select(dsum(col("t_stamp"))).head().getDouble(0),
      // string-sensitive term: any corruption of the text columns moves it
      x.select(dsum(h60(concat_ws("|", col("machine_id"), col("sensor"))) % 1000003))
        .head().getDouble(0))
    assert(fingerprint(csv) === fingerprint(df))
    assert(fingerprint(json) === fingerprint(df))
  }

  test("binaryFile source ingests opaque blobs with metadata (multimodal ingest path)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bin")
    val payloads = Map(
      "a.img" -> Array[Byte](1, 2, 3, 4, 5),
      "b.img" -> Array.tabulate(1024)(i => (i % 251).toByte),
      "skip.txt" -> Array[Byte](9))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(dir.resolve(name), bytes)
    }
    // binaryFile is how image/audio/video blobs enter the engine from a
    // raw object store (vs. the pre-packed binary columns in the
    // multimodal parquet): one row per file, content as a binary column.
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.img").load(dir.toString)
    assert(df.schema.fieldNames.toSet ===
      Set("path", "modificationTime", "length", "content"))
    val rows = df.select(col("path"), col("length"), col("content"))
      .collect().map(r => r.getString(0).split('/').last ->
        ((r.getLong(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    assert(rows.keySet === Set("a.img", "b.img")) // glob filtered .txt out
    assert(rows("a.img") === ((5L, payloads("a.img").toSeq)))
    assert(rows("b.img") === ((1024L, payloads("b.img").toSeq)))
    // and the blobs feed the standard multimodal feature path unchanged
    val decodeUdf = udf(graft.ops.Multimodal.stubDecode _)
    val feats = df.select(col("length"), decodeUdf(col("content")).as("f"))
      .collect()
    assert(feats.forall(r => r.getAs[Seq[Float]](1).head === r.getLong(0).toFloat))
  }

  test("partitioned parquet writes are partition-pruned on read") {
    val df = Pipeline.sensorReadings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    df.write.partitionBy("machine_id").parquet(s"$dir/part")
    val back = spark.read.parquet(s"$dir/part")
      .filter(col("machine_id") === "M1")
    val scan = back.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .get
    // the predicate must land in PartitionFilters (directory pruning —
    // the thing that turns a 100 TB scan into a 30 TB scan), not in
    // post-scan Filter
    assert(scan.partitionFilters.map(_.toString).exists(_.contains("machine_id")))
    assert(scan.selectedPartitions.partitionCount === 1)
    assert(back.count() === df.filter(col("machine_id") === "M1").count())
  }

  test("orc source round-trips the readings exactly (columnar alternative)") {
    val df = Pipeline.sensorReadings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    df.write.orc(s"$dir/orc")
    val orc = spark.read.orc(s"$dir/orc")
    assert(orc.schema === df.schema) // ORC keeps types natively (no re-parse)
    assert(orc.count() === df.count())
    assert(orc.exceptAll(df).isEmpty && df.exceptAll(orc).isEmpty)
  }
}
