package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline

class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("epoch-double roundtrips through timestamp_seconds (R9)") {
    // fractional epoch seconds, including an out-of-order pair — the
    // reference tolerates unbounded lateness (SURVEY.md §2.2)
    val df = Seq(1700000000.25, 1700000001.5, 1699999999.0).toDF("t_stamp")
    val back = Pipeline.withEventTime(df)
      .select((unix_micros(col("event_time")) / 1000000.0).as("rt"), col("t_stamp"))
      .collect()
    back.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("sensorReadings has the reference wire schema") {
    val df = Pipeline.sensorReadings(spark, sfDir)
    assert(df.columns.toSeq === Seq("machine_id", "sensor", "reading", "t_stamp"))
    val row = df.head()
    assert(row.getString(0).startsWith("M"))
    assert(!row.isNullAt(3))
  }

  test("typed Dataset[PlcReading] view works at the ingest boundary") {
    val ds = graft.model.PlcReading.ds(Pipeline.sensorReadings(spark, sfDir))
    val r = ds.head()
    assert(Set("M1", "M2", "M3").contains(r.machine_id))
    assert(r.t_stamp > 1.7e9) // 2024 epoch seconds
    // typed filter + map still runs distributed
    assert(ds.filter(_.reading >= 0).count() === 1000)
  }

  test("appendSink writes machine-partitioned parquet (R10)") {
    val out = Files.createTempDirectory("graft_sink").toString + "/data"
    Pipeline.appendSink(Pipeline.sensorReadings(spark, sfDir), out)
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("machine_id="))
    assert(dirs.toSet === Set("machine_id=M1", "machine_id=M2", "machine_id=M3"))
    val back = spark.read.parquet(out)
    assert(back.count() === 1000) // sf0.001 events rows, none lost (no B1 bug)
  }

  test("upsertPartitions replaces only the partitions present in the update") {
    val out = Files.createTempDirectory("graft_upsert").toString + "/data"
    val all = Pipeline.sensorReadings(spark, sfDir)
    Pipeline.appendSink(all, out)
    // reprocess M1 only, readings doubled (a backfill correction)
    val fix = all.filter(col("machine_id") === "M1")
      .withColumn("reading", col("reading") * 2)
    Pipeline.upsertPartitions(fix, out)
    val back = spark.read.parquet(out)
    assert(back.count() === 1000) // M1 replaced 1:1, M2/M3 untouched
    val m1 = back.filter(col("machine_id") === "M1")
      .agg(org.apache.spark.sql.functions.sum("reading")).head().getDouble(0)
    val m1Orig = all.filter(col("machine_id") === "M1")
      .agg(org.apache.spark.sql.functions.sum("reading")).head().getDouble(0)
    assert(math.abs(m1 - 2 * m1Orig) < 1e-6)
    val m2 = back.filter(col("machine_id") === "M2").count()
    assert(m2 === all.filter(col("machine_id") === "M2").count())
  }

  test("compact merges small files without changing the data") {
    val out = Files.createTempDirectory("graft_compact").toString + "/data"
    val all = Pipeline.sensorReadings(spark, sfDir).cache()
    // simulate many micro-batch appends -> many small files; the hash
    // bucket is a true partition of the rows (the old double-mod filter
    // dropped rows whose reading*100 wasn't an exact multiple)
    (1 to 5).foreach { i =>
      Pipeline.appendSink(all.filter(pmod(hash(col("t_stamp")), lit(5)) === i - 1), out)
    }
    def dataFiles = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("machine_id="))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    val before = dataFiles
    val sumBefore = spark.read.parquet(out)
      .agg(org.apache.spark.sql.functions.sum("reading")).head().getDouble(0)
    Pipeline.compact(spark, out)
    assert(dataFiles < before)
    assert(dataFiles === 3) // one task per machine partition
    val after = spark.read.parquet(out)
    assert(after.count() === 1000)
    assert(math.abs(after.agg(org.apache.spark.sql.functions.sum("reading")).head().getDouble(0) - sumBefore) < 1e-9)
    all.unpersist()
  }
}
