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
}
