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
