package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.pipeline.Pipeline
import graft.streaming.Streams
import graft.streaming.Streams.Reading

/** State-backend and observability checks:
  *
  * - RocksDB state store: the default HDFSBackedStateStoreProvider keeps
  *   every key in executor heap — fine for the 15-key demo, fatal for a
  *   100 TB stream with millions of keys. RocksDB spills state to local
  *   disk with incremental checkpointing; this spec proves the provider
  *   actually engages (rocksdb custom metrics in the query progress),
  *   not just that the conf was set.
  * - Batch `observe` quality gate: metrics ride the action's own scan.
  */
class StateStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed aggregation runs on the RocksDB state store provider") {
    val s2 = Sessions.derived(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sq = s2.sqlContext
    val mem = MemoryStream[Reading]
    val q = Streams.tumblingStats(mem.toDF(), "1 minute", "2 minutes")
      .writeStream.format("memory").queryName("rocksdb_tumbling")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(
        Reading("M1", "temperature", 10.0, ts("2024-01-01 00:00:10")),
        Reading("M1", "temperature", 20.0, ts("2024-01-01 00:00:40")),
        Reading("M2", "pressure", 5.0, ts("2024-01-01 00:01:10")))
      q.processAllAvailable()
      val rows = s2.table("rocksdb_tumbling")
        .selectExpr("machine_id", "n").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows.contains(("M1", 2L)), s"unexpected rows: $rows")

      val stateOps = q.lastProgress.stateOperators
      assert(stateOps.nonEmpty, "expected a stateful operator in progress")
      val metricNames = stateOps(0).customMetrics.keySet()
      assert(metricNames.toString.toLowerCase.contains("rocksdb"),
        s"expected rocksdb custom metrics, got: $metricNames")
    } finally q.stop()
  }

  test("transformWithState running stats accumulate across batches (RocksDB-backed)") {
    val s2 = Sessions.derived(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sq = s2.sqlContext
    val mem = MemoryStream[Reading]
    val q = Streams.runningStatsTws(mem.toDS())
      .writeStream.format("memory").queryName("tws_running")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(
        Reading("M1", "temperature", 10.0, ts("2024-01-01 00:00:10")),
        Reading("M1", "temperature", 30.0, ts("2024-01-01 00:00:20")))
      q.processAllAvailable()
      mem.addData(Reading("M1", "temperature", 20.0, ts("2024-01-01 00:00:30")))
      q.processAllAvailable()
      val last = s2.table("tws_running")
        .filter("machine_id = 'M1'").selectExpr("n", "mean", "maxSeen")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .maxBy(_._1)
      // state carried across batches: 3 readings total, mean 20, max 30
      assert(last == ((3L, 20.0, 30.0)), s"unexpected state: $last")
    } finally q.stop()
  }

  test("observe quality gate collects metrics during the action's own scan") {
    val (observed, obs) = Pipeline.observedReadings(
      Pipeline.sensorReadings(spark, sfDir))
    observed.write.mode("overwrite").format("noop").save()
    val m = obs.get
    val expected = Pipeline.sensorReadings(spark, sfDir).count()
    assert(m("n_rows") == expected, s"n_rows ${m("n_rows")} != $expected")
    assert(m("null_readings") == 0L)
    // events.value is non-negative in the generator; the gate would
    // catch a sign regression
    assert(m("negative_readings") == 0L)
    assert(m("min_ts").asInstanceOf[Double] <= m("max_ts").asInstanceOf[Double])
  }
}
