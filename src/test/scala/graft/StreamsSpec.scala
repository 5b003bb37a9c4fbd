package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams
import graft.streaming.Streams.Reading

class StreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window aggregates by event time and drops late data") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Reading]
    val q = Streams.tumblingStats(mem.toDF(), "1 minute", "2 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(
        Reading("M1", "temperature", 10.0, ts("2024-01-01 00:00:10")),
        Reading("M1", "temperature", 20.0, ts("2024-01-01 00:00:40")),
        Reading("M2", "pressure", 5.0, ts("2024-01-01 00:01:10")))
      q.processAllAvailable()
      // advance watermark far past the first window, then emit a late row
      mem.addData(Reading("M3", "vibration", 1.0, ts("2024-01-01 00:30:00")))
      q.processAllAvailable()
      mem.addData(Reading("M1", "temperature", 99.0, ts("2024-01-01 00:00:50"))) // late
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .selectExpr("machine_id", "sensor", "n", "avg_reading").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows.contains(("M1", "temperature", 2L, 15.0))) // late 99.0 NOT applied
      assert(!rows.exists { case (m, _, _, avg) => m == "M1" && avg > 15.0 })
      assert(rows.contains(("M2", "pressure", 1L, 5.0)))
    } finally q.stop()
  }

  test("Avro wire roundtrip on the stream quarantines corrupt frames (R3/R6)") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    val mem = MemoryStream[Reading]
    val wire = Streams.toWire(mem.toDF())
    // corrupt M2's frames in flight (magic byte smashed)
    val tampered = wire.withColumn("value",
      when(col("key") === "M2",
        expr("concat(X'09', substring(value, 2, length(value) - 1))"))
        .otherwise(col("value")))
    val q = Streams.fromWire(tampered)
      .writeStream.format("memory").queryName("wire_rt")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Reading("M1", "temperature", 21.5, ts("2024-01-01 00:00:10")),
        Reading("M2", "pressure", 3.25, ts("2024-01-01 00:00:20")))
      q.processAllAvailable()
      val rows = spark.table("wire_rt")
        .selectExpr("machine_id", "sensor", "reading", "decode_ok").collect()
        .map(r => (r.getString(0), r.getString(1),
          if (r.isNullAt(2)) null else r.getDouble(2), r.getBoolean(3))).toSet
      assert(rows === Set(
        ("M1", "temperature", 21.5, true),
        (null, null, null, false))) // M2 quarantined, not dropped
    } finally q.stop()
  }

  test("stream-stream interval join matches alerts within the bounded window") {
    implicit val sq = spark.sqlContext
    val rmem = MemoryStream[Reading]
    val amem = MemoryStream[Streams.Alert]
    val q = Streams.readingsWithAlerts(rmem.toDF(), amem.toDF())
      .writeStream.format("memory").queryName("rd_alerts")
      .outputMode(OutputMode.Append).start()
    try {
      amem.addData(
        Streams.Alert("M1", "warn", ts("2024-01-01 00:01:00")),
        Streams.Alert("M2", "crit", ts("2024-01-01 00:01:00")))
      rmem.addData(
        Reading("M1", "temperature", 10.0, ts("2024-01-01 00:01:30")), // in window
        Reading("M1", "temperature", 11.0, ts("2024-01-01 00:03:00")), // past 1 min
        Reading("M1", "temperature", 12.0, ts("2024-01-01 00:00:30")), // before alert
        Reading("M2", "pressure", 5.0, ts("2024-01-01 00:02:00")))     // boundary: == +1 min
      q.processAllAvailable()
      val rows = spark.table("rd_alerts")
        .selectExpr("machine_id", "reading", "alert_level").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
      assert(rows === Set(
        ("M1", 10.0, "warn"),
        ("M2", 5.0, "crit")))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched readings once the watermark closes them") {
    implicit val sq = spark.sqlContext
    val rmem = MemoryStream[Reading]
    val amem = MemoryStream[Streams.Alert]
    val q = Streams.readingsWithAlertsOuter(rmem.toDF(), amem.toDF(), "1 minute")
      .writeStream.format("memory").queryName("rd_alerts_outer")
      .outputMode(OutputMode.Append).start()
    try {
      amem.addData(Streams.Alert("M1", "warn", ts("2024-01-01 00:01:00")))
      rmem.addData(
        Reading("M1", "temperature", 10.0, ts("2024-01-01 00:01:30")), // matches
        Reading("M2", "pressure", 5.0, ts("2024-01-01 00:01:30")))    // no alert -> null row later
      q.processAllAvailable()
      // unmatched row is NOT emitted yet: a matching alert could still arrive
      val early = spark.table("rd_alerts_outer")
        .filter("machine_id = 'M2'").count()
      assert(early == 0, "outer row must wait for the watermark")
      // advance both watermarks past the join window; the held row closes
      amem.addData(Streams.Alert("M9", "info", ts("2024-01-01 00:30:00")))
      rmem.addData(Reading("M9", "vibration", 1.0, ts("2024-01-01 00:30:00")))
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = spark.table("rd_alerts_outer")
        .selectExpr("machine_id", "reading", "alert_level").collect()
        .map(r => (r.getString(0), r.getDouble(1), Option(r.getString(2)))).toSet
      assert(rows.contains(("M1", 10.0, Some("warn"))))
      assert(rows.contains(("M2", 5.0, None)),
        s"expected the null-padded outer row, got: $rows")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog and stops (batch backfill mode)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Reading]
    mem.addData(
      Reading("M1", "temperature", 10.0, ts("2024-01-01 00:00:10")),
      Reading("M2", "pressure", 5.0, ts("2024-01-01 00:01:10")))
    val out = "/tmp/graft_available_now"
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(rm); p.delete()
    }
    rm(new java.io.File(out))
    // AvailableNow = process everything present, checkpoint, terminate —
    // the scheduled-backfill trigger: same exactly-once sink, no
    // always-on cluster. awaitTermination returning (not timing out)
    // IS the semantics under test.
    val q = Streams.toParquetSink(mem.toDF(), s"$out/data", s"$out/ckpt",
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    assert(q.awaitTermination(60000), "AvailableNow query must self-terminate")
    val rows = spark.read.parquet(s"$out/data").count()
    assert(rows == 2, s"expected the full backlog drained, got $rows")
    rm(new java.io.File(out))
  }

  test("stream-static join enriches readings without streaming state") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Reading]
    val dim = Seq(("M1", "plant-a", 1.5), ("M2", "plant-b", 2.0))
      .toDF("machine_id", "site", "calibration")
    val q = Streams.enrichedReadings(mem.toDF(), dim)
      .selectExpr("machine_id", "site", "reading * calibration AS calibrated")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Reading("M1", "temperature", 10.0, ts("2024-01-01 00:00:10")),
        Reading("M2", "pressure", 4.0, ts("2024-01-01 00:00:20")),
        Reading("M9", "vibration", 7.0, ts("2024-01-01 00:00:30"))) // no dim row
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => (r.getString(0), Option(r.getString(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(rows === Set(
        ("M1", Some("plant-a"), Some(15.0)),
        ("M2", Some("plant-b"), Some(8.0)),
        ("M9", None, None))) // left join: unknown machine flows through
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-sensor stats across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Reading]
    val q = Streams.runningStats(mem.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(Reading("M1", "temperature", 10.0, ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      mem.addData(Reading("M1", "temperature", 30.0, ts("2024-01-01 00:00:01")))
      q.processAllAvailable()
      val last = spark.table("running")
        .filter("machine_id = 'M1'").orderBy("n").collect().last
      assert(last.getAs[Long]("n") === 2L)       // state survived the batch boundary
      assert(last.getAs[Double]("mean") === 20.0)
      assert(last.getAs[Double]("maxSeen") === 30.0)
    } finally q.stop()
  }

  test("checkpointed file->parquet pipeline is exactly-once across restart") {
    // the reference loses a failed batch AND commits its offsets
    // (SURVEY.md §2.3 B1); here the checkpoint must give no-loss,
    // no-duplicate delivery across a stop/restart boundary.
    val root = java.nio.file.Files.createTempDirectory("graft_eo").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    def write(machine: String, n: Int): Unit =
      Seq.tabulate(n)(i => (machine, "temperature", i.toDouble, ts("2024-01-01 00:00:01")))
        .toDF("machine_id", "sensor", "reading", "event_time")
        .write.mode("append").parquet(in)
    def run(): Unit = {
      val q = Streams.toParquetSink(Streams.fileReadings(spark, in), out, ckpt,
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
    }
    write("M1", 100); run()                     // first incarnation
    write("M2", 50); run()                      // restart from same checkpoint
    val sunk = spark.read.parquet(out)
    assert(sunk.count() === 150)                // no loss, no duplicates
    assert(sunk.filter("machine_id = 'M1'").count() === 100) // batch 1 not re-emitted
  }

  test("windowed aggregation state survives a checkpointed restart") {
    val root = java.nio.file.Files.createTempDirectory("graft_state").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    def write(rows: Seq[(String, String, Double, java.sql.Timestamp)]): Unit =
      rows.toDF("machine_id", "sensor", "reading", "event_time")
        .write.mode("append").parquet(in)
    def run(): Unit = {
      val agg = Streams.tumblingStats(Streams.fileReadings(spark, in), "1 minute", "5 minutes")
      val q = agg.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // incarnation 1: two readings in the 00:00 window — not emitted yet
    // (watermark hasn't passed the window end)
    write(Seq(("M1", "t", 10.0, ts("2024-01-01 00:00:10")),
              ("M1", "t", 30.0, ts("2024-01-01 00:00:40"))))
    run()
    // incarnation 2 (fresh query object, same checkpoint): late-window
    // data plus an event far enough ahead to close the 00:00 window.
    // The count=2/avg=20 state must have been recovered, not recomputed
    // from only the new file.
    write(Seq(("M1", "t", 99.0, ts("2024-01-01 00:30:00"))))
    run()
    val rows = spark.read.parquet(out)
      .selectExpr("machine_id", "n", "avg_reading").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.contains(("M1", 2L, 20.0)),
      s"expected recovered 2-row window state, got ${rows.toSeq}")
  }

  test("foreachBatch sink is idempotent per batch id") {
    val root = java.nio.file.Files.createTempDirectory("graft_fb").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    Seq(("M1", "t", 1.0, ts("2024-01-01 00:00:00")))
      .toDF("machine_id", "sensor", "reading", "event_time")
      .write.mode("append").parquet(in)
    val q = Streams.toForeachBatchSink(Streams.fileReadings(spark, in), out, ckpt,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()
    val sunk = spark.read.parquet(out)
    assert(sunk.count() === 1)
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("batch_id=")))
    // replayed batch (same batchId re-delivered after a crash-before-
    // commit): overwrites its own directory — still exactly 1 row
    val replay = spark.read.parquet(in)
    Streams.writeBatch(replay, 0L, out)
    Streams.writeBatch(replay, 0L, out)
    assert(spark.read.parquet(out).count() === 1)
  }

  test("ConservationListener tracks rows in = rows out (R14 counters)") {
    implicit val sq = spark.sqlContext
    val listener = new Streams.ConservationListener
    spark.streams.addListener(listener)
    val mem = MemoryStream[Reading]
    val q = mem.toDF().writeStream.format("memory").queryName("conserve")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Reading("M1", "temperature", 1.0, ts("2024-01-01 00:00:00")),
        Reading("M2", "pressure", 2.0, ts("2024-01-01 00:00:01")))
      q.processAllAvailable()
      assert(spark.table("conserve").count() === 2)
      assert(listener.totalIn === 2)
    } finally { q.stop(); spark.streams.removeListener(listener) }
  }

  test("streaming dedup drops at-least-once replays within the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Reading]
    val q = Streams.dedupReadings(mem.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Reading("M1", "temperature", 10.0, ts("2024-01-01 00:00:10")),
        Reading("M1", "temperature", 10.0, ts("2024-01-01 00:00:10")), // in-batch dup
        Reading("M2", "pressure", 5.0, ts("2024-01-01 00:00:20")))
      q.processAllAvailable()
      // cross-batch replay of the same record (at-least-once redelivery)
      mem.addData(Reading("M1", "temperature", 10.0, ts("2024-01-01 00:00:10")))
      q.processAllAvailable()
      assert(spark.table("dedup").count() === 2) // M1 once, M2 once
    } finally q.stop()
  }

  test("flatMapGroupsWithState closes sessions on in-data gaps and timeouts") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Reading]
    val q = Streams.closedSessions(mem.toDS(), gapMs = 30000, watermark = "10 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // burst 1 then burst 2 for M1 in ONE batch, > gap apart: the fold
      // must close burst 1 immediately (in-data gap path)
      mem.addData(
        Reading("M1", "t", 1.0, ts("2024-01-01 00:00:00")),
        Reading("M1", "t", 1.0, ts("2024-01-01 00:00:10")),
        Reading("M1", "t", 1.0, ts("2024-01-01 00:05:00")))
      q.processAllAvailable()
      val afterBatch1 = spark.table("sessions").as[Streams.ClosedSession].collect()
      assert(afterBatch1.toSeq === Seq(
        Streams.ClosedSession("M1", ts("2024-01-01 00:00:00").getTime,
          ts("2024-01-01 00:00:10").getTime, 2)))
      // another key far ahead advances the watermark past M1's open
      // session end + gap; the timeout fires on the following batch
      mem.addData(Reading("M2", "t", 1.0, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      mem.addData(Reading("M2", "t", 1.0, ts("2024-01-01 01:00:01")))
      q.processAllAvailable()
      val all = spark.table("sessions").as[Streams.ClosedSession].collect()
      assert(all.exists(s => s.machine_id == "M1" &&
        s.start_ms == ts("2024-01-01 00:05:00").getTime && s.n == 1),
        s"open M1 session not closed by event-time timeout: ${all.toSeq}")
    } finally q.stop()
  }

  test("rate-source readings conform to the sensor schema") {
    val df = Streams.rateReadings(spark, 10)
    assert(df.isStreaming)
    assert(df.columns.toSeq === Seq("machine_id", "sensor", "reading", "event_time"))
  }
}
