package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming form of the reference pipeline (SURVEY.md §2.1
  * R1–R10) and the event-time operators the reference lacks (§2.2):
  * watermarked tumbling/sliding/session windows and keyed custom state.
  *
  * The reference's Kafka transport is connector-swappable: the
  * transforms below take any streaming DataFrame with the sensor schema
  * (`machine_id, sensor, reading, event_time`) — a Kafka source (jar not
  * shipped in this environment), the rate source used by the demo, or a
  * MemoryStream in tests. Checkpointing replaces the reference's manual
  * offset commit (`/root/reference/consumer/sensor_data_consumer.py:108`)
  * and removes its lose-batch-then-commit bug (SURVEY.md §2.3 B1).
  */
object Streams {

  /** R1/R2 analog: rate source → deterministic pseudo-random readings
    * (hash-mixed, not rand(): replayable under retries). */
  def rateReadings(spark: SparkSession, rowsPerSecond: Int = 1000): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .option("numPartitions", "4").load()
      .select(
        concat(lit("M"), (xxhash64(col("value")) % 3 + 3) % 3 + 1).as("machine_id"),
        element_at(
          array(lit("temperature"), lit("pressure"), lit("vibration")),
          (((xxhash64(col("value"), lit(1)) % 3) + 3) % 3 + 1).cast("int")).as("sensor"),
        (((xxhash64(col("value"), lit(2)) % 10000000L) + 10000000L) % 10000000L / 100000.0)
          .as("reading"),
        col("timestamp").as("event_time"))

  /** R3 on the stream: frame each reading as the reference's wire
    * message — a Confluent-framed Avro binary `value` (what the
    * producer hands Kafka,
    * `/root/reference/producer/sensor_data_producer.py:67-72`) plus the
    * machine id as the partition `key`. Pure codegen projection — the
    * codec adds no shuffle and no state to the stream. */
  def toWire(readings: DataFrame): DataFrame =
    readings.select(
      col("machine_id").as("key"),
      graft.functions.Wire.avroEncodePlc(
        col("machine_id"), col("sensor"), col("reading"),
        (unix_micros(col("event_time")) / lit(1000000.0))).as("value"))

  /** R6 on the stream: decode wire messages back to typed readings,
    * quarantining undecodable ones (the reference consumer's
    * try/except drop, `consumer/sensor_data_consumer.py:94-102` — but
    * kept observable as a `decode_ok=false` stream instead of a log
    * line). */
  def fromWire(wire: DataFrame): DataFrame =
    wire
      .withColumn("r", graft.functions.Wire.avroDecodePlc(col("value")))
      .select(
        col("r.machine_id").as("machine_id"),
        col("r.sensor").as("sensor"),
        col("r.reading").as("reading"),
        timestamp_seconds(col("r.t_stamp")).as("event_time"),
        col("r").isNotNull.as("decode_ok"))

  /** File-based streaming source over a parquet landing directory (the
    * connector-agnostic stand-in for the Kafka topic: files arriving =
    * messages arriving; offsets = file names, tracked in the
    * checkpoint). */
  def fileReadings(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "machine_id STRING, sensor STRING, reading DOUBLE, event_time TIMESTAMP"))
      .parquet(dir)

  /** R8+R10 analog: micro-batched append sink with checkpointing. The
    * reference's size-OR-time flush trigger maps to ProcessingTime +
    * the engine's own per-batch sizing; exactly-once to files. */
  def toParquetSink(readings: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    readings.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("machine_id")
      .trigger(trigger)
      .outputMode(OutputMode.Append)
      .start()

  /** R10 via foreachBatch — the pattern for sinks without native
    * transactional support (the reference's Postgres bulk-INSERT,
    * `/root/reference/consumer/sensor_data_consumer.py:124-145`):
    * each micro-batch lands under its batchId so a replayed batch
    * overwrites its own output instead of duplicating it
    * (at-least-once delivery + idempotent write = effectively-once).
    */
  /** The per-batch write: overwrite-by-batchId makes a replayed batch
    * land on its own output instead of duplicating (tested directly —
    * see StreamsSpec "replayed batch"). */
  def writeBatch(batch: DataFrame, batchId: Long, path: String): Unit =
    batch.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")

  def toForeachBatchSink(readings: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    readings.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, path)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Stream-static enrichment join: readings joined to a (small) static
    * dimension table — machine metadata, calibration constants. The
    * static side is broadcast, so each micro-batch joins map-side with
    * no shuffle of the stream and no streaming state; the static table
    * is re-resolved per batch, so a reloaded dimension snapshot is
    * picked up without restarting the query. Left join: an unknown
    * machine still flows through (nulls), never silently dropped.
    */
  def enrichedReadings(readings: DataFrame, machineDim: DataFrame): DataFrame =
    readings.join(broadcast(machineDim), Seq("machine_id"), "left")

  /** Stream-stream interval join: each reading is matched with the
    * alerts raised on the same machine within the preceding minute.
    * BOTH sides carry watermarks and the join condition bounds the
    * event-time distance in BOTH directions, so Spark derives a
    * retention bound for each side's join buffer and evicts state as
    * the watermark advances — an unbounded stream-stream buffer is the
    * classic always-on-pipeline OOM, and this is the shape that avoids
    * it. Inner join: unmatched rows on either side simply age out.
    */
  def readingsWithAlerts(readings: DataFrame, alerts: DataFrame,
      watermark: String = "2 minutes"): DataFrame =
    intervalJoin(readings, alerts, watermark, "inner")

  /** LEFT OUTER variant of [[readingsWithAlerts]]: every reading is
    * emitted, alert columns null when no alert landed in the window.
    * The outer semantics change WHEN rows can be produced: an unmatched
    * left row is held until the watermark proves no future right-side
    * match can arrive, THEN emitted with nulls — so outer results trail
    * the watermark by design (the join emits nothing "missing"; it
    * emits late-but-complete). Same two-sided time bound, same state
    * eviction.
    */
  def readingsWithAlertsOuter(readings: DataFrame, alerts: DataFrame,
      watermark: String = "2 minutes"): DataFrame =
    intervalJoin(readings, alerts, watermark, "left_outer")

  /** Shared interval-join core: one definition of the watermark wiring
    * and the two-sided time bound, so the inner and outer variants
    * cannot drift apart. */
  private def intervalJoin(readings: DataFrame, alerts: DataFrame,
      watermark: String, joinType: String): DataFrame =
    readings.withWatermark("event_time", watermark)
      .join(
        alerts.withWatermark("alert_time", watermark),
        col("machine_id") === col("alert_machine") &&
          col("event_time") >= col("alert_time") &&
          col("event_time") <= col("alert_time") + expr("INTERVAL 1 MINUTE"),
        joinType)
      .select("machine_id", "sensor", "reading", "event_time",
        "alert_level", "alert_time")

  /** Event-time tumbling window stats with late-data handling — the
    * watermark bounds state; the reference tolerated unbounded lateness
    * only because it never aggregated. */
  def tumblingStats(readings: DataFrame, window_ : String = "1 minute",
      watermark: String = "10 minutes"): DataFrame =
    readings
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_), col("machine_id"), col("sensor"))
      .agg(
        count(lit(1)).as("n"),
        avg("reading").as("avg_reading"),
        min("reading").as("min_reading"),
        max("reading").as("max_reading"))

  /** Sliding-window variant (overlapping windows). */
  def slidingStats(readings: DataFrame, window_ : String = "1 minute",
      slide: String = "20 seconds", watermark: String = "10 minutes"): DataFrame =
    readings
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_, slide), col("machine_id"))
      .agg(count(lit(1)).as("n"), avg("reading").as("avg_reading"))

  /** Session windows per machine (gap-based). */
  def sessionStats(readings: DataFrame, gap: String = "30 seconds",
      watermark: String = "10 minutes"): DataFrame =
    readings
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("machine_id"))
      .agg(count(lit(1)).as("n"))

  // ---- keyed custom state: running per-(machine,sensor) extremes ----

  final case class Reading(machine_id: String, sensor: String, reading: Double,
      event_time: java.sql.Timestamp)
  final case class Alert(alert_machine: String, alert_level: String,
      alert_time: java.sql.Timestamp)
  final case class SensorState(n: Long, sum: Double, maxSeen: Double)
  final case class SensorUpdate(machine_id: String, sensor: String, n: Long,
      mean: Double, maxSeen: Double)

  /** mapGroupsWithState: incremental running stats per sensor key —
    * state is O(1) per key regardless of stream length. */
  def runningStats(readings: Dataset[Reading]): Dataset[SensorUpdate] = {
    val spark = readings.sparkSession
    import spark.implicits._
    readings
      .groupByKey(r => (r.machine_id, r.sensor))
      .mapGroupsWithState[SensorState, SensorUpdate](GroupStateTimeout.NoTimeout) {
        case ((m, sen), rows, state: GroupState[SensorState]) =>
          val prev = state.getOption.getOrElse(SensorState(0L, 0.0, Double.MinValue))
          val next = rows.foldLeft(prev) { (st, r) =>
            SensorState(st.n + 1, st.sum + r.reading, math.max(st.maxSeen, r.reading))
          }
          state.update(next)
          SensorUpdate(m, sen, next.n, next.sum / next.n, next.maxSeen)
      }
  }

  /** transformWithState (Spark 4 arbitrary-state API) form of
    * [[runningStats]]: the same O(1)-per-key incremental stats, but on
    * the StatefulProcessor interface — typed `ValueState` handles with
    * per-state TTL support, timers decoupled from output mode, and a
    * RocksDB-only backend (the API refuses the heap provider), which is
    * the configuration a 100 TB keyed stream runs anyway. Kept alongside
    * the mapGroupsWithState form to cover both state APIs.
    */
  final class RunningStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[(String, String), Reading, SensorUpdate] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[SensorState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[SensorState]("sensorState",
        org.apache.spark.sql.Encoders.product[SensorState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: (String, String), rows: Iterator[Reading],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[SensorUpdate] = {
      val prev = Option(st.get()).getOrElse(SensorState(0L, 0.0, Double.MinValue))
      val next = rows.foldLeft(prev) { (s, r) =>
        SensorState(s.n + 1, s.sum + r.reading, math.max(s.maxSeen, r.reading))
      }
      st.update(next)
      Iterator.single(SensorUpdate(key._1, key._2, next.n, next.sum / next.n, next.maxSeen))
    }
  }

  def runningStatsTws(readings: Dataset[Reading]): Dataset[SensorUpdate] = {
    val spark = readings.sparkSession
    import spark.implicits._
    readings
      .groupByKey(r => (r.machine_id, r.sensor))
      .transformWithState(new RunningStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** Streaming exact dedup at ingest — the first stage of a
    * training-data pipeline: duplicate records (at-least-once replays,
    * duplicated source files) are dropped on their identity key, with
    * state bounded by the watermark instead of growing forever.
    * At 100 TB/day the watermark IS the feasibility condition: state
    * holds only keys newer than (max event time - watermark). */
  def dedupReadings(readings: DataFrame, watermark: String = "10 minutes"): DataFrame =
    readings
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("machine_id", "sensor", "event_time")

  final case class SessionState(start: Long, end: Long, n: Long)
  final case class ClosedSession(machine_id: String, start_ms: Long, end_ms: Long, n: Long)

  /** flatMapGroupsWithState with an event-time timeout: per-machine
    * sessions that CLOSE — each emitted row is a finished session
    * (start, end, count), produced either when in-stream data shows a
    * gap > `gapMs`, or when the watermark passes the open session's
    * end + gap (the timeout path). This is the arbitrary-stateful
    * complement of the built-in `session_window` aggregation: the state
    * is explicit (one open session per key), the output is append-only,
    * and eviction is watermark-driven. */
  def closedSessions(readings: Dataset[Reading], gapMs: Long = 30000,
      watermark: String = "10 seconds"): Dataset[ClosedSession] = {
    val spark = readings.sparkSession
    import spark.implicits._
    readings
      .withWatermark("event_time", watermark)
      .groupByKey(_.machine_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (m, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(m, s.start, s.end, s.n))
          } else {
            // fold sorted event times into the open session, closing on
            // every in-data gap > gapMs
            val times = rows.map(_.event_time.getTime).toArray.sorted
            var open = state.getOption.orNull
            val closed = Seq.newBuilder[ClosedSession]
            times.foreach { t =>
              open = open match {
                case null => SessionState(t, t, 1)
                case s if t - s.end <= gapMs => SessionState(s.start, t, s.n + 1)
                case s =>
                  closed += ClosedSession(m, s.start, s.end, s.n)
                  SessionState(t, t, 1)
              }
            }
            state.update(open)
            state.setTimeoutTimestamp(open.end + gapMs)
            closed.result().iterator
          }
      }
  }

  /** R14 analog (the reference's `total_msgs_received/flushed` counters,
    * `/root/reference/consumer/sensor_data_consumer.py:29-30,139-140`):
    * a StreamingQueryListener accumulating rows in/out per query — the
    * same conservation eyeball-invariant, engine-side and crash-safe.
    */
  final class ConservationListener extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val in = new java.util.concurrent.atomic.AtomicLong(0)
    private val out = new java.util.concurrent.atomic.AtomicLong(0)
    def totalIn: Long = in.get
    def totalOut: Long = out.get
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      in.addAndGet(e.progress.numInputRows)
      Option(e.progress.sink).foreach(s => out.addAndGet(math.max(0L, s.numOutputRows)))
    }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  }

  /** Demo main: rate source → sensor readings → windowed stats to
    * console + raw appends to parquet, for ~15 seconds. */
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/graft_stream_demo"
    val spark = graft.Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val readings = rateReadings(spark, 500)
    val sink = toParquetSink(readings, s"$out/data", s"$out/ckpt")
    val agg = tumblingStats(readings, "10 seconds", "30 seconds")
      .writeStream.format("console").outputMode(OutputMode.Update)
      .option("truncate", "false").trigger(Trigger.ProcessingTime("5 seconds")).start()
    sink.awaitTermination(15000)
    agg.stop(); sink.stop(); spark.stop()
  }
}
