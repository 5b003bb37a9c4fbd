package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.model.Tables
import graft.functions.Det._

/** Batch analog of the reference's whole dataflow (SURVEY.md §2.1 R1–R10):
  * source → project to the `{machine_id, sensor, reading, t_stamp}` shape
  * (`/root/reference/schema/schema.avsc:5-10`) → epoch-double → timestamp
  * conversion (the reference's single scalar transform,
  * `/root/reference/consumer/sensor_data_consumer.py:131-134`) → append
  * sink / aggregation. The streaming form lives in
  * [[graft.streaming.Streams]]; this batch form is what the DuckDB oracle
  * can check.
  */
object Pipeline {

  /** `events` projected onto the reference's sensor-reading schema:
    * user→machine, event_type→sensor, value→reading, ts→epoch-seconds
    * double (exactly how the reference producer emits `time.time()`,
    * `/root/reference/producer/sensor_data_producer.py:53-59`).
    */
  def sensorReadings(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      concat(lit("M"), (col("user_id") % 3) + 1).as("machine_id"),
      col("event_type").as("sensor"),
      col("value").as("reading"),
      (unix_micros(col("ts")) / lit(1000000.0)).as("t_stamp"))

  /** R9: the reference's epoch-double → TimestampType conversion
    * (`datetime.fromtimestamp` ↦ `timestamp_seconds`, UTC session). */
  def withEventTime(readings: DataFrame): DataFrame =
    readings.withColumn("event_time", timestamp_seconds(col("t_stamp")))

  /** R10 batch sink: append to parquet, partitioned by machine so a
    * 100 TB history prunes on the hot key. */
  def appendSink(readings: DataFrame, path: String): Unit =
    withEventTime(readings)
      .write.mode("append").partitionBy("machine_id").parquet(path)

  /** Partition-level upsert without a transaction log: dynamic
    * partition overwrite replaces ONLY the partitions present in
    * `updates` and leaves every other partition untouched — the
    * idempotent reprocess/backfill primitive for a parquet lake when a
    * Delta/Iceberg jar isn't available. (Static overwrite mode — the
    * default — would truncate the whole table first.)
    */
  def upsertPartitions(updates: DataFrame, path: String): Unit =
    withEventTime(updates)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("machine_id").parquet(path)

  /** Small-file compaction for a partitioned parquet table — the
    * maintenance job every long-lived streaming sink needs: micro-batch
    * appends accumulate tiny files; this rewrites each partition's data
    * clustered and bounded per file. Reads with partition discovery,
    * repartitions BY the partition column (so each output task writes
    * into exactly one partition directory instead of every task
    * spraying a file into every partition), and rewrites via dynamic
    * overwrite of a disk-backed cached snapshot (job-scale tables; a
    * warehouse-scale compactor writes to a staging path and swaps, the
    * same plan shape).
    */
  def compact(spark: SparkSession, path: String,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val snapshot = spark.read.parquet(path).cache()
    snapshot.count() // materialize before overwriting the source dir
    try snapshot
      .repartition(col("machine_id"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .partitionBy("machine_id").parquet(path)
    finally snapshot.unpersist()
  }

  /** Batch data-quality gate via `observe`: row count, null/out-of-range
    * tallies, and the timestamp span are collected as AccumulatorV2
    * side-outputs DURING whatever action the caller runs — zero extra
    * passes over the data, which is the only affordable way to audit a
    * 100 TB write (a separate validation query would double the scan).
    * Batch counterpart of the streaming `ConservationListener` (R11–R14
    * monitoring). Read the metrics from the returned Observation AFTER
    * an action: `obs.get("n_rows")`.
    */
  def observedReadings(readings: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("quality")
    val observed = readings.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col("reading").isNull, 1L).otherwise(0L)).as("null_readings"),
      sum(when(col("reading") < 0.0, 1L).otherwise(0L)).as("negative_readings"),
      min("t_stamp").as("min_ts"),
      max("t_stamp").as("max_ts"))
    (observed, obs)
  }

  val all: Seq[Q] = Seq(
    // --- q23: the full pipeline as one oracle-checked batch query:
    // generate-shape projection (R7), epoch handling (R9), then the
    // "analytics" the reference's README promises: per machine/sensor
    // stats. machine_id/sensor form a 15-value keyspace → broadcastable
    // result at any scale; the agg is one map-side-partial shuffle.
    Q(
      "q23_pipeline_batch",
      """SELECT machine_id, sensor,
        |  COUNT(*) AS n_readings,
        |  CAST(SUM(CAST(reading AS DECIMAL(38,6))) AS DOUBLE) / COUNT(reading) AS avg_reading,
        |  MIN(reading) AS min_reading,
        |  MAX(reading) AS max_reading,
        |  MAX(t_stamp) AS last_seen
        |FROM (
        |  SELECT concat('M', CAST((user_id % 3) + 1 AS VARCHAR)) AS machine_id,
        |         event_type AS sensor,
        |         value AS reading,
        |         epoch_us(ts) / 1000000.0 AS t_stamp
        |  FROM events)
        |GROUP BY machine_id, sensor
        |ORDER BY machine_id, sensor""".stripMargin
    ) { (s, d) =>
      sensorReadings(s, d)
        .groupBy("machine_id", "sensor")
        .agg(
          count(lit(1)).as("n_readings"),
          davg(col("reading")).as("avg_reading"),
          min(col("reading")).as("min_reading"),
          max(col("reading")).as("max_reading"),
          max(col("t_stamp")).as("last_seen"))
        .orderBy("machine_id", "sensor")
    },

    // --- q76: the reference's Avro wire format, end to end (R3+R6):
    // project to the PLCData shape, serialize each row to
    // Confluent-framed Avro binary, deserialize it back, and aggregate
    // FROM THE DECODED STRUCT — any encode/decode defect changes the
    // sums and breaks the hash-match. `wire_bytes` additionally pins
    // the framing itself: the oracle recomputes the exact on-wire size
    // (5-byte Confluent header + zigzag-varint length prefixes + UTF-8
    // + 2×8-byte doubles) from the UTF-8 BYTE lengths
    // (octet_length(encode(…)) — character length() would undercount
    // non-ASCII values), so a framing bug
    // (wrong header width, wrong varint) surfaces as a byte-count
    // mismatch even when the roundtrip is value-correct. Encode and
    // decode are single codegen'd static calls in the scan's
    // whole-stage loop — this costs one narrow pass, no shuffle beyond
    // the 15-key aggregate.
    Q(
      "q76_avro_wire",
      s"""SELECT machine_id, sensor,
        |  CAST(COUNT(*) AS BIGINT) AS n_readings,
        |  ${oSum("reading")} AS sum_reading,
        |  MAX(t_stamp) AS last_seen,
        |  CAST(SUM(
        |    5 + (CASE WHEN octet_length(encode(machine_id)) < 64 THEN 1 ELSE 2 END)
        |      + octet_length(encode(machine_id))
        |      + (CASE WHEN octet_length(encode(sensor)) < 64 THEN 1 ELSE 2 END)
        |      + octet_length(encode(sensor)) + 16) AS BIGINT) AS wire_bytes
        |FROM (
        |  SELECT concat('M', CAST((user_id % 3) + 1 AS VARCHAR)) AS machine_id,
        |         event_type AS sensor,
        |         value AS reading,
        |         epoch_us(ts) / 1000000.0 AS t_stamp
        |  FROM events)
        |GROUP BY machine_id, sensor
        |ORDER BY machine_id, sensor""".stripMargin
    ) { (s, d) =>
      import graft.functions.Wire._
      val enc = sensorReadings(s, d).select(
        avroEncodePlc(col("machine_id"), col("sensor"),
          col("reading"), col("t_stamp")).as("rec"))
      val dec = enc.select(
        avroDecodePlc(col("rec")).as("r"),
        length(col("rec")).as("nbytes"))
      dec
        .groupBy(col("r.machine_id").as("machine_id"), col("r.sensor").as("sensor"))
        .agg(
          count(lit(1)).as("n_readings"),
          dsum(col("r.reading")).as("sum_reading"),
          max(col("r.t_stamp")).as("last_seen"),
          sum(col("nbytes").cast("long")).as("wire_bytes"))
        .orderBy("machine_id", "sensor")
    }
  )
}
