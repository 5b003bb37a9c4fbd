package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Sessions
import graft.streaming.Streams

/** End-to-end streaming throughput of the reference pipeline shape,
  * measured — the reference publishes only config-implied ceilings
  * (≈400 msg/s producer pacing, 500-row/1-s consumer flush;
  * BASELINE.md), so this is the matches-or-beats evidence.
  *
  * Two legs, each a checkpointed exactly-once streaming query drained
  * with Trigger.AvailableNow:
  *
  *   producer leg (R1→R3→R4): parquet landing dir → Confluent-framed
  *     Avro encode (codegen) → `wirelog` connector sink (task-staged
  *     parts, idempotent epoch commit);
  *   consumer leg (R5→R6→R10): `wirelog` source → Avro decode →
  *     quarantine filter → partitioned parquet sink.
  *
  * Prints one JSON line with rows/s per leg; exits nonzero if the
  * consumer output row count differs from the input (exactly-once
  * violated). Run with the build's --add-opens list (see
  * tools/scaling_curve.sh).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Files.createTempDirectory("streambench").toString
    val (src, wire, out) = (s"$base/src", s"$base/wire", s"$base/out")

    // synthetic readings, same shape as the reference producer's
    spark.range(n).select(
        concat(lit("M"), (col("id") % 3 + 1)).as("machine_id"),
        element_at(array(lit("temperature"), lit("pressure"), lit("vibration")),
          (col("id") % 3 + 1).cast("int")).as("sensor"),
        (col("id") * 1.5 + 0.25).as("reading"),
        timestamp_seconds(lit(1700000000L) + col("id") % 86400).as("event_time"))
      .repartition(cpus.toInt)
      .write.parquet(src)

    def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Double = {
      val t0 = System.nanoTime()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    // producer leg: land → encode → wirelog
    val prodSec = drain(
      Streams.toWire(Streams.fileReadings(spark, src))
        .writeStream.format("wirelog")
        .option("path", wire)
        .option("checkpointLocation", s"$base/chk-prod")
        .trigger(Trigger.AvailableNow())
        .start())

    // consumer leg: wirelog → decode → parquet
    val consSec = drain(
      Streams.toParquetSink(
        Streams.fromWire(spark.readStream.format("wirelog").load(wire))
          .filter(col("decode_ok"))
          .select("machine_id", "sensor", "reading", "event_time"),
        out, s"$base/chk-cons", Trigger.AvailableNow()))

    // warehouse leg (the reference's full lifecycle, both connectors
    // native): wirelog source → decode → ACID loglake sink, each epoch
    // one transactional commit — exactly-once carried by the table
    // format's txn log, not the engine
    val lake = s"$base/lake"
    val lakeSec = drain(
      Streams.fromWire(spark.readStream.format("wirelog").load(wire))
        .filter(col("decode_ok"))
        .select("machine_id", "sensor", "reading", "event_time")
        .writeStream.format("loglake")
        .option("path", lake)
        .option("checkpointLocation", s"$base/chk-lake")
        .trigger(Trigger.AvailableNow())
        .start())

    val got = spark.read.parquet(out).count()
    val lakeGot = spark.read.format("loglake").load(lake).count()
    println(s"""{"messages":$n,"produce_sec":$prodSec,"consume_sec":$consSec,""" +
      s""""lake_sec":$lakeSec,""" +
      s""""produce_rows_per_sec":${(n / prodSec).toLong},""" +
      s""""consume_rows_per_sec":${(n / consSec).toLong},""" +
      s""""lake_rows_per_sec":${(n / lakeSec).toLong},""" +
      s""""output_rows":$got,"lake_rows":$lakeGot,""" +
      s""""exactly_once":${got == n && lakeGot == n}}""")
    spark.stop()
    if (got != n || lakeGot != n) sys.exit(1)
  }
}
