package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.WireLog
import graft.streaming.Streams

/** The custom `wirelog` DataSourceV2 connector — the R4/R5 capability
  * class (Kafka-shaped transport: keyed binary messages, offsets,
  * checkpointed exactly-once consume, coordinated idempotent produce)
  * without the absent kafka jar. The headline test runs the FULL
  * reference pipeline R1→R10 through it: produce Confluent-framed Avro
  * → wirelog source → decode (R6) → transform → re-encode (R3) →
  * wirelog sink, with a checkpoint restart in the middle proving no
  * loss and no duplication.
  */
class WireLogSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"wirelog-$name").toString

  /** Deterministic R1-style readings batch, ids in [from, until). */
  private def readings(from: Int, until: Int): DataFrame =
    spark.range(from, until).select(
      concat(lit("M"), (col("id") % 3 + 1)).as("machine_id"),
      element_at(array(lit("temperature"), lit("pressure"), lit("vibration")),
        (col("id") % 3 + 1).cast("int")).as("sensor"),
      (col("id") * 1.5 + 0.25).as("reading"),
      timestamp_seconds(lit(1700000000L) + col("id")).as("event_time"))

  /** Produce one wirelog segment holding the readings as wire messages. */
  private def produce(dir: String, df: DataFrame): Unit = {
    val recs = Streams.toWire(df).collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1))).toSeq
    WireLog.append(dir, recs)
  }

  private def decodeOut(outDir: String): DataFrame =
    Streams.fromWire(spark.read.format("wirelog").load(outDir))

  test("full R1-R10 pipeline through the connector, exactly-once across restart") {
    val in = tmp("in"); val out = tmp("out"); val chk = tmp("chk")

    def runPipeline(): Unit = {
      val wire = spark.readStream.format("wirelog").load(in)
      val decoded = Streams.fromWire(wire).filter(col("decode_ok"))
        .select("machine_id", "sensor", "reading", "event_time")
      val q = Streams.toWire(decoded).writeStream
        .format("wirelog").option("path", out)
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(!q.isActive, "pipeline query should drain and stop")
    }

    produce(in, readings(0, 500))
    produce(in, readings(500, 800))
    runPipeline()

    // restart from checkpoint with MORE data: only the new segment flows
    produce(in, readings(800, 1000))
    runPipeline()

    // restart with NOTHING new: no new output segments may appear
    val segsBefore = WireLog.listSegments(out).map(_._1)
    runPipeline()
    assert(WireLog.listSegments(out).map(_._1) == segsBefore,
      "an empty restart must not publish new segments")

    val got = decodeOut(out)
      .select(col("machine_id"), col("sensor"), col("reading"),
        unix_micros(col("event_time")).as("t"))
      .as[(String, String, Double, Long)].collect().sorted
    val want = readings(0, 1000)
      .select(col("machine_id"), col("sensor"), col("reading"),
        unix_micros(col("event_time")).as("t"))
      .as[(String, String, Double, Long)].collect().sorted
    assert(got.length == 1000, s"exactly-once: expected 1000 rows, got ${got.length}")
    assert(got.toSeq == want.toSeq, "decoded output must equal produced input")
  }

  test("source fans a batch out one partition per part file") {
    val in = tmp("fanout")
    produce(in, readings(0, 10))
    produce(in, readings(10, 20))
    val parts = spark.read.format("wirelog").load(in).rdd.getNumPartitions
    assert(parts == 2, s"two one-part segments should scan as 2 partitions, got $parts")
  }

  test("framing round-trips null keys and empty values") {
    val dir = tmp("frame")
    WireLog.append(dir, Seq((null, Array[Byte](1, 2, 3)), ("k", Array.empty[Byte])))
    val rows = spark.read.format("wirelog").load(dir)
      .select("key", "value").collect()
    assert(rows.length == 2)
    val byKey = rows.map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(byKey(null).toSeq == Seq[Byte](1, 2, 3))
    assert(byKey("k").isEmpty)
  }

  test("segment publish is idempotent (replayed epoch commit)") {
    val dir = tmp("idem")
    val f = WireLog.fs(dir)
    def stage(n: Int): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(dir, s"${WireLog.TmpDir}/s$n")
      val o = new java.io.DataOutputStream(f.create(p, true))
      WireLog.writeRecord(o, "k", Array[Byte](n.toByte)); o.close(); p
    }
    WireLog.publishSegment(f, dir, 1L, Seq(stage(1)), stamp = "w1:0")
    // same writer+epoch replays: must be a no-op
    WireLog.publishSegment(f, dir, 1L, Seq(stage(2)), stamp = "w1:0")
    val vals = spark.read.format("wirelog").load(dir)
      .select("value").collect().map(_.getAs[Array[Byte]](0).toSeq)
    assert(vals.toSeq == Seq(Seq[Byte](1)), "replayed publish must not duplicate or overwrite")
    // a DIFFERENT writer hitting the same segment number is data loss if
    // silently absorbed — it must fail loudly instead
    val e = intercept[java.io.IOException] {
      WireLog.publishSegment(f, dir, 1L, Seq(stage(3)), stamp = "w2:0")
    }
    assert(e.getMessage.contains("already committed"))
  }

  test("a publish retry after a crash mid-move self-heals") {
    val dir = tmp("crashmove")
    val f = WireLog.fs(dir)
    // simulate an attempt that died after moving a part in but BEFORE
    // the _COMMITTED marker: dir exists, part name taken, no marker
    val segPath = new org.apache.hadoop.fs.Path(dir, WireLog.segName(1))
    f.mkdirs(segPath)
    val stale = f.create(new org.apache.hadoop.fs.Path(segPath, "part-00000"), true)
    stale.write(Array[Byte](99)); stale.close()
    // the replayed epoch stages fresh files and must succeed, with ONLY
    // the fresh content visible
    val staged = new org.apache.hadoop.fs.Path(dir, s"${WireLog.TmpDir}/retry")
    val o = new java.io.DataOutputStream(f.create(staged, true))
    WireLog.writeRecord(o, "k", Array[Byte](1, 2)); o.close()
    WireLog.publishSegment(f, dir, 1L, Seq(staged), stamp = "w1:0")
    val vals = spark.read.format("wirelog").load(dir)
      .select("value").collect().map(_.getAs[Array[Byte]](0).toSeq)
    assert(vals.toSeq == Seq(Seq[Byte](1, 2)),
      "retry must replace the crashed attempt's stale parts")
  }

  test("sink epochs never collide with pre-existing segments") {
    val in = tmp("collide-in"); val out = tmp("collide-out")
    // out already holds a foreign segment (a demo append) at number 1 —
    // the old epochId+1 scheme would have silently dropped epoch 0 here
    WireLog.append(out, Seq(("pre", Array[Byte](9))))
    produce(in, readings(0, 100))
    val q = Streams.toWire(Streams.fromWire(
        spark.readStream.format("wirelog").load(in)).filter(col("decode_ok"))
        .select("machine_id", "sensor", "reading", "event_time"))
      .writeStream.format("wirelog").option("path", out)
      .option("checkpointLocation", tmp("collide-chk"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(decodeOut(out).filter(col("decode_ok")).count() == 100,
      "the epoch must land beside the foreign segment, not vanish into it")
    assert(WireLog.listSegments(out).map(_._1) == Seq(1L, 2L))
  }

  test("retention sweep deletes old segments; consumer groups are independent") {
    val in = tmp("retain")
    produce(in, readings(0, 10))    // seg 1
    produce(in, readings(10, 30))   // seg 2
    produce(in, readings(30, 60))   // seg 3

    def consume(chk: String, out: String): Long = {
      val q = spark.readStream.format("wirelog").load(in)
        .writeStream.format("wirelog").option("path", out)
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      spark.read.format("wirelog").load(out).count()
    }
    // group A consumes everything
    assert(consume(tmp("retain-chkA"), tmp("retain-outA")) == 60)
    // retention keeps only segment 3 (caller has established every
    // group's committed offset is >= 2)
    assert(WireLog.retentionSweep(in, through = 2L) == Seq(1L, 2L))
    assert(WireLog.listSegments(in).map(_._1) == Seq(3L))
    // a NEW group starts at the earliest RETAINED segment — Kafka's
    // auto.offset.reset=earliest after retention
    assert(consume(tmp("retain-chkB"), tmp("retain-outB")) == 30)
  }

  test("maxSegmentsPerTrigger drains a backlog in bounded batches, still exactly-once") {
    val in = tmp("admit-in"); val out = tmp("admit-out")
    produce(in, readings(0, 10))    // seg 1
    produce(in, readings(10, 30))   // seg 2
    produce(in, readings(30, 60))   // seg 3
    val q = spark.readStream.format("wirelog")
      .option("maxSegmentsPerTrigger", "1")
      .load(in)
      .writeStream.format("wirelog").option("path", out)
      .option("checkpointLocation", tmp("admit-chk"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(!q.isActive, "AvailableNow must drain the capped batches and stop")
    // one admitted input segment per epoch → one output segment each
    assert(WireLog.listSegments(out).size == 3,
      "a 3-segment backlog under maxSegmentsPerTrigger=1 must take 3 batches")
    assert(spark.read.format("wirelog").load(out).count() == 60)
  }

  test("maxBytesPerTrigger drains a fat-segment backlog bounded by volume, still exactly-once") {
    val in = tmp("bytecap-in"); val out = tmp("bytecap-out")
    // heterogeneous segment sizes: one fat bulk segment among small
    // epochs — the skew a count-based cap cannot bound
    produce(in, readings(0, 5))      // seg 1: small
    produce(in, readings(5, 505))    // seg 2: fat (~100× seg 1)
    produce(in, readings(505, 510))  // seg 3: small
    produce(in, readings(510, 515))  // seg 4: small
    val f = WireLog.fs(in)
    val segBytes = WireLog.listSegments(in).map { case (n, p) =>
      n -> WireLog.listParts(f, p).map(f.getFileStatus(_).getLen).sum
    }.toMap
    // cap: fits both small neighbours together, but never a small + the
    // fat one — so the drain must split around the fat segment, which
    // itself exceeds the cap and must still be admitted (alone) rather
    // than wedge the stream
    val cap = segBytes(1L) + segBytes(3L) + 1
    assert(segBytes(2L) > cap, "fixture: the fat segment must exceed the cap")
    val q = spark.readStream.format("wirelog")
      .option("maxBytesPerTrigger", cap.toString)
      .load(in)
      .writeStream.format("wirelog").option("path", out)
      .option("checkpointLocation", tmp("bytecap-chk"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(!q.isActive, "AvailableNow must drain the capped batches and stop")
    // expected admission: [seg1] (fat seg2 won't fit beside it),
    // [seg2] (admitted alone despite exceeding the cap), [seg3, seg4]
    assert(WireLog.listSegments(out).size == 3,
      "the backlog must drain in 3 volume-bounded batches")
    assert(spark.read.format("wirelog").load(out).count() == 515)
  }

  test("publish ownership check retracts a rename that nested into a racing winner") {
    val dir = tmp("nestrace")
    val f = WireLog.fs(dir)
    // State the silent-drop race produces: the WINNER's committed segment
    // at the root (marker + foreign stamp), the LOSER's staging dir
    // nested inside it by rename-onto-existing-dir semantics. A bare
    // marker-existence check would report success here and drop the
    // loser's epoch.
    val segPath = new org.apache.hadoop.fs.Path(dir, WireLog.segName(1))
    f.mkdirs(new org.apache.hadoop.fs.Path(segPath, "seg-staging-loser"))
    val st = f.create(new org.apache.hadoop.fs.Path(segPath, WireLog.WriterStamp), true)
    st.write("winner:0".getBytes("UTF-8")); st.close()
    f.create(new org.apache.hadoop.fs.Path(segPath, WireLog.Committed), true).close()
    val e = intercept[java.io.IOException] {
      WireLog.verifyPublishOwnership(f, dir, 1L, "seg-staging-loser", "loser:0")
    }
    assert(e.getMessage.contains("retracted"))
    assert(!f.exists(new org.apache.hadoop.fs.Path(segPath, "seg-staging-loser")),
      "the loser's nested garbage must be cleaned out of the winner's segment")
    assert(f.exists(new org.apache.hadoop.fs.Path(segPath, WireLog.Committed)),
      "the winner's committed segment must be untouched")
    // and the state a clean publish produces passes the same check
    WireLog.verifyPublishOwnership(f, dir, 1L, "seg-staging-winner", "winner:0")
  }

  test("segment numbers are never reused after a full retention sweep") {
    val dir = tmp("noreuse")
    WireLog.append(dir, Seq(("a", Array[Byte](1))))  // seg 1
    WireLog.append(dir, Seq(("b", Array[Byte](2))))  // seg 2
    assert(WireLog.retentionSweep(dir, through = 2L) == Seq(1L, 2L))
    // reusing 1 would make the new data invisible to any consumer whose
    // checkpointed offset is already past it
    assert(WireLog.append(dir, Seq(("c", Array[Byte](3)))) == 3L)
    assert(WireLog.listSegments(dir).map(_._1) == Seq(3L))
  }

  test("a stray non-numeric seg- directory is ignored, not fatal") {
    val dir = tmp("stray")
    WireLog.append(dir, Seq(("a", Array[Byte](1))))
    WireLog.fs(dir).mkdirs(new org.apache.hadoop.fs.Path(dir, "seg-backup"))
    assert(WireLog.listSegments(dir).map(_._1) == Seq(1L))
    assert(spark.read.format("wirelog").load(dir).count() == 1)
  }

  test("batch write appends one segment per job") {
    val dir = tmp("batchwrite")
    def w(from: Int, until: Int): Unit =
      Streams.toWire(readings(from, until))
        .write.format("wirelog").option("path", dir).mode("append").save()
    w(0, 40)
    w(40, 100)
    assert(WireLog.listSegments(dir).map(_._1) == Seq(1L, 2L))
    val back = decodeOut(dir).filter(col("decode_ok"))
    assert(back.count() == 100)
    // composes with the demo append and the hwm: next number continues
    WireLog.append(dir, Seq(("k", Array[Byte](1))))
    assert(WireLog.listSegments(dir).map(_._1) == Seq(1L, 2L, 3L))
  }

  test("null value round-trips as a tombstone") {
    val dir = tmp("tomb")
    WireLog.append(dir, Seq(("k1", null), ("k2", Array[Byte](7))))
    val rows = spark.read.format("wirelog").load(dir)
      .select("key", "value").collect()
      .map(r => r.getString(0) -> Option(r.getAs[Array[Byte]](1)).map(_.toSeq)).toMap
    assert(rows == Map("k1" -> None, "k2" -> Some(Seq[Byte](7))))
  }

  test("a part file truncated mid-record fails the scan instead of dropping rows") {
    val dir = tmp("trunc")
    WireLog.append(dir, Seq(("k", Array.fill[Byte](100)(1))))
    val f = WireLog.fs(dir)
    val part = WireLog.listParts(f,
      new org.apache.hadoop.fs.Path(dir, WireLog.segName(1))).head
    // rewrite the part shorter than one whole record
    val bytes = {
      val in = f.open(part)
      val all = new Array[Byte](60); in.readFully(all); in.close(); all
    }
    val o = f.create(part, true); o.write(bytes); o.close()
    val e = intercept[Exception] {
      spark.read.format("wirelog").load(dir).count()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).take(8).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(messages.contains("mid-record"), s"expected truncation error, got: $messages")
  }
}
