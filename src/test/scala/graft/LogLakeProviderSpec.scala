package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.sources.{LogLake, LogLakeSink, WireLog}
import graft.streaming.Streams

/** The `loglake` format registration: batch read through the native
  * parquet path with PLANNING-TIME file skipping (manifest stats →
  * FileIndex), SaveMode-mapped batch writes, and the streaming
  * source/sink pair whose offsets are table versions — including the
  * end-to-end loglake→loglake hop with exactly-once across restarts.
  */
class LogLakeProviderSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"loglakeprov-$name").toString + "/t"

  private def kv(pairs: (Long, String)*): DataFrame =
    pairs.toSeq.toDF("k", "v")

  private def sortedRows(df: DataFrame): Seq[(Long, String)] =
    df.select("k", "v").as[(Long, String)].collect().toSeq.sorted

  test("write SaveModes map onto transactional ops; read sees the snapshot; versionAsOf time-travels") {
    val dir = tmp("modes")
    // ErrorIfExists → create
    kv(1L -> "a").write.format("loglake").mode("errorifexists").save(dir)
    assert(LogLake.currentVersion(dir) == 1L)
    // Append → append
    kv(2L -> "b").write.format("loglake").mode("append").save(dir)
    assert(sortedRows(spark.read.format("loglake").load(dir)) ==
      Seq(1L -> "a", 2L -> "b"))
    // Overwrite → overwrite (serializable commit)
    kv(9L -> "z").write.format("loglake").mode("overwrite").save(dir)
    assert(sortedRows(spark.read.format("loglake").load(dir)) == Seq(9L -> "z"))
    // Ignore on an existing table is a no-op
    kv(7L -> "q").write.format("loglake").mode("ignore").save(dir)
    assert(LogLake.currentVersion(dir) == 3L)
    // ErrorIfExists on an existing table fails loudly
    val e = intercept[Exception] {
      kv(7L -> "q").write.format("loglake").mode("errorifexists").save(dir)
    }
    assert(e.getMessage.contains("already exists"))
    // time travel through the reader option
    assert(sortedRows(spark.read.format("loglake")
      .option("versionAsOf", "2").load(dir)) == Seq(1L -> "a", 2L -> "b"))
  }

  test("planning-time file skipping: the scan admits only stat-surviving files, parquet pushdown intact") {
    val dir = tmp("skip")
    // 8 disjoint-range files: range-partitioned on k so each file owns
    // a compact k-interval the manifest stats can separate
    val df = spark.range(0, 8000).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(8, col("k"))
    df.write.format("loglake").mode("errorifexists")
      .option("statsColumns", "k").save(dir)
    assert(LogLake.activeState(dir)._1.size == 8, "fixture: 8 data files")

    val read = spark.read.format("loglake").load(dir)
      .filter(col("k") >= 2500L && col("k") < 3500L)
    // execute THIS frame's plan so its scan metrics populate
    assert(read.collect().length == 1000)
    val scans = read.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.size == 1)
    val numFiles = scans.head.metrics("numFiles").value
    assert(numFiles >= 1 && numFiles <= 3,
      s"an interval spanning ≤2 of 8 range-partitioned files must skip " +
        s"the rest at planning time, scanned $numFiles")
    // the same predicate still reaches parquet for row-group pruning
    assert(scans.head.toString.contains("PushedFilters: ["),
      "parquet-level pushdown must survive the custom FileIndex")

    // and an unfiltered read sees every file
    val full = spark.read.format("loglake").load(dir)
    assert(full.count() == 8000)
  }

  test("manifest bytes drive planning: no filesystem stat per file") {
    val dir = tmp("bytes")
    kv(1L -> "a", 2L -> "b").write.format("loglake").mode("errorifexists").save(dir)
    val (files, _) = LogLake.activeState(dir)
    assert(files.forall(_.bytes > 0L),
      "writes must record data-file sizes in the manifest")
    val f = graft.sources.WireLog.fs(dir)
    files.foreach { a =>
      assert(a.bytes ==
        f.getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/${a.path}")).getLen)
    }
  }

  test("streaming loglake→loglake: versioned offsets, exactly-once across a second run") {
    val in = tmp("s-in"); val out = tmp("s-out"); val chk = tmp("s-chk")
    kv(1L -> "a", 2L -> "b").write.format("loglake").mode("append").save(in)

    def drain(): Unit = {
      val q = spark.readStream.format("loglake").load(in)
        .writeStream.format("loglake").option("path", out)
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      assert(!q.isActive)
    }
    drain()
    assert(sortedRows(spark.read.format("loglake").load(out)) ==
      Seq(1L -> "a", 2L -> "b"))
    // nothing new → the re-run must not duplicate (offsets checkpointed)
    drain()
    assert(spark.read.format("loglake").load(out).count() == 2)
    // two more committed versions drain incrementally
    kv(3L -> "c").write.format("loglake").mode("append").save(in)
    kv(4L -> "d").write.format("loglake").mode("append").save(in)
    drain()
    assert(sortedRows(spark.read.format("loglake").load(out)) ==
      Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
  }

  test("a rewriting commit fails the stream loudly; ignoreChanges re-emits instead; optimize is invisible") {
    val in = tmp("rw-in"); val out = tmp("rw-out"); val chk = tmp("rw-chk")
    kv(1L -> "a", 2L -> "b").write.format("loglake").mode("append").save(in)

    def drain(extra: Map[String, String] = Map.empty): Unit = {
      val reader = extra.foldLeft(spark.readStream.format("loglake")) {
        case (r, (k, v)) => r.option(k, v)
      }
      val q = reader.load(in)
        .writeStream.format("loglake").option("path", out)
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    drain()
    assert(spark.read.format("loglake").load(out).count() == 2)

    // OPTIMIZE between runs: layout-only, the stream must see nothing
    LogLake.optimize(spark, in, numFiles = 1)
    drain()
    assert(spark.read.format("loglake").load(out).count() == 2)

    // a MERGE rewrites files → append-only contract broken → loud stop
    LogLake.merge(spark, in, kv(1L -> "A2"), keyCols = Seq("k"))
    val e = intercept[StreamingQueryException] { drain() }
    assert(e.getCause.getMessage.contains("append-only"),
      s"got: ${e.getCause.getMessage}")

    // ignoreChanges: the stream proceeds, re-emitting rewritten files
    // (at-least-once — Delta's documented semantics for this switch)
    drain(Map("ignoreChanges" -> "true"))
    val rows = sortedRows(spark.read.format("loglake").load(out))
    assert(rows.contains(1L -> "A2"), "the merged row must arrive")
    assert(rows.size >= 3, "re-emitted rows are allowed, loss is not")
  }

  test("initialSnapshot reads through active deletion vectors — no resurrection, no OPTIMIZE needed") {
    val in = tmp("dv-in"); val out = tmp("dv-out"); val chk = tmp("dv-chk")
    kv(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d")
      .write.format("loglake").mode("append").save(in)
    // merge-on-read DELETE leaves a DV sidecar, zero files rewritten
    LogLake.delete(spark, in, col("k") === 2L, mor = true)
    // merge-on-read UPDATE masks the pre-image with a DV too
    LogLake.update(spark, in, col("k") === 3L, Map("v" -> lit("C2")), mor = true)
    assert(LogLake.activeState(in)._1.exists(_.dv.nonEmpty),
      "precondition: the snapshot must carry active deletion vectors")

    def drain(): Unit = {
      val q = spark.readStream.format("loglake")
        .option("initialSnapshot", "true").load(in)
        .writeStream.format("loglake").option("path", out)
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    drain()
    assert(sortedRows(spark.read.format("loglake").load(out)) ==
      Seq(1L -> "a", 3L -> "C2", 4L -> "d"),
      "snapshot must mask DV'd rows: k=2 deleted, k=3 shows the post-image only")
    // the tail still works on the same checkpoint after the DV snapshot
    kv(5L -> "e").write.format("loglake").mode("append").save(in)
    drain()
    assert(sortedRows(spark.read.format("loglake").load(out)) ==
      Seq(1L -> "a", 3L -> "C2", 4L -> "d", 5L -> "e"))
  }

  test("initialSnapshot plans its first batch as a job under distributed planning — zero assembles") {
    val in = tmp("lazysnap-in"); val out = tmp("lazysnap-out")
    val chk = tmp("lazysnap-chk")
    LogLake.createEmpty(in, kv(1L -> "x").schema)
    LogLake.setTableProperties(in, Map(
      "loglake.checkpoint.format" -> "parquet",
      "loglake.checkpoint.partSizeFiles" -> "4",
      "loglake.planning.distributed" -> "true"))
    (0 until 11).foreach(i => LogLake.append(spark, in, kv(i.toLong -> s"v$i")))
    // one MoR delete: the snapshot-seeded batch must stay job-planned
    // THROUGH the DV window (allowDvs), masking the dead row
    LogLake.delete(spark, in, col("k") === 3L, mor = true)
    LogLake.clearSnapshotCache()
    val before = LogLake.snapshotAssembles.get()
    val q = spark.readStream.format("loglake")
      .option("initialSnapshot", "true").load(in)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(LogLake.snapshotAssembles.get() == before,
      "the initialSnapshot batch must not assemble table state")
    assert(sortedRows(spark.read.parquet(out)) ==
      (0 until 11).filter(_ != 3).map(i => i.toLong -> s"v$i"),
      "the snapshot batch must carry the DV-masked state exactly")
  }

  test("the DV fallback relation prunes columns and pushes filters, not TableScan-everything") {
    val in = tmp("dvp-in")
    spark.range(0, 1000).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"), (col("id") % 7).as("w"))
      .write.format("loglake").mode("append").save(in)
    LogLake.delete(spark, in, col("k") === 500L, mor = true)

    val q = spark.read.format("loglake").load(in)
      .filter(col("k") >= 990L).select("v")
    assert(q.collect().map(_.getString(0)).sorted.toSeq ==
      (990 until 1000).map(i => s"v$i").sorted)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(k,990"),
      s"the filter must reach the relation:\n$plan")
    // batch CDF read prunes too
    val cdf = spark.read.format("loglake")
      .option("readChangeFeed", "true").option("startingVersion", "2").load(in)
      .filter(col("_change_type") === "delete").select("k")
    assert(cdf.as[Long].collect().toSeq == Seq(500L))
  }

  test("the DV fallback relation skips FILES by manifest stats, not just rows") {
    val in = tmp("dvskip")
    // 4 disjoint key-range commits = 4 files with disjoint k stats
    (0 until 4).foreach { i =>
      spark.range(i * 100L, i * 100L + 100L).coalesce(1)
        .select(col("id").as("k"), concat(lit("v"), col("id")).as("v"))
        .write.format("loglake").mode("append")
        .option("statsColumns", "k").save(in)
    }
    LogLake.delete(spark, in, col("k") === 150L, mor = true) // force DV path
    val rel = graft.sources.LogLakeProvider
      .relation(spark, in, Some(LogLake.currentVersion(in)))
      .asInstanceOf[graft.sources.LogLakeDvRelation]
    val total = LogLake.activeState(in)._1.size
    val q = spark.baseRelationToDataFrame(rel).filter(col("k") >= 300L)
    assert(q.count() == 100L)
    assert(rel.lastScanFiles == 1,
      s"stats skipping admitted ${rel.lastScanFiles} of $total files")
    // the DV'd file still masks its row when admitted
    val q2 = spark.baseRelationToDataFrame(rel).filter(col("k").between(100L, 199L))
    assert(q2.count() == 99L)
    assert(rel.lastScanFiles == 1)
  }

  test("a merge-on-read commit mid-stream: loud stop by default; ignoreChanges re-emits live rows, deletes stay masked") {
    val in = tmp("dvt-in"); val out = tmp("dvt-out"); val chk = tmp("dvt-chk")
    kv(1L -> "a", 2L -> "b", 3L -> "c").write.format("loglake").mode("append").save(in)

    def drain(extra: Map[String, String] = Map.empty): Unit = {
      val reader = extra.foldLeft(spark.readStream.format("loglake")) {
        case (r, (k, v)) => r.option(k, v)
      }
      val q = reader.load(in)
        .writeStream.format("loglake").option("path", out)
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    drain()
    assert(spark.read.format("loglake").load(out).count() == 3)

    // a DV DELETE lands mid-stream: append-only contract broken → loud stop
    LogLake.delete(spark, in, col("k") === 2L, mor = true)
    val e = intercept[StreamingQueryException] { drain() }
    assert(e.getCause.getMessage.contains("deletion"),
      s"got: ${e.getCause.getMessage}")

    // ignoreChanges: live rows of the touched files re-emit (at-least-
    // once), but the DELETED row must never arrive a second time
    drain(Map("ignoreChanges" -> "true"))
    val rows = sortedRows(spark.read.format("loglake").load(out))
    assert(rows.count(_ == (2L, "b")) == 1,
      s"k=2 was delivered pre-delete; the DV commit must not resurrect it again: $rows")
    assert(rows.count(_ == (1L, "a")) >= 1 && rows.count(_ == (3L, "c")) >= 1)
  }

  test("streaming change feed: every commit class arrives as row-level events, exactly-once across drains") {
    val in = tmp("cdf-in"); val out = tmp("cdf-out"); val chk = tmp("cdf-chk")
    kv(1L -> "a", 2L -> "b", 3L -> "c").write.format("loglake").mode("append").save(in) // v1
    kv(4L -> "d").write.format("loglake").mode("append").save(in)                        // v2

    def drain(): Unit = {
      val q = spark.readStream.format("loglake")
        .option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", "1").load(in)
        .writeStream.format("loglake").option("path", out)
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    drain()
    def changes(): Seq[(Long, String, String, Long)] =
      spark.read.format("loglake").load(out)
        .select("k", "v", "_change_type", "_commit_version")
        .as[(Long, String, String, Long)].collect().toSeq.sorted
    assert(changes() == Seq((1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
      (3L, "c", "insert", 1L), (4L, "d", "insert", 2L)))

    // a merge-on-read DELETE streams as a delete EVENT (no refusal, no
    // ignoreChanges) and an optimize commit emits nothing
    LogLake.delete(spark, in, col("k") === 2L, mor = true)                 // v3
    LogLake.optimize(spark, in, numFiles = 1)                              // v4
    LogLake.merge(spark, in, kv(3L -> "C2"), keyCols = Seq("k"))           // v5
    drain()
    val tail = changes().filter(_._4 >= 3L)
    assert(tail == Seq((2L, "b", "delete", 3L),
      (3L, "C2", "insert", 5L), (3L, "c", "delete", 5L)),
      s"got: $tail")
    // re-drain with nothing new: exactly-once holds
    drain()
    assert(changes().size == 7)
  }

  test("batch readChangeFeed option matches LogLake.changeFeed over the same range") {
    val in = tmp("cdfb-in")
    kv(1L -> "a", 2L -> "b").write.format("loglake").mode("append").save(in) // v1
    LogLake.delete(spark, in, col("k") === 1L, mor = true)                   // v2
    val viaFormat = spark.read.format("loglake")
      .option("readChangeFeed", "true").option("startingVersion", "2").load(in)
      .select("k", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSeq.sorted
    assert(viaFormat == Seq((1L, "a", "delete", 2L)))
    // CDF excludes ignoreChanges; missing startingVersion is loud
    intercept[IllegalArgumentException] {
      spark.read.format("loglake").option("readChangeFeed", "true").load(in).count()
    }
  }

  test("startingVersion skips history") {
    val in = tmp("sv-in"); val out = tmp("sv-out")
    kv(1L -> "a").write.format("loglake").mode("append").save(in)
    kv(2L -> "b").write.format("loglake").mode("append").save(in)
    // inclusive, as in Delta: start AT version 2 → v1's rows skipped
    val q = spark.readStream.format("loglake")
      .option("startingVersion", "2").load(in)
      .writeStream.format("loglake").option("path", out)
      .option("checkpointLocation", tmp("sv-chk"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(sortedRows(spark.read.format("loglake").load(out)) == Seq(2L -> "b"))
  }

  test("startingTimestamp resolves the commit clock: changes from that moment on") {
    val in = tmp("st-in"); val out = tmp("st-out")
    kv(1L -> "a").write.format("loglake").mode("append").save(in)
    kv(2L -> "b").write.format("loglake").mode("append").save(in)
    kv(3L -> "c").write.format("loglake").mode("append").save(in)
    val t2 = graft.sources.LogLake.commitTimestamp(in, 2L).getTime
    // exactly v2's commit time → v2 included (Delta's at-or-after rule)
    val q = spark.readStream.format("loglake")
      .option("startingTimestamp", t2.toString).load(in)
      .writeStream.format("loglake").option("path", out)
      .option("checkpointLocation", tmp("st-chk"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(sortedRows(spark.read.format("loglake").load(out)) ==
      Seq(2L -> "b", 3L -> "c"))
    // between v2 and v3 → only v3; both options together → loud
    val out2 = tmp("st-out2")
    val q2 = spark.readStream.format("loglake")
      .option("startingTimestamp", (t2 + 1L).toString).load(in)
      .writeStream.format("loglake").option("path", out2)
      .option("checkpointLocation", tmp("st-chk2"))
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    assert(sortedRows(spark.read.format("loglake").load(out2)) == Seq(3L -> "c"))
    val e = intercept[Exception] {
      spark.readStream.format("loglake")
        .option("startingTimestamp", t2.toString)
        .option("startingVersion", "2").load(in)
        .writeStream.format("noop").option("checkpointLocation", tmp("st-chk3"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination(120000)
    }
    assert(e.getMessage.contains("mutually exclusive") ||
      e.getCause != null && e.getCause.getMessage.contains("mutually exclusive"))
    // a timestamp past the last commit would never stream anything —
    // loud, Delta's rule, not a silently-empty stream
    val t3 = graft.sources.LogLake.commitTimestamp(in, 3L).getTime
    val late = intercept[Exception] {
      spark.readStream.format("loglake")
        .option("startingTimestamp", (t3 + 3600 * 1000L).toString).load(in)
        .writeStream.format("noop").option("checkpointLocation", tmp("st-chk4"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination(120000)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(late).exists(_.contains("after the table's last commit")),
      s"expected the beyond-last-commit rejection, got: ${msgs(late).mkString(" | ")}")
  }

  test("the reference pipeline ends in the warehouse: wirelog → decode → loglake, exactly-once, then batch analytics") {
    val in = tmp("e2e-in"); val lake = tmp("e2e-lake"); val chk = tmp("e2e-chk")

    def readings(from: Int, until: Int): DataFrame =
      spark.range(from, until).select(
        concat(lit("M"), (col("id") % 3 + 1)).as("machine_id"),
        element_at(array(lit("temperature"), lit("pressure"), lit("vibration")),
          (col("id") % 3 + 1).cast("int")).as("sensor"),
        (col("id") * 1.5 + 0.25).as("reading"),
        timestamp_seconds(lit(1700000000L) + col("id")).as("event_time"))

    def produce(df: DataFrame): Unit =
      WireLog.append(in, Streams.toWire(df).collect()
        .map(r => (r.getString(0), r.getAs[Array[Byte]](1))).toSeq)

    // Kafka-shaped log → Confluent-Avro decode → ACID warehouse table:
    // the reference's whole architecture (producer → Kafka → consumer →
    // Postgres), both hops exactly-once, landed as ONE streaming query
    def run(): Unit = {
      val q = Streams.fromWire(spark.readStream.format("wirelog").load(in))
        .filter(col("decode_ok"))
        .select("machine_id", "sensor", "reading", "event_time")
        .writeStream.format("loglake")
        .option("path", lake).option("checkpointLocation", chk)
        .option("statsColumns", "event_time")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      assert(!q.isActive)
    }

    produce(readings(0, 500))
    run()
    assert(spark.read.format("loglake").load(lake).count() == 500)
    produce(readings(500, 800))
    run()
    run() // idle restart: nothing new may land
    val warehouse = spark.read.format("loglake").load(lake)
    assert(warehouse.count() == 800, "no loss, no duplication across restarts")

    // batch analytics straight off the warehouse table must agree with
    // the ground truth computed from the pre-wire frame
    val got = warehouse.groupBy("sensor")
      .agg(count(lit(1)).as("n"), sum("reading").as("s"))
      .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
    val want = readings(0, 800).groupBy("sensor")
      .agg(count(lit(1)).as("n"), sum("reading").as("s"))
      .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g._3 - w._3) < 1e-6) }
  }

  test("mid-stream schema evolution stops the stream loudly; a restart adopts the new schema") {
    val in = tmp("evo-in"); val out = tmp("evo-out"); val chk = tmp("evo-chk")
    kv(1L -> "a", 2L -> "b").write.format("loglake").mode("append").save(in)

    // a LONG-RUNNING stream freezes the schema at ITS start — evolve
    // the table out from under it and the next batch must stop loudly
    // (a fresh run would re-freeze the evolved schema and never trip)
    val q = spark.readStream.format("loglake").load(in)
      .writeStream.format("loglake").option("path", out)
      .option("checkpointLocation", chk).start()
    val deadline = System.currentTimeMillis() + 60000
    while (LogLake.currentVersion(out) < 1L &&
      System.currentTimeMillis() < deadline) Thread.sleep(25)
    assert(spark.read.format("loglake").load(out).count() == 2)
    LogLake.append(spark, in,
      Seq((3L, "c", Some(7L))).toDF("k", "v", "extra")) // Option ⇒ nullable
    val e = intercept[StreamingQueryException] { q.awaitTermination(120000) }
    assert(e.getCause.getMessage.contains("restart the stream"),
      s"got: ${e.getCause.getMessage}")

    // the restart freezes the EVOLVED schema and reads the whole
    // history consistently (old rows surface the new column as NULL)
    val q2 = spark.readStream.format("loglake").load(in)
      .writeStream.format("loglake").option("path", out)
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val got = spark.read.format("loglake").load(out)
    assert(got.columns.toSet == Set("k", "v", "extra"))
    assert(got.count() == 3)
    assert(got.filter(col("extra").isNotNull).select("k").as[Long]
      .collect().toSeq == Seq(3L))
  }

  test("crash mid-pipeline: a paced wirelog→loglake stream stopped between epochs resumes exactly-once") {
    val in = tmp("crash-in"); val lake = tmp("crash-lake"); val chk = tmp("crash-chk")

    def readings(from: Int, until: Int): DataFrame =
      spark.range(from, until).select(
        concat(lit("M"), (col("id") % 3 + 1)).as("machine_id"),
        element_at(array(lit("temperature"), lit("pressure"), lit("vibration")),
          (col("id") % 3 + 1).cast("int")).as("sensor"),
        (col("id") * 1.5 + 0.25).as("reading"),
        timestamp_seconds(lit(1700000000L) + col("id")).as("event_time"))

    def produce(df: DataFrame): Unit =
      WireLog.append(in, Streams.toWire(df).collect()
        .map(r => (r.getString(0), r.getAs[Array[Byte]](1))).toSeq)

    def pipeline(paced: Boolean) = {
      val reader = spark.readStream.format("wirelog")
      val r = if (paced) reader.option("maxSegmentsPerTrigger", "1") else reader
      Streams.fromWire(r.load(in))
        .filter(col("decode_ok"))
        .select("machine_id", "sensor", "reading", "event_time")
        .writeStream.format("loglake")
        .option("path", lake).option("checkpointLocation", chk)
    }

    // three wire segments pending, paced one per epoch — then kill the
    // query the moment the SECOND table version lands, leaving the
    // third epoch dead in flight
    (0 until 3).foreach(i => produce(readings(i * 100, (i + 1) * 100)))
    val q1 = pipeline(paced = true).start()
    val deadline = System.currentTimeMillis() + 60000
    while (LogLake.currentVersion(lake) < 2 &&
      System.currentTimeMillis() < deadline) Thread.sleep(25)
    q1.stop()
    assert(LogLake.currentVersion(lake) >= 2, "fixture: crash after ≥2 commits")
    assert(spark.read.format("loglake").load(lake).count() <= 300,
      "the stop landed mid-stream")

    // more data arrives while the pipeline is down; the restart on the
    // SAME checkpoint must replay the dead epoch and drain the rest —
    // no loss, no duplication
    (3 until 6).foreach(i => produce(readings(i * 100, (i + 1) * 100)))
    val q2 = pipeline(paced = false).trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)

    val warehouse = spark.read.format("loglake").load(lake)
    assert(warehouse.count() == 600, "end state must equal the batch truth")
    val got = warehouse.groupBy("sensor")
      .agg(count(lit(1)).as("n"), sum("reading").as("s"))
      .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
    val want = readings(0, 600).groupBy("sensor")
      .agg(count(lit(1)).as("n"), sum("reading").as("s"))
      .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g._3 - w._3) < 1e-6) }
  }

  test("sink epoch replay is a no-op: the txn log carries exactly-once, not the engine") {
    val dir = tmp("replay")
    val sink = new LogLakeSink(dir, Nil, explicitId = Some("w1"), mode =
      org.apache.spark.sql.streaming.OutputMode.Append())
    sink.addBatch(0L, kv(1L -> "a"))
    val v = LogLake.currentVersion(dir)
    // the engine re-delivers the same epoch after a crash — different
    // bytes, same (writer, batch) identity
    sink.addBatch(0L, kv(1L -> "a"))
    assert(LogLake.currentVersion(dir) == v, "replayed epoch must not commit")
    assert(sortedRows(LogLake.snapshot(spark, dir)) == Seq(1L -> "a"))
    // the next epoch commits normally
    sink.addBatch(1L, kv(2L -> "b"))
    assert(sortedRows(LogLake.snapshot(spark, dir)) == Seq(1L -> "a", 2L -> "b"))
  }

  test("two conf-checkpointed streaming queries on one table keep distinct writer identities") {
    // Regression: when checkpointLocation is resolved from conf (so it
    // never reaches createSink's options), both sinks used to fall back
    // to MD5(table path) — the second query's epochs then carried the
    // first's txnIds and silently no-opped as replays.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val out = tmp("wid-out")
    spark.conf.set("spark.sql.streaming.checkpointLocation", tmp("wid-ck"))
    try {
      val s1 = MemoryStream[(Long, String)]
      val s2 = MemoryStream[(Long, String)]
      def start(s: MemoryStream[(Long, String)]) =
        s.toDF().toDF("k", "v").writeStream.format("loglake")
          .option("path", out).start() // NO checkpointLocation option
      val q1 = start(s1); val q2 = start(s2)
      try {
        s1.addData(1L -> "a"); q1.processAllAvailable()
        s2.addData(2L -> "b"); q2.processAllAvailable()
        s1.addData(3L -> "c"); q1.processAllAvailable()
        s2.addData(4L -> "d"); q2.processAllAvailable()
        assert(sortedRows(spark.read.format("loglake").load(out)) ==
          Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"),
          "every epoch of BOTH queries must land — shared writer ids " +
            "silently drop the second query's batches")
      } finally { q1.stop(); q2.stop() }
    } finally spark.conf.unset("spark.sql.streaming.checkpointLocation")
  }

  test("string stats pruning compares in UTF-8 byte order, not UTF-16 code units") {
    // Regression: '😀' (U+1F600) sorts ABOVE '\uE000' in UTF-8 bytes —
    // the order Spark used to compute the stored min/max and to
    // evaluate the filter — but BELOW it in UTF-16 code units (its
    // lead surrogate is 0xD83D). A code-unit compare pruned the file
    // that held the matching row.
    val dir = tmp("utf8")
    kv(1L -> "a").write.format("loglake").mode("append")
      .option("statsColumns", "v").save(dir)
    kv(2L -> "😀").write.format("loglake").mode("append")
      .option("statsColumns", "v").save(dir)
    assert(LogLake.activeState(dir)._1.size == 2, "fixture: 2 data files")
    val read = spark.read.format("loglake").load(dir)
      .filter(col("v") >= "\uE000")
    assert(sortedRows(read) == Seq(2L -> "😀"),
      "the supplementary-plane row matches the predicate and its file " +
        "must survive pruning")
  }

  test("Append on a table that appeared after the existence check retries as append") {
    val dir = tmp("race")
    kv(1L -> "a").write.format("loglake").mode("append").save(dir)
    // simulate the loser of a create race: the table exists, create
    // throws, and the fallback must land the rows as an append
    graft.sources.LogLakeProvider.appendCreating(spark, dir, kv(2L -> "b"), Nil)
    assert(sortedRows(spark.read.format("loglake").load(dir)) ==
      Seq(1L -> "a", 2L -> "b"))
  }

  test("a missing legacy data file fails loudly at planning, not silently as zero rows") {
    val dir = tmp("legacy")
    kv(1L -> "a", 2L -> "b").write.format("loglake").mode("append").save(dir)
    // age the manifest to the pre-`bytes` format, then delete the file:
    // the size fallback must throw, not contribute a 0-length split
    val logDir = java.nio.file.Paths.get(dir, LogLake.LogDir)
    val manifest = java.nio.file.Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json")).toSeq.head
    val aged = new String(java.nio.file.Files.readAllBytes(manifest), "UTF-8")
      .replaceAll(",\"bytes\":-?\\d+", "")
    java.nio.file.Files.write(manifest, aged.getBytes("UTF-8"))
    // drop the LocalFileSystem checksum sidecar the raw rewrite broke
    java.nio.file.Files.deleteIfExists(
      manifest.resolveSibling("." + manifest.getFileName.toString + ".crc"))
    val dataDir = java.nio.file.Paths.get(dir, LogLake.DataDir)
    java.nio.file.Files.list(dataDir).iterator().asScala.foreach(java.nio.file.Files.delete)
    // collect(), not count(): an unfiltered count() now answers
    // metadata-only from the manifest (by design, as Delta's does) and
    // never plans the scan this test exists to probe
    val e = intercept[java.io.IOException] {
      spark.read.format("loglake").load(dir).collect()
    }
    assert(e.getMessage.contains("missing"), s"got: ${e.getMessage}")
  }

  test("maxVersionsPerTrigger paces the stream one commit per batch, AvailableNow still drains fully") {
    val in = tmp("rate-in"); val out = tmp("rate-out"); val chk = tmp("rate-chk")
    kv(1L -> "a").write.format("loglake").mode("append").save(in)
    kv(2L -> "b").write.format("loglake").mode("append").save(in)
    kv(3L -> "c").write.format("loglake").mode("append").save(in)

    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("loglake")
      .option("maxVersionsPerTrigger", "1").load(in)
      .writeStream.option("checkpointLocation", chk)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val n = b.count()
        batchSizes.synchronized { batchSizes += n }
        b.write.format("loglake").mode("append").save(out); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(!q.isActive, "AvailableNow must terminate")
    // three pending commits × cap 1 → three one-row batches, no loss:
    // the source pins the run's end itself (Spark's generic wrapper
    // would have silently dropped the cap)
    assert(batchSizes.filter(_ > 0) == Seq(1L, 1L, 1L), s"got $batchSizes")
    assert(sortedRows(spark.read.format("loglake").load(out)) ==
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("maxBytesPerTrigger admits whole commits up to the declared add volume") {
    val in = tmp("byte-in"); val chk = tmp("byte-chk")
    kv(1L -> "a").write.format("loglake").mode("append").save(in)
    kv(2L -> "b").write.format("loglake").mode("append").save(in)
    kv(3L -> "c").write.format("loglake").mode("append").save(in)
    val batches = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("loglake")
      // one parquet file per commit is ~1 KB — a 1-byte cap forces the
      // one-commit-minimum rule every batch
      .option("maxBytesPerTrigger", "1").load(in)
      .writeStream.option("checkpointLocation", chk)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val n = b.count(); batches.synchronized { batches += n }; ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(batches.filter(_ > 0) == Seq(1L, 1L, 1L),
      s"a sub-file byte cap must still admit exactly one commit per batch, got $batches")
  }

  test("maxFilesPerTrigger splits one fat commit across batches, offsets resume mid-version") {
    val in = tmp("split-in"); val out = tmp("split-out"); val chk = tmp("split-chk")
    // ONE commit carrying six single-row files — the backfill shape a
    // whole-commit cap cannot pace
    def createSingleRowFiles(rows: Seq[(Long, String)], append: Boolean): Unit = {
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
      try {
        if (append) LogLake.append(spark, in, kv(rows: _*))
        else LogLake.create(spark, in, kv(rows: _*))
      } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    }
    createSingleRowFiles((1L to 6L).map(i => i -> s"v$i"), append = false)
    assert(LogLake.activeState(in)._1.size == 6)
    val batches = scala.collection.mutable.ArrayBuffer[Long]()
    def drain(cap: Int): Unit = {
      val q = spark.readStream.format("loglake")
        .option("maxFilesPerTrigger", cap.toString).load(in)
        .writeStream.option("checkpointLocation", chk)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val n = b.count(); batches.synchronized { batches += n }
          b.write.format("loglake").mode("append").save(out); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      assert(!q.isActive, "AvailableNow must terminate")
    }
    drain(4)
    // 6 files under cap 4 → [4, 2]: the second batch resumed from the
    // checkpointed MID-VERSION offset {"v":1,"i":4}
    assert(batches.filter(_ > 0) == Seq(4L, 2L), s"got $batches")
    // a later multi-file commit drains under the cap on restart, still
    // exactly-once end to end
    createSingleRowFiles((7L to 10L).map(i => i -> s"v$i"), append = true)
    batches.clear()
    drain(3)
    assert(batches.filter(_ > 0) == Seq(3L, 1L), s"got $batches")
    assert(sortedRows(spark.read.format("loglake").load(out)) ==
      (1L to 10L).map(i => i -> s"v$i"))
  }

  test("maxFilesPerTrigger paces a CDF stream: append commits split, rewrites stay whole") {
    val in = tmp("cdfsplit-in"); val chk = tmp("cdfsplit-chk")
    def createSingleRowFiles(rows: Seq[(Long, String)], append: Boolean): Unit = {
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
      try {
        if (append) LogLake.append(spark, in, kv(rows: _*))
        else LogLake.create(spark, in, kv(rows: _*))
      } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    }
    // ONE fat append-class commit carrying six single-row files
    createSingleRowFiles((1L to 6L).map(i => i -> s"v$i"), append = false)
    val batches = scala.collection.mutable.ArrayBuffer[Seq[(Long, String, Long)]]()
    def drain(cap: Int): Unit = {
      val q = spark.readStream.format("loglake")
        .option("readChangeFeed", "true").option("startingVersion", "1")
        .option("maxFilesPerTrigger", cap.toString).load(in)
        .writeStream.option("checkpointLocation", chk)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val rows = b.collect().map(r => (r.getAs[Long]("k"),
            r.getAs[String]("_change_type"),
            r.getAs[Long]("_commit_version"))).toSeq.sortBy(_._1)
          batches.synchronized { if (rows.nonEmpty) batches += rows }; ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      assert(!q.isActive, "AvailableNow must terminate")
    }
    drain(4)
    // 6 insert rows under cap 4 → [4, 2], all labeled insert @ v1; the
    // second batch resumed from the checkpointed mid-version offset
    assert(batches.map(_.size) == Seq(4, 2), s"got ${batches.map(_.size)}")
    assert(batches.flatten.map(_._1).sorted == (1L to 6L),
      "split CDF batches must cover the commit exactly once (add-file " +
        "order within the manifest, not key order)")
    assert(batches.flatten.forall(r => r._2 == "insert" && r._3 == 1L))
    // a DELETE (rewrite) plus another fat append: the delete's changes
    // arrive WHOLE (never split), the append splits under the cap
    LogLake.delete(spark, in, org.apache.spark.sql.functions.col("k") <= 2L)
    createSingleRowFiles((7L to 10L).map(i => i -> s"v$i"), append = true)
    batches.clear()
    drain(3)
    val flat = batches.flatten
    assert(flat.filter(_._2 == "delete").map(_._1) == Seq(1L, 2L),
      s"rewrite commit must deliver its deletes exactly once, got $flat")
    assert(flat.filter(_._2 == "insert").map(_._1).sorted == (7L to 10L),
      s"got $flat")
    // the delete's batch is not split below the commit boundary: no
    // batch mixes parts of the append beyond the cap
    assert(batches.forall(_.size <= 3 + 2), s"got ${batches.map(_.size)}")
  }

  test("initialSnapshot streams the current state first, then tails — history may contain rewrites") {
    val in = tmp("snap-in"); val out = tmp("snap-out"); val chk = tmp("snap-chk")
    kv(1L -> "a", 2L -> "b").write.format("loglake").mode("append").save(in)
    // a MERGE rewrites files: the from-version-1 replay would fail loudly
    LogLake.merge(spark, in, kv(1L -> "A"), keyCols = Seq("k"))

    def drain(): Unit = {
      val q = spark.readStream.format("loglake")
        .option("initialSnapshot", "true").load(in)
        .writeStream.format("loglake").option("path", out)
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    drain()
    assert(sortedRows(spark.read.format("loglake").load(out)) ==
      Seq(1L -> "A", 2L -> "b"),
      "first batch = the table's CURRENT state, merge applied")
    // a restart with nothing new must not re-deliver the snapshot
    drain()
    assert(spark.read.format("loglake").load(out).count() == 2)
    // post-snapshot appends tail incrementally
    kv(3L -> "c").write.format("loglake").mode("append").save(in)
    drain()
    assert(sortedRows(spark.read.format("loglake").load(out)) ==
      Seq(1L -> "A", 2L -> "b", 3L -> "c"))
  }
}
