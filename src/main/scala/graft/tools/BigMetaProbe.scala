package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.Sessions
import graft.sources.{CheckpointParquet, LogLake}

/** The 10⁸-file planning probe (round 13): evidence that the LAZY /
  * DISTRIBUTED metadata path holds at the scale the eager driver map
  * cannot — a 1 PB table at 10 MB files, or 100 TB at 1 MB. The
  * fixture is the STEADY-STATE layout the engine itself writes at that
  * size: an n-part parquet checkpoint (10⁶ entries/part, aggregate
  * footers) plus a ≤10-commit manifest tail; manifests before the
  * checkpoint are irrelevant to planning and elided (retention would
  * have swept them). Measured per scale:
  *   - lazy plan construction (footers + tail only) — what
  *     `format("loglake")` pays before any scan;
  *   - the skipping JOB for a selective predicate
  *     ([[LogLake.pruneFilesDistributed]]) — survivors-only driver
  *     state;
  *   - driver heap across both.
  * Usage: `BigMetaProbe [nFiles...]` (default 1e8). */
object BigMetaProbe {

  private val schemaJson = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("k",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("v",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("p",
      org.apache.spark.sql.types.StringType))).json

  /** 1000 identity partitions — the canonical large-table layout. */
  private val NPart = 1000L

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def addIt(n: Long, from: Long, to: Long): Iterator[LogLake.AddFile] = {
    val perPart = math.max(1L, n / NPart)
    Iterator.range(from, to + 1).map { i =>
      val p = ((i - 1) / perPart).toString
      LogLake.AddFile(
        f"data/f-$i%016x.parquet", 1000,
        Map(
          "k" -> LogLake.ColStats("long", (i * 1000).toString,
            (i * 1000 + 999).toString, 0),
          // identity partition stats, exactly as the engine records
          "p" -> LogLake.ColStats("string", p, p, 0)),
        1048576L, partitionValues = Map("p" -> p))
    }
  }

  private def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"  $tag%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  private def usedMb(): Long = {
    System.gc(); Thread.sleep(200); System.gc()
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val scales =
      if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(100000000L)
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conf = new Configuration()
    scales.foreach { n =>
      val dir = Files.createTempDirectory(s"bigmeta-$n").toString + "/t"
      val log = Paths.get(dir, LogLake.LogDir)
      Files.createDirectories(log)
      println(s"== $n files (parquet parts + 3-commit tail)")
      val chkV = 100L
      val nParts = ((n + 999999L) / 1000000L).toInt
      t(s"craft $nParts-part parquet checkpoint") {
        // parts write in parallel — the engine's own writeCheckpoint
        // uses an 8-thread pool for exactly this
        val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
        try (1 to nParts).map { p =>
          pool.submit(new Runnable {
            override def run(): Unit = CheckpointParquet.write(conf,
              new Path(log.toString,
                if (nParts == 1) f"chk-$chkV%020d.parquet"
                else f"chk-$chkV%020d.p$p-of-$nParts.parquet"),
              LogLake.Checkpoint(chkV, if (p == 1) schemaJson else "",
                Nil, Map.empty),
              addIt(n, (p - 1).toLong * 1000000L + 1,
                math.min(n, p.toLong * 1000000L)),
              header = p == 1)
          })
        }.foreach(_.get()) finally pool.shutdown()
      }
      // a 3-commit tail ON TOP of the checkpoint (the steady state):
      // the checkpoint-version manifest + two appends
      (chkV to chkV + 2).foreach { v =>
        val adds = if (v == chkV) "" else
          s"""{"path":"data/t-$v.parquet","rows":1000,"bytes":1048576,""" +
            s""""pv":{"p":"0"},""" +
            s""""stats":{"k":{"t":"long","min":"0","max":"999","nulls":0},""" +
            s""""p":{"t":"string","min":"0","max":"0","nulls":0}}}"""
        val json = s"""{"version":$v,"op":"${if (v == chkV) "create" else "append"}",""" +
          s""""txnId":"","readVersion":${v - 1},"schema":"${esc(schemaJson)}",""" +
          s""""adds":[$adds],"removes":[]}"""
        Files.write(log.resolve(f"$v%020d.json"), json.getBytes("UTF-8"))
      }
      LogLake.setTableProperties(dir, Map(
        "loglake.planning.distributed" -> "true",
        "loglake.checkpoint.format" -> "parquet",
        "loglake.checkpoint.partSizeFiles" -> "1000000"))
      // identity partition spec — the canonical 100 TB layout
      Files.write(log.resolve("partition.json"), "[\"p\"]".getBytes("UTF-8"))
      val m0 = usedMb()
      // the skipping job: selective predicate, survivors-only driver
      LogLake.clearSnapshotCache()
      t("distributed prune k in [0, 5e6] (cold)")(println(
        f"  ${"  kept"}%-42s ${LogLake.pruneFiles(dir, "k", 0L, 5000000L)._1.size}%8d"))
      t("distributed prune again (no cache in play)")(
        LogLake.pruneFiles(dir, "k", 0L, 5000000L))
      // the lazy read plan end-to-end: relation + filtered listFiles
      LogLake.clearSnapshotCache()
      val assembles = LogLake.snapshotAssembles.get()
      t("lazy read plan + skipping job") {
        val df = spark.read
          .format("loglake").load(dir)
          .filter(org.apache.spark.sql.functions.col("k")
            .between(0L, 5000000L))
        // force planning-time listFiles without executing the scan
        // (the data files are synthetic paths)
        df.queryExecution.executedPlan.collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.relation.location.listFiles(Nil,
              Seq(org.apache.spark.sql.catalyst.expressions.And(
                org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
                  org.apache.spark.sql.catalyst.expressions.AttributeReference(
                    "k", org.apache.spark.sql.types.LongType)(),
                  org.apache.spark.sql.catalyst.expressions.Literal(0L)),
                org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
                  org.apache.spark.sql.catalyst.expressions.AttributeReference(
                    "k", org.apache.spark.sql.types.LongType)(),
                  org.apache.spark.sql.catalyst.expressions.Literal(5000000L)))))
        }.foreach(dirs =>
          println(f"  ${"  planned files"}%-42s ${dirs.map(_.files.length).sum}%8d"))
      }
      require(LogLake.snapshotAssembles.get() == assembles,
        "the lazy plan must not assemble state")
      val m1 = usedMb()
      println(f"  ${"driver heap across planning"}%-42s ${m1 - m0}%8d MB")
      println(f"  ${"snapshot assembles"}%-42s ${0}%8d")
      // checkpoint MAINTENANCE as a job: derive the next generation
      // (v+2's state = v's checkpoint + the 2-commit tail) on
      // executors — the write-side twin, still zero driver state
      val wrotes = LogLake.distributedCheckpointWrites.get()
      t("distributed checkpoint write (next gen)")(
        LogLake.forceCheckpoint(dir, chkV + 2))
      require(LogLake.distributedCheckpointWrites.get() > wrotes,
        "the distributed checkpoint writer must have engaged")
      require(LogLake.snapshotAssembles.get() == assembles,
        "the distributed checkpoint write must not assemble state")
      println(f"  ${"driver heap after chk write"}%-42s ${usedMb() - m0}%8d MB")

      // ---- round 14: the PARTITIONED lazy plan + distributed WRITE
      // discovery at the same scale ----
      import org.apache.spark.sql.functions.{col, lit}
      // partition-selective read: the tuple-admission job + the
      // skipping job, survivors = one partition's files
      LogLake.clearSnapshotCache()
      val a14 = LogLake.snapshotAssembles.get()
      t("partitioned lazy plan: p = '7' (tuple job + prune job)") {
        val df = spark.read.format("loglake").load(dir)
          .filter(col("p") === "7")
        df.queryExecution.executedPlan.collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.relation.location.listFiles(
              Seq(org.apache.spark.sql.catalyst.expressions.EqualTo(
                org.apache.spark.sql.catalyst.expressions.AttributeReference(
                  "p", org.apache.spark.sql.types.StringType)(),
                org.apache.spark.sql.catalyst.expressions.Literal(
                  org.apache.spark.unsafe.types.UTF8String.fromString("7"),
                  org.apache.spark.sql.types.StringType))), Nil)
        }.foreach(dirs =>
          println(f"  ${"  planned files (one partition)"}%-42s ${dirs.map(_.files.length).sum}%8d"))
      }
      require(LogLake.snapshotAssembles.get() == a14,
        "the partitioned lazy plan must not assemble state")
      println(f"  ${"driver heap after partitioned plan"}%-42s ${usedMb() - m0}%8d MB")
      // metadata-only partition DELETE: candidates via the stats job,
      // classification over candidates, whole files drop — zero data
      // read or written at any table size
      t("partition DELETE p = '3' (metadata-only, distributed discovery)") {
        LogLake.delete(spark, dir, col("p") === "3")
      }
      require(LogLake.snapshotAssembles.get() == a14,
        "distributed partition-delete discovery must not assemble state")
      println(f"  ${"driver heap after partition delete"}%-42s ${usedMb() - m0}%8d MB")
      // MERGE discovery: the source keys' envelope prunes candidates
      // as a job — a disjoint upsert proves no file can match without
      // the driver ever seeing the file list
      t("merge discovery, disjoint key envelope (insert-only)") {
        import spark.implicits._
        LogLake.merge(spark, dir,
          Seq((Long.MaxValue - 1L, "ins", "zz")).toDF("k", "v", "p"),
          keyCols = Seq("k"))
      }
      require(LogLake.snapshotAssembles.get() == a14,
        "distributed merge discovery must not assemble state")
      println(f"  ${"driver heap after merge discovery"}%-42s ${usedMb() - m0}%8d MB")

      // ---- round 15: VACUUM as a dataflow at the same scale ----
      // the synthetic state's paths exist only in metadata, so the
      // LISTING side is crafted: 10k orphan files in data/. The
      // expensive side is real either way — the keep-set job streams
      // all n AddFile names from the checkpoint parts through the
      // anti-join without the driver ever holding one.
      t("craft 10k orphan files") {
        val dd = Paths.get(dir, "data")
        Files.createDirectories(dd)
        (1 to 10000).foreach(i =>
          Files.write(dd.resolve(f"orph-$i%05d.parquet"),
            Array.emptyByteArray))
      }
      Thread.sleep(1500) // orphan mtimes must fall below the cutoff
      LogLake.clearSnapshotCache()
      val a15 = LogLake.snapshotAssembles.get()
      var swept = 0L
      t("vacuumJob (keep-set job + listing job + anti-join + delete)") {
        swept = LogLake.vacuumJob(spark, dir, olderThanMs = 0L)
      }
      require(swept >= 10000L, s"expected the 10k orphans swept, got $swept")
      require(LogLake.snapshotAssembles.get() == a15,
        "distributed vacuum must not assemble state")
      println(f"  ${"  swept"}%-42s $swept%8d")
      println(f"  ${"driver heap after vacuumJob"}%-42s ${usedMb() - m0}%8d MB")
      ()
    }
    spark.stop()
  }
}
