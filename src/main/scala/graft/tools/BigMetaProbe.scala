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
      org.apache.spark.sql.types.StringType))).json

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def addIt(from: Long, to: Long): Iterator[LogLake.AddFile] =
    Iterator.range(from, to + 1).map(i => LogLake.AddFile(
      f"data/f-$i%016x.parquet", 1000,
      Map("k" -> LogLake.ColStats("long", (i * 1000).toString,
        (i * 1000 + 999).toString, 0)), 1048576L))

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
              addIt((p - 1).toLong * 1000000L + 1,
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
            s""""stats":{"k":{"t":"long","min":"0","max":"999","nulls":0}}}"""
        val json = s"""{"version":$v,"op":"${if (v == chkV) "create" else "append"}",""" +
          s""""txnId":"","readVersion":${v - 1},"schema":"${esc(schemaJson)}",""" +
          s""""adds":[$adds],"removes":[]}"""
        Files.write(log.resolve(f"$v%020d.json"), json.getBytes("UTF-8"))
      }
      LogLake.setTableProperties(dir, Map(
        "loglake.planning.distributed" -> "true",
        "loglake.checkpoint.format" -> "parquet",
        "loglake.checkpoint.partSizeFiles" -> "1000000"))
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
      ()
    }
    spark.stop()
  }
}
