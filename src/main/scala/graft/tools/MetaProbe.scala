package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.Sessions
import graft.sources.LogLake

/** Driver-side metadata posture at large file counts (VERDICT r5/r6
  * task: "loglake metadata at 10⁶ files"). Crafts a synthetic commit
  * log — manifests and a checkpoint in the exact on-disk JSON format,
  * no data files — then measures the driver costs every loglake read
  * pays: log listing, snapshot resolve (checkpoint + tail vs full
  * replay), stats pruning over every active file, and resolved-state
  * heap. Data files are never touched (planning is metadata-only by
  * design), so the numbers isolate the manifest path itself.
  */
object MetaProbe {

  private val schemaJson = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType))).json

  /** One add entry, ~170 rendered bytes — same fields `renderAdds`
    * writes (path, rows, bytes, per-column stats). */
  private def add(i: Long): String =
    s"""{"path":"data/f-$i%016x.parquet","rows":1000,"bytes":1048576,""" +
      s""""stats":{"k":{"t":"long","min":"${i * 1000}","max":"${i * 1000 + 999}","nulls":0}}}"""

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** `nFiles` adds spread over `nManifests` append commits, plus a
    * checkpoint at the head (the steady-state layout: CheckpointInterval
    * keeps the tail ≤ 10 manifests long). */
  private def makeTable(dir: String, nFiles: Long, nManifests: Int): Unit = {
    val log = Paths.get(dir, LogLake.LogDir)
    Files.createDirectories(log)
    val perManifest = nFiles / nManifests
    var i = 0L
    (1 to nManifests).foreach { v =>
      val adds = (0L until perManifest).map(_ => { i += 1; add(i) })
      val json = s"""{"version":$v,"op":"${if (v == 1) "create" else "append"}","txnId":"",""" +
        s""""readVersion":${v - 1},"schema":"${esc(schemaJson)}",""" +
        s""""adds":[${adds.mkString(",")}],"removes":[]}"""
      Files.write(log.resolve(f"$v%020d.json"), json.getBytes("UTF-8"))
    }
    // checkpoint at the last version: all files, STREAMED (a 10⁷-file
    // checkpoint is ~1.7 GB of JSON — building it as one string would
    // measure the heap, not the parser)
    writeChk(log.resolve(f"chk-$nManifests%020d.json"),
      nManifests, 1L, i, header = true)
  }

  private def writeChk(p: java.nio.file.Path, v: Int, from: Long, to: Long,
      header: Boolean): Unit = {
    val w = new java.io.BufferedWriter(new java.io.FileWriter(p.toFile), 1 << 20)
    try {
      w.write(s"""{"version":$v,"schema":"${if (header) esc(schemaJson) else ""}","files":[""")
      var j = from
      while (j <= to) {
        if (j > from) w.write(",")
        w.write(add(j)); j += 1
      }
      w.write("""],"txns":{}}""")
    } finally w.close()
  }

  /** Swap the single-file checkpoint for an n-part group
    * (`chk-<v>.p<i>-of-<n>.json`) over the same file set — the
    * multi-part layout [[LogLake]] writes above
    * `loglake.checkpoint.partSizeFiles`. */
  private def makeMultiPart(dir: String, nFiles: Long, nManifests: Int,
      partSize: Long): Int = {
    val log = Paths.get(dir, LogLake.LogDir)
    Files.deleteIfExists(log.resolve(f"chk-$nManifests%020d.json"))
    val n = ((nFiles + partSize - 1) / partSize).toInt
    (1 to n).foreach { p =>
      val from = (p - 1).toLong * partSize + 1
      val to = math.min(nFiles, p.toLong * partSize)
      writeChk(log.resolve(f"chk-$nManifests%020d.p$p-of-$n.json"),
        nManifests, from, to, header = p == 1)
    }
    n
  }

  private def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"  $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  private def usedMb(): Long = {
    System.gc(); Thread.sleep(200); System.gc()
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(100000L, 1000000L)
    val spark = Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scales.foreach { n =>
      val dir = Files.createTempDirectory(s"metaprobe-$n").toString + "/t"
      println(s"== $n files")
      t("craft log (1000 manifests + chk)")(makeTable(dir, n, 1000))
      val m0 = usedMb()
      t("currentVersion (list only)")(LogLake.currentVersion(dir))
      // keep only the SIZE — holding the 10⁷-entry state across the
      // later cold-resolve measurements would gift them a heap full of
      // garbage-collection pressure the first resolve didn't have
      val nActive = t("activeState via checkpoint")(LogLake.activeState(dir)._1.size)
      println(f"  ${"active files"}%-34s $nActive%8d")
      // the snapshot cache: the SECOND resolve of the same version
      // skips checkpoint parse + tail replay (validation still lists)
      t("activeState again (snapshot cache)")(LogLake.activeState(dir))
      val m1 = usedMb()
      println(f"  ${"resolved-state heap"}%-34s ${m1 - m0}%8d MB")
      t("pruneFiles k in [0, 5e6]")(
        println(f"  ${"  kept"}%-34s ${LogLake.pruneFiles(dir, "k", 0L, 5000000L)._1.size}%8d"))
      t("snapshot plan (no execution)")(
        spark.read.schema(StructType.fromDDL("k LONG, v STRING"))
          .format("loglake").load(dir).queryExecution.executedPlan)
      // multi-part checkpoint over the same state: resolve parses the
      // parts in parallel — the 10⁷-file posture (part write cost is
      // reported too; LogLake's own writer parallelizes it the same way)
      val nParts = t(s"craft multi-part chk (10⁶/part)")(
        makeMultiPart(dir, n, 1000, 1000000L))
      LogLake.clearSnapshotCache()
      t(s"activeState via $nParts-part chk")(LogLake.activeState(dir))
      // distributed planning: parts prune on EXECUTORS, survivors only
      // reach the driver — the 10⁸-file posture (state never assembles)
      LogLake.clearSnapshotCache()
      t(s"distributed prune via $nParts json parts")(println(
        f"  ${"  kept"}%-34s ${LogLake.pruneFilesDistributed(spark, dir, "k", 0L, 5000000L)._1.size}%8d"))
      // ---- A/B: the SAME state through PARQUET checkpoint bodies
      // (`loglake.checkpoint.format=parquet`, VERDICT r12 #5).
      // Semantics are pinned identical by ParquetCheckpointSpec; what
      // changes here is bytes on disk and driver parse cost.
      val logFile = new java.io.File(dir, LogLake.LogDir)
      def chkBytes: Long = logFile.listFiles()
        .filter(_.getName.startsWith("chk-")).map(_.length).sum
      def dropChk(): Unit = logFile.listFiles()
        .filter(_.getName.startsWith("chk-")).foreach(_.delete())
      val jsonBytes = chkBytes
      def addFileIt(from: Long, to: Long): Iterator[LogLake.AddFile] =
        Iterator.range(from, to + 1).map(i => LogLake.AddFile(
          f"data/f-$i%016x.parquet", 1000,
          Map("k" -> LogLake.ColStats("long", (i * 1000).toString,
            (i * 1000 + 999).toString, 0)), 1048576L))
      val conf = new org.apache.hadoop.conf.Configuration()
      def writePq(name: String, from: Long, to: Long, header: Boolean): Unit =
        graft.sources.CheckpointParquet.write(conf,
          new org.apache.hadoop.fs.Path(logFile.toString, name),
          LogLake.Checkpoint(1000, if (header) schemaJson else "", Nil,
            Map.empty),
          addFileIt(from, to), header)
      dropChk()
      t("craft parquet chk (single)")(
        writePq(f"chk-${1000}%020d.parquet", 1L, n, header = true))
      LogLake.clearSnapshotCache()
      t("activeState via parquet chk")(LogLake.activeState(dir))
      val pqBytes = chkBytes
      dropChk()
      val nPq = ((n + 999999L) / 1000000L).toInt
      t(s"craft parquet chk ($nPq parts)")((1 to nPq).foreach { p =>
        writePq(
          if (nPq == 1) f"chk-${1000}%020d.parquet"
          else f"chk-${1000}%020d.p$p-of-$nPq.parquet",
          (p - 1).toLong * 1000000L + 1, math.min(n, p.toLong * 1000000L),
          header = p == 1)
      })
      LogLake.clearSnapshotCache()
      t(s"activeState via $nPq-part parquet chk")(LogLake.activeState(dir))
      LogLake.clearSnapshotCache()
      t(s"distributed prune via $nPq parquet parts")(println(
        f"  ${"  kept"}%-34s ${LogLake.pruneFilesDistributed(spark, dir, "k", 0L, 5000000L)._1.size}%8d"))
      println(f"  ${"chk bytes json → parquet"}%-34s ${jsonBytes / 1048576}%5d MB → ${pqBytes / 1048576}%5d MB (${jsonBytes.toDouble / pqBytes}%.1f×)")
      // worst case: no checkpoint → full log replay (cache cleared so
      // the cold path is what's measured)
      val log = Paths.get(dir, LogLake.LogDir)
      Files.list(log).forEach(p =>
        if (p.getFileName.toString.startsWith("chk-")) Files.delete(p))
      LogLake.clearSnapshotCache()
      t("activeState full replay (no chk)")(LogLake.activeState(dir))
      ()
    }
    spark.stop()
  }
}
