package graft.tools

import java.nio.file.{Files, Paths}

import graft.Sessions
import graft.sources.LogLake

/** FIRST-CHECKPOINT-GENERATION probe (round 14): a table with a deep
  * manifest log and NO checkpoint — the one shape
  * writeCheckpointDistributed cannot serve — measured through the new
  * bootstrap job ([[LogLake.writeCheckpointBootstrap]] via
  * forceCheckpoint) against the driver replay path at the same scale.
  * The fixture is K manifests × m adds each (plus a sprinkle of
  * removes, so the per-path fold has real work), crafted in parallel.
  * Usage: `BootstrapProbe [nFiles...]` (default 1e7). */
object BootstrapProbe {

  private val schemaJson = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("k",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("v",
      org.apache.spark.sql.types.StringType))).json

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"  $tag%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  private def usedMb(): Long = {
    System.gc(); Thread.sleep(200); System.gc()
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  /** K manifests, n/K adds each; every 10th manifest also REMOVES the
    * first file the previous manifest added (and the next manifest
    * re-adds it — re-insertion ordering has real work to do). */
  private def craft(dir: String, n: Long, distributed: Boolean): Long = {
    val log = Paths.get(dir, LogLake.LogDir)
    Files.createDirectories(log)
    // 250k adds per commit at every scale — capping the commit count
    // instead produced 2.5e6-add (≈500 MB JSON) manifests at 1e8 whose
    // DOM parse OOMs ANY reader; real logs at that size have more,
    // smaller commits
    val k = math.max(1L, n / 250000L)
    val per = n / k
    def addJson(i: Long): String =
      f"""{"path":"data/f-$i%016x.parquet","rows":1000,"bytes":1048576,""" +
        f""""stats":{"k":{"t":"long","min":"${i * 1000}","max":"${i * 1000 + 999}","nulls":0}}}"""
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try (1L to k).map { v =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          val from = (v - 1) * per + 1
          val to = if (v == k) n else v * per
          val sb = new StringBuilder(1 << 20)
          sb.append(s"""{"version":$v,"op":"${if (v == 1L) "create" else "append"}",""")
          sb.append(s""""txnId":"tx-$v","readVersion":${v - 1},"schema":"${esc(schemaJson)}",""")
          // every 10th commit removes the previous commit's first add;
          // the NEXT commit re-adds it (position must move to the end)
          val removes =
            if (v % 10L == 0L && v > 1L) s""""data/f-${f"${(v - 2) * per + 1}%016x"}.parquet""""
            else ""
          sb.append(s""""removes":[$removes],"adds":[""")
          var first = true
          (from to to).foreach { i =>
            if (!first) sb.append(','); first = false
            sb.append(addJson(i))
          }
          if (v % 10L == 1L && v > 1L) { // re-add the one removed at v-1
            sb.append(',').append(addJson((v - 3) * per + 1))
          }
          sb.append("]}")
          Files.write(log.resolve(f"$v%020d.json"),
            sb.toString.getBytes("UTF-8"))
        }
      })
    }.foreach(_.get()) finally pool.shutdown()
    LogLake.setTableProperties(dir, Map(
      "loglake.planning.distributed" -> distributed.toString,
      "loglake.checkpoint.format" -> "parquet",
      "loglake.checkpoint.partSizeFiles" -> "1000000"))
    k
  }

  def main(args: Array[String]): Unit = {
    val scales =
      if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(10000000L)
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scales.foreach { n =>
      println(s"== $n files, manifest-log-only (no prior checkpoint)")
      // -- bootstrap-as-a-job (forced past the round-15 auto-select —
      // this A/B measures the two paths at the same scale)
      val dj = Files.createTempDirectory(s"boot-$n-job").toString + "/t"
      val k = t("craft manifest log")(craft(dj, n, distributed = true))
      LogLake.setTableProperties(dj, Map(
        "loglake.checkpoint.bootstrapJobMinManifestBytes" -> "0"))
      val m0 = usedMb()
      LogLake.clearSnapshotCache()
      val assembles = LogLake.snapshotAssembles.get()
      val wrotes = LogLake.distributedCheckpointWrites.get()
      t("generation 1 as a JOB (bootstrap)")(LogLake.forceCheckpoint(dj, k))
      require(LogLake.distributedCheckpointWrites.get() > wrotes,
        "the bootstrap writer must have engaged")
      require(LogLake.snapshotAssembles.get() == assembles,
        "the bootstrap must not assemble state")
      println(f"  ${"driver heap across bootstrap"}%-46s ${usedMb() - m0}%8d MB")
      // -- the driver path at the same scale
      val dd = Files.createTempDirectory(s"boot-$n-drv").toString + "/t"
      t("craft twin log")(craft(dd, n, distributed = false))
      LogLake.clearSnapshotCache()
      val m1 = usedMb()
      t("generation 1 on the DRIVER (resolve + encode)")(
        LogLake.forceCheckpoint(dd, k))
      println(f"  ${"driver heap across driver path"}%-46s ${usedMb() - m1}%8d MB")
      // -- equivalence: both groups resolve to the same active set in
      // the same ORDER (an order-sensitive rolling hash over the packed
      // state's iterator — two 10⁸-element path vectors would not fit)
      LogLake.clearSnapshotCache()
      t("cold resolve through both groups") {
        def sig(dir: String): (Long, Long) = {
          var h = 1125899906842597L; var cnt = 0L
          LogLake.activeState(dir, Some(k))._1.foreach { a =>
            h = h * 31L + a.path.hashCode; cnt += 1
          }
          (h, cnt)
        }
        val (ha, na) = sig(dj)
        LogLake.clearSnapshotCache()
        val (hb, nb) = sig(dd)
        require(ha == hb && na == nb,
          "bootstrap order/content must equal the driver replay's")
        println(f"  ${"  active files"}%-46s $na%8d")
      }
      // -- the round-15 AUTO-SELECT under the default byte threshold:
      // which path does an untouched distributed table actually take?
      val da = Files.createTempDirectory(s"boot-$n-auto").toString + "/t"
      t("craft auto-select twin")(craft(da, n, distributed = true))
      val manifestMb = {
        val log = new java.io.File(da, LogLake.LogDir)
        log.listFiles().filter(_.getName.endsWith(".json")).map(_.length).sum /
          (1024 * 1024)
      }
      LogLake.clearSnapshotCache()
      val w0 = LogLake.distributedCheckpointWrites.get()
      t("generation 1 under AUTO-SELECT")(LogLake.forceCheckpoint(da, k))
      val chose =
        if (LogLake.distributedCheckpointWrites.get() > w0) "the JOB"
        else "the DRIVER replay"
      println(f"  ${s"auto-select ($manifestMb MB manifests) chose"}%-46s $chose")
      ()
    }
    spark.stop()
  }
}
