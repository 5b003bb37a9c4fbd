package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Sessions, SparkEntry}

/** Memory-pressure validation for the spill-claiming operators (run
  * with a CONSTRAINED heap, e.g. `java -Xmx4g …`): executes each query
  * once under default config and once in a session whose window/SMJ
  * in-memory buffers are forced to spill after a few thousand rows,
  * then compares order-independent result fingerprints. Proves the
  * spill code path — external window sort for the percentile family,
  * disk-backed persists for the corpus-heavy queries — produces
  * byte-identical answers, and records actual spilled bytes from task
  * metrics (> 0 expected in the forced run).
  *
  * Output: one JSON line per query + a `spill_total` summary line.
  */
object SpillCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queries = Seq("q49_percentile_disc", "q96_percentile_cont",
      "q105_mad_outliers", "q77_seq_packing", "q85_contamination",
      "q106_heavy_hitters", "q108_lm_quality")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var spilledMem = 0L
    @volatile var spilledDisk = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach { m =>
          spilledMem += m.memoryBytesSpilled
          spilledDisk += m.diskBytesSpilled
        }
    })

    // force the external-sort/aggregation buffers to spill early: the
    // same code path a 100 TB group hits when it outgrows executor
    // memory, exercised deterministically at sf0.1
    val spilly = Sessions.derived(spark,
      "spark.sql.windowExec.buffer.spill.threshold" -> "4096",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "4096",
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "16")

    def fingerprint(df: DataFrame): (Long, Long) = {
      val cols = df.columns.map(c => col(c).cast("string")).toSeq
      val r = df.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(cols: _*)), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var allOk = true
    queries.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val base = fingerprint(fn(spark, sfDir))
      val t1 = System.nanoTime()
      val before = (spilledMem, spilledDisk)
      val forced = fingerprint(fn(spilly, sfDir))
      val t2 = System.nanoTime()
      val sMem = spilledMem - before._1
      val sDisk = spilledDisk - before._2
      val ok = base == forced
      allOk &= ok
      spark.catalog.clearCache()
      println(s"""{"query":"$name","rows":${base._1},"match":$ok,""" +
        s""""spilled_mem_bytes":$sMem,"spilled_disk_bytes":$sDisk,""" +
        s""""sec_default":${(t1 - t0) / 1e9},"sec_forced_spill":${(t2 - t1) / 1e9}}""")
    }
    println(s"""{"spill_total_mem":$spilledMem,"spill_total_disk":$spilledDisk,""" +
      s""""heap_max_mb":${Runtime.getRuntime.maxMemory() / 1024 / 1024},"all_match":$allOk}""")
    spark.stop()
    if (!allOk) sys.exit(1)
  }
}
