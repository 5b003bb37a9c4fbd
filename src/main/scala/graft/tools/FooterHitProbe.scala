package graft.tools

import graft.{Sessions, SparkEntry}
import graft.sources.LogLake

/** Measure the footer-stats fast path's hit rate per query (r18,
  * VERDICT r17 #3): runs each named query once and prints the deltas of
  * the hit / eligible-fallback / gated counters around it.
  *
  * Usage: runMain graft.tools.FooterHitProbe q111_loglake_merge ...
  */
object FooterHitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(f"${"query"}%-36s ${"hits"}%6s ${"fallb"}%6s ${"gated"}%6s")
    args.foreach { n =>
      val h0 = LogLake.footerStatsHits.get()
      val f0 = LogLake.footerStatsFallbacks.get()
      val g0 = LogLake.footerStatsGated.get()
      SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      println(f"$n%-36s ${LogLake.footerStatsHits.get() - h0}%6d " +
        f"${LogLake.footerStatsFallbacks.get() - f0}%6d " +
        f"${LogLake.footerStatsGated.get() - g0}%6d")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
