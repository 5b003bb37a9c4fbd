package graft.tools

import graft.{Sessions, SparkEntry}

/** Ad-hoc profiler: runs the named queries twice (cold + warm) and
  * prints timings, or `explain <name>` for the formatted plan.
  * Usage: runMain graft.tools.Profile [explain] q30_dedup_exact ...
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (mode, names) =
      if (args.headOption.contains("explain")) ("explain", args.drop(1)) else ("time", args)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (mode == "explain") {
        println(s"===== $n ====="); fn(spark, sfDir).explain("formatted")
      } else {
        for (round <- 1 to 3) {
          // label every job with query+round so event-log attribution can
          // split warm iterations from cold ones (guide §1: label your jobs)
          spark.sparkContext.setJobDescription(s"$n#$round")
          val t0 = System.nanoTime()
          // same full-evaluation sink as Bench (count() would let Catalyst
          // prune columns and drop sorts)
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          println(f"[$n round $round] ${(System.nanoTime() - t0) / 1e9}%.2f s")
          spark.sparkContext.setJobDescription(null)
        }
      }
    }
    spark.stop()
  }
}
