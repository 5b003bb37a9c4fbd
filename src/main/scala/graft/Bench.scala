package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup on the benchmarked dataset: loads parquet reader,
    // codegen, shuffle machinery once so the first timed query isn't
    // charged ~7 s of JVM start-up.
    // Evaluate via the noop sink, not count(): count() lets Catalyst prune
    // every projected column and drop the final sort, so projection-only
    // queries would time a bare scan instead of their operators.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    try run(SparkEntry.queries("q01_pricing_summary")(spark, sfDir))
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }
    // Three timed iterations per query, INTERLEAVED round-robin (pass 1
    // runs every query once, then pass 2, then pass 3) and the min per
    // query reported: the first execution of each distinct plan pays
    // one-off janino/codegen compilation that steady-state throughput
    // (the thing a cluster cares about) never sees, and interleaving
    // means a multi-second host stall contaminates one pass of a few
    // queries — the other passes still yield an honest min — instead of
    // all iterations of one query (the back-to-back failure mode).
    // Per-iteration times are emitted in "iters" so a stall-inflated
    // outlier is visible in the artifact itself. A query that fails on
    // every iteration is reported as -1 and listed in "failed" — never
    // as a fast timing.
    val iterations = 3
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val iterTimes = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      names.map { case (n, _) => n -> Vector.empty[Double] }: _*)
    for (_ <- 1 to iterations; (name, fn) <- names) {
      val t0 = System.nanoTime()
      try {
        run(fn(spark, sfDir))
        iterTimes(name) = iterTimes(name) :+ (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
    }
    val results = names.map { case (name, _) =>
      name -> iterTimes(name).minOption.getOrElse(-1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val iters = names.map { case (k, _) =>
      // Locale.ROOT: f"" uses the JVM default locale, and a comma
      // decimal separator would corrupt the JSON artifact
      "\"" + k + "\":" + iterTimes(k)
        .map(t => String.format(java.util.Locale.ROOT, "%.3f", Double.box(t)))
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","iterations":$iterations,"timing":"min","interleaved":true,"iters":$iters,"failed":$failed}""")
    spark.stop()
  }
}
