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
    // Three timed iterations per query, report the min: the first
    // execution of each distinct plan pays one-off janino/codegen
    // compilation that steady-state throughput (the thing a cluster
    // cares about) never sees. A query that fails on every iteration is
    // reported as -1 and listed in "failed" — never as a fast timing.
    val iterations = 3
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to iterations).flatMap { _ =>
        val t0 = System.nanoTime()
        try { run(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); None
        }
      }
      name -> times.minOption.getOrElse(-1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","iterations":$iterations,"timing":"min","failed":$failed}""")
    spark.stop()
  }
}
