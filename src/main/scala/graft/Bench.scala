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
    // SPARK_GRAFT_BENCH_ITERS > 3 plus a single-query
    // SPARK_GRAFT_BENCH_ONLY is the SOLO STEADY-STATE mode: one query,
    // N interleaved passes, same noop sink — the like-for-like way to
    // adjudicate an in-suite regression (suite numbers carry cross-query
    // contention: JIT/GC pressure and page-cache churn from neighbours).
    val iterations = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    // optional comma-separated filter for local iteration, solo
    // steady-state runs, and the scaling-curve harness
    // (tools/scaling_curve.sh)
    val only: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    val iterTimes = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      names.map { case (n, _) => n -> Vector.empty[Double] }: _*)
    for (_ <- 1 to iterations; (name, fn) <- names) {
      val t0 = System.nanoTime()
      try {
        run(fn(spark, sfDir))
        iterTimes(name) = iterTimes(name) :+ (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      } finally {
        // Queries that persist() intermediates (q42/q83/q85/q86/q94/
        // q98/q105/q106) would otherwise pin one MEMORY_AND_DISK cache
        // each for the whole session — unpersist after every timed
        // action so memory pressure stays flat across the run. Inside
        // the timed region each query still benefits from its own
        // persists; nothing is shared across queries by design.
        spark.catalog.clearCache()
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
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","iterations":$iterations,"timing":"min","interleaved":true,"iters":$iters,"failed":$failed}"""
    println(line)
    // The driver captures only the tail of stdout (2000 chars ≈ 50 of 99
    // queries) — also write the complete artifact to a known path so the
    // full per-query/per-iteration record survives the round.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_out.json")),
      line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] artifact write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
