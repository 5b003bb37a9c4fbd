package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.sources.LogLake

/** Write-side cost of STRING STATS on a text corpus (the round-12
  * truncation change): creates the same synthetic ~5 KB-document
  * corpus as a loglake table three ways — truncated default stats
  * (the new behavior), exact string stats
  * (`loglake.stats.stringPrefixLength=0`, the old behavior), and
  * stats disabled — and reports create wall-clock plus the resulting
  * `_loglake/` byte size. The exact-stats run is the regression this
  * round removed: every manifest entry carries two full documents. */
object TextStatsProbe {

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 20000
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ~5 KB per doc, deterministic, high-cardinality prefixes so every
    // file's min/max are distinct full documents
    val words = Array("data", "pipeline", "corpus", "token", "model",
      "shard", "batch", "layer", "metric", "sample")
    val docs = spark.range(nDocs.toLong).map { i =>
      val r = new scala.util.Random(i)
      val body = Seq.fill(700)(words(r.nextInt(words.length))).mkString(" ")
      (i, f"doc-$i%08d $body")
    }.toDF("doc_id", "text").repartition(16).cache()
    docs.count()

    def logBytes(dir: String): Long =
      new java.io.File(dir, "_loglake").listFiles()
        .filter(_.isFile).map(_.length()).sum

    def run(tag: String, props: Map[String, String],
        statsOff: Boolean): Unit = {
      val dir = Files.createTempDirectory(s"tsp-$tag").toString + "/t"
      LogLake.createEmpty(dir, docs.schema)
      val base = Map("loglake.dataSkippingNumIndexedCols" ->
        (if (statsOff) "0" else "32"))
      LogLake.setTableProperties(dir, base ++ props)
      val t0 = System.nanoTime()
      LogLake.append(spark, dir, docs)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"  $tag%-28s ${secs}%7.2f s   log=${logBytes(dir)}%9d B")
    }

    println(s"== $nDocs docs x ~5 KB")
    run("warmup (discard)", Map.empty, statsOff = false)
    run("truncated stats (default)", Map.empty, statsOff = false)
    run("exact stats (prefixLen=0)",
      Map("loglake.stats.stringPrefixLength" -> "0"), statsOff = false)
    run("stats disabled", Map.empty, statsOff = true)
    spark.stop()
  }
}
