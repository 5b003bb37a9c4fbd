package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.sources.LogLake

/** Scratch probe: where does a big loglake append spend its time vs a
  * plain parquet write of the same rows? */
object LakeProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Files.createTempDirectory("lakeprobe").toString
    val df = spark.range(n).select(
      concat(lit("M"), (col("id") % 3 + 1)).as("machine_id"),
      (col("id") * 1.5 + 0.25).as("reading"),
      timestamp_seconds(lit(1700000000L) + col("id") % 86400).as("event_time"))
      .repartition(32)

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    t("parquet write")(df.write.parquet(s"$base/p1"))
    t("loglake create")(LogLake.create(spark, s"$base/t1", df))
    t("loglake append")(LogLake.append(spark, s"$base/t1", df))
    t("loglake append+stats")(LogLake.append(spark, s"$base/t1", df,
      statsCols = Seq("event_time")))
    spark.stop()
  }
}
