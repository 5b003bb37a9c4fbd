package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sessions
import graft.model.Tables
import graft.functions.TextFeatures._

/** Dev probe: where does q68 time go? */
object Q68Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(df: => DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-22s min=${ts.min}%.3f s")
    }
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), words(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .repartition(col("doc_id"))
      .select(
        col("doc_id"),
        size(col("w")).as("nw"),
        size(array_distinct(col("w"))).as("ndw"),
        transform(
          sequence(lit(0), size(col("w")) - 2),
          i => concat_ws(" ", element_at(col("w"), i + 1), element_at(col("w"), i + 2))
        ).as("bg"))
    time("base")(base)
    val ex = base.select(col("doc_id"), col("nw"), col("ndw"), explode(col("bg")).as("b"))
    time("explode")(ex)
    val bc = ex.groupBy("doc_id", "b")
      .agg(max("nw").as("nw"), max("ndw").as("ndw"), count(lit(1)).as("c"))
    time("bigram-counts")(bc)
    val agg = bc.groupBy("doc_id")
      .agg(max("nw").as("nw"), max("ndw").as("ndw"),
        max("c").as("top_bigram_count"), count(lit(1)).as("n_distinct_bigrams"))
    time("full-agg")(agg)
    time("full-ordered")(agg.orderBy("doc_id"))
    spark.stop()
  }
}
