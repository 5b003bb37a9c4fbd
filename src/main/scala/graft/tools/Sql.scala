package graft.tools

import graft.{Sessions, model}

/** Dev tool: run one SQL statement against the engine session (harness
  * tables of SPARK_GRAFT_SF_DIR registered as temp views).
  * Usage: runMain graft.tools.Sql "SELECT scaled_dot(embedding, embedding) FROM embeddings LIMIT 3"
  */
object Sql {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    model.Tables.events(spark, sfDir).createOrReplaceTempView("events")
    spark.sql(args.mkString(" ")).show(50, truncate = false)
    spark.stop()
  }
}
