package graft.tools
import graft.{Sessions, SparkEntry}
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val r5 = Recall.ivfRecallAt5(spark, sf)
      val top1 = SparkEntry.queries("q43_cosine_topk")(spark, sf).collect()
        .filter(_.getInt(1) == 1).map(r => r.getLong(0) -> r.getLong(2)).toMap
      val byQ = Recall.topSets(spark, sf, "q82_ivf_search")
      val r1 = byQ.count { case (q, ns) => ns.contains(top1(q)) } / byQ.size.toDouble
      val pq5 = Recall.ivfPqRecallAt5(spark, sf)
      println(f"[recall] $sf ivf recall@5=$r5%.2f top1-in-5=$r1%.2f pq recall@5=$pq5%.2f")
    }
    spark.stop()
  }
}
