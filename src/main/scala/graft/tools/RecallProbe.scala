package graft.tools
import graft.{Sessions, SparkEntry}
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = SparkEntry.queries("q43_cosine_topk")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      val top5 = exact.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).toSet }
      val top1 = exact.filter(_._2 == 1).map(r => r._1 -> r._3).toMap
      val ivf = SparkEntry.queries("q82_ivf_search")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(2)))
      val byQ = ivf.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
      val r5 = byQ.map { case (q, ns) => (top5(q) & ns).size / 5.0 }
      val r1 = byQ.count { case (q, ns) => ns.contains(top1(q)) } / byQ.size.toDouble
      println(f"[recall] $sf ivf recall@5=${r5.sum / r5.size}%.2f top1-in-5=${r1}%.2f")
    }
    spark.stop()
  }
}
