package graft.tools

import org.apache.spark.sql.functions.col
import graft.{Sessions, SparkEntry}
import graft.ops.AnnIndex

/** Dev harness for the q150/q157 recall knobs: runs AnnIndex
  * build+search at given (ma, nprobe-rule, shortR) over each SF and
  * prints recall@5 vs the exact q43 top-5, plus wall seconds.
  *
  * Usage: PqTune [ma] [npLo] [npHi] [npDiv] [shortR]
  * nprobe(ncells) = min(ncells, max(npLo, min(npHi, ncells/npDiv))).
  */
object PqTune {
  def main(args: Array[String]): Unit = {
    val ma = if (args.length > 0) args(0).toInt else 1
    val npLo = if (args.length > 1) args(1).toInt else 64
    val npHi = if (args.length > 2) args(2).toInt else 128
    val npDiv = if (args.length > 3) args(3).toInt else 4
    val shortR = if (args.length > 4) args(4).toInt else AnnIndex.ShortR
    def rule(ncells: Int): Int =
      math.min(ncells, math.max(npLo, math.min(npHi, ncells / npDiv)))
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val exact = Recall.topSets(spark, sf, "q43_cosine_topk")
      val n = AnnIndex.normalized(
        graft.model.Tables.embeddings(spark, sf).select("vec_id", "embedding"))
      val t0 = System.nanoTime()
      val out = AnnIndex.buildAndSearch(n, ma, rule, shortR).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      val ann = out.map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
      val recall = ann.map { case (q, ns) => (exact(q) & ns).size / 5.0 }
      val mean = recall.sum / recall.size
      println(f"[pqtune] $sf ma=$ma np=($npLo,$npHi,/$npDiv) R=$shortR " +
        f"recall@5=$mean%.3f wall=$secs%.1fs")
    }
    spark.stop()
  }
}
