package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import graft.Sessions
import graft.ops.AnnIndex
import graft.sources.LogLake

/** The q157 BUILD/SEARCH decoupling measurement (VERDICT r15 #1 done
  * criterion): persist the ANN index once per corpus, then time the
  * search alone — the point of a persisted index is that the corpus-
  * sized encode cost is paid once while every query pays only
  * probes + ADC over stored codes + a constant re-rank.
  *
  * Usage: AnnSplitProbe <sfDir> [reps=3]
  * Prints one line: build wall, min-of-reps search wall, n.
  */
object AnnSplitProbe {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("annsplit").toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = AnnIndex.normalized(emb)

    val t0 = System.nanoTime()
    val cnt = n.count()
    val k1 = AnnIndex.k1Of(cnt)
    val (cb1, cb2) = AnnIndex.subBooks(n, k1)
    val asg = AnnIndex.assignTop(n, k1, cb1, cb2)
    val cb = AnnIndex.residualBook(asg)
    val codes = AnnIndex.encode(asg, cb)
    LogLake.create(spark, s"$root/books1", cb1)
    LogLake.create(spark, s"$root/books2", cb2)
    LogLake.create(spark, s"$root/rescb", cb)
    LogLake.create(spark, s"$root/postings", asg, statsCols = Seq("c_id"))
    LogLake.create(spark, s"$root/codes", codes, statsCols = Seq("c_id"))
    val buildS = (System.nanoTime() - t0) / 1e9

    val pb1 = LogLake.snapshot(spark, s"$root/books1")
    val pb2 = LogLake.snapshot(spark, s"$root/books2")
    val pcb = LogLake.snapshot(spark, s"$root/rescb")
    val post = LogLake.snapshot(spark, s"$root/postings")
    val pcodes = LogLake.snapshot(spark, s"$root/codes")
    val qn = AnnIndex.normalized(emb.filter(col("vec_id") < 20))
    val searchS = (1 to reps).map { _ =>
      val s0 = System.nanoTime()
      val out = AnnIndex.search(qn, k1, pb1, pb2, pcb, post, pcodes,
        rerank = None, nprobe = AnnIndex.nprobeOf(k1 * k1))
      val rows = out.collect().length
      require(rows > 0)
      (System.nanoTime() - s0) / 1e9
    }.min
    println(f"[annsplit] $sf n=$cnt k1=$k1 build=$buildS%.1fs " +
      f"search(min-of-$reps)=$searchS%.2fs")
    spark.stop()
  }
}
