package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.AnnIndex
import graft.sources.LogLake

/** STREAMING index maintenance — the production delivery of q158's
  * contract: new vectors arrive continuously, each micro-batch assigns
  * and PQ-encodes under the FROZEN codebooks and appends into the index
  * tables with txnId = annmaint-<table>:<epoch>, so a replayed epoch is
  * a no-op per table (even a crash between the two appends cannot
  * duplicate either) and the index stays exactly-once across any number
  * of stream restarts. */
class AnnStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming maintenance: exactly-once, restart-safe, equals the frozen-book rebuild") {
    val root = java.nio.file.Files.createTempDirectory("annstream").toString
    val emb = graft.model.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val deltaPred = col("vec_id") % 5 === 2
    // t0: index the base corpus; books are FROZEN from here on
    val base = AnnIndex.normalized(emb.filter(!deltaPred))
    val k1 = AnnIndex.k1Of(base.count())
    val (cb1, cb2) = AnnIndex.subBooks(base, k1)
    val asgB = AnnIndex.assignTop(base, k1, cb1, cb2)
    val cb = AnnIndex.residualBook(asgB)
    LogLake.create(spark, s"$root/postings", asgB, statsCols = Seq("c_id"))
    LogLake.create(spark, s"$root/codes", AnnIndex.encode(asgB, cb),
      statsCols = Seq("c_id"))
    val baseRows = LogLake.snapshot(spark, s"$root/postings").count()
    val expectDelta = AnnIndex.normalized(emb.filter(deltaPred)).count()

    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    val delta = emb.filter(deltaPred).as[(Long, Array[Float])].collect()
    val (d1, d2) = delta.splitAt(delta.length / 2)
    val cp = java.nio.file.Files.createTempDirectory("annstream-chk").toString
    def run(): Unit = {
      val q = mem.toDF().toDF("vec_id", "embedding").writeStream
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, epoch: Long) =>
          val asg = AnnIndex.assignTop(AnnIndex.normalized(b), k1, cb1, cb2)
          LogLake.append(spark, s"$root/postings", asg,
            statsCols = Seq("c_id"), txnId = s"annmaint-post:$epoch")
          LogLake.append(spark, s"$root/codes", AnnIndex.encode(asg, cb),
            statsCols = Seq("c_id"), txnId = s"annmaint-code:$epoch")
          ()
        }
        .start()
      q.awaitTermination(120000)
    }
    mem.addData(d1.toIndexedSeq: _*)
    run()
    run() // restart on the same checkpoint, nothing new: no duplicates
    mem.addData(d2.toIndexedSeq: _*)
    run()

    val maintained = LogLake.snapshot(spark, s"$root/postings")
    assert(maintained.count() == baseRows + expectDelta,
      "every streamed vector must be indexed exactly once")
    // the streaming-maintained index equals the frozen-book rebuild
    val full = AnnIndex.assignTop(AnnIndex.normalized(emb), k1, cb1, cb2)
    assert(maintained.count() == full.count() &&
      maintained.exceptAll(full).isEmpty,
      "streaming maintenance must converge to the frozen-book rebuild")
    // a crash-replayed epoch (sink committed, source offset lost) is a
    // no-op: re-issuing epoch 0's append with its txnId changes nothing
    val asg0 = AnnIndex.assignTop(
      AnnIndex.normalized(d1.toIndexedSeq.toDF("vec_id", "embedding")),
      k1, cb1, cb2)
    LogLake.append(spark, s"$root/postings", asg0, txnId = "annmaint-post:0")
    assert(LogLake.snapshot(spark, s"$root/postings").count() ==
      baseRows + expectDelta,
      "a replayed maintenance epoch must not duplicate index rows")
    // and the maintained index still SEARCHES: k results per query
    val out = AnnIndex.search(
      AnnIndex.normalized(emb.filter(col("vec_id") < 20)), k1, cb1, cb2, cb,
      maintained, LogLake.snapshot(spark, s"$root/codes"),
      rerank = None, nprobe = AnnIndex.nprobeOf(k1 * k1)).collect()
    assert(out.nonEmpty && out.length % AnnIndex.K == 0)
  }
}
