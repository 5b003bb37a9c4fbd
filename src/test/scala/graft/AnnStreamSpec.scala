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

  test("maintainStream API: appends, deletes and updates flow from the corpus CDC, exactly once") {
    // VERDICT r16 #3: the spec'd foreachBatch pattern as an engine
    // surface — AnnLake.maintainStream reads the corpus table's change
    // feed and applies erasures + arrivals under the frozen books with
    // per-(table, epoch) txnIds. Here the corpus takes an APPEND, a
    // DV DELETE and an UPDATE after the build; one AvailableNow run
    // catches the index up, a restart on the same checkpoint is a
    // no-op, and the result equals the frozen-book rebuild over the
    // corpus's CURRENT snapshot.
    val root = java.nio.file.Files.createTempDirectory("annms").toString
    val corpus = s"$root/corpus"
    val emb = graft.model.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val deltaPred = col("vec_id") % 5 === 2
    LogLake.create(spark, corpus, emb.filter(!deltaPred))
    LogLake.setTableProperties(corpus,
      Map("loglake.enableChangeDataFeed" -> "true"))
    val k1 = graft.ops.AnnLake.buildIndex(spark, root,
      LogLake.snapshot(spark, corpus))
    val vBuild = LogLake.currentVersion(corpus)
    // corpus evolves: arrivals, erasures, and an in-place update
    LogLake.append(spark, corpus, emb.filter(deltaPred))
    LogLake.delete(spark, corpus, col("vec_id") % 7 === 0, mor = true)
    LogLake.update(spark, corpus, col("vec_id") % 11 === 3,
      Map("embedding" -> reverse(col("embedding"))))
    val cp = java.nio.file.Files.createTempDirectory("annms-chk").toString
    def run(): Unit = {
      val q = graft.ops.AnnLake.maintainStream(spark, corpus, root, cp, vBuild)
      q.awaitTermination(180000)
    }
    run()
    val count1 = LogLake.snapshot(spark, s"$root/postings").count()
    run() // restart, nothing new admitted: no duplicates, no re-deletes
    val maintained = LogLake.snapshot(spark, s"$root/postings")
    assert(maintained.count() == count1,
      "a restarted stream with no new commits must change nothing")
    // maintained == frozen-book rebuild over the CURRENT corpus
    val fb1 = LogLake.snapshot(spark, s"$root/books1")
    val fb2 = LogLake.snapshot(spark, s"$root/books2")
    val expect = AnnIndex.assignTop(
      AnnIndex.normalized(LogLake.snapshot(spark, corpus)), k1, fb1, fb2)
    assert(maintained.count() == expect.count() &&
      maintained.exceptAll(expect).isEmpty,
      "streamed appends+deletes+updates must converge to the " +
        "frozen-book rebuild over the surviving corpus")
    // the cell summary accounts for exactly the maintained postings
    assert(LogLake.snapshot(spark, s"$root/cells")
      .agg(sum("cnt")).first().getLong(0) == maintained.count())
    // erased keys are gone; updated keys re-indexed (still present)
    assert(maintained.filter(col("vec_id") % 7 === 0).isEmpty)
    val sOut = graft.ops.AnnLake.searchIndex(spark, root,
      emb.filter(col("vec_id") < 20)).collect()
    assert(sOut.nonEmpty && sOut.length % AnnIndex.K == 0)
    assert(!sOut.exists(_.getLong(2) % 7 == 0),
      "the maintained index must never return an erased neighbor")
  }
}
