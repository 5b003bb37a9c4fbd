package graft

import org.apache.spark.sql.functions._

import graft.ops.AnnLake
import graft.sources.LogLake

/** Codebook lifecycle (VERDICT r16 #2): measured recall drift as the
  * staleness signal, retrain staged on a branch, ATOMIC pointer swap.
  *
  * The drift fixture is a distribution SHIFT derived deterministically
  * from the harness embeddings: every delta vector has its halves
  * swapped AND every other coordinate sign-flipped — an orthogonal
  * change of basis, so pairwise dot products (and
  * hence the exact neighbor structure) are fully preserved, but the
  * frozen half-space codebooks and residual codewords were sampled
  * from the un-rotated distribution and mis-span the delta — the
  * canonical "same geometry, different basis" embedding-model upgrade
  * that starves an IVF-PQ index. Because the rotation preserves
  * structure, retrained books can restore recall to the native level
  * — which is what makes the staged-retrain audit a sharp assertion
  * rather than a hope. Shifted vectors take NEGATIVE ids so a
  * retrain's deterministic lowest-id codebook sample draws from the
  * new distribution.
  */
class AnnRetrainSpec extends SparkTestBase {

  test("recall drift is measurable, retrain stages on a branch, publish is one atomic flip") {
    val root = java.nio.file.Files.createTempDirectory("annretrain").toString
    val corpus = s"$root/corpus"
    val emb = graft.model.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    LogLake.create(spark, corpus, emb)
    LogLake.setTableProperties(corpus,
      Map("loglake.enableChangeDataFeed" -> "true"))
    AnnLake.buildIndexVersioned(spark, root, LogLake.snapshot(spark, corpus))
    val vBuild = LogLake.currentVersion(corpus)
    assert(AnnLake.currentGen(spark, root) == 1L)

    // the signal reads healthy on the distribution the books saw
    val baseProbes = emb.filter(col("vec_id") < 20)
    val healthy = AnnLake.recallAt(spark, AnnLake.genDir(root, 1L),
      LogLake.snapshot(spark, corpus), baseProbes)
    assert(healthy >= 0.75, f"native-distribution recall $healthy%.2f")

    // DRIFT: the shifted cone arrives and is maintained under the
    // frozen books — every maintenance invariant holds, recall decays
    val rot = concat(graft.ops.AnnIndex.h2(col("embedding")),
      graft.ops.AnnIndex.h1(col("embedding")))
    val shifted = emb.select((-col("vec_id") - 1).as("vec_id"),
      transform(rot, (v, i) =>
        when(i % 2 === 0, v).otherwise(-v)).as("embedding"))
    LogLake.append(spark, corpus, shifted)
    val cp = java.nio.file.Files.createTempDirectory("annretrain-chk").toString
    val tMaint = System.nanoTime()
    AnnLake.maintainStream(spark, corpus, AnnLake.genDir(root, 1L), cp, vBuild)
      .awaitTermination(180000)
    val maintSec = (System.nanoTime() - tMaint) / 1e9
    val shiftProbes = shifted.filter(col("vec_id") >= -20)
    val drifted = AnnLake.recallAt(spark, AnnLake.genDir(root, 1L),
      LogLake.snapshot(spark, corpus), shiftProbes)
    assert(drifted < 0.75,
      f"the rotated delta must drag recall below the floor, got $drifted%.2f")

    // RETRAIN, staged: fresh books from the current corpus, built into
    // an invisible generation; the pointer flips only on the branch
    val g1Postings = AnnLake.genDir(root, 1L) + "/postings"
    val g1Version = LogLake.currentVersion(g1Postings)
    val tRetrain = System.nanoTime()
    val staged = AnnLake.retrainStaged(spark, root,
      LogLake.snapshot(spark, corpus))
    val retrainSec = (System.nanoTime() - tRetrain) / 1e9
    info(f"recall healthy=$healthy%.2f drifted=$drifted%.2f; " +
      f"incremental maintenance ${maintSec}%.1f s vs staged full " +
      f"retrain ${retrainSec}%.1f s (BASELINE.md lifecycle row)")
    assert(staged == 2L && AnnLake.stagedGen(spark, root) == 2L)
    assert(AnnLake.currentGen(spark, root) == 1L,
      "main readers must keep resolving the old generation while staged")
    assert(LogLake.currentVersion(g1Postings) == g1Version,
      "the staged retrain must never touch the live generation's tables")

    // AUDIT through the branch: the staged generation restores recall
    val audited = AnnLake.recallAt(spark,
      AnnLake.genDir(root, AnnLake.stagedGen(spark, root)),
      LogLake.snapshot(spark, corpus), shiftProbes)
    assert(audited >= 0.75,
      f"the retrained books must restore shifted-probe recall, got $audited%.2f")

    // PUBLISH: one commit on one table — the atomic swap
    val metaV = LogLake.currentVersion(s"$root/meta")
    AnnLake.publishRetrain(spark, root)
    assert(LogLake.currentVersion(s"$root/meta") == metaV + 1,
      "the swap must be exactly one meta commit")
    assert(AnnLake.currentGen(spark, root) == 2L)
    val out = AnnLake.searchVersioned(spark, root, shiftProbes).collect()
    assert(out.nonEmpty && out.length % graft.ops.AnnIndex.K == 0)
    // the SQL statement resolves the generation pointer too — a
    // published retrain needs no caller change on any surface
    shiftProbes.createOrReplaceTempView("retrain_probes")
    val sqlOut = spark.sql(
      s"ANN SEARCH '$root' FROM retrain_probes WHERE vec_id < 0").collect()
    assert(sqlOut.toSeq == out.toSeq,
      "the SQL search must serve the published generation")
    // the superseded generation is untouched — a reader that resolved
    // gen 1 an instant before the flip still reads a whole, consistent
    // index (generations are immutable; only the pointer moved)
    assert(LogLake.currentVersion(g1Postings) == g1Version)
  }
}
