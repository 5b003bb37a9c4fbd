package graft

import org.apache.spark.sql.functions._
import graft.ops.AnnIndex

/** Unit contract for the shared IVF-PQ kernel (graft.ops.AnnIndex) —
  * the parts the registry queries don't exercise directly: the exact
  * integer rules, the generalized multi-assignment path, the
  * residual-reconstruction identity the persisted-index re-rank (q157)
  * depends on, and the encode-pass counter q157's no-re-encode require
  * pins.
  */
class AnnIndexSpec extends SparkTestBase {

  private def n = AnnIndex.normalized(
    graft.model.Tables.embeddings(spark, sfDir).select("vec_id", "embedding"))

  test("k1Of: smallest power of two with K1^4 >= n, floor 8") {
    assert(AnnIndex.k1Of(1) == 8)
    assert(AnnIndex.k1Of(4096) == 8)
    assert(AnnIndex.k1Of(4097) == 16)
    assert(AnnIndex.k1Of(65536) == 16)
    assert(AnnIndex.k1Of(65537) == 32)
    assert(AnnIndex.k1Of(5000000) == 64)
  }

  test("nprobeOf: target-scan-fraction rule, clamped [64,128], capped at ncells") {
    assert(AnnIndex.nprobeOf(64) == 64)     // tiny corpus: probe everything
    assert(AnnIndex.nprobeOf(256) == 64)    // 256/4 = 64
    assert(AnnIndex.nprobeOf(1024) == 128)  // 1024/4 clamps to 128
    assert(AnnIndex.nprobeOf(4096) == 128)  // constant above the cap
  }

  test("residual identity: nx == r + concat(c1, c2) for every assignment row") {
    val k1 = AnnIndex.k1Of(n.count())
    val (cb1, cb2) = AnnIndex.subBooks(n, k1)
    val asg = AnnIndex.assignTop(n, k1, cb1, cb2, ma = 1)
    val rebuilt = asg
      .withColumn("i1", (col("c_id") / lit(k1.toLong)).cast("long"))
      .withColumn("i2", col("c_id") % lit(k1.toLong))
      .join(broadcast(cb1), Seq("i1")).join(broadcast(cb2), Seq("i2"))
      .select(col("vec_id"),
        zip_with(col("r"), concat(col("c1"), col("c2")), (a, b) => a + b).as("nx"))
    assert(rebuilt.exceptAll(n).isEmpty && n.exceptAll(rebuilt).isEmpty,
      "index-resident residual + centroid must reconstruct nx exactly")
  }

  test("multi-assignment (ma=2): two ranked cells per vector, primary == ma=1 cell") {
    val k1 = AnnIndex.k1Of(n.count())
    val (cb1, cb2) = AnnIndex.subBooks(n, k1)
    val a1 = AnnIndex.assignTop(n, k1, cb1, cb2, ma = 1)
    val a2 = AnnIndex.assignTop(n, k1, cb1, cb2, ma = 2)
    val cnt = n.count()
    assert(a2.count() == 2 * cnt, "ma=2 must emit exactly two rows per vector")
    assert(a2.groupBy("vec_id").agg(countDistinct("arnk").as("k"))
      .filter(col("k") =!= 2).isEmpty)
    // the primary (arnk=1) assignment must be the ma=1 assignment
    val p = a2.filter(col("arnk") === 1).select("vec_id", "c_id", "r")
    val q = a1.select("vec_id", "c_id", "r")
    assert(p.exceptAll(q).isEmpty && q.exceptAll(p).isEmpty)
  }

  test("search with list-resident re-rank == search with corpus re-rank") {
    val k1 = AnnIndex.k1Of(n.count())
    val (cb1, cb2) = AnnIndex.subBooks(n, k1)
    val asg = AnnIndex.assignTop(n, k1, cb1, cb2, ma = 1)
    val cb = AnnIndex.residualBook(asg)
    val codes = AnnIndex.encode(asg, cb)
    val qn = n.filter(col("vec_id") < 20)
    val np = AnnIndex.nprobeOf(k1 * k1)
    val fromCorpus = AnnIndex.search(qn, k1, cb1, cb2, cb, asg, codes,
      rerank = Some(n), nprobe = np).collect().toSeq
    val fromIndex = AnnIndex.search(qn, k1, cb1, cb2, cb, asg, codes,
      rerank = None, nprobe = np).collect().toSeq
    assert(fromIndex == fromCorpus,
      "reconstructed re-rank must match the exact corpus re-rank bit for bit")
  }

  test("frozen-book maintenance: base ∪ delta assignments AND codes equal the full rebuild") {
    // the q158 equality contract, codes half included (the in-query
    // require keeps the cheap postings half; this pins the pointwise
    // property the maintenance relies on for BOTH tables)
    val full = n
    val base = full.filter(col("vec_id") % 7 =!= 3)
    val delta = full.filter(col("vec_id") % 7 === 3)
    val k1 = AnnIndex.k1Of(base.count()) // FROZEN on the base
    val (cb1, cb2) = AnnIndex.subBooks(base, k1)
    val asgB = AnnIndex.assignTop(base, k1, cb1, cb2)
    val cb = AnnIndex.residualBook(asgB)
    val asgD = AnnIndex.assignTop(delta, k1, cb1, cb2)
    val incPost = asgB.unionByName(asgD)
    val incCodes = AnnIndex.encode(asgB, cb).unionByName(AnnIndex.encode(asgD, cb))
    val fullPost = AnnIndex.assignTop(full, k1, cb1, cb2)
    val fullCodes = AnnIndex.encode(fullPost, cb)
    assert(incPost.count() == fullPost.count() &&
      incPost.exceptAll(fullPost).isEmpty,
      "incremental postings must equal the frozen-book full rebuild")
    assert(incCodes.count() == fullCodes.count() &&
      incCodes.exceptAll(fullCodes).isEmpty,
      "incremental codes must equal the frozen-book full rebuild")
  }

  test("delete maintenance: erasing keys equals the frozen-book rebuild over survivors, codes included") {
    // the q161 equality contract, codes half included (q161's in-query
    // require keeps the postings half; this pins the pointwise twin):
    // assignment and encoding are per-row under frozen books, so
    // erasure commutes with the build — filter(assign(full)) ==
    // assign(filter(full)), and likewise for codes.
    val full = n
    val survPred = col("vec_id") % 5 =!= 1
    val k1 = AnnIndex.k1Of(full.count()) // books frozen on FULL corpus
    val (cb1, cb2) = AnnIndex.subBooks(full, k1)
    val asgF = AnnIndex.assignTop(full, k1, cb1, cb2)
    val cb = AnnIndex.residualBook(asgF)
    val codesF = AnnIndex.encode(asgF, cb)
    // maintenance semantics: delete matching index rows in place
    val maintained = asgF.filter(survPred)
    val maintainedCodes = codesF.filter(survPred)
    // rebuild under the SAME frozen books over the surviving corpus
    val rePost = AnnIndex.assignTop(full.filter(survPred), k1, cb1, cb2)
    val reCodes = AnnIndex.encode(rePost, cb)
    assert(maintained.count() == rePost.count() &&
      maintained.exceptAll(rePost).isEmpty,
      "deleted postings must equal the survivor rebuild")
    assert(maintainedCodes.count() == reCodes.count() &&
      maintainedCodes.exceptAll(reCodes).isEmpty,
      "deleted codes must equal the survivor rebuild")
  }

  test("encodePasses counts corpus-side encode constructions only") {
    val k1 = AnnIndex.k1Of(n.count())
    val (cb1, cb2) = AnnIndex.subBooks(n, k1)
    val before = AnnIndex.encodePasses.get()
    val asg = AnnIndex.assignTop(n, k1, cb1, cb2)
    val cb = AnnIndex.residualBook(asg)
    val codes = AnnIndex.encode(asg, cb)
    assert(AnnIndex.encodePasses.get() == before + 2)
    // search construction must not bump the counter (q157's require)
    AnnIndex.search(n.filter(col("vec_id") < 20), k1, cb1, cb2, cb, asg,
      codes, rerank = None, nprobe = AnnIndex.nprobeOf(k1 * k1))
    assert(AnnIndex.encodePasses.get() == before + 2)
  }
}
