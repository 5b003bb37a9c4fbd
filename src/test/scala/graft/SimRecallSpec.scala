package graft

/** ANN quality contract: the multi-probe IVF search (q82, nprobe=4 of
  * ~14 cells ⇒ ~29% of the table scanned per probe) must recall a
  * meaningful fraction of the exact top-5 (q43). Measured 0.59 at
  * sf0.001 / 0.52 at sf0.01 on the near-uniform synthetic embeddings —
  * the floor asserts the mechanism (cell ranking + in-cell exact
  * scoring) rather than a lucky corpus. Single-bucket LSH (q46) is
  * intentionally NOT held to this bar: on near-uniform vectors its
  * bucket-collision probability is ~2⁻⁸ per plane-agreement, so it
  * retrieves planted near-dups (q63's regime), not uniform top-k.
  */
class SimRecallSpec extends SparkTestBase {

  test("IVF multi-probe search recalls >= 40% of the exact top-5") {
    val exact = SparkEntry.queries("q43_cosine_topk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val ivf = SparkEntry.queries("q82_ivf_search")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    assert(ivf.keySet === exact.keySet, "every probe must return results")
    val recall5 = ivf.map { case (q, ns) => (exact(q) & ns).size / 5.0 }
    val mean = recall5.sum / recall5.size
    assert(mean >= 0.4, f"IVF recall@5 $mean%.2f below contract floor 0.40")
  }
}
