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
  * The metric itself lives in [[graft.tools.Recall]], shared with the
  * RecallProbe dev harness.
  */
class SimRecallSpec extends SparkTestBase {

  test("IVF multi-probe search recalls >= 40% of the exact top-5") {
    val mean = graft.tools.Recall.ivfRecallAt5(spark, sfDir)
    assert(mean >= 0.4, f"IVF recall@5 $mean%.2f below contract floor 0.40")
  }

  test("IVF-PQ residual encoding + ADC re-rank recalls >= 80% of the exact top-5") {
    // q150 is IVFADC+R proper (Jégou et al. 2011) — residual codes
    // over the normalized integer space shortlist top-40 by ADC from
    // 8-byte codes at nprobe=8, then the shortlist re-ranks by the
    // exact integer dot (40 full-vector reads per query, bounded I/O).
    // Round 15 grows ncells ≈ √n with the corpus (32/128/256 at the
    // three SFs): per-probe scan volume turns sub-linear AND recall
    // RISES — finer cells localize candidates better under the same
    // re-rank budget. Measured 0.93 at sf0.001 / 0.88 at sf0.01 /
    // 0.95 at sf0.1 on this worst-case near-uniform corpus (the fixed
    // 32-cell round-14 form sat at 0.93/0.88/0.67; q82's exact
    // in-cell scan at 0.59/0.52/0.36).
    val mean = graft.tools.Recall.ivfPqRecallAt5(spark, sfDir)
    assert(mean >= 0.8, f"IVF-PQ recall@5 $mean%.2f below contract floor 0.80")
  }
}
