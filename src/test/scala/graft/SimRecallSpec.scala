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

  test("IVF-PQ residual encoding + ADC re-rank recalls >= 60% of the exact top-5") {
    // round 14: q150 is IVFADC+R proper (Jégou et al. 2011) — residual
    // codes over the normalized integer space shortlist top-40 by ADC
    // from 8-byte codes at nprobe=8 (double q82's nprobe — ADC
    // candidates cost 8 bytes, so probing twice the cells is still 16×
    // cheaper per candidate than the exact in-cell scan), then the
    // shortlist re-ranks by the exact integer dot (40 full-vector
    // reads per query, bounded I/O). Measured 0.93 at sf0.001 / 0.88
    // at sf0.01 / 0.67 at sf0.1 on this worst-case near-uniform
    // corpus — ABOVE q82's exact-in-cell 0.59/0.52/0.36, because the
    // byte budget buys coverage. The raw-subvector, no-rerank ancestor
    // measured 0.47/0.38/0.31.
    val mean = graft.tools.Recall.ivfPqRecallAt5(spark, sfDir)
    assert(mean >= 0.6, f"IVF-PQ recall@5 $mean%.2f below contract floor 0.60")
  }
}
