package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components via large-star / small-star
  * alternation (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) — the dedup-cluster resolver behind q83.
  *
  * Why not min-label propagation: its round count is the GRAPH DIAMETER
  * (a chain-shaped near-dup cluster of k docs needs k full-data passes).
  * The star alternation contracts path length geometrically, so rounds
  * are O(log n) regardless of shape — the difference between 8 and 250
  * passes on a 250-hop chain, and the property that makes the plan
  * shippable at 100 TB where cluster shapes are adversarial.
  *
  * Scale shape per round: two groupBy-min + self-join passes, every one
  * an equi-shuffle on the node id; the driver sees ONE fingerprint row
  * per round (count + hash sum, a single job — the old per-round
  * `isEmpty` second job is gone), never data. The fingerprint is
  * probabilistic, so the final labeling is additionally VERIFIED with
  * one join: every input edge must connect identically-labeled nodes.
  * Consistency across all edges + (lbl ≤ node, lbl a member of the
  * component) proves each label is exactly the component minimum — a
  * false convergence raises instead of returning silently non-minimal
  * clusters.
  */
object Cc {

  /** Large-star: every node connects its LARGER neighbors to the
    * minimum of its neighborhood (including itself). Operates on the
    * symmetrized edge list; the groupBy and the join shuffle on the
    * same key.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("a").as("u"), col("b").as("v"))
      .unionByName(e.select(col("b").as("u"), col("a").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    // distinct is load-bearing for cost, not correctness: smallStar's
    // group-min would tolerate duplicates, but relabeling collapses
    // many edges onto few (a, min) pairs, and deduping before the next
    // shuffle was measured faster than carrying the multiset
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("a"), col("m").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Small-star: orient every edge toward its larger endpoint, then
    * each node connects its (all smaller) neighbors — and itself — to
    * the smallest of them.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e.select(greatest(col("a"), col("b")).as("u"),
      least(col("a"), col("b")).as("v"))
    val mins = or.groupBy("u").agg(min("v").as("m"))
    or.join(mins, "u")
      .select(explode(array(col("v"), col("u"))).as("a"), col("m").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** @param nodes single `node` column — ALL vertices (isolated ones included)
    * @param edges  `a`,`b` columns — undirected edges (self-loops ignored)
    * @return (labels `[node, lbl]` with lbl = min node id of the
    *         component, persisted and materialized; rounds used)
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 40): (DataFrame, Int) = {
    // persisted: feeds both round 0 and the final edge-consistency
    // check — without this the verification would recompute the whole
    // upstream edge pipeline (for q83, the MinHash candidate join)
    val in = edges.select(col("a"), col("b")).filter(col("a") =!= col("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var curCache = in.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    // truncateLineage: each round builds on a flat LogicalRDD over the
    // previous round's cache, not on the full accumulated iterative
    // plan — without this, Catalyst re-analysis cost grows every round
    // and dominates by round ~10
    var cur = org.apache.spark.sql.GraftBridge.truncateLineage(curCache)
    var fp: (Long, Long) = (-1L, -1L)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val nextCache = smallStar(largeStar(cur)).persist(StorageLevel.MEMORY_AND_DISK)
      // ONE action per round: the aggregate both materializes the
      // persist and yields the convergence fingerprint (edge count +
      // order-independent XOR of per-edge hashes — XOR, not sum, so it
      // cannot overflow under ANSI; the edge set is distinct so XOR
      // cancellation of repeated elements cannot occur).
      val row = nextCache
        .agg(count(lit(1)),
          coalesce(bit_xor(xxhash64(col("a"), col("b"))), lit(0L)))
        .head()
      val nfp = (row.getLong(0), row.getLong(1))
      converged = nfp == fp
      fp = nfp
      curCache.unpersist()
      curCache = nextCache
      cur = org.apache.spark.sql.GraftBridge.truncateLineage(nextCache)
      rounds += 1
    }
    require(converged,
      s"connected components did not converge within $rounds rounds")

    // Converged state is a star per component, every edge (x → component
    // min); nodes absent from the `a` side (centers, isolated) label
    // themselves.
    val perNode = cur.groupBy(col("a").as("node")).agg(min("b").as("mn"))
    val lastCache = curCache
    val labels = nodes.select(col("node"))
      .join(perNode, Seq("node"), "left_outer")
      .select(col("node"),
        coalesce(least(col("mn"), col("node")), col("node")).as("lbl"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Soundness gate (runs once, not per round): a labeling that
    // disagrees across any ORIGINAL edge means the fingerprint declared
    // convergence falsely — fail loudly.
    val bad = in
      .join(labels.select(col("node").as("a"), col("lbl").as("la")), "a")
      .join(labels.select(col("node").as("b"), col("lbl").as("lb")), "b")
      .filter(col("la") =!= col("lb"))
    require(bad.isEmpty,
      "connected components labeling inconsistent across an input edge")
    lastCache.unpersist()
    in.unpersist()
    (labels, rounds)
  }
}
