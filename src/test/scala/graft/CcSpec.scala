package graft

import org.apache.spark.sql.functions._
import graft.ops.Cc

/** Large-star/small-star connected components (q83's resolver).
  *
  * The load-bearing assertion is the ROUND BOUND on a long path graph:
  * a chain is the adversarial shape for label propagation (rounds =
  * diameter), and the entire point of the star alternation is to make
  * it converge in O(log n) rounds instead.
  */
class CcSpec extends SparkTestBase {
  import spark.implicits._

  private def df(pairs: Seq[(Long, Long)]) =
    pairs.toDF("a", "b")

  private def nodesDf(ids: Seq[Long]) =
    ids.toDF("node")

  test("chain of 256 converges in O(log n) rounds, labels = component min") {
    // ids permuted (bit-reversed within 8 bits) so the component min sits
    // mid-chain, not at an end — the worst case for one-directional sweeps
    def rev8(i: Long): Long =
      (0 until 8).foldLeft(0L)((acc, b) => (acc << 1) | ((i >> b) & 1L))
    val ids = (0L until 256L).map(rev8)
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq
    val (labels, rounds) = Cc.connectedComponents(nodesDf(ids), df(edges))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 256)
    assert(got.values.toSet == Set(0L), "every node labeled with the chain minimum")
    // diameter = 255; propagation would need ~255 rounds. log2(256) = 8;
    // allow the alternation constant factor, but stay far below diameter.
    assert(rounds <= 16, s"expected O(log n) rounds on a chain, got $rounds")
  }

  test("multiple components + isolated nodes label independently") {
    val edges = Seq((10L, 4L), (4L, 7L), (20L, 21L))
    val nodes = nodesDf(Seq(4L, 7L, 10L, 20L, 21L, 99L))
    val (labels, _) = Cc.connectedComponents(nodes, df(edges))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(4L -> 4L, 7L -> 4L, 10L -> 4L,
      20L -> 20L, 21L -> 20L, 99L -> 99L))
  }

  test("empty edge set: every node is its own cluster") {
    val nodes = nodesDf(Seq(1L, 2L, 3L))
    val (labels, _) = Cc.connectedComponents(nodes, spark.emptyDataset[(Long, Long)].toDF("a", "b"))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val edges = Seq((5L, 5L), (5L, 6L), (6L, 5L), (5L, 6L), (6L, 7L))
    val (labels, _) = Cc.connectedComponents(nodesDf(Seq(5L, 6L, 7L)), df(edges))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("star + chain mix: labels match brute-force union-find") {
    val rnd = new scala.util.Random(42)
    val n = 120
    val ids = rnd.shuffle((0 until 3000).toList).take(n).map(_.toLong)
    // random sparse graph over permuted ids
    val edges = (0 until 150).map { _ =>
      (ids(rnd.nextInt(n)), ids(rnd.nextInt(n)))
    }.filter(e => e._1 != e._2)
    // brute-force reference
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    val expect = ids.map(i => i -> find(i)).toMap
    val (labels, _) = Cc.connectedComponents(nodesDf(ids), df(edges))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }
}
