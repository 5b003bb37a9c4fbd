package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Shared ANN-recall metric: one definition of the q82-vs-q43 recall@5
  * computation, consumed by both `SimRecallSpec` (the contract floor)
  * and `RecallProbe` (the dev harness) so the two cannot drift if the
  * query output schema changes.
  */
object Recall {

  /** (query vec -> neighbor-id set) from a top-k query's (q_id, rnk,
    * neighbor, ...) output. */
  def topSets(spark: SparkSession, sfDir: String, name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  /** Mean recall@5 of the IVF multi-probe search against the exact
    * brute-force top-5. */
  def ivfRecallAt5(spark: SparkSession, sfDir: String): Double =
    recallAt5(spark, sfDir, "q82_ivf_search")

  /** Mean recall@5 of the IVF-PQ (code-byte ADC) search against the
    * exact brute-force top-5 — what 8-byte codes give up vs q82's
    * exact in-cell floats. */
  def ivfPqRecallAt5(spark: SparkSession, sfDir: String): Double =
    recallAt5(spark, sfDir, "q150_ivf_pq")

  private def recallAt5(spark: SparkSession, sfDir: String,
      name: String): Double = {
    val exact = topSets(spark, sfDir, "q43_cosine_topk")
    val ann = topSets(spark, sfDir, name)
    require(ann.keySet == exact.keySet, "every probe must return results")
    val recall = ann.map { case (q, ns) => (exact(q) & ns).size / 5.0 }
    recall.sum / recall.size
  }
}
