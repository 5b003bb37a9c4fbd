package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared distributed exact-rank-pick kernel behind the percentile
  * family (q49 percentile_disc, q96 percentile_cont, q105 median/MAD):
  *
  *   1. group sizes via a BROADCAST count join — target ranks are known
  *      before any sort starts, and no unbounded-frame window has to
  *      buffer a whole group to count it;
  *   2. a per-group window SORT (externally spillable — the reason this
  *      shape survives a 100 TB group where percentile()'s single
  *      aggregation buffer does not) assigning `row_number`;
  *   3. the pick: `max(when(rank = target, value))` inside the ordinary
  *      partial+final group aggregate.
  *
  * Target-rank arithmetic stays integer (`(p·n + d − 1) DIV d` forms)
  * so no float rounding can shift a rank.
  */
object RankPick {

  /** Attach group sizes as column `n` (broadcast join, no window). */
  def withGroupSize(df: DataFrame, key: String): DataFrame =
    df.join(broadcast(df.groupBy(key).agg(count(lit(1)).as("n"))), key)

  /** The rank-pick aggregate: the value at 1-based rank `at` (a SQL
    * expression over `n`) in the ordering that produced `rank`. */
  def pick(rank: Column, at: String, v: String): Column =
    max(when(rank === expr(at), col(v)))

  /** percentile_disc target: smallest value with cume_dist ≥ p, as an
    * integer rank expression — ceil(p·n) = (num·n + den − 1) DIV den. */
  def discRank(num: Int, den: Int): String = s"($num * n + ${den - 1}) DIV $den"

  /** Median shorthand: ceil(n/2). */
  val MedianRank: String = "(n + 1) DIV 2"
}
