package graft.plans

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Logical as-of join: every left row is joined to the single right row
  * with equal keys and the greatest `rightTime <= leftTime`; left rows
  * with no such match keep null right columns (LEFT OUTER semantics —
  * the same contract as DuckDB's `ASOF LEFT JOIN`, the reference
  * semantics for q50/q64).
  *
  * This is the one operator in the engine that earns a custom
  * LogicalPlan + Strategy + SparkPlan (SURVEY.md §7.4 preference (c)):
  * Spark has no single built-in for it, and both compositions have a
  * structural cost the native operator avoids —
  *   - naive `join(key, t_r <= t_l) + max-per-left-row` fans out m×n
  *     rows per key before re-aggregating;
  *   - the union-timeline + `last(ignoreNulls)` window (q50) carries
  *     BOTH tables through one sort and emits/filters the union.
  * The native plan instead co-partitions the two inputs on the key
  * (one shuffle each, exactly like a sort-merge join), sorts by
  * (key, time), and streams BOTH sides once with a two-pointer merge —
  * no fan-out, no union, O(|L|+|R|) per partition, spill handled by
  * the standard sort operators underneath.
  *
  * Analysis: the node is constructed from already-analyzed children
  * with resolved attributes, so the analyzer sees it fully resolved;
  * Catalyst treats the unknown BinaryNode conservatively (no predicate
  * pushdown through it), which is sound.
  *
  * Null semantics: a null time on either side never matches (SQL
  * comparison semantics); null-time right rows are consumed and
  * discarded by the merge. Ties on (key, rightTime) resolve to the
  * last row in sort order — callers that need determinism must make
  * (key, rightTime) unique on the right (q64 pre-aggregates).
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {

  /** As-of LEFT join by column name; right columns must not collide
    * with left ones (rename beforehand) and the two frames must be
    * distinct plans (no direct self-join — wrap one side in select). */
  def asofLeft(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val lPlan = GraftBridge.analyzed(left)
    val rPlan = GraftBridge.analyzed(right)
    def resolve(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asofLeft: column '$n' not in [${p.output.map(_.name).mkString(", ")}]"))
    require(leftKeys.size == rightKeys.size, "asofLeft: key lists must align")
    // Guard the documented preconditions explicitly — violated, they
    // would otherwise surface as silently wrong results, not errors:
    // (1) a direct self-join gives both sides the same attribute ids,
    // so key/time expressions on the right would bind to LEFT columns
    // in the merged row (Spark's Join analyzer dedups attribute ids;
    // this custom node intentionally does not).
    val sharedIds = lPlan.outputSet.intersect(rPlan.outputSet)
    if (sharedIds.nonEmpty) throw new IllegalArgumentException(
      s"asofLeft: left and right share attribute id(s) for " +
        s"[${sharedIds.map(_.name).mkString(", ")}] — direct self-joins are " +
        "not supported; re-alias one side first (e.g. " +
        "df.select(df.columns.map(c => col(c).as(c)): _*)) so its " +
        "attributes get fresh ids")
    // (2) colliding output names make the joined frame's duplicate
    // columns unselectable by name downstream.
    val nameClash = lPlan.output.map(_.name).toSet
      .intersect(rPlan.output.map(_.name).toSet)
    if (nameClash.nonEmpty) throw new IllegalArgumentException(
      s"asofLeft: output column name(s) [${nameClash.mkString(", ")}] appear " +
        "on both sides — rename the right-side columns before joining")
    val node = AsofJoin(
      lPlan, rPlan,
      leftKeys.map(resolve(lPlan, _)), rightKeys.map(resolve(rPlan, _)),
      resolve(lPlan, leftTime), resolve(rPlan, rightTime))
    GraftBridge.ofRows(left.sparkSession, node)
  }
}

/** Plans the logical [[AsofJoin]] as [[SortMergeAsofJoinExec]];
  * injected via `GraftExtensions.injectPlannerStrategy`. */
class AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt) =>
      SortMergeAsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
