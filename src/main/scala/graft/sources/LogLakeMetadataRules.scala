package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Metadata-only `COUNT(*)` (Delta's OptimizeMetadataOnlyDeltaQuery):
  * an unfiltered, ungrouped `count(*)` over a loglake snapshot is
  * answered from the manifest — Σ per-file rows minus DV-masked rows,
  * both recorded exactly at commit time by the stats aggregate — and
  * the whole scan collapses to a [[LocalRelation]]. At 100 TB this is
  * the difference between a row-count dashboard query reading zero
  * bytes and reading every file's footer-to-last-page.
  *
  * Applies ONLY when every aggregate is a plain non-distinct,
  * unfiltered `count(literal≠null)` with no grouping, over a bare (or
  * projected) loglake relation — any Filter/join/grouping above the
  * scan leaves the plan untouched. Both snapshot read paths
  * participate: the native [[LogLakeFileIndex]] scan and the
  * DV-masking [[LogLakeDvRelation]] fallback (whose count subtracts
  * each file's deletion-vector cardinality). */
class LogLakeMetadataOnlyCountRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case a @ Aggregate(groupingExprs, aggExprs, child, _)
        if groupingExprs.isEmpty && aggExprs.nonEmpty &&
          aggExprs.forall(isCountStar) =>
      exactCount(child) match {
        case Some(n) =>
          LocalRelation(a.output,
            Seq(InternalRow.fromSeq(Seq.fill(aggExprs.size)(n))))
        case None => a
      }
  }

  private def isCountStar(e: NamedExpression): Boolean = e match {
    case Alias(AggregateExpression(Count(Seq(l: Literal)), _, false, None, _), _) =>
      l.value != null // count(NULL) counts nothing; stats can't serve it
    case _ => false
  }

  /** The child must be a bare loglake snapshot scan — a pass-through
    * [[Project]] is fine (count(1) evaluates none of it; column
    * pruning empties it anyway), anything else bails. */
  private def exactCount(plan: LogicalPlan): Option[Long] = plan match {
    case Project(_, child) => exactCount(child)
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation => h.location match {
        case idx: LogLakeFileIndex => Some(idx.exactRowCount)
        case _ => None
      }
      case r: LogLakeDvRelation => Some(r.exactRowCount)
      case _ => None
    }
    case _ => None
  }
}
