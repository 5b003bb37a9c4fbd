package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{StringType, StructField}
import org.apache.spark.unsafe.types.UTF8String

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
    // GROUP BY <partition columns> + count(*): per-tuple counts from
    // the manifest's partition values — the partition-dashboard query
    // at zero data bytes (Hive's metadata-only query, kept exact here
    // because loglake counts are manifest-exact through DVs)
    case a @ Aggregate(groupingExprs, aggExprs, child, _)
        if groupingExprs.nonEmpty &&
          groupingExprs.forall(_.isInstanceOf[AttributeReference]) =>
      val groupAttrs = groupingExprs.map(_.asInstanceOf[AttributeReference])
      // each output is a grouping attribute (possibly aliased) or count(*)
      val shape: Option[Seq[Either[Attribute, Unit]]] =
        traverseOpt(aggExprs) {
          case at: AttributeReference
              if groupAttrs.exists(_.semanticEquals(at)) => Some(Left(at))
          case Alias(at: AttributeReference, _)
              if groupAttrs.exists(_.semanticEquals(at)) => Some(Left(at))
          case e if isCountStar(e) => Some(Right(()))
          case _ => None
        }
      (shape, bareLakeScan(child)) match {
        case (Some(outs), Some(counts))
            if aggExprs.exists(isCountStar) =>
          counts(groupAttrs.map(_.name)) match {
            case Some((fields, groups)) =>
              val zone = Some(SQLConf.get.sessionLocalTimeZone)
              val byName = groupAttrs.map(_.name).zipWithIndex.toMap
              // a tuple with zero live rows (e.g. only empty files)
              // emits NO group, exactly like the scan it replaces
              val rows = groups.toSeq.filter(_._2 > 0L).map { case (tuple, n) =>
                val typed = tuple.zip(fields).map { case (s, f) =>
                  if (s == LogLake.NullPartitionValue) null
                  else Cast(Literal(UTF8String.fromString(s), StringType),
                    f.dataType, zone).eval(InternalRow.empty)
                }
                InternalRow.fromSeq(outs.map {
                  case Left(at) => typed(byName(at.name))
                  case Right(_) => n
                })
              }
              LocalRelation(a.output, rows)
            case None => a
          }
        case _ => a
      }
  }

  private def traverseOpt[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val out = Seq.newBuilder[B]
    xs.foreach(x => f(x) match {
      case Some(b) => out += b
      case None => return None
    })
    Some(out.result())
  }

  private def isCountStar(e: NamedExpression): Boolean = e match {
    case Alias(AggregateExpression(Count(Seq(l: Literal)), _, false, None, _), _) =>
      l.value != null // count(NULL) counts nothing; stats can't serve it
    case _ => false
  }

  /** The child must be a bare loglake snapshot scan — a pass-through
    * [[Project]] is fine (count(1) evaluates none of it; column
    * pruning empties it anyway). A [[Filter]] whose predicate touches
    * ONLY partition columns still answers metadata-only: the predicate
    * is evaluated per live partition tuple (typed through the declared
    * partition types — identity partitioning makes it constant within
    * a tuple) and the matching tuples' counts sum. Any other filter
    * bails. */
  private def exactCount(plan: LogicalPlan): Option[Long] =
    exactCountPred(plan, Nil)

  private def exactCountPred(plan: LogicalPlan,
      preds: Seq[Expression]): Option[Long] = plan match {
    case Project(_, child) if preds.isEmpty => exactCountPred(child, preds)
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      exactCountPred(child, preds)
    case Filter(cond, child)
        if cond.deterministic &&
          !cond.exists(_.isInstanceOf[SubqueryExpression]) =>
      exactCountPred(child, preds :+ cond)
    case l: LogicalRelation =>
      val counts: Option[(Long, Seq[String] => Option[(Seq[StructField], Map[Seq[String], Long])])] =
        l.relation match {
          case h: HadoopFsRelation => h.location match {
            case idx: LogLakeFileIndex =>
              Some((idx.exactRowCount, idx.exactGroupCounts))
            case _ => None
          }
          case r: LogLakeDvRelation =>
            Some((r.exactRowCount, r.exactGroupCounts))
          case _ => None
        }
      counts.flatMap { case (total, grouped) =>
        if (preds.isEmpty) Some(total)
        else {
          val attrs = preds.flatMap(_.collect {
            case a: AttributeReference => a }).distinctBy(_.exprId)
          // every referenced column must be a partition column — the
          // grouped accessor returns None otherwise
          grouped(attrs.map(_.name)).flatMap { case (fields, groups) =>
            val zone = Some(SQLConf.get.sessionLocalTimeZone)
            val byId = attrs.zipWithIndex.map { case (a, i) => a.exprId -> i }.toMap
            val matchedSum = groups.toSeq.map { case (tuple, n) =>
              val typed = tuple.zip(fields).map { case (s, f) =>
                if (s == LogLake.NullPartitionValue) null
                else Cast(Literal(UTF8String.fromString(s), StringType),
                  f.dataType, zone).eval(InternalRow.empty)
              }
              val sat = preds.forall { p =>
                val bound = p.transform {
                  case a: AttributeReference =>
                    Literal(typed(byId(a.exprId)), a.dataType)
                }
                bound.eval(InternalRow.empty) == true
              }
              if (sat) n else 0L
            }.sum
            Some(matchedSum)
          }
        }
      }
    case _ => None
  }

  /** For the grouped case the Projects between Aggregate and relation
    * must be PURE prunes (plain attribute passthroughs) — an aliasing
    * or computing projection could detach a grouping attribute's name
    * from the table column it reads. Returns the partition-group-count
    * accessor when the child qualifies. */
  private def bareLakeScan(plan: LogicalPlan):
      Option[Seq[String] => Option[(Seq[StructField], Map[Seq[String], Long])]] =
    plan match {
      case Project(projectList, child)
          if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        bareLakeScan(child)
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location match {
          case idx: LogLakeFileIndex => Some(idx.exactGroupCounts)
          case _ => None
        }
        case r: LogLakeDvRelation => Some(r.exactGroupCounts)
        case _ => None
      }
      case _ => None
    }
}
