package graft.sources

import org.apache.spark.sql.{Column, GraftBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Analyzer rules that make loglake's row-level SQL work — the Delta
  * architecture (DeltaAnalysis): resolved `MERGE INTO` / `DELETE FROM`
  * / `UPDATE` plans over a [[LogLakeCatalog]] table lower onto the SAME
  * commit-log operations as the path API, and every remaining catalog
  * READ relation is swapped for the native V1 relation
  * ([[LogLakeProvider.relation]]) so SQL scans get the identical
  * vectorized-parquet + stats-skipping + pushdown plan as
  * `spark.read.format("loglake")`. Injected by [[graft.GraftExtensions]].
  *
  * Scale posture: the rule itself only moves plan nodes; all data
  * movement stays inside the lowered operations, which rewrite
  * touched-file volume, never table volume.
  */
class LogLakeSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The catalog target of a DML command, seen through its alias. */
  private object LakeTarget {
    def unapply(p: LogicalPlan): Option[LogLakeV2Table] = p match {
      case r: DataSourceV2Relation => r.table match {
        case t: LogLakeV2Table => Some(t)
        case _ => None
      }
      case SubqueryAlias(_, child) => unapply(child)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // DML roots wait un-touched until fully resolved, then lower whole;
    // rewriting their target relation early would orphan the command.
    case d @ DeleteFromTable(LakeTarget(t), cond) =>
      if (!d.resolved) plan
      else {
        requireNoSubquery(cond, "DELETE")
        requireCurrent(t, "DELETE")
        LogLakeDeleteCommand(t.dir, GraftBridge.column(unresolve(cond)))
      }
    case u @ UpdateTable(LakeTarget(t), assignments, cond) =>
      if (!u.resolved) plan
      else {
        cond.foreach(requireNoSubquery(_, "UPDATE"))
        requireCurrent(t, "UPDATE")
        val set = assignments.map { a =>
          val name = a.key match {
            case att: Attribute => att.name
            case other => fail(
              s"loglake UPDATE can only set top-level columns, got ${other.sql}")
          }
          name -> GraftBridge.column(unresolve(a.value))
        }
        LogLakeUpdateCommand(t.dir, set,
          cond.map(c => GraftBridge.column(unresolve(c)))
            .getOrElse(org.apache.spark.sql.functions.lit(true)))
      }
    case m @ MergeIntoTable(LakeTarget(t), source, mergeCond,
        matched, notMatched, notMatchedBySource, _) =>
      if (!m.resolved) plan
      else {
        requireCurrent(t, "MERGE")
        val keyCols = mergeKeys(m, mergeCond)
        if (isCanonicalUpsert(m, matched, notMatched, notMatchedBySource))
          // the canonical upsert keeps its dedicated lowering (no
          // full-outer join — anti-join + union of whole source)
          LogLakeMergeCommand(t.dir, rewriteReads(source), keyCols)
        else
          LogLakeMergeClausesCommand(t.dir, rewriteReads(source), keyCols,
            lowerClauses(m, matched, notMatched, notMatchedBySource))
      }
    case _ => rewriteReads(plan)
  }

  /** Swap every loglake catalog relation in a READ position for the
    * native V1 relation, preserving the original output attribute ids
    * (parents hold references to them). V2 write commands keep their
    * `table` side untouched — only their source query is rewritten. */
  private def rewriteReads(plan: LogicalPlan): LogicalPlan = plan match {
    case w: V2WriteCommand => w.withNewQuery(rewriteReads(w.query))
    case _ => plan.resolveOperators {
      case r: DataSourceV2Relation if r.table.isInstanceOf[LogLakeV2Table] =>
        val t = r.table.asInstanceOf[LogLakeV2Table]
        val rel = LogicalRelation(
          LogLakeProvider.relation(spark, t.dir, t.asOf), isStreaming = false)
        val byName = rel.output.map(a => a.name -> a).toMap
        Project(r.output.map { old =>
          val fresh = byName.getOrElse(old.name, throw new IllegalStateException(
            s"loglake: column ${old.name} missing from snapshot of ${t.dir}"))
          Alias(fresh, old.name)(exprId = old.exprId, qualifier = old.qualifier)
        }, rel)
    }
  }

  /** `ON` must be an equi-conjunction pairing identically-named target
    * and source columns — those names are the upsert key. */
  private def mergeKeys(m: MergeIntoTable, cond: Expression): Seq[String] = {
    val targetIds = m.targetTable.outputSet
    val sourceIds = m.sourceTable.outputSet
    def keys(e: Expression): Seq[String] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) => keys(l) ++ keys(r)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if (targetIds.contains(a) && sourceIds.contains(b)) ||
             (targetIds.contains(b) && sourceIds.contains(a)) =>
        if (!a.name.equalsIgnoreCase(b.name)) fail(
          s"loglake MERGE ON pairs differently-named columns ${a.name}/${b.name}")
        Seq(a.name)
      case other => fail(s"loglake MERGE supports equi-key ON clauses, got ${other.sql}")
    }
    keys(cond)
  }

  /** The canonical upsert — exactly `WHEN MATCHED THEN UPDATE SET *` +
    * `WHEN NOT MATCHED THEN INSERT *` (what [[LogLake.merge]]
    * implements as file-level copy-on-write without a full-outer
    * join); anything else lowers to [[LogLake.mergeClauses]]. */
  private def isCanonicalUpsert(m: MergeIntoTable,
      matched: Seq[MergeAction], notMatched: Seq[MergeAction],
      notMatchedBySource: Seq[MergeAction]): Boolean = {
    if (notMatchedBySource.nonEmpty) return false
    val sourceIds = m.sourceTable.outputSet
    def isStar(assigns: Seq[Assignment]): Boolean = {
      val targetCols = m.targetTable.output.map(_.name).toSet
      val covered = assigns.flatMap { a =>
        (a.key, a.value) match {
          case (k: Attribute, v: AttributeReference)
              if sourceIds.contains(v) && k.name.equalsIgnoreCase(v.name) =>
            Some(k.name)
          // analyzer-aligned casts around the source column are fine
          case (k: Attribute, Cast(v: AttributeReference, _, _, _))
              if sourceIds.contains(v) && k.name.equalsIgnoreCase(v.name) =>
            Some(k.name)
          case _ => None
        }
      }.toSet
      covered == targetCols
    }
    (matched, notMatched) match {
      case (Seq(UpdateAction(None, up, _)), Seq(InsertAction(None, ins))) =>
        isStar(up) && isStar(ins)
      case _ => false
    }
  }

  /** Resolved MERGE actions → the [[LogLake.MergeClause]] ADT: every
    * target attribute becomes `target.<name>`, every source attribute
    * `source.<name>` — the names [[LogLake.mergeClauses]]'s joined
    * structs expose, so the stored expressions re-resolve as plain
    * nested-field access at run time. */
  private def lowerClauses(m: MergeIntoTable,
      matched: Seq[MergeAction], notMatched: Seq[MergeAction],
      notMatchedBySource: Seq[MergeAction]): Seq[LogLake.MergeClause] = {
    val targetIds = m.targetTable.outputSet
    val sourceIds = m.sourceTable.outputSet
    def sideRef(e: Expression): Expression = e.transform {
      case a: AttributeReference if targetIds.contains(a) =>
        UnresolvedAttribute(Seq("target", a.name))
      case a: AttributeReference if sourceIds.contains(a) =>
        UnresolvedAttribute(Seq("source", a.name))
    }
    def colOf(e: Expression): Column = GraftBridge.column(sideRef(e))
    def setOf(assigns: Seq[Assignment]): Map[String, Column] =
      assigns.map { a =>
        val name = a.key match {
          case att: Attribute => att.name
          case other => fail(
            s"loglake MERGE can only assign top-level columns, got ${other.sql}")
        }
        name -> colOf(a.value)
      }.toMap
    import LogLake.MergeClause._
    matched.map {
      case UpdateAction(c, up, _) => MatchedUpdate(c.map(colOf), setOf(up))
      case DeleteAction(c) => MatchedDelete(c.map(colOf))
      case other => fail(s"loglake MERGE: unsupported matched action $other")
    } ++ notMatched.map {
      case InsertAction(c, ins) => NotMatchedInsert(c.map(colOf), setOf(ins))
      case other => fail(s"loglake MERGE: unsupported not-matched action $other")
    } ++ notMatchedBySource.map {
      case UpdateAction(c, up, _) =>
        NotMatchedBySourceUpdate(c.map(colOf), setOf(up))
      case DeleteAction(c) => NotMatchedBySourceDelete(c.map(colOf))
      case other =>
        fail(s"loglake MERGE: unsupported not-matched-by-source action $other")
    }
  }

  private def fail(msg: String): Nothing =
    throw new UnsupportedOperationException(msg)

  private def requireCurrent(t: LogLakeV2Table, op: String): Unit =
    if (t.asOf.nonEmpty)
      fail(s"loglake: $op cannot target a time-travelled snapshot")

  private def requireNoSubquery(e: Expression, op: String): Unit =
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      fail(s"loglake: $op conditions with subqueries are not supported")

  /** Resolved target attributes → plain names, so the stored condition
    * re-resolves against the fresh scan the lowered operation makes. */
  private def unresolve(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }
}

/** `DELETE FROM <loglake table> WHERE cond` — lowered run-time to the
  * path API's copy-on-write delete (only matching files rewrite), the
  * V1-command equivalent of Delta's DeleteCommand. The condition's
  * attributes travel unresolved, as a [[Column]] (opaque to
  * checkAnalysis — a raw unresolved Expression field would fail the
  * analyzer's no-unresolved-attributes sweep), and re-bind by name
  * against the fresh scan the lowered delete makes. */
final case class LogLakeDeleteCommand(dir: String, cond: Column)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LogLake.delete(spark, dir, cond)
    Nil
  }
}

/** `UPDATE <loglake table> SET ... WHERE cond`. */
final case class LogLakeUpdateCommand(dir: String, set: Seq[(String, Column)],
    cond: Column) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LogLake.update(spark, dir, cond, set.toMap)
    Nil
  }
}

/** `MERGE INTO <loglake table> USING src ON <equi-keys> WHEN MATCHED
  * THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` — the canonical
  * upsert, lowered to [[LogLake.merge]] (file-level copy-on-write:
  * rewrite cost tracks touched-file volume, never table volume). */
final case class LogLakeMergeCommand(dir: String, source: LogicalPlan,
    keyCols: Seq[String]) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    LogLake.merge(spark, dir, GraftBridge.ofRows(spark, source), keyCols)
    Nil
  }
}

/** The general MERGE clause matrix — `WHEN MATCHED [AND cond] THEN
  * UPDATE SET …/DELETE`, `WHEN NOT MATCHED [AND cond] THEN INSERT …`,
  * `WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE/DELETE` —
  * lowered to [[LogLake.mergeClauses]] (one full-outer join over
  * touched-file volume; clause walk as a single codegen'd CASE). */
final case class LogLakeMergeClausesCommand(dir: String, source: LogicalPlan,
    keyCols: Seq[String], clauses: Seq[LogLake.MergeClause])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    LogLake.mergeClauses(spark, dir, GraftBridge.ofRows(spark, source),
      keyCols, clauses)
    Nil
  }
}
