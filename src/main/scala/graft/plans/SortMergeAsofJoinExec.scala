package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Physical as-of LEFT join: co-partition both inputs on the key (the
  * same one-shuffle-per-side contract as a sort-merge join), require
  * (key, time) ascending order — EnsureRequirements inserts the
  * exchanges and sorts, so spilling is owned by the standard sort — and
  * stream both sides once per partition with a two-pointer merge.
  *
  * Per left row the merge keeps the LAST right row whose key equals the
  * left key and whose time is <= the left time: because both cursors
  * move in (key, time) order, each right row is examined exactly once
  * across the whole partition — O(|L|+|R|), zero fan-out, constant
  * state (one buffered right row + one match). Null semantics match
  * SQL: a null key or null time on either side never matches.
  *
  * Two merge loops share that structure:
  *  - a primitive fast path when the key is a single attribute and both
  *    key and time are physically long (bigint / timestamp / ntz — the
  *    typical time-series shape): ordinal `getLong` access, no
  *    projections, no boxing;
  *  - a generic path for compound or non-long keys: unsafe key
  *    projections compared with a natural row ordering, boxed time
  *    ordering.
  * Not whole-stage-codegen'd: the operator's win is shuffle/fan-out
  * shape (each table shuffled once, nothing resident), not per-row
  * arithmetic; the fast path keeps per-row cost at plain-field-access
  * level.
  */
case class SortMergeAsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // left rows stream through in input order, so the left sort survives
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  private def physicallyLong(dt: DataType): Boolean = dt match {
    case LongType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** ordinal of `e` in `attrs` when it is a direct column reference */
  private def ordinalOf(e: Expression, attrs: Seq[Attribute]): Option[Int] = e match {
    case a: AttributeReference =>
      val i = attrs.indexWhere(_.exprId == a.exprId)
      if (i >= 0) Some(i) else None
    case _ => None
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val fastOrdinals = if (leftKeys.size == 1 &&
        physicallyLong(leftKeys.head.dataType) && physicallyLong(leftTime.dataType))
      for {
        lk <- ordinalOf(leftKeys.head, left.output)
        rk <- ordinalOf(rightKeys.head, right.output)
        lt <- ordinalOf(leftTime, left.output)
        rt <- ordinalOf(rightTime, right.output)
      } yield (lk, rk, lt, rt)
    else None
    fastOrdinals match {
      case Some((lk, rk, lt, rt)) => executeFast(lk, rk, lt, rt)
      case None => executeGeneric()
    }
  }

  /** single long key + long time: primitive two-pointer merge */
  private def executeFast(lKeyIdx: Int, rKeyIdx: Int, lTimeIdx: Int, rTimeIdx: Int): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val outAttrs = output
    val rWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rWidth)

      var rBuf: InternalRow = null  // next unconsumed right row (copy)
      var rKey = 0L
      var matchRow: InternalRow = null
      var matchKey = 0L

      lIter.map { l =>
        if (l.isNullAt(lKeyIdx) || l.isNullAt(lTimeIdx)) {
          // null key/time never matches; right cursor stays parked
          numOutputRows += 1
          resultProj(joined(l, nullRight))
        } else {
          val lKey = l.getLong(lKeyIdx)
          val lTime = l.getLong(lTimeIdx)
          if (matchRow != null && matchKey != lKey) matchRow = null
          var advance = true
          while (advance) {
            if (rBuf == null) {
              if (rIter.hasNext) {
                val r = rIter.next()
                // null right key/time never matches anything: consume it
                if (!r.isNullAt(rKeyIdx) && !r.isNullAt(rTimeIdx)) {
                  rBuf = r.copy()
                  rKey = rBuf.getLong(rKeyIdx)
                }
              } else advance = false
            }
            if (rBuf != null) {
              if (rKey < lKey) rBuf = null                       // right behind: discard
              else if (rKey > lKey) advance = false              // right ahead: park it
              else if (rBuf.getLong(rTimeIdx) <= lTime) {
                matchRow = rBuf; matchKey = rKey                 // later rows may still fit
                rBuf = null
              } else advance = false                             // right time ahead: park it
            }
          }
          numOutputRows += 1
          if (matchRow != null) resultProj(joined(l, matchRow))
          else resultProj(joined(l, nullRight))
        }
      }
    }
  }

  /** compound / non-long keys: projected unsafe keys + row orderings */
  private def executeGeneric(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyTypes = leftKeys.map(_.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType).asInstanceOf[Ordering[Any]]
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val ltBound = BindReferences.bindReference(leftTime, lOut)
    val rtBound = BindReferences.bindReference(rightTime, rOut)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // separate projection instances per side: each reuses its own
      // buffer, so two rows compared at once must come from different
      // projections (or be copies)
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      var rBuf: InternalRow = null
      var rBufKey: UnsafeRow = null
      var matchRow: InternalRow = null
      var matchKey: UnsafeRow = null

      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTime = ltBound.eval(l)
        if (lKey.anyNull || lTime == null) {
          numOutputRows += 1
          resultProj(joined(l, nullRight))
        } else {
          if (matchKey != null && keyOrd.compare(matchKey, lKey) != 0) {
            matchRow = null; matchKey = null
          }
          var advance = true
          while (advance) {
            if (rBuf == null) {
              if (rIter.hasNext) {
                val r = rIter.next()
                val rk = rKeyProj(r)
                if (!rk.anyNull && rtBound.eval(r) != null) {
                  rBuf = r.copy()
                  rBufKey = rk.copy()
                }
              } else advance = false
            }
            if (rBuf != null) {
              val cmp = keyOrd.compare(rBufKey, lKey)
              if (cmp < 0) { rBuf = null; rBufKey = null }       // right behind: discard
              else if (cmp > 0) advance = false                  // right ahead: park it
              else if (timeOrd.lteq(rtBound.eval(rBuf), lTime)) {
                matchRow = rBuf; matchKey = rBufKey              // later rows may still fit
                rBuf = null; rBufKey = null
              } else advance = false                             // right time ahead: park it
            }
          }
          numOutputRows += 1
          if (matchRow != null) resultProj(joined(l, matchRow))
          else resultProj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SortMergeAsofJoinExec =
    copy(left = newLeft, right = newRight)
}
