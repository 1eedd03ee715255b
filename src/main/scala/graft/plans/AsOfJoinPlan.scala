package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, ClusteredDistribution, Distribution,
  IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join: the logical-plan + strategy + physical-plan
  * extension tier (SURVEY.md §2.13 "custom vs built-in" ladder, step (c)).
  *
  * `AsOfJoin.asOf` expresses point-in-time lookup as union + window
  * (one shuffle, no pair expansion) — the best PLAN Catalyst's built-in
  * operators can reach. This node goes one step further and owns the
  * PHYSICAL execution: both sides hash-partition on the key and sort by
  * (key, time) — declared via `requiredChildDistribution` /
  * `requiredChildOrdering`, so `EnsureRequirements` plans the exchanges
  * and sorts exactly as it would for a sort-merge join — then a single
  * forward merge pass per partition emits each left row joined to the
  * latest right row with `r.time <= l.time`. Compared to the union+window
  * form it never materializes the unioned timeline, runs no window
  * buffering, and streams both sorted sides once: strictly less work per
  * partition at any scale, with the identical shuffle shape.
  *
  * Semantics match `AsOfJoin.asOf` exactly (ties at equal time: right row
  * visible; right side must be unique per (key, time); null keys group
  * together as in window partitioning; null times sort first = "before
  * everything"). Left-outer: unmatched left rows get null right columns.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  require(leftKeys.length == rightKeys.length, "as-of join key arity mismatch")
  // this node bypasses the analyzer's implicit-cast coercion, so enforce
  // type equality here — mismatched key/time types would otherwise
  // compare raw UnsafeRow bytes and return garbage instead of erroring
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of join key type mismatch: ${leftKeys.map(_.dataType)} vs " +
      s"${rightKeys.map(_.dataType)} — cast the sides to matching types first")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join time type mismatch: ${leftTime.dataType} vs ${rightTime.dataType}")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinNode → physical as-of join. Picks the
  * physical form by statistics, the same way Catalyst picks
  * BroadcastHashJoin: a right side under the session's
  * autoBroadcastJoinThreshold plans as [[BroadcastAsOfJoinExec]] (the
  * 100 TB-left × small-right case — NO shuffle or sort of the left side
  * at all), anything larger as the co-partitioned merge
  * [[AsOfJoinExec]]. Injected via `GraftExtensions` (session builder)
  * or self-registered by `AsOfJoin.asOfNative`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val rightSize = r.stats.sizeInBytes
      if (threshold > 0 && rightSize >= 0 && rightSize <= threshold)
        BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
      else
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join. Requirements (distribution + ordering) make
  * EnsureRequirements co-partition both children on the join key and
  * sort them by (key, time) — the same machinery sort-merge join uses,
  * so AQE partition coalescing stays consistent across the two sides.
  * Execution is then a zip of co-numbered partitions with a linear merge.
  */
/** Broadcast as-of join: the right side ships to every task as a
  * broadcast (EnsureRequirements plans the BroadcastExchange for the
  * declared BroadcastDistribution); each task builds a key → time-sorted
  * rows index once, then streams its left partition through hash lookup
  * + binary search. The left side keeps its partitioning, ordering, and
  * file layout — zero exchange, zero sort — which is the only as-of plan
  * that survives a 100 TB left input with a dimension-sized right.
  */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // the left side passes through untouched — downstream operators keep
  // whatever clustering/ordering it already had
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val timeTypes = Seq(leftTime.dataType)
    val outAttrs = output
    val broadcastRight = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions { lIter =>
      // key → rows sorted by time ascending (nulls first, matching the
      // shuffled exec's sort order)
      def buildIndex(): BroadcastAsOfJoinExec.Index = {
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
        val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
        val timeOrd = RowOrdering.createNaturalAscendingOrdering(timeTypes)
        val index = new java.util.HashMap[UnsafeRow, Array[(UnsafeRow, InternalRow)]]()
        val grouped = new java.util.HashMap[UnsafeRow, java.util.ArrayList[(UnsafeRow, InternalRow)]]()
        broadcastRight.value.foreach { r =>
          val k = rKeyProj(r).copy()
          val entry = (rTimeProj(r).copy(), r.copy(): InternalRow)
          val lst = grouped.get(k)
          if (lst != null) lst.add(entry)
          else { val l = new java.util.ArrayList[(UnsafeRow, InternalRow)](); l.add(entry); grouped.put(k, l) }
        }
        grouped.forEach { (k, lst) =>
          val arr = new Array[(UnsafeRow, InternalRow)](lst.size())
          lst.toArray(arr)
          java.util.Arrays.sort(arr,
            (a: (UnsafeRow, InternalRow), b: (UnsafeRow, InternalRow)) => timeOrd.compare(a._1, b._1))
          index.put(k, arr)
        }
        index
      }
      // tasks on the same executor share one built index per broadcast
      // instead of each re-grouping/sorting the broadcast rows — with a
      // huge left side that is thousands of tasks saved per executor
      val index =
        BroadcastAsOfJoinExec.cachedIndex(broadcastRight, () => buildIndex())
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(timeTypes)
      val joined = new JoinedRow
      val outProj =
        UnsafeProjection.create(outAttrs, leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.length)
      lIter.map { l =>
        val rows = index.get(lKeyProj(l))
        var best: InternalRow = null
        if (rows != null) {
          val lTime = lTimeProj(l)
          // binary search: greatest right time <= lTime
          var lo = 0; var hi = rows.length - 1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (timeOrd.compare(rows(mid)._1, lTime) <= 0) { best = rows(mid)._2; lo = mid + 1 }
            else hi = mid - 1
          }
        }
        outProj(joined(l, if (best != null) best else nullRight))
      }
    }
  }
}

object BroadcastAsOfJoinExec {
  type Index = java.util.HashMap[UnsafeRow, Array[(UnsafeRow, InternalRow)]]
  // Per-executor (per-JVM) cache of built indexes. Each task deserializes
  // its OWN Broadcast wrapper object from the task closure, so identity
  // keying (a WeakHashMap on the wrapper) never hits across tasks — the
  // key must be the stable (application, broadcast id) pair. The app id
  // disambiguates broadcast ids across SparkContexts in one JVM (ids
  // restart at 0). Bounded LRU eviction (a broadcast index can be large
  // and entries outlive the broadcast's lifecycle otherwise). Read-only
  // after construction, so sharing across tasks is safe; two tasks racing
  // on a miss may build twice — idempotent.
  private val MaxCached = 8
  // Values are SoftReferences so the cache never *pins* index memory:
  // up to MaxCached indexes stay reachable for reuse across tasks, but
  // under executor memory pressure the GC reclaims them (a cleared entry
  // is just a rebuild on next access). Without this, 8 concurrently-live
  // large broadcast as-of joins could strand gigabytes past the
  // broadcasts' own lifecycle.
  private val indexCache =
    new java.util.LinkedHashMap[(String, Long), java.lang.ref.SoftReference[Index]](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long), java.lang.ref.SoftReference[Index]])
          : Boolean =
        size() > MaxCached
    }
  private[plans] def cachedIndex(
      bc: org.apache.spark.broadcast.Broadcast[_], build: () => Index): Index = {
    val key = (org.apache.spark.SparkEnv.get.conf.getAppId, bc.id)
    val hit = indexCache.synchronized {
      val ref = indexCache.get(key)
      if (ref == null) null else ref.get() // null also when GC-cleared
    }
    if (hit != null) hit
    else {
      val built = build()
      indexCache.synchronized(
        indexCache.put(key, new java.lang.ref.SoftReference(built)))
      built
    }
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // keeps the key clustering + (key, time) ordering visible downstream so
  // a following same-key window/agg plans no re-exchange or re-sort
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTupExprs = leftKeys :+ leftTime
    val rTupExprs = rightKeys :+ rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val tupTypes = lTupExprs.map(_.dataType)
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTupProj = UnsafeProjection.create(lTupExprs, leftOut)
      val rTupProj = UnsafeProjection.create(rTupExprs, rightOut)
      // natural ascending = nulls-first ascending, matching the
      // requiredChildOrdering above — comparisons agree with the sort
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tupOrd = RowOrdering.createNaturalAscendingOrdering(tupTypes)
      val joined = new JoinedRow
      // bind against nullability-WIDENED right attributes: unmatched left
      // rows carry an all-null right side even when the right child's
      // schema says non-nullable, and a non-nullable binding would skip
      // the null check and read garbage zeros
      val outProj =
        UnsafeProjection.create(outAttrs, leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.length)
      val rBuf = rIter.buffered
      // latest right row consumed so far (copied: child iterators reuse
      // row buffers). Its key is projected fresh at emit time — one
      // reused-buffer projection per left row instead of a second copy
      // per consumed right row in the hot advance loop.
      var lastRight: InternalRow = null
      lIter.map { l =>
        val lTup = lTupProj(l)
        // consume every right row at-or-before (lKey, lTime) in the
        // lexicographic (key, time) order; rows of earlier keys pass
        // through harmlessly (key-equality is re-checked at emit)
        while (rBuf.hasNext && tupOrd.compare(rTupProj(rBuf.head), lTup) <= 0) {
          lastRight = rBuf.next().copy()
        }
        val matched =
          lastRight != null && keyOrd.compare(rKeyProj(lastRight), lKeyProj(l)) == 0
        outProj(joined(l, if (matched) lastRight else nullRight))
      }
    }
  }
}
