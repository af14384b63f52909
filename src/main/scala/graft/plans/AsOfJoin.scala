package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeSet, BindReferences, Expression,
  GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The AS-OF JOIN as a NATIVE Catalyst operator — rung (c) of the
  * extension ladder (SURVEY §7.3): a custom `LogicalPlan` node, an
  * optimizer `Rule` (right-side column pruning through the node, which
  * Catalyst's built-in pruning cannot see), a planner `SparkStrategy`,
  * and a physical `SparkPlan` whose execution is the textbook
  * partitioned merge — registered via [[graft.functions.GraftSparkExtensions]]
  * or per-session through `experimental` methods (see [[AsOf.join]]).
  *
  * Semantics (identical to the composed form `Relational.eventOrderAsof`
  * and to DuckDB's native `ASOF LEFT JOIN`, which oracles both): every
  * left row is paired with the LATEST right row of equal key whose time
  * is at or before the left row's time; left rows with no such right
  * row emit null payload columns. Null times never match (SQL `<=`
  * semantics); null keys group like any other key value.
  *
  * Scale shape vs the composed union+window form: both sides hash-
  * partition and sort independently (the SortMergeJoin shape — map-side
  * local sort, one shuffle each), and the merge streams with O(1)
  * state per partition: ONE buffered payload row, no window frame, no
  * union of the two schemas through a single sort, no null-padded
  * side/time columns riding the shuffle. At 100 TB the win is the
  * smaller shuffle payload (each side ships only its own columns) and
  * the constant-memory probe.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    payloadSrc: Seq[Expression],
    payloadOut: Seq[Attribute]) extends BinaryNode {

  // payloadOut are PRE-MINTED AttributeReferences, not Aliases: the
  // analyzer's CleanupAliases strips Alias nodes from expressions of
  // non-Project operators, which would silently rename the outputs

  require(AsOfJoin.timeTypeOk(leftTime) && AsOfJoin.timeTypeOk(rightTime),
    s"as-of time columns must be long microseconds or timestamps, got " +
      s"${leftTime.dataType} / ${rightTime.dataType}")
  // both sides hash-partition INDEPENDENTLY and the merge compares the
  // right key through an ordering built from the left key's type — a
  // type mismatch (int vs long keys, TIMESTAMP vs TIMESTAMP_NTZ times)
  // would not fail, it would silently mis-route or mis-pair rows, so
  // reject it at construction
  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types must match across sides, got " +
      s"${leftKey.dataType} / ${rightKey.dataType}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types must match across sides (TIMESTAMP and " +
      s"TIMESTAMP_NTZ compare raw micros with different semantics), got " +
      s"${leftTime.dataType} / ${rightTime.dataType}")
  require(payloadSrc.length == payloadOut.length,
    "payloadSrc and payloadOut must align")

  override def output: Seq[Attribute] = left.output ++ payloadOut

  // the payload attributes are minted HERE, not by a child — without
  // this the analyzer reports them "missing from input"
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Times compare as their Long internal form: micros since epoch for
    * both timestamp flavors, raw micros for LongType.
    */
  private[plans] def timeTypeOk(e: Expression): Boolean = e.dataType match {
    case LongType | TimestampType | TimestampNTZType => true
    case _ => false
  }
}

/** Column pruning THROUGH the custom node: Catalyst's `ColumnPruning`
  * does not know [[AsOfJoin]], so without this rule both children
  * would scan and shuffle every column of their tables. The right
  * child is self-contained — the operator consumes only its key, time,
  * and payload inputs. The left child streams through unchanged, so
  * its needed set comes from the consumer: a `Project` directly above
  * the node. With both cases the projection reaches the parquet scan
  * (`ReadSchema` shrinks) exactly as it does for built-in joins; the
  * rule runs in the fixed-point operator-optimization batch, so the
  * pushed `Project`s keep sinking toward the scans.
  */
object PruneAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // left side: keep what the consumer references plus the join inputs
    case p @ Project(projectList, j: AsOfJoin) =>
      val needed = AttributeSet(projectList.flatMap(_.references) ++
        j.leftKey.references ++ j.leftTime.references)
      val keep = j.left.output.filter(needed.contains)
      if (keep.length == j.left.output.length) p
      else p.copy(child = j.copy(left = Project(keep, j.left)))
    // right side: self-contained on the node
    case j @ AsOfJoin(_, right, _, rk, _, rt, payloadSrc, _) =>
      val needed = AttributeSet(rk.references ++ rt.references ++
        payloadSrc.flatMap(_.references))
      val keep = right.output.filter(needed.contains)
      if (keep.length == right.output.length) j
      else j.copy(right = Project(keep, right))
  }
}

/** Plans the logical node to [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, ps, po) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, ps, po) :: Nil
    case _ => Nil
  }
}

/** Physical partitioned-merge as-of join.
  *
  * Requirements declare the SortMergeJoin shape: both children hash-
  * clustered on their key (EnsureRequirements co-partitions them, AQE
  * may coalesce both consistently) and sorted by (key asc, time asc) —
  * so `zipPartitions` sees two key-aligned sorted streams and the merge
  * is a single forward pass: advance the right iterator while it is at
  * or before the current left row, remembering only the latest
  * same-key payload. O(left + right) per partition, O(1) state.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    payloadSrc: Seq[Expression],
    payloadOut: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // Ascending (nulls first) on both — the merge's key ordering below
  // must agree with these sorts or the pass misses groups
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  /** Streams left rows through unchanged: partitioning/ordering survive. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val payloadExprs = payloadSrc
    val pOut = payloadOut
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val outAttrs = output
    val keyType = leftKey.dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // per-partition, executor-side construction (no driver capture)
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rOut)
      val lTimeBound = BindReferences.bindReference(lTimeExpr, lOut)
      val rTimeBound = BindReferences.bindReference(rTimeExpr, rOut)
      val payloadProj = UnsafeProjection.create(payloadExprs, rOut)
      // the SAME natural ascending (nulls-first) ordering the
      // requiredChildOrdering sorts with
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ pOut)
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(payloadExprs.size)

      val rBuf = rIter.buffered
      // latest same-key match so far: its key (copied) and payload (copied)
      var matchKey: UnsafeRow = null
      var matchPayload: UnsafeRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lT = lTimeBound.eval(lRow)
        var scanning = true
        while (scanning && rBuf.hasNext) {
          val rRow = rBuf.head
          val cmp = keyOrd.compare(rKeyProj(rRow), lKey)
          if (cmp < 0) {
            rBuf.next() // right is on an earlier key: skip, never a match
          } else if (cmp == 0) {
            val rT = rTimeBound.eval(rRow)
            if (rT == null) {
              rBuf.next() // null time matches nothing; consume
            } else if (lT != null &&
                rT.asInstanceOf[Long] <= lT.asInstanceOf[Long]) {
              // at-or-before: this is the latest candidate so far
              matchKey = lKey.copy()
              matchPayload = payloadProj(rRow).copy()
              rBuf.next()
            } else scanning = false // right is ahead in time: stop
          } else scanning = false // right is on a later key: stop
        }
        val p =
          if (lT != null && matchKey != null && keyOrd.compare(matchKey, lKey) == 0)
            matchPayload
          else nullPayload
        outProj(joined(lRow, p))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
