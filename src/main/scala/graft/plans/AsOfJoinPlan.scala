package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** The full custom-operator stack for the as-of join (preference (c) of
  * the custom-operator order): a resolved logical node, a planner
  * [[Strategy]], and a physical [[AsOfJoinExec]] that merges two
  * co-partitioned, key-and-time-sorted children in ONE streaming pass.
  *
  * Why a physical operator here: the composed form
  * ([[graft.operators.AsOfJoin.backward]]) unions both sides and runs a
  * `last(..., ignoreNulls)` window over the union — the union means the
  * LEFT rows are shuffled and sorted together with the right side's
  * payload columns, and the window carries its frame machinery per row.
  * The exec shuffles each side independently (left never carries right
  * payload bytes through its shuffle), sorts within partitions, and the
  * merge keeps O(1) state per partition: the last-seen right row for the
  * current key. Semantics are identical (`rightTs <= leftTs`, ties to
  * the greatest tie-break column) and gate-checked against the same
  * DuckDB ASOF JOIN oracle as the composed form.
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectPlannerStrategy`) or per-session with
  * [[AsOfJoinStrategy.install]].
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightTie: Attribute,
    rightVals: Seq[Attribute],
    // constructed ONCE by the caller and carried in the node so output
    // attribute ids stay stable across tree copies
    valOutput: Seq[Attribute]
) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length)
  require(rightVals.length == valOutput.length)
  // the exec compares timestamps via row.getLong: only long-backed types
  // are sound, anything else (int-backed DateType, DecimalType…) would
  // read garbage silently — fail at analysis instead
  for (ts <- Seq(leftTs, rightTs))
    require(
      ts.dataType.isInstanceOf[org.apache.spark.sql.types.TimestampType] ||
        ts.dataType.isInstanceOf[org.apache.spark.sql.types.TimestampNTZType] ||
        ts.dataType == org.apache.spark.sql.types.LongType,
      s"as-of ts column ${ts.name} must be timestamp/timestamp_ntz/long, got ${ts.dataType}")
  // …and the two sides must agree: TimestampType vs LongType (or NTZ)
  // both pass the long-backed check yet encode different units/epochs,
  // which would compare micros against raw longs garbage-style
  require(
    leftTs.dataType == rightTs.dataType,
    s"as-of ts columns must have the SAME type on both sides, " +
      s"got ${leftTs.dataType} vs ${rightTs.dataType}")
  override def output: Seq[Attribute] = left.output ++ valOutput
  // valOutput is produced HERE, not consumed from the children — without
  // this the analyzer counts the carried-value attrs as missing inputs
  override def producedAttributes: AttributeSet = AttributeSet(valOutput)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan
  ): AsOfJoinNode = copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {

  /** Idempotent per-session opt-in (sessions built with
    * `spark.sql.extensions=graft.functions.GraftExtensions` get it
    * automatically).
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(
        planLater(n.left), planLater(n.right),
        n.leftKeys, n.rightKeys, n.leftTs, n.rightTs, n.rightTie,
        n.rightVals, n.output
      ) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge backward as-of join.
  *
  * Children are hash-clustered on their keys (EnsureRequirements
  * co-partitions the two sides) and sorted within partitions by
  * (keys, ts[, tie]); the merge advances a single right-side pointer per
  * partition and retains only the latest qualifying right row — O(1)
  * state, one pass, no window frames, no union. Null handling mirrors
  * the composed window form: null keys group together (window
  * partitionBy semantics, not SQL join-key semantics), right rows with
  * null ts never match, left rows with null ts match nothing.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightTie: Attribute,
    rightVals: Seq[Attribute],
    output: Seq[Attribute]
) extends BinaryExecNode {

  // the asof_* value attrs are minted by this operator
  override def producedAttributes: AttributeSet =
    AttributeSet(output.drop(left.output.length))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs :+ rightTie).map(SortOrder(_, Ascending))
  )

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val valCount = rightVals.length
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsAttr = leftTs
    val rTsAttr = rightTs
    val rValExprs = rightVals
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      // both projections emit the same key schema; natural ascending
      // ordering over it compares across sides (nulls group together —
      // the window-partitionBy semantics the composed form has)
      val keyOrd = GenerateOrdering.generate(
        keyTypes.zipWithIndex.map { case (dt, i) =>
          SortOrder(BoundReference(i, dt, nullable = true), Ascending)
        })
      val lTsOrdinal = lOut.indexWhere(_.exprId == lTsAttr.exprId)
      val rTsOrdinal = rOut.indexWhere(_.exprId == rTsAttr.exprId)
      val valProj = UnsafeProjection.create(rValExprs, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullVals: InternalRow = InternalRow.fromSeq(Seq.fill(valCount)(null))

      val rBuf = rIter.buffered
      var lastKey: UnsafeRow = null
      var lastVals: UnsafeRow = null

      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTsIsNull = l.isNullAt(lTsOrdinal)
        val lTsVal = if (lTsIsNull) Long.MinValue else l.getLong(lTsOrdinal)
        // advance the right pointer over every row at a smaller key, and —
        // when keys match and the left ts is non-null — over rows at or
        // before the left ts; the last qualifying row per key wins (input
        // is tie-sorted, so this is the greatest tie-break)
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rHead = rBuf.head
          val rKey = rKeyProj(rHead)
          val c = keyOrd.compare(rKey, lKey)
          val take =
            c < 0 ||
              (c == 0 && !lTsIsNull && !rHead.isNullAt(rTsOrdinal) &&
                rHead.getLong(rTsOrdinal) <= lTsVal) ||
              (c == 0 && rHead.isNullAt(rTsOrdinal)) // null-ts right rows: consume, never match
          if (take) {
            if (!rHead.isNullAt(rTsOrdinal)) {
              lastKey = rKey.copy()
              lastVals = valProj(rHead).copy()
            }
            rBuf.next()
            ()
          } else advancing = false
        }
        val vals =
          if (!lTsIsNull && lastKey != null && keyOrd.compare(lastKey, lKey) == 0) lastVals
          else nullVals
        resultProj(joined(l, vals))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan,
      newRight: SparkPlan
  ): AsOfJoinExec = copy(left = newLeft, right = newRight)
}
