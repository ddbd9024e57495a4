// In the org.apache.spark.sql package tree: a whole-operator extension
// (LogicalPlan + Strategy + SparkPlan) needs Dataset.ofRows and the
// catalyst execution internals.
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Logical AS-OF join: for each left row, the latest right row with
  * `right.ts <= left.ts` on the same key. The operator Spark lacks as
  * a first-class plan node — this is the (c)-tier extension path:
  * custom LogicalPlan + SparkStrategy + SparkPlan (SURVEY §4.3),
  * alternative to the union+window composition in
  * graft.ext.EventWindows.asofJoin (same semantics, one shuffle+sort
  * per side, no union row blowup, and the right side ships only its
  * payload columns through the merge).
  *
  * `asofOutput` attributes are fixed at construction so exprIds stay
  * stable across plan copies.
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    key: String,
    ts: String,
    payload: Seq[String],
    asofOutput: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ asofOutput

  // the asof_* attributes are minted by this operator, not inherited
  override def producedAttributes: AttributeSet = AttributeSet(asofOutput)

  // the node has no catalyst expressions, so its references would
  // default to empty and ColumnPruning would strip the children; it
  // consumes every left column and the right key/ts/payload
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output.filter(a =>
      a.name == key || a.name == ts || payload.contains(a.name)))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Physical AS-OF join: both children hash-clustered on the key and
  * sorted by (key, ts) — the SortMergeJoin shape — then merged with a
  * single forward pass per partition. Carries O(1) state per key (the
  * latest right payload), so hot keys cost a scan, never a cross
  * product. Ordering/partitioning requirements are declared; Spark's
  * EnsureRequirements inserts the exchanges and sorts, and AQE can
  * re-plan them like any join stage.
  */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    key: String,
    ts: String,
    payload: Seq[String],
    asofOutput: Seq[Attribute]) extends BinaryExecNode {

  private def lKey = left.output.find(_.name == key).get
  private def lTs = left.output.find(_.name == ts).get
  private def rKey = right.output.find(_.name == key).get
  private def rTs = right.output.find(_.name == ts).get
  private def rPayload: Seq[Attribute] =
    (ts +: payload).map(c => right.output.find(_.name == c).get)

  override def output: Seq[Attribute] = left.output ++ asofOutput

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(lKey)), ClusteredDistribution(Seq(rKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(lKey, Ascending), SortOrder(lTs, Ascending)),
      Seq(SortOrder(rKey, Ascending), SortOrder(rTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(lKey, Ascending), SortOrder(lTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(lKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(lTs.dataType)
    val lKeyIdx = left.output.indexOf(lKey)
    val lTsIdx = left.output.indexOf(lTs)
    val rKeyIdx = right.output.indexOf(rKey)
    val rTsIdx = right.output.indexOf(rTs)
    val keyDt = lKey.dataType
    val tsDt = lTs.dataType
    val payloadAttrs = rPayload
    val rightOutput = right.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      // project the matched right row down to (ts, payload...)
      val payloadProj = UnsafeProjection.create(payloadAttrs, rightOutput)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullPayload = new GenericInternalRow(payloadAttrs.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var rHeadValid = false
        private var carriedKey: Any = _
        private var carried: InternalRow = _ // latest payload ≤ current l.ts

        // advances to the next right row with non-null key AND ts —
        // SQL join semantics: null never matches, so such rows can
        // never be carried and are dropped at the source
        private def advanceRight(): Unit = {
          rHeadValid = false
          while (!rHeadValid && rIt.hasNext) {
            rHead = rIt.next()
            rHeadValid =
              !(rHead.isNullAt(rKeyIdx) || rHead.isNullAt(rTsIdx))
          }
          if (!rHeadValid) rHead = null
        }
        advanceRight()

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val l = lIt.next()
          val lk = l.get(lKeyIdx, keyDt)
          val lt = l.get(lTsIdx, tsDt)
          // SQL join semantics: a null key or ts never matches. Nulls
          // sort first under Ascending, so right null rows are skipped
          // up front and left null rows emit the null payload without
          // disturbing the merge state.
          if (lk == null || lt == null) {
            return resultProj(joined(l, nullPayload))
          }
          // drop carried state when the left key moves on
          if (carried != null && keyOrd.compare(
              carriedKey.asInstanceOf[AnyRef],
              lk.asInstanceOf[AnyRef]) != 0) {
            carried = null
          }
          // consume right rows with key < lk (useless: left is sorted,
          // no future left row has a smaller key) or key == lk with
          // ts <= lt (candidates; last one wins)
          var advancing = true
          while (rHeadValid && advancing) {
            val rk = rHead.get(rKeyIdx, keyDt)
            val c = keyOrd.compare(rk.asInstanceOf[AnyRef],
              lk.asInstanceOf[AnyRef])
            if (c < 0) advanceRight()
            else if (c == 0 && tsOrd.compare(
                rHead.get(rTsIdx, tsDt).asInstanceOf[AnyRef],
                lt.asInstanceOf[AnyRef]) <= 0) {
              carried = payloadProj(rHead).copy()
              // copy: for non-primitive keys (UTF8String, Binary) rk
              // is a view into the reused sorter row and would mutate
              // on the next advanceRight()
              carriedKey = InternalRow.copyValue(rk)
              advanceRight()
            } else advancing = false
          }
          resultProj(joined(l,
            if (carried != null) carried else nullPayload))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner rule mapping the logical node to the physical operator. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, key, ts, payload, asofOutput) =>
      AsofJoinExec(planLater(l), planLater(r), key, ts, payload,
        asofOutput) :: Nil
    case _ => Nil
  }
}

/** DataFrame entry point for the native AS-OF join. */
object AsofJoin {

  /** Install the strategy into the session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy

  /** Same contract as graft.ext.EventWindows.asofJoin: left
    * (key, ts, ...), right (key, ts, payload...) with at most one row
    * per (key, ts); emits left columns + asof_ts + asof_<payload>.
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String,
                     ts: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.distinct.length == payloadCols.length &&
      !payloadCols.contains(ts),
      s"payloadCols must be distinct and must not repeat the ts " +
        s"column '$ts' — the carried projection would mint duplicate " +
        "asof_ output attributes (ambiguous downstream)")
    val spark = left.sparkSession.asInstanceOf[SparkSession]
    install(spark)
    val rightPlan = right.queryExecution.analyzed
    // key/ts presence and type agreement validate HERE, with the
    // column named — the physical operator's .find(...).get would
    // otherwise throw a bare NoSuchElementException at plan time (or
    // a ClassCastException mid-task on a key-type mismatch, since the
    // merge ordering is built from the left side's type alone).
    // Matching is case-SENSITIVE (the node resolves by exact name).
    val leftPlan = left.queryExecution.analyzed
    def col(side: String, plan: LogicalPlan, c: String) =
      plan.output.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"asofJoinNative: $side side lacks column $c " +
            s"(have: ${plan.output.map(_.name).mkString(", ")}; " +
            "matching is case-sensitive)"))
    for (c <- Seq(key, ts)) {
      val l = col("left", leftPlan, c)
      val r = col("right", rightPlan, c)
      if (l.dataType != r.dataType)
        throw new IllegalArgumentException(
          s"asofJoinNative: column $c is ${l.dataType.simpleString} " +
            s"on the left but ${r.dataType.simpleString} on the right")
    }
    val asofAttrs = (ts +: payloadCols).map { c =>
      val a = rightPlan.output.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"right side lacks column $c"))
      AttributeReference(s"asof_$c", a.dataType, nullable = true)()
    }
    org.apache.spark.sql.classic.Dataset.ofRows(spark, AsofJoinNode(
      left.queryExecution.analyzed, rightPlan, key, ts, payloadCols,
      asofAttrs))
  }
}
