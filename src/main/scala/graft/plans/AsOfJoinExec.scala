package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** As-of join as a first-class Catalyst operator — preference (c) of the
  * custom-operator ladder (SURVEY.md §2B): a custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan`, for the one whole-operator semantic Spark
  * lacks natively. The composition form ([[graft.operators.AsOfJoin]],
  * union + window carry-forward) stays as the portable baseline; this
  * operator is the direct physical expression of the same semantics:
  *
  *   for every left row, attach the single right row with the same key and
  *   the greatest `rightTs < leftTs` (strict); left rows without a prior
  *   right row keep null right columns (left-outer flavor).
  *
  * Physical shape: EnsureRequirements co-partitions both sides on the key
  * (`ClusteredDistribution`) and sorts within partitions — left by
  * (key, ts), right by (key, ts, payload) — then each partition pair is
  * merged in ONE streaming pass holding exactly one retained right row.
  * Versus the union+window composition this skips the union of the two
  * inputs into one sort buffer and the per-column `last(ignoreNulls)`
  * window chain; versus an equi-join + filter + rank it never materializes
  * the |left|×|matching rights| intermediate. Memory per task is O(1)
  * beyond the sort, so a 1000-executor run is bound by the sort spill, not
  * the operator.
  *
  * Determinism: duplicate right rows per (key, ts) are resolved by the
  * required payload sort — the greatest whole payload tuple wins (the
  * composition's per-column carry has the same winner when payloads are
  * non-null; see its doc for the mixed-null caveat). Null handling: null
  * left keys/timestamps and null right keys/timestamps match nothing (SQL
  * join semantics — nulls sort first and are skipped in the merge).
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression
) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. Registered via
  * `GraftExtensions` (injectPlannerStrategy) or lazily through
  * `spark.experimental.extraStrategies` by the operator API. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKey, p.rightKey, p.leftTs, p.rightTs,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    left: SparkPlan,
    right: SparkPlan
) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  /** Both sides clustered on the key → EnsureRequirements inserts the
    * hash exchanges, and AQE coalesces small partitions, as for sort-merge
    * join. AQE skew SPLITTING does not apply: OptimizeSkewedJoin only
    * rewrites SortMergeJoinExec/ShuffledHashJoinExec, so a hot key still
    * lands on a single task — pre-salt or split hot keys upstream if an
    * as-of key is expected to be skewed at scale. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Left: (key, ts). Right: (key, ts, orderable payload columns) — the
    * payload suffix makes the retained row among duplicate (key, ts)
    * right rows deterministic regardless of partitioning or sort
    * stability. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      right.output
        .filter(a => org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(a.dataType))
        .map(a => SortOrder(a, Ascending)))

  /** The merge is left-driven and order-preserving. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyB = BindReferences.bindReference(leftKey, lOut)
    val lTsB = BindReferences.bindReference(leftTs, lOut)
    val rKeyB = BindReferences.bindReference(rightKey, rOut)
    val rTsB = BindReferences.bindReference(rightTs, rOut)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
      .asInstanceOf[Ordering[Any]]
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rNull = new GenericInternalRow(rOut.length)

      new Iterator[InternalRow] {
        // the one lookahead right row (NOT copied — consumed before the
        // iterator advances) and the one retained prior-match (copied)
        private var rCur: InternalRow = _
        private var rCurKey: Any = _
        private var rCurTs: Any = _
        private var haveR = false
        private var lastMatch: InternalRow = _ // copy
        private var lastMatchKey: Any = _      // re-evaluated on the copy

        private def advanceR(): Unit =
          if (rIter.hasNext) {
            rCur = rIter.next()
            rCurKey = rKeyB.eval(rCur)
            rCurTs = rTsB.eval(rCur)
            haveR = true
          } else haveR = false

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyB.eval(l)
          val lt = lTsB.eval(l)
          var matched: InternalRow = rNull
          if (lk != null && lt != null) {
            // consume right rows strictly before (lk, lt); the last one
            // with key == lk is the as-of match
            var scanning = true
            while (scanning && (haveR || rIter.hasNext)) {
              if (!haveR) advanceR()
              if (haveR) {
                if (rCurKey == null) haveR = false // null keys match nothing
                else {
                  val kc = keyOrd.compare(rCurKey, lk)
                  if (kc < 0) haveR = false // stale key — drop
                  else if (kc == 0 && rCurTs == null) haveR = false
                  else if (kc == 0 && tsOrd.compare(rCurTs, lt) < 0) {
                    // candidate: remember a COPY (the iterator reuses the
                    // row buffer), re-derive the key from the copy so the
                    // retained key can't alias that buffer either
                    lastMatch = rCur.copy()
                    lastMatchKey = rKeyB.eval(lastMatch)
                    haveR = false
                  } else scanning = false // at/after the left position
                }
              } else scanning = false
            }
            if (lastMatch != null && lastMatchKey != null &&
              keyOrd.compare(lastMatchKey, lk) == 0) matched = lastMatch
          }
          numOutputRows += 1
          proj(joined(l, matched))
        }
      }
    }
  }
}
