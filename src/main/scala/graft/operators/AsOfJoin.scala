package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the single most recent right row
  * with the same key and `rightTs < leftTs` (strict) — the time-series
  * "latest value at or before" join Spark lacks natively.
  *
  * Implementation is the composition (preference (a) in SURVEY.md §2B's
  * custom-operator ladder — no custom LogicalPlan needed because built-ins
  * express the semantics exactly): tag and UNION the two inputs, sort each
  * key's rows by (ts, tag) within one window, and carry the last non-null
  * right payload forward (`last(..., ignoreNulls)` over rows unbounded
  * preceding). Left rows then hold exactly the most recent prior right row.
  *
  * Scale shape: ONE shuffle of |left|+|right| rows keyed by the join key,
  * then a per-key sort — versus the naive equi-join + rank approach whose
  * intermediate is |left| × |matching rights| (quadratic on hot keys).
  * Strictness is encoded in the sort tag (left rows sort BEFORE right rows
  * at equal timestamps, so an equal-ts right row is not yet visible).
  */
object AsOfJoin {

  /** @param left       driving rows
    * @param right      lookup rows; its columns (minus key/ts) are attached
    * @param key        equality key column name (present in both)
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param rightCols  right payload columns to carry (renamed as given)
    */
  def latestPrior(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Map[String, String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag 0 = left, 1 = right; at equal ts the left sorts FIRST → strict <
    val taggedLeft = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(0))
      .select(Seq(col(key), col("__ts"), col("__tag")) ++
        leftCols.filterNot(_ == key).map(col) ++
        rightCols.values.toSeq.map(n => lit(null).as(s"__r_$n")): _*)
    val taggedRight = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__tag", lit(1))
      .select(Seq(col(key), col("__ts"), col("__tag")) ++
        leftCols.filterNot(_ == key).map(n => lit(null).as(n)) ++
        rightCols.map { case (src, dst) => col(src).as(s"__r_$dst") }.toSeq: _*)

    // Sort order: ts ASC, then tag ASC (left=0 before right=1 at equal ts,
    // so an equal-ts right row is not yet visible → strict <). The payload
    // columns are the final tiebreak: with duplicate right rows per
    // (key, rightTs) the window order would otherwise be unspecified and
    // `last(..., ignoreNulls)` would pick a partitioning-dependent row.
    // With the tiebreak the greatest payload tuple deterministically wins.
    // (If payload columns can be null independently, the carried columns
    // may mix source rows — inherent to per-column carry-forward; rows
    // with fully non-null payloads always win as a unit.)
    val payloadTiebreak = rightCols.values.toSeq.sorted.map(n => col(s"__r_$n"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts") +: col("__tag") +: payloadTiebreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightCols.values.foldLeft(taggedLeft.unionByName(taggedRight)) {
      case (df, n) =>
        df.withColumn(s"__c_$n", last(col(s"__r_$n"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__tag") === 0)
      .select(leftCols.map(col) ++
        rightCols.values.toSeq.map(n => col(s"__c_$n").as(n)): _*)
  }

  /** The same semantics through the custom Catalyst operator
    * ([[graft.plans.AsOfJoinPlan]] → [[graft.plans.AsOfJoinExec]]) —
    * preference (c) of the ladder: a co-partitioned one-pass streaming
    * merge instead of the union + window composition. Same signature,
    * same output, interchangeable with [[latestPrior]]; OperatorSpec
    * asserts row-for-row agreement and q44 runs it against the same
    * DuckDB ASOF oracle as q17.
    *
    * The planner strategy is registered idempotently on the session's
    * `experimental.extraStrategies` (also available declaratively via
    * `GraftExtensions`). */
  def latestPriorExec(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Map[String, String]
  ): DataFrame = {
    import org.apache.spark.sql.graft.SqlShims
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy

    // rename the right key/ts so the joined output has no duplicate names
    val rightSel = right.select(
      col(key).as("__asof_k") +: col(rightTs).as("__asof_ts") +:
        rightCols.map { case (src, dst) => col(src).as(dst) }.toSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightSel.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    val plan = graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, "__asof_k"),
      attr(lPlan, leftTs), attr(rPlan, "__asof_ts"))
    SqlShims.ofRows(spark, plan)
      .select(left.columns.toSeq.map(col) ++
        rightCols.values.toSeq.map(col): _*)
  }
}
