package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fixed-point dot product of two `array<float>` columns: returns
  * `Σ floor((double)a(i) * b(i) * 1e15)` as a long.
  *
  * The engine-exactness contract (see SimilarityQueries): float×float is
  * exact in double, the scaled floor is a correctly-rounded multiply + an
  * exact floor, and long addition is associative — so the result is
  * bit-identical in any engine/partitioning, and `result / 1e15` is a
  * deterministic double dot product.
  *
  * Why a custom expression: the unrolled `element_at` formulation (64 terms
  * × bounds checks) pushes the generated method past the whole-stage-codegen
  * size limit, silently dropping the stage to interpreted eval (observed
  * ~20x). This compiles to ONE static call with a tight JIT-friendly loop
  * over the primitive arrays.
  */
case class FixedPointDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fixed_point_dot requires two array<float> arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    FixedPointDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.FixedPointDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedPointDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "fixed_point_dot"
}

object FixedPointDot {
  final val Scale = 1e15

  /** Static so generated code calls it directly. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(a.getFloat(i).toDouble * b.getFloat(i).toDouble * Scale).toLong
      i += 1
    }
    acc
  }

  /** [[dot]] over only the first `n` elements — the Matryoshka-prefix
    * lane (q162's stage-1, q94's Cauchy–Schwarz prune): reads 16 floats
    * instead of 64 with NO per-pair slice allocation. Because each term
    * is floored independently, `dot(a,b) == dotN(a,b,n) + (suffix
    * terms)` EXACTLY — the fixed-point sum splits at any prefix. */
  def dotN(a: ArrayData, b: ArrayData, n: Int): Long = {
    val m = math.min(n, math.min(a.numElements(), b.numElements()))
    var acc = 0L
    var i = 0
    while (i < m) {
      acc += math.floor(a.getFloat(i).toDouble * b.getFloat(i).toDouble * Scale).toLong
      i += 1
    }
    acc
  }

  /** Column API: the scaled-long dot; divide by [[Scale]] for the double. */
  def fixed_point_dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FixedPointDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API: scaled-long dot of the first `n` elements. */
  def fixed_point_dot_prefix(a: Column, b: Column, n: Int): Column =
    ColumnBridge.column(FixedPointDotPrefix(
      ColumnBridge.expression(a), ColumnBridge.expression(b), n))

  /** Sentinel returned by [[dotGated]] for pruned pairs: so negative
    * that any downstream `dot/1e15/(na·nb) ≥ t` compare is false. */
  final val Pruned = Long.MinValue

  /** Gated dot (the q94 ball-cover verify kernel): compute the first
    * `p` fixed-point terms; if that partial sum is below `cutScaled`
    * — the caller's precomputed prune line, `(t−slack)·na·nb·1e15 −
    * nsa·nsb·1e15`, i.e. "even a maximal suffix contribution cannot
    * reach the threshold" by Cauchy–Schwarz — return [[Pruned]]
    * WITHOUT reading the remaining elements; otherwise finish the sum
    * and return the EXACT full dot (bit-identical to [[dot]]). One
    * expression dispatch per pair, no re-read of the prefix for
    * survivors. */
  def dotGated(a: ArrayData, b: ArrayData, cutScaled: Double, p: Int): Long = {
    val n = math.min(a.numElements(), b.numElements())
    val m = math.min(p, n)
    var acc = 0L
    var i = 0
    while (i < m) {
      acc += math.floor(a.getFloat(i).toDouble * b.getFloat(i).toDouble * Scale).toLong
      i += 1
    }
    if (acc.toDouble < cutScaled) return Pruned
    while (i < n) {
      acc += math.floor(a.getFloat(i).toDouble * b.getFloat(i).toDouble * Scale).toLong
      i += 1
    }
    acc
  }

  /** Column API for [[dotGated]]: exact full dot, or [[Pruned]] when the
    * prefix partial already proves the pair under threshold. */
  def fixed_point_dot_gated(
      a: Column, b: Column, cutScaled: Column, p: Int): Column =
    ColumnBridge.column(FixedPointDotGated(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      ColumnBridge.expression(cutScaled), p))
}

/** [[FixedPointDot.dotGated]] as a codegen'd expression — the
  * Cauchy–Schwarz-gated threshold verify: children are the two vectors
  * and the per-pair prune line (already scaled by 1e15). `p` is the
  * compile-time prefix width. Returns the exact dot for pairs the bound
  * admits, [[FixedPointDot.Pruned]] otherwise. */
case class FixedPointDotGated(
    first: Expression, second: Expression, third: Expression, p: Int)
    extends TernaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(first.dataType) && ok(second.dataType) &&
      third.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fixed_point_dot_gated requires (array<float>, array<float>, " +
        s"double), got ${children.map(_.dataType).mkString(", ")}")
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    FixedPointDot.dotGated(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], c.asInstanceOf[Double], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c) => s"graft.functions.FixedPointDot.dotGated($a, $b, $c, $p)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): FixedPointDotGated =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "fixed_point_dot_gated"
}

/** Fixed-point dot of the FIRST `n` elements of two `array<float>`
  * columns — [[FixedPointDot]] with a compile-time element bound, for
  * prefix-filter stages that must not pay a per-pair `slice` allocation
  * (the 16-of-64 Matryoshka lane). Same exactness contract. */
case class FixedPointDotPrefix(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fixed_point_dot_prefix requires two array<float> arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    FixedPointDot.dotN(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.FixedPointDot.dotN($a, $b, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedPointDotPrefix =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "fixed_point_dot_prefix"
}
