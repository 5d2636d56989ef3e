package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** `scale_floor(array<float>) → array<long>`: element-wise
  * `floor((double)x * 1e6)` — the exact integer quantization that lets
  * k-means (q47) run Lloyd's algorithm entirely on BIGINTs. Each float→
  * double conversion is exact, the ×1e6 is one correctly-rounded IEEE
  * multiply, and the floor is exact — so Spark and DuckDB (`FLOOR(CAST(x
  * AS DOUBLE) * 1e6)`) produce the same longs element for element.
  *
  * Codegen'd for the same reason as [[FixedPointDot]]: a `transform` HOF
  * lambda evaluates interpreted; this is one static call per row. */
case class ScaleFloor(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"scale_floor requires array<float>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    ScaleFloor.scale(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ScaleFloor.scale($a)")

  override protected def withNewChildInternal(newChild: Expression): ScaleFloor =
    copy(child = newChild)

  override def prettyName: String = "scale_floor"
}

object ScaleFloor {
  final val Scale = 1e6

  /** Static so generated code calls it directly. */
  def scale(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(a.getFloat(i).toDouble * Scale).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  def scale_floor(c: Column): Column =
    ColumnBridge.column(ScaleFloor(ColumnBridge.expression(c)))
}

/** `long_sq_dist(array<long>, array<long>) → long`: exact squared
  * Euclidean distance `Σ (a_i − b_i)²` on quantized vectors. With
  * |element| ≤ ~4e6 ([[ScaleFloor]] of unit-scale floats) a squared term
  * is ≤ ~6.4e13 and a 64-dim sum ≤ ~4e15 — far below 2^63, so the
  * arithmetic can't overflow in either engine and the result is
  * bit-identical everywhere (`SUM((a.v-b.v)*(a.v-b.v))` in DuckDB). */
case class LongSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_sq_dist requires two array<long> arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    LongSqDist.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.LongSqDist.sqDist($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongSqDist =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "long_sq_dist"
}

object LongSqDist {

  /** Static so generated code calls it directly. */
  def sqDist(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  def long_sq_dist(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongSqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
