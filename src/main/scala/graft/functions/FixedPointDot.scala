package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

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

  /** Column API: the scaled-long dot; divide by [[Scale]] for the double. */
  def fixed_point_dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FixedPointDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
