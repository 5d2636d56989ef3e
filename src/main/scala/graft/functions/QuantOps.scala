package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** `sign_bits(array<long>, start, len) → long`: a `len`-bit (≤ 32) sign
  * signature — bit j set iff `qv(start + j) > 0`. Two calls (halves 0-31
  * and 32-63) give a 64-dim signature as two NON-NEGATIVE longs, which is
  * what keeps the DuckDB mirror trivial: `SUM(1::BIGINT << (i-1))` terms
  * never touch the sign bit, where a single 64-bit signature would wrap
  * negative on bit 63 in one engine and not the other.
  *
  * Codegen'd for the same reason as [[ScaleFloor]]: signature extraction
  * runs once per corpus row (the full-scan hot path of binary-quantized
  * ANN), so it must stay inside WholeStageCodegen. */
case class SignBits(child: Expression, start: Int, len: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if len >= 0 && len <= 32 && start >= 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"sign_bits supports at most 32 bits per call, got len=$len start=$start")
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_bits requires array<long>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    SignBits.bits(a.asInstanceOf[ArrayData], start, len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.SignBits.bits($a, $start, $len)")

  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)

  override def prettyName: String = "sign_bits"
}

object SignBits {

  /** Static so generated code calls it directly. */
  def bits(a: ArrayData, start: Int, len: Int): Long = {
    val n = a.numElements()
    var sig = 0L
    var j = 0
    while (j < len && start + j < n) {
      if (a.getLong(start + j) > 0L) sig |= (1L << j)
      j += 1
    }
    sig
  }

  def sign_bits(c: Column, start: Int, len: Int): Column =
    ColumnBridge.column(SignBits(ColumnBridge.expression(c), start, len))
}

/** `int8_quant_stats(array<long>) → struct(absmax, n_sat, err_l1)`: absmax
  * int8 quantization of a [[ScaleFloor]]-quantized vector, entirely in
  * integer arithmetic so the DuckDB oracle reproduces it bit for bit:
  *
  *   absmax = max |q_i|
  *   code_i = sgn(q_i) · ⌊|q_i|·127 / absmax⌋        (0 when absmax = 0)
  *   err_l1 = Σ |q_i − sgn(code_i)·⌊|code_i|·absmax / 127⌋|
  *   n_sat  = #{i : |code_i| = 127}
  *
  * Divisions run on NON-NEGATIVE operands (sign split out first), so JVM
  * truncation and SQL `//` agree — no floor-vs-trunc ambiguity on
  * negatives. |q_i| ≤ ~4e6 keeps every product below 2^40.
  *
  * This is the storage-compression stage of an embedding pipeline (4x
  * smaller than float32 at a measured reconstruction error); the stats are
  * the quality signal you'd monitor at 100 TB. Map-side only. */
case class Int8QuantStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Int8QuantStats.Out

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"int8_quant_stats requires array<long>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    Int8QuantStats.stats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Int8QuantStats.stats($a)")

  override protected def withNewChildInternal(
      newChild: Expression): Int8QuantStats = copy(child = newChild)

  override def prettyName: String = "int8_quant_stats"
}

object Int8QuantStats {

  val Out: StructType = StructType(Seq(
    StructField("absmax", LongType, nullable = false),
    StructField("n_sat", LongType, nullable = false),
    StructField("err_l1", LongType, nullable = false)))

  /** Static so generated code calls it directly. */
  def stats(a: ArrayData): InternalRow = {
    val n = a.numElements()
    var absmax = 0L
    var i = 0
    while (i < n) {
      val q = a.getLong(i)
      val aq = if (q < 0) -q else q
      if (aq > absmax) absmax = aq
      i += 1
    }
    var nSat = 0L
    var errL1 = 0L
    i = 0
    while (i < n) {
      val q = a.getLong(i)
      val aq = if (q < 0) -q else q
      val aCode = if (absmax == 0) 0L else aq * 127L / absmax
      if (aCode == 127L) nSat += 1
      val aRecon = aCode * absmax / 127L
      val diff = aq - aRecon // |q| ≥ |recon| by construction: diff ≥ 0
      errL1 += diff
      i += 1
    }
    new GenericInternalRow(Array[Any](absmax, nSat, errL1))
  }

  def int8_quant_stats(c: Column): Column =
    ColumnBridge.column(Int8QuantStats(ColumnBridge.expression(c)))
}
