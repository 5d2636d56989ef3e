package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Binary-lifting span digests of a token array, all levels at once:
  * level 0 is `md5(token_i)` (lowercase hex, exactly Spark/DuckDB `md5`),
  * and level k at position i is `md5(hex_{k-1}(i) ++ hex_{k-1}(i+2^(k-1)))`
  * — one digest per (level, position), each covering a 2^k-token span,
  * k ≤ 6. Returns `array<struct<span: long, d: string>>` over every
  * level, ready to explode — with two emit-side reductions the q91
  * consumer previously paid a whole corpus-sized exchange for:
  *
  *  - the EMITTED digest is the first 16 hex chars (64-bit entropy —
  *    the shuffle key the consumer used anyway); the digest CHAINS stay
  *    full-width internally, so level-k composition is unchanged;
  *  - duplicate (span, digest) pairs WITHIN one document are dropped at
  *    emit (a per-row hash set): the consumer's contract is distinct
  *    (doc, span, digest) — "appears elsewhere" counts documents, not
  *    occurrences — and doing it here makes the downstream explode
  *    already-distinct, eliminating q91's dedup exchange entirely.
  *
  * Why an expression and not seven chained `transform` columns: each
  * level's lambda references the previous level TWICE (`h[i]`, `h[i+off]`),
  * so once Catalyst collapses the projections the level-6 expression
  * contains 2^6 inlined copies of the level-0 tree and evaluation
  * re-derives a whole lower-level array per element access — the q91
  * prototype hung for minutes on 500 rows. Here all seven levels are one
  * linear-time loop over primitive string arrays inside a single
  * codegen'd call, the same cure `fixed_point_dot` applies to the
  * unrolled-element_at blowup. The DuckDB oracle keeps the per-level CTE
  * formulation — hex-string concatenation is the cross-engine contract.
  */
case class SpanDigests(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("span", LongType, nullable = false),
    StructField("d", StringType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"span_digests requires array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SpanDigests.eval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpanDigests.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): SpanDigests =
    copy(child = newChild)

  override def prettyName: String = "span_digests"
}

object SpanDigests {
  final val MaxLevel = 6 // spans 1, 2, 4, ..., 64 tokens

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Hex(md: MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Static so generated code calls it directly. */
  def eval(tokens: ArrayData): ArrayData = {
    val md = digests.get()
    val n = tokens.numElements()
    var prev = new Array[String](n)
    var i = 0
    while (i < n) {
      prev(i) = md5Hex(md, tokens.getUTF8String(i).toString)
      i += 1
    }
    val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val seen = new java.util.HashSet[String]()
    def emit(span: Long, level: Array[String]): Unit = {
      var j = 0
      while (j < level.length) {
        val d16 = level(j).substring(0, 16)
        // span is part of the key: the same 16-hex prefix at two levels
        // is two distinct digests
        if (seen.add(span + ":" + d16))
          rows += InternalRow(span, UTF8String.fromString(d16))
        j += 1
      }
    }
    emit(1L, prev)
    var k = 1
    while (k <= MaxLevel && prev.length > (1 << (k - 1))) {
      val off = 1 << (k - 1)
      val next = new Array[String](prev.length - off)
      var j = 0
      while (j < next.length) {
        next(j) = md5Hex(md, prev(j) + prev(j + off))
        j += 1
      }
      emit(1L << k, next)
      prev = next
      k += 1
    }
    new GenericArrayData(rows.toArray[Any])
  }

  /** Column API. */
  def span_digests(tokens: Column): Column =
    ColumnBridge.column(SpanDigests(ColumnBridge.expression(tokens)))
}
