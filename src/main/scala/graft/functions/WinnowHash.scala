package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style document fingerprints over Unicode code points, in
  * mod-(2^31-1) polynomial arithmetic.
  *
  * Two primitives share the hash `h = (h*B + codePoint) mod P` (B = 1000003,
  * P = 2^31-1):
  *   - [[PolyFingerprint]]: the fold over the whole document — a compact
  *     content fingerprint;
  *   - [[WinnowExtreme]]: the min (or max) hash over all k-code-point
  *     windows — the winnowing building block (Schleimer et al.'s local
  *     fingerprinting keeps per-window minima; the global extreme is its
  *     degenerate single-band form and is what q32 exposes).
  *
  * Why mod-p instead of the wraparound 64-bit [[RollingHash64]]: every
  * intermediate stays below 2^52, so the identical arithmetic runs in
  * engines whose BIGINT overflow throws (DuckDB) — which is what makes the
  * fingerprint queries oracle-checkable — and the value is independent of
  * the engine's integer width. Windows are computed with the O(n) rolling
  * update (subtract the outgoing code point's `B^(k-1)` term, shift, add
  * the incoming one), not an O(n·k) re-fold.
  *
  * Native codegen'd `Expression`s for the same reason as [[RollingHash64]]:
  * one static call inside whole-stage codegen, fingerprinting at scan speed.
  */
case class PolyFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_fingerprint requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    WinnowHash.full(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowHash.full($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)

  override def prettyName: String = "poly_fingerprint"
}

/** Min/max of the k-code-point window hashes of a string. */
case class WinnowExtreme(child: Expression, k: Int, takeMin: Boolean)
    extends UnaryExpression {
  require(k > 0, s"window size must be positive, got $k")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    WinnowHash.extreme(input.asInstanceOf[UTF8String], k, takeMin)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowHash.extreme($c, $k, $takeMin)")

  override protected def withNewChildInternal(newChild: Expression): WinnowExtreme =
    copy(child = newChild)

  override def prettyName: String = if (takeMin) "winnow_min" else "winnow_max"
}

object WinnowHash {
  final val P = 2147483647L // 2^31 - 1 (prime)
  final val B = 1000003L

  /** Fold of the whole string's code points; empty string → 0. */
  def full(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * B + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Min (or max) over all k-code-point window hashes; a string shorter
    * than k is one window; empty string → 0. Static so generated code
    * calls it directly. */
  def extreme(s: UTF8String, k: Int, takeMin: Boolean): Long = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return 0L
    val m = math.min(k, n)
    var h = 0L
    var j = 0
    while (j < m) { h = (h * B + cps(j)) % P; j += 1 }
    var best = h
    if (n > k) {
      // B^(k-1) mod P for the rolling subtract of the outgoing code point
      var bk = 1L
      var e = 0
      while (e < k - 1) { bk = (bk * B) % P; e += 1 }
      var i = 0
      while (i + k < n) {
        h = (((h + P - (cps(i) * bk) % P) % P) * B + cps(i + k)) % P
        best = if (takeMin) math.min(best, h) else math.max(best, h)
        i += 1
      }
    }
    best
  }
}
