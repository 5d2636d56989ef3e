package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First 8 bytes of `md5(utf8(s))` as one big-endian long — the
  * cross-engine base hash of the dedup/sketch suites, without the hex
  * round trip.
  *
  * The composed form `conv(substring(md5(s), 1, 8), 16, 10)` materializes
  * a 32-char hex string per row and parses 8 chars of it back to a long,
  * TWICE (both halves) — pure overhead on the per-shingle hot path of the
  * MinHash/SimHash signature stages, the single hash-heaviest code in the
  * engine. This expression computes the digest once and returns the first
  * 8 bytes directly; the two 32-bit halves the permutation families
  * consume are then bit ops:
  *
  *   lo (hex chars 1-8)  = shiftrightunsigned(p, 32)
  *   hi (hex chars 9-16) = p & 0xFFFFFFFF
  *
  * Both values are BIT-IDENTICAL to the conv/substring composition (md5's
  * hex string spells the digest bytes in order, so chars 1-8 are bytes
  * 0-3 = the high half of the big-endian first-8-byte long), which is
  * what keeps the DuckDB oracles — which still use the hex form —
  * hash-matching. Codegen'd; digest instances are thread-local. */
case class Md5Prefix64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix64 requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Md5Prefix64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix64 =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix64"
}

object Md5Prefix64 {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Static so generated code can call it directly. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }
}
