package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string — the document-fingerprinting
  * primitive (content-defined chunking / winnowing building block).
  *
  * `h = h * B + byte` over the UTF-8 bytes with wrap-around 64-bit
  * arithmetic (B = 1000003). Chosen over a UDF deliberately: a native
  * Catalyst `Expression` with `doGenCode` stays inside whole-stage codegen
  * (no SerDe to a Scala closure, no iterator break), so fingerprinting runs
  * at scan speed over 100 TB. Deterministic: no seed, byte-order fixed.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    RollingHash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash64 {
  final val Base = 1000003L

  /** Static so generated code can call it directly. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1125899906842597L // large prime seed constant
    var i = 0
    while (i < bytes.length) {
      h = h * Base + (bytes(i) & 0xff)
      i += 1
    }
    h
  }
}

/** Column-level entry points for the custom expressions, plus SQL
  * registration so `spark.sql("SELECT rolling_hash(text) ...")` works. */
object GraftFunctions {
  import org.apache.spark.sql.graft.ColumnBridge

  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash64(ColumnBridge.expression(c)))

  def poly_fingerprint(c: Column): Column =
    ColumnBridge.column(PolyFingerprint(ColumnBridge.expression(c)))

  /** First 8 md5 digest bytes as a big-endian long (see [[Md5Prefix64]]). */
  def md5_prefix64(c: Column): Column =
    ColumnBridge.column(Md5Prefix64(ColumnBridge.expression(c)))

  /** Split an [[md5_prefix64]] value into its two 32-bit halves — THE
    * cross-engine base-hash pair, in one place: bit-identical to the
    * oracle's `('0x' || substr(md5(x), {1,9}, 8))::BIGINT` forms (hex
    * chars 1-8 = digest bytes 0-3 = the high half; chars 9-16 = bytes
    * 4-7 = the low half). */
  def halves64(p: Column): (Column, Column) = {
    import org.apache.spark.sql.functions.{lit, shiftrightunsigned}
    (shiftrightunsigned(p, 32), p.bitwiseAND(lit(0xFFFFFFFFL)))
  }

  /** (lo, hi) 32-bit md5 halves of a string column. */
  def md5_halves(c: Column): (Column, Column) = halves64(md5_prefix64(c))

  /** Last 8 md5 digest bytes as a big-endian long (see [[Md5Suffix64]]). */
  def md5_suffix64(c: Column): Column =
    ColumnBridge.column(Md5Suffix64(ColumnBridge.expression(c)))

  /** The full 128-bit md5 digest as two big-endian longs (h1 = bytes
    * 0-7, h2 = bytes 8-15) — bijective with the 32-char hex string, so
    * grouping/joining on (h1, h2) is EXACTLY the same equality relation
    * as on `md5(c)` at half the shuffle bytes (guide §2.3). ONE digest
    * pass per row ([[Md5Pair]] + two getFields, deduplicated by codegen
    * subexpression elimination). For internal keys only; oracles that
    * mirror the hex value must keep the string form. */
  def md5_128(c: Column): (Column, Column) = {
    val p = ColumnBridge.column(Md5Pair(ColumnBridge.expression(c)))
    (p.getField("h1"), p.getField("h2"))
  }

  /** The [[Md5Pair]] struct itself, for call sites where the two halves
    * must ride INSIDE one larger expression (a band `struct` under an
    * `explode(array(...))`): whole-stage codegen's subexpression
    * elimination dedups equal subtrees ACROSS a projection's expression
    * list, not WITHIN a single generator expression — so two getFields
    * inlined into the same array would digest twice per band. Embedding
    * the pair struct digests once; consumers read `.h1`/`.h2` AFTER the
    * explode, where the struct is already materialized. */
  def md5_pair(c: Column): Column =
    ColumnBridge.column(Md5Pair(ColumnBridge.expression(c)))

  def winnow_min(c: Column, k: Int): Column =
    ColumnBridge.column(WinnowExtreme(ColumnBridge.expression(c), k, takeMin = true))

  def winnow_max(c: Column, k: Int): Column =
    ColumnBridge.column(WinnowExtreme(ColumnBridge.expression(c), k, takeMin = false))

  /** Table-generating: one row per n-word shingle (see [[WordNgrams]]). */
  def word_ngrams(c: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(c), n))

  private def litInt(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String = "window size"): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }

  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_fingerprint", exprs => PolyFingerprint(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_prefix64", exprs => Md5Prefix64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_min",
      exprs => WinnowExtreme(exprs.head, litInt(exprs(1)), takeMin = true),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_max",
      exprs => WinnowExtreme(exprs.head, litInt(exprs(1)), takeMin = false),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams",
      exprs => WordNgrams(exprs.head, litInt(exprs(1))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "scale_floor", exprs => ScaleFloor(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long_sq_dist", exprs => LongSqDist(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_by_key",
      exprs => TopKByKey(exprs.head, exprs(1), litInt(exprs(2), "k")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "misra_gries",
      exprs => MisraGries(exprs.head, litInt(exprs(1), "capacity")), "built-in")
  }
}
