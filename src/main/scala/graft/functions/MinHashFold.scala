package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused MinHash signature fold: applies the K affine permutations
  * `(a_i·lo + b_i·hi + c_i) mod p` INSIDE the aggregate's update and folds
  * the min per slot — semantically identical to projecting an
  * `array(...)` of K permuted hashes and min-folding it (the
  * [[ArrayLongFold]] path), but without materializing a K-element
  * `ArrayData` per input row. On the q22 hot path that projection was one
  * 64-long array allocation + box/unbox round trip per SHINGLE (~1.5M
  * rows at sf0.1); here each row costs 64 register-only multiply-adds
  * against two long columns. Constants are plan literals shared with the
  * DuckDB oracle, so the signature values are bit-identical to the
  * composition it replaces — MinHashFoldSpec cross-checks both paths.
  *
  * Same partial-aggregation shape as [[ArrayLongFold]]: one primitive
  * K-long buffer per group in ObjectHashAggregate, map-side combine, the
  * exchange carries one array per (partition, doc).
  */
case class MinHashFold(
    loChild: Expression,
    hiChild: Expression,
    a: IndexedSeq[Long],
    b: IndexedSeq[Long],
    c: IndexedSeq[Long],
    p: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  private val k = a.length

  override def children: Seq[Expression] = Seq(loChild, hiChild)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (a.length != b.length || a.length != c.length || a.isEmpty)
      TypeCheckResult.TypeCheckFailure("permutation constant arrays must be non-empty and equal-length")
    else if (loChild.dataType != LongType || hiChild.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_fold requires bigint halves, got ${loChild.dataType}/${hiChild.dataType}")
    else if (a.exists(v => v < 0 || v >= MinHashFold.MaxMultiplier) ||
      b.exists(v => v < 0 || v >= MinHashFold.MaxMultiplier))
      // overflow discipline: with 32-bit halves, a·lo + b·hi + c must stay
      // below 2^63 or the JVM wraps negative while a SQL oracle would
      // throw — silent drift. Multipliers < 2^29 keep each product < 2^61.
      TypeCheckResult.TypeCheckFailure(
        s"minhash_fold multipliers must be in [0, 2^29) for overflow-free 32-bit-half permutation")
    else if (c.exists(v => v < 0 || v >= MinHashFold.MaxAddend) || p <= 0 || p > MinHashFold.MaxModulus)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_fold addends must be in [0, 2^61) and modulus in (0, 2^62]")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = Array.empty

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val lv = loChild.eval(input)
    val hv = hiChild.eval(input)
    if (lv == null || hv == null) return buf
    val lo = lv.asInstanceOf[Long]
    val hi = hv.asInstanceOf[Long]
    val out = if (buf.isEmpty) Array.fill(k)(Long.MaxValue) else buf
    var i = 0
    while (i < k) {
      val h = (a(i) * lo + b(i) * hi + c(i)) % p
      if (h < out(i)) out(i) = h
      i += 1
    }
    out
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.isEmpty) buf
    else if (buf.isEmpty) other
    else {
      var i = 0
      while (i < k) { if (other(i) < buf(i)) buf(i) = other(i); i += 1 }
      buf
    }
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashFold =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashFold =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashFold =
    copy(loChild = newChildren(0), hiChild = newChildren(1))

  override def prettyName: String = "minhash_fold"
}

object MinHashFold {
  /** Largest safe a/b multiplier (exclusive): products with 32-bit halves
    * stay < 2^61, so a·lo + b·hi + c < 2^63 never wraps. */
  val MaxMultiplier: Long = 1L << 29
  /** Largest safe additive constant (exclusive). */
  val MaxAddend: Long = 1L << 61
  /** Largest safe modulus (inclusive). */
  val MaxModulus: Long = 1L << 62

  def minhashFold(
      lo: Column, hi: Column,
      a: IndexedSeq[Long], b: IndexedSeq[Long], c: IndexedSeq[Long],
      p: Long): Column =
    ColumnBridge.column(
      MinHashFold(ColumnBridge.expression(lo), ColumnBridge.expression(hi),
        a, b, c, p).toAggregateExpression())
}

/** Fused SimHash vote fold — the q23 analog of [[MinHashFold]]: per input
  * row, bit b of the (lo, hi) 32-bit halves votes +1/−1 into slot b of a
  * 64-long buffer, all inside the aggregate update. Replaces the
  * `array(64 × when(bit, 1, -1))` projection + [[ArrayLongFold]] sum —
  * same values (integer addition commutes), no per-row ArrayData. */
case class SimHashFold(
    loChild: Expression,
    hiChild: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(loChild, hiChild)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (loChild.dataType != LongType || hiChild.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"simhash_fold requires bigint halves, got ${loChild.dataType}/${hiChild.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = Array.empty

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val lv = loChild.eval(input)
    val hv = hiChild.eval(input)
    if (lv == null || hv == null) return buf
    val lo = lv.asInstanceOf[Long]
    val hi = hv.asInstanceOf[Long]
    val out = if (buf.isEmpty) new Array[Long](64) else buf
    var b = 0
    while (b < 32) {
      out(b) += (if (((lo >>> b) & 1L) == 1L) 1L else -1L)
      out(b + 32) += (if (((hi >>> b) & 1L) == 1L) 1L else -1L)
      b += 1
    }
    out
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.isEmpty) buf
    else if (buf.isEmpty) other
    else {
      var i = 0
      while (i < 64) { buf(i) += other(i); i += 1 }
      buf
    }
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashFold =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashFold =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashFold =
    copy(loChild = newChildren(0), hiChild = newChildren(1))

  override def prettyName: String = "simhash_fold"
}

object SimHashFold {
  def simhashFold(lo: Column, hi: Column): Column =
    ColumnBridge.column(
      SimHashFold(ColumnBridge.expression(lo), ColumnBridge.expression(hi))
        .toAggregateExpression())
}
