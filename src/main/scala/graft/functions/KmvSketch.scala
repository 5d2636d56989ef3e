package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch over md5-derived hashes.
  *
  * The scale story is the same as HLL (q18): fixed-size per-group state,
  * map-side partial aggregation, the shuffle carries one ≤k-element sketch
  * per (partition, group) instead of the full distinct expansion. What KMV
  * adds over `approx_count_distinct` is *cross-engine determinism*: the
  * estimate is a pure integer function of the k smallest distinct hash
  * values — `(k-1) * 2^64 / h_(k)` with floor division, or the exact count
  * when fewer than k distinct hashes exist (Bar-Yossef et al. 2002, the
  * standard KMV estimator) — so a DuckDB oracle can recompute it
  * bit-identically from `md5()` + a ROW_NUMBER window. HLL's estimate
  * depends on register layout and bias-correction tables and is therefore
  * implementation-specific; KMV's depends only on the hash function.
  *
  * Input is the first 16 hex chars of an md5 (a uniform unsigned 64-bit
  * value; lexicographic order of fixed-width lowercase hex == unsigned
  * numeric order, which is what the oracle's ORDER BY h relies on). The
  * buffer keeps the k smallest DISTINCT values in a bounded TreeSet: O(k)
  * state per group regardless of input cardinality.
  *
  * Reference scope note: the reference (main.py:1-466) has no aggregation
  * at all; this is part of the declared §2B sketch-aggregation surface.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](KmvSketch.UnsignedOrder)

  // lazy: the child is unresolved at construction (copy() during analysis
  // calls the constructor before resolution); resolved by first update
  private lazy val childIsLong = child.dataType == LongType

  override def update(
      buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      // LONG input = the md5 prefix as a big-endian 64-bit value
      // (md5_prefix64) — bit-identical to parsing the first 16 hex chars,
      // without the per-row UTF8String → String → parseUnsignedLong walk
      // (r15 pass). The hex path stays for string-keyed callers.
      val h =
        if (childIsLong) v.asInstanceOf[Long]
        else java.lang.Long.parseUnsignedLong(
          v.asInstanceOf[UTF8String].toString, 16)
      // Only insert if it can belong to the k smallest (keeps the common
      // path O(log k) with no growth past k).
      if (buffer.size < k ||
        java.lang.Long.compareUnsigned(h, buffer.last()) < 0) {
        buffer.add(h)
        if (buffer.size > k) buffer.pollLast()
      }
    }
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buffer.size < k ||
        java.lang.Long.compareUnsigned(h, buffer.last()) < 0) {
        buffer.add(h)
        if (buffer.size > k) buffer.pollLast()
      }
    }
    buffer
  }

  /** Estimate: exact |buffer| when under-full, else (k-1)*2^64/h_(k) with
    * floor (=truncating, operands positive) division — mirrored in the
    * oracle as HUGEINT `//`. */
  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any =
    if (buffer.size < k) buffer.size.toLong
    else {
      val kth = BigInt(java.lang.Long.toUnsignedString(buffer.last()))
      ((BigInt(k - 1) << 64) / kth).toLong
    }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 8)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = createAggregationBuffer()
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)

  override def prettyName: String = "kmv_distinct"
}

object KmvSketch {
  /** Unsigned 64-bit ordering for the TreeSet (md5 hashes span the full
    * unsigned range; signed order would mis-pick the "smallest" k). */
  val UnsignedOrder: java.util.Comparator[java.lang.Long] =
    new java.util.Comparator[java.lang.Long] with Serializable {
      override def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a, b)
    }

  /** KMV distinct-count estimate. `c` is either the first 16 hex chars of
    * an md5 (`substring(md5(x), 1, 16)` — the original hex lane) or the
    * same 64 bits as a LONG (`md5_prefix64(x)` — the r15 lane q27 uses;
    * no hex render/re-parse per row). Both lanes order by the unsigned
    * 64-bit value, so the k-smallest set and the estimate are identical
    * (OperatorSpec pins the lane equivalence). */
  def kmvDistinct(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expression(c), k).toAggregateExpression())
}
