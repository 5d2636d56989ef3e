package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise fold of `array<long>` rows into one `array<long>` —
  * fold = min or sum per slot. The k-means centroid update (q47) folds
  * coordinate sums with it; the MinHash/SimHash signature paths moved to
  * the fused [[MinHashFold]]/[[SimHashFold]] variants (same arithmetic,
  * no per-row array), with equivalence pinned in MinHashFoldSpec.
  *
  * Why a custom `TypedImperativeAggregate` instead of 64 separate
  * `min(...)`/`sum(...)` agg columns: with one agg expression per signature
  * slot the generated aggregate update method grows past the JIT/codegen
  * limits and Spark falls back to interpreted row aggregation (observed
  * ~4-5x slowdown at bench scale). This operator keeps ONE primitive
  * `Array[Long]` buffer per group inside ObjectHashAggregate — constant-size
  * state, partial aggregation (map-side combine) still applies, shuffle
  * carries one array per (partition, group).
  */
case class ArrayLongFold(
    child: Expression,
    combine: ArrayLongFold.Op,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.empty

  private def combineInto(buf: Array[Long], other: ArrayData): Array[Long] = {
    val n = other.numElements()
    if (buf.isEmpty) {
      val fresh = new Array[Long](n)
      var i = 0
      while (i < n) { fresh(i) = other.getLong(i); i += 1 }
      fresh
    } else {
      var i = 0
      val m = math.min(buf.length, n)
      while (i < m) {
        buf(i) = combine(buf(i), other.getLong(i))
        i += 1
      }
      buf
    }
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else combineInto(buffer, v.asInstanceOf[ArrayData])
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.isEmpty) buffer
    else if (buffer.isEmpty) other
    else {
      var i = 0
      val m = math.min(buffer.length, other.length)
      while (i < m) { buffer(i) = combine(buffer(i), other(i)); i += 1 }
      buffer
    }
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.length * 8)
    bb.putInt(buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(storageFormat)
    val n = bb.getInt
    Array.fill(n)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArrayLongFold =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArrayLongFold =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArrayLongFold =
    copy(child = newChildren.head)

  override def prettyName: String = combine.name
}

object ArrayLongFold {
  sealed abstract class Op(val name: String) extends Serializable {
    def apply(a: Long, b: Long): Long
  }
  case object MinOp extends Op("array_min_agg") {
    def apply(a: Long, b: Long): Long = math.min(a, b)
  }
  case object SumOp extends Op("array_sum_agg") {
    def apply(a: Long, b: Long): Long = a + b
  }

  /** Element-wise minimum of array<long> rows (MinHash signature fold). */
  def arrayMinAgg(c: Column): Column =
    ColumnBridge.column(
      ArrayLongFold(ColumnBridge.expression(c), MinOp).toAggregateExpression())

  /** Element-wise sum of array<long> rows (SimHash vote fold). */
  def arraySumAgg(c: Column): Column =
    ColumnBridge.column(
      ArrayLongFold(ColumnBridge.expression(c), SumOp).toAggregateExpression())
}
