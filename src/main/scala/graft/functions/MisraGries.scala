package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra–Gries frequent-items sketch: at most `m` (token, counter) pairs,
  * with the MERGEABLE-SUMMARIES guarantee (Agarwal et al., PODS'12) that
  * every item of true count > N/(m+1) survives in the summary, N the total
  * stream length — under both the sequential decrement step and the
  * capacity-restoring merge (combine counters, subtract the (m+1)-th
  * largest, drop non-positive). Partial aggregation per input split is the
  * sketch merge, so the exchange carries ≤ m pairs per partition while a
  * full vocabulary groupBy carries state proportional to DISTINCT tokens —
  * the difference between bounded and unbounded aggregation state on a
  * 100 TB token stream.
  *
  * The summary's counts are order-dependent (not oracle-comparable); its
  * MEMBERSHIP guarantee is not. q75 therefore emits candidates only and
  * recounts them exactly in a second bounded-state pass — the classic
  * two-pass exact heavy hitters — making the end result deterministic and
  * hash-checkable against a plain GROUP BY/HAVING oracle.
  *
  * The reference (`/root/reference/main.py`) has no aggregation surface
  * (SURVEY.md §2B); this extends the declared engine suite.
  */
case class MisraGries(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override val dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (m <= 0)
      TypeCheckResult.TypeCheckFailure(s"capacity must be positive, got $m")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires a string argument, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val token = v.asInstanceOf[UTF8String].toString
      buf.get(token) match {
        case Some(c) => buf.update(token, c + 1)
        case None if buf.size < m => buf.update(token, 1L)
        case None =>
          // decrement-all step: every counter pays one; zeros evict
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (t, c) =>
            if (c == 1L) dead += t else buf.update(t, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) =>
      buf.update(t, buf.getOrElse(t, 0L) + c)
    }
    if (buf.size > m) {
      // restore capacity: subtract the (m+1)-th largest counter from all
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (m + 1)) // (m+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (t, c) =>
        if (c - d <= 0L) dead += t else buf.update(t, c - d)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  /** Candidate tokens, sorted (deterministic output; counts are summary
    * artifacts and deliberately NOT exposed — recount candidates exactly). */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val toks = buf.keys.toArray
    java.util.Arrays.sort(toks, Ordering[String])
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val payload = entries.map { case (t, _) => t.getBytes(StandardCharsets.UTF_8) }
    val size = 4 + payload.map(_.length + 12).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.zip(payload).foreach { case ((_, c), bytes) =>
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)

  override def prettyName: String = "misra_gries"
}

object MisraGries {
  /** Frequent-item candidates (capacity m) as `array<string>`. */
  def misraGries(c: Column, m: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(c), m).toAggregateExpression())
}
