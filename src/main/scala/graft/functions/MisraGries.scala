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

/** Mutable Misra–Gries summary with the standard shared-decrement-offset
  * representation: counters are stored as `s` with true count `s − offset`,
  * so the "decrement every counter" step is a single `offset += 1` instead
  * of an O(m) rewrite. A TreeMap from stored count → tokens makes eviction
  * of newly-dead counters (s ≤ offset) a pop of the lowest buckets — each
  * token is evicted at most once per residence, so an adversarial
  * high-cardinality tail stream costs amortized O(log m) per input token
  * rather than O(m).
  */
final class MGSummary {
  private val stored = mutable.HashMap.empty[String, Long]
  private val buckets = new java.util.TreeMap[Long, mutable.HashSet[String]]()
  private var offset = 0L

  private def bucketAdd(s: Long, t: String): Unit = {
    val set = buckets.get(s)
    if (set == null) {
      val fresh = mutable.HashSet.empty[String]
      fresh += t
      buckets.put(s, fresh)
    } else set += t
  }

  private def bucketRemove(s: Long, t: String): Unit = {
    val set = buckets.get(s)
    if (set != null) {
      set -= t
      if (set.isEmpty) buckets.remove(s)
    }
  }

  def size: Int = stored.size

  def contains(t: String): Boolean = stored.contains(t)

  /** Add `delta` to `t`'s true count (inserting at `delta` if absent). */
  def add(t: String, delta: Long): Unit = stored.get(t) match {
    case Some(s) =>
      stored.update(t, s + delta)
      bucketRemove(s, t)
      bucketAdd(s + delta, t)
    case None =>
      val s = offset + delta
      stored.update(t, s)
      bucketAdd(s, t)
  }

  /** The MG decrement-all step: O(1) offset bump + pop of dead buckets. */
  def decrementAll(): Unit = {
    offset += 1
    while (!buckets.isEmpty && buckets.firstKey <= offset) {
      val dead = buckets.pollFirstEntry()
      dead.getValue.foreach(stored.remove)
    }
  }

  def trueCounts: Iterator[(String, Long)] =
    stored.iterator.map { case (t, s) => (t, s - offset) }

  def tokens: Iterator[String] = stored.keysIterator
}

/** Misra–Gries frequent-items sketch: at most `m` (token, counter) pairs,
  * with the MERGEABLE-SUMMARIES guarantee (Agarwal et al., PODS'12) that
  * every item of true count > N/(m+1) survives in the summary, N the total
  * stream length — under both the sequential decrement step and the
  * capacity-restoring merge (combine counters, subtract the (m+1)-th
  * largest, drop non-positive). Partial aggregation per input split is the
  * sketch merge, so the exchange carries ≤ m pairs per partition while a
  * full vocabulary groupBy carries state proportional to DISTINCT tokens —
  * the difference between bounded and unbounded aggregation state on a
  * 100 TB token stream. The decrement step uses the shared-offset
  * representation ([[MGSummary]]) so tail-heavy streams cost amortized
  * O(log m), not O(m), per token.
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
) extends TypedImperativeAggregate[MGSummary] {

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

  override def createAggregationBuffer(): MGSummary = new MGSummary

  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) {
      val token = v.asInstanceOf[UTF8String].toString
      if (buf.contains(token) || buf.size < m) buf.add(token, 1L)
      else buf.decrementAll()
    }
    buf
  }

  override def merge(buf: MGSummary, other: MGSummary): MGSummary = {
    val combined = mutable.HashMap.empty[String, Long]
    buf.trueCounts.foreach { case (t, c) => combined.update(t, c) }
    other.trueCounts.foreach { case (t, c) =>
      combined.update(t, combined.getOrElse(t, 0L) + c)
    }
    val out = new MGSummary
    if (combined.size > m) {
      // restore capacity: subtract the (m+1)-th largest counter from all
      val counts = combined.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (m + 1)) // (m+1)-th largest
      combined.foreach { case (t, c) => if (c - d > 0L) out.add(t, c - d) }
    } else combined.foreach { case (t, c) => out.add(t, c) }
    out
  }

  /** Candidate tokens, sorted (deterministic output; counts are summary
    * artifacts and deliberately NOT exposed — recount candidates exactly). */
  override def eval(buf: MGSummary): Any = {
    val toks = buf.tokens.toArray
    java.util.Arrays.sort(toks, Ordering[String])
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any))
  }

  override def serialize(buf: MGSummary): Array[Byte] = {
    val entries = buf.trueCounts.toArray
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

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MGSummary
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.add(new String(arr, StandardCharsets.UTF_8), bb.getLong)
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
