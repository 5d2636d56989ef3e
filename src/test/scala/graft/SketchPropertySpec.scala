package graft

import graft.functions.{MisraGries, TopKHeap}
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ∀-properties for the bounded sketch structures behind q73/q75 — the
  * structures whose correctness the oracle can only sample, checked here
  * against brute-force references over random inputs, random split points
  * (merge paths), and random serialization round trips. */
class SketchPropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  test("TopKHeap ≡ sort-take-k under arbitrary inserts, merges and byte round trips") {
    val entryGen = Gen.zip(Gen.chooseNum(-50.0, 50.0), Gen.chooseNum(0L, 30L))
    val gen = for {
      k <- Gen.chooseNum(1, 8)
      xs <- Gen.listOf(entryGen)
      cut <- Gen.chooseNum(0, xs.length max 0)
    } yield (k, xs, cut)
    check("topk", Prop.forAll(gen) { case (k, xs, cut) =>
      // reference: full sort by (key DESC, tie ASC), first k
      val expect = xs.distinct.sortBy { case (key, tie) => (-key, tie) }.take(k)
      // heap path: split at a random point, build two heaps, merge via the
      // serialized wire format (exactly what partial aggregation does)
      val (l, r) = xs.distinct.splitAt(cut)
      val hl = new TopKHeap(k); l.foreach { case (key, t) => hl.insert(key, t) }
      val hr = new TopKHeap(k); r.foreach { case (key, t) => hr.insert(key, t) }
      val merged = TopKHeap.fromBytes(k, hl.toBytes)
      val rr = TopKHeap.fromBytes(k, hr.toBytes)
      (0 until rr.size).foreach(i => merged.insert(rr.keys(i), rr.ties(i)))
      val got = merged.sortedIndices.map(i => (merged.keys(i), merged.ties(i))).toList
      got == expect
    })
  }

  test("MisraGries guarantee: items above N/(m+1) always survive, any split") {
    val gen = for {
      m <- Gen.chooseNum(2, 10)
      // skewed universe: small ints → frequent collisions → real eviction
      xs <- Gen.nonEmptyListOf(Gen.frequency(
        3 -> Gen.chooseNum(0, 3), 2 -> Gen.chooseNum(0, 40), 1 -> Gen.chooseNum(0, 400)))
      cut <- Gen.chooseNum(0, xs.length)
    } yield (m, xs.map(i => s"t$i"), cut)
    check("mg", Prop.forAll(gen) { case (m, xs, cut) =>
      val n = xs.length
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val heavy = exact.collect { case (t, c) if c * (m + 1) > n => t }.toSet

      // drive the aggregate exactly as Spark does: update via InternalRows,
      // merge through the serialized wire format like a real exchange
      val agg = MisraGries(BoundReference(0, StringType, nullable = true), m)
      val (l, r) = xs.splitAt(cut)
      val bl = l.foldLeft(agg.createAggregationBuffer()) { (b, t) =>
        agg.update(b, InternalRow(UTF8String.fromString(t))) }
      val br = r.foldLeft(agg.createAggregationBuffer()) { (b, t) =>
        agg.update(b, InternalRow(UTF8String.fromString(t))) }
      val merged = agg.merge(
        agg.deserialize(agg.serialize(bl)), agg.deserialize(agg.serialize(br)))
      val kept = merged.tokens.toSet
      heavy.subsetOf(kept) && merged.size <= m
    })
  }
}
