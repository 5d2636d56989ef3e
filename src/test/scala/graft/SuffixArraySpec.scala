package graft

import graft.operators.SuffixArray
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Laws for the distributed suffix array (q156/q157 machinery):
  *
  *  - prefix-doubling ranks ≡ a naive in-memory suffix sort (dense rank
  *    over word-sequence lexicographic order, ties included) — ∀ random
  *    corpora over a tiny vocabulary, chosen SMALL so rank ties, shared
  *    tails, exact-duplicate docs and single-word docs all occur;
  *  - lrsPerDoc ≡ brute-force all-pairs capped LCP (the quadratic
  *    definition the suffix-array identity replaces);
  *  - a planted duplicated phrase is found at ≥ its planted length.
  *
  * The generator sticks to ASCII words: Spark compares UTF8 bytes while
  * the in-memory model compares Java Strings — identical orders on
  * ASCII, deliberately not exercised beyond it here (the oracle-checked
  * corpus covers realistic text).
  */
class SuffixArraySpec extends SparkSpec {

  import spark.implicits._

  private val vocab = Vector("a", "b", "ab", "ba", "aa", "c")

  private def naiveRanks(docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val sufs = docs.flatMap { case (id, text) =>
      val w = text.split("\\s+").toVector
      w.indices.map(p => ((id, p.toLong), w.drop(p)))
    }
    import scala.math.Ordering.Implicits._
    val order = sufs.map(_._2).distinct.sorted
    val rank = order.zipWithIndex.map { case (s, i) => s -> (i + 1L) }.toMap
    sufs.map { case (k, s) => k -> rank(s) }.toMap
  }

  private def bruteLrs(docs: Seq[(Long, String)], cap: Int, minRun: Int)
      : Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toVector }
    val allSuf = toks.flatMap { case (id, w) =>
      w.indices.map(p => ((id, p), w.drop(p)))
    }
    def lcp(a: Vector[String], b: Vector[String]): Int = {
      val n = math.min(math.min(a.length, b.length), cap)
      var i = 0
      while (i < n && a(i) == b(i)) i += 1
      i
    }
    toks.map { case (id, w) =>
      val gs = w.indices.map { p =>
        val mine = w.drop(p)
        allSuf.collect { case ((d2, p2), s2) if (d2, p2) != ((id, p)) =>
          lcp(mine, s2)
        }.foldLeft(0)(math.max)
      }
      id -> (gs.foldLeft(0)(math.max).toLong,
        gs.count(_ >= minRun).toLong)
    }.toMap
  }

  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(1, 8).flatMap { nDocs =>
      Gen.listOfN(nDocs,
        Gen.chooseNum(1, 12).flatMap(n =>
          Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" "))))
    }

  test("∀ corpora: prefix-doubling ranks ≡ naive suffix sort (ties included)") {
    val prop = Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val got = SuffixArray.suffixRanks(df)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
        .toMap
      got == naiveRanks(docs)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("∀ corpora: lrsPerDoc ≡ brute-force all-pairs capped LCP") {
    val prop = Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val got = SuffixArray.lrsPerDoc(df, cap = 5, minRun = 2)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .toMap
      got == bruteLrs(docs, cap = 5, minRun = 2)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  private def bruteContam(docs: Seq[(Long, String)], mod: Int, cap: Int,
      minRun: Int): Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toVector }
    val benchSufs = toks.filter(_._1 % mod == 0)
      .flatMap { case (_, w) => w.indices.map(w.drop) }
    def lcp(a: Vector[String], b: Vector[String]): Int = {
      val n = math.min(math.min(a.length, b.length), cap)
      var i = 0
      while (i < n && a(i) == b(i)) i += 1
      i
    }
    toks.filter(_._1 % mod != 0).map { case (id, w) =>
      val per = w.indices.map { p =>
        val mine = w.drop(p)
        benchSufs.map(lcp(mine, _)).foldLeft(0)(math.max)
      }
      id -> (per.foldLeft(0)(math.max).toLong,
        per.count(_ >= minRun).toLong)
    }.toMap
  }

  test("∀ corpora: phraseContam ≡ brute-force cross-set capped LCP") {
    import org.apache.spark.sql.functions.col
    val prop = Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val got = SuffixArray
        .phraseContam(df, col("doc_id") % 3 === 0, cap = 5, minRun = 2)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .toMap
      got == bruteContam(docs, 3, 5, 2)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  /** Brute-force repeat sweep from an exhaustive phrase-occurrence map:
    * longest(k) = max length among capped phrases with count ≥ k;
    * achieving suffix-order windows per L-phrase run = count - k + 1
    * (runs of distinct max-length phrases are disjoint in suffix order);
    * phrase = min string. Independent of the LCP identity under test. */
  private def bruteSweep(docs: Seq[(Long, String)], ks: Seq[Int], cap: Int)
      : Seq[(Long, Long, Long, String)] = {
    val occ = scala.collection.mutable.Map.empty[Seq[String], Long]
      .withDefaultValue(0L)
    for {
      (_, t) <- docs
      w = t.split("\\s+").toVector
      p <- w.indices
      l <- 1 to math.min(cap, w.length - p)
    } occ(w.slice(p, p + l)) += 1L
    ks.sorted.map { k =>
      val cands = occ.filter(_._2 >= k)
      if (cands.isEmpty) (k.toLong, 0L, 0L, "")
      else {
        val maxLen = cands.keys.map(_.length).max
        val at = cands.filter(_._1.length == maxLen)
        (k.toLong, maxLen.toLong, at.values.map(_ - k + 1).sum,
          at.keys.map(_.mkString(" ")).min)
      }
    }
  }

  test("∀ corpora: repeatSweep ≡ brute-force phrase-occurrence counting") {
    val prop = Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = SuffixArray.repeatSweep(
          docs.toDF("doc_id", "text"), ks = Seq(2, 3, 5), cap = 5)
        .orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq
      got == bruteSweep(docs, Seq(2, 3, 5), cap = 5)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("q161 ⋈ q157 law: k=2 frontier equals the corpus lrs max") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables.documents(spark, sf)
    val sweep = SuffixArray.repeatSweep(docs).orderBy("k").collect()
    val lrsMax = SuffixArray.lrsPerDoc(docs)
      .agg(org.apache.spark.sql.functions.max("lrs_words")).head().getLong(0)
    assert(sweep.head.getLong(0) == 2L)
    assert(sweep.head.getLong(1) == lrsMax,
      s"k=2 ${sweep.head.getLong(1)} vs lrs max $lrsMax")
    // the frontier can only shrink as the tier rises
    sweep.sliding(2).foreach {
      case Array(a, b) => assert(b.getLong(1) <= a.getLong(1), "not monotone")
      case _ =>
    }
  }

  test("q158 ⋈ q157 laws: sweep agrees with the per-doc profile; monotone in L") {
    val sf = "/root/testdata/sf0.001"
    val sweep = SparkEntry.queries("q158_excision_sweep")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(sweep.map(_._1).toSeq == Seq(8L, 16L, 24L, 31L))
    val profile = SparkEntry.queries("q157_phrase_lrs")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // L=8 row must agree with q157's minRun=8 roll-up
    val (_, hit8, starts8, excis8, ppm8) = sweep.head
    assert(hit8 == profile.count(_._2 >= 8L), "n_docs_hit vs per-doc lrs")
    assert(starts8 == profile.map(_._3).sum, "dup_starts vs per-doc n_dup_starts")
    // a wider threshold can only shrink every measure
    sweep.sliding(2).foreach {
      case Array((_, h1, s1, e1, p1), (_, h2, s2, e2, p2)) =>
        assert(h2 <= h1 && s2 <= s1 && e2 <= e1 && p2 <= p1, "sweep not monotone")
      case _ =>
    }
    // union coverage is bounded by the corpus and by start-count × cap
    assert(excis8 <= 31L * starts8)
    assert(ppm8 <= 1000000L)
  }

  test("empty corpus: ranks/LCP/dup-len frames are empty, no NPE") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SuffixArray.suffixRanks(empty).count() == 0L)
    assert(SuffixArray.adjacentLcp(empty).count() == 0L)
    assert(SuffixArray.positionDupLens(empty).count() == 0L)
    assert(SuffixArray.lrsPerDoc(empty).count() == 0L)
  }

  test("planted duplicated phrase is recovered at full length") {
    val phrase = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, s"alpha beta $phrase gamma"),
      (1L, s"delta $phrase epsilon zeta"),
      (2L, "unrelated words only here"))
    val out = SuffixArray.lrsPerDoc(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) >= 12L, s"doc 0 lrs ${out(0L)}")
    assert(out(1L) >= 12L, s"doc 1 lrs ${out(1L)}")
    assert(out(2L) <= 1L, s"doc 2 lrs ${out(2L)}")
  }
}
