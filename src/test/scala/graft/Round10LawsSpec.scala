package graft

import org.apache.spark.sql.functions._

/** Round-10 regression laws for the semantic changes of this round:
  *
  *  - q166's shared-shingle truth pre-filter must not change the exact
  *    ground truth: n_truth (tp + fn) ≡ a from-scratch in-memory
  *    Jaccard ≥ 0.5 pair count (unique shingles cannot contribute to an
  *    intersection — the law guards the claim against future edits);
  *  - q169 must report the FULL source × policy grid with explicit,
  *    internally-consistent zero rows (the r9 ADVICE defect: starved
  *    sources silently vanished);
  *  - q162's stage-1 prefix cosine must stay deterministic when a
  *    vector's first 16 dims are all zero (0/0 used to be NaN, whose
  *    window order is engine lore): the whole two-stage audit is
  *    replayed in-memory with the documented rel = −1 rule and must
  *    match bit for bit.
  */
class Round10LawsSpec extends SparkSpec {

  import spark.implicits._

  test("q166 law: n_truth ≡ brute-force Jaccard ≥ 0.5 pair count (pre-filter-proof)") {
    val sf = "/root/testdata/sf0.001"
    val sets = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val w = r.getString(1).split("\\s+")
        val n = math.max(w.length - 4, 1)
        r.getLong(0) ->
          (0 until n).map(i => w.slice(i, math.min(i + 5, w.length))
            .mkString(" ")).toSet
      }
    val expected = (for {
      (ia, sa) <- sets
      (ib, sb) <- sets
      if ia < ib
      ix = (sa & sb).size
      if ix * 2 >= sa.size + sb.size - ix
    } yield 1).length
    assert(expected > 0, "fixture must contain near-dup pairs")
    val rows = SparkEntry.queries("q166_lsh_tuning")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val nTruth = r.getLong(3) + r.getLong(4) // tp + fn
      assert(nTruth == expected,
        s"bands=${r.getLong(0)}: n_truth $nTruth vs brute-force $expected")
    }
  }

  test("q169 law: full source×policy grid, zero rows explicit and consistent") {
    val sf = "/root/testdata/sf0.001"
    val nSources = spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct().count()
    val out = SparkEntry.queries("q169_filter_ensemble")(spark, sf).collect()
    assert(out.length == nSources * 3,
      s"${out.length} rows vs ${nSources} sources × 3 policies")
    val cells = out.map(r => (r.getString(0), r.getString(1))).toSet
    assert(cells.size == out.length, "duplicate (source, policy) cells")
    assert(cells.map(_._2) == Set("strict", "majority", "lenient") ||
      out.isEmpty)
    out.foreach { r =>
      if (r.getLong(2) == 0L)
        assert(r.getLong(3) == 0L && r.getLong(4) == 0L,
          s"zero-kept row carries nonzero tokens/ppm: $r")
    }
  }

  test("q162 law: zero-prefix-norm candidate is deterministic (rel = −1, never NaN)") {
    // 8 queries + 32 candidates; candidate 20's FIRST 16 dims are all
    // zero. Components are exact quarters so the fixed-point dots and
    // the double arithmetic replay identically in this in-memory mirror.
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(d => (((seed * 31 + d * 7) % 8) - 3) / 4.0f)
    val vs: Map[Long, Array[Float]] = (0 until 40).map { i =>
      val v = vec(i + 1)
      if (i == 20) (0 until 16).foreach(d => v(d) = 0.0f)
      i.toLong -> v
    }.toMap
    assert(vs(20L).take(16).forall(_ == 0.0f) && vs(20L).drop(16).exists(_ != 0.0f))

    val dir = java.nio.file.Files.createTempDirectory("graft_q162_law").toString
    vs.toSeq.sortBy(_._1).map { case (id, v) => (id, v, (id % 7).toInt) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // in-memory mirror of the fixed-point dot (FixedPointDot.dot / 1e15)
    def fdot(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += math.floor(a(i).toDouble * b(i).toDouble * 1e15).toLong
        i += 1
      }
      acc / 1e15
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      fdot(a, b) / (math.sqrt(fdot(a, a)) * math.sqrt(fdot(b, b)))
    def pcos(a: Array[Float], b: Array[Float]): Double = {
      val qa = a.take(16); val ca = b.take(16)
      val den = math.sqrt(fdot(qa, qa)) * math.sqrt(fdot(ca, ca))
      if (den == 0.0) -1.0 else fdot(qa, ca) / den
    }
    val expected = (0L until 8L).map { q =>
      val cands = vs.keys.filter(_ != q).toSeq
      val exact = cands.sortBy(c => (-cos(vs(q), vs(c)), c)).take(5).toSet
      val stage1 = cands.sortBy(c => (-pcos(vs(q), vs(c)), c)).take(25)
      val two = stage1.sortBy(c => (-cos(vs(q), vs(c)), c)).take(5).toSet
      val hits = (exact & two).size.toLong
      q -> (hits, hits * 2000L)
    }.toMap

    val got = SparkEntry.queries("q162_prefix_rerank")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == expected, s"got $got vs $expected")
  }
}
