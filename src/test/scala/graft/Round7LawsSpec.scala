package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Round-7 packing queries assert LAWS in their scaladocs; machine-check
  * them (the Round6LawsSpec discipline):
  *  - q145: the interval-intersection clamp algebra (explode c0..c1, clamp
  *    with least/greatest) equals a brute-force token-by-token simulation
  *    of concat-and-chunk packing, for arbitrary document lengths
  *    (∀-property);
  *  - q145 ⋈ q146: the two queries derive from ONE packing, so at C=512
  *    q146's chunk count and padding must reproduce q145's histogram
  *    sums exactly (cross-query law on the real sf0.001 data);
  *  - q146: offsets are C-independent, so `docs_split` must be
  *    monotonically non-increasing in C (a bigger window never splits
  *    more documents under the same concatenation order).
  */
class Round7LawsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("∀ doc lengths: clamp algebra ≡ brute-force concat-and-chunk simulation") {
    val C = 16
    val gen = Gen.listOf(Gen.choose(1, 50))
    val prop = Prop.forAll(gen) { lens =>
      // offsets of the packing order
      val starts = lens.scanLeft(0)(_ + _).init
      // the q145 formulation: explode covered chunks, clamp the overlap
      val byChunk = scala.collection.mutable.Map.empty[Int, (Int, Int)]
      starts.zip(lens).foreach { case (s, n) =>
        val c0 = s / C
        val c1 = (s + n - 1) / C
        (c0 to c1).foreach { c =>
          val tok = math.min(s + n, (c + 1) * C) - math.max(s, c * C)
          val (d, t) = byChunk.getOrElse(c, (0, 0))
          byChunk(c) = (d + 1, t + tok)
        }
      }
      // brute force: walk every token of the concatenation
      val owner = lens.zipWithIndex.flatMap { case (n, i) => Seq.fill(n)(i) }
      val brute = owner.zipWithIndex
        .groupBy { case (_, pos) => pos / C }
        .map { case (c, toks) => c -> (toks.map(_._1).distinct.size, toks.size) }
      byChunk.toMap == brute
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("q145 ⋈ q146 law: one packing — histogram sums reproduce the C=512 sweep row") {
    val hist = SparkEntry.queries("q145_sequence_packing")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(hist.nonEmpty)
    val nChunks = hist.map { case (_, n, _, _) => n }.sum
    val tokens = hist.map { case (_, _, _, t) => t }.sum
    hist.foreach { case (nd, _, full, _) =>
      assert(nd >= 1L)
      assert(full <= hist.find(_._1 == nd).get._2)
    }
    val sweep = SparkEntry.queries("q146_context_sweep")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val c512 = sweep.find(_._1 == 512).get
    assert(c512._4 == nChunks,
      s"q146 n_chunks ${c512._4} != q145 histogram chunk total $nChunks")
    assert(c512._5 == nChunks * 512 - tokens,
      "q146 pad_tokens must equal 512*n_chunks - corpus tokens from q145")
    // every chunk except possibly the last is full: token total bounds
    assert(tokens > (nChunks - 1) * 512 && tokens <= nChunks * 512)
  }

  test("q149 law: allocation ≡ an independent sequential waterfill recompute") {
    val rows = SparkEntry.queries("q149_epoch_waterfill")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5))) // source, n_tokens, e_max, cap, alloc
    assert(rows.nonEmpty)
    val t = rows.map(_._2).sum
    val b = 5 * t / 2
    val sumCap = rows.map(_._4).sum
    // reference waterfill, sequential and independent of the SQL shape
    val expected: Map[String, Long] =
      if (b >= sumCap) rows.map(r => r._1 -> r._4).toMap
      else {
        val tiers = rows.map(_._3).distinct.sorted
        val bracketE = tiers.find { e =>
          val capBelow = rows.filter(_._3 < e).map(_._4).sum
          val uAtOrAbove = rows.filter(_._3 >= e).map(_._2).sum
          capBelow + e * uAtOrAbove >= b
        }.get
        val capped = rows.filter(_._3 < bracketE)
        val uncapped = rows.filter(_._3 >= bracketE)
        val r = b - capped.map(_._4).sum
        val den = uncapped.map(_._2).sum
        val floors = uncapped.map(x => (x._1, x._2 * r / den, x._2 * r % den))
        val extras = (r - floors.map(_._2).sum).toInt
        val bumped = floors.sortBy(x => (-x._3, x._1)).zipWithIndex
          .map { case ((s2, f, _), i) => s2 -> (if (i < extras) f + 1 else f) }
        (capped.map(x => x._1 -> x._4) ++ bumped).toMap
      }
    rows.foreach { case (s2, _, _, cap, alloc) =>
      assert(alloc == expected(s2), s"$s2: alloc $alloc != reference ${expected(s2)}")
      assert(alloc <= cap, s"$s2 exceeds its epoch cap")
    }
    if (b < sumCap)
      assert(rows.map(_._5).sum == b, "Σ alloc must equal the budget exactly")
  }

  test("q147 law: scoring ≡ an independent in-memory rank recompute") {
    // reference: plain Scala over the same parquet text, string-keyed
    // (no digests — at this scale a 64-bit md5-prefix collision is
    // impossible, so digest-keyed Spark counts must agree exactly)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val occ: Seq[(Long, String)] = docs.toSeq.flatMap { case (id, t) =>
      val w = t.split("\\s+", -1)
      if (w.length < 2) Seq.empty
      else w.sliding(2).map(p => id -> p.mkString(" ")).toSeq
    }
    val cnt = occ.groupBy(_._2).map { case (g, xs) => g -> xs.size.toLong }
    val histo = cnt.values.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    val rankOf: Map[Long, Long] = histo.keys.map { c =>
      c -> (1L + histo.collect { case (c2, n) if c2 > c => n }.sum)
    }.toMap
    val expected = occ.groupBy(_._1).map { case (id, xs) =>
      val ranks = xs.map { case (_, g) => rankOf(cnt(g)) }
      val hapax = xs.count { case (_, g) => cnt(g) == 1L }
      id -> (xs.size.toLong, ranks.sum, ranks.sum / xs.size, hapax.toLong)
    }
    val got = SparkEntry.queries("q147_rank_fluency")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: ${got(id)} != reference $e")
    }
  }

  test("q148 law: hit counters ≡ an independent in-memory shingle recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def windows(t: String): Seq[(String, String)] = {
      val w = t.split("\\s+", -1)
      if (w.length < 5) Seq.empty
      else (0 to w.length - 5).map { i =>
        (w.slice(i, i + 5).mkString(" "),
          s"${w(i)} ${w(i + 1)} * ${w(i + 3)} ${w(i + 4)}")
      }
    }
    val bench = docs.filter(_._1 < 50).flatMap(d => windows(d._2))
    val bv = bench.map(_._1).toSet
    val bg = bench.map(_._2).toSet
    val expected = docs.filter(_._1 >= 50).flatMap { case (id, t) =>
      val ws = windows(t)
      if (ws.isEmpty) None
      else {
        val vb = ws.count(x => bv(x._1)).toLong
        val gp = ws.count(x => bg(x._2)).toLong
        val po = ws.count(x => bg(x._2) && !bv(x._1)).toLong
        if (gp > 0) Some(id -> (ws.size.toLong, vb, gp, po)) else None
      }
    }.toMap
    val got = SparkEntry.queries("q148_gapped_contamination")(spark, sf)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected,
      s"mismatch: only-in-got=${got.keySet -- expected.keySet} " +
        s"only-in-expected=${expected.keySet -- got.keySet}")
    // a verbatim hit's gapped key is in the bench gapped set by
    // construction, so the gapped detector dominates the verbatim one
    got.values.foreach { case (n, vb, gp, po) =>
      assert(gp >= vb, "gapped hits must dominate verbatim hits")
      assert(vb <= n && gp <= n && po <= gp)
    }
  }

  test("q146 law: docs_split is non-increasing in C; chunk arithmetic exact") {
    val rows = SparkEntry.queries("q146_context_sweep")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(128, 256, 512, 1024, 2048))
    val nDocs = rows.map(_._2).distinct
    assert(nDocs.size == 1, "every C sees the same document count")
    rows.sliding(2).foreach {
      case Array((_, _, s1, _, _), (_, _, s2, _, _)) =>
        assert(s2 <= s1, "a larger context window never splits more docs")
      case _ =>
    }
    rows.foreach { case (c, _, _, nc, pad) =>
      assert(pad >= 0 && pad < c, s"padding must be in [0, $c)")
      assert(nc > 0)
    }
  }

  test("q151 laws: tempered shares flatten the distribution, floors bound the sums") {
    val rows = SparkEntry.queries("q151_temperature_mix")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val n = rows.length
    val totN = rows.map(_._2).sum
    // weight is the exact integer sqrt of the token count
    rows.foreach { case (src, nt, w, _, _, _) =>
      assert(w * w <= nt && (w + 1) * (w + 1) > nt,
        s"$src: weight $w is not isqrt($nt)")
    }
    // floor rounding: each sum lands within n of its exact target
    val shareSum = rows.map(_._4).sum
    assert(shareSum > 1000000L - n && shareSum <= 1000000L, s"share sum $shareSum")
    val drawSum = rows.map(_._5).sum
    assert(drawSum > totN - n && drawSum <= totN, s"draw sum $drawSum vs $totN")
    // the full integer pipeline ≡ an independent BigInt recompute
    val totW = rows.map(_._3).sum
    rows.foreach { case (src, nt, w, share, draw, over) =>
      assert(share == w * 1000000L / totW, s"$src share")
      val d = (BigInt(totN) * w / totW).toLong
      assert(draw == d, s"$src draw $draw != $d")
      assert(over == (BigInt(d) * 1000000 / nt).toLong, s"$src oversample")
    }
    // α < 1 flattens: the reported ppm can invert between near-equal
    // sources by isqrt flooring (relative slack ~1/weight), so the
    // order law is asserted on the exact integer pipeline inputs: a
    // strictly smaller source never gets a strictly smaller weight
    rows.sortBy(_._2).sliding(2).foreach {
      case Array((_, n1, w1, _, _, _), (_, n2, w2, _, _, _)) if n1 <= n2 =>
        assert(w1 <= w2, s"isqrt monotonicity broken: ($n1,$w1) vs ($n2,$w2)")
      case _ =>
    }
    // the head is down-sampled, the tail is up-sampled (unless uniform)
    val (minSrc, maxSrc) = (rows.minBy(_._2), rows.maxBy(_._2))
    if (minSrc._2 < maxSrc._2) {
      assert(minSrc._6 >= 1000000L - n, s"smallest source ${minSrc._1} not up-sampled")
      assert(maxSrc._6 <= 1000000L, s"largest source ${maxSrc._1} not down-sampled")
    }
  }

  test("q159 laws: planted codebook shows greedy over-fragmenting; DP bounds hold") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // {ab, bcd} on "abcd": greedy eats "ab" then singles (3 pieces);
    // the optimum is a|bcd (2) — the classic longest-match trap
    val planted = Seq("abcd").toDF("word")
      .select(
        graft.queries.TextQueries.greedyPieces(col("word"), Seq("ab", "bcd")).as("g"),
        graft.queries.TextQueries.optPieces(col("word"), Seq("ab", "bcd")).as("o"))
      .head()
    assert(planted.getLong(0) == 3L, s"greedy ${planted.getLong(0)}")
    assert(planted.getLong(1) == 2L, s"opt ${planted.getLong(1)}")
    // corpus rollup invariants: optimum never worse, ceil(len/4) floor
    val rows = SparkEntry.queries("q159_viterbi_segment")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (wlen, nw, imp, gs, os, saved) =>
      assert(os <= gs, s"len $wlen: optimum worse than greedy")
      assert(imp <= nw)
      assert(os >= nw * ((wlen + 3) / 4), s"len $wlen below the piece floor")
      assert(gs <= nw * wlen, s"len $wlen above the singles ceiling")
      assert(saved >= 0)
    }
  }
}
