package graft

import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, PipelineQueries, SimilarityQueries, TextQueries}

/** Semantic invariants of the round-2 pipeline operators (q24/q25/q38/q45/
  * q46) that the DuckDB hash oracle cannot express as directly: cluster
  * laws, subset relations between exact and approximate variants, and a
  * from-scratch Scala recompute of one document's quality metrics. */
class PipelinePropertiesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q24 clusters: edge endpoints co-clustered, one min-id survivor each") {
    val pairs = DedupQueries.q21.spark(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = DedupQueries.q24.spark(spark, sf).collect()
    val cluster = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every near-dup edge is resolved into one component
    pairs.foreach { case (a, b) => assert(cluster(a) == cluster(b)) }
    // cluster id is the component's min member; exactly that member survives
    val members = rows.groupBy(_.getLong(1))
    members.foreach { case (cid, ms) =>
      assert(ms.map(_.getLong(0)).min == cid)
      assert(ms.count(_.getInt(3) == 1) == 1)
      assert(ms.find(_.getInt(3) == 1).get.getLong(0) == cid)
      // cluster_size column agrees with the actual member count
      ms.foreach(m => assert(m.getLong(2) == ms.length))
    }
    // all docs present exactly once
    assert(rows.length == spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("q78 repetition char-fractions match a from-scratch recompute for two docs") {
    val q = TextQueries.q78.spark(spark, sf)
    Seq(0L, 7L).foreach { id =>
      val r = spark.read.parquet(s"$sf/documents.parquet")
        .filter(col("doc_id") === id).select("text", "n_chars").head()
      val text = r.getString(0)
      val nChars = r.getLong(1)
      val w = text.split("\\s+").filter(_.nonEmpty)
      def grams(n: Int): Seq[String] =
        (1 to math.max(w.length - (n - 1), 1)).map(i =>
          w.slice(i - 1, i - 1 + n).mkString(" "))
      val c2 = grams(2).groupBy(identity).view.mapValues(_.size)
      // (count desc, gram asc) tie-break, char mass = cnt * strlen(gram)
      val (topG, topC) = c2.toSeq.minBy { case (g, c) => (-c, g) }
      val dup5 = grams(5).groupBy(identity).view.mapValues(_.size)
        .collect { case (g, c) if c > 1 => c.toLong * g.length }.sum
      val row = q.filter(col("doc_id") === id).head()
      assert(row.getLong(1) == topC.toLong * topG.length, s"doc $id top2")
      assert(row.getLong(2) == dup5, s"doc $id dup5")
      assert(row.getDouble(3) == topC.toLong * topG.length / nChars.toDouble)
      assert(row.getDouble(4) == dup5 / nChars.toDouble)
    }
  }

  test("q25 quality metrics match a from-scratch recompute for one doc") {
    val text = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") === 0).select("text").head().getString(0)
    val w = text.split("\\s+").filter(_.nonEmpty)
    def grams(n: Int): Seq[String] =
      (1 to math.max(w.length - (n - 1), 1)).map(i =>
        w.slice(i - 1, i - 1 + n).mkString(" "))
    val bi = grams(2).groupBy(identity).map(_._2.size)
    val g5 = grams(5).groupBy(identity).map(_._2.size)
    val row = TextQueries.q25.spark(spark, sf)
      .filter(col("doc_id") === 0).head()
    assert(row.getLong(1) == w.length)                                // n_words
    assert(row.getDouble(2) == w.distinct.length.toDouble / w.length) // ttr
    assert(row.getDouble(3) == w.map(_.length).sum.toDouble / w.length)
    assert(row.getDouble(4) == bi.max.toDouble / bi.sum)              // top bigram
    assert(row.getDouble(5) ==
      g5.filter(_ > 1).sum.toDouble / g5.sum)                         // dup 5-grams
  }

  test("q38 contamination: bench docs excluded, ratios bounded") {
    val rows = DedupQueries.q38.spark(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 101 != 0)
      val (total, hit, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(hit >= 0 && hit <= total)
      assert(frac == hit.toDouble / total)
    }
  }

  test("q45 semantic dedup pairs are a subset of q42 exact pairs") {
    val exact = SimilarityQueries.q42.spark(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = SimilarityQueries.q45.spark(spark, sf).collect()
    sem.foreach { r =>
      val (a, b) = (r.getLong(1), r.getLong(2))
      assert(a < b)
      assert(exact.contains((a, b)),
        s"semantic pair ($a,$b) missing from exact threshold pairs")
      assert(r.getLong(4) == a) // survivor = min id of the pair
    }
  }

  test("q46 tf-idf: ranking law and score arithmetic hold") {
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    val rows = PipelineQueries.q46.spark(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val byRank = rs.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to rs.length))
      // scores non-increasing with rank; score = tf * ((1e9 * n) div df)
      byRank.sliding(2).foreach {
        case Array(hi, lo) => assert(hi.getLong(5) >= lo.getLong(5))
        case _ =>
      }
      rs.foreach(r =>
        assert(r.getLong(5) == r.getLong(3) * ((1000000000L * n) / r.getLong(4))))
    }
  }

  test("q53 bigram LM: per-doc bigram count and score bounds hold") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = PipelineQueries.q53.spark(spark, sf).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val (id, nBg, sum, avg) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      // bigrams = tokens - 1 under the same split
      assert(nBg == docs(id).split("\\s+", -1).length - 1)
      // each scaled conditional probability is in [1, 1e6]
      assert(sum >= nBg && sum <= nBg * 1000000L)
      assert(avg == sum.toDouble / nBg)
    }
  }

  test("q54 classifier score matches a from-scratch recompute for one doc") {
    val text = spark.read.parquet(s"$sf/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") === 0)
      .select("text").head().getString(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = text.split("\\s+").filter(_.nonEmpty).map { t =>
      val hex = md.digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val bucket = java.lang.Long.parseLong(hex, 16) % 16384
      (bucket * 2654435761L) % 1021 - 510
    }.sum
    val row = PipelineQueries.q54.spark(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 0).head()
    assert(row.getLong(2) == expected)
    assert(row.getString(3) == (if (expected > 0) "keep" else "drop"))
  }

  test("q55 curation: output satisfies every gate and is consistent with q54") {
    val rows = PipelineQueries.q55.spark(spark, sf).collect()
    assert(rows.nonEmpty)
    // classifier scores in the curated set agree with q54's per-doc scores
    val q54Scores = PipelineQueries.q54.spark(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val (id, nTok, ttr, score) =
        (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nTok >= 20 && ttr >= 35 && score > 0)
      assert(q54Scores(id) == score)
    }
    // the quality+sample gates actually cut something at this SF
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length < total)
    // curated docs are exact-dedup survivors (subset of q20's keep set)
    val survivors = DedupQueries.q20.spark(spark, sf).collect()
      .map(_.getLong(0)).toSet
    rows.foreach(r => assert(survivors.contains(r.getLong(0))))
  }

  test("q65 packing: offsets are gapless per worker and bins never exceed capacity") {
    val rows = PipelineQueries.q65.spark(spark, sf)
      .select("doc_id", "n_tokens", "worker", "start_off", "bin", "straddles")
      .collect()
    rows.groupBy(_.getInt(2)).foreach { case (_, ws) =>
      val sorted = ws.sortBy(_.getLong(0))
      // token stream is contiguous: each doc starts where the previous ended
      sorted.foldLeft(0L) { (expected, r) =>
        assert(r.getLong(3) === expected, s"gap at doc ${r.getLong(0)}")
        expected + r.getLong(1)
      }
    }
    rows.foreach { r =>
      val (n, start, bin, straddles) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getBoolean(5))
      assert(bin === start / 2048)
      assert(straddles === (start + n - 1) / 2048 > bin)
    }
    // a healthy corpus at this SF must actually pack (some straddlers exist)
    assert(rows.exists(_.getBoolean(5)))
  }

  test("q67 mixture sampling: rare groups up-weighted, availability capped") {
    val rows = PipelineQueries.q67.spark(spark, sf)
      .select("lang", "lang_docs", "thresh").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // temperature alpha=0.5 ⇒ keep-rate ∝ 1/sqrt(n). The integer floor in
    // w=⌊√n⌋ can locally invert neighbors that straddle a perfect square
    // (n=80 w=8 vs n=82 w=9), so assert monotonicity where it must hold:
    // a group at least 2x bigger never gets a higher threshold
    for ((_, na, ta) <- rows; (_, nb, tb) <- rows if nb >= 2 * na)
      assert(ta >= tb, s"n=$na thresh=$ta vs n=$nb thresh=$tb")
    // thresholds never exceed the hash-space size (rate caps at 1)
    rows.foreach { case (_, _, t) => assert(t <= (1L << 32)) }
    // the sample hits roughly the target size (deterministic given hashes)
    val total = PipelineQueries.q67.spark(spark, sf).count()
    assert(total > 0 && total < 500)
  }

  test("q72 BM25 score matches a from-scratch recompute for the top doc") {
    val top = PipelineQueries.q72.spark(spark, sf).collect()
    assert(top.nonEmpty && top.length <= 20)
    // scores are positive, ranked descending, term counts within the query
    top.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) >= 1 && r.getLong(2) <= 5)
    }
    assert(top.map(_.getLong(1)).toSeq == top.map(_.getLong(1)).sortBy(-_).toSeq)

    // third, independent implementation: plain Scala over the raw text
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty).toSeq)
      .toMap
    val nDocs = docs.size.toLong
    val totalTokens = docs.values.map(_.size.toLong).sum
    val dfMap = docs.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val query = dfMap.filter(_._1.length >= 4).toSeq
      .sortBy { case (t, d) => (-d, t) }.take(5)
    val docId = top.head.getLong(0)
    val words = docs(docId)
    val dl = words.size.toLong
    val expected = query.flatMap { case (t, d) =>
      val tf = words.count(_ == t).toLong
      if (tf == 0) None
      else {
        val idf = (1000000L * nDocs) / d
        val norm = 250L + (750L * dl * nDocs) / totalTokens
        Some(idf * tf * 2200L / (tf * 1000L + 1200L * norm / 1000L))
      }
    }.sum
    assert(top.head.getLong(1) === expected)
  }

  test("q71 CDC chunks re-synchronize after an insertion (fixed spans cannot)") {
    import spark.implicits._
    // a long pseudo-random word stream, and the same stream with one word
    // inserted near the front — every fixed-position window after the
    // insertion shifts, but CDC boundaries re-synchronize at the first
    // content-defined cut, so most chunk triples still match
    val words = (0 until 4000).map(i => s"w${(i * 2654435761L) % 9973}")
    val original = words.mkString(" ")
    val shifted = (words.take(5) ++ Seq("INSERTED") ++ words.drop(5)).mkString(" ")
    val docs = Seq((1L, original), (2L, shifted)).toDF("doc_id", "text")
    val chunks = DedupQueries.cdcChunks(docs).collect()
      .groupBy(_.getLong(0))
    def triples(id: Long) =
      chunks(id).map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val a = triples(1L)
    val b = triples(2L)
    assert(a.size > 10, s"expected many chunks, got ${a.size} (tune the stream)")
    val shared = a.intersect(b).size
    // all chunks strictly after the insertion's chunk re-sync; only the
    // chunk containing the insertion (and possibly its neighbor) differ
    assert(shared >= a.size - 3, s"only $shared of ${a.size} chunks re-synced")
  }

  test("q69 recipe: stages agree with their standalone operators") {
    val rows = PipelineQueries.q69.spark(spark, sf).collect()
    assert(rows.nonEmpty)
    // every output doc is an exact-dedup survivor and passed the gate
    val survivors = DedupQueries.q20.spark(spark, sf).collect()
      .map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(survivors.contains(r.getLong(0)))
      assert(r.getLong(2) >= 20) // n_tokens gate
    }
    // packing law: per worker, offsets are gapless and bins follow offsets
    rows.groupBy(_.getInt(3)).foreach { case (_, ws) =>
      ws.sortBy(_.getLong(0)).foldLeft(0L) { (expected, r) =>
        assert(r.getLong(4) === expected) // start_off
        assert(r.getLong(5) === expected / 1024) // bin
        expected + r.getLong(2)
      }
    }
    // the mixture stage actually cut the corpus
    assert(rows.length < survivors.size)
  }

  test("q68 histogram quantiles bracket the exact quantiles within 2x") {
    import graft.queries.SketchQueries
    val hist = SketchQueries.q68.spark(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // exact order statistics (the histogram's bound is vs the ⌈qn⌉-th
    // ranked value, not an interpolated quantile)
    val byLang = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "n_chars").collect()
      .groupBy(_.getString(0)).map { case (l, rs) =>
        l -> rs.map(_.getLong(1)).sorted
      }
    byLang.foreach { case (lang, vs) =>
      val (lb50, lb90, lb99) = hist(lang)
      def rank(q: Double): Long = vs((math.ceil(q * vs.length) - 1).toInt.max(0))
      for ((lb, q) <- Seq((lb50, 0.5), (lb90, 0.9), (lb99, 0.99))) {
        val v = rank(q)
        assert(lb <= v && v < 2 * lb, s"$lang q=$q lb=$lb exact=$v")
      }
      // quantile estimates are monotone in q
      assert(lb50 <= lb90 && lb90 <= lb99)
    }
  }

  test("q66 chunking: windows tile each doc with the configured overlap") {
    val rows = PipelineQueries.q66.spark(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    val nTokens = TextQueries.q30.spark(spark, sf)
      .select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (docId, cs) =>
      val sorted = cs.sortBy(_.getLong(1))
      // chunk ids are consecutive from 0
      sorted.zipWithIndex.foreach { case (r, i) => assert(r.getLong(1) === i) }
      val n = nTokens(docId)
      // chunk i spans exactly [448*i, 448*i + min(512, n - 448*i)) — so the
      // chunks tile the doc end-to-end with 64-token overlaps
      sorted.foreach { r =>
        val (i, len) = (r.getLong(1), r.getLong(2))
        assert(len === math.min(512L, n - 448 * i), s"doc $docId chunk $i")
      }
      val covered = sorted.map(r => 448 * r.getLong(1) + r.getLong(2)).max
      assert(covered === n, s"doc $docId covered $covered of $n")
    }
  }
}
