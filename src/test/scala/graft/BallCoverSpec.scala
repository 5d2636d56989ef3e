package graft

/** q94 (ball-cover exact embedding dedup) claims BIT-IDENTICAL output to
  * q42 (the all-pairs exact verifier) for any corpus — candidate pruning
  * is a conservative triangle-inequality bound and the survivor filter is
  * the same fixed-point cosine. Prove it by direct comparison, and check
  * the pruning machinery actually runs (cell-pair list exists and the big
  * join is an equi-join, not a big-side BNLJ — the suite-wide guard in
  * PlanRegressionSpec enforces the latter).
  */
class BallCoverSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q94 output is bit-identical to q42's exact all-pairs answer") {
    val exact = SparkEntry.queries("q42_dedup_embedding")(spark, sf)
      .collect().toSet
    val ball = SparkEntry.queries("q94_dedup_embedding_ball")(spark, sf)
      .collect().toSet
    assert(exact.nonEmpty, "q42 found no pairs — fixture degenerate")
    assert(ball === exact)
  }

  test("q94's big pair join is keyed on the cell pair (equi-join)") {
    val plan = SparkEntry.queries("q94_dedup_embedding_ball")(spark, sf)
      .queryExecution.executedPlan.toString
    // the n-row sides must exchange on the cell key, never all-pairs
    assert(plan.contains("hashpartitioning(cell"), plan.take(3000))
  }

  // ---- pruning power, measured (the round-5 verdict's watch item) ----

  private val Dim = 64
  private val Clusters = 20
  private val PerCluster = 100

  /** Deterministic clustered corpus: 20 well-separated centers, tight
    * integer-derived noise, ids round-robin across clusters so the first
    * ⌈√n⌉ seed centroids cover every cluster. */
  private def clusteredCorpus(): Seq[(Long, Array[Float])] = {
    def center(c: Int): Array[Float] =
      Array.tabulate(Dim)(d => (((c * 31 + d * 7) % 13) - 6).toFloat)
    (0 until Clusters * PerCluster).map { i =>
      val c = i % Clusters // round-robin: seeds span all clusters
      val base = center(c)
      val noisy = Array.tabulate(Dim)(d =>
        base(d) + (((i * 131 + d * 17) % 11) - 5) * 0.01f)
      (i.toLong, noisy)
    }
  }

  /** The engine's exact arithmetic, replicated: per-element
    * floor(a·b·1e15) summed as a long, /1e15; cosine from the same. */
  private def fdot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0L
    var d = 0
    while (d < Dim) {
      s += math.floor(a(d).toDouble * b(d).toDouble * 1e15).toLong
      d += 1
    }
    s / 1e15
  }

  test("ball-cover is bit-identical to brute force on a CLUSTERED corpus too") {
    import spark.implicits._
    val corpus = clusteredCorpus()
    val df = corpus.map { case (id, e) => (id, e.toSeq) }
      .toDF("vec_id", "embedding")
    val got = graft.queries.SimilarityQueries.ballCover(df, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute force with the identical fixed-point arithmetic
    val norms = corpus.map { case (_, e) => math.sqrt(fdot(e, e)) }.toArray
    val expect = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    var i = 0
    while (i < corpus.length) {
      var j = i + 1
      while (j < corpus.length) {
        val cos = fdot(corpus(i)._2, corpus(j)._2) / (norms(i) * norms(j))
        if (cos >= 0.4) expect += ((i.toLong, j.toLong, cos))
        j += 1
      }
      i += 1
    }
    assert(expect.nonEmpty, "fixture degenerate: no pairs above threshold")
    assert(got == expect.toSet)
  }

  test("residual bounds PRUNE on clustered data: candidates ≪ all-pairs") {
    import spark.implicits._
    val corpus = clusteredCorpus()
    val df = corpus.map { case (id, e) => (id, e.toSeq) }
      .toDF("vec_id", "embedding")
    val n = corpus.length.toLong
    val allPairs = n * (n - 1) / 2
    val cand = graft.queries.SimilarityQueries
      .ballCoverCandidates(df, 0.4).count()
    // tight clusters ⇒ small radii + small per-vector residuals ⇒ the
    // triangle bounds eliminate most cross-cluster cell pairs; this is
    // the clustered-real-data regime the q94 scaladoc claims. (On the
    // isotropic synthetic testdata the same bounds admit nearly all
    // pairs — measured by tools' Audit main and recorded in PLANS.md —
    // which is exactly the documented data-dependence.)
    assert(cand < allPairs / 4,
      s"clustered corpus: $cand candidates of $allPairs all-pairs — bounds not pruning")
  }
}
