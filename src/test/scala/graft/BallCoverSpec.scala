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
}
