package graft

import java.nio.file.Files

import graft.operators.Materialize
import graft.operators.Materialize.MaterializeOps
import graft.queries.DedupQueries

class MaterializeSpec extends SparkSpec {

  private def withMode[A](mode: String)(body: => A): A = {
    val prev = spark.conf.getOption(Materialize.ModeKey)
    spark.conf.set(Materialize.ModeKey, mode)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(Materialize.ModeKey, v)
      case None => spark.conf.unset(Materialize.ModeKey)
    }
  }

  test("default mode is local: plan is the localCheckpoint scan (bench shape unchanged)") {
    import spark.implicits._
    val ds = Seq(1, 2, 3).toDS()
    val cut = ds.materialized
    // localCheckpoint manifests as a scan over checkpointed blocks — no lineage
    assert(cut.queryExecution.optimizedPlan.collectLeaves().head
      .getClass.getSimpleName.contains("LogicalRDD"))
    assert(cut.collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("none mode hands back the identical dataset (full lineage to Catalyst)") {
    import spark.implicits._
    withMode("none") {
      val ds = Seq(1, 2, 3).toDS().map(_ * 2)
      assert(Materialize(ds) eq ds)
    }
  }

  test("reliable mode checkpoints to the configured dir and preserves results") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ckpt").toString
    withMode("reliable") {
      spark.conf.set(Materialize.DirKey, dir)
      try {
        val ds = Seq(1, 2, 3).toDS().map(_ + 10)
        val cut = ds.materialized
        assert(cut.collect().sorted.toSeq == Seq(11, 12, 13))
        // the checkpoint actually landed in the reliable dir
        assert(spark.sparkContext.getCheckpointDir.exists(_.contains(
          new java.io.File(dir).getName)))
      } finally spark.conf.unset(Materialize.DirKey)
    }
  }

  test("reliable mode without a dir fails with an actionable message") {
    import spark.implicits._
    // fresh contexts in this suite share the SparkContext; only meaningful
    // when no checkpoint dir has been set yet — simulate via message check
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      withMode("reliable") {
        val ex = intercept[IllegalStateException](Seq(1).toDS().materialized)
        assert(ex.getMessage.contains(Materialize.DirKey))
      }
    }
  }

  test("a multi-branch query is mode-invariant: q24 clusters agree local vs none") {
    val local = withMode("local") {
      DedupQueries.q24.spark(spark, "/root/testdata/sf0.001").collect().map(_.toSeq).toSet
    }
    val none = withMode("none") {
      DedupQueries.q24.spark(spark, "/root/testdata/sf0.001").collect().map(_.toSeq).toSet
    }
    assert(local == none && local.nonEmpty)
  }
}
