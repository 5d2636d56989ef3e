package graft

import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, PipelineQueries, ScaleQueries}

/** Semantic invariants of the round-4 curation operators (q82 incremental
  * dedup, q83 threshold sweep, q84 systematic weighted sampling, q85
  * snapshot diff) beyond the DuckDB hash oracle: side/shape laws for the
  * asymmetric dedup probe, monotonicity of the yield curve, the exact
  * sample-count identity of systematic sampling, and a full from-scratch
  * recompute of the snapshot diff. */
class CurationOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("q82: matches pair a new-batch doc with a corpus doc, once, at ≥ 0.5") {
    val rows = DedupQueries.q82.spark(spark, sf).collect()
    def isNew(id: Long): Boolean = id % 5 == 3
    // one best match per batch doc
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach { r =>
      assert(isNew(r.getLong(0)), "doc_new must be batch-side")
      assert(!isNew(r.getLong(1)), "doc_old must be corpus-side")
      assert(r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0)
    }
    // a batch doc with an exact corpus twin has identical signatures →
    // its best match agrees on all 64 positions (guarded: the tiny SF may
    // not contain such a pair, and an over-capped bucket could drop one)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val corpusTexts = texts.filter(t => !isNew(t._1)).map(_._2).toSet
    val twins = texts.filter(t => isNew(t._1) && corpusTexts(t._2)).map(_._1).toSet
    val best = rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    twins.foreach { id =>
      best.get(id).foreach(j => assert(j == 1.0, s"exact twin $id scored $j"))
    }
  }

  test("q83: yield curve is monotone and threshold 0 retains the corpus") {
    val rows = PipelineQueries.q83.spark(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).toSeq == (0L until 10L))
    assert(rows.head.getLong(1) == docs.count())
    assert(rows.head.getDouble(3) == 1.0 && rows.head.getDouble(4) == 1.0)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) >= b.getLong(1), "docs_retained must not increase")
      assert(a.getLong(2) >= b.getLong(2), "tokens_retained must not increase")
    }
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("q84: multiplicities sum to exactly m = 1000 and track weight share") {
    val rows = ScaleQueries.q84.spark(spark, sf).collect()
    // systematic sampling draws EXACTLY m slots — the defining identity
    assert(rows.map(_.getLong(2)).sum == 1000L)
    val totalW = docs.agg(sum("n_chars")).collect().head.getLong(0)
    rows.foreach { r =>
      val (w, mult) = (r.getLong(1), r.getLong(2))
      assert(mult >= 1)
      // an interval of length w covers at most floor(w·m/W) + 1 slots
      assert(mult <= w * 1000L / totalW + 1, s"doc ${r.getLong(0)}: $mult slots for weight $w")
    }
    // every doc heavy enough to span a full slot stride must be sampled
    val sampled = rows.map(_.getLong(0)).toSet
    docs.select("doc_id", "n_chars").collect().foreach { r =>
      if (r.getLong(1) * 1000L >= totalW)
        assert(sampled(r.getLong(0)), s"doc ${r.getLong(0)} spans a stride but was missed")
    }
  }

  test("q85: diff equals a from-scratch recompute of both snapshots") {
    val got = ScaleQueries.q85.spark(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val all = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = all.flatMap { case (id, text) =>
      val inOld = id % 7 != 0
      val inNew = id % 5 != 0
      val newText = if (id % 11 == 0) text.toUpperCase else text
      (inOld, inNew) match {
        case (false, true) => Some(id -> "added")
        case (true, false) => Some(id -> "removed")
        case (true, true) if newText != text => Some(id -> "changed")
        case _ => None
      }
    }.toMap
    assert(got == expected)
  }
}
