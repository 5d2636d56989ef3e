package graft

import graft.queries.{DedupQueries, RelationalQueries, ScaleQueries}

/** Semantic invariants of the round-5 operators (q101 chunk dedup with
  * reconstruction, q102 cohort retention, q103 sorted-neighborhood dedup,
  * q105 EWMA, q106 skew audit, q107 anomaly screen, q109 transitions)
  * beyond the DuckDB hash oracle: from-scratch driver-side recomputes and
  * cross-query consistency laws at sf0.001, so a silent drift in a
  * building block fails even if both engines drift together.
  */
class Round5OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docs: Array[(Long, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  private def words(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  test("q101: matches a from-scratch chunk-dedup recompute incl. reconstruction") {
    val got = DedupQueries.q101.spark(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toMap

    // from scratch: global first-occurrence of each 8-token chunk in
    // (doc_id, chunk_idx) order
    val seen = scala.collection.mutable.Set.empty[String]
    val expect = docs.sortBy(_._1).map { case (id, text) =>
      val ws = words(text)
      val chunks = ws.grouped(8).map(_.mkString(" ")).toVector
      val kept = chunks.filter { c =>
        if (seen.contains(c)) false else { seen += c; true }
      }
      id -> ((chunks.length.toLong, kept.length.toLong,
        kept.map(c => words(c).length).sum.toLong, kept.mkString(" ")))
    }.toMap
    assert(got == expect)
  }

  test("q101: a corpus with zero duplicate chunks reconstructs verbatim") {
    // docs whose chunks are all globally unique must come back unchanged
    val byId = docs.toMap
    DedupQueries.q101.spark(spark, sf).collect().foreach { r =>
      if (r.getLong(1) == r.getLong(2)) { // n_chunks == n_kept
        val original = words(byId(r.getLong(0))).mkString(" ")
        assert(r.getString(4) == original, s"doc ${r.getLong(0)}")
      }
    }
  }

  test("q103: exact-duplicate documents adjacent in sort order are always caught") {
    // q20's exact duplicate groups share identical text, hence identical
    // 24-char sort keys; within a group at least the SNM window's
    // adjacent members must appear as jaccard-1.0 pairs
    val pairs = DedupQueries.q103.spark(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val byText = docs.groupBy(_._2).values.filter(_.length >= 2)
    // sort duplicates as q103 does (same key ⇒ doc_id order) and check
    // each consecutive pair within a duplicate group
    val caught = pairs.map(p => (p._1, p._2)).toSet
    byText.foreach { grp =>
      val ids = grp.map(_._1).sorted
      val prefix = grp.head._2.take(24)
      ids.sliding(2).filter(_.length == 2).foreach { w =>
        val (a, b) = (w(0), w(1))
        // duplicates share the WHOLE text, so the sort key ties break by
        // doc_id — a and b are rank-adjacent unless another doc with the
        // same 24-char prefix has an id between them
        val between = docs.count { case (id, t) =>
          t.take(24) == prefix && id > a && id < b
        }
        if (between == 0)
          assert(caught.contains((a, b)),
            s"adjacent exact dups ($a,$b) missed")
      }
    }
    // and every reported pair must actually clear the 0.8 threshold
    pairs.foreach { case (_, _, j) => assert(j >= 0.8 - 1e-9) }
  }

  test("q105: EWMA matches a from-scratch per-user recompute") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val got = RelationalQueries.q105.spark(spark, sf).collect()
      .map(r => r.getLong(1) -> r.getDouble(4)).toMap
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val ordered = sorted.map(_._4)
      ordered.indices.foreach { i =>
        val window = (0 until 16).flatMap { k =>
          if (i - k >= 0) Some((ordered(i - k), math.pow(0.5, k))) else None
        }
        val expect = window.map { case (v, w) => v * w }.sum /
          window.map(_._2).sum
        val eid = sorted(i)._2
        assert(math.abs(got(eid) - expect) < 1e-9, s"event $eid")
      }
    }
  }

  test("q106: reported join cardinality equals the materialized join's count") {
    val audit = ScaleQueries.q106.spark(spark, sf).collect()
    val joinRows = audit.head.getLong(4)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(org.apache.spark.sql.functions.col("l_partkey").as("k"))
    val actual = li.as("a").join(li.as("b"), "k").count()
    assert(joinRows == actual)
    // heavy keys are reported in degree-descending order
    val ds = audit.map(_.getLong(1))
    assert(ds.sameElements(ds.sortBy(-_)))
  }

  test("q107: flags exactly the >3-sigma events of a from-scratch recompute") {
    val ev = graft.queries.Tables.events(spark, sf)
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val got = RelationalQueries.q107.spark(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val expect = ev.groupBy(_._2).values.flatMap { rows =>
      val xs = rows.map(_._3)
      val n = xs.length
      val mean = xs.sum / n
      val varSum = xs.map(x => (x - mean) * (x - mean)).sum
      rows.filter { case (_, _, x) =>
        (x - mean) * (x - mean) * (n - 1) > 9.0 * varSum
      }.map(_._1)
    }.toSet
    // the engine uses exact-decimal moment sums; the recompute uses naive
    // float sums — the flag sets must still agree unless an event sits
    // within float-noise of the 3σ boundary (none do in this data)
    assert(got == expect)
  }

  test("q109: per-from probabilities are a (floor-scaled) distribution") {
    val rows = RelationalQueries.q109.spark(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, grp) =>
      val cFrom = grp.head._4
      assert(grp.forall(_._4 == cFrom)) // one total per from-state
      assert(grp.map(_._3).sum == cFrom) // transitions partition the total
      val pSum = grp.map(_._5).sum
      // floor-scaled probabilities sum to 1e6 within #cells floor losses
      assert(pSum <= 1000000L && pSum > 1000000L - grp.length)
    }
  }
}
