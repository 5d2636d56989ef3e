package graft

import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, ScaleQueries, Tables}

/** Semantic guarantees of the scale-technique suite (q60-q64) that the
  * DuckDB hash-match can't express: one-sided error directions, salt
  * invariance, grid density, and layout locality. */
class ScaleQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q60: Bloom pre-filter never misses a truly contaminated shingle") {
    // q38 computes the EXACT per-doc contaminated-shingle count against the
    // same held-out split; the Bloom flag count must dominate it row-by-row
    // (false positives allowed, false negatives structurally impossible).
    val bloom = ScaleQueries.q60.spark(spark, sf)
      .select(col("doc_id"), col("n_flagged"))
    val exact = DedupQueries.q38.spark(spark, sf)
      .select(col("doc_id"), col("n_contaminated"))
    val misses = bloom.join(exact, "doc_id")
      .filter(col("n_flagged") < col("n_contaminated"))
      .count()
    assert(misses === 0)
  }

  test("q61: salted join result is identical to the plain unsalted join") {
    val salted = ScaleQueries.q61.spark(spark, sf).collect().toSeq
    val plain = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") >= 30)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(Tables.revenueTerm(col("l_extendedprice"), col("l_discount"))), 2)
          .cast("double").as("revenue"))
      .orderBy("o_orderpriority")
      .collect().toSeq
    assert(salted === plain)
  }

  test("q62: grid is dense (hourly steps, no gaps) and fill is sticky") {
    val rows = ScaleQueries.q62.spark(spark, sf)
      .select("user_id", "hour", "n_events", "v_filled").collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, rs) =>
      val hours = rs.map(_.getTimestamp(1).getTime).sorted
      hours.sliding(2).foreach {
        case Array(a, b) => assert(b - a === 3600 * 1000L)
        case _ =>
      }
      // once a value has been observed, v_filled never goes back to null
      val seq = rs.sortBy(_.getTimestamp(1).getTime)
      var seen = false
      seq.foreach { r =>
        if (!r.isNullAt(3)) seen = true
        else assert(!seen, s"fill dropped back to null after an observation")
      }
    }
    // the grid re-aggregates to the raw event count for the sliced users
    val gridEvents = rows.map(_.getLong(2)).sum
    val raw = Tables.events(spark, sf).filter(col("user_id") % 11 === 0).count()
    assert(gridEvents === raw)
  }

  test("q63: count-min estimate dominates the exact count (one-sided error)") {
    val under = ScaleQueries.q63.spark(spark, sf)
      .filter(col("cm_est") < col("n_exact")).count()
    assert(under === 0)
  }

  test("q64: z-order buckets are local in BOTH dimensions") {
    // Mean per-bucket custkey extent must be well under the global extent —
    // the whole point of the interleaved key vs a single-dim sort. 16
    // occupied buckets of a 2-D curve should each cover roughly 1/4 of each
    // axis; assert a loose 1/2 bound to stay robust to tiny SFs.
    val rows = ScaleQueries.q64.spark(spark, sf)
      .select("min_cust", "max_cust", "n_rows").collect()
    val globalMin = rows.map(_.getLong(0)).min
    val globalMax = rows.map(_.getLong(1)).max
    val globalExtent = (globalMax - globalMin).toDouble
    val meanExtent = rows.map(r => (r.getLong(1) - r.getLong(0)).toDouble).sum / rows.length
    assert(meanExtent < globalExtent / 2,
      s"meanExtent=$meanExtent globalExtent=$globalExtent")
  }

  test("q60 plan: Bloom membership join broadcasts the filter side") {
    val plan = ScaleQueries.q60.spark(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q61 plan: join keys carry the salt") {
    val plan = ScaleQueries.q61.spark(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("salt"), plan.take(2000))
  }

  test("q62 plan: grid, join and fill all share the user_id partitioning") {
    val plan = ScaleQueries.q62.spark(spark, sf)
      .queryExecution.executedPlan.toString
    // every exchange below the final presentation sort is keyed by user_id
    val exchanges = "hashpartitioning\\(([a-z_0-9#]+)"
      .r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchanges.nonEmpty && exchanges.forall(_.startsWith("user_id")), plan.take(3000))
  }

  test("q63 plan: counter build is partial+final hash aggregation") {
    val plan = ScaleQueries.q63.spark(spark, sf)
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(3000))
  }

  test("engine-level runtime bloom pruning exists for single-job joins (q60 covers the rest)") {
    // Catalyst's InjectRuntimeFilter gives shuffle joins a bloom pre-filter
    // automatically WITHIN one plan; q60 exists because decontamination
    // wants the filter to outlive the job (reusable across corpora and in
    // streaming). Pin the behavior here so the division of labor stays
    // documented-and-true against Spark upgrades.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val fact = Tables.lineitem(s, sf).select("l_orderkey", "l_quantity")
    val dim = Tables.orders(s, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val plan = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), plan.take(3000))
  }

  test("AQE splits skewed sort-merge join partitions at runtime (q61 covers the rest)") {
    // The engine-side half of the skew story: for shuffle sort-merge joins
    // AQE re-splits oversized partitions AFTER materialization. q61's
    // explicit salting exists for everything AQE can't touch (custom
    // operators, streaming joins, bounding skew BEFORE the first shuffle).
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    import s.implicits._
    // one hot key carries ~95% of the fact side; pad derives from id so it
    // actually flows through the shuffle (a literal would be re-projected
    // above the join and the hot partition would be 8-byte keys only)
    val fact = s.range(0, 20000)
      .select(when($"id" < 19000, lit(7L)).otherwise($"id").as("k"),
        concat(lit("x" * 64), $"id").as("pad"))
    val dim = s.range(0, 200).select($"id".as("k"), lit(1L).as("v"))
    val joined = fact.join(dim, "k")
    joined.collect() // finalize THIS QueryExecution's adaptive plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan.take(1500))
    assert(plan.contains("skew=true"), plan.take(3000))
  }

  test("q127 groupSelect fails fast past the group-domain cap (no driver OOM path)") {
    // the driver histogram is G×4096 rows — safe only for low-cardinality
    // group keys; a high-cardinality key must error BEFORE collecting,
    // with a message pointing at the distributed alternative
    import spark.implicits._
    val wide = (0 until graft.queries.ScaleQueries.MaxSelectGroups + 5)
      .map(i => (s"g$i", i.toLong)).toDF("g", "v")
    val ex = intercept[IllegalStateException] {
      graft.queries.ScaleQueries.groupSelect(spark, wide)
    }
    assert(ex.getMessage.contains("group domain"))
    // and a small domain still selects the exact order statistics
    val small = Seq.tabulate(100)(i => ("a", i.toLong + 1)) ++
      Seq.tabulate(10)(i => ("b", i.toLong * 10))
    val got = graft.queries.ScaleQueries.groupSelect(
        spark, small.toDF("g", "v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // a: 1..100 → median = 50th = 50, p90 = ceil(909/10)=90th = 90
    // b: 0,10..90 → median = 5th = 40, p90 = 9th = 80
    assert(got.toSeq == Seq(("a", 100L, 50L, 90L), ("b", 10L, 40L, 80L)))
  }
}
