package graft

import org.apache.spark.sql.functions._

/** Adaptive Query Execution evidence — the runtime re-planning the 100 TB
  * design leans on (PLANS.md cites AQE for skew and broadcast decisions),
  * machine-checked rather than asserted in prose: a statically-planned
  * sort-merge join whose build side turns out tiny must flip to a
  * broadcast join at runtime, and a 32-partition shuffle of a tiny
  * aggregate must coalesce. Both run on a fresh session so the suite's
  * static-planning specs (PlanRegressionSpec) are unaffected. */
class AqeSpec extends SparkSpec {

  private def aqeSession() = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s.conf.set("spark.sql.shuffle.partitions", "32")
    s
  }

  test("runtime broadcast: SMJ flips to BHJ once the small side's true size is known") {
    val s = aqeSession()
    // deny the STATIC broadcast decision (the pre-filter size estimate is
    // over the tiny static threshold), allow the runtime one — exactly the
    // cluster situation after a selective filter whose selectivity the
    // optimizer could not know
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "1MB")
    val big = s.range(0, 100000).select(col("id") % 100 as "k", col("id") as "v")
    val small = s.range(0, 100).select(col("id") as "kk")
      .filter(col("kk") < 10) // runtime size: 10 rows
    val joined = big.join(small, col("k") === col("kk"))
    // execute THIS dataset's own query execution (count() would spawn a
    // separate one and leave this plan unfinalized)
    assert(joined.collect().length == 10000)
    val printed = joined.queryExecution.executedPlan.toString
    assert(printed.contains("AdaptiveSparkPlan isFinalPlan=true"), printed.take(500))
    // the adaptive plan prints final + initial; judge the FINAL section only
    val finalPlan = printed.split("== Initial Plan ==")(0)
    assert(finalPlan.contains("BroadcastHashJoin"), finalPlan.take(3000))
    assert(!finalPlan.contains("SortMergeJoin"), finalPlan.take(3000))
  }

  test("partition coalescing: a 32-way shuffle of a tiny aggregate collapses") {
    val s = aqeSession()
    val agg = s.range(0, 10000)
      .groupBy((col("id") % 5).as("g")).agg(count(lit(1)).as("n"))
    assert(agg.collect().length == 5)
    val finalPlan = agg.queryExecution.executedPlan.toString
    assert(finalPlan.contains("AQEShuffleRead"), finalPlan.take(3000))
    assert(finalPlan.contains("coalesced"), finalPlan.take(3000))
  }
}
