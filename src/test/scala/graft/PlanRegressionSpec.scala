package graft

import graft.queries.RelationalQueries

/** Plan-shape regression guards: the properties PLANS.md documents are
  * asserted here so a query edit can't silently lose pushdown, broadcast,
  * or top-k rewrites. String-matching the executed plan is deliberate —
  * it's what `.explain` shows and survives operator refactors. */
class PlanRegressionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(q: graft.queries.Q): String =
    q.spark(spark, sf).queryExecution.executedPlan.toString

  test("q02: predicates and projection pushed into the parquet scan") {
    val plan = planOf(RelationalQueries.q02)
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("GreaterThan(l_quantity"), plan.take(2000))
    // pruned read schema: none of the untouched columns appear in the scan
    assert(!plan.contains("l_comment") && !plan.contains("l_tax"))
  }

  test("q03: dimension joins are broadcast") {
    val plan = planOf(RelationalQueries.q03)
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q04: semi join stays a semi join with filter pushed") {
    val plan = planOf(RelationalQueries.q04)
    assert(plan.contains("LeftSemi"), plan.take(2000))
    assert(plan.contains("GreaterThan(l_quantity,49.0)"), plan.take(2000))
  }

  test("q09: global top-k compiles to TakeOrderedAndProject") {
    val plan = planOf(RelationalQueries.q09)
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q01: aggregation is partial+final hash aggregate") {
    val plan = planOf(RelationalQueries.q01)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(2000))
  }

  test("q44: as-of joins through the custom AsOfJoinExec operator") {
    val plan = planOf(RelationalQueries.q44)
    assert(plan.contains("AsOfJoin"), plan.take(2000))
  }
}
