package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.RollingHash64

/** Session extensions for the engine's custom Catalyst surface — the
  * injection-point variant of [[graft.functions.GraftFunctions.registerAll]]
  * for clusters configured declaratively:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * Injects `rolling_hash` (SQL-callable, codegen'd) and the as-of-join
  * planner strategy ([[graft.plans.AsOfJoinStrategy]] — plans the custom
  * [[graft.plans.AsOfJoinPlan]] node as the streaming-merge
  * [[graft.plans.AsOfJoinExec]]). New custom expressions/rules/strategies
  * register here so every session — including ones we don't build
  * ourselves (Thrift server, connect) — sees the same surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash64].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash64(exprs.head)
    ))
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
