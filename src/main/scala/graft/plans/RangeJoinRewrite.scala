package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, AttributeReference, Cast, EqualNullSafe, EqualTo,
  Explode, Expression, GreaterThanOrEqual, IntegralDivide, LessThanOrEqual,
  Literal, Pmod, PredicateHelper, Sequence, Subtract
}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite an interval-containment inner join
  * (`point >= lo AND point <= hi`, NO equi conjunct) into the binned
  * equi-join of [[graft.operators.RangeJoin]] — automatically, so a user
  * who writes the naive `df.join(intervals, p.between(lo, hi))` gets a
  * shuffle hash join instead of a broadcast nested loop. This is the rule
  * form of the same rewrite the operator offers explicitly; both exist so
  * the optimization composes with plain SQL too.
  *
  * Activation: `spark.graft.rangeJoin.binWidth` (long, > 0) — off by
  * default, mirroring how engines gate range-join optimizations on a
  * user-provided bin hint (the width is a data property the optimizer
  * cannot know). Injected by [[graft.GraftExtensions]]
  * (`injectOptimizerRule`); also addable to a live session via
  * `spark.experimental.extraOptimizations`.
  *
  * Eligibility: inner join whose condition contains a lower and an upper
  * bound on the SAME integral expression (int/long), point from one side,
  * bounds from the other, and no cross-side equi conjunct (if one exists
  * the join is already hash-joinable and binning would only add overhead).
  * The rewrite keeps the ORIGINAL condition as a residual, so semantics
  * are preserved for every edge (null point/bounds, inverted intervals):
  * anything the buckets over-admit, the residual re-filters. The equi
  * conjunct the rewrite introduces also makes the rule self-stabilizing —
  * the rewritten join is no longer eligible, so the fixed-point batch
  * terminates.
  *
  * Bucket arithmetic is floor division spelled `(c - pmod(c, w)) div w` —
  * exact-multiple numerator, so truncating division equals floor for
  * negatives — all codegen-able Catalyst expressions, no UDF.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BinWidthKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(BinWidthKey, "0").toLongOption.getOrElse(0L)
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rewrite(j, cond, w).getOrElse(j)
    }
  }

  private def rewrite(j: Join, cond: Expression, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val leftOut = j.left.outputSet
    val rightOut = j.right.outputSet

    // Some(true) = references only the left side; None = mixed/neither
    def side(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(leftOut)) Some(true)
      else if (e.references.subsetOf(rightOut)) Some(false)
      else None

    def crossSideEqui(c: Expression): Boolean = c match {
      case EqualTo(a, b)       => side(a).isDefined && side(b).isDefined && side(a) != side(b)
      case EqualNullSafe(a, b) => side(a).isDefined && side(b).isDefined && side(a) != side(b)
      case _                   => false
    }
    if (conjuncts.exists(crossSideEqui)) return None

    def integral(e: Expression): Boolean = e.dataType match {
      case IntegerType | LongType => true
      case _                      => false
    }
    // normalize a conjunct to (point, bound, isLowerBound) candidates
    def bounds(c: Expression): Seq[(Expression, Expression, Boolean)] = c match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
      case _                        => Nil
    }
    val cands = conjuncts.flatMap(bounds).filter {
      case (p, b, _) =>
        integral(p) && integral(b) && side(p).isDefined &&
          side(b).isDefined && side(p) != side(b)
    }
    val pair = (for {
      (p1, lo, true) <- cands.iterator
      (p2, hi, false) <- cands.iterator
      if p1.semanticEquals(p2) && side(lo) == side(hi)
    } yield (p1, lo, hi)).nextOption()

    pair.map { case (point, lo, hi) =>
      def floorDiv(c: Expression): Expression = {
        val cl = Cast(c, LongType)
        val wl = Literal(w)
        IntegralDivide(Subtract(cl, Pmod(cl, wl)), wl)
      }
      val pointOnLeft = side(point).get
      val (pointPlan, intervalPlan) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

      val binAlias = Alias(floorDiv(point), "__graft_bin_p")()
      val pointProj = Project(pointPlan.output :+ binAlias, pointPlan)
      val pb: Attribute = pointProj.output.last

      val genOut = AttributeReference("__graft_bin_i", LongType, nullable = false)()
      // analysis is over by optimize time, so ResolveTimeZone won't fill
      // the TimeZoneAwareExpression slot — set it explicitly or the plan
      // flips back to unresolved and the batch validator rejects it
      val gen = Generate(
        Explode(Sequence(floorDiv(lo), floorDiv(hi), None,
          Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(genOut), child = intervalPlan)

      val (nl, nr) = if (pointOnLeft) (pointProj, gen) else (gen, pointProj)
      val binned = Join(nl, nr, Inner, Some(And(EqualTo(pb, genOut), cond)), j.hint)
      Project(j.output, binned)
    }
  }
}
