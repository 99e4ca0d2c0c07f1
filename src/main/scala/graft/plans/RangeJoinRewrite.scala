package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule (SURVEY.md §7.3 path (c), the "planning rule"
  * tier): rewrites an inner range-theta join
  * `points ⋈ intervals ON x >= lo AND x < hi` into the interval-bucketed
  * equi-join of [[graft.ops.RangeJoin]] — automatically, for ANY plan that
  * contains the shape, including plain SQL the engine's users write.
  *
  * Why a rule and not just the operator API: Spark plans the raw theta
  * condition as a nested-loop join (O(|P|·|I|) comparisons); after this
  * rewrite the condition carries an equi-conjunct
  * `floor(x / w) = __bucket` that `ExtractEquiJoinKeys` turns into a
  * hash/sort-merge join, with the original predicate left in place as the
  * residual filter. Results are identical: every qualifying (point,
  * interval) pair shares the point's bucket, which the exploded interval
  * covers; non-qualifying bucket collisions fail the residual.
  *
  * Opt-in by config: set `graft.rangeJoin.bucketWidth` (the operator's
  * width guidance applies — near the median interval length). OPTING IN
  * ASSERTS the interval-length contract: every `[lo, hi)` spans a bounded
  * number of buckets at the chosen width. An open-ended sentinel bound
  * (hi = 1e308) would explode into ~1e305 bucket rows — exactly like
  * passing it to the explicit operator — so sessions with such intervals
  * must leave the conf unset for those queries (it is scoped per
  * query/session like any conf). The rule is a no-op when unset or
  * unparsable (logged, never failing unrelated queries). Fixpoint-safe:
  * the rewritten condition is a 3-conjunct AND, which no longer matches
  * the 2-conjunct pattern.
  *
  * Register via `GraftExtensions` (`spark.sql.extensions`) or
  * `spark.experimental.extraOptimizations`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {
  val widthKey = "graft.rangeJoin.bucketWidth"

  import org.apache.spark.sql.types.{DoubleType, LongType}

  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] =
    if (e.references.nonEmpty && e.references.subsetOf(l.outputSet)) Some(true)
    else if (e.references.nonEmpty && e.references.subsetOf(r.outputSet)) Some(false)
    else None

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(widthKey, "")
    // a malformed/non-positive width must not fail UNRELATED queries on
    // the session: warn and no-op instead of throwing inside the optimizer
    val parsed = scala.util.Try(w.toDouble).toOption.filter(_ > 0)
    if (w.nonEmpty && parsed.isEmpty)
      logWarning(s"$widthKey='$w' is not a positive double; range-join rewrite disabled")
    if (parsed.isEmpty) plan
    else {
      val width = parsed.get
      plan.transformUp {
        case j @ Join(left, right, Inner,
            Some(And(GreaterThanOrEqual(x1, lo), LessThan(x2, hi))), _)
            if x1.semanticEquals(x2) &&
              Seq(x1, lo, hi).forall(e => e.dataType == DoubleType && e.deterministic) =>
          (sideOf(x1, left, right), sideOf(lo, left, right), sideOf(hi, left, right)) match {
            case (Some(true), Some(false), Some(false)) =>
              rewrite(left, right, x1, lo, hi, width, j, swapped = false)
            case (Some(false), Some(true), Some(true)) =>
              rewrite(right, left, x1, lo, hi, width, j, swapped = true)
            case _ => j
          }
      }
    }
  }

  private def rewrite(points: LogicalPlan, intervals: LogicalPlan,
      x: Expression, lo: Expression, hi: Expression, width: Double,
      orig: Join, swapped: Boolean): LogicalPlan = {
    val wLit = Literal(width, DoubleType)
    // side-scoped hints must follow their relation when sides swap
    val hint = if (swapped) JoinHint(orig.hint.rightHint, orig.hint.leftHint)
               else orig.hint
    val bucket = AttributeReference("__bucket", LongType, nullable = false)()
    // timeZoneId must be set by hand: Sequence is TimeZoneAwareExpression
    // and the analyzer's ResolveTimeZone already ran before the optimizer
    val gen = Generate(
      Explode(Sequence(Floor(Divide(lo, wLit)), Floor(Divide(hi, wLit)),
        None, Some(conf.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bucket), child = intervals)
    val newCond = And(EqualTo(Floor(Divide(x, wLit)), bucket), orig.condition.get)
    // Project restores the original column ORDER (side swap and the extra
    // __bucket attribute must stay invisible to parents)
    Project(orig.output, Join(points, gen, Inner, Some(newCond), hint))
  }
}
