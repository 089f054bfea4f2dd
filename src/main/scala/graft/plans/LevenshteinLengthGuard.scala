package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression,
  Length, LessThan, LessThanOrEqual, Levenshtein, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: prepend the free length-difference lower bound to
  * thresholded Levenshtein filters.
  *
  * Edit distance can never be below `|length(a) - length(b)|` (every
  * unmatched length unit costs at least one insert/delete), so a filter
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`.
  * The rewrite conjoins that O(1) guard IN FRONT of the O(len_a x len_b)
  * kernel; whole-stage codegen short-circuits conjuncts left to right, so
  * length-mismatched candidate pairs skip the quadratic distance entirely
  * — on a fuzzy-match join at 100 TB that is most pairs. Semantics are
  * unchanged by construction (the guard is implied by the original
  * predicate), which `GuardRuleSpec` proves by result equality with the
  * rule on and off.
  *
  * Scope: `levenshtein(a, b) <= k` and `< k` with an untyped-int literal
  * k and no native threshold argument (a 3-arg `levenshtein(a, b, k)`
  * already bounds its own work internally). Registered on every engine
  * session via `spark.experimental.extraOptimizations`
  * (`GraftSession.tune`) and on connector-style sessions via
  * `GraftExtensions.injectOptimizerRule`. The rule is idempotent: it
  * skips any filter that already contains a semantically equal guard, so
  * the fixed-point optimizer batch converges after one insertion.
  */
object LevenshteinLengthGuard extends Rule[LogicalPlan] {

  private def guard(a: Expression, b: Expression, k: Literal): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  // transformUp: an inserted And(guard, orig) is not itself revisited in
  // this pass, and the cond.find check stops the next fixpoint pass from
  // inserting the same guard twice
  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case orig @ LessThanOrEqual(Levenshtein(a, b, None), k: Literal)
        if k.dataType == IntegerType &&
          cond.find(_.semanticEquals(guard(a, b, k))).isEmpty =>
      And(guard(a, b, k), orig)
    case orig @ LessThan(Levenshtein(a, b, None), k: Literal)
        if k.dataType == IntegerType &&
          cond.find(_.semanticEquals(guard(a, b, k))).isEmpty =>
      // diff <= lev < k implies diff <= k: the non-strict guard is
      // valid for the strict filter too
      And(guard(a, b, k), orig)
  }

  // match Filter AND Join conditions: predicate pushdown routinely folds
  // the levenshtein filter into a join condition before this rule runs
  // (extraOptimizations / injected rules sit after the main batches)
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val newCond = rewrite(cond)
      if (newCond.fastEquals(cond)) f else f.copy(condition = newCond)
    case j @ Join(_, _, _, Some(cond), _) =>
      val newCond = rewrite(cond)
      if (newCond.fastEquals(cond)) j else j.copy(condition = Some(newCond))
  }
}
