package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: prefix every thresholded levenshtein FILTER predicate
  * with its O(1) length lower bound —
  *
  *   levenshtein(a, b) <= k   ⇒   abs(length(a) - length(b)) <= k
  *                                  AND levenshtein(a, b) <= k
  *
  * sound because edit distance can never be smaller than the length
  * difference. The guard is a codegen'd constant-time compare, and
  * `And` short-circuits in both interpreted and generated code, so the
  * O(|a|·|b|) DP kernel runs only on length-plausible pairs — in a fuzzy
  * join at scale the guard prunes the overwhelming majority of the
  * candidate pairs before the quadratic work (the same reason real fuzzy
  * matchers length-block first).
  *
  * Scoped to Filter conditions only: under null inputs the guarded form
  * evaluates `And(null, null) = null` (unchanged), but in a PROJECTION a
  * false guard would turn a null into false — so projections are left
  * alone. A TreeNodeTag marks rewritten nodes; re-running the rule (the
  * optimizer iterates to fixpoint) finds the tag and stops. If an
  * expression copy ever drops the tag, the worst case is a duplicated
  * guard — redundant, never wrong.
  *
  * The engine's Catalyst escalation rung (c): a Rule[LogicalPlan]
  * installed either via `spark.experimental.extraOptimizations` on a
  * live session or `spark.sql.extensions=graft.functions.GraftExtensions`
  * at build time.
  */
object LevenshteinPruning extends Rule[LogicalPlan] {

  private val guarded = TreeNodeTag[Boolean]("graft.levenshtein.guarded")

  /** `abs(length(a) − length(b)) ≤/< bound` — the edit-distance lower
    * bound in the same strictness as the original comparison. */
  private def lengthGuard(lev: Levenshtein, bound: Expression,
      strict: Boolean): Expression = {
    val diff = Abs(Subtract(Length(lev.left), Length(lev.right)))
    if (strict) LessThan(diff, bound) else LessThanOrEqual(diff, bound)
  }

  private def guardOnce(lev: Levenshtein, k: Expression, strict: Boolean,
      cmp: Expression): Option[Expression] =
    if (lev.getTagValue(guarded).isDefined) None
    else {
      lev.setTagValue(guarded, true)
      Some(And(lengthGuard(lev, k, strict), cmp))
    }

  /** All four orientations of a thresholded comparison: lev ≤ k, lev < k,
    * k ≥ lev, k > lev.
    *
    * Restricted to the 2-arg `levenshtein(a, b)` form
    * (`lev.threshold.isEmpty`): the 3-arg `levenshtein(a, b, t)` returns −1
    * when the distance exceeds t, so `levenshtein(a, b, t) <= k` is TRUE for
    * over-threshold rows while the length guard would be false when the
    * length gap exceeds k — injecting the guard there would silently drop
    * rows the predicate keeps. */
  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case cmp @ LessThanOrEqual(lev: Levenshtein, k @ Literal(_, IntegerType))
        if lev.threshold.isEmpty =>
      guardOnce(lev, k, strict = false, cmp).getOrElse(cmp)
    case cmp @ LessThan(lev: Levenshtein, k @ Literal(_, IntegerType))
        if lev.threshold.isEmpty =>
      guardOnce(lev, k, strict = true, cmp).getOrElse(cmp)
    case cmp @ GreaterThanOrEqual(k @ Literal(_, IntegerType), lev: Levenshtein)
        if lev.threshold.isEmpty =>
      guardOnce(lev, k, strict = false, cmp).getOrElse(cmp)
    case cmp @ GreaterThan(k @ Literal(_, IntegerType), lev: Levenshtein)
        if lev.threshold.isEmpty =>
      guardOnce(lev, k, strict = true, cmp).getOrElse(cmp)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val next = rewrite(cond)
      if (next.fastEquals(cond)) f else Filter(next, child)
  }
}
