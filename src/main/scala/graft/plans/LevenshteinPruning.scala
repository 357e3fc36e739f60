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

  /** Upper-bound orientations (lev ≤ k, lev < k, k ≥ lev, k > lev) are
    * restricted to the 2-arg `levenshtein(a, b)` form
    * (`lev.threshold.isEmpty`): the 3-arg `levenshtein(a, b, t)` returns −1
    * when the distance exceeds t, so `levenshtein(a, b, t) <= k` is TRUE for
    * over-threshold rows while the length guard would be false when the
    * length gap exceeds k — injecting the guard there would silently drop
    * rows the predicate keeps. (That −1 arm is why the superficially
    * plausible "guard `lev3 <= k` when k < t" rewrite is UNSOUND — the
    * kept set of `lev3 <= k` is {d ≤ k} ∪ {d > t}, and the second branch
    * has no length upper bound.)
    *
    * The 3-arg form IS guarded on every orientation that implies
    * "the distance is within the threshold" — there lev3 = d and d ≤ t,
    * so abs(Δlen) ≤ t is a sound O(1) prefilter:
    *   lev3 ≥ j (j ≥ 0), j ≤ lev3, lev3 > j (j ≥ −1), j < lev3 ⇒ abs ≤ t
    * and equality pins the distance exactly, in both arities:
    *   lev = c / lev3 = c (c ≥ 0) ⇒ abs(Δlen) ≤ c
    * (for lev3 = c the tighter c-bound is sound because the predicate
    * implies d = c; when c > t it is unsatisfiable and the guard is
    * vacuous, never wrong). `lev3 = −1` and negative bounds keep only
    * over-threshold pairs — no length bound exists; left alone. */
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
    // equality pins the distance: abs(Δlen) ≤ c, both arities
    case cmp @ EqualTo(lev: Levenshtein, c @ Literal(v: Int, IntegerType))
        if v >= 0 =>
      guardOnce(lev, c, strict = false, cmp).getOrElse(cmp)
    case cmp @ EqualTo(c @ Literal(v: Int, IntegerType), lev: Levenshtein)
        if v >= 0 =>
      guardOnce(lev, c, strict = false, cmp).getOrElse(cmp)
    // 3-arg within-threshold orientations: lev3 ≥ j / lev3 > j and
    // mirrors imply d ≤ t ⇒ abs(Δlen) ≤ t
    case cmp @ GreaterThanOrEqual(lev: Levenshtein, Literal(v: Int, IntegerType))
        if lev.threshold.isDefined && v >= 0 =>
      guardOnce(lev, lev.threshold.get, strict = false, cmp).getOrElse(cmp)
    case cmp @ LessThanOrEqual(Literal(v: Int, IntegerType), lev: Levenshtein)
        if lev.threshold.isDefined && v >= 0 =>
      guardOnce(lev, lev.threshold.get, strict = false, cmp).getOrElse(cmp)
    case cmp @ GreaterThan(lev: Levenshtein, Literal(v: Int, IntegerType))
        if lev.threshold.isDefined && v >= -1 =>
      guardOnce(lev, lev.threshold.get, strict = false, cmp).getOrElse(cmp)
    case cmp @ LessThan(Literal(v: Int, IntegerType), lev: Levenshtein)
        if lev.threshold.isDefined && v >= -1 =>
      guardOnce(lev, lev.threshold.get, strict = false, cmp).getOrElse(cmp)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val next = rewrite(cond)
      if (next.fastEquals(cond)) f else Filter(next, child)
  }
}
