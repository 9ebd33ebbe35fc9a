package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule for absolute-threshold edit-distance predicates — the
  * d19 lesson promoted from a hand-tuned query into engine
  * infrastructure. A filter of the shape
  *
  *   levenshtein(a, b) <= k        (k a non-negative integer literal;
  *                                  also <, and the mirrored k >= / >)
  *
  * costs O(|a|·|b|) per row even when a free O(1) test would reject the
  * pair: |length(a) − length(b)| is a lower bound on edit distance. The
  * rule rewrites the predicate to
  *
  *   abs(length(a) - length(b)) <= k AND levenshtein(a, b, k) >= 0
  *
  * so (1) the length band short-circuits the DP entirely on pairs that
  * cannot match, and (2) the surviving pairs run Spark's THRESHOLD form
  * of the distance, a banded O(k·min(len)) DP that bails out early
  * instead of filling the full matrix (it returns −1 when the distance
  * exceeds k, so `>= 0` is exactly `distance <= k`).
  *
  * Soundness: for non-null inputs the rewrite is the same predicate
  * (band is implied by distance ≤ k); for null inputs both the original
  * and the guard evaluate to null, so the Filter drops the row either
  * way. Idempotence under the optimizer's fixed-point driver: a guarded
  * conjunct already contains the threshold form, which the matcher
  * (threshold = None) no longer matches.
  *
  * The rewrite duplicates `a` and `b` (once in the length band, once in
  * the threshold DP), so it only fires when both are deterministic —
  * Catalyst's standard guard before expression duplication. A
  * non-deterministic argument (e.g. a nondeterministic UDF) would
  * otherwise be evaluated twice with different values, silently changing
  * filter semantics.
  */
object LevenshteinGuard extends Rule[LogicalPlan] {

  private def bound(k: Expression, strict: Boolean): Option[Int] =
    k match {
      case Literal(v: Int, IntegerType) =>
        val b = if (strict) v - 1 else v
        if (b >= 0) Some(b) else None
      case _ => None
    }

  private def guarded(a: Expression, b: Expression, k: Int): Expression = {
    val kLit = Literal(k)
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), kLit),
      GreaterThanOrEqual(Levenshtein(a, b, Some(kLit)), Literal(0)))
  }

  private def safeArgs(a: Expression, b: Expression): Boolean =
    a.deterministic && b.deterministic

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val rewritten = cond transformUp {
        case LessThanOrEqual(lev @ Levenshtein(a, b, None), k)
            if safeArgs(a, b) && bound(k, strict = false).isDefined =>
          guarded(a, b, bound(k, strict = false).get)
        case LessThan(lev @ Levenshtein(a, b, None), k)
            if safeArgs(a, b) && bound(k, strict = true).isDefined =>
          guarded(a, b, bound(k, strict = true).get)
        case GreaterThanOrEqual(k, lev @ Levenshtein(a, b, None))
            if safeArgs(a, b) && bound(k, strict = false).isDefined =>
          guarded(a, b, bound(k, strict = false).get)
        case GreaterThan(k, lev @ Levenshtein(a, b, None))
            if safeArgs(a, b) && bound(k, strict = true).isDefined =>
          guarded(a, b, bound(k, strict = true).get)
      }
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
  }
}
