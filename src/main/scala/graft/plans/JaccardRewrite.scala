package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, ArrayUnion, Cast, Divide, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.JaccardExpr

/** Optimizer rule: rewrite the builtin set-Jaccard composition
  *
  * {{{
  * CAST(size(array_intersect(a, b)) AS DOUBLE) /
  * CAST(size(array_union(a, b)) AS DOUBLE)
  * }}}
  *
  * into the native one-pass [[graft.functions.JaccardExpr]] whenever
  * both occurrences reference the same `a`/`b` (semantic equality) and
  * the element type is bigint or string. The builtin form materializes
  * an intersect array AND a union array per row pair; the native
  * expression computes both cardinalities in a single hash-set pass —
  * on the near-dup verify join (the one place a 100 TB dedup run
  * evaluates Jaccard millions of times) this is the difference between
  * three array allocations per pair and zero.
  *
  * Value-preserving by construction (set semantics, null-element
  * handling, and 0/0 → NaN all match the ANSI-off builtin composition
  * — pinned by PlanRulesSpec), so user-written SQL gets the fast path
  * with no source change. This is the (c) tier of the operator
  * preference ladder: a `Rule[LogicalPlan]` registered through
  * `SparkSessionExtensions.injectOptimizerRule` ([[graft.GraftExtensions]])
  * and `spark.experimental.extraOptimizations` (GraftSession.tuned).
  */
object JaccardRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(
        Cast(Size(ArrayIntersect(a1, b1), _), DoubleType, _, _),
        Cast(Size(ArrayUnion(a2, b2), _), DoubleType, _, _), _)
        if JaccardExpr.supports(a1.dataType, b1.dataType) &&
          a1.semanticEquals(a2) && b1.semanticEquals(b2) =>
      JaccardExpr(a1, b1)
  }
}
