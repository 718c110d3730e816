package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{CosineSimilarity, DotProduct, L2Norm}

/** Optimizer rewrite: the textbook cosine formulation
  * `dot(a, b) / (norm(a) * norm(b))` fuses into the one-pass
  * [[CosineSimilarity]] expression — three array traversals (plus two
  * more under common-subexpression misses) become one.
  *
  * Safe by construction: CosineSimilarity's numeric contract is defined
  * as EXACTLY this composition (same left-fold order, full-array norms
  * under length mismatch, same null/NaN propagation, double division is
  * identical under ANSI and legacy eval modes), so the rewrite is
  * bit-for-bit — the oracle hashes cannot tell the difference.
  *
  * This is the engine's `Rule[LogicalPlan]` extension-surface entry
  * (SURVEY.md §4.1): the reference has no optimizer at all (a query is a
  * hand-written closure); here user-written formulas get repaired into
  * the fused primitive by the planner.
  */
object FuseCosineRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(DotProduct(a, b), Multiply(L2Norm(x), L2Norm(y), _), _)
        if (a.semanticEquals(x) && b.semanticEquals(y)) ||
          (a.semanticEquals(y) && b.semanticEquals(x)) =>
      CosineSimilarity(a, b)
  }
}
