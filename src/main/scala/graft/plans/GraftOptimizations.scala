package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import graft.functions.{CosineSimilarity, HammingDistance}

/** Engine-specific algebraic simplifications, injected into Catalyst's
  * optimizer (GraftExtensions.injectOptimizerRule, or
  * `spark.experimental.extraOptimizations` on a live session).
  *
  * - hamming_distance(x, x) → 0 — a self-join on fingerprints compares
  *   a row to itself on the diagonal; folding it lets Catalyst then
  *   eliminate `hamming(x,x) <= t` filters entirely.
  * - dot_product(x, x) appears inside normalization; left alone (it is
  *   the definition of the squared norm). cosine_similarity(x, x) is
  *   NOT folded to 1: the zero vector yields 0 by definition here.
  */
object SimplifyGraftExpressions extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case HammingDistance(a, b) if a.deterministic && a.semanticEquals(b) =>
        Literal(0, IntegerType)
    }
}
