package graft.optimizer

import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.expressions.{CosineSim, DotProduct}

/** Optimizer rule: fuse the cosine-similarity idiom
  * `graft_dot(a,b) / (sqrt(graft_dot(a,a)) * sqrt(graft_dot(b,b)))`
  * into the single-pass [[CosineSim]] expression (3 array traversals ->
  * 1). Matching is semantic (`semanticEquals`), so aliased/commuted
  * children still fuse. Injected by GraftExtensions.
  */
object FuseCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(
            dot @ DotProduct(a, b),
            Multiply(Sqrt(DotProduct(a1, a2)), Sqrt(DotProduct(b1, b2)), _), _)
          if a.semanticEquals(a1) && a.semanticEquals(a2) &&
             b.semanticEquals(b1) && b.semanticEquals(b2) =>
        CosineSim(a, b)
    }
}
