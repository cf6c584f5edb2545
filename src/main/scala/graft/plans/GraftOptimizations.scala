package graft.plans

import org.apache.spark.sql.catalyst.expressions.Lower
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.NormalizeText

/** Optimizer rule over the graft function algebra — the `Rule[LogicalPlan]`
  * tier of the extension surface (functions and the TopKPerKey strategy are
  * the other two; see [[graft.GraftExtensions]]).
  *
  * Rewrites exploit what Catalyst cannot know about our kernels:
  * `TextAlgos.normalize` is idempotent (its output alphabet is single-spaced
  * trimmed `[a-z0-9 ]`, a fixed point of itself), and `lower` is the identity
  * on that alphabet. Composed pipelines hit both shapes naturally — a
  * dedup stage normalizing input a cleaning stage already normalized, or a
  * user defensively lower-casing before handing text to a graft operator —
  * and each rewrite deletes a full per-row string pass at 100 TB.
  *
  * Both rewrites preserve nullability (NormalizeText is null-intolerant,
  * so the outer and inner nodes agree on null behavior).
  */
object GraftOptimizations extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // normalize_text(normalize_text(x)) => normalize_text(x)
    case NormalizeText(inner @ NormalizeText(_)) => inner
    // lower(normalize_text(x)) => normalize_text(x)
    case Lower(n @ NormalizeText(_)) => n
  }
}
