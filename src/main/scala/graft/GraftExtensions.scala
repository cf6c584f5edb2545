package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftFunctions

/** SparkSessionExtensions entry point: makes every graft function, the
  * TopKPerKey planner strategy and the graft-algebra optimizer rule
  * available on any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), without touching the Column
  * API. Catalyst built-ins cover every other operator in SURVEY.md §2.2
  * (the custom-Catalyst audit in SURVEY.md §7); the injected strategy
  * plans a node only our own API emits and the optimizer rule matches
  * only graft expressions, so neither perturbs ordinary plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.Expressions", name),
        builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    e.injectOptimizerRule(_ => graft.plans.GraftOptimizations)
  }
}
