package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftFunctions

/** SparkSessionExtensions entry point: makes every graft function available
  * to pure-SQL users on any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), without touching the Column
  * API. No resolution rules or planner strategies are injected — Catalyst
  * built-ins cover every operator in SURVEY.md §2.2 (the custom-Catalyst
  * audit in SURVEY.md §7), so the extension surface is functions only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.Expressions", name),
        builder))
    }
}
