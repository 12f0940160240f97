package graft.functions

import org.apache.spark.sql.catalyst.expressions.ArrayDistinct
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom optimizer rule (SURVEY.md §7.6 / guide "custom operator"
  * preference ladder): semantic knowledge about our own expressions
  * that Catalyst cannot infer — `WordShingles` output is distinct by
  * construction, so a wrapping `array_distinct` is a no-op costing a
  * full hash-dedup per row. The rule deletes it.
  *
  * Injected via `GraftExtensions` (`injectOptimizerRule`), so any
  * session configured with the extension — including plain SQL users
  * composing `array_distinct(word_shingles(...))` defensively — gets
  * the rewrite for free. A tiny rule, but the full extension shape:
  * pattern-match the plan, rewrite expressions, preserve semantics.
  */
object EliminateRedundantDistinct extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayDistinct(ws: WordShingles) => ws
    }
}
