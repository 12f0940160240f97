package graft.ops

import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import graft.plans.TopKPerGroup

/** User-facing entry for the custom top-k-per-group operator (see
  * graft.plans.TopKPerGroup for the physical design). Column
  * references go in unresolved — the analyzer resolves them against
  * the child like any built-in operator; requires the TopKStrategy
  * planner strategy (installed by GraftExtensions). */
object TopK {

  /** @param orderCols (column, descending?) pairs — include a unique
    *                   tie-break column for deterministic results */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val plan = TopKPerGroup(
      groupCols.map(UnresolvedAttribute(_)),
      orderCols.map { case (c, desc) =>
        SortOrder(UnresolvedAttribute(c), if (desc) Descending else Ascending)
      },
      k,
      df.queryExecution.logical)
    GraftPlanBridge.ofRows(df.sparkSession, plan)
  }
}
