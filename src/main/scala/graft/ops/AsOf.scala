package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reusable as-of join operator (SURVEY.md §2B "as-of join") — Spark
  * 4.1's Scala API has no native asof, so this composes a range join
  * with a per-left-row top-1 window, the plan shape validated against
  * a DuckDB oracle by q09_asof_join_event_order.
  *
  * Scale: the range join shuffles both sides once on the equi keys;
  * the window partitions by the left row id (unique), so per-task
  * window state is a handful of rows. Skewed match fan-out (one user
  * with millions of orders) is bounded by AQE skew-join splitting on
  * the shuffle; for pathological cases pre-filter the right side to a
  * time horizon.
  */
object AsOf {

  /** For each left row, attach the single right row with the greatest
    * `rightTime <= leftTime` among rows sharing `on` keys (backward
    * as-of, left-outer semantics: unmatched left rows keep nulls).
    *
    * @param leftId    a unique left-row key (window partition)
    * @param tieBreak  deterministic tie-break among equal rightTime
    */
  def joinAsOf(left: DataFrame, right: DataFrame, on: Seq[(String, String)],
      leftId: String, leftTime: String, rightTime: String,
      tieBreak: String): DataFrame = {
    val cond = on.map { case (l, r) => left(l) === right(r) }
      .reduce(_ && _) && right(rightTime) <= left(leftTime)
    val w = Window.partitionBy(col(leftId))
      .orderBy(col(rightTime).desc_nulls_last, col(tieBreak).desc_nulls_last)
    left.join(right, cond, "left")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
