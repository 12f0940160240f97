package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable as-of join operator (SURVEY.md §2B "as-of join") — Spark
  * 4.1's Scala API has no native asof, so this composes a range join
  * with a per-left-row argmax, the semantics validated against a
  * DuckDB oracle by q09_asof_join_event_order.
  *
  * Scale: the range join shuffles both sides once on the equi keys.
  * The per-left-row "latest right row" pick is a partial-aggregated
  * `max_by` — each map task reduces its matches to one row per left
  * id before the shuffle, so the aggregation moves O(left rows), not
  * O(matched pairs), and nothing is sorted. (Round 1 used a window
  * partitioned by the left id, which shuffled AND sorted every matched
  * pair.) Skewed match fan-out (one user with millions of orders) is
  * partial-aggregated away map-side for the pick itself; the join
  * stays AQE-skew-splittable; for pathological cases pre-filter the
  * right side to a time horizon.
  */
object AsOf {

  /** For each left row, attach the single right row with the greatest
    * `rightTime <= leftTime` among rows sharing `on` keys (backward
    * as-of, left-outer semantics: unmatched left rows keep nulls).
    *
    * @param leftId    a unique left-row key (aggregation key)
    * @param tieBreak  deterministic tie-break among equal rightTime
    */
  def joinAsOf(left: DataFrame, right: DataFrame, on: Seq[(String, String)],
      leftId: String, leftTime: String, rightTime: String,
      tieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightCols = right.columns.toSeq
    // the post-join aggregation references columns by bare name, so the
    // two sides must not share any — rename (or pre-prune) before calling
    val shared = leftCols.toSet.intersect(rightCols.toSet)
    require(shared.isEmpty,
      s"joinAsOf: left and right must have disjoint column names, both have: ${shared.mkString(", ")}")
    val cond = on.map { case (l, r) => left(l) === right(r) }
      .reduce(_ && _) && right(rightTime) <= left(leftTime)
    // argmax over (rightTime, tieBreak): matched rows always have a
    // non-null ordering struct; an unmatched left-outer row carries
    // struct(null, null), which struct comparison orders below every
    // real match — so nulls survive exactly when nothing matched
    val aggs =
      leftCols.filterNot(_ == leftId).map(c => first(col(c)).as(c)) :+
        max_by(struct(rightCols.map(col): _*),
          struct(col(rightTime), col(tieBreak))).as("__best")
    left.join(right, cond, "left")
      .groupBy(col(leftId))
      .agg(aggs.head, aggs.tail: _*)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"__best.`$c`").as(c)): _*)
  }
}
