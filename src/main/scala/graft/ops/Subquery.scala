package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Core._

/** Correlated-subquery surface (SURVEY.md §4.1: Catalyst supplies
  * "subquery handling" for free once the query is declarative).
  *
  * The reference (waldfalke/catme-etl) has no query language at all, so
  * this family exists purely on the §2B engine side. The queries are
  * written as Spark SQL over temp views because the subquery forms have
  * no 1:1 Dataset-API spelling — and that is the point: Catalyst's
  * `RewritePredicateSubquery` decorrelates EXISTS / NOT EXISTS into
  * left-semi / left-anti joins on the correlation key (with any
  * non-equi inner predicate carried as an extra join condition), and
  * correlated scalar aggregates decorrelate into a grouped aggregate
  * plus an equi-join. After the rewrite these ARE the q05/q06-style
  * join plans, so everything said there about broadcast/shuffle at
  * 100 TB carries over unchanged — there is never a per-outer-row
  * subquery execution (the classic RDBMS nested-loop trap).
  *
  * Scale note on NOT IN vs NOT EXISTS: `x NOT IN (subquery)` has
  * three-valued NULL semantics, so Spark can only plan it as a
  * null-aware anti join — supported solely as a BROADCAST hash join
  * (or a nested-loop fallback) because null-awareness cannot be
  * partitioned. With a subquery side that grows with the corpus that
  * plan dies at scale; q93 deliberately uses NOT EXISTS, which is
  * null-safe by construction and plans as a shuffled left-anti join.
  */
object Subquery {

  private def view(s: SparkSession, dir: String, name: String, as: String): Unit =
    table(s, dir, name).createOrReplaceTempView(as)

  val catalog: Map[String, Q] = Map(

    // ---- correlated EXISTS with a non-equi inner predicate: customers
    // in good standing holding at least one order worth more than 60x
    // their account balance. Decorrelates into one left-semi shuffle on
    // o_custkey = c_custkey; the price inequality rides along as the
    // join's residual condition. ----
    "q92_exists_subquery" -> Q(
      (s, dir) => {
        view(s, dir, "customer", "cust_q92")
        view(s, dir, "orders", "ord_q92")
        s.sql("""SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
          FROM cust_q92 c
          WHERE c_acctbal > 0
            AND EXISTS (SELECT 1 FROM ord_q92 o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 60 * c.c_acctbal)
          ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        FROM customer c
        WHERE c_acctbal > 0
          AND EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 60 * c.c_acctbal)
        ORDER BY c_custkey""")),

    // ---- correlated NOT EXISTS: parts that never shipped in bulk
    // (no lineitem with quantity >= 45). Plans as a shuffled left-anti
    // join — the null-safe, partitionable spelling of "not in". ----
    "q93_not_exists_anti" -> Q(
      (s, dir) => {
        view(s, dir, "part", "part_q93")
        view(s, dir, "lineitem", "li_q93")
        s.sql("""SELECT p_partkey, p_brand, p_type
          FROM part_q93 p
          WHERE NOT EXISTS (SELECT 1 FROM li_q93 l
                            WHERE l.l_partkey = p.p_partkey
                              AND l.l_quantity >= 45)
          ORDER BY p_partkey""")
      },
      Some("""SELECT p_partkey, p_brand, p_type
        FROM part p
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_partkey = p.p_partkey
                            AND l.l_quantity >= 45)
        ORDER BY p_partkey""")),

    // ---- correlated scalar-aggregate subquery (TPC-H Q17 shape, per
    // brand): lineitems below 20% of their part's average quantity.
    // Catalyst decorrelates the scalar avg into a groupBy(l_partkey)
    // aggregate joined back on the part key — one extra aggregation
    // pass over lineitem, not one subquery per row. The correlated
    // average is over integer-valued quantities, so its double sum is
    // exact regardless of partial-agg order and the 0.2x threshold
    // compares identically in both engines. ----
    "q94_scalar_subquery" -> Q(
      (s, dir) => {
        view(s, dir, "lineitem", "li_q94")
        view(s, dir, "part", "part_q94")
        s.sql(s"""SELECT p.p_brand, count(*) AS n_small,
            ${oSum("l.l_extendedprice")} AS sum_price
          FROM li_q94 l JOIN part_q94 p ON p.p_partkey = l.l_partkey
          WHERE l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                                FROM li_q94 l2
                                WHERE l2.l_partkey = p.p_partkey)
          GROUP BY p.p_brand ORDER BY p.p_brand""")
      },
      Some(s"""SELECT p.p_brand, count(*) AS n_small,
          ${oSum("l.l_extendedprice")} AS sum_price
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                              FROM lineitem l2
                              WHERE l2.l_partkey = p.p_partkey)
        GROUP BY p.p_brand ORDER BY p.p_brand"""))
  )
}
