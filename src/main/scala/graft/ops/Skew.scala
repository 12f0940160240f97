package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Core._

/** Skew-resistant equi-join via key salting (SURVEY.md §2B
  * "partitioning & shuffle": salting for skew).
  *
  * AQE's skew-join handles most runtime skew by splitting oversized
  * shuffle partitions, but it cannot split a SINGLE hot key — all rows
  * of one key still hash to one task. Salting can: the build side is
  * replicated `nSalts`× (each copy tagged with one salt value) and the
  * probe side scatters each row to a pseudo-random salt, so one hot
  * key fans out across `nSalts` tasks. Cost: build-side shuffle volume
  * × nSalts — use only for genuinely hot keys, typically after AQE
  * metrics identify them.
  */
object Skew {

  /** Equi-join `probe ⋈ build` on `probeKey == buildKey`, resilient to
    * a hot probe-side key. Semantics identical to
    * `probe.join(build, probe(probeKey) === build(buildKey), joinType)`
    * for joinType inner/left. */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0)
    // probe rows scatter across salts; derived from row content via a
    // non-key column hash when available, else a per-partition counter —
    // any distribution works, it only spreads load
    val salted = probe.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(nSalts)))
    val replicated = build
      .withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
    val joined = salted.join(replicated,
      salted(probeKey) === replicated(buildKey) && salted("__salt") === replicated("__salt"),
      joinType)
    joined.drop("__salt")
  }

  /** Catalog entry proving the salted join is semantics-preserving: the
    * oracle is the PLAIN join + aggregate, so the hash gate fails if
    * salting ever drops, duplicates, or misroutes a row. Here the probe
    * is the big fact (lineitem) and the replicated build side is a
    * 2-column projection of orders — at scale, keep the replicated side
    * the narrow/smaller one, since its shuffle volume scales by
    * nSalts. */
  val catalog: Map[String, Q] = Map(
    "q98_salted_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val li = table(s, dir, "lineitem")
        val ord = table(s, dir, "orders").select($"o_orderkey", $"o_orderpriority")
        saltedJoin(li, ord, "l_orderkey", "o_orderkey", nSalts = 8)
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            moneySum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
          .orderBy($"o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority, count(*) AS n_items,
          ${oSum("l_extendedprice*(1-l_discount)")} AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""))
  )
}
