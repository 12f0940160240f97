package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
