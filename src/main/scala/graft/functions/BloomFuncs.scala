package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** User-facing SQL surface over Spark's own runtime-filter Bloom sketch
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind `spark.sql.optimizer.runtime.bloomFilter.*`, which Catalyst
  * normally injects only on its own initiative for shuffle-join
  * pruning). Exposing them as callable functions makes the sketch a
  * first-class pipeline operator: build a compact membership index over
  * a corpus-side key ONCE, ship it as a scalar (the aggregate's binary
  * result), and pre-screen an incoming side with zero false negatives —
  * the exact-anti-join prefilter an incremental-dedup stage wants
  * (q81). Contract mirrors the runtime-filter usage: the key must be a
  * 64-bit hash (`xxhash64(col)`), and `bloom_contains`'s first argument
  * must fold to a scalar (literal or scalar subquery), because the
  * filter is broadcast into the probe side's generated code.
  */
object BloomFuncs {

  private def agg(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(c)    => new BloomFilterAggregate(c)
    case Seq(c, n) => new BloomFilterAggregate(c, n)
    case other => throw new IllegalArgumentException(
      s"bloom_agg(keyHash[, estItems]): got ${other.size} args")
  }

  private def contains(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(b, v) => BloomFilterMightContain(b, v)
    case other => throw new IllegalArgumentException(
      s"bloom_contains(bloom, keyHash): got ${other.size} args")
  }

  /** SQL registration: SELECT bloom_contains((SELECT bloom_agg(
    * xxhash64(k)) FROM t), xxhash64(k)) ... */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg", agg, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_contains", contains, "built-in")
  }
}
