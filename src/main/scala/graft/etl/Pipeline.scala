package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Core._

/** Faithful re-expression of the reference's 4-stage chunk pipeline
  * (waldfalke/catme-etl, /root/reference/unified_code.py:246–293):
  *
  *   prepare   (unified_code.py:246–255) — mark `prepared = true`
  *   validate  (unified_code.py:257–269) — require `prepared`; inject
  *             `id = NULL` when the column is absent (:267–268)
  *   transform (unified_code.py:271–280) — mark `transformed = true`
  *   finalize  (unified_code.py:282–293) — require `prepared ∧
  *             transformed`; mark `finalized = true`
  *
  * The reference runs these as 4 separate full passes over a per-chunk
  * List[dict] (unified_code.py:316–332). Here each stage is a narrow
  * `df.transform`; Catalyst fuses the whole chain into one generated
  * stage — a single traversal regardless of how many stages compose,
  * which is exactly the property the reference's design lacks
  * (SURVEY.md §4.3(1)).
  *
  * The stage-contract checks (validate/finalize raising on missing
  * markers, unified_code.py:265–266, 290–291) are compile-time-ish here:
  * a missing marker column makes the plan fail analysis — checked in
  * PipelineSpec.
  */
object Pipeline {

  def prepare(df: DataFrame): DataFrame =
    df.withColumn("prepared", lit(true))

  /** Injects `id = NULL` iff absent — the reference's only
    * schema-shaping operation (unified_code.py:267–268). */
  def validate(df: DataFrame): DataFrame = {
    require(df.columns.contains("prepared"), "records must be prepared first")
    if (df.columns.contains("id")) df
    else df.withColumn("id", lit(null).cast("bigint"))
  }

  def transform(df: DataFrame): DataFrame = {
    require(df.columns.contains("prepared"), "records must be prepared first")
    df.withColumn("transformed", lit(true))
  }

  def finalizeStage(df: DataFrame): DataFrame = {
    require(df.columns.contains("prepared") && df.columns.contains("transformed"),
      "records must be prepared and transformed first")
    df.withColumn("finalized", lit(true))
  }

  /** The full chain, as `process_chunk_function` composes it
    * (unified_code.py:296–334). */
  def run(df: DataFrame): DataFrame =
    df.transform(prepare).transform(validate).transform(transform).transform(finalizeStage)

  /** Reference test-mode analog: first 3 chunks of 500 rows
    * (unified_code.py:441–442, chunk size default :397). */
  def testMode(df: DataFrame, chunkSize: Int = 500, chunks: Int = 3): DataFrame =
    df.limit(chunkSize * chunks)

  val catalog: Map[String, Q] = Map(

    // ---- the faithful ETL chain over a driver table: markers + id
    // default, one fused narrow stage ----
    "q60_etl_pipeline" -> Q(
      (s, dir) => {
        import s.implicits._
        run(table(s, dir, "orders").select($"o_orderkey", $"o_orderstatus"))
          .select($"o_orderkey", $"o_orderstatus", $"prepared", $"id",
            $"transformed", $"finalized")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus,
        true AS prepared, cast(NULL as bigint) AS id,
        true AS transformed, true AS finalized
        FROM orders ORDER BY o_orderkey"""))
  )
}
