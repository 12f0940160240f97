package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Core.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The catalog aggregates every operator family from SURVEY.md §2B:
  *  - ops.Relational — joins (inner/outer/semi/anti/theta/as-of),
  *    aggregation (hash, distinct, rollup/cube), windows, top-k, set ops
  *  - ops.Functions — string/date/math/array/JSON scalar functions,
  *    event-time bucketing, sessionization
  *  - ops.Dedup — exact, MinHash+LSH, n-gram Jaccard, SimHash
  *  - ops.Similarity — vector stats, brute-force & LSH-bucketed ANN
  *  - ops.TextOps — language-ID heuristic, quality scoring, token
  *    counting, document fingerprinting
  *  - ops.Training — BPE pair stats, sequence chunk+pack, shard shuffle
  *  - ops.Multimodal — opaque binary payload plumbing + decode stub
  *  - etl.Pipeline — the reference's faithful 4-stage chunk pipeline
  *    (prepare/validate/transform/finalize, unified_code.py:246–293)
  */
object SparkEntry {

  private[graft] lazy val catalog: Map[String, Q] =
    ops.Relational.catalog ++
      ops.Functions.catalog ++
      ops.Dedup.catalog ++
      ops.Corpus.catalog ++
      ops.Hygiene.catalog ++
      ops.Training.catalog ++
      ops.Similarity.catalog ++
      ops.Selection.catalog ++
      ops.Subquery.catalog ++
      ops.Skew.catalog ++
      ops.Formats.catalog ++
      ops.TextOps.catalog ++
      ops.Multimodal.catalog ++
      etl.Pipeline.catalog

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped pricing summary: scan → filter → project → partial
    * agg → final agg → sort, all within whole-stage codegen. */
  def entry(spark: SparkSession): DataFrame =
    catalog("q01_pricing_summary").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
