package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-path data layout (SURVEY.md §2B layout): file compaction and
  * Z-order clustering — alongside bucketing/DPP/salting, the levers
  * that decide whether a 100 TB table scans in minutes or hours.
  *
  *  - Compaction fixes the small-files problem: a streaming sink or a
  *    100-way shuffle write leaves files far below the ~128 MB–1 GB
  *    sweet spot, and at 100 TB the scan's task-scheduling overhead
  *    (and the object-store LIST/GET cost) dominates. One
  *    `repartition(n)` sized from plan statistics restores the target
  *    file size.
  *  - Z-ordering interleaves the bits of several clustering keys into
  *    one sort key, so files (and parquet row groups) get NARROW
  *    min/max ranges on EVERY key — a predicate on any clustered
  *    column skips most row groups via the pushed-down parquet stats,
  *    not just predicates on the leading sort column.
  */
object Layout {

  /** Number of output files that hits `targetFileBytes` per file.
    *
    * Plan statistics estimate the IN-MEMORY size; parquet+snappy on
    * disk is smaller by roughly `compressionRatio` (measure per table
    * — 3 is a conservative default for mixed columns). At 100 TB the
    * honest version of this computes from the source table's actual
    * on-disk bytes (`HadoopFsRelation.sizeInBytes` is exactly that for
    * file sources, so plain scans need no ratio at all). */
  def compactionFileCount(df: DataFrame, targetFileBytes: Long,
      compressionRatio: Double = 3.0): Int = {
    require(targetFileBytes > 0)
    val memBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val diskBytes = (BigDecimal(memBytes) / compressionRatio).toBigInt
    (diskBytes / targetFileBytes).toInt.max(1).min(1 << 20)
  }

  /** Rewrite `df` as parquet at `path` in files of ~`targetFileBytes`.
    * The repartition is a round-robin shuffle — it balances skewed
    * input files, which a `coalesce` (no shuffle, but merges adjacent
    * partitions only) cannot. */
  def compactTo(df: DataFrame, path: String, targetFileBytes: Long,
      compressionRatio: Double = 3.0): Int = {
    val n = compactionFileCount(df, targetFileBytes, compressionRatio)
    df.repartition(n).write.mode("overwrite").parquet(path)
    n
  }

  /** Z-value: interleave the bits of the scaled clustering columns.
    * Each column is min/max-scaled to `bits` bits (rank-scaling is
    * more skew-robust but needs a global sort; min/max is one cheap
    * agg and right for roughly-uniform keys). Bit i of column j lands
    * at position i·nCols + j of the composite, so no column dominates
    * the high bits the way a lexicographic sort key's leading column
    * does. */
  private[ops] def zvalue(cols: Seq[Column], mins: Seq[Column],
      maxs: Seq[Column], bits: Int): Column = {
    val top = (1L << bits) - 1
    val scaled = cols.zip(mins.zip(maxs)).map { case (c, (mn, mx)) =>
      // (c-mn)/(mx-mn+1) ∈ [0,1) so the scaled code stays in [0, 2^bits)
      least(lit(top), greatest(lit(0L),
        floor((c.cast("double") - mn.cast("double"))
          / (mx.cast("double") - mn.cast("double") + 1d) * (1L << bits)).cast("long")))
    }
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      scaled.zipWithIndex.foldLeft(acc) { case (a, (sc, j)) =>
        a.bitwiseOR(shiftleft(shiftright(sc, i).bitwiseAND(lit(1L)), i * cols.size + j))
      }
    }
  }

  /** Write `df` as `nFiles` parquet files Z-ordered on `zCols`.
    *
    * Shape: ONE agg job for the per-column min/max (broadcast single
    * row), then one range-shuffle + in-partition sort on the z-value —
    * the same cost as any global sort write; no extra passes. The
    * z column is dropped before the write (projection after the sort
    * keeps row order — no exchange in between). */
  def zorderWrite(df: DataFrame, path: String, zCols: Seq[String],
      nFiles: Int, bits: Int = 12): Unit = {
    require(zCols.nonEmpty && nFiles > 0 && bits * zCols.size <= 62,
      s"bits($bits) × cols(${zCols.size}) must fit a long")
    val aggs = zCols.flatMap(c => Seq(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val z = zvalue(zCols.map(col),
      zCols.map(c => col(s"__mn_$c")), zCols.map(c => col(s"__mx_$c")), bits)
    df.crossJoin(broadcast(stats))
      .withColumn("__z", z)
      .select(df.columns.map(col) :+ col("__z"): _*)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
