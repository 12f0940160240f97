package graft.ops

import org.apache.spark.sql.functions._
import graft.Core._

/** Columnar-format interop beyond parquet — the "format dispatch"
  * axis of the reference (unified_code.py:303–341 dispatches on file
  * extension) extended to the second columnar format Spark ships
  * natively. No external jar exists offline for Excel/Avro (SURVEY
  * §7.5); ORC is built in, so its read+write path is exercised
  * end-to-end and oracle-checked.
  *
  * Scale: ORC, like parquet, is a splittable columnar format — the
  * round-trip below is a narrow column-pruned scan, a partitioned
  * columnar write, and a second pruned scan feeding a partial-agg
  * groupBy. Nothing here is driver-side; at 100 TB the write
  * parallelism is the input partitioning and the re-read prunes to
  * the four projected columns (ORC carries the same column stats /
  * predicate-pushdown machinery as parquet).
  */
object Formats {

  val catalog: Map[String, Q] = Map(

    // ---- ORC round-trip parity: project lineitem to four columns,
    // write ORC, read it back, aggregate. The oracle aggregates the
    // original parquet directly, so a hash match proves the ORC
    // write+read path preserves values (decimal money discipline
    // included) — the same differential-testing trick EtlSpec uses
    // for CSV/JSON. ----
    "q85_orc_roundtrip" -> Q(
      (s, dir) => {
        import s.implicits._
        // deterministic per-input-dir scratch path, atomic overwrite —
        // re-runs (Verify then Bench in one session) are idempotent
        val tmp = s"${sys.props("java.io.tmpdir")}/graft_orc_${math.abs(dir.hashCode).toString}"
        table(s, dir, "lineitem")
          .select($"l_returnflag", $"l_linestatus", $"l_quantity", $"l_extendedprice")
          .write.mode("overwrite").orc(tmp)
        s.read.orc(tmp)
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            count(lit(1)).as("n"),
            moneySum($"l_quantity").as("sum_qty"),
            moneySum($"l_extendedprice").as("sum_price"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
        ${oSum("l_quantity")} AS sum_qty,
        ${oSum("l_extendedprice")} AS sum_price
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- Excel round-trip parity: write the nation dimension as a
    // real .xlsx workbook (the driver-side small-result writer — a
    // dimension table is exactly its intended payload), read it back
    // through the DSv2 xlsx source, cast the string cells to their
    // types, and hash-match the original parquet row for row. This
    // puts the reference's R3 Excel path under the SAME differential
    // gate as every relational operator — the reader is checked
    // against DuckDB, not just against its own writer's expectations.
    // Scale: the workbook format is row-capped by spec; the engine-
    // side story is the (file × sheet)-parallel READ path, exercised
    // here end-to-end. ----
    "q91_xlsx_roundtrip" -> Q(
      (s, dir) => {
        import s.implicits._
        val tmp = s"${sys.props("java.io.tmpdir")}/graft_xlsx_${math.abs(dir.hashCode).toString}/nation.xlsx"
        graft.sources.Xlsx.write(table(s, dir, "nation"), tmp, sheet = "nation")
        s.read.format("xlsx").load(tmp)
          .select(
            $"n_nationkey".cast("int").as("n_nationkey"),
            $"n_name",
            $"n_regionkey".cast("int").as("n_regionkey"),
            $"sheet_name")
          .orderBy($"n_nationkey")
      },
      Some("""SELECT n_nationkey, n_name, n_regionkey, 'nation' AS sheet_name
        FROM nation ORDER BY n_nationkey"""))
  )
}
