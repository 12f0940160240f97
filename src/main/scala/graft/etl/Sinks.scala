package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Faithful sink surface for the reference's JSON outputs
  * (waldfalke/catme-etl R13–R15, R28;
  * /root/reference/unified_code.py:343–388,
  * Archive/unified_code.py:479–481, 583–601).
  *
  * - "chunks" mode (R13/R28): per-chunk files `chunk_i.json` →
  *   `df.write.json(dir)` part files. Partitioned output IS the
  *   native Spark shape; at 100 TB this is the only sane mode.
  * - "merge" mode (R14): one JSON file. The reference concatenates
  *   chunk files sorted lexicographically — permuting row order once
  *   there are ≥10 chunks (`sorted(glob)`, unified_code.py:357,
  *   SURVEY.md §4.3(2)). Here merge preserves input order by sorting
  *   on an explicit key, never on file names.
  * - minified vs pretty (R15, unified_code.py:365–388): JSON Lines is
  *   already the minified form (`separators=(',',':')` equivalent);
  *   `jsonArrayFile` writes the byte-parity single-array form with
  *   optional indent, non-ASCII passthrough (`ensure_ascii=False`,
  *   unified_code.py:350).
  *
  * The single-file writers funnel through one task / the driver by
  * design — they exist for format parity with the reference, flagged
  * for small results only (the reference itself materializes the
  * whole output in one process, unified_code.py:352–362).
  */
object Sinks {

  /** R13/R28 "chunks" mode: JSON Lines part files, overwrite like the
    * reference's WIP cleanup (R25, unified_code.py:28–36). */
  def jsonChunks(df: DataFrame, dir: String): Unit =
    // keep null fields: python json.dump writes explicit nulls
    // (the injected `id = None`, unified_code.py:267), Spark drops
    // them by default
    df.write.mode(SaveMode.Overwrite)
      .option("ignoreNullFields", "false").json(dir)

  /** R14 "merge" mode as a single JSON-Lines file: explicit sort key
    * (fixing §4.3(2)), coalesce(1) only at this final small sink. */
  def jsonMerged(df: DataFrame, dir: String, sortKeys: Seq[String]): Unit =
    df.orderBy(sortKeys.map(col): _*).coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .option("ignoreNullFields", "false").json(dir)

  /** R14+R15 byte-parity sink: a single JSON *array* file, pretty
    * (indent=4, like json.dump(..., indent=4), unified_code.py:349)
    * or minified (separators=(',',':'), unified_code.py:377); UTF-8
    * passthrough (ensure_ascii=False). Driver-side wrap — small
    * results only (the driver never holds big data otherwise). */
  def jsonArrayFile(df: DataFrame, path: String, sortKeys: Seq[String],
      indent: Boolean = false): Unit = {
    val rows = df.orderBy(sortKeys.map(col): _*)
      .select(to_json(struct(df.columns.toIndexedSeq.map(col): _*),
        Map("ignoreNullFields" -> "false")).as("j"))
      .collect().map(_.getString(0))
    val body =
      if (!indent) rows.mkString("[", ",", "]")
      else rows.map(reindent).mkString("[\n", ",\n", "\n]")
    Files.write(Paths.get(path), body.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
  }

  /** Pretty-print one compact JSON object at indent level 1 (4 spaces),
    * matching python json.dump(indent=4) field layout for flat records. */
  private def reindent(compact: String): String = {
    val inner = compact.stripPrefix("{").stripSuffix("}")
    if (inner.isEmpty) "    {}"
    else {
      // split on top-level commas only (commas inside strings stay)
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var inStr = false; var esc = false
      inner.foreach { c =>
        if (esc) { sb += c; esc = false }
        else c match {
          case '\\' if inStr => sb += c; esc = true
          case '"' => sb += c; inStr = !inStr
          case ',' if !inStr => parts += sb.toString; sb.clear()
          case _ => sb += c
        }
      }
      parts += sb.toString
      parts.map(p => "        " + p.replaceFirst(":", ": "))
        .mkString("    {\n", ",\n", "\n    }")
    }
  }

  /** R15 size stats: bytes written per sink directory (the reference
    * reports original/optimized MB, unified_code.py:383–388). */
  def sizeStats(dir: String): Map[String, Long] = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) Map.empty
    else Files.list(p).iterator().asScala
      .filter(f => Files.isRegularFile(f))
      .map(f => f.getFileName.toString -> Files.size(f)).toMap
  }
}
