package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's end-to-end conversion lifecycle as one API — what
  * `DataConverter.convert` + the CLI flow do
  * (/root/reference/unified_code.py:413–478 scheduler, :481–583 CLI):
  * discover/validate input → read → 4-stage pipeline → JSON output
  * (merged or partitioned) → size stats.
  *
  * Deliberate differences from the reference (SURVEY.md §4.3):
  *  - no O(chunks²) re-parsing: one declarative scan, partition-parallel;
  *  - no silent chunk loss: a failing task fails the job (vs
  *    unified_code.py:469–472 logging-and-dropping);
  *  - output order is an explicit sort key, not lexicographic file
  *    names (vs unified_code.py:357);
  *  - resume = re-run: the atomic overwrite commit makes re-runs
  *    idempotent, replacing the SQLite checkpoint table whose
  *    CLI-path resume was broken anyway (unified_code.py:407 vs :490).
  */
object Converter {

  /** Mirrors the reference's CLI surface: `--format`, `--csv-separator`
    * (unified_code.py:482–487), `--output-mode merge|chunks`
    * (Archive/unified_code.py:490), test mode (:509–525), minify
    * (:365–388). `chunkSize` maps to the test-mode row budget — real
    * chunking is Spark's partitioning. */
  final case class Config(
      format: String = "csv",
      csvSeparator: String = ",",
      header: Boolean = true,
      multiLine: Boolean = true,
      chunkSize: Int = 500,
      testMode: Boolean = false,
      outputMode: String = "merge",
      minify: Boolean = true,
      sortKeys: Seq[String] = Nil)

  final case class Stats(rows: Long, files: Int, bytes: Long)

  /** Full conversion: returns the reference's R15-style size stats. */
  def convert(spark: SparkSession, inputPath: String, outputDir: String,
      cfg: Config = Config()): Stats = {
    require(Readers.validate(spark, inputPath, cfg.format),
      s"input failed validation: $inputPath")   // R1/R4 probe
    val raw: DataFrame = cfg.format match {
      case "csv" => Readers.csv(spark, inputPath, cfg.csvSeparator, cfg.header,
        multiLine = cfg.multiLine)
      case "json" => Readers.json(spark, inputPath)
      case "parquet" => Readers.parquet(spark, inputPath)
      // Excel-proper (reference R3/R27 dispatch, unified_code.py:193–202):
      // the self-contained OOXML reader; multi-sheet workbooks surface
      // every sheet with its sheet_name column, like the reference's
      // per-sheet iteration
      case "xlsx" => spark.read.format("xlsx").load(inputPath)
      case f => throw new IllegalArgumentException(s"unsupported format: $f")
    }
    val staged = Pipeline.run(raw)                       // R8–R11
    val limited = if (cfg.testMode) Pipeline.testMode(staged, cfg.chunkSize) else staged
    val keys = if (cfg.sortKeys.nonEmpty) cfg.sortKeys
      else limited.columns.headOption.toSeq
    val rows = cfg.outputMode match {
      case "chunks" =>                                   // R13/R28
        Sinks.jsonChunks(limited, outputDir)
        limited.count()
      case "merge" =>                                    // R14/R15
        val path = s"$outputDir/output.json"
        new java.io.File(outputDir).mkdirs()
        Sinks.jsonArrayFile(limited, path, keys, indent = !cfg.minify)
        limited.count()
      case m => throw new IllegalArgumentException(s"unsupported output mode: $m")
    }
    val sizes = Sinks.sizeStats(outputDir)
    Stats(rows, sizes.size, sizes.values.sum)
  }
}
