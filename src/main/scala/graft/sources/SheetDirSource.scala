package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 "workbook" source: a directory of per-sheet CSV files
  * exposed as ONE table with a `sheet_name` column — the faithful
  * replacement for the reference's multi-sheet Excel semantics
  * (waldfalke/catme-etl iterates `excel.sheet_names` and processes
  * each sheet independently, /root/reference/unified_code.py:184–191,
  * 426; SURVEY.md §7.5 designates a DSv2 TableProvider as the
  * extension point since no Excel jar ships offline).
  *
  * Mapping of reference concepts:
  *  - sheet → one `InputPartition` (sheets process independently and
  *    in parallel, like the reference's per-sheet chunk loops);
  *  - header-preserving chunk reads (`skiprows=range(1, start+1)`,
  *    unified_code.py:200) → the header is parsed once into the
  *    schema, partitions stream rows — no re-reading;
  *  - column pruning is pushed into the reader
  *    (`SupportsPushDownRequiredColumns`), so `SELECT one_col` never
  *    materializes whole rows — the scan-level frugality Spark's
  *    native sources get, demonstrated on a custom source.
  *
  * Usage: `spark.read.format("sheetdir").option("sep", ";")
  * .load(dir)`. All sheets must share the header of the first sheet
  * (a workbook of uniform sheets); values are strings — cast
  * downstream, or compose with `etl.Readers.csv` for full CSV
  * dialect/inference on single files. Embedded newlines inside quoted
  * fields are not supported by this source (use `Readers.csv`).
  */
class SheetDirSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sheetdir"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SheetDirSource.infer(options)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SheetDirTable(schema, new CaseInsensitiveStringMap(properties))
}

object SheetDirSource {
  val SheetCol = "sheet_name"

  def dir(options: CaseInsensitiveStringMap): Path = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("sheetdir: .load(<directory>) is required"))
    Paths.get(p)
  }

  def sheets(d: Path): Seq[Path] = {
    require(Files.isDirectory(d), s"sheetdir: not a directory: $d")
    val listing = Files.list(d)
    try listing.iterator().asScala
      .filter(f => f.getFileName.toString.endsWith(".csv"))
      .toSeq.sortBy(_.getFileName.toString)
    finally listing.close()
  }

  def sep(options: CaseInsensitiveStringMap): String = options.getOrDefault("sep", ",")

  def infer(options: CaseInsensitiveStringMap): StructType = {
    val ss = sheets(dir(options))
    require(ss.nonEmpty, s"sheetdir: no .csv sheets in ${dir(options)}")
    val headStream = Files.lines(ss.head)
    val header = try headStream.findFirst().orElse("") finally headStream.close()
    val cols = parseLine(header, sep(options).charAt(0))
    StructType(cols.map(c => StructField(c, StringType)) :+ StructField(SheetCol, StringType))
  }

  /** Minimal RFC-4180-style line parse: quoted fields, `""` escape. */
  def parseLine(line: String, sep: Char): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { sb.append('"'); i += 1 }
          else inQ = false
        } else sb.append(c)
      } else c match {
        case '"' => inQ = true
        case `sep` => out += sb.toString; sb.setLength(0)
        case _ => sb.append(c)
      }
      i += 1
    }
    out += sb.toString
    out.toArray
  }
}

class SheetDirTable(tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"sheetdir(${SheetDirSource.dir(options)})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new SheetScanBuilder(tableSchema, options)
}

class SheetScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new SheetScan(full, required,
    SheetDirSource.dir(options).toString, SheetDirSource.sep(options))
}

class SheetScan(full: StructType, required: StructType, dirPath: String, sep: String)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SheetDirScan(dir=$dirPath, sheets→partitions, ReadSchema=${required.simpleString})"

  override def planInputPartitions(): Array[InputPartition] =
    SheetDirSource.sheets(Paths.get(dirPath)).map { p =>
      SheetPartition(p.toString,
        p.getFileName.toString.stripSuffix(".csv")): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new SheetReaderFactory(full, required, sep)
}

case class SheetPartition(file: String, sheet: String) extends InputPartition

class SheetReaderFactory(full: StructType, required: StructType, sep: String)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SheetPartition]
    // map each required field to its index in the data row (-1 = sheet_name)
    val dataCols = full.fieldNames.filterNot(_ == SheetDirSource.SheetCol)
    val indices = required.fieldNames.map {
      case SheetDirSource.SheetCol => -1
      case c => dataCols.indexOf(c)
    }
    val sheetName = UTF8String.fromString(p.sheet)
    new PartitionReader[InternalRow] {
      // keep the stream handle so close() can release the file descriptor
      private val stream = Files.lines(Paths.get(p.file))
      private val lines = stream.iterator()
      if (lines.hasNext) lines.next() // header row (parsed once at infer time)
      private var current: InternalRow = _

      override def next(): Boolean =
        if (!lines.hasNext) false
        else {
          val cells = SheetDirSource.parseLine(lines.next(), sep.charAt(0))
          val values: Array[Any] = indices.map {
            case -1 => sheetName
            case i if i < cells.length => UTF8String.fromString(cells(i))
            case _ => null
          }
          current = InternalRow.fromSeq(values.toIndexedSeq)
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = stream.close()
    }
  }
}
