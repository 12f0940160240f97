package graft

import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** DSv2 `.xlsx` source. The fixture workbook is HAND-AUTHORED
  * SpreadsheetML (ECMA-376 §18) — written here as literal XML and
  * zipped with JDK machinery, NOT produced by the reader's own code —
  * so the test is an independent-artifact parse, covering the features
  * real writers emit: shared strings (incl. rich-text runs), inline
  * strings, formula-cached strings, booleans, raw numbers, sparse
  * cell references, cells without references, and multiple sheets
  * resolved through the workbook rels. */
class XlsxSourceSpec extends SparkSpec {
  import spark.implicits._

  private def part(zos: ZipOutputStream, name: String, body: String): Unit = {
    zos.putNextEntry(new ZipEntry(name))
    zos.write(body.getBytes("UTF-8"))
    zos.closeEntry()
  }

  /** One workbook: sheet "Alpha" (4 rows incl. header) + "Beta" (1 row). */
  private def writeWorkbook(path: String): Unit = {
    val zos = new ZipOutputStream(Files.newOutputStream(Paths.get(path)))
    try {
      part(zos, "[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |</Types>""".stripMargin)
      part(zos, "_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      part(zos, "xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets>
          |<sheet name="Alpha" sheetId="1" r:id="rId1"/>
          |<sheet name="Beta" sheetId="2" r:id="rId2"/>
          |</sheets>
          |</workbook>""".stripMargin)
      part(zos, "xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
          |</Relationships>""".stripMargin)
      // 0="name", 1="amount", 2="alpha", 3=rich-text "beta" (two runs)
      part(zos, "xl/sharedStrings.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
          |<si><t>name</t></si>
          |<si><t>amount</t></si>
          |<si><t>alpha</t></si>
          |<si><r><t>be</t></r><r><t>ta</t></r></si>
          |</sst>""".stripMargin)
      // header via shared + inline strings; data rows exercise every
      // cell type; row 4 omits cell references (sequential positions);
      // row 3 is sparse (no A-cell)
      part(zos, "xl/worksheets/sheet1.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>flag</t></is></c></row>
          |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>1.5</v></c><c r="C2" t="b"><v>1</v></c></row>
          |<row r="3"><c r="B3"><v>2</v></c><c r="C3" t="b"><v>0</v></c></row>
          |<row r="4"><c t="s"><v>3</v></c><c><v>3.25</v></c><c t="b"><v>1</v></c></row>
          |</sheetData>
          |</worksheet>""".stripMargin)
      // formula with a cached string result (t="str")
      part(zos, "xl/worksheets/sheet2.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>flag</t></is></c></row>
          |<row r="2"><c r="A2" t="str"><f>CONCATENATE("del","ta")</f><v>delta</v></c><c r="B2"><v>9</v></c></row>
          |</sheetData>
          |</worksheet>""".stripMargin)
    } finally zos.close()
  }

  private def workbook(): String = {
    val dir = Files.createTempDirectory("xlsx").toString
    writeWorkbook(s"$dir/book1.xlsx")
    s"$dir/book1.xlsx"
  }

  test("reads a hand-authored ECMA-376 workbook: all sheets, all cell types") {
    val df = spark.read.format("xlsx").load(workbook())
    assert(df.columns.sameElements(Array("name", "amount", "flag", "sheet_name")))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(rows == Set(
      ("alpha", "1.5", "true", "Alpha"),   // shared string, number, bool
      (null, "2", "false", "Alpha"),        // sparse row: no A-cell
      ("beta", "3.25", "true", "Alpha"),    // rich-text runs + ref-less cells
      ("delta", "9", null, "Beta")))        // formula-cached string
  }

  test("one partition per (file, sheet)") {
    val df = spark.read.format("xlsx").load(workbook())
    assert(df.rdd.getNumPartitions == 2)
  }

  test("directory of workbooks reads with file x sheet parallelism") {
    val dir = Files.createTempDirectory("xlsxdir").toString
    writeWorkbook(s"$dir/a.xlsx")
    writeWorkbook(s"$dir/b.xlsx")
    val df = spark.read.format("xlsx").load(dir)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 8)
  }

  test("column pruning is pushed into the reader") {
    val df = spark.read.format("xlsx").load(workbook()).select($"name")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema=struct<name:string>"), plan.take(800))
    assert(df.as[String].collect().toSet == Set("alpha", null, "beta", "delta"))
  }

  test("header=false surfaces positional columns") {
    val df = spark.read.format("xlsx").option("header", false).load(workbook())
    assert(df.columns.sameElements(Array("_c0", "_c1", "_c2", "sheet_name")))
    assert(df.count() == 6) // header rows become data
  }

  test("writer round-trip: reader returns exactly what was written, XML specials intact") {
    val df = Seq(
      (1L, "a&b<c>d", Option("x\"y'z")),
      (2L, "  spaced  ", None)).toDF("id", "s", "t")
    val p = Files.createTempDirectory("xlsxw").toString + "/out.xlsx"
    sources.Xlsx.write(df, p, sheet = "S")
    val back = spark.read.format("xlsx").load(p)
    assert(back.columns.sameElements(Array("id", "s", "t", "sheet_name")))
    val rows = back.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(rows == Set(
      ("1", "a&b<c>d", "x\"y'z", "S"),
      ("2", "  spaced  ", null, "S")))
  }

  test("xlsx + Converter compose (reference R3/R27 dispatch, workbook → staged JSON)") {
    val out = Files.createTempDirectory("xlsx-out").toString
    val stats = etl.Converter.convert(spark, workbook(), out,
      etl.Converter.Config(format = "xlsx", outputMode = "chunks"))
    assert(stats.rows == 4)
    val back = spark.read.json(out)
    assert(back.count() == 4)
    assert(back.columns.contains("sheet_name") && back.columns.contains("finalized"))
  }
}
