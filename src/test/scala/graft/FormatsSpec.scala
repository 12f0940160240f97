package graft

import org.apache.spark.sql.functions._
import graft.ops.Formats

/** ORC interop (q85): the oracle gate hash-checks the aggregate against
  * DuckDB over the original parquet; these specs pin the round-trip
  * mechanics the hash rides on. */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q85 ORC round-trip: aggregate equals the same aggregate computed from parquet") {
    val got = Formats.catalog("q85_orc_roundtrip").fn(spark, dir)
    val expect = Core.table(spark, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"),
        Core.moneySum($"l_quantity").as("sum_qty"),
        Core.moneySum($"l_extendedprice").as("sum_price"))
      .orderBy($"l_returnflag", $"l_linestatus")
    assert(got.collect().toSeq == expect.collect().toSeq)
    assert(got.schema == expect.schema)
  }

  test("ORC write preserves row count, schema and exact values through the round trip") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-orc-spec").toString
    val src = Core.table(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_shipdate", $"l_returnflag")
    src.write.mode("overwrite").orc(tmp)
    val back = spark.read.orc(tmp)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    // exact value parity, order-independent: anti-join both ways is empty
    assert(back.exceptAll(src).count() == 0)
    assert(src.exceptAll(back).count() == 0)
  }
}
