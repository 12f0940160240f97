package graft

/** Smoke + multimodal plumbing + UDAF tests. */
class CoreSpec extends SparkSpec {
  import spark.implicits._

  test("entry flagship query returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every catalog query has a distinct name and every oracle key exists") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
  }

  test("multimodal decodeMeta: mapPartitions stub decode plumbing") {
    val df = ops.Multimodal.decodeMeta(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 500)
    assert(df.columns.sameElements(Array("doc_id", "width", "height", "pixfmt", "n_bytes")))
    val r = rows.head
    val w = r.getAs[Int]("width")
    assert(w >= 320 && w < 640)
    assert(Set("rgb8", "gray8").contains(r.getAs[String]("pixfmt")))
  }

  test("VectorMean aggregator: direct use over a literal dataset") {
    val vmean = org.apache.spark.sql.functions.udaf(ops.VectorMean)
    val df = Seq(
      (0, Seq(1.0f, 2.0f)),
      (0, Seq(3.0f, 4.0f)),
      (1, Seq(10.0f, 20.0f))).toDF("label", "embedding")
    val got = df.groupBy($"label").agg(vmean($"embedding").as("m"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(got(0) == Seq(2.0, 3.0))
    assert(got(1) == Seq(10.0, 20.0))
  }
}
