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

  test("catalog query NUMBERS are unique — the bench tail's range-array position decode collides on a shared number (ADVICE r13)") {
    val nums = SparkEntry.queries.keys.toSeq
      .flatMap(n => "\\d+".r.findFirstIn(n).map(_.toInt -> n))
    val dup = nums.groupBy(_._1).filter(_._2.size > 1)
    assert(dup.isEmpty,
      s"duplicate query numbers: ${dup.view.mapValues(_.map(_._2)).toMap}")
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

  test("approx_count_distinct stays within HLL error bounds of exact counts") {
    val dir = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q26_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = SparkEntry.queries("q10_count_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (flag, (parts, supps)) =>
      val (aParts, aSupps) = approx(flag)
      assert(math.abs(aParts - parts).toDouble / parts < 0.1,
        s"$flag parts: approx $aParts vs exact $parts")
      assert(math.abs(aSupps - supps).toDouble / supps < 0.05,
        s"$flag supps: approx $aSupps vs exact $supps")
    }
  }

  test("q79 zipf slope: matches Spark's builtin regr_slope, and is negative (freq falls with rank)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q79_zipf_slope")(spark, dir)
      .select($"source", $"zipf_slope").as[(String, Double)].collect().toMap
    assert(got.nonEmpty && got.values.forall(_ < 0.0),
      s"frequency must fall with rank: $got")
    // independent check: the decimal-sum regression equals the builtin
    // least-squares aggregate (which our formulation re-derives for
    // engine-exactness) to rounding precision
    val toks = Core.table(spark, dir, "documents")
      .select($"source", explode(split(lower($"text"), " ")).as("tok"))
      .filter(length($"tok") > 0)
    val ref = toks.groupBy($"source", $"tok").agg(count(lit(1)).as("n"))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"source").orderBy($"n".desc, $"tok")))
      .groupBy($"source").agg(expr("regr_slope(ln(n), ln(r))").as("s"))
      .as[(String, Double)].collect().toMap
    got.foreach { case (src, v) =>
      assert(math.abs(v - ref(src)) < 1e-3, s"$src: catalog $v vs regr_slope ${ref(src)}")
    }
  }

  test("approx quantiles stay within GK rank-error bounds of the true ranks") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("q66_approx_quantiles")(spark, dir).collect()
    val li = Core.table(spark, dir, "lineitem")
    // rank check: the fraction of group values ≤ the approx quantile
    // must sit within ε of the requested rank (accuracy 10000 → ε 1e-4;
    // allow 10× slack for interpolation at repeated values)
    got.foreach { r =>
      val flag = r.getString(0)
      val n = r.getLong(1).toDouble
      Seq(0.25 -> r.getDouble(2), 0.5 -> r.getDouble(3),
        0.75 -> r.getDouble(4), 0.95 -> r.getDouble(5)).foreach { case (p, v) =>
        val below = li.filter($"l_returnflag" === flag && $"l_extendedprice" <= v)
          .count().toDouble / n
        assert(math.abs(below - p) < 0.01,
          s"$flag p$p: approx value $v has true rank $below")
      }
    }
  }

  test("scalar UDF surface: registered Scala udf matches the builtin path") {
    val norm = org.apache.spark.sql.functions.udf((s: String) =>
      if (s == null) null else s.trim.toLowerCase)
    spark.udf.register("norm_text", norm)
    val df = Seq("  MiXeD Case ", "plain").toDF("s")
    val viaUdf = df.select(norm($"s")).as[String].collect()
    val viaBuiltin = df.select(
      org.apache.spark.sql.functions.lower(
        org.apache.spark.sql.functions.trim($"s"))).as[String].collect()
    assert(viaUdf.sameElements(viaBuiltin))
    assert(spark.sql("SELECT norm_text('  A b ')").as[String].head() == "a b")
  }

  test("multimodal resize + frame-sample plumbing: shapes, determinism, generator fan-out") {
    val dir = "/root/testdata/sf0.001"
    val resized = ops.Multimodal.resize(spark, dir, 64, 64)
    assert(resized.columns.sameElements(Array("doc_id", "width", "height", "payload")))
    val r1 = resized.orderBy("doc_id").first()
    val r2 = ops.Multimodal.resize(spark, dir, 64, 64).orderBy("doc_id").first()
    assert(java.util.Arrays.equals(
      r1.getAs[Array[Byte]]("payload"), r2.getAs[Array[Byte]]("payload")),
      "resize stub must be deterministic")
    assert(r1.getAs[Array[Byte]]("payload").length <= 64 * 64 / 64)

    val frames = ops.Multimodal.frameSample(spark, dir, 4)
    assert(frames.columns.sameElements(Array("doc_id", "frame_no", "frame")))
    val perDoc = frames.groupBy("doc_id").count()
      .select("count").distinct().collect().map(_.getLong(0)).toSet
    assert(perDoc == Set(4L), s"expected 4 frames per doc, got $perDoc")
  }

  test("sortWithinPartitions: local order with no global-sort exchange (SURVEY §2B)") {
    import org.apache.spark.sql.functions._
    val df = Core.table(spark, "/root/testdata/sf0.001", "orders")
      .repartition(4, $"o_custkey")
      .sortWithinPartitions($"o_totalprice")
      .select($"o_totalprice")
    val perPartSorted = df.rdd.mapPartitions { it =>
      val v = it.map(_.getDouble(0)).toArray
      Iterator.single(v.sameElements(v.sorted))
    }.collect()
    assert(perPartSorted.nonEmpty && perPartSorted.forall(identity))
    val plan = df.queryExecution.executedPlan.toString
    assert("(?i)exchange".r.findAllIn(plan).size == 1,
      s"expected only the repartition exchange:\n$plan")
    assert(plan.contains("Sort ") && plan.contains("], false, 0"),
      s"expected a non-global (within-partition) sort:\n$plan")
  }

  test("VectorMeanD aggregator: double-vector mean for the IVF Lloyd step") {
    val vmean = org.apache.spark.sql.functions.udaf(ops.VectorMeanD)
    val df = Seq(
      (0, Seq(1.0, 2.0)),
      (0, Seq(3.0, 4.0)),
      (1, Seq(10.0, 20.0))).toDF("cid", "unit")
    val got = df.groupBy($"cid").agg(vmean($"unit").as("m"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(got(0) == Seq(2.0, 3.0))
    assert(got(1) == Seq(10.0, 20.0))
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
