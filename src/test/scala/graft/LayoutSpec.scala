package graft

import org.apache.spark.sql.execution.FormattedMode

/** Physical-layout scale techniques from SCALE.md, proven in plans:
  * bucketed co-located joins (no shuffle) and dynamic partition
  * pruning (fact partitions skipped at runtime). These are the two
  * layout levers a 100 TB deployment reaches for first. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables co-locate: the join plans with zero shuffle exchanges") {
    val dir = "/root/testdata/sf0.001"
    Core.table(spark, dir, "lineitem").select($"l_orderkey", $"l_quantity")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Core.table(spark, dir, "orders").select($"o_orderkey", $"o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), $"l_orderkey" === $"o_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(1500)}")
      // and it still computes the right thing
      assert(j.count() ==
        Core.table(spark, dir, "lineitem")
          .join(Core.table(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
          .count())
    }
  }

  test("dynamic partition pruning: selective dim filter prunes fact partitions at runtime") {
    val root = java.nio.file.Files.createTempDirectory("dpp").toString
    val dir = "/root/testdata/sf0.001"
    Core.table(spark, dir, "orders")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(s"$root/fact")
    Seq(("F", "finished"), ("O", "open"), ("P", "pending")).toDF("st", "label")
      .write.mode("overwrite").parquet(s"$root/dim")
    withConf("spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true") {
      val fact = spark.read.parquet(s"$root/fact")
      // DPP fires when the dim side carries a selective predicate
      val dim = spark.read.parquet(s"$root/dim").filter($"label" === "finished")
      val j = fact.join(dim, fact("o_orderstatus") === dim("st"))
      val plan = j.queryExecution.explainString(FormattedMode)
      assert(plan.contains("dynamicpruning") || plan.contains("dynamicpruningexpression"),
        s"expected a dynamic pruning subquery on the fact scan:\n${plan.take(2000)}")
      val n = j.count()
      val expected = Core.table(spark, dir, "orders").filter($"o_orderstatus" === "F").count()
      assert(n == expected)
    }
  }
}
