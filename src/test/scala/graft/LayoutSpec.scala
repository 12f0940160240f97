package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions.{col, max, min}

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

  test("compaction: small-files input rewrites to the computed target file count") {
    val root = java.nio.file.Files.createTempDirectory("compact").toString
    // a 50-way write = 50 tiny files, the streaming-sink pathology
    spark.range(200000).toDF("id").repartition(50)
      .write.mode("overwrite").parquet(s"$root/small")
    val small = spark.read.parquet(s"$root/small")
    def dataFiles(p: String) =
      new java.io.File(p).listFiles.count(f => f.getName.endsWith(".parquet"))
    assert(dataFiles(s"$root/small") == 50)
    val n = ops.Layout.compactTo(small, s"$root/big", targetFileBytes = 256 * 1024)
    assert(dataFiles(s"$root/big") == n, "output file count must match the computed target")
    assert(n < 50, s"compaction must reduce the file count, got $n")
    assert(spark.read.parquet(s"$root/big").count() == 200000)
  }

  test("z-order: narrow predicates on EITHER clustered column touch few files") {
    val root = java.nio.file.Files.createTempDirectory("zorder").toString
    val dir = "/root/testdata/sf0.001"
    val li = Core.table(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_quantity")
    val nFiles = 16
    ops.Layout.zorderWrite(li, s"$root/z", Seq("l_partkey", "l_suppkey"), nFiles)
    // lexicographic baseline: sorted by partkey only — a suppkey
    // predicate gets no skipping at all
    li.repartitionByRange(nFiles, $"l_partkey").sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$root/lex")
    def filesTouched(p: String, c: String, lo: Long, hi: Long): Int = {
      val fs = new java.io.File(p).listFiles.filter(_.getName.endsWith(".parquet"))
      fs.count { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(c)), max(col(c))).head()
        r.getLong(0) <= hi && r.getLong(1) >= lo
      }
    }
    val (pLo, pHi) = (1L, 12L)      // ~1/16 of the partkey domain at sf0.001
    val (sLo, sHi) = (1L, 1L)       // one supplier of ~10
    val zPart = filesTouched(s"$root/z", "l_partkey", pLo, pHi)
    val zSupp = filesTouched(s"$root/z", "l_suppkey", sLo, sHi)
    val lexSupp = filesTouched(s"$root/lex", "l_suppkey", sLo, sHi)
    assert(zPart <= nFiles / 2, s"partkey slice touched $zPart/$nFiles z-ordered files")
    assert(zSupp <= nFiles / 2, s"suppkey slice touched $zSupp/$nFiles z-ordered files")
    assert(zSupp < lexSupp,
      s"z-order must beat the partkey-sorted layout on the OTHER column " +
        s"($zSupp vs $lexSupp of $nFiles)")
    // layout changes bytes, never rows
    assert(spark.read.parquet(s"$root/z").count() == li.count())
  }
}
