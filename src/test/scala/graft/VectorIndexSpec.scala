package graft

import org.apache.spark.sql.functions._

/** Persisted vector channel (IndexStore.writeVectors / appendVectors /
  * annFromStore): the IVF index as a maintained artifact. Pins the
  * store route against the session route, the append contract, and
  * the partition pruning that makes the cells layout an index. */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-vec-$tag").toString

  test("annFromStore ≡ q39 session route (catalog q140 ≡ q39, bit-identical)") {
    val a = SparkEntry.queries("q39_ann_ivf")(spark, dir).collect().toSeq
    val b = SparkEntry.queries("q140_ann_store")(spark, dir).collect().toSeq
    assert(a.nonEmpty && a == b,
      s"store ANN diverges from session ANN:\n  q39=${a.take(3)}\n  q140=${b.take(3)}")
  }

  test("writeVectors(corpus) ≡ writeVectors(90%) + appendVectors(10%)") {
    // same centroids both ways (IVF retrains per snapshot, not per
    // batch) — so per-vector assignment is deterministic and the cells
    // channel must be set-equal
    val vecs = ops.Similarity.normalized(spark, dir)
    val cents = ops.Similarity.ivfCentroids(spark, dir)
    val gate = conv(substring(md5($"vec_id".cast("string")), 1, 4), 16, 10)
      .cast("long")
    val full = tmp("full"); val rolled = tmp("rolled")
    ops.IndexStore.writeVectors(spark, vecs, cents, full)
    ops.IndexStore.writeVectors(spark, vecs.filter(gate < 58982L), cents, rolled)
    ops.IndexStore.appendVectors(spark, rolled, vecs.filter(gate >= 58982L))
    for (ch <- Seq("centroids", "cells")) {
      val a = ops.IndexStore.channel(spark, full, ch)
      val b = ops.IndexStore.channel(spark, rolled, ch)
      assert(a.count() == b.count() && a.except(b).isEmpty && b.except(a).isEmpty,
        s"channel $ch diverges after append")
    }
    // observation equality on the ANN lookup
    val q = ops.Similarity.queryBatch(spark, dir, vecs)
    val ra = ops.IndexStore.annFromStore(spark, full, q).collect().toSeq
    val rb = ops.IndexStore.annFromStore(spark, rolled, q).collect().toSeq
    assert(ra.nonEmpty && ra == rb, "append-maintained store ANN diverges")
  }

  test("probed cell ids reach the cells read as a partition filter") {
    val idx = ops.Similarity.vectorStore(spark, dir)
    val q = ops.Similarity.queryBatch(spark, dir,
      ops.Similarity.normalized(spark, dir))
    val plan = ops.IndexStore.annFromStore(spark, idx, q)
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("cells"))
      .mkString("\n")
    assert(scanLine.contains("PartitionFilters: [") &&
        scanLine.contains("cid#"),
      s"cid filter not applied at the partition level:\n${scanLine.take(800)}")
  }
}
