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

  test("retrainVectors: model refreshed, assignments exact, no vector lost") {
    // appends assign under the FROZEN snapshot model; retrain is the
    // deferred maintenance op: re-train Lloyd on the stored vectors,
    // reassign everything, one transaction. (Float partial-aggregation
    // order makes two training runs ulp-different, so the pin is
    // SEMANTIC, not bit-level: membership preserved, k re-sized for
    // the full corpus, and every stored assignment the exact argmax of
    // the refreshed model.)
    val vecs = ops.Similarity.normalized(spark, dir)
    val cents = ops.Similarity.ivfCentroids(spark, dir)
    val gate = conv(substring(md5($"vec_id".cast("string")), 1, 4), 16, 10)
      .cast("long")
    val rolled = tmp("retrain")
    ops.IndexStore.writeVectors(spark, vecs.filter(gate < 58982L), cents, rolled)
    ops.IndexStore.appendVectors(spark, rolled, vecs.filter(gate >= 58982L))
    val idsBefore = ops.IndexStore.channel(spark, rolled, "cells")
      .select($"vec_id")
    val nBefore = idsBefore.count()
    ops.IndexStore.retrainVectors(spark, rolled)
    val cells = ops.IndexStore.channel(spark, rolled, "cells")
    // membership preserved exactly
    assert(cells.count() == nBefore &&
      cells.select($"vec_id").except(idsBefore).isEmpty &&
      idsBefore.except(cells.select($"vec_id")).isEmpty,
      "retrain must preserve the stored vector set")
    // every assignment is the argmax of the RETRAINED centroids —
    // deterministic given the stored model, whatever floats training
    // produced
    val newCents = ops.IndexStore.channel(spark, rolled, "centroids")
    val reassigned = graft.ops.Similarity.nearestCell(
      cells.select($"vec_id", $"unit"), newCents)
      .select($"vec_id", $"cid".as("want"))
    val wrong = cells.select($"vec_id", $"cid")
      .join(reassigned, Seq("vec_id"))
      .filter($"cid" =!= $"want").count()
    assert(wrong == 0, s"$wrong stored assignments are not the model argmax")
    // the retrained store answers lookups, and its cells are one path
    // again (retrain doubles as the vector family's compaction)
    val q = ops.Similarity.queryBatch(spark, dir, vecs)
    assert(ops.IndexStore.annFromStore(spark, rolled, q).count() > 0)
    val cur = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$rolled/_current")).trim
    val manifest = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$rolled/$cur/_manifest.json"))
    val cellPaths = """"cells": \{"paths": \[([^\]]*)\]""".r
      .findFirstMatchIn(manifest).get.group(1)
    assert(!cellPaths.contains(","),
      s"retrain must collapse cells to ONE path: $cellPaths")
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
