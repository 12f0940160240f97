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

  test("retrainIfDrifted: growth and skew fire the retrain; a no-drift stream never retrains") {
    def unitAt(theta: Double) = Seq(math.cos(theta), math.sin(theta))
    // 24 vectors spread evenly around the circle, 3-cell model
    val base = (0 until 24).map(i =>
      (i.toLong, "l", unitAt(i * 2 * math.Pi / 24))).toDF("vec_id", "label", "unit")
    val cents = Seq((0L, unitAt(0)), (1L, unitAt(2 * math.Pi / 3)),
      (2L, unitAt(4 * math.Pi / 3))).toDF("cid", "cvec")

    def cellSkew(idx: String): Double = {
      val counts = ops.IndexStore.channel(spark, idx, "cells")
        .groupBy($"cid").count().collect().map(_.getLong(1).toDouble)
      counts.max / (counts.sum / counts.length)
    }
    def vecStats(idx: String) = {
      val r = ops.IndexStore.channel(spark, idx, "vec_stats").head()
      (r.getAs[Long]("n_vecs"), r.getAs[Long]("k"), r.getAs[Long]("n_at_train"))
    }

    // no-drift: evenly-spread small appends at DEFAULT thresholds —
    // the gate must never fire (model stays the written one)
    val calm = tmp("calm")
    ops.IndexStore.writeVectors(spark, base, cents, calm)
    for (b <- 0 until 2) {
      val batch = (0 until 6).map(i => (100L + b * 10 + i, "l",
        unitAt((i * 4 + b) * 2 * math.Pi / 24 + 0.1))).toDF("vec_id", "label", "unit")
      streaming.StreamingOps.ingestAndMaintainVectors(spark, calm, batch)
    }
    assert(vecStats(calm) == ((36L, 3L, 24L)),
      s"no-drift stream must keep the trained model, got ${vecStats(calm)}")

    // growth: corpus past factor × n_at_train → retrain re-sizes k and
    // resets n_at_train (re-arming the gate)
    val grow = tmp("grow")
    ops.IndexStore.writeVectors(spark, base, cents, grow)
    try {
      spark.conf.set("graft.store.retrainGrowthFactor", "1.5")
      val batch = (0 until 14).map(i => (200L + i, "l",
        unitAt(i * 2 * math.Pi / 14 + 0.05))).toDF("vec_id", "label", "unit")
      streaming.StreamingOps.ingestAndMaintainVectors(spark, grow, batch)
      val (n, k, nt) = vecStats(grow)
      assert(n == 38L && nt == 38L,
        s"growth gate must retrain (n_at_train reset to the corpus), got ($n, $k, $nt)")
      assert(!ops.IndexStore.retrainIfDrifted(spark, grow),
        "a just-retrained store must not immediately re-fire")
    } finally spark.conf.unset("graft.store.retrainGrowthFactor")

    // skew: a drifted stream piling into one cell → max/mean over the
    // threshold → retrain rebalances the cells
    val skew = tmp("skew")
    ops.IndexStore.writeVectors(spark, base, cents, skew)
    try {
      spark.conf.set("graft.store.retrainSkewFactor", "1.6")
      val drifted = (0 until 9).map(i => (300L + i, "l",
        unitAt(0.02 * i))).toDF("vec_id", "label", "unit") // all into cell 0
      ops.IndexStore.appendVectors(spark, skew, drifted)
      val skewBefore = cellSkew(skew)
      assert(skewBefore > 1.6, s"fixture degenerate: skew $skewBefore not over threshold")
      assert(ops.IndexStore.retrainIfDrifted(spark, skew), "skew gate must fire")
      val (n, _, nt) = vecStats(skew)
      assert(n == 33L && nt == 33L)
      assert(cellSkew(skew) < skewBefore,
        s"retrain must rebalance cells: ${cellSkew(skew)} !< $skewBefore")
    } finally spark.conf.unset("graft.store.retrainSkewFactor")
  }

  test("q159 ≡ q155 bit-identically: projected ANN served from the store channels") {
    val a = SparkEntry.queries("q155_knn_projected")(spark, dir).collect().toSeq
    val b = SparkEntry.queries("q159_knn_projected_store")(spark, dir).collect().toSeq
    assert(a.nonEmpty && a == b,
      s"store-fed projected ANN diverges from the session route:\n" +
        s"  q155=${a.take(3)}\n  q159=${b.take(3)}")
  }

  test("projected channels co-reside with the IVF family under ONE version pin") {
    val root = ops.Similarity.vectorStore(spark, dir)
    val chs = ops.IndexStore.describeStore(spark, root)
      .select($"channel").as[String].collect().toSet
    assert(Set("centroids", "cells", "vec_stats",
      "proj_units", "exact_vecs", "proj_stats").subsetOf(chs),
      s"vector store must carry both semantic routes, got $chs")
  }

  test("projection identity: a store written under a DIFFERENT sign derivation is refused, never served") {
    val root = tmp("projskew")
    val units = (0 until 4).map(i =>
      (i.toLong, "l", Seq.fill(8)(0.5))).toDF("vec_id", "label", "punit")
    val fine = (0 until 4).map(i =>
      (i.toLong, Seq.fill(16)(1.0), 16.0)).toDF("vec_id", "embd", "nsq")
    ops.IndexStore.writeProjections(spark, root, units, fine)
    // the untampered store serves (identity check passes)
    val queries = Seq((9L, Seq.fill(16)(0.5f))).toDF("vec_id", "embedding")
    ops.IndexStore.projectedAnnFromStore(spark, root, queries).collect()
    // simulate version skew: a store whose proj_stats records a sign
    // table THIS build does not derive (an old-derivation writer)
    val stDir = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(d => new java.io.File(d, "proj_stats"))
      .filter(_.isDirectory).head
    val orig = spark.read.parquet(stDir.toString).collect().head
    ops.IndexStore.deleteRec(stDir)
    Seq((orig.getAs[Int]("k"), orig.getAs[Int]("d"),
        orig.getAs[String]("scheme"), "00112233445566778899aabbccddeeff",
        orig.getAs[Long]("n_vecs")))
      .toDF("k", "d", "scheme", "sign_fp", "n_vecs")
      .coalesce(1).write.parquet(stDir.toString)
    val e = intercept[IllegalArgumentException] {
      ops.IndexStore.projectedAnnFromStore(spark, root, queries).collect()
    }
    assert(e.getMessage.contains("projection identity mismatch") &&
      e.getMessage.contains("00112233445566778899aabbccddeeff"),
      s"refusal must name the mismatched identity, got: ${e.getMessage}")
  }

  test("append-maintained projected channels: subset + appendVectors(raw) ≡ the session q155 route on the full corpus") {
    // the q159 ≡ q155 pin RE-PINNED THROUGH AN APPEND (VERDICT r9 #1):
    // bootstrap both arms from the even half, fold the odd half through
    // appendVectors with its raw embeddings — the projected read must
    // then be bit-identical to the session route over the full corpus
    // (same per-row arithmetic, and parquet round-trips doubles exactly)
    val vecs = ops.Similarity.normalized(spark, dir)
    val raw = Core.table(spark, dir, "embeddings")
    val cents = ops.Similarity.ivfCentroids(spark, dir)
    val root = tmp("projroll")
    val rawEven = raw.filter($"vec_id" % 2 === 0)
    ops.IndexStore.writeVectors(spark, vecs.filter($"vec_id" % 2 === 0),
      cents, root)
    ops.IndexStore.writeProjections(spark, root,
      ops.Similarity.projectedUnitsOf(rawEven, 32),
      ops.Similarity.exactVecsOf(rawEven))
    ops.IndexStore.appendVectors(spark, root,
      vecs.filter($"vec_id" % 2 === 1),
      raw = Some(raw.filter($"vec_id" % 2 === 1)))
    // coverage census advanced in lockstep on BOTH arms — and the
    // describeStore facts column surfaces the comparison the staleness
    // gate enforces
    val facts = ops.IndexStore.describeStore(spark, root)
      .select($"channel", $"facts").as[(String, String)].collect().toMap
    val nFull = vecs.count()
    assert(facts("vec_stats").contains(s"n_vecs=$nFull") &&
      facts("proj_stats").contains(s"n_vecs=$nFull"),
      s"coverage census out of lockstep after append: $facts")
    val q = ops.Similarity.queryBatch(spark, dir, raw)
      .select($"vec_id", $"embedding")
    val store = ops.IndexStore.projectedAnnFromStore(spark, root, q)
      .collect().toSeq
    val session = SparkEntry.queries("q155_knn_projected")(spark, dir)
      .collect().toSeq
    assert(store.nonEmpty && store == session,
      s"append-maintained projected ANN diverges from the session route:\n" +
        s"  store=${store.take(3)}\n  q155=${session.take(3)}")
  }

  test("reprojectVectors: re-derive at a new width ≡ the session route; old versions serve the old width; proj-channels-only version (VERDICT r15 #2)") {
    val vecs = ops.Similarity.normalized(spark, dir)
    val raw = Core.table(spark, dir, "embeddings")
    val cents = ops.Similarity.ivfCentroids(spark, dir)
    val root = tmp("reproj")
    ops.IndexStore.writeVectors(spark, vecs, cents, root)
    ops.IndexStore.writeProjections(spark, root,
      ops.Similarity.projectedUnitsOf(raw, 32),
      ops.Similarity.exactVecsOf(raw))
    val vOld = ops.IndexStore.history(root).last
    val q = ops.Similarity.queryBatch(spark, dir, raw)
      .select($"vec_id", $"embedding")
    val before = ops.IndexStore.projectedAnnFromStore(spark, root, q)
      .collect().toSeq
    ops.IndexStore.reprojectVectors(spark, root, 16)
    // the store now serves the NEW width, bit-identical to a fresh
    // session-route compute at k=16 (the shared stage functions +
    // exact parquet round-trip argument of the q159 pin)
    val store16 = ops.IndexStore.projectedAnnFromStore(spark, root, q)
      .collect().toSeq
    val session16 = ops.Similarity.exactRerank(
      ops.Similarity.projectedCandidates(spark,
        ops.Similarity.projectedUnitsOf(raw, 16),
        ops.Similarity.projectQueries(spark, q, 16), 100),
      ops.Similarity.exactVecsOf(raw),
      ops.Similarity.exactQueries(spark, q), 5).collect().toSeq
    assert(store16.nonEmpty && store16 == session16,
      s"re-derived projected ANN diverges from the session route at " +
        s"k=16:\n  store=${store16.take(3)}\n  session=${session16.take(3)}")
    assert(store16 != before,
      "fixture degenerate: k=16 and k=32 coarse spaces rank identically")
    // the identity flipped: proj_stats records (k=16, this build's fp),
    // coverage unchanged (the lockstep staleness gate still holds)
    val st = ops.IndexStore.channel(spark, root, "proj_stats").head()
    assert(st.getAs[Int]("k") == 16 && st.getAs[Long]("n_vecs") == raw.count(),
      s"identity must record the new width with unchanged coverage: $st")
    // prior versions keep serving the OLD width bit-identically
    assert(ops.IndexStore.projectedAnnFromStoreAt(spark, root, vOld, q)
      .collect().toSeq == before,
      "reproject must not rewrite history — the old snapshot serves k=32")
    // the reproject is a proj-channels-only timeline version
    val hist = ops.IndexStore.history(root)
    val (mOld, mNew) = (ops.IndexStore.manifestAt(root, hist(hist.size - 2)),
      ops.IndexStore.manifestAt(root, hist.last))
    val changed = (mOld.keySet ++ mNew.keySet)
      .filter(c => mOld.get(c).map(_.paths) != mNew.get(c).map(_.paths))
    assert(changed == Set("proj_units", "proj_stats"),
      s"reproject must touch exactly the proj identity channels: $changed")
    // and the fold path follows the new identity: an append's raw
    // deltas project at k=16 (appendProjectionsInto reads the stored
    // identity) and coverage stays in lockstep
    val nB = 20L
    val vecsB = vecs.filter($"vec_id" < nB)
      .select(($"vec_id" + 100000).as("vec_id"), $"label", $"unit")
    val rawB = raw.filter($"vec_id" < nB)
      .select(($"vec_id" + 100000).as("vec_id"), $"label", $"embedding")
    ops.IndexStore.appendVectors(spark, root, vecsB, raw = Some(rawB))
    val st2 = ops.IndexStore.channel(spark, root, "proj_stats").head()
    assert(st2.getAs[Int]("k") == 16 &&
      st2.getAs[Long]("n_vecs") == raw.count() + nB,
      s"post-reproject folds must extend the new identity: $st2")
    assert(ops.IndexStore.projectedAnnFromStore(spark, root, q)
      .collect().nonEmpty, "the appended store must serve at the new width")
  }

  test("reprojectVectors is the migration path off a FOREIGN sign derivation — it reads only the derivation-free fidelity layer") {
    val root = tmp("reprojheal")
    val raw = Core.table(spark, dir, "embeddings").limit(50)
      .localCheckpoint()
    ops.IndexStore.writeProjections(spark, root,
      ops.Similarity.projectedUnitsOf(raw, 32),
      ops.Similarity.exactVecsOf(raw))
    // tamper: a proj_stats recording a sign table this build does not
    // derive (the projection-identity test's skew idiom)
    val stDir = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(d => new java.io.File(d, "proj_stats"))
      .filter(_.isDirectory).head
    val orig = spark.read.parquet(stDir.toString).collect().head
    ops.IndexStore.deleteRec(stDir)
    Seq((orig.getAs[Int]("k"), orig.getAs[Int]("d"),
        orig.getAs[String]("scheme"), "00112233445566778899aabbccddeeff",
        orig.getAs[Long]("n_vecs")))
      .toDF("k", "d", "scheme", "sign_fp", "n_vecs")
      .coalesce(1).write.parquet(stDir.toString)
    val q = ops.Similarity.queryBatch(spark, dir, raw)
      .select($"vec_id", $"embedding").limit(3)
    intercept[IllegalArgumentException] {
      ops.IndexStore.projectedAnnFromStore(spark, root, q).collect()
    }
    // the heal: re-derive under THIS build's identity (same width) —
    // exact_vecs carries no derivation, so nothing refuses
    ops.IndexStore.reprojectVectors(spark, root, 32)
    assert(ops.IndexStore.projectedAnnFromStore(spark, root, q)
      .collect().nonEmpty, "the re-derived store must serve again")
  }

  test("a proj-carrying store REFUSES an append without raw embeddings; a bare store refuses a raw it cannot maintain") {
    val vecs = ops.Similarity.normalized(spark, dir)
    val raw = Core.table(spark, dir, "embeddings")
    val cents = ops.Similarity.ivfCentroids(spark, dir)
    val root = tmp("projrefuse")
    val rawEven = raw.filter($"vec_id" % 2 === 0)
    ops.IndexStore.writeVectors(spark, vecs.filter($"vec_id" % 2 === 0),
      cents, root)
    ops.IndexStore.writeProjections(spark, root,
      ops.Similarity.projectedUnitsOf(rawEven, 32),
      ops.Similarity.exactVecsOf(rawEven))
    val e = intercept[IllegalArgumentException] {
      ops.IndexStore.appendVectors(spark, root,
        vecs.filter($"vec_id" % 2 === 1))
    }
    assert(e.getMessage.contains("STALE") &&
      e.getMessage.contains("projected"),
      s"refusal must name the staleness hazard, got: ${e.getMessage}")
    // and the inverse: raw on a store with no projected channels is a
    // silently-unmet expectation — refused by name
    val bare = tmp("bare")
    ops.IndexStore.writeVectors(spark, vecs.filter($"vec_id" % 2 === 0),
      cents, bare)
    val e2 = intercept[IllegalArgumentException] {
      ops.IndexStore.appendVectors(spark, bare,
        vecs.filter($"vec_id" % 2 === 1),
        raw = Some(raw.filter($"vec_id" % 2 === 1)))
    }
    assert(e2.getMessage.contains("proj_stats"),
      s"refusal must name the missing channel, got: ${e2.getMessage}")
    // a mismatched (batch, raw) pairing would commit the two arms over
    // different corpora — refused before a byte lands
    val e3 = intercept[IllegalArgumentException] {
      ops.IndexStore.appendVectors(spark, root,
        vecs.filter($"vec_id" % 2 === 1),
        raw = Some(raw.filter($"vec_id" % 4 === 1)))
    }
    assert(e3.getMessage.contains("vec_ids"),
      s"refusal must name the skewed pairing, got: ${e3.getMessage}")
  }

  test("a stale projected channel (cells advanced by a writer that cannot maintain it) is REFUSED by name, never served") {
    // the write paths that could once produce staleness are themselves
    // closed: a proj-carrying unified store now REFUSES a
    // vector-carrying fold without raw embeddings (r11, the
    // appendVectors contract on the single-pointer family) — pinned
    // first. The read-time coverage gate still matters for stores an
    // OLDER writer advanced (a build without the raw contract); that
    // skew is simulated the way the identity test simulates a foreign
    // sign table, and must refuse with both coverage counts.
    val raw = Core.table(spark, dir, "embeddings")
    val vecs = ops.Similarity.normalized(spark, dir)
    val docs = Core.table(spark, dir, "documents")
    val cents = ops.Similarity.ivfCentroids(spark, dir)
    val root = tmp("projstale")
    ops.IndexStore.writeUnified(spark, docs.filter($"doc_id" % 2 === 0),
      vecs.filter($"vec_id" % 2 === 0), cents, root)
    val rawEven = raw.filter($"vec_id" % 2 === 0)
    ops.IndexStore.writeProjections(spark, root,
      ops.Similarity.projectedUnitsOf(rawEven, 32),
      ops.Similarity.exactVecsOf(rawEven))
    // the serving pair is fresh here: the projected read works
    val q = ops.Similarity.queryBatch(spark, dir, raw)
      .select($"vec_id", $"embedding")
    assert(ops.IndexStore.projectedAnnFromStore(spark, root, q).count() > 0)
    // the one-sided vectors catch-up that USED to rot the channels is
    // refused at write time now — the store never goes stale this way
    val ew = intercept[IllegalArgumentException] {
      ops.IndexStore.appendUnified(spark, root,
        docs.filter(lit(false)).select($"doc_id", $"text"),
        vecs.filter($"vec_id" % 2 === 1))
    }
    assert(ew.getMessage.contains("STALE") &&
      ew.getMessage.contains("projected"),
      s"unified write-time refusal must name the staleness hazard, got: ${ew.getMessage}")
    // simulate the OLDER writer: vec_stats advanced to the full corpus
    // without proj deltas (exactly what a pre-contract appendUnified
    // committed) — the read must refuse with both counts
    val (nEven, nAll) = (vecs.filter($"vec_id" % 2 === 0).count(), vecs.count())
    val stDir = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(d => new java.io.File(d, "vec_stats"))
      .filter(_.isDirectory).head
    val orig = spark.read.parquet(stDir.toString).collect().head
    ops.IndexStore.deleteRec(stDir)
    Seq((nAll, orig.getAs[Long]("k"), orig.getAs[Long]("n_at_train")))
      .toDF("n_vecs", "k", "n_at_train")
      .coalesce(1).write.parquet(stDir.toString)
    val e = intercept[IllegalArgumentException] {
      ops.IndexStore.projectedAnnFromStore(spark, root, q).collect()
    }
    assert(e.getMessage.contains("STALE") &&
      e.getMessage.contains(nEven.toString) &&
      e.getMessage.contains(nAll.toString),
      s"refusal must name both coverage counts ($nEven vs $nAll), " +
        s"got: ${e.getMessage}")
  }
}
