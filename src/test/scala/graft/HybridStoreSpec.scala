package graft

import org.apache.spark.sql.functions._

/** Store-fed hybrid retrieval (catalog q142): RRF fusion of the two
  * individually-pinned store lookups — lexical from the postings
  * channel (q139's route, oracle-proven ≡ corpus scoring), semantic
  * from the IVF channel (q140's route, pinned ≡ the session ANN).
  * q142 has no oracle (the semantic side inherits q39's float-trained
  * centroids), so these pins carry its correctness: the fusion
  * arithmetic and rank assembly against a driver-side recomputation,
  * and the lexical ranks against the session hybrid (q115). */
class HybridStoreSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  // Core.rnd4 mirrored driver-side: floor(x*10000 + 0.5)/10000
  private def rnd4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000.0

  test("q142 ≡ driver-side RRF fusion of the two pinned store lookups") {
    val got = SparkEntry.queries("q142_hybrid_store")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val minId = Core.table(spark, dir, "documents")
      .agg(min($"doc_id")).head().getLong(0)
    // lexical top-100 from the store lookup, self excluded, ranked by
    // (rnd4'd score desc, doc_id) — the same cut q142 applies
    val lex = ops.IndexStore.bm25FromStore(spark,
        ops.TextOps.textStore(spark, dir), ops.TextOps.qtermsOf(spark, dir))
      .filter($"doc_id" =!= minId)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
      .sortBy { case (id, sc) => (-sc, id) }.take(100)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    // semantic top-100 from the store lookup (self excluded inside)
    val qv = ops.Similarity.normalized(spark, dir)
      .filter($"vec_id" === minId).select($"vec_id", $"unit")
    val sem = ops.IndexStore.annFromStore(spark,
        ops.Similarity.vectorStore(spark, dir), qv, nprobe = 4, k = 100)
      .collect()
      .map(r => (r.getAs[Long]("vid"), r.getAs[Int]("rn").toLong)).toMap
    val want = (lex.keySet ++ sem.keySet).toSeq.map { id =>
      val l = lex.getOrElse(id, 0L)
      val sr = sem.getOrElse(id, 0L)
      val rrf = rnd4((if (l > 0) 1.0 / (60 + l) else 0.0) +
        (if (sr > 0) 1.0 / (60 + sr) else 0.0))
      (id, l, sr, rrf)
    }.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(20)
    assert(got.nonEmpty && got == want,
      s"q142 diverges from recomputed fusion:\n  got=${got.take(5)}\n  want=${want.take(5)}")
  }

  test("docs in both top-20s carry identical lexical ranks in q142 and q115") {
    def lexRanks(q: String): Map[Long, Long] =
      SparkEntry.queries(q)(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).filter(_._2 > 0).toMap
    val store = lexRanks("q142_hybrid_store")
    val session = lexRanks("q115_hybrid_rrf")
    val shared = store.keySet & session.keySet
    assert(shared.nonEmpty,
      "no lexically-ranked doc shared between store and session top-20s")
    val diverged = shared.filter(id => store(id) != session(id))
    assert(diverged.isEmpty,
      s"lexical ranks diverge between store and session hybrid: " +
        diverged.map(id => s"$id: ${store(id)} vs ${session(id)}").mkString(", "))
  }

  test("q145 batch hybrid: per-qid output ≡ the single pinned route, bit-equal") {
    val got = SparkEntry.queries("q145_hybrid_batch_store")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    val qids = ops.Similarity.queryBatch(spark, dir,
        ops.Similarity.normalized(spark, dir))
      .select($"vec_id").orderBy($"vec_id").limit(2).as[Long].collect().toSeq
    val terms = Seq(
      ops.TextOps.qtermsOfExtreme(spark, dir, useMax = false),
      ops.TextOps.qtermsOfExtreme(spark, dir, useMax = true))
    val tSnap = ops.IndexStore.history(ops.TextOps.textStore(spark, dir)).last
    val vSnap = ops.IndexStore.history(ops.Similarity.vectorStore(spark, dir)).last
    assert(qids.size == 2 && got.map(_._1).distinct.sorted == qids.sorted)
    for ((qid, ts) <- qids.zip(terms)) {
      val single = ops.Similarity.hybridSingleAt(spark, dir, tSnap, vSnap, qid, ts)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      val batch = got.filter(_._1 == qid)
        .map { case (_, d, l, sr, f) => (d, l, sr, f) }
      assert(single.nonEmpty && batch == single,
        s"qid $qid: batch route diverges from single pinned route:\n" +
          s"  batch=${batch.take(5)}\n  single=${single.take(5)}")
    }
  }

  test("q160 projected-arm batch: fusion ≡ driver-side recompute from the two pinned lookups; lexical ranks ≡ q145's") {
    val got = SparkEntry.queries("q160_hybrid_projected_batch")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    val qids = ops.Similarity.queryBatch(spark, dir,
        ops.Similarity.normalized(spark, dir))
      .select($"vec_id").orderBy($"vec_id").limit(2).as[Long].collect().toSeq
    val terms = Seq(
      ops.TextOps.qtermsOfExtreme(spark, dir, useMax = false),
      ops.TextOps.qtermsOfExtreme(spark, dir, useMax = true))
    val tRoot = ops.TextOps.textStore(spark, dir)
    val vRoot = ops.Similarity.vectorStore(spark, dir)
    val tSnap = ops.IndexStore.history(tRoot).last
    val vSnap = ops.IndexStore.history(vRoot).last
    val qframe = qids.zip(terms)
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .distinct.toDF("qid", "term")
    val exclude = qids.map(q => (q, q)).toDF("qid", "self_id")
    val lexm = ops.IndexStore.bm25BatchFromStoreAt(spark, tRoot, tSnap,
        qframe, k = 100, exclude = Some(exclude)).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc_id")) ->
        r.getAs[Int]("rank").toLong).toMap
    val semm = ops.IndexStore.projectedAnnFromStoreAt(spark, vRoot, vSnap,
        Core.table(spark, dir, "embeddings")
          .filter($"vec_id".isin(qids: _*)).select($"vec_id", $"embedding"),
        k = 100).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vid")) ->
        r.getAs[Int]("rn").toLong).toMap
    val keys = lexm.keySet ++ semm.keySet
    val want = qids.sorted.flatMap { qid =>
      keys.filter(_._1 == qid).toSeq.map { case k @ (_, id) =>
        val l = lexm.getOrElse(k, 0L)
        val sr = semm.getOrElse(k, 0L)
        val rrf = rnd4((if (l > 0) 1.0 / (60 + l) else 0.0) +
          (if (sr > 0) 1.0 / (60 + sr) else 0.0))
        (qid, id, l, sr, rrf)
      }.sortBy { case (_, id, _, _, rrf) => (-rrf, id) }.take(20)
    }
    assert(got.nonEmpty && got == want,
      s"q160 diverges from recomputed projected-arm fusion:\n" +
        s"  got=${got.take(5)}\n  want=${want.take(5)}")
    // the lexical side is q145's read verbatim — shared docs must
    // carry identical lexical ranks across the two semantic arms
    val q145lex = SparkEntry.queries("q145_hybrid_batch_store")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .filter(_._2 > 0).toMap
    val q160lex = got.map { case (q, d, l, _, _) => (q, d) -> l }
      .filter(_._2 > 0).toMap
    val shared = q145lex.keySet & q160lex.keySet
    assert(shared.nonEmpty, "no lexically-ranked doc shared between the two arms")
    val diverged = shared.filter(k => q145lex(k) != q160lex(k))
    assert(diverged.isEmpty,
      s"lexical ranks diverge between IVF-arm and projected-arm batches: $diverged")
  }

  test("paired-version pinning: a concurrent append cannot tear a pinned hybrid read") {
    // own tiny stores (never the session-memoized ones — appends here
    // must not pollute other suites)
    val tIdx = java.nio.file.Files.createTempDirectory("graft-hyb-t").toString
    val vIdx = java.nio.file.Files.createTempDirectory("graft-hyb-v").toString
    val docs = Seq(1L -> "alpha beta gamma", 2L -> "beta gamma delta delta",
      3L -> "unrelated words entirely").toDF("doc_id", "text")
    ops.IndexStore.writeText(spark, docs, tIdx)
    def unitAt(t: Double) = Seq(math.cos(t), math.sin(t))
    val vecs = (1 to 12).map(i => (i.toLong, "l", unitAt(i * 0.5)))
      .toDF("vec_id", "label", "unit")
    val cents = Seq((0L, unitAt(0)), (1L, unitAt(2)), (2L, unitAt(4)))
      .toDF("cid", "cvec")
    ops.IndexStore.writeVectors(spark, vecs, cents, vIdx)
    // resolve the version PAIR once — the route contract under test
    val tSnap = ops.IndexStore.history(tIdx).last
    val vSnap = ops.IndexStore.history(vIdx).last
    val terms = Seq("beta", "gamma")
    val qv = vecs.filter($"vec_id" === 1L).select($"vec_id", $"unit")
    val lex1 = ops.IndexStore.bm25FromStoreAt(spark, tIdx, tSnap, terms)
      .collect().toSeq
    // a rival ingest lands BETWEEN the lexical and semantic reads —
    // exactly the window that tore the round-7 route
    ops.IndexStore.appendText(spark, tIdx,
      Seq(9L -> "beta beta gamma gamma beta").toDF("doc_id", "text"))
    ops.IndexStore.appendVectors(spark, vIdx,
      Seq((99L, "l", unitAt(0.51))).toDF("vec_id", "label", "unit"))
    val sem1 = ops.IndexStore.annFromStoreAt(spark, vIdx, vSnap, qv, 4, 5)
      .collect().toSeq
    // the pinned pair still answers from the pre-append state on BOTH
    // sides: re-reads at the pinned versions are bit-identical...
    assert(ops.IndexStore.bm25FromStoreAt(spark, tIdx, tSnap, terms)
      .collect().toSeq == lex1, "pinned lexical read moved under the append")
    assert(sem1.forall(_.getLong(2) != 99L),
      "pinned semantic read saw the rival's vector")
    // ...while the LIVE routes see the rival's folds (the pin is doing
    // real work, not reading a store that never changed)
    assert(ops.IndexStore.bm25FromStore(spark, tIdx, terms)
      .collect().toSeq != lex1, "live lexical lookup should see the append")
    assert(ops.IndexStore.annFromStore(spark, vIdx, qv, 4, 5)
      .collect().exists(_.getLong(2) == 99L),
      "live semantic lookup should see the appended vector")
  }
}
