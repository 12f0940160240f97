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
}
