package graft

import org.apache.spark.sql.SaveMode

/** Dedup + similarity behavior tests: known near-duplicates must be
  * found; fast paths must agree with exact paths. */
class DedupSimSpec extends SparkSpec {
  import spark.implicits._

  /** Write a documents-shaped table into a temp dir so catalog
    * queries (which read `$dir/documents.parquet`) can run on it. */
  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  private val base = "the quick brown fox jumps over the lazy dog and runs far away " * 3

  /** Deterministic high-entropy payload (LCG chars): distinct 4-gram
    * count tracks the length, like real media bytes — what the
    * byte-shingle SimHash fixtures need. */
  private def noisyPayload(seed: Long, len: Int): String = {
    var x = seed
    val sb = new StringBuilder
    for (_ <- 0 until len) {
      x = x * 6364136223846793005L + 1442695040888963407L
      sb += ('a' + math.floorMod(x >>> 33, 26L).toInt).toChar
    }
    sb.toString
  }

  test("minhash LSH finds a known near-duplicate pair and skips unrelated docs") {
    val dir = docsDir(Seq(
      1L -> base,
      2L -> (base + "banana"),                    // near-dup of 1 (jaccard ≈ 0.87)
      3L -> "completely different content about spark partitions and shuffles galore"))
    val pairs = SparkEntry.queries("q31_minhash_lsh_pairs")(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("lshPairsFast (xxhash64 production path) recovers the oracle-exact pairs") {
    // same banding, different base hash family — bucket contents may
    // differ, but true near-dups share ~all shingles so their minhash
    // signatures collide under ANY uniform hash. Pin recall against
    // the md5 (oracle) pairs on the real corpus and check the
    // candidate set doesn't explode.
    val dir = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("q31_minhash_lsh_pairs")(spark, dir)
      .as[(Long, Long)].collect().toSet
    val fast = ops.Dedup.lshPairsFast(spark, dir)
      .as[(Long, Long)].collect().toSet
    val recall = exact.count(fast.contains).toDouble / exact.size.max(1)
    assert(recall >= 0.8, s"fast path recovered $recall of ${exact.size} md5-LSH pairs")
    assert(fast.size <= exact.size * 2 + 8,
      s"fast candidate set exploded: ${fast.size} vs ${exact.size}")
    // and the synthetic planted near-dup is found too
    val sdir = docsDir(Seq(
      1L -> base,
      2L -> (base + "banana"),
      3L -> "completely different content about spark partitions and shuffles galore"))
    val planted = ops.Dedup.lshPairsFast(spark, sdir).as[(Long, Long)].collect().toSet
    assert(planted.contains((1L, 2L)) && !planted.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard scores the near-dup pair high") {
    val dir = docsDir(Seq(
      1L -> base,
      2L -> (base + "banana"),
      3L -> "completely different content about spark partitions and shuffles galore"))
    val j = SparkEntry.queries("q32_ngram_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) > 0.7)
  }

  test("exact dedup collapses identical texts to min doc_id") {
    val dir = docsDir(Seq(1L -> "same text", 5L -> "same text", 9L -> "other"))
    val rows = SparkEntry.queries("q30_exact_dedup")(spark, dir)
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(rows == Map(1L -> 2L, 9L -> 1L))
  }

  test("simhash of identical texts is identical, different texts differ") {
    val dir = docsDir(Seq(1L -> base, 2L -> base,
      3L -> "completely different content about spark partitions and shuffles"))
    val h = SparkEntry.queries("q33_simhash")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L))
    assert(h(1L) != h(3L))
  }

  test("knn_fast agrees with knn_exact on neighbor sets (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    def neighbors(q: String) =
      SparkEntry.queries(q)(spark, dir)
        .select("qid", "vid").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = neighbors("q35_knn_exact")
    val fast = neighbors("q36_knn_fast")
    assert(exact.keySet == fast.keySet)
    // identical top-5 sets (float path could tie-flip at equal cos; exact data has none)
    assert(exact.forall { case (k, v) => fast(k) == v })
  }

  test("ann_ivf: recall@5 against exact kNN is usable, cos values valid") {
    val dir = "/root/testdata/sf0.001"
    def sets(q: String) = SparkEntry.queries(q)(spark, dir)
      .select("qid", "vid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = sets("q35_knn_exact")
    val ivf = sets("q39_ann_ivf")
    assert(ivf.nonEmpty)
    val recalls = exact.keys.toSeq.map { q =>
      val hit = ivf.getOrElse(q, Set.empty)
      (exact(q) & hit).size.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"mean recall@5 too low: $mean")
  }

  test("knn_projected: exact rerank of the JL candidates recovers the exact top-5 with high recall") {
    val dir = "/root/testdata/sf0.001"
    def sets(q: String) = SparkEntry.queries(q)(spark, dir)
      .select("qid", "vid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = sets("q35_knn_exact")
    val proj = sets("q155_knn_projected")
    assert(proj.nonEmpty && proj.keySet == exact.keySet,
      "projected ANN must answer every query in the batch")
    // every answered neighbor carries the EXACT cosine (the rerank is
    // q35's decimal arithmetic on the candidate set), so any recall
    // gap is attributable to the 64→16 projection alone
    // measured k-ladder on this fixture: 16-d coarse 0.54, 32-d 0.72
    // — rising with k exactly as JL's ε ∝ 1/√k predicts. The fixture
    // is ADVERSARIAL (iid-random 64-d embeddings, so top-5 cosine
    // gaps are razor-thin and no sketch ranks them well — the IVF pin
    // below sits at 0.4 for the same reason); real embedding
    // manifolds have far lower intrinsic dimension. Pin below the
    // 32-d measurement.
    val recalls = exact.keys.toSeq.map { q =>
      (exact(q) & proj(q)).size.toDouble / exact(q).size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@5 through the 32-d coarse pass too low: $mean")
    // and the candidate stage is genuinely bounded: per query at most
    // 100 candidates reach the rerank, so the fine pass never scales
    // with the corpus — asserted on the candidate frame ITSELF, not
    // the post-rerank top-5 (which is ≤5 by construction)
    val units = graft.ops.Similarity.projectedUnits(spark, dir)
    val qp = graft.ops.Similarity.queryBatch(spark, dir, units)
      .select($"vec_id".as("qid"), $"punit".as("qp"))
    val candCounts = graft.ops.Similarity
      .projectedCandidates(spark, units, qp)
      .groupBy("qid").count().select("count").as[Long].collect()
    assert(candCounts.nonEmpty && candCounts.forall(_ <= 100),
      "coarse stage must cap candidates at 100 per query")
    val counts = SparkEntry.queries("q155_knn_projected")(spark, dir)
      .groupBy("qid").count().select("count").as[Long].collect()
    assert(counts.forall(_ <= 5), "per-query output must stay top-5")
  }

  test("projected-ANN recall ladder on a CLUSTERED fixture: the correlated geometry real corpora exercise") {
    // VERDICT r9 next #6: the ≥0.6 pin above runs on the adversarial
    // iid fixture (razor-thin cosine gaps — the worst case for any
    // sketch). Real embedding corpora are CLUSTERED (low intrinsic
    // dimension), and JL projections behave differently there: the
    // between-cluster structure survives far narrower k. This fixture
    // plants 20 Gaussian clusters in 64-d (fixed seed — deterministic)
    // and runs the PRODUCTION stage functions (projectedUnitsOf /
    // projectQueries / projectedCandidates / exactRerank) at k = 16
    // and 32, pinning the measured ladder so the geometry real users
    // get is regression-gated alongside the iid pin.
    // Measured ladder on this fixture (SCALE.md): 16-d ≈ 0.95+,
    // 32-d ≈ 0.99+ vs iid's 0.54 / 0.72 — pins sit below measurement.
    // 200 vectors per cluster — DELIBERATELY larger than the coarse
    // stage's kCand = 100, so candidate selection must rank WITHIN a
    // cluster, not just separate clusters (at ≤ kCand members per
    // cluster the candidate set trivially contains the whole cluster
    // and recall pins at 1.0 regardless of k)
    val n = 2000; val d = 64; val nClusters = 10
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(nClusters, d)(rnd.nextGaussian())
    val raw = (0 until n).map { i =>
      val ctr = centers(i % nClusters)
      (i.toLong, s"c${i % nClusters}",
        ctr.map(x => (x + 0.4 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "label", "embedding").cache()
    val queries = raw.filter($"vec_id" % 40 === 0)
      .select($"vec_id", $"embedding")
    val corpus = graft.ops.Similarity.exactVecsOf(raw).cache()
    val qe = graft.ops.Similarity.exactQueries(spark, queries)
    def top5(cand: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      graft.ops.Similarity.exactRerank(cand, corpus, qe)
        .select($"qid", $"vid").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // ground truth: the exact rerank over ALL (qid, vid) pairs
    val allPairs = queries.select($"vec_id".as("qid"))
      .crossJoin(raw.select($"vec_id".as("vid")))
      .filter($"qid" =!= $"vid")
    val exact = top5(allPairs)
    assert(exact.size == n / 40, "fixture degenerate: missing queries")
    def recallAt(k: Int): Double = {
      val cand = graft.ops.Similarity.projectedCandidates(spark,
        graft.ops.Similarity.projectedUnitsOf(raw, k),
        graft.ops.Similarity.projectQueries(spark, queries, k))
      val proj = top5(cand)
      val rs = exact.keys.toSeq.map { q =>
        (exact(q) & proj.getOrElse(q, Set.empty)).size.toDouble / exact(q).size }
      rs.sum / rs.size
    }
    val (r16, r32) = (recallAt(16), recallAt(32))
    info(s"clustered-fixture recall@5 ladder: 16-d $r16, 32-d $r32")
    assert(r16 >= 0.85,
      s"16-d recall@5 on clustered geometry too low: $r16 (iid worst-case is 0.54; clustered must be far better)")
    assert(r32 >= 0.9 && r32 >= r16 - 0.02,
      s"32-d recall@5 must stay high and not fall below 16-d: r32=$r32 r16=$r16")
    raw.unpersist(); corpus.unpersist()
  }

  test("ann_lsh returns true neighbors: every hit is in the exact top set or close") {
    val dir = "/root/testdata/sf0.001"
    val ann = SparkEntry.queries("q37_ann_lsh")(spark, dir)
    // sanity: produces some candidates and cos values are valid
    val rows = ann.select("cos").as[Double].collect()
    assert(rows.nonEmpty && rows.forall(c => c >= -1.0001 && c <= 1.0001))
  }

  test("multi-probe LSH recall dominates single-probe and recovers cross-plane neighbors") {
    val dir = "/root/testdata/sf0.001"
    def sets(q: String) = SparkEntry.queries(q)(spark, dir)
      .select("qid", "vid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = sets("q35_knn_exact")
    val single = sets("q37_ann_lsh")
    val multi = sets("q68_ann_multiprobe")
    def meanRecall(ann: Map[Long, Set[Long]]) = {
      val rs = exact.keys.toSeq.map { q =>
        (exact(q) & ann.getOrElse(q, Set.empty)).size.toDouble / exact(q).size
      }
      rs.sum / rs.size
    }
    val (rs, rm) = (meanRecall(single), meanRecall(multi))
    info(s"mean recall@5: single-probe $rs, multi-probe $rm")
    assert(rm >= rs, s"multi-probe recall $rm must not trail single-probe $rs")
    // 8-bit signatures over 500 near-uniform vectors put ~2 vectors in
    // a bucket — Hamming-1 probing reaches ~18 of 500 candidates, so
    // the honest bar at this SF is a strict improvement plus a floor
    // proportional to single-probe, not a large absolute recall (the
    // knob for absolute recall is candidate volume: more probes or
    // fewer planes; recall grows with bucket coverage, measured here)
    assert(rm >= math.max(0.08, rs), s"multi-probe mean recall@5 too low: $rm (single $rs)")
    // multi-probe must actually widen coverage: strictly more distinct
    // (query, hit) pairs than single-probe overall
    val nS = single.values.map(_.size).sum
    val nM = multi.values.map(_.size).sum
    assert(nM > nS, s"multi-probe returned no extra candidates ($nM vs $nS)")
  }

  test("q72 semantic dedup: exact precision vs brute-force within-cell truth, bounded recall") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val Thresh = 0.3
    val out = SparkEntry.queries("q72_semantic_dedup")(spark, dir)
      .select("vec_id", "cid", "dup_of")
      .as[(Long, Long, Option[Long])].collect()
    // one row per corpus vector, each in exactly one cell
    val n = Core.table(spark, dir, "embeddings").count()
    assert(out.length == n && out.map(_._1).distinct.length == n)
    val cellOf = out.map(r => r._1 -> r._2).toMap
    // brute-force ground truth from raw parquet floats + the output's cells
    val units = Core.table(spark, dir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, e) =>
        val d = e.map(_.toDouble).toArray
        val nrm = math.sqrt(d.map(x => x * x).sum)
        id -> d.map(_ / nrm)
      }.toMap
    def cos(a: Long, b: Long): Double = units(a).zip(units(b)).map(p => p._1 * p._2).sum
    val ids = units.keys.toSeq.sorted
    val truth = for {
      i <- ids; j <- ids if i < j
      if cellOf(i) == cellOf(j) && cos(i, j) >= Thresh
    } yield (i, j)
    val truthDups = truth.map(_._2).toSet
    // precision is EXACT: every marked vector has a same-cell
    // smaller-id partner above threshold (1e-6 guards float-fold order
    // at the threshold boundary — none of the test pairs sit there)
    out.collect { case (v, c, Some(keeper)) => (v, c, keeper) }.foreach { case (v, c, keeper) =>
      assert(keeper < v && cellOf(keeper) == c, s"$v kept by $keeper outside its cell")
      assert(cos(keeper, v) >= Thresh - 1e-6, s"pair ($keeper,$v) below threshold")
      assert(truthDups.contains(v), s"$v marked dup but not in ground truth")
    }
    // recall: the banded prune may miss weak (cos≈0.3) pairs — the
    // knob is band width; at this SF assert a nonzero floor
    val marked = out.collect { case (v, _, Some(_)) => v }.toSet
    assert(truthDups.isEmpty || marked.nonEmpty, "prune found nothing despite true dups")
    val recall = if (truthDups.isEmpty) 1.0
      else marked.count(truthDups).toDouble / truthDups.size
    info(s"within-cell dup recall: $recall over ${truthDups.size} true dups")
    assert(recall >= 0.05, s"recall collapsed: $recall")
  }

  test("q71 incremental dedup agrees with the pairwise LSH and exact-hash views") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q71_incremental_dedup")(spark, dir)
      .select("doc_id", "exact_dup", "near_dup").as[(Long, Int, Int)].collect()
    val incoming = out.map(_._1).toSet
    val nearFlag = out.filter(_._3 == 1).map(_._1).toSet
    // independent near-dup view: q31's full pair list restricted to
    // (incoming, existing) pairs must flag exactly the near_dup set
    val pairs = SparkEntry.queries("q31_minhash_lsh_pairs")(spark, dir)
      .as[(Long, Long)].collect()
    val expectNear = pairs.flatMap { case (a, b) =>
      (incoming.contains(a), incoming.contains(b)) match {
        case (true, false) => Some(a)
        case (false, true) => Some(b)
        case _             => None
      }
    }.toSet
    assert(nearFlag == expectNear,
      s"near_dup mismatch: flagged ${nearFlag.size}, pairwise view ${expectNear.size}")
    // independent exact view: md5(text) collisions against the existing side
    val th = Core.table(spark, dir, "documents")
      .select($"doc_id", md5($"text").as("t")).as[(Long, String)].collect()
    val existingT = th.filterNot(r => incoming.contains(r._1)).map(_._2).toSet
    val expectExact = th.filter(r => incoming.contains(r._1) && existingT(r._2)).map(_._1).toSet
    assert(out.filter(_._2 == 1).map(_._1).toSet == expectExact)
  }

  test("connectedComponents labels each doc with its component's min id") {
    import org.apache.spark.sql.functions.lit
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).toDF("doc_id")
    // components: {1,2,3,4} (chain), {5,6}, {9} singleton
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val got = ops.Dedup.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L))
    assert(lit(1) != null) // keep import used
  }

  test("connectedComponents converges on deep chains (star contraction's worst case)") {
    // a 4096-node path is the adversarial shape for star contraction
    // (near-dup graphs are shallow cliques; this guards the general
    // contract): it must still reach the star-forest fixed point
    // within the maxIter budget — the implementation fails loudly
    // rather than mislabel if it doesn't. Descending ids exercise the
    // orientation logic; interleaved ids break id-order locality.
    val n = 4096
    val nodes = (0 until n).map(i => (i * 7919L) % (n * 8)).toDF("doc_id")
    val ids = (0 until n).map(i => (i * 7919L) % (n * 8))
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq.toDF("id_a", "id_b")
    val got = ops.Dedup.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect()
    val mn = ids.min
    assert(got.length == n && got.forall(_._2 == mn),
      s"all $n chain nodes must share cluster_id=$mn")
  }

  test("GraftExtensions injects SQL functions at session build (no manual register)") {
    // the suite session is built with .withExtensions(new GraftExtensions)
    // — these resolve through the injected builders
    val r = spark.sql(
      """SELECT rolling_hash('ab') AS h,
         dot_exact(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
         size(word_shingles('a b c d', 3)) AS n""").head()
    assert(r.getLong(0) == 'a'.toLong * 31 + 'b'.toLong)
    assert(r.getDouble(1) == 11.0)
    assert(r.getInt(2) == 2)
  }

  test("bloom_agg/bloom_contains: no false negatives; q81 equals the exact anti-join") {
    // membership sketch over A probed with A: every probe MUST hit
    // (the soundness q81's prefilter correctness rests on)
    val misses = spark.sql(
      """WITH a AS (SELECT cast(id * 7 as string) AS k FROM range(2000))
         SELECT count(*) FROM a
         WHERE NOT bloom_contains((SELECT bloom_agg(xxhash64(k), 2000L) FROM a),
           xxhash64(k))""").head().getLong(0)
    assert(misses == 0, s"bloom produced $misses false negatives")
    // disjoint probe set: false-positive rate stays a prefilter, not a pass-through
    val fp = spark.sql(
      """WITH a AS (SELECT cast(id * 7 as string) AS k FROM range(2000)),
              b AS (SELECT cast(id * 7 + 1 as string) AS k FROM range(2000))
         SELECT count(*) FROM b
         WHERE bloom_contains((SELECT bloom_agg(xxhash64(k), 2000L) FROM a),
           xxhash64(k))""").head().getLong(0)
    assert(fp < 400, s"bloom FP rate ${fp / 2000.0} too high to prune anything")
    // q81's sketch-accelerated screen == the plain exact anti-join
    import org.apache.spark.sql.functions.{conv, substring, md5}
    val dir = "/root/testdata/sf0.001"
    val got = graft.ops.Dedup.catalog("q81_bloom_screen").fn(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    val docs = Core.table(spark, dir, "documents")
    val gate = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10).cast("long")
    val fps = docs.select($"doc_id", gate.as("g"), md5($"text").as("fp"))
    val expect = fps.filter($"g" >= 58982)
      .join(fps.filter($"g" < 58982).select($"fp"), Seq("fp"), "left_anti")
      .select($"doc_id").as[Long].collect().toSet
    assert(got == expect, s"bloom screen ${got.size} vs exact ${expect.size}")
  }

  test("IndexStore: stored-index screen reproduces q71's decisions with no corpus access") {
    import org.apache.spark.sql.functions.{conv, substring, md5}
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-index").toString
    val docs = Core.table(spark, dir, "documents")
    val gate = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10).cast("long")
    val existing = docs.filter(gate < 58982)
    val incoming = docs.filter(gate >= 58982)
    graft.ops.IndexStore.write(spark, existing, out)
    // the screen reads ONLY the persisted artifacts
    val got = graft.ops.IndexStore.screenBatch(spark, out, incoming)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val expect = graft.ops.Dedup.catalog("q71_incremental_dedup").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got.sameElements(expect),
      s"stored-index decisions diverge: got ${got.take(5).toSeq} vs ${expect.take(5).toSeq}")
    // the bloom artifact is small enough to broadcast (one literal)
    val bloomLen = java.nio.file.Files.size(
      graft.ops.IndexStore.bloomBlob(out).get)
    assert(bloomLen > 0 && bloomLen < 10 * 1024 * 1024, s"bloom blob $bloomLen bytes")
  }

  test("IndexStore sim channel: stored-index screen equals direct batch×corpus Hamming≤3") {
    import org.apache.spark.sql.functions.{conv, substring, md5, lower => slower}
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-simidx").toString
    val docs = Core.table(spark, dir, "documents")
    val gate = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10).cast("long")
    val existing = docs.filter(gate < 58982)
    val incoming = docs.filter(gate >= 58982)
    graft.ops.IndexStore.write(spark, existing, out)
    val got = graft.ops.IndexStore.screenBatchSim(spark, out, incoming)
      .as[Long].collect().toSet
    // driver-side truth: 60-bit simhash per doc, brute-force
    // batch × corpus Hamming ≤ 3
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sim60(txt: String): Long = {
      val ws = txt.split(" ", -1).filter(_.nonEmpty).distinct
      val hs = ws.map(md5hex)
      var sim = 0L
      for (d <- 0 until 15; b <- 0 until 4)
        if (2 * hs.count(h => ((Integer.parseInt(h.substring(d, d + 1), 16) >> b) & 1) == 1)
            >= ws.length) sim |= 1L << (d * 4 + b)
      sim
    }
    val ex = existing.select($"doc_id", slower($"text")).as[(Long, String)]
      .collect().map { case (_, t) => sim60(t) }
    val want = incoming.select($"doc_id", slower($"text")).as[(Long, String)]
      .collect().filter { case (_, t) =>
        val s = sim60(t); ex.exists(c => java.lang.Long.bitCount(s ^ c) <= 3)
      }.map(_._1).toSet
    assert(got == want, s"sim screen ${got.size} vs brute force ${want.size}")
    Core.clearCaches(spark)
  }

  test("EliminateRedundantDistinct removes array_distinct over word_shingles") {
    val df = spark.sql(
      "SELECT array_distinct(word_shingles('a b c d a b c d', 3)) AS s")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("array_distinct"),
      s"redundant distinct survived optimization:\n$optimized")
    // semantics preserved: still distinct
    val s = df.as[Seq[String]].head()
    assert(s.distinct == s && s.contains("a b c"))
  }

  test("rolling_hash custom expression: codegen result matches reference impl and SQL path") {
    graft.functions.RollingHash.register(spark)
    val df = Seq("", "a", "hello world", "привет мир").toDF("s")
    val got = df.select(graft.functions.RollingHash.rolling_hash($"s")).as[Long].collect()
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))
    assert(got.sameElements(Array("", "a", "hello world", "привет мир").map(ref)))
    val viaSql = spark.sql("SELECT rolling_hash('hello world')").as[Long].head()
    assert(viaSql == ref("hello world"))
  }

  test("q88 canonical dedup: stopword-insensitive grouping, one keeper per group") {
    import org.apache.spark.sql.functions._
    // two docs identical up to stopwords + whitespace must share a
    // canon group; a genuinely different doc must not
    val dir = docsDir(Seq(
      1L -> "the quick brown fox jumps",
      2L -> "quick brown  fox the jumps",
      3L -> "a quick brown fox jumps",
      4L -> "slow green turtle walks on"))
    val got = ops.Dedup.catalog("q88_canonical_dedup").fn(spark, dir)
      .select($"doc_id", $"canon_md5", $"keep")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    val byCanon = got.groupBy(_._2)
    assert(got(0)._2 == got(1)._2 && got(1)._2 == got(2)._2,
      "stopword/whitespace variants must share a canonical group")
    assert(got(3)._2 != got(0)._2)
    // exactly one keeper per canonical group, and it is the min doc_id
    byCanon.values.foreach { g =>
      assert(g.count(_._3 == 1) == 1)
      assert(g.minBy(_._1)._3 == 1)
    }
    // on the real corpus: every doc appears once; exact-text dups
    // (q30's groups) always land in the same canonical group
    val real = "/root/testdata/sf0.001"
    val rows = ops.Dedup.catalog("q88_canonical_dedup").fn(spark, real)
    assert(rows.count() == Core.table(spark, real, "documents").count())
    val coarser = Core.table(spark, real, "documents")
      .join(rows.select($"doc_id", $"canon_md5"), "doc_id")
      .groupBy($"text").agg(countDistinct($"canon_md5").as("k"))
      .filter($"k" > 1).count()
    assert(coarser == 0, "identical texts must share a canonical group")
  }

  test("q102 cluster-safe split: no dedup cluster ever straddles a split boundary") {
    val real = "/root/testdata/sf0.001"
    // recompute the per-doc assignment the q102 report aggregates: the
    // gate must be a pure function of cluster_id, so every member of a
    // cluster lands in the same split — THE leakage guarantee
    val labels = SparkEntry.queries("q45_dedup_clusters")(spark, real)
    import org.apache.spark.sql.functions._
    val gate = conv(substring(md5($"cluster_id".cast("string")), 1, 4), 16, 10).cast("long")
    val split = when(gate < 52429L, "train").when(gate < 58982L, "val").otherwise("test")
    val straddlers = labels.select($"cluster_id", split.as("split"))
      .groupBy($"cluster_id").agg(countDistinct($"split").as("k"))
      .filter($"k" > 1).count()
    assert(straddlers == 0, "cluster members must move between splits together")
    // and the q90-style per-doc gate would NOT give that guarantee on a
    // corpus with near-dup clusters — q102's reason to exist: some
    // multi-doc cluster must exist in the fixture for the test to bite
    val multi = labels.groupBy($"cluster_id").count().filter($"count" > 1).count()
    assert(multi > 0, "fixture must contain at least one multi-doc cluster")
    // the report itself is consistent: n_docs sums to the corpus size
    val rep = SparkEntry.queries("q102_cluster_safe_split")(spark, real)
    val total = rep.agg(sum($"n_docs")).as[Long].head()
    assert(total == Core.table(spark, real, "documents").count())
  }

  test("q112 duplicate spans: a shared passage yields exact maximal spans in both docs") {
    // 10-word passage shared by docs 1 and 2; doc 3 is all-unique;
    // doc 4 repeats an 8-gram WITHIN itself (self-duplication counts)
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val octet = "k1 k2 k3 k4 k5 k6 k7 k8"
    val dir = docsDir(Seq(
      1L -> s"u1 u2 u3 $shared v1 v2 v3",          // span = words 3..12
      2L -> s"w1 $shared x1 x2 x3 x4",             // span = words 1..10
      3L -> "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12",
      4L -> s"$octet m1 m2 m3 m4 m5 m6 m7 m8 m9 $octet")) // spans 0..7 and 17..24
    Core.clearCaches(spark)
    val spans = SparkEntry.queries("q112_duplicate_spans")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set(
      (1L, 3L, 12L, 10L), (2L, 1L, 10L, 10L),
      (4L, 0L, 7L, 8L), (4L, 17L, 24L, 8L)))
    Core.clearCaches(spark)
  }

  test("q113 span scrub: cutting the spans leaves exactly the non-duplicated words") {
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val dir = docsDir(Seq(
      1L -> s"u1 u2 u3 $shared v1 v2 v3",
      2L -> s"w1 $shared x1 x2 x3 x4",
      3L -> "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12"))
    Core.clearCaches(spark)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = SparkEntry.queries("q113_span_scrub")(spark, dir)
      .as[(Long, Int, Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 16, 6L, 10L, md5hex("u1 u2 u3 v1 v2 v3")),
      (2L, 15, 5L, 10L, md5hex("w1 x1 x2 x3 x4")),
      (3L, 12, 12L, 0L, md5hex("z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12"))))
    Core.clearCaches(spark)
  }

  test("q115 hybrid RRF: fused scores are exactly the rank-reciprocal sums; both modalities contribute") {
    val dir = "/root/testdata/sf0.001"
    Core.clearCaches(spark)
    val rows = SparkEntry.queries("q115_hybrid_rrf")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length == 20)
    // rrf is a pure function of the emitted ranks (0 = absent modality)
    rows.foreach { case (id, l, sm, rrf) =>
      val want = (if (l > 0) 1.0 / (60 + l) else 0.0) +
        (if (sm > 0) 1.0 / (60 + sm) else 0.0)
      assert(rrf == math.floor(want * 10000 + 0.5) / 10000.0,
        s"doc $id: rrf $rrf != f(lex=$l, sem=$sm)")
    }
    // emitted in rank order, and the fusion actually mixes modalities:
    // docs retrieved by BOTH channels must outrank single-channel docs
    // with comparable ranks, and both channels appear in the top-20
    assert(rows.sliding(2).forall { case Array(a, b) => a._4 >= b._4 })
    assert(rows.exists(_._2 > 0) && rows.exists(_._3 > 0),
      "both lexical and semantic ranks must appear in the fused top-20")
  }

  test("q133 containment: a contained doc reads 1.0 in its container while jaccard stays lower") {
    // trim: base's trailing space would otherwise put an empty-token
    // shingle in doc 1 that the suffixed doc 2 lacks
    val small = base.trim
    val dir = docsDir(Seq(
      1L -> small,                 // contained whole in 2 (2 = 1 + suffix,
      2L -> (small + " banana"),   // the LSH-caught near-twin shape)
      3L -> "unrelated words about shuffle partitions and codegen stages here"))
    Core.clearCaches(spark)
    val got = SparkEntry.queries("q133_containment")(spark, dir)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    def shingles(t: String): Set[String] = {
      val ws = t.toLowerCase.split(" ", -1)
      (0 to ws.length - 3).map(i => ws.slice(i, i + 3).mkString(" ")).toSet
    }
    val (sa, sb) = (shingles(small), shingles(small + " banana"))
    val inter = (sa & sb).size
    assert(got.keySet == Set((1L, 2L)))
    // doc 1 is a prefix of doc 2: every shingle of 1 appears in 2
    assert(got((1L, 2L))._1 == 1.0, "contained doc must read containment 1.0")
    assert(got((1L, 2L))._2 ==
      math.floor(inter.toDouble / sb.size * 10000 + 0.5) / 10000.0)
    assert(got((1L, 2L))._2 < 1.0, "the container is not contained")
    Core.clearCaches(spark)
  }

  test("q128 simhash join: pigeonhole candidates find EVERY Hamming≤3 pair (brute-force complete)") {
    val dir = "/root/testdata/sf0.001"
    Core.clearCaches(spark)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // driver-side 60-bit simhash, same contract as the query
    val sims = Core.table(spark, dir, "documents")
      .select($"doc_id", org.apache.spark.sql.functions.lower($"text"))
      .as[(Long, String)].collect()
      .map { case (id, txt) =>
        val ws = txt.split(" ", -1).filter(_.nonEmpty).distinct
        val hs = ws.map(md5hex)
        var sim = 0L
        for (d <- 0 until 15; b <- 0 until 4) {
          val ones = hs.count(h => ((Integer.parseInt(h.substring(d, d + 1), 16) >> b) & 1) == 1)
          if (2 * ones >= ws.length) sim |= 1L << (d * 4 + b)
        }
        id -> sim
      }.sortBy(_._1)
    val want = (for {
      i <- sims.indices; j <- (i + 1) until sims.length
      h = java.lang.Long.bitCount(sims(i)._2 ^ sims(j)._2) if h <= 3
    } yield (sims(i)._1, sims(j)._1, h.toLong)).toSet
    val got = SparkEntry.queries("q128_simhash_join")(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want,
      s"pigeonhole join must equal brute force (got ${got.size}, want ${want.size})")
    Core.clearCaches(spark)
  }

  test("q132 IVF hard negatives: usable recall of q123's exact pairs, labels always differ") {
    val dir = "/root/testdata/sf0.001"
    Core.clearCaches(spark)
    val exact = SparkEntry.queries("q123_hard_negatives")(spark, dir)
      .select($"qid", $"vid").as[(Long, Long)].collect().toSet
    val rows = SparkEntry.queries("q132_hard_negatives_ivf")(spark, dir)
      .as[(Long, Int, Int, Long, Int, Double)].collect()
    rows.foreach { case (qid, ql, _, vid, nl, _) =>
      assert(ql != nl, s"anchor $qid got same-label negative $vid") }
    val ivf = rows.map(r => (r._1, r._4)).toSet
    // same tiny-scale bound policy as q39's recall spec: nprobe cells
    // over a ~200-vector corpus are noisy; the probe measures the
    // real-scale curve
    val recall = (exact & ivf).size.toDouble / exact.size.max(1)
    assert(recall >= 0.4, s"IVF route recovered $recall of q123's exact negatives")
    Core.clearCaches(spark)
  }

  test("q127 entity resolution: near-twins cluster, longest record survives, singletons self-represent") {
    val dir = docsDir(Seq(
      1L -> base,
      2L -> (base + "banana"),            // near-dup of 1, longer
      3L -> (base + "banana split"),      // near-dup of both, longest
      4L -> "totally unrelated content about catalyst partition pruning strategies"))
    Core.clearCaches(spark)
    val rows = SparkEntry.queries("q127_entity_resolution")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (d, c, r, n) => d -> ((c, r, n)) }.toMap
    // docs 1-3 form one cluster labeled by its min member; the
    // SURVIVING record is the longest (doc 3), not the label
    assert(rows(1L) == ((1L, 3L, 3L)) && rows(2L) == ((1L, 3L, 3L))
      && rows(3L) == ((1L, 3L, 3L)))
    assert(rows(4L) == ((4L, 4L, 1L)), "singleton represents itself")
    Core.clearCaches(spark)
  }

  test("q123 hard negatives: labels always differ, ranks dense, per-anchor order, full anchor set") {
    val dir = "/root/testdata/sf0.001"
    Core.clearCaches(spark)
    val rows = SparkEntry.queries("q123_hard_negatives")(spark, dir)
      .as[(Long, Int, Int, Long, Int, Double)].collect()
    rows.foreach { case (qid, ql, _, vid, nl, _) =>
      assert(ql != nl, s"anchor $qid got same-label negative $vid") }
    val byQ = rows.groupBy(_._1)
    // every % 50 anchor appears with exactly 3 dense, cosine-ordered ranks
    val emb = Core.table(spark, dir, "embeddings")
      .select($"vec_id").as[Long].collect()
    assert(byQ.keySet == emb.filter(_ % 50 == 0).toSet)
    byQ.values.foreach { rs =>
      assert(rs.map(_._3).sorted.toSeq == Seq(1, 2, 3))
      val ordered = rs.sortBy(_._3).map(_._6)
      assert(ordered.sliding(2).forall { case Array(a, b) => a >= b })
    }
    Core.clearCaches(spark)
  }

  test("q117 winnowing: engine fingerprints equal a brute-force robust-winnow reference") {
    val dir = "/root/testdata/sf0.001"
    Core.clearCaches(spark)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def gh(g: String): Long = java.lang.Long.parseLong(md5hex(g).substring(0, 15), 16)
    val docs = Core.table(spark, dir, "documents")
      .select($"doc_id", org.apache.spark.sql.functions.lower($"text"))
      .as[(Long, String)].collect()
    val want = docs.flatMap { case (id, txt) =>
      val ws = txt.split(" ", -1) // keep empty tokens, like string_split
      val grams = (0 to ws.length - 5).map(i => (i, gh(ws.slice(i, i + 5).mkString(" "))))
      // robust winnow, W=4: per window keep min of gh*1e6-pos (BigInt —
      // the product overflows Long), i.e. min hash with rightmost ties
      (0 to grams.length - 4).map { s =>
        grams.slice(s, s + 4).minBy { case (p, h) => BigInt(h) * 1000000 - p }
      }.distinct.map { case (p, h) => (id, p.toLong, h) }
    }.toSet
    val got = SparkEntry.queries("q117_winnow_fingerprints")(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want, "winnowing selection must match the reference exactly")
    Core.clearCaches(spark)
  }

  test("q117 winnowing guarantee: docs sharing a k+w-1 word run share a fingerprint hash") {
    // the Schleimer et al. match guarantee: any shared run of at least
    // WinK+WinW-1 = 8 words produces at least one IDENTICAL selected
    // (hash) fingerprint in both docs — the property that makes
    // fingerprint-equality joins a sound dedup channel
    val shared = "golf hotel india juliet kilo lima mike november"
    val dir = docsDir(Seq(
      1L -> s"a1 a2 a3 $shared z9",
      2L -> s"b1 $shared c1 c2 c3 c4",
      3L -> "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"))
    Core.clearCaches(spark)
    val fps = SparkEntry.queries("q117_winnow_fingerprints")(spark, dir)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "docs sharing an 8-word run must share a winnowing fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "no shared fingerprints without shared content")
    Core.clearCaches(spark)
  }

  test("q120 sorted neighborhood: prefix-sorted near-twins found with exact jaccard, others rejected") {
    val dir = docsDir(Seq(
      1L -> base,
      2L -> (base + "banana"),   // same normalized 24-char prefix → adjacent in sort
      3L -> "zebra zulu zigzag zephyr zodiac zoom zone zonal zest zinc zing zip",
      4L -> "apple apricot avocado almond anise arugula asparagus artichoke azuki aubergine"))
    Core.clearCaches(spark)
    val got = SparkEntry.queries("q120_sorted_neighborhood")(spark, dir)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    // driver-side truth for the (1,2) jaccard over distinct 3-shingles
    def shingles(t: String): Set[String] = {
      val ws = t.toLowerCase.split(" ", -1)
      (0 to ws.length - 3).map(i => ws.slice(i, i + 3).mkString(" ")).toSet
    }
    val (sa, sb) = (shingles(base), shingles(base + "banana"))
    val inter = (sa & sb).size
    val wantJ = math.floor(
      inter.toDouble / (sa.size + sb.size - inter) * 10000 + 0.5) / 10000.0
    assert(got.keySet == Set((1L, 2L)),
      "only the near-twin pair passes the 0.5 jaccard gate")
    assert(got((1L, 2L)) == wantJ)
    Core.clearCaches(spark)
  }

  test("q116 pagerank: engine ranks equal an exact driver-side integer-mass reference") {
    val dir = "/root/testdata/sf0.001"
    Core.clearCaches(spark)
    val pairs = SparkEntry.queries("q31_minhash_lsh_pairs")(spark, dir)
      .as[(Long, Long)].collect()
    val docs = Core.table(spark, dir, "documents")
      .select($"doc_id").as[Long].collect().sorted
    // reference: same integer-mass contract as the engine (T = 1e9,
    // truncating division, dangling mass redistributed uniformly)
    val T = 1000000000L
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val n = docs.length.toLong
    var r = docs.map(_ -> T).toMap
    for (_ <- 1 to 10) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum }
      val dm = docs.filterNot(deg.contains).map(r).sum
      r = docs.map(d => d ->
        (T * 15 / 100 + 85 * (contrib.getOrElse(d, 0L) + dm / n) / 100)).toMap
    }
    val got = SparkEntry.queries("q116_pagerank")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got == r, "engine pagerank must match the integer reference exactly")
    // and the structure is meaningful: every duplicated doc outranks
    // the isolated-doc rank floor (teleport + dangling share only)
    val floor = got.view.filterKeys(d => !deg.contains(d)).values.toSet
    assert(floor.size == 1, "all isolated docs share one rank")
    val linked = got.view.filterKeys(deg.contains).values
    assert(linked.nonEmpty && linked.min > floor.head,
      "linked docs must outrank the isolated floor")
    Core.clearCaches(spark)
  }

  test("store-fed containment and governance report equal the catalog queries") {
    // the cold-session operational route: write the index once, then
    // derive the pair-consuming reports from the parquet artifacts —
    // outputs must be bit-identical to the memo-fed catalog spellings
    val dir = "/root/testdata/sf0.001"
    val idx = java.nio.file.Files.createTempDirectory("graft-idx").toString
    ops.IndexStore.write(spark, Core.table(spark, dir, "documents"), idx)
    val catC = SparkEntry.queries("q133_containment")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val storeC = ops.IndexStore.containmentFromStore(spark, dir, idx)
      .collect().map(_.toSeq).toSeq
    assert(catC.nonEmpty && storeC == catC,
      "store-fed containment diverged from the catalog query")
    val catR = SparkEntry.queries("q129_dedup_report")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val storeR = ops.IndexStore.reportFromStore(spark, dir, idx)
      .collect().map(_.toSeq).toSeq
    assert(catR.nonEmpty && storeR == catR,
      "store-fed governance report diverged from the catalog query")
  }

  test("incremental cluster maintenance equals the full-corpus recompute") {
    // write the index + labels for the md5-gated corpus slice, merge
    // the remaining docs as a batch, and require the combined labels
    // to be bit-identical to clustering everything from scratch (the
    // oracle-checked q45 on the whole dir) — including clusters that
    // MERGE through a bridging batch doc
    import org.apache.spark.sql.functions.{conv, substring, md5 => smd5}
    val dir = "/root/testdata/sf0.001"
    val docs = Core.table(spark, dir, "documents")
    val gate = conv(substring(smd5($"doc_id".cast("string")), 1, 4), 16, 10).cast("long")
    val corpus = docs.filter(gate < 58982L)
    val batch = docs.filter(gate >= 58982L)
    val idx = java.nio.file.Files.createTempDirectory("graft-incc").toString
    ops.IndexStore.write(spark, corpus, idx)
    ops.IndexStore.writeClusters(spark, corpus, idx)
    val inc = ops.IndexStore.incrementalClusters(spark, idx, batch)
      .as[(Long, Long)].collect().toMap
    val full = SparkEntry.queries("q45_dedup_clusters")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(inc.nonEmpty && inc == full,
      s"incremental labels diverged on ${inc.toSet.diff(full.toSet).take(5)}")
  }

  test("prefix-filtered set-similarity join equals the brute-force all-pairs spelling") {
    // q138's completeness claim, pinned engine-internally (the DuckDB
    // oracle already brute-forces it cross-engine): the df-ordered
    // prefix-index join must produce EXACTLY the pairs an unpruned
    // all-shingles self-join produces, and the prefix must actually
    // prune (≈0.4n + 1 shingles kept per doc at τ = 0.6)
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("q138_set_similarity_join")(spark, dir)
      .collect().toSeq
    graft.functions.WordShingles.register(spark)
    val toks = Core.table(spark, dir, "documents").select($"doc_id",
      explode(array_distinct(
        graft.functions.WordShingles.word_shingles(lower($"text"), 3))).as("w"))
    val sizes = toks.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val brute = toks.as("a")
      .join(toks.as("b"), $"a.w" === $"b.w" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select($"doc_id".as("id_a"), $"n".as("na")), Seq("id_a"))
      .join(sizes.select($"doc_id".as("id_b"), $"n".as("nb")), Seq("id_b"))
      .filter(lit(8) * $"inter" >= lit(3) * ($"na" + $"nb"))
      .select($"id_a", $"id_b", $"inter", ($"na" + $"nb" - $"inter").as("un"))
      .orderBy($"id_a", $"id_b").collect().toSeq
    assert(got.nonEmpty && got == brute,
      s"prefix-filtered join diverged from brute force (${got.size} vs ${brute.size} rows)")
    // pruning really prunes: per-doc prefix length is n − ceil(0.6n) + 1
    val kept = sizes.select(sum($"n" - expr("(3*n + 4) div 5") + 1)).head().getLong(0)
    val total = sizes.select(sum($"n")).head().getLong(0)
    assert(kept * 2 < total, s"prefix kept $kept of $total shingles — not pruning")
  }

  test("q138 candidate-bound gate refuses with the measured bound under a tiny budget") {
    // the regime detector as CODE (SCALE.md described it as prose
    // through round 6): Σ C(prefix-df, 2) is measured BEFORE the
    // candidate join, and past the budget the operator refuses citing
    // the bound — it never starts the shuffle
    val dir = docsDir(Seq(
      1L -> base, 2L -> (base + " banana"), 3L -> (base + " cherry")))
    spark.conf.set("graft.ppjoin.maxCandidates", "1")
    try {
      val e = intercept[IllegalStateException] {
        SparkEntry.queries("q138_set_similarity_join")(spark, dir).count()
      }
      assert(e.getMessage.contains("candidate bound") &&
        e.getMessage.contains("exceeds graft.ppjoin.maxCandidates = 1") &&
        e.getMessage.matches("(?s).*= \\d+ exceeds.*"),
        s"gate error must cite the measured bound: ${e.getMessage}")
    } finally spark.conf.unset("graft.ppjoin.maxCandidates")
    // under the default budget the same corpus passes (the twins ARE
    // found) — the gate only fires in the explosion regime
    assert(SparkEntry.queries("q138_set_similarity_join")(spark, dir).count() >= 1)
  }

  test("q141 byte-shingle payload near-dup: planted twins found, strangers rejected") {
    // content-level multimodal dedup: the fingerprint reads the BYTES
    // of the payload (here text cast to binary, as in q50/q51), so a
    // payload re-encoded with a slightly different tail is a twin while
    // an unrelated payload of similar length is not. The fixture
    // payloads are HIGH-ENTROPY (distinct 4-gram count ~ length, like
    // real media bytes): majority-vote SimHash needs the perturbation
    // to be a small FRACTION of the distinct shingles — a repeated
    // phrase would concentrate the whole payload into ~60 shingles and
    // make a 1-byte tail edit a 6% distribution shift
    val dir = docsDir(Seq(
      1L -> noisyPayload(7919L, 900),
      2L -> (noisyPayload(7919L, 900) + "xyz"), // tail-perturbed byte twin
      3L -> noisyPayload(104729L, 900)))
    val got = SparkEntry.queries("q141_multimodal_neardup")(spark, dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), s"payload twin pair missing from $got")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L), s"stranger flagged: $got")
    // spec-pin the semantics behind the no_oracle entry: the pair set
    // equals a driver-side brute force over the same fingerprints
    graft.functions.ByteSimHash60.register(spark)
    val sims = Core.table(spark, dir, "documents")
      .select($"doc_id", graft.functions.ByteSimHash60
        .byte_sim_hash60($"text".cast("binary"), 4).as("sim"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, sa) <- sims; (b, sb) <- sims if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    assert(got == brute, s"pigeonhole pairs $got != brute-force $brute")
  }

  test("media channel: stored byte-fingerprint screen flags payload twins only, append maintains") {
    def payloads(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text").select($"doc_id", $"text".cast("binary").as("payload"))
    val corpus = Seq(1L -> noisyPayload(7919L, 900), 3L -> noisyPayload(104729L, 900))
    val out = java.nio.file.Files.createTempDirectory("graft-media").toString
    ops.IndexStore.writeMedia(spark, payloads(corpus), out)
    val probe = Seq(10L -> (noisyPayload(7919L, 900) + "y"), // byte twin of stored doc 1
      11L -> noisyPayload(31337L, 900))
    val flagged = ops.IndexStore.screenBatchMedia(spark, out, payloads(probe))
      .as[Long].collect().toSet
    assert(flagged == Set(10L), s"media screen flagged $flagged, want {10}")
    // fold the novel payload in; a twin of IT now flags too — the
    // channel is append-maintained like its word-level sibling
    ops.IndexStore.appendMedia(spark, out, payloads(probe.filter(_._1 == 11L)))
    val flagged2 = ops.IndexStore.screenBatchMedia(spark, out,
      payloads(Seq(20L -> (probe(1)._2 + "z")))).as[Long].collect().toSet
    assert(flagged2 == Set(20L), s"twin of appended payload not flagged: $flagged2")
    // an exact redelivery of the same batch is an idempotent no-op
    // (at-least-once micro-batch replay) — no new snapshot committed.
    // The replayed batch ALSO carries a sub-window payload (2 bytes <
    // the 4-byte shingle window): it produces no fingerprint and is
    // never stored, so the guard must judge overlap on the
    // FINGERPRINTABLE rows only — counting it would misread the exact
    // replay as partial overlap and wedge the stream
    val hist = ops.IndexStore.history(out)
    val replay = payloads(probe.filter(_._1 == 11L) ++ Seq(12L -> "xy"))
    ops.IndexStore.appendMedia(spark, out, replay)
    assert(ops.IndexStore.history(out) == hist,
      "exact replay must not commit a new snapshot")
    ops.IndexStore.appendMedia(spark, out, replay) // and again
    assert(ops.IndexStore.history(out) == hist)
    // a PARTIAL overlap (one stored id + one new) is a screening bug
    // and still fails loudly
    intercept[IllegalArgumentException] {
      ops.IndexStore.appendMedia(spark, out, payloads(Seq(
        11L -> noisyPayload(31337L, 900), 12L -> noisyPayload(65537L, 900))))
    }
  }

  test("IndexStore.append makes the store observation-equivalent to a fresh full write") {
    // build a store on the corpus slice, append the batch, and compare
    // every channel + both screen decisions against a store written
    // fresh over corpus ∪ batch
    import org.apache.spark.sql.functions.{conv, substring, md5 => smd5}
    val dir = "/root/testdata/sf0.001"
    val docs = Core.table(spark, dir, "documents")
    val gate = conv(substring(smd5($"doc_id".cast("string")), 1, 4), 16, 10).cast("long")
    val corpus = docs.filter(gate < 58982L)
    val batch = docs.filter(gate >= 58982L)
    val rolled = java.nio.file.Files.createTempDirectory("graft-appA").toString
    val fresh = java.nio.file.Files.createTempDirectory("graft-appB").toString
    ops.IndexStore.write(spark, corpus, rolled)
    ops.IndexStore.writeClusters(spark, corpus, rolled)
    ops.IndexStore.append(spark, rolled, batch)
    ops.IndexStore.write(spark, docs, fresh)
    ops.IndexStore.writeClusters(spark, docs, fresh)
    for (ch <- Seq("band_keys", "fingerprints", "sim_blocks", "cluster_labels")) {
      val a = ops.IndexStore.channel(spark, rolled, ch)
      val b = ops.IndexStore.channel(spark, fresh, ch)
      assert(a.unionByName(b).distinct().count() == b.distinct().count() &&
          a.count() == b.count(),
        s"channel $ch diverged after append")
    }
    // screen decisions over a fresh probe frame must agree exactly
    // (bloom BITS may differ by estItems timing; decisions are exact)
    val probe = docs.limit(200)
    val da = ops.IndexStore.screenBatch(spark, rolled, probe).collect().toSeq
    val db = ops.IndexStore.screenBatch(spark, fresh, probe).collect().toSeq
    assert(da == db, "screenBatch decisions diverged after append")
    val sa = ops.IndexStore.screenBatchSim(spark, rolled, probe).collect().toSeq
    val sb = ops.IndexStore.screenBatchSim(spark, fresh, probe).collect().toSeq
    assert(sa == sb, "screenBatchSim decisions diverged after append")
  }

  test("bloom size gate: a store past graft.bloom.maxItems screens exactly without the blob") {
    // force the gate to 1 item: write must skip the blob, screenBatch
    // must fall back to the plain fingerprint semi-join with decisions
    // identical to a bloom'd store; an append that crosses the gate
    // must REMOVE the now-undersized blob
    import org.apache.spark.sql.functions.{conv, substring, md5 => smd5}
    val dir = "/root/testdata/sf0.001"
    val docs = Core.table(spark, dir, "documents")
    val gate = conv(substring(smd5($"doc_id".cast("string")), 1, 4), 16, 10).cast("long")
    val existing = docs.filter(gate < 58982L)
    val incoming = docs.filter(gate >= 58982L)
    val gated = java.nio.file.Files.createTempDirectory("graft-nobloom").toString
    val bloomed = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    def blob(out: String) = ops.IndexStore.hasChannel(out, "bloom")
    try {
      spark.conf.set("graft.bloom.maxItems", "1")
      ops.IndexStore.write(spark, existing, gated)
      assert(!blob(gated), "blob written past the gate")
      val got = ops.IndexStore.screenBatch(spark, gated, incoming).collect().toSeq
      spark.conf.unset("graft.bloom.maxItems")
      ops.IndexStore.write(spark, existing, bloomed)
      assert(blob(bloomed), "blob missing below the gate")
      val expect = ops.IndexStore.screenBatch(spark, bloomed, incoming).collect().toSeq
      assert(got == expect, "gated screen decisions diverge from the bloom'd store")
      // crossing the gate on append removes the stale undersized blob
      spark.conf.set("graft.bloom.maxItems", "1")
      ops.IndexStore.append(spark, bloomed, incoming)
      assert(!blob(bloomed), "stale blob survived a past-the-gate append")
    } finally spark.conf.unset("graft.bloom.maxItems")
  }

  test("pagerank shuffle spelling equals the broadcast spelling bit-for-bit") {
    // the size gate flips the rank join past PrBroadcastMaxDocs docs;
    // both spellings are exact 64-bit integer arithmetic, so the flip
    // must be invisible in the output
    val dir = "/root/testdata/sf0.001"
    val bc = ops.Dedup.pagerank(spark, dir, forceShuffle = false)
      .as[(Long, Long)].collect().toMap
    val sh = ops.Dedup.pagerank(spark, dir, forceShuffle = true)
      .as[(Long, Long)].collect().toMap
    assert(bc.nonEmpty && sh == bc,
      "forced shuffle rank join diverged from the broadcast spelling")
  }

  test("gram_hashes matches the SQL md5-prefix formulation position by position") {
    graft.functions.GramHashes.register(spark)
    import org.apache.spark.sql.functions._
    val docs = Core.table(spark, "/root/testdata/sf0.001", "documents")
      .filter(size(split(lower($"text"), " ")) >= 8).limit(20)
    // SQL spelling of the same contract: 60-bit md5 prefix per window
    // (sequence(1, n-7) is safe here: the ≥8-word filter keeps n-7 ≥ 1,
    // and Spark's sequence would DESCEND on an empty range)
    val sql = docs.select($"doc_id", posexplode(expr(
      """transform(sequence(1, size(split(lower(text), ' ')) - 7),
         i -> conv(substring(md5(concat_ws(' ', slice(split(lower(text), ' '), i, 8))), 1, 15), 16, 10))"""))
      .as(Seq("pos", "want")))
    val fast = docs.select($"doc_id", posexplode(
      graft.functions.GramHashes.gram_hashes(lower($"text"), 8)).as(Seq("pos", "got")))
    val joined = sql.join(fast, Seq("doc_id", "pos"), "full")
    assert(joined.filter($"want".isNull || $"got".isNull ||
      $"want" =!= $"got".cast("string")).count() == 0)
  }

  test("constant-n SQL functions reject a non-constant or non-integral n clearly") {
    graft.functions.GramHashes.register(spark)
    graft.functions.WordShingles.register(spark)
    val df = Core.table(spark, "/root/testdata/sf0.001", "documents")
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    for (bad <- Seq("gram_hashes(text, n_chars)", "word_shingles(text, n_chars)",
        "gram_hashes(text, 'x')")) {
      val e = intercept[Throwable] { df.selectExpr(bad).schema }
      assert(messages(e).contains("requires a constant integer"),
        s"$bad should fail with the clear message, got: ${messages(e)}")
    }
    // a long literal in int range is accepted (widened, not rejected)
    assert(df.selectExpr("word_shingles(lower(text), 3L) AS s").count() > 0)
  }

  test("snPairs (range-partitioned) equals the global-window reference spelling") {
    // real corpus: many docs spread over all 32 range partitions, so
    // boundary pairs genuinely cross partitions
    val dir = "/root/testdata/sf0.01"
    val ref = ops.Dedup.snCandidatesWindowRef(spark, dir)
      .as[(Long, Long)].collect().toSet
    val fast = ops.Dedup.snPairs(ops.Dedup.snKeyed(spark, dir), 3)
      .as[(Long, Long)].collect().toSet
    assert(ref.nonEmpty && fast == ref,
      s"range-partitioned SN pairs diverge: missing=${(ref -- fast).take(5)} extra=${(fast -- ref).take(5)}")
    // degenerate corpus: fewer docs than shuffle partitions, so most
    // range partitions hold 0–1 rows and the boundary cascade (frame
    // rows pulled through short/empty partitions) carries every pair
    val tiny = docsDir((1 to 8).map(i => i.toLong -> s"doc number $i words ${"x " * i}"))
    val refT = ops.Dedup.snCandidatesWindowRef(spark, tiny).as[(Long, Long)].collect().toSet
    val fastT = ops.Dedup.snPairs(ops.Dedup.snKeyed(spark, tiny), 3).as[(Long, Long)].collect().toSet
    assert(refT.nonEmpty && fastT == refT)
  }

  test("snWindowPairs (small-corpus gate arm) equals the reference spelling") {
    // the ≤ SnWindowMaxDocs arm of the snCandidates size gate: one
    // WindowExec with all three lead()s — must be set-equal to the
    // per-offset reference spelling (and hence, by the pin above, to
    // snPairs: all three spellings interchangeable, gate picks by size)
    val dir = "/root/testdata/sf0.01"
    val ref = ops.Dedup.snCandidatesWindowRef(spark, dir)
      .as[(Long, Long)].collect().toSet
    val gated = ops.Dedup.snWindowPairs(ops.Dedup.snKeyed(spark, dir))
      .as[(Long, Long)].collect().toSet
    assert(ref.nonEmpty && gated == ref,
      s"one-window SN pairs diverge: missing=${(ref -- gated).take(5)} extra=${(gated -- ref).take(5)}")
  }

  test("codedSets dictionary is an exact bijection of the string shingle sets") {
    // the verify-stage int coding (q32/q109/q120/q127/q133) is only
    // legal because the dictionary is a BIJECTION — unlike a hash it
    // can never merge two shingles. Pin the two facts that imply it:
    // per-doc cardinalities survive coding, and the coded corpus uses
    // exactly vocab-size distinct ids (injective on the union).
    val dir = "/root/testdata/sf0.01"
    graft.functions.WordShingles.register(spark)
    val strSets = Core.table(spark, dir, "documents")
      .select($"doc_id",
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.expr("word_shingles(lower(text), 3)")).as("w"))
    val strN = strSets.groupBy($"doc_id")
      .agg(org.apache.spark.sql.functions.countDistinct($"w").as("n_str"))
    val coded = ops.Dedup.codedSets(spark, dir)
    val codedN = coded.select($"doc_id",
      org.apache.spark.sql.functions.size($"ws").as("n_coded"))
    val mismatch = strN.join(codedN, Seq("doc_id"), "full")
      .filter($"n_str".isNull || $"n_coded".isNull || $"n_str" =!= $"n_coded")
      .count()
    assert(mismatch == 0, s"$mismatch docs change cardinality under coding")
    val vocab = strSets.select($"w").distinct().count()
    val ids = coded.select(org.apache.spark.sql.functions.explode($"ws").as("wid"))
      .distinct().count()
    assert(ids == vocab, s"coded ids ($ids) != vocab size ($vocab): not a bijection")
  }

  test("sorted_intersect_count ≡ size(array_intersect) on random sorted sets") {
    // the merge-walk codegen expression is only legal on sorted
    // duplicate-free arrays (codedSets' contract); pin exact equality
    // against the built-in spelling across random set sizes including
    // empty and disjoint arrays
    graft.functions.SortedIntersectCount.register(spark)
    val rnd = new scala.util.Random(42)
    val rows = (1 to 400).map { i =>
      (i.toLong,
        (0 until rnd.nextInt(60)).map(_ => rnd.nextInt(90).toLong)
          .distinct.sorted.toArray)
    }
    val df = rows.toDF("id", "ws")
    val mism = df.as("a").crossJoin(df.as("b"))
      .withColumn("c1",
        org.apache.spark.sql.functions.expr("sorted_intersect_count(a.ws, b.ws)"))
      .withColumn("c2", org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.array_intersect($"a.ws", $"b.ws")))
      .filter($"c1" =!= $"c2").count()
    assert(mism == 0, s"$mism pairs disagree with array_intersect")
  }

  test("kNN query batch cap is not binding at any test SF (oracle stays exact)") {
    // q35's oracle mirrors only the %50 gate; the md5-rank limit
    // (MaxQueryBatch) must therefore never trigger on test fixtures,
    // or engine and oracle silently desynchronize. Assert it for every
    // SF the driver or specs run against.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val n = Core.table(spark, s"/root/testdata/$sf", "embeddings")
        .filter($"vec_id" % 50 === 0).count()
      assert(n < ops.Similarity.MaxQueryBatch,
        s"$sf: ${n} query ids ≥ cap ${ops.Similarity.MaxQueryBatch} — cap now binds, oracle desyncs")
    }
  }

  test("label fold writes batch-proportional DELTAS; resolved labels ≡ full merge across folds and compact") {
    import org.apache.spark.sql.functions.{conv, substring, md5 => smd5}
    val dir = "/root/testdata/sf0.001"
    val docs = Core.table(spark, dir, "documents")
    val gate = conv(substring(smd5($"doc_id".cast("string")), 1, 4), 16, 10).cast("long")
    val c1 = docs.filter(gate < 39321L)
    val b1 = docs.filter(gate >= 39321L && gate < 52428L)
    val b2 = docs.filter(gate >= 52428L)
    val rolled = java.nio.file.Files.createTempDirectory("graft-lblA").toString
    ops.IndexStore.write(spark, c1, rolled)
    ops.IndexStore.writeClusters(spark, c1, rolled)
    def labelPaths(): Seq[String] = {
      val cur = java.nio.file.Files.readString(
        java.nio.file.Paths.get(rolled, "_current")).trim
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        java.nio.file.Files.readString(
          java.nio.file.Paths.get(rolled, cur, "_manifest.json")))
      val it = node.get("channels").get("cluster_labels").get("paths").elements()
      val out = Seq.newBuilder[String]
      while (it.hasNext) out += it.next().asText()
      out.result()
    }
    def resolved(): Map[Long, Long] =
      ops.IndexStore.channel(spark, rolled, "cluster_labels")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = resolved()
    ops.IndexStore.append(spark, rolled, b1)
    val after = resolved()
    // the fold's write is EXACTLY what changed: batch docs + members
    // of clusters the merge relabeled — never the unchanged corpus
    val paths = labelPaths()
    assert(paths.size == 2, s"expected initial + one delta path, got $paths")
    val delta = spark.read.parquet(s"$rolled/${paths.last}")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val expected = after.filter { case (d, l) => before.get(d) != Some(l) }.toSet
    assert(delta == expected,
      s"delta is not the changed-label set: extra=${(delta -- expected).take(5)} missing=${(expected -- delta).take(5)}")
    assert(delta.size < after.size,
      "delta rewrote the corpus-sized artifact (the round-7 weak)")
    // second fold, then the end-to-end pin: resolved labels after two
    // folds ≡ one CC over the full corpus (bit-identical label sets)
    ops.IndexStore.append(spark, rolled, b2)
    assert(labelPaths().size == 3, "second fold must append its own delta")
    val fresh = java.nio.file.Files.createTempDirectory("graft-lblB").toString
    ops.IndexStore.write(spark, docs, fresh)
    ops.IndexStore.writeClusters(spark, docs, fresh)
    val want = ops.IndexStore.channel(spark, fresh, "cluster_labels")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resolved() == want, "rolled labels diverge from full merge")
    // compact collapses the deltas to ONE materialized path; the
    // resolved view is unchanged
    ops.IndexStore.compact(spark, rolled)
    assert(labelPaths().size == 1, "compact must collapse label deltas")
    assert(resolved() == want, "labels changed across compact")
  }

  test("mediaPairsFromStore ≡ q141 pairs over the store corpus, through appends and compact") {
    def payloads(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text").select($"doc_id", $"text".cast("binary").as("payload"))
    val corpus = Seq(1L -> noisyPayload(7919L, 900),
      2L -> (noisyPayload(7919L, 900) + "xyz"), // twin of 1
      3L -> noisyPayload(104729L, 900))
    val batch = Seq(11L -> noisyPayload(31337L, 900),
      12L -> (noisyPayload(31337L, 900) + "q")) // twin of 11
    val out = java.nio.file.Files.createTempDirectory("graft-mediapairs").toString
    ops.IndexStore.writeMedia(spark, payloads(corpus), out)
    ops.IndexStore.appendMedia(spark, out, payloads(batch))
    // the store-fed pair report equals the catalog query run over the
    // same payload corpus — no payload byte is re-read by the store route
    val qdir = docsDir(corpus ++ batch)
    def want = SparkEntry.queries("q141_multimodal_neardup")(spark, qdir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    def got = ops.IndexStore.mediaPairsFromStore(spark, out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val w = want
    assert(w.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (11L, 12L)),
      s"fixture drifted: $w")
    assert(got == w, s"store pairs ${got} != corpus pairs ${w}")
    ops.IndexStore.compact(spark, out)
    assert(got == w, s"store pairs diverged after compact: ${got}")
  }
}
