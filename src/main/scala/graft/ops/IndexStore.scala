package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Core._

/** Persisted corpus-index artifacts — the piece that turns incremental
  * dedup from a session optimization into an OPERATIONAL contract.
  *
  * Within one session the LSH band keys, fingerprints and cluster
  * labels are `Core.memo`-shared; but the 100 TB deployment story
  * (SCALE.md, q71/q81) is "index the corpus ONCE per snapshot, then
  * screen each day's batch against the STORED index in O(batch)".
  * This object is that store:
  *
  *  - `write` materializes the band-key index (partitioned by `band`,
  *    so a screen's band-equi-join prunes to matching band partitions),
  *    the exact-dup fingerprint set, and a Bloom sketch of the
  *    fingerprints (Spark's own `BloomFilterAggregate` bits, one small
  *    binary blob — the broadcastable prefilter of q81).
  *  - `screenBatch` reproduces q71's keep/drop decisions for an
  *    incoming batch using ONLY the stored artifacts — no access to
  *    the original corpus, no recompute. The bloom prunes the exact
  *    screen to sketch hits (no false negatives ⇒ decisions are
  *    exact); the near screen is a semi-join against the stored band
  *    index, shuffling O(batch) band rows.
  *
  * Artifacts are plain parquet + one binary file: readable by any
  * engine, re-writable atomically per snapshot (SaveMode.Overwrite),
  * and append-mergeable for rolling corpora ([[append]]).
  *
  * The bloom is a bounded OPTIMIZATION, not a correctness channel:
  * past `graft.bloom.maxItems` fingerprints (default 64M ≈ a 56 MB
  * blob at the default FPP — the broadcast-literal budget) the blob is
  * not written and [[screenBatch]] falls back to the plain fingerprint
  * semi-join, which is exact and O(batch) regardless. Same size-gate
  * pattern as the PageRank rank join: the optimization has a stated
  * bound and the past-the-bound spelling is code, not prose.
  */
object IndexStore {

  /** Rows a batch screen needs per incoming doc. */
  private def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("fp"))

  /** Fingerprint count above which the bloom blob is skipped. */
  private def bloomMaxItems(s: SparkSession): Long =
    s.conf.getOption("graft.bloom.maxItems").map(_.toLong)
      .getOrElse(64L * 1024 * 1024)

  private def bloomPath(out: String) =
    java.nio.file.Paths.get(s"$out/bloom/fingerprints.bloom")

  /** Aggregate and persist the bloom blob over the fingerprint
    * channel, or REMOVE a stale blob when the corpus has outgrown the
    * gate (a lingering undersized sketch would degrade its FP rate —
    * decisions would stay exact, but the prefilter would stop
    * filtering). */
  private def writeBloom(s: SparkSession, fps: DataFrame, out: String): Unit = {
    val n = math.max(1024L, fps.count())
    if (n <= bloomMaxItems(s)) {
      val bits = fps.selectExpr(s"bloom_agg(xxhash64(fp), ${n}L) AS b")
        .head().getAs[Array[Byte]]("b")
      new java.io.File(s"$out/bloom").mkdirs()
      java.nio.file.Files.write(bloomPath(out), bits)
    } else java.nio.file.Files.deleteIfExists(bloomPath(out))
  }

  /** Persist the dedup index of `docs` under `out`. */
  def write(s: SparkSession, docs: DataFrame, out: String): Unit = {
    graft.functions.BloomFuncs.register(s)
    Dedup.toBandRowsPublic(s, docs)
      .write.mode(SaveMode.Overwrite).partitionBy("band")
      .parquet(s"$out/band_keys")
    val fps = fingerprints(docs)
    fps.write.mode(SaveMode.Overwrite).parquet(s"$out/fingerprints")
    // simhash channel: the 60-bit fingerprint's pigeonhole block rows,
    // partitioned by block so a screen's (b, bv) equi-join prunes to
    // one block partition per probe — catches term-DISTRIBUTION twins
    // (q128's family) that shingle-set banding can miss
    Dedup.simBlocks(Dedup.simhash60(docs))
      .write.mode(SaveMode.Overwrite).partitionBy("b")
      .parquet(s"$out/sim_blocks")
    // one small binary blob: the BloomFilterAggregate sketch over the
    // fingerprint hashes (estItems from a cheap count — this runs once
    // per snapshot, at index-build time, not per screen); skipped past
    // the graft.bloom.maxItems gate
    writeBloom(s, fps, out)
  }

  private def loadBloom(out: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/bloom/fingerprints.bloom"))

  /** q71's decisions for `batch`, from the stored index only:
    * (doc_id, exact_dup, near_dup, decision). Decisions are exact —
    * the bloom is a no-false-negative prefilter, so every true exact
    * dup reaches the fingerprint semi-join and sketch false positives
    * are eliminated there. */
  /** Distribution-level near-dup screen against the stored simhash
    * channel: batch docs whose 60-bit fingerprint sits within Hamming
    * distance 3 of ANY stored corpus fingerprint (q128's semantics,
    * batch × stored-index instead of corpus × corpus). The (b, bv)
    * equi-join probes the block-partitioned store; the exact
    * bit_count verify runs per candidate; output is the flagged
    * batch doc_ids — O(batch × bucket occupancy) work, no corpus
    * access beyond the store. */
  def screenBatchSim(s: SparkSession, indexDir: String, batch: DataFrame): DataFrame = {
    import s.implicits._
    val stored = s.read.parquet(s"$indexDir/sim_blocks")
      .select($"b", $"bv", $"sim".as("corpus_sim"))
    Dedup.simBlocks(Dedup.simhash60(batch))
      .join(stored, Seq("b", "bv"))
      .filter(expr("bit_count(sim ^ corpus_sim) <= 3"))
      .select($"doc_id").distinct()
      .orderBy($"doc_id")
  }

  /** Candidate near-dup pairs reconstructed from the STORED band index
    * alone — the same self-join + distinct as Dedup.lshPairs over the
    * same md5-base band rows, so the pair set is IDENTICAL, but a cold
    * session pays a band-partitioned parquet read instead of
    * re-shingling and re-minhashing the whole corpus. This is the
    * operational input for the pair-consuming reports below: index
    * once per snapshot, report from the artifacts. */
  def pairsFromStore(s: SparkSession, indexDir: String): DataFrame = {
    import s.implicits._
    val b = s.read.parquet(s"$indexDir/band_keys")
    b.as("a").join(b.as("b"),
        $"a.band" === $"b.band" && $"a.band_key" === $"b.band_key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .distinct()
  }

  /** Persist the corpus's near-dup cluster labels next to the index
    * artifacts — one CC contraction at snapshot-build time. This is
    * the state [[incrementalClusters]] maintains per batch, so a
    * rolling corpus never re-clusters itself from scratch. */
  def writeClusters(s: SparkSession, docs: DataFrame, out: String): Unit =
    Dedup.clusterLabelsFor(s, docs)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/cluster_labels")

  /** Merge an incoming batch into the persisted clustering WITHOUT
    * re-clustering the corpus. The contraction insight: an existing
    * cluster can only change by merging with a batch doc (its members
    * are already mutually connected), so CC needs only the SUPERNODE
    * graph — one node per stored cluster id plus the batch docs, with
    * batch↔corpus edges contracted onto the stored cluster label and
    * batch↔batch edges from the usual band self-join. Work is
    * O(batch + clusters) nodes and O(batch-driven edges); the full
    * corpus appears only in the final one-pass label join. Because a
    * stored label IS the min doc_id of its members, the supernode
    * component min equals the full-recompute component min, so the
    * returned (doc_id, cluster_id) frame for corpus ∪ batch is
    * bit-identical to re-running CC on everything (DedupSimSpec pins
    * it against catalog q45). */
  def incrementalClusters(s: SparkSession, indexDir: String,
      batch: DataFrame): DataFrame = {
    import s.implicits._
    val storedBands = s.read.parquet(s"$indexDir/band_keys")
    val storedLabels = s.read.parquet(s"$indexDir/cluster_labels")
    val batchBands = Dedup.toBandRowsPublic(s, batch)
    val crossE = batchBands
      .join(storedBands.select($"doc_id".as("cid"), $"band", $"band_key"),
        Seq("band", "band_key"))
      .join(storedLabels.select($"doc_id".as("cid"), $"cluster_id"), Seq("cid"))
      .select($"doc_id".as("id_a"), $"cluster_id".as("id_b")).distinct()
    val bb = batchBands.as("a").join(batchBands.as("b"),
        $"a.band" === $"b.band" && $"a.band_key" === $"b.band_key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b")).distinct()
    val nodes = batch.select($"doc_id")
      .unionByName(storedLabels.select($"cluster_id".as("doc_id")).distinct())
    val comp = Dedup.connectedComponents(nodes, crossE.unionByName(bb))
    val remap = comp.select($"doc_id".as("old_lbl"), $"cluster_id".as("new_lbl"))
    val corpusPart = storedLabels
      .join(remap, storedLabels("cluster_id") === remap("old_lbl"), "left")
      .select(storedLabels("doc_id"),
        coalesce($"new_lbl", storedLabels("cluster_id")).as("cluster_id"))
    val batchPart = comp.join(batch.select($"doc_id"), Seq("doc_id"), "left_semi")
    corpusPart.unionByName(batchPart.select($"doc_id", $"cluster_id"))
  }

  /** Fold an accepted batch into EVERY store channel in O(batch) work —
    * the rolling-corpus maintenance op that pairs with [[screenBatch]]
    * and [[incrementalClusters]]: screen the day's batch, keep the
    * survivors, append them here; no channel is ever rebuilt from the
    * corpus.
    *
    *  - band_keys / fingerprints / sim_blocks: batch rows appended to
    *    the partitioned parquet dirs (same layout `write` produced).
    *  - cluster_labels (when present): replaced by the
    *    [[incrementalClusters]] merge — the artifact is O(corpus) rows
    *    but producing it is O(batch + clusters) (a label-remap join,
    *    never a re-cluster).
    *  - bloom: re-aggregated from the merged fingerprint CHANNEL — a
    *    scan of (doc_id, fp) rows, no document text — so estItems
    *    tracks the true count and the FP rate stays at its design
    *    point instead of degrading as the corpus grows past the
    *    original sketch's capacity.
    *
    * Not atomic across channels: a crash mid-append leaves some
    * channels ahead of others, which over-reports membership — the
    * SAFE direction for a dedup screen (it over-flags, never silently
    * under-flags; cf. SURVEY §4.3(4) on the reference's silent-loss
    * bug). Production would stage to a fresh snapshot dir and swap the
    * pointer. After append the store is observation-equivalent to
    * `write(corpus ∪ batch)`: DedupSimSpec pins set equality on every
    * parquet channel and decision equality on both screens. */
  def append(s: SparkSession, indexDir: String, batch: DataFrame): Unit = {
    graft.functions.BloomFuncs.register(s)
    // merged labels are computed EAGERLY (localCheckpoint) before any
    // channel mutates: the merge must see the pre-append band index,
    // and the overwrite below may not read the path it replaces
    val mergedLabels =
      if (new java.io.File(s"$indexDir/cluster_labels").exists())
        Some(incrementalClusters(s, indexDir, batch).localCheckpoint())
      else None
    Dedup.toBandRowsPublic(s, batch)
      .write.mode(SaveMode.Append).partitionBy("band")
      .parquet(s"$indexDir/band_keys")
    fingerprints(batch)
      .write.mode(SaveMode.Append).parquet(s"$indexDir/fingerprints")
    Dedup.simBlocks(Dedup.simhash60(batch))
      .write.mode(SaveMode.Append).partitionBy("b")
      .parquet(s"$indexDir/sim_blocks")
    mergedLabels.foreach(_.write.mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/cluster_labels"))
    writeBloom(s, s.read.parquet(s"$indexDir/fingerprints").select(col("fp")),
      indexDir)
  }

  /** q133's containment screen fed from the stored band index: the
    * shingle-set verify still reads the corpus text (it must — the
    * measure is set arithmetic), but the candidate generation that
    * dominated the cold 100× number is now a store read. Output is
    * bit-identical to the catalog query (DedupSimSpec pins it). */
  def containmentFromStore(s: SparkSession, dir: String, indexDir: String): DataFrame =
    Dedup.containmentScreen(s, dir, pairsFromStore(s, indexDir))

  /** q129's governance report fed from the stored band index: cluster
    * labels are contracted (large-star/small-star) from the store's
    * pair graph instead of the session memo. Bit-identical output. */
  def reportFromStore(s: SparkSession, dir: String, indexDir: String): DataFrame =
    Dedup.dedupReportFrom(s,
      Dedup.connectedComponents(
        table(s, dir, "documents").select(col("doc_id")),
        pairsFromStore(s, indexDir)))

  /** Text-retrieval channel: the BM25 postings index as a persisted,
    * append-maintained artifact — the retrieval-family counterpart of
    * the dedup channels above.
    *
    *  - `postings` (doc_id, term, tf, dl): range-partitioned BY TERM
    *    and term-sorted within partitions, so a k-term query's pushed
    *    `In(term, …)` filter prunes parquet row groups via min/max
    *    stats — the lookup reads O(Σ df(query terms)) rows, never the
    *    corpus. (The store-side analog of band-partition pruning: the
    *    channel's physical layout IS the index.) `dl` is DENORMALIZED
    *    into the rows at write time, so scoring needs no doc-length
    *    join at lookup — the Lucene move of storing norms inline with
    *    the postings.
    *  - `doc_lens` (doc_id, dl): the narrow per-doc membership channel
    *    — the append disjointness guard and the stats merge read it;
    *    queries never do.
    *  - `stats`: ONE row (n_docs, sum_dl), written at index build and
    *    merge-updated per append with exact long arithmetic — the same
    *    write-time re-derivation pattern as the bloom channel, so a
    *    lookup's (N, avgdl) is a 1-row read, not a corpus-wide
    *    aggregation.
    *
    * [[appendText]] folds a batch in O(batch): new term-sorted postings
    * files + new doc_lens rows + a 1-row stats merge; per-term df is
    * derived at query time from the pruned postings read, so no stored
    * statistic goes stale. TextIndexSpec pins `writeText(corpus ∪
    * batch)` ≡ `writeText(corpus); appendText(batch)` on every channel
    * (stats included) and on query results. */
  def writeText(s: SparkSession, docs: DataFrame, out: String): Unit =
    writeTextChannels(s, TextOps.postingsFor(docs), out, SaveMode.Overwrite)

  /** O(batch) append to the text channel (same layout as [[writeText]];
    * each append's files are term-sorted internally, so row-group
    * pruning keeps working as files accumulate). The batch must be
    * disjoint from the store — ENFORCED, not assumed: a re-appended
    * doc would silently duplicate postings and inflate df/N/avgdl, so
    * the overlap guard below fails loudly instead (the screened-batch
    * precondition of ingestAndMaintainText, now checked). */
  def appendText(s: SparkSession, indexDir: String, batch: DataFrame): Unit =
    // first append into an empty store bootstraps it (the streaming
    // ingest loop's opening micro-batch) — nothing to guard against
    if (!new java.io.File(s"$indexDir/doc_lens").exists())
      writeText(s, batch, indexDir)
    else {
      val overlap = batch.select(col("doc_id")).distinct()
        .join(s.read.parquet(s"$indexDir/doc_lens"), Seq("doc_id"), "left_semi")
        .count()
      require(overlap == 0,
        s"appendText: $overlap batch doc_id(s) already present in the stored " +
          "doc_lens channel — appends must be pre-screened disjoint batches")
      writeTextChannels(s, TextOps.postingsFor(batch), indexDir, SaveMode.Append)
    }

  private def writeTextChannels(s: SparkSession, postings0: DataFrame,
      out: String, mode: SaveMode): Unit = {
    // one tokenization pass feeds all three channels (the postings
    // plan re-tokenizes the corpus per consumer otherwise — a measured
    // double scan at store-write time)
    val postings = postings0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docLens = postings.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      postings.join(docLens, Seq("doc_id"))
        .repartitionByRange(col("term"), col("doc_id"))
        .sortWithinPartitions(col("term"), col("doc_id"))
        .write.mode(mode).parquet(s"$out/postings")
      docLens.write.mode(mode).parquet(s"$out/doc_lens")
      // stats channel: exact long merge (prior + batch) on append —
      // the 1-row collect is the whole cross-channel coupling
      val b = docLens.agg(count(lit(1)).as("n"), sum(col("dl")).as("sd")).head()
      val (bn, bsd) = (b.getLong(0), if (b.isNullAt(1)) 0L else b.getLong(1))
      val (n, sd) =
        if (mode == SaveMode.Append) {
          val p = s.read.parquet(s"$out/stats").head()
          (p.getAs[Long]("n_docs") + bn, p.getAs[Long]("sum_dl") + bsd)
        } else (bn, bsd)
      import s.implicits._
      Seq((n, sd)).toDF("n_docs", "sum_dl")
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$out/stats")
    } finally { postings.unpersist(); docLens.unpersist() }
  }

  /** BM25 top-ranked docs for driver-known query terms, from the
    * stored channels only — bit-identical scoring to the session route
    * (the TextOps scoring core is shared; TextIndexSpec + the q139
    * oracle pin it): the term-pruned postings read gives per-doc tf,
    * per-doc dl (denormalized at write) AND per-term df; (N, avgdl) is
    * the 1-row stats channel. End to end the lookup touches O(Σ df)
    * postings rows plus one stats row — NEVER the corpus, at any
    * corpus size. */
  def bm25FromStore(s: SparkSession, indexDir: String,
      terms: Seq[String]): DataFrame = {
    import s.implicits._
    val pruned = s.read.parquet(s"$indexDir/postings")
      .filter($"term".isin(terms: _*))
    val stats = s.read.parquet(s"$indexDir/stats")
      .select($"n_docs",
        ($"sum_dl".cast("double") / $"n_docs".cast("double")).as("avgdl"))
    val qdf = pruned.groupBy($"term").agg(count(lit(1)).as("df"))
    TextOps.bm25RankDl(pruned, qdf, stats)
  }

  /** Vector-retrieval channel: the IVF index as a persisted,
    * append-maintained artifact — the third family of the
    * maintained-index tier (dedup bands, text postings, now vectors).
    *
    *  - `centroids` (cid, cvec): the trained k-means model, a tiny
    *    broadcastable table.
    *  - `cells` (vec_id, label, unit), PARTITIONED BY cid: each
    *    vector stored in its inverted-file cell, so an nprobe lookup's
    *    `cid IN (…)` filter prunes at the DIRECTORY level — a query
    *    reads only the probed cells' files, O(nprobe · n/k) rows.
    *
    * [[appendVectors]] assigns a batch to cells under the FROZEN
    * stored centroids (IVF semantics: the model retrains per
    * snapshot, not per batch) and appends O(batch) rows into the
    * partition layout. VectorIndexSpec pins store ≡ session routes
    * and write ≡ write+append. */
  def writeVectors(s: SparkSession, vectors: DataFrame,
      centroids: DataFrame, out: String): Unit = {
    centroids.write.mode(SaveMode.Overwrite).parquet(s"$out/centroids")
    assignCells(vectors, centroids)
      .write.mode(SaveMode.Overwrite).partitionBy("cid")
      .parquet(s"$out/cells")
  }

  /** O(batch) append: assign under the stored centroids, write into
    * the same cid-partitioned layout. Batch vec_ids must be disjoint
    * from the store — ENFORCED (a re-appended vector would silently
    * duplicate ANN candidates), mirroring appendText's guard. */
  def appendVectors(s: SparkSession, indexDir: String,
      batch: DataFrame): Unit = {
    val overlap =
      if (!new java.io.File(s"$indexDir/cells").exists()) 0L
      else batch.select(col("vec_id")).distinct()
        .join(s.read.parquet(s"$indexDir/cells").select(col("vec_id")),
          Seq("vec_id"), "left_semi")
        .count()
    require(overlap == 0,
      s"appendVectors: $overlap batch vec_id(s) already present in the stored " +
        "cells channel — appends must be disjoint batches")
    assignCells(batch, s.read.parquet(s"$indexDir/centroids"))
      .write.mode(SaveMode.Append).partitionBy("cid")
      .parquet(s"$indexDir/cells")
  }

  private def assignCells(vectors: DataFrame, cents: DataFrame): DataFrame = {
    graft.functions.DotProduct.register(vectors.sparkSession)
    Similarity.nearestCell(vectors, cents)
      .join(vectors.select(col("vec_id"), col("label")), Seq("vec_id"))
      .select(col("vec_id"), col("label"), col("unit"), col("cid"))
  }

  /** Top-k cosine ANN for a bounded query batch, answered from the
    * stored channels: probe assignment runs against the broadcast
    * centroids; the probed cell ids are collected (bounded —
    * |queries| × nprobe ints) and pushed as a PARTITION filter on the
    * cells read, so the corpus scan touches only probed directories.
    * Scoring/top-k mirror the session route exactly (same dot, same
    * window), so results are bit-identical to q39 given the same
    * centroids and query batch (VectorIndexSpec pins it). */
  def annFromStore(s: SparkSession, indexDir: String, queries: DataFrame,
      nprobe: Int = 4, k: Int = 5): DataFrame = {
    import s.implicits._
    graft.functions.DotProduct.register(s)
    val cents = s.read.parquet(s"$indexDir/centroids")
    val probed = queries
      .join(broadcast(cents))
      .withColumn("sim", graft.functions.DotProduct.dot_fast($"unit", $"cvec"))
      .withColumn("crn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"vec_id").orderBy($"sim".desc, $"cid")))
      .filter($"crn" <= nprobe)
      .select($"vec_id".as("qid"), $"unit".as("qunit"), $"cid")
      .localCheckpoint()
    val cids = probed.select($"cid").distinct().as[Long].collect()
    val cells = s.read.parquet(s"$indexDir/cells")
      .filter($"cid".isin(cids: _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"cos".desc, $"vid")
    broadcast(probed).join(cells, Seq("cid"))
      .filter($"qid" =!= $"vec_id")
      .withColumn("cos", graft.functions.DotProduct.dot_fast($"qunit", $"unit"))
      .select($"qid", $"vec_id".as("vid"), $"cos")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"qid", $"rn", $"vid", round($"cos", 4).as("cos"))
      .orderBy($"qid", $"rn")
  }

  def screenBatch(s: SparkSession, indexDir: String, batch: DataFrame): DataFrame = {
    import s.implicits._
    graft.functions.BloomFuncs.register(s)
    val bandIdx = s.read.parquet(s"$indexDir/band_keys")
    val fpIdx = s.read.parquet(s"$indexDir/fingerprints").select($"fp")
    val bfp = fingerprints(batch)
    // exact screen: bloom prefilter (narrow, broadcast bits) → exact
    // semi-join only for sketch hits; a store past the
    // graft.bloom.maxItems gate has no blob, and the screen is the
    // plain semi-join — still exact, still O(batch)
    val preFiltered =
      if (java.nio.file.Files.exists(bloomPath(indexDir)))
        bfp.filter(call_function("bloom_contains",
          lit(loadBloom(indexDir)), xxhash64($"fp")))
      else bfp
    val exactHits = preFiltered
      .join(fpIdx, Seq("fp"), "left_semi")
      .select($"doc_id")
    // near screen: incoming band rows semi-join the stored band index
    val nearHits = Dedup.toBandRowsPublic(s, batch)
      .join(bandIdx, Seq("band", "band_key"), "left_semi")
      .select($"doc_id").distinct()
    batch.select($"doc_id")
      .join(exactHits.withColumn("ex", lit(1)), Seq("doc_id"), "left")
      .join(nearHits.withColumn("nr", lit(1)), Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"ex", lit(0)).as("exact_dup"),
        coalesce($"nr", lit(0)).as("near_dup"),
        when($"ex" === 1, "drop_exact").when($"nr" === 1, "drop_near")
          .otherwise("keep").as("decision"))
      .orderBy($"doc_id")
  }
}
