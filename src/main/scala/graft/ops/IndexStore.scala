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
  * and append-mergeable for rolling corpora (union the parquet dirs;
  * rebuild the bloom from the merged fingerprints or OR the bit
  * arrays offline).
  */
object IndexStore {

  /** Rows a batch screen needs per incoming doc. */
  private def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("fp"))

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
    // per snapshot, at index-build time, not per screen)
    val n = math.max(1024L, fps.count())
    val bits = fps.selectExpr(s"bloom_agg(xxhash64(fp), ${n}L) AS b")
      .head().getAs[Array[Byte]]("b")
    val p = new java.io.File(s"$out/bloom")
    p.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out/bloom/fingerprints.bloom"), bits)
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

  def screenBatch(s: SparkSession, indexDir: String, batch: DataFrame): DataFrame = {
    import s.implicits._
    graft.functions.BloomFuncs.register(s)
    val bloomLit = lit(loadBloom(indexDir))
    val bandIdx = s.read.parquet(s"$indexDir/band_keys")
    val fpIdx = s.read.parquet(s"$indexDir/fingerprints").select($"fp")
    val bfp = fingerprints(batch)
    // exact screen: bloom prefilter (narrow, broadcast bits) → exact
    // semi-join only for sketch hits
    val exactHits = bfp
      .filter(call_function("bloom_contains", bloomLit, xxhash64($"fp")))
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
