package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Core._

/** Deduplication operators over `documents` (north-star LLM-pipeline
  * surface; the reference itself has no dedup — its nearest analog is
  * the idempotent checkpoint skip, unified_code.py:437–439).
  *
  * Four families, as mandated by the builder brief:
  *  - exact (hash groupBy)
  *  - MinHash + LSH banding (shingle → minhash → band → bucket join)
  *  - n-gram Jaccard verification of LSH candidates
  *  - SimHash fingerprinting
  *
  * Hashing uses md5 (identical hex output in Spark and DuckDB) so every
  * stage is oracle-checkable; lexicographic MIN over fixed-width hex
  * prefixes equals numeric MIN over the corresponding uint32, so no
  * hex→int conversion is needed for the minhash.
  *
  * Scale design (100 TB): every stage is a narrow projection or a
  * hash-shuffle on bounded keys — shingling is a generator (explode),
  * minhash is a partial-aggregating groupBy(doc_id, i), band buckets
  * are groupBy(doc_id, band), and the candidate join is an equi-join on
  * (band, band_key) whose fan-out is controlled by band selectivity
  * (4 bands × 4 hashes here; widen rows-per-band to cut collisions).
  * Nothing is quadratic in the corpus — only in bucket occupancy.
  */
object Dedup {

  private val NumHashes = 16
  private val RowsPerBand = 4

  /** tokens → distinct 3-word shingles, exploded one row per shingle
    * (native WordShingles expression — see its scaladoc for why the
    * transform/sequence composition was too slow). */
  private def shingleRows(s: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.WordShingles.register(s)
    fanOut(s, docs).select(col("doc_id"),
      explode(graft.functions.WordShingles.word_shingles(lower(col("text")), 3)).as("w"))
  }

  /** Session-memoized verify-stage shingle sets, DICTIONARY-CODED:
    * doc_id → sorted array of dense LONG shingle ids. Every exact
    * set-overlap verify (q32/q109/q120/q127/q133) consumes only set
    * CARDINALITIES (|A∩B|, |A|, |B|), which are invariant under any
    * bijection — so the verify joins can ship ~8-byte longs instead of
    * ~20-char shingle strings. Two wins, both O(pairs)-side:
    *
    *  - BYTES: the candidate-pair join amplifies each doc's set by its
    *    pair count (26.9M pairs × 2 full sets at the 100× probe, vs
    *    500k docs); int-coding cuts the dominant shuffle ~4×.
    *  - CPU: array_intersect on longs hashes 8-byte values, not
    *    variable-length UTF8 strings.
    *
    * The dictionary itself is EXACT (a bijection, not a hash — no
    * collision caveat at any scale) and assigned scalably with the
    * q100 prefix-offset machinery: range-partition the distinct vocab,
    * collect O(partitions) counts as driver metadata, id = partition
    * offset + local row_number. One O(occurrences) coding join at
    * build, memoized; it replaces the five per-query string-set
    * groupBys the catalog used to rebuild. */
  private[graft] def codedSets(s: SparkSession, dir: String): DataFrame =
    memo(s, s"dedup.codedSets:$dir") {
      import s.implicits._
      val p = s.sessionState.conf.numShufflePartitions
      val rows = shingleRows(s, table(s, dir, "documents"))
      val parted = rows.select($"w").distinct()
        .repartitionByRange(p, $"w")
        .withColumn("pid", spark_partition_id())
        .localCheckpoint()
      val counts = parted.groupBy($"pid").agg(count(lit(1)).as("c"))
        .as[(Int, Long)].collect().sortBy(_._1)
      var acc = 0L
      val offs = counts.map { case (pid, c) => val o = acc; acc += c; (pid, o) }
      val meta = offs.toSeq.toDF("pid", "off")
      val vocab = parted
        .withColumn("rnl", row_number().over(
          Window.partitionBy($"pid").orderBy($"w")))
        .join(broadcast(meta), Seq("pid"))
        .select($"w", ($"off" + $"rnl").cast("long").as("wid"))
      rows.join(vocab, Seq("w"))
        .groupBy($"doc_id").agg(sort_array(collect_set($"wid")).as("ws"))
    }

  /** Universal-hash-family minhash: one base hash per shingle (md5
    * prefix as uint32), then hash i is the linear permutation
    * `(a_i·h + b_i) mod P` with P prime > 2^32 — the standard
    * construction, 16× cheaper than hashing each shingle 16 times.
    * Constants are fixed literals shared verbatim with the oracle SQL;
    * a_i < 2^31 and h < 2^32 keep a_i·h + b_i < 2^63 (no overflow),
    * so both engines compute exact identical int64s. */
  private val P = 4294967311L
  private def permA(i: Int): Long = (1103515245L * (i + 1) + 12345L) % 2147483647L
  private def permB(i: Int): Long = (69069L * (i + 1) + 7L) % 2147483647L

  /** Minhash signature columns h0..h15 computed ROW-LOCALLY: the
    * shingle set is already an array inside the row (WordShingles), so
    * the 16 permuted minima come from the MinHashSigs codegen
    * expression — ONE generated loop over the array, shingle hashed
    * once, minima in registers, ZERO shuffle. Rounds 1–2 formulated
    * this as explode + groupBy(doc_id), which shuffled every
    * (doc, shingle) row; the aggregation was only ever reassembling
    * what the row already had. (An `array_min(transform(...))` × 16
    * formulation is shuffle-free too but measured 4× slower — Spark's
    * higher-order functions don't join whole-stage codegen; see the
    * MinHashSigs scaladoc.) At 100 TB the signature pass is now
    * scan-bandwidth-bound like q40–q44. Docs with no shingle
    * (<3 words) drop out, exactly as the groupBy produced no row. */
  private def rowLocalSigs(s: SparkSession, docs: DataFrame, md5Base: Boolean): DataFrame = {
    graft.functions.WordShingles.register(s)
    graft.functions.MinHashSigs.register(s)
    val sigs =
      if (md5Base) graft.functions.MinHashSigs.minhash_sigs(col("shg"))
      else graft.functions.MinHashSigs.minhash_sigs_fast(col("shg"))
    fanOut(s, docs)
      .withColumn("shg", graft.functions.WordShingles.word_shingles(lower(col("text")), 3))
      .filter(size(col("shg")) > 0)
      .withColumn("sigs", sigs)
      .select((col("doc_id") +: (0 until NumHashes).map(i => col("sigs")(i).as(s"h$i"))): _*)
  }

  /** Band rows for an ARBITRARY (doc_id, text) frame — the index-build
    * and batch-screen entry point (IndexStore). Same shingling,
    * signature family and banding as the memoized corpus paths; the
    * md5 base hash keeps stored indexes comparable with the
    * oracle-checked queries (production snapshots would use the
    * xxhash64 variant consistently on BOTH the index and every
    * screen). */
  private[ops] def toBandRowsPublic(s: SparkSession, docs: DataFrame,
      md5Base: Boolean = true): DataFrame =
    toBandRows(rowLocalSigs(s, docs, md5Base))

  /** h0..h15 → (doc_id, band, band_key): a narrow explode of 4 structs. */
  private def toBandRows(sigs: DataFrame): DataFrame = {
    val bandStructs = (0 until NumHashes / RowsPerBand).map { b =>
      val parts = (0 until RowsPerBand).map(r => col(s"h${b * RowsPerBand + r}").cast("string"))
      struct(lit(b).as("band"), concat_ws(",", parts: _*).as("band_key"))
    }
    sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  /** (doc_id, band, band_key) — the LSH bucket assignment, oracle-
    * parity md5 base hash. The whole pipeline up to the band-bucket
    * join is now shuffle-free (see [[rowLocalSigs]]); the join is the
    * only exchange LSH dedup pays. */
  private def bandKeys(s: SparkSession, dir: String): DataFrame =
    // tiny (4 rows/doc); memoized+cached ONCE per session so the six
    // LSH-derived queries (q31/q32/q45/q47/q54/q71) share one minhash
    // pipeline instead of each re-caching their own copy
    memo(s, s"dedup.bandKeys:$dir") {
      toBandRows(rowLocalSigs(s, table(s, dir, "documents"), md5Base = true))
    }

  /** Shared DuckDB CTE prefix mirroring shingleRows/bandKeys (same
    * permutation constants as permA/permB/P above). */
  private[ops] val oracleCtes = {
    val aExpr = "((1103515245 * (i+1) + 12345) % 2147483647)"
    val bExpr = "((69069 * (i+1) + 7) % 2147483647)"
    s"""WITH toks AS (SELECT doc_id, string_split(lower(text),' ') AS ws FROM documents),
      shingles AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS w
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) AS i FROM toks)),
      hh AS (SELECT doc_id, CAST('0x' || substr(md5(w),1,8) AS BIGINT) AS h FROM shingles),
      mh AS (SELECT doc_id, i, min(($aExpr * h + $bExpr) % $P) AS hmin
        FROM hh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
      bands AS (SELECT doc_id, cast(floor(i/4) as int) AS band,
        string_agg(cast(hmin as varchar),',' ORDER BY i) AS band_key FROM mh GROUP BY 1,2),
      pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
        ON a.band=b.band AND a.band_key=b.band_key AND a.doc_id<b.doc_id)"""
  }

  /** Force-materialize the session-shared memoized band keys and
    * cluster labels — Bench's warm phase, timed per frame (see
    * Similarity.warm). */
  def warm(s: SparkSession, dir: String): Seq[(String, Double)] = Seq(
    timedBuild("dedup.bandKeys") { bandKeys(s, dir).count(); () },
    timedBuild("dedup.clusterLabels") { clusterLabels(s, dir).count(); () },
    timedBuild("dedup.dupSpanStarts") { dupSpanStarts(s, dir).count(); () },
    timedBuild("dedup.codedSets") { codedSets(s, dir).count(); () })

  /** q137's snapshot store: a maintained artifact that exists before a
    * batch arrives — built (once per JVM) in the timed warm phase so
    * the catalog query measures the incremental MERGE, not the
    * once-per-snapshot write (VERDICT r5 next #5). Split from [[warm]]
    * (VERDICT r14 next #3): an independent store root whose build is
    * job-latency-bound, so the bench stages it concurrently with the
    * other families' store fixtures — its shared memo inputs are
    * already built by the sequential frame phase. */
  def warmStores(s: SparkSession, dir: String): Seq[(String, Double)] = Seq(
    timedBuild("dedup.snapshotStore") { snapshotStore(s, dir, 58982L); () })

  /** Session-memoized cluster labels over the corpus's LSH pair graph.
    * q45 (clusters), q47 (curation) and q76 (training pipeline) all
    * consume exactly this frame — in production the cluster assignment
    * is computed once per corpus snapshot and every downstream stage
    * reads it, so the memo IS the deployment shape, not a bench trick.
    * NOTE: unlike every other memo build, this one RUNS Spark jobs
    * while it builds (connected components iterates with per-round
    * actions under Core.memo's lock) — harmless in the single-threaded
    * harnesses; a concurrent caller would serialize behind it. */
  private[ops] def clusterLabels(s: SparkSession, dir: String): DataFrame =
    memo(s, s"dedup.clusters:$dir") {
      connectedComponents(
        table(s, dir, "documents").select(col("doc_id")), lshPairs(s, dir))
    }

  /** The corpus's LSH band-key index as a public surface — the static
    * side a streaming ingest screen (StreamingOps.screenIncoming) or an
    * external incremental job joins against. Same memoized frame the
    * batch queries share. */
  def bandKeyIndex(s: SparkSession, dir: String, md5Base: Boolean = true): DataFrame =
    if (md5Base) bandKeys(s, dir) else bandKeysFast(s, dir)

  /** Cluster labels for an explicit docs frame — the IndexStore
    * write-side variant of [[clusterLabels]] (which is dir-keyed and
    * session-memoized): same band rows, same pair self-join, same
    * star-contraction CC. */
  private[ops] def clusterLabelsFor(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val b = toBandRowsPublic(s, docs)
    val pairs = b.as("a").join(b.as("b"),
        $"a.band" === $"b.band" && $"a.band_key" === $"b.band_key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .distinct()
    connectedComponents(docs.select($"doc_id"), pairs)
  }

  /** Candidate near-dup pairs: docs sharing ≥1 LSH band bucket. */
  private[graft] def lshPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = bandKeys(s, dir)
    b.as("a").join(b.as("b"),
        $"a.band" === $"b.band" && $"a.band_key" === $"b.band_key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .distinct()
  }

  /** PRODUCTION band keys: identical shingling, permutation family and
    * banding to [[bandKeys]], but the per-shingle base hash is
    * `xxhash64` — one codegen'd long op — instead of the
    * md5→hex-substring→conv chain the DuckDB oracle forces on q31
    * (md5 is the only hash both engines compute identically). The
    * minhash guarantee only needs A uniform base hash, not md5
    * specifically, so at 100 TB this is the path to run: shingling
    * touches every byte of every document and the base hash sits in
    * that innermost loop. Collision behavior is statistically
    * identical; exact bucket contents differ by hash family, so this
    * variant has no oracle — DedupSimSpec pins recall against the
    * oracle-exact pairs, the probe measures the speedup. */
  private def bandKeysFast(s: SparkSession, dir: String): DataFrame =
    memo(s, s"dedup.bandKeysFast:$dir") {
      // xxhash64 mod 2^32 keeps h in [0, 2^32) so a_i·h + b_i < 2^63
      toBandRows(rowLocalSigs(s, table(s, dir, "documents"), md5Base = false))
    }

  /** Candidate pairs over the xxhash64 production path — same contract
    * as [[lshPairs]]. */
  def lshPairsFast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = bandKeysFast(s, dir)
    b.as("a").join(b.as("b"),
        $"a.band" === $"b.band" && $"a.band_key" === $"b.band_key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .distinct()
  }

  /** Connected components over the near-dup pair graph by alternating
    * large-star/small-star edge contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) — turns
    * candidate pairs into dedup *clusters* with a canonical (min-id)
    * representative, the step a real dedup pipeline needs after LSH.
    *
    * Why this beats the rounds-of-label-propagation formulation this
    * replaced (VERDICT r3 "next round" #3): label propagation joins
    * the FULL edge set every round — at the 100× probe that was 54M
    * directed edges × ~7 rounds, 101.6 s, the repo's one scale
    * hotspot. Star contraction rewrites the edge set itself: each
    * large-star hangs every node's larger neighbors off its local
    * minimum, each small-star re-points the smaller neighbors, and
    * near-dup cliques collapse to stars in the FIRST round — so round
    * 2 onward touches ~|V| edges, not |E|. Convergence is provably
    * O(log² n) rounds; on dedup graphs (dense shallow near-cliques)
    * it is 2–3.
    *
    * Each round is two {aggregate + self-join + distinct} passes over
    * a monotonically shrinking edge set, all equi-joins on node id
    * (AQE-plannable, no driver-side state), with an eager
    * localCheckpoint per round to cut the self-join lineage (an uncut
    * plan OOMs the driver on stringification long before the data is
    * a problem — found by the 10× probe of the old loop; on a real
    * cluster swap reliable .checkpoint() in if executor loss matters
    * more than per-round durable-write cost).
    *
    * At the star-forest fixed point every non-root node carries
    * exactly one edge to its component minimum, so labels fall out of
    * one groupBy; the fixed point is detected by an exact fingerprint
    * (count + decimal sum of per-edge xxhash64 — order-independent and
    * overflow-free; a false convergence needs a 64-bit hash-sum
    * collision at equal cardinality). */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    val s = nodes.sparkSession
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    // canonical orientation u > v, deduplicated; checkpointed so each
    // round starts from a flat LogicalRDD (fresh aliases re-key the
    // checkpoint's output attributes — carried-over constraints would
    // otherwise reference pre-checkpoint exprIds downstream)
    def ckpt(df: DataFrame): DataFrame =
      df.localCheckpoint().select(df.columns.map(c => col(c).as(c)): _*)
    var e = ckpt(edges.filter($"id_a" =!= $"id_b")
      .select(greatest($"id_a", $"id_b").as("u"), least($"id_a", $"id_b").as("v"))
      .distinct())
    var prevFp: Option[(Long, String)] = None
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // LARGE-STAR: for each node u over the SYMMETRIC adjacency,
      // m = min(N(u) ∪ {u}); emit (v, m) for every neighbor v > u.
      // Output stays (bigger, smaller)-oriented: v > u ≥ m.
      val sym = e.select($"u", $"v")
        .unionByName(e.select($"v".as("u"), $"u".as("v")))
      val lsMin = sym.groupBy($"u")
        .agg(min($"v").as("mv"))
        .select($"u", least($"mv", $"u").as("m"))
      // shuffle-hash hint: the per-node min table is the small side;
      // a sort-merge join would re-sort the full adjacency
      val ls = sym.join(lsMin.hint("shuffle_hash"), Seq("u"))
        .filter($"v" > $"u")
        .select($"v".as("u"), $"m".as("v"))
        .distinct()
      // SMALL-STAR: over the oriented edges (all v < u), m = min(v);
      // re-point every smaller neighbor at m and keep (u, m).
      val ssMin = ls.groupBy($"u").agg(min($"v").as("m"))
      val ss = ls.join(ssMin.hint("shuffle_hash"), Seq("u"))
        .filter($"v" =!= $"m")
        .select($"v".as("u"), $"m".as("v"))
        .unionByName(ssMin.select($"u", $"m".as("v")))
        .distinct()
      val superseded = e
      e = ckpt(ss)
      // the superseded round's checkpoint is dead once the new one
      // materializes (ckpt is eager) — released here, or every CC run
      // would strand one MEMORY_AND_DISK edge frame per round until
      // driver GC (the final round's stays: the returned labels read it)
      IndexStore.releaseCheckpoint(superseded)
      // exact order-independent fingerprint of the materialized
      // checkpoint: star-forest fixed points reproduce themselves, so
      // equal consecutive fingerprints end the loop
      val fpRow = e.agg(count(lit(1)),
        sum(xxhash64($"u", $"v").cast(DecimalType(38, 0)))).head()
      val fp = (fpRow.getLong(0),
        Option(fpRow.getDecimal(1)).map(_.toBigInteger.toString).getOrElse("0"))
      converged = prevFp.contains(fp) || fp._1 == 0L
      prevFp = Some(fp)
      iter += 1
    }
    // labels below are only meaningful at the star-forest fixed point —
    // an unconverged edge set would SILENTLY mislabel (a node's min
    // neighbor need not be its component min mid-run), so fail loudly
    // instead, per the repo's fail-loud rule (SURVEY §4.3(4)). 50
    // rounds is far above the O(log² n) bound for any realistic graph,
    // and post-collapse rounds cost ~|V| rows each.
    require(converged,
      s"connectedComponents did not reach its star-forest fixed point in $maxIter rounds")
    // star forest: every non-root has exactly one (u → component-min)
    // edge; roots and edge-free nodes label themselves
    nodes.select($"doc_id")
      .join(e.groupBy($"u").agg(min($"v").as("lbl"))
        .select($"u".as("doc_id"), $"lbl"), Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"lbl", $"doc_id").as("cluster_id"))
  }

  /** Duplicated-span machinery (q112/q113): exact SEQUENCE-level dedup
    * in the "Deduplicating Training Data Makes Language Models Better"
    * (Lee et al., ACL'22) sense — find every run of ≥[[SpanK]] words
    * that occurs at least twice anywhere in the corpus, then cut those
    * runs out of each document. Doc-level dedup (q30–q34) drops whole
    * near-twin documents; this catches the boilerplate SENTENCE pasted
    * into thousands of otherwise-unique pages, which no doc-level
    * filter sees.
    *
    * The paper builds a corpus-wide suffix array — inherently
    * sequential and memory-resident, the wrong shape for Spark. The
    * equivalent declarative formulation: hash every positional k-gram
    * (one row-local GramHashes pass, ZERO shuffle), mark the start
    * positions whose 60-bit hash occurs ≥2 times corpus-wide (one hash
    * shuffle on the gram key — the same O(corpus tokens) exchange class
    * as q96's tf explode; text itself never shuffles), then merge
    * overlapping/adjacent duplicated windows into maximal spans with
    * one per-doc gaps-and-islands window. A true duplicated run of
    * length L ≥ k is covered exactly (all L−k+1 of its window starts
    * repeat, and their union is the run); a false positive needs a
    * 60-bit md5-prefix collision. Every stage is deterministic integer
    * arithmetic on md5 prefixes, so unlike the MinHash family the whole
    * operator is DuckDB-oracle-checkable end to end. */
  private val SpanK = 8

  /** (doc_id, pos) of every positional [[SpanK]]-gram whose hash
    * repeats corpus-wide. The window count(*) over the gram key beats
    * the groupBy-then-self-join spelling: one shuffle, no second scan
    * of the gram pass (gram hashes are near-unique, so a partial agg
    * would barely combine anyway). Memoized — q112 and q113 share it. */
  private def dupSpanStarts(s: SparkSession, dir: String): DataFrame =
    memo(s, s"dedup.dupSpanStarts:$dir") {
      graft.functions.GramHashes.register(s)
      fanOut(s, table(s, dir, "documents"))
        .select(col("doc_id"), posexplode(
          graft.functions.GramHashes.gram_hashes(lower(col("text")), SpanK))
          .as(Seq("pos", "gh")))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("gh"))))
        .filter(col("n") >= 2)
        .select(col("doc_id"), col("pos"))
    }

  /** Merge a (doc_id, pos) set of k-gram window STARTS into maximal
    * [span_start, span_end] word ranges (0-based, inclusive). Two
    * windows merge when their coverage overlaps or touches (start ≤
    * prev_end + 1, i.e. pos ≤ prev_max_pos + k), so output ranges are
    * disjoint and non-adjacent by construction. Shared by the
    * duplicated-span queries (q112/q113) and surgical
    * decontamination (q131). */
  private[ops] def mergeSpans(starts: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    starts
      .withColumn("pm",
        max(col("pos")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_span",
        when(col("pm").isNull || col("pos") > col("pm") + k, 1L).otherwise(0L))
      .withColumn("span_id", sum(col("new_span")).over(w))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"))
  }

  private def duplicateSpans(s: SparkSession, dir: String): DataFrame =
    mergeSpans(dupSpanStarts(s, dir), SpanK)

  /** Cut the given spans out of each of `docs` and witness the result
    * byte-exactly: (doc_id, n_words, n_kept, n_removed, clean_md5).
    * q113's scrub body, shared with q131. */
  private[ops] def scrubBySpans(s: SparkSession, docs: DataFrame,
      spans: DataFrame): DataFrame = {
    import s.implicits._
    val covered = spans
      .select($"doc_id", explode(sequence($"span_start", $"span_end")).as("pos"))
    val toks = fanOut(s, docs)
      .select($"doc_id", posexplode(split(lower($"text"), " ")).as(Seq("pos", "w")))
    val scrubbed = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct($"pos", $"w"))),
            x => x.getField("w")))).as("clean_md5"))
    docs
      .select($"doc_id", size(split(lower($"text"), " ")).as("n_words"))
      .join(scrubbed, Seq("doc_id"), "left")
      .select($"doc_id", $"n_words",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        ($"n_words".cast("long") - coalesce($"n_kept", lit(0L))).as("n_removed"),
        coalesce($"clean_md5", md5(lit(""))).as("clean_md5"))
      .orderBy($"doc_id")
  }

  /** Shared oracle CTEs for the span queries: toks → positional gram
    * hashes → duplicated starts → gaps-and-islands → spans. */
  private val oSpanGram = (0 until SpanK).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
  private val spanCtes =
    s"""WITH toks AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws FROM documents),
      g AS (SELECT doc_id, i - 1 AS pos,
          CAST('0x' || substr(md5($oSpanGram), 1, 15) AS BIGINT) AS gh
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - ${SpanK - 1})) AS i FROM toks)),
      d AS (SELECT doc_id, pos FROM
        (SELECT doc_id, pos, count(*) OVER (PARTITION BY gh) AS n FROM g) WHERE n >= 2),
      m AS (SELECT doc_id, pos, max(pos) OVER (PARTITION BY doc_id ORDER BY pos
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM d),
      isl AS (SELECT doc_id, pos, sum(CASE WHEN pm IS NULL OR pos > pm + $SpanK THEN 1 ELSE 0 END)
          OVER (PARTITION BY doc_id ORDER BY pos) AS span_id FROM m),
      spans AS (SELECT doc_id, min(pos) AS span_start, max(pos) + ${SpanK - 1} AS span_end
        FROM isl GROUP BY doc_id, span_id)"""

  /** Winnowing fingerprints (q117): the robust winnowing selection of
    * Schleimer/Wilkerson/Aiken (SIGMOD'03, the MOSS algorithm) — from
    * every window of [[WinW]] consecutive [[WinK]]-gram hashes, keep
    * the minimum (rightmost on ties). Guarantees: at least one
    * fingerprint per window (any shared run of ≥ WinK+WinW−1 words is
    * caught through fingerprints alone), density ~2/(WinW+1) — the
    * standard way to cut positional-gram volume ~3× before a
    * corpus-wide match join, sitting between q43's one-hash-per-doc
    * and q112's every-position spectrum.
    *
    * The argmin-with-rightmost-ties is encoded ARITHMETICALLY so both
    * engines agree bit-for-bit: wk = gh·10⁶ − pos (DECIMAL — gh is 60
    * bits, the product overflows BIGINT) orders first by hash then by
    * DESCENDING position, so min(wk) over the w-row frame IS the
    * selection, and a (doc, wk) join-back recovers (pos, gh) without
    * any division. Valid while docs stay under 10⁶ grams; a corpus
    * with longer docs raises the factor with the same contract.
    *
    * Scale: the gram pass is row-local codegen (zero shuffle); the
    * selection is one per-doc sort window (doc-bounded, like q112's
    * islands); the join-back is an equi-join on (doc_id, wk) narrow
    * decimals. Fingerprint volume — the thing downstream match joins
    * shuffle — is ~2/(WinW+1) of gram volume by construction. */
  private val WinK = 5
  private val WinW = 4

  private def winnow(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GramHashes.register(s)
    val D = org.apache.spark.sql.types.DecimalType(28, 0)
    val g = fanOut(s, table(s, dir, "documents"))
      .select(col("doc_id"), posexplode(
        graft.functions.GramHashes.gram_hashes(lower(col("text")), WinK))
        .as(Seq("pos", "gh")))
      .withColumn("wk", col("gh").cast(D) * lit(1000000L) - col("pos"))
    val fr = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, WinW - 1)
    val sel = g
      .withColumn("sel", min(col("wk")).over(fr))
      .withColumn("cnt", count(lit(1)).over(fr))
      .filter(col("cnt") === WinW)
      .select(col("doc_id"), col("sel").as("wk")).distinct()
    g.join(sel, Seq("doc_id", "wk"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("gh").as("fp"))
  }

  private val oWinGram = (0 until WinK).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
  private val winnowCtes =
    s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      g AS (SELECT doc_id, i - 1 AS pos,
          CAST('0x' || substr(md5($oWinGram), 1, 15) AS BIGINT) AS gh
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - ${WinK - 1})) AS i FROM toks)),
      k AS (SELECT doc_id, pos, gh,
          CAST(gh AS DECIMAL(28,0)) * 1000000 - pos AS wk FROM g),
      w AS (SELECT doc_id,
          min(wk) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN CURRENT ROW AND ${WinW - 1} FOLLOWING) AS sel,
          count(*) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN CURRENT ROW AND ${WinW - 1} FOLLOWING) AS cnt FROM k),
      f AS (SELECT DISTINCT doc_id, sel FROM w WHERE cnt = ${WinW}),
      fps AS (SELECT k.doc_id, k.pos, k.gh AS fp FROM k
        JOIN f ON f.doc_id = k.doc_id AND f.sel = k.wk)"""

  /** 60-bit majority-vote SimHash per doc (q128 / IndexStore sim
    * channel): 15 md5 hex digits × 4 bits over the doc's distinct
    * words — 60 bits keeps every shift inside int64 in both engines.
    * One row-local codegen call (see the SimHash60 scaladoc for why
    * this beats the explode + two-groupBy spelling: zero shuffle, and
    * legal inside an append-mode streaming plan). Docs with no
    * non-empty words drop out (NULL fingerprint), matching the
    * declarative version's groupBy semantics. */
  private[ops] def simhash60(docs: DataFrame): DataFrame = {
    graft.functions.SimHash60.register(docs.sparkSession)
    docs.select(col("doc_id"),
        graft.functions.SimHash60.sim_hash60(lower(col("text"))).as("sim"))
      .filter(col("sim").isNotNull)
  }

  /** The 4 × 15-bit pigeonhole block rows of a (doc_id, sim) frame. */
  private[ops] def simBlocks(sims: DataFrame): DataFrame =
    sims
      .withColumn("b", explode(sequence(lit(0), lit(3))))
      .withColumn("bv", expr("(sim >> (b * 15)) & 32767"))

  /** Byte-shingle SimHash per binary payload (q141 / media channel):
    * the content-level sibling of [[simhash60]] — 60-bit majority vote
    * over the payload's distinct byte n-grams, one row-local codegen
    * call (see ByteSimHash60). Payloads shorter than one window drop
    * out (NULL fingerprint), matching the word variant's no-words
    * semantics. */
  private[ops] def simhash60Bytes(payloads: DataFrame, n: Int = 4): DataFrame = {
    graft.functions.ByteSimHash60.register(payloads.sparkSession)
    payloads.select(col("doc_id"),
        graft.functions.ByteSimHash60.byte_sim_hash60(col("payload"), n).as("sim"))
      .filter(col("sim").isNotNull)
  }

  /** First-match pigeonhole pair join over a (doc_id, sim, b, bv)
    * block frame — the q128 candidate+verify machinery, shared with
    * the byte-level payload variant (q141): by pigeonhole, fingerprints
    * within Hamming distance 3 agree exactly on ≥ 1 of 4 disjoint
    * 15-bit blocks; a pair colliding in several blocks is emitted only
    * from its lowest matching block (a per-row integer filter, versus
    * a shuffle-distinct of every candidate × matching-block row — a
    * measured ~1.8G-row exchange on the 100× clique-heavy corpus);
    * the exact `bit_count(xor) ≤ 3` verify is one codegen integer op
    * per candidate. */
  private[ops] def pigeonholePairs(blocks: DataFrame): DataFrame = {
    val s = blocks.sparkSession
    import s.implicits._
    def blk(sim: String, i: Int) = s"(($sim >> ${i * 15}) & 32767)"
    val firstMatch = (1 to 3).map { b =>
      s"(b = $b AND ${(0 until b).map(i => s"${blk("sa", i)} <> ${blk("sb", i)}")
        .mkString(" AND ")})"
    }.mkString("(b = 0) OR ", " OR ", "")
    blocks.as("x").join(blocks.as("y"),
        $"x.b" === $"y.b" && $"x.bv" === $"y.bv" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("id_a"), $"y.doc_id".as("id_b"), $"x.b".as("b"),
        $"x.sim".as("sa"), $"y.sim".as("sb"))
      .filter(expr(firstMatch))
      .withColumn("hamming", expr("cast(bit_count(sa ^ sb) as bigint)"))
      .filter($"hamming" <= 3)
      .select($"id_a", $"id_b", $"hamming")
      .orderBy($"id_a", $"id_b")
  }

  /** Sorted-neighborhood candidate pairs (q120/q127): each doc paired
    * with its next [[SnW]] neighbors in the (normalized 24-char text
    * prefix, doc_id) sort order. id_a precedes id_b in SORT order, not
    * necessarily numerically.
    *
    * SIZE-GATED like PageRank's rank join (VERDICT r5 next #4): below
    * [[SnWindowMaxDocs]] corpus rows the one-window spelling
    * ([[snWindowPairs]], one WindowExec with three lead()s) is strictly
    * cheaper — a single-task sort of ≤ ~50 MB of (24-char key, id)
    * rows — while [[snPairs]]'s range shuffle + heads broadcast +
    * localCheckpoint machinery was measured as a 1.9× tax at that
    * scale (SCALE.md 100× A/B; q127 3.8→9.9 s at sf0.1). Above the
    * gate the single-task sort is the scale-killer and [[snPairs]]
    * takes over. Both spellings are set-equal (DedupSimSpec pins each
    * against [[snCandidatesWindowRef]]). */
  private val SnW = 3

  /** Corpus-rows bound for the one-window sn spelling: 1M rows × ~50 B
    * (24-char key + long id + sort overhead) ≈ 50 MB through one
    * task's external sort — comfortably single-task; beyond it the
    * range-partitioned [[snPairs]] amortizes. */
  private[graft] val SnWindowMaxDocs = 1000000L

  private[graft] def snKeyed(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(col("doc_id"),
      substring(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), 1, 24).as("snk"))

  private[graft] def snCandidates(s: SparkSession, dir: String): DataFrame =
    if (graft.Core.tableRows(s, dir, "documents") <= SnWindowMaxDocs)
      snWindowPairs(snKeyed(s, dir))
    else snPairs(snKeyed(s, dir), SnW)

  /** Once-per-JVM IndexStore snapshot of the md5-gated corpus slice
    * (`gate < gateLt` of 65536): band index + cluster labels under a
    * deterministic temp path. q137 times the incremental MERGE against
    * this store; rebuilding the snapshot inside every bench run timed
    * the write, not the operator (VERDICT r5 next #5). Keyed by
    * (dir, gateLt) — a different corpus or gate gets its own store. */
  private val snapshotStores =
    scala.collection.concurrent.TrieMap.empty[(String, Long), String]

  /** Drop this family's warm-built store fixtures so Bench's
    * warm-bracket self-heal (VERDICT r14 next #4) can re-run the warm
    * phase iso-condition: the memo entry AND the store directory go
    * (a rebuild onto a surviving root would append extra snapshots
    * and change every timeline fixture). Only the bench calls this,
    * after the query sweep — nothing reads the old roots again. */
  private[graft] def resetWarmFixtures(): Unit =
    snapshotStores.synchronized {
      snapshotStores.values.foreach(p => IndexStore.deleteRec(new java.io.File(p)))
      snapshotStores.clear()
    }

  private def snapshotStore(s: SparkSession, dir: String, gateLt: Long): String =
    snapshotStores.synchronized {
      snapshotStores.getOrElseUpdate((dir, gateLt), {
        val gate = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long")
        val slice = table(s, dir, "documents").filter(gate < gateLt)
        val idx = graft.Core.jvmStorePath("graft_incc", dir, s"_g$gateLt")
        IndexStore.write(s, slice, idx)
        IndexStore.writeClusters(s, slice, idx)
        idx
      })
    }

  /** Small-corpus arm of the [[snCandidates]] gate: ONE unpartitioned
    * window evaluating all [[SnW]] lead()s in a single pass (the
    * reference spelling sorts the corpus once per offset), then one
    * explode. Bounded by the gate — PlanSpec allowlists the single
    * WindowExec with this reason. */
  private[graft] def snWindowPairs(keyed: DataFrame): DataFrame = {
    val ord = Window.orderBy(col("snk"), col("doc_id"))
    keyed.select(col("doc_id").cast("long").as("id_a"),
        array((1 to SnW).map(o =>
          lead(col("doc_id").cast("long"), o).over(ord)): _*).as("bs"))
      .select(col("id_a"), explode(col("bs")).as("id_b"))
      .filter(col("id_b").isNotNull)
  }

  /** Reference spelling of the sliding-window pairing: ONE global
    * `Window.orderBy` — a single-partition external sort of the whole
    * corpus, correct but not scale-safe. It anchors the DuckDB oracle
    * (same `lead()` SQL) and the DedupSimSpec equality pin for
    * [[snPairs]]; catalog queries never run it. */
  private[graft] def snCandidatesWindowRef(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.orderBy(col("snk"), col("doc_id"))
    (1 to SnW).map(o => snKeyed(s, dir)
        .select(col("doc_id").as("id_a"), lead(col("doc_id"), o).over(ord).as("id_b")))
      .reduce(_ unionByName _)
      .filter(col("id_b").isNotNull)
  }

  /** Scale-safe sliding-window pairing over the (snk, doc_id) total
    * order — the range-partitioned shape the q120 scaladoc described
    * and production needs (Hernández/Stolfo '95 run on a sorted file,
    * not in one task's memory). Exactly the q105 `groupMedians`
    * two-phase pattern:
    *
    *  1. `repartitionByRange(snk, doc_id)` + `sortWithinPartitions` —
    *     ONE full-parallelism range shuffle (q73's exchange class),
    *     cached so both passes read the same sampled boundaries.
    *  2. Boundary-overlap exchange: each partition's first `w`
    *     doc_ids, collected as O(w · partitions) driver metadata and
    *     broadcast — partition i appends the next `w` ids drawn from
    *     the heads of partitions i+1, i+2, … (the iterator cascade
    *     through partitions shorter than `w` is exact: a partition
    *     with m < w rows contributes all m, and the remainder comes
    *     from the next head).
    *  3. One streaming `mapPartitionsWithIndex` pass emits (anchor,
    *     successor) pairs with an O(w) pending ring — no window
    *     machinery, no per-pid re-shuffle, memory O(w) per task.
    *
    * Appended overlap rows are never anchors, so every pair is owned
    * by exactly one partition — no duplicate strip needed. The pair
    * frame is localCheckpoint'ed so the cache can be dropped before
    * returning. DedupSimSpec pins set-equality against
    * [[snCandidatesWindowRef]] on the real corpus and on a
    * fewer-docs-than-partitions corpus (the cascade case). */
  private[graft] def snPairs(keyed: DataFrame, w: Int): DataFrame = {
    val s = keyed.sparkSession
    import s.implicits._
    val p = s.sessionState.conf.numShufflePartitions
    val sorted = keyed
      .select(col("snk"), col("doc_id").cast("long").as("doc_id"))
      .as[(String, Long)]
      .repartitionByRange(p, col("snk"), col("doc_id"))
      .sortWithinPartitions(col("snk"), col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nParts = sorted.rdd.getNumPartitions
      val heads: Map[Int, Array[Long]] = sorted.rdd
        .mapPartitionsWithIndex((i, it) => Iterator(i -> it.take(w).map(_._2).toArray))
        .collect().toMap
      val bc = s.sparkContext.broadcast(heads)
      val pairs = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
        val overflow = ((i + 1) until nParts).iterator
          .flatMap(j => bc.value.getOrElse(j, Array.empty[Long]))
          .take(w)
        // pending anchors still owed successors: ≤ w entries alive
        val pending = scala.collection.mutable.ArrayDeque.empty[(Long, Int)]
        (it.map(r => (r._2, true)) ++ overflow.map(id => (id, false))).flatMap {
          case (id, isOwn) =>
            val out = pending.iterator.map { case (a, _) => (a, id) }.toArray
            var k = pending.size
            while (k > 0) {
              val (a, rem) = pending.removeHead()
              if (rem > 1) pending.append((a, rem - 1))
              k -= 1
            }
            if (isOwn) pending.append((id, w))
            out.iterator
        }
      }
      pairs.toDF("id_a", "id_b").localCheckpoint()
    } finally { sorted.unpersist(blocking = false); () }
  }

  /** Shared q120/q127 oracle CTEs: `snd` sort keys → `cands`. */
  private val snCtes = s""",
      snd AS (SELECT doc_id,
          substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), 1, 24) AS snk
        FROM documents),
      cands0 AS (SELECT doc_id AS id_a,
          lead(doc_id, 1) OVER (ORDER BY snk, doc_id) AS b1,
          lead(doc_id, 2) OVER (ORDER BY snk, doc_id) AS b2,
          lead(doc_id, 3) OVER (ORDER BY snk, doc_id) AS b3
        FROM snd),
      cands AS (SELECT id_a, b1 AS id_b FROM cands0 WHERE b1 IS NOT NULL
        UNION ALL SELECT id_a, b2 FROM cands0 WHERE b2 IS NOT NULL
        UNION ALL SELECT id_a, b3 FROM cands0 WHERE b3 IS NOT NULL)"""

  /** PageRank machinery (q116): damping 0.85, 10 fixed iterations,
    * uniform teleport, dangling mass redistributed uniformly — over
    * the near-dup pair graph, where a high rank marks the boilerplate
    * HUBS (templates duplicated across many otherwise-unrelated pages)
    * that per-pair dedup views can't surface.
    *
    * Engine-exactness: float PageRank is order-dependent (parallel
    * double sums), so ranks are computed in INTEGER mass units
    * (T = 1e9 per node) with truncating division — every op is exact
    * 64-bit arithmetic both engines reproduce bit-for-bit, and the
    * oracle UNROLLS the 10 iterations as generated CTEs (no recursive
    * CTE, whose multiple self-references DuckDB restricts). Overflow
    * headroom: worst-case per-node inflow is the total mass N·T
    * (5e14 at sf10), ×85 stays < 2^63.
    *
    * Scale: the degree-joined edge list is checkpointed once and
    * reused; each iteration is one equi-join (ranks are the small
    * side) + partial-agged sum + two 1-row broadcasts, with a
    * localCheckpoint lineage cut per round like connectedComponents. */
  private val PrT = 1000000000L
  private val PrIters = 10

  /** q133's body, parameterized by the candidate-pair frame so the
    * SAME dataflow runs from the session-memoized lshPairs (catalog,
    * oracle-checked) or from [[IndexStore.pairsFromStore]]'s persisted
    * band index (the cold-session operational path — no re-minhash of
    * the corpus). DedupSimSpec pins both routes equal. */
  private[ops] def containmentScreen(s: SparkSession, dir: String,
      pairs: DataFrame): DataFrame = {
    import s.implicits._
    graft.functions.SortedIntersectCount.register(s)
    val sets = codedSets(s, dir)
    pairs
      .join(sets.select($"doc_id".as("id_a"), $"ws".as("wsa")), Seq("id_a"))
      .join(sets.select($"doc_id".as("id_b"), $"ws".as("wsb")), Seq("id_b"))
      .withColumn("c",
        graft.functions.SortedIntersectCount.sorted_intersect_count($"wsa", $"wsb"))
      .select($"id_a", $"id_b",
        rnd4($"c".cast("double") / size($"wsa")).as("cont_a_in_b"),
        rnd4($"c".cast("double") / size($"wsb")).as("cont_b_in_a"))
      .filter($"cont_a_in_b" >= 0.8 || $"cont_b_in_a" >= 0.8)
      .orderBy($"id_a", $"id_b")
  }

  /** q129's body, parameterized by the cluster-label frame (catalog
    * passes the session memo; [[IndexStore.reportFromStore]] passes
    * labels contracted from the persisted band index). */
  private[ops] def dedupReportFrom(s: SparkSession, labels: DataFrame): DataFrame = {
    import s.implicits._
    val sizes = labels
      .groupBy($"cluster_id").agg(count(lit(1)).as("k"))
    val totals = sizes.agg(
      sum($"k").as("n_docs"), count(lit(1)).as("n_clusters"))
    sizes.groupBy($"k").agg(count(lit(1)).as("n_clusters_of_k"))
      .crossJoin(broadcast(totals))
      .select($"k", $"n_clusters_of_k",
        ($"k" * $"n_clusters_of_k").as("docs_covered"),
        rnd4($"n_docs".cast("double") / $"n_clusters").as("dup_factor"))
      .orderBy($"k")
  }

  /** Above this corpus size the per-round rank broadcast (~16 bytes
    * a doc, ~1.6 GB plain at the bound) stops being safe for the
    * driver/executor broadcast path, and [[pagerank]] flips the rank
    * join to the shuffle spelling. DedupSimSpec pins that both
    * spellings produce identical integer ranks; the probe forces the
    * shuffle path at 100× for a measured number (SCALE.md). */
  private[graft] val PrBroadcastMaxDocs = 100000000L

  private def pagerank(s: SparkSession, dir: String): DataFrame =
    pagerank(s, dir, forceShuffle = false)

  private[graft] def pagerank(s: SparkSession, dir: String,
      forceShuffle: Boolean): DataFrame = {
    import s.implicits._
    def ckpt(df: DataFrame): DataFrame =
      df.localCheckpoint().select(df.columns.map(c => col(c).as(c)): _*)
    val docs = table(s, dir, "documents").select($"doc_id")
    val pairs = lshPairs(s, dir)
    val edges = pairs.select($"id_a".as("src"), $"id_b".as("dst"))
      .unionByName(pairs.select($"id_b".as("src"), $"id_a".as("dst")))
    val degs = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    // SIZE-GATED rank join, two spellings with bit-identical integer
    // output (every op is exact 64-bit arithmetic; integer sums are
    // order-independent):
    //  - broadcast (≤ PrBroadcastMaxDocs): edge list partitioned by
    //    DST once and checkpointed, the (long, long) rank frame —
    //    orders of magnitude smaller than the edge list — broadcast
    //    each round. The per-round contrib aggregation then needs NO
    //    edge shuffle at all: the join is map-side and groupBy(dst)
    //    lands on the existing partitioning. 10 rounds × zero 50M-row
    //    exchanges — measured 221 s → 167 s at the 100× probe.
    //  - shuffle (beyond the broadcast bound — billions of docs):
    //    edge list partitioned by SRC once and checkpointed; each
    //    round shuffles only the n-row rank frame onto that
    //    partitioning (the checkpointed edges never move) and the
    //    contrib groupBy partial-aggregates map-side before its
    //    narrow (dst, c) exchange. Per-round cost is O(n) rank rows +
    //    O(partial contribs), never O(edges).
    // loop invariants materialized ONCE: the dangling-doc id set and
    // the 1-row corpus count (recomputing either inside the loop costs
    // an extra anti-join / agg job per iteration); the count doubles
    // as the broadcast-vs-shuffle gate input
    val dangIds = ckpt(docs.join(
      degs.select($"src".as("doc_id")), Seq("doc_id"), "left_anti"))
    val nDocs = ckpt(docs.agg(count(lit(1)).as("n")))
    val useBroadcast = !forceShuffle && nDocs.head().getLong(0) <= PrBroadcastMaxDocs
    val edgeDeg = ckpt(edges.join(degs, Seq("src"))
      .repartition(if (useBroadcast) $"dst" else $"src"))
    var r = docs.select($"doc_id", lit(PrT).as("r"))
    for (_ <- 1 to PrIters) {
      val rSrc = r.withColumnRenamed("doc_id", "src")
      val contrib = edgeDeg
        .join(if (useBroadcast) broadcast(rSrc) else rSrc, Seq("src"))
        .select($"dst".as("doc_id"), expr("r div deg").as("c"))
        .groupBy($"doc_id").agg(sum($"c").as("contrib"))
      val dang = r.join(dangIds, Seq("doc_id"), "left_semi")
        .agg(coalesce(sum($"r"), lit(0L)).as("dm"))
      r = ckpt(docs.join(contrib, Seq("doc_id"), "left")
        .crossJoin(broadcast(dang))
        .crossJoin(broadcast(nDocs))
        .select($"doc_id",
          (lit(PrT * 15 / 100) +
            expr("(85 * (coalesce(contrib, 0) + (dm div n))) div 100")).as("r")))
    }
    r
  }

  /** Oracle mirror of [[pagerank]]: the iterations unrolled as
    * generated CTEs on top of the `pairs` chain. DuckDB's `//` is
    * floor division and Spark's `div` truncates — identical on the
    * non-negative values here; sums cast back to BIGINT (DuckDB
    * widens sum() to HUGEINT). Every generated CTE is MATERIALIZED:
    * each `r_i` is referenced twice (by `c_{i+1}` and `g_{i+1}`), so
    * DuckDB's default inlining would expand the chain 2^iters times
    * and the query never finishes; materialization makes it linear
    * (measured 0.5 s at sf0.01). */
  private def oPagerank(iters: Int): String = {
    val teleport = PrT * 15 / 100
    val sb = new StringBuilder(s""",
      edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs),
      degs AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
      nn AS MATERIALIZED (SELECT count(*) AS n FROM documents),
      r0 AS MATERIALIZED (SELECT doc_id, CAST($PrT AS BIGINT) AS r FROM documents)""")
    for (i <- 1 to iters) sb.append(s""",
      c$i AS MATERIALIZED (SELECT e.dst AS doc_id, cast(sum(p.r // d.deg) as bigint) AS contrib
        FROM edges e JOIN r${i - 1} p ON p.doc_id = e.src
        JOIN degs d ON d.src = e.src GROUP BY 1),
      g$i AS MATERIALIZED (SELECT cast(coalesce(sum(r), 0) as bigint) AS dm FROM r${i - 1}
        WHERE doc_id NOT IN (SELECT src FROM degs)),
      r$i AS MATERIALIZED (SELECT n.doc_id, $teleport + (85 * (coalesce(c.contrib, 0) +
          ((SELECT dm FROM g$i) // (SELECT n FROM nn)))) // 100 AS r
        FROM documents n LEFT JOIN c$i c USING (doc_id))""")
    sb.toString
  }

  /** Candidate budget for the exact set-similarity join (q138) —
    * override with `graft.ppjoin.maxCandidates`. The default refuses
    * the measured out-of-disk regime (the 100× twin corpus's 3.85B
    * pre-positional candidates) while passing every corpus whose
    * candidate volume a 32-thread host demonstrably absorbs. */
  private[graft] val PpjoinMaxCandidates = 1000000000L

  /** The q138 regime detector AS CODE (it was SCALE.md prose through
    * round 6, against the engine's own "none survive as prose-only
    * advice" bar): an exact all-pairs similarity join's candidate
    * volume is Σ C(prefix-df, 2) over the inverted prefix index — a
    * quantity one cheap groupBy-agg over the narrow (hash) prefix rows
    * measures EXACTLY, before any pair is materialized. Above the
    * budget the operator refuses with the measured bound in the error
    * (never starts a shuffle that measurably cannot fit) and names the
    * LSH channel (q31/q32) as the scale path; the DuckDB
    * pre-measurement SCALE.md described is now this method. The sum is
    * decimal-accumulated: a single 10⁹-df key alone would overflow a
    * long sum. */
  private[graft] def ppjoinCandidateGate(s: SparkSession, prefix: DataFrame): Unit = {
    import s.implicits._
    val budget = s.conf.getOption("graft.ppjoin.maxCandidates")
      .map(_.toLong).getOrElse(PpjoinMaxCandidates)
    val bound = prefix.groupBy($"h").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(($"c".cast("decimal(38,0)") * ($"c" - 1)) / 2),
        lit(java.math.BigDecimal.ZERO)).as("cand"))
      .head().getDecimal(0).toBigInteger
    if (bound.compareTo(java.math.BigInteger.valueOf(budget)) > 0)
      throw new IllegalStateException(
        s"q138 exact set-similarity join refused: measured candidate bound " +
          s"Σ C(prefix-df, 2) = $bound exceeds graft.ppjoin.maxCandidates = " +
          s"$budget. This corpus is in the candidate-explosion regime — use " +
          "the LSH near-dup channel (q31/q32) unless completeness is " +
          "contractual, or raise the budget on a host sized for the shuffle.")
  }

  val catalog: Map[String, Q] = Map(

    // ---- pagerank over the near-dup pair graph: boilerplate-hub
    // centrality (see the pagerank scaladoc for the integer-mass
    // contract). Output is every doc's final mass in units of 1e-9
    // of a node's initial rank. ----
    "q116_pagerank" -> Q(
      (s, dir) => {
        import s.implicits._
        pagerank(s, dir).orderBy($"doc_id")
      },
      Some(s"""$oracleCtes${oPagerank(PrIters)}
        SELECT doc_id, r FROM r$PrIters ORDER BY doc_id""")),

    // ---- winnowing fingerprints: robust per-window argmin selection
    // (see the winnow scaladoc for the arithmetic tie-break contract).
    // Output is every selected (position, 60-bit gram hash) — the
    // ~2/(w+1)-density fingerprint stream a corpus-wide match join
    // would consume instead of the full positional spectrum. ----
    "q117_winnow_fingerprints" -> Q(
      (s, dir) => winnow(s, dir).orderBy(col("doc_id"), col("pos")),
      Some(s"""$winnowCtes
        SELECT doc_id, pos, fp FROM fps ORDER BY doc_id, pos""")),

    // ---- sorted-neighborhood blocking (Hernández/Stolfo '95): the
    // classic entity-resolution alternative to LSH banding — order the
    // corpus by a cheap canonical key (normalized text prefix) and
    // compare only records within a sliding window of the sort. One
    // total sort + lead() candidates + exact token-Jaccard verify; no
    // hashing, catches prefix-sharing near-dups LSH bands can miss at
    // low shingle overlap. Scale: the sort IS a range partition now —
    // snPairs sorts each range slice in place and restores boundary
    // exactness with a W-row heads overlap (O(W·P) driver metadata,
    // broadcast back), one streaming pass, O(W) state per task;
    // candidates are window-local (W−1 per row, text NOT carried —
    // pairs are id/key rows joined back to word sets); the verify is
    // bounded by W·n. The one-window spelling survives only as
    // snCandidatesWindowRef, the DedupSimSpec equality anchor. ----
    "q120_sorted_neighborhood" -> Q(
      (s, dir) => {
        import s.implicits._
        val cands = snCandidates(s, dir)
        graft.functions.SortedIntersectCount.register(s)
        val sets = codedSets(s, dir)
        cands
          .join(sets.select($"doc_id".as("id_a"), $"ws".as("wsa")), Seq("id_a"))
          .join(sets.select($"doc_id".as("id_b"), $"ws".as("wsb")), Seq("id_b"))
          .withColumn("c",
            graft.functions.SortedIntersectCount.sorted_intersect_count($"wsa", $"wsb"))
          .select($"id_a", $"id_b",
            rnd4($"c".cast("double") / (size($"wsa") + size($"wsb") - $"c")).as("jaccard"))
          .filter($"jaccard" >= 0.5)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""$oracleCtes$snCtes,
        sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY 1),
        inter AS (SELECT p.id_a, p.id_b, count(*) AS c FROM cands p
          JOIN shingles wa ON wa.doc_id=p.id_a
          JOIN shingles wb ON wb.doc_id=p.id_b AND wb.w=wa.w
          GROUP BY 1,2)
        SELECT * FROM (
          SELECT i.id_a, i.id_b,
            floor(cast(i.c as double)/(sa.n + sb.n - i.c) * 10000 + 0.5) / 10000.0 AS jaccard
          FROM inter i JOIN sizes sa ON sa.doc_id=i.id_a
          JOIN sizes sb ON sb.doc_id=i.id_b)
        WHERE jaccard >= 0.5 ORDER BY id_a, id_b""")),

    // ---- end-to-end entity resolution: multi-channel blocking (LSH
    // bands ∪ sorted-neighborhood windows — real ER stacks run several
    // cheap blocking passes and union the candidates), exact
    // token-Jaccard match decision at 0.5, transitive clustering, and
    // SURVIVORSHIP: each cluster's surviving record is its longest
    // member (n_chars desc, doc_id tie) — the "most complete record
    // wins" rule. Per-doc output: who absorbed whom. Scale: both
    // blocking channels are output-bounded candidate generators; the
    // verify joins shuffle only candidate ids + shingle sets; CC is
    // the large-star/small-star contraction; survivorship is one
    // per-cluster window over narrow rows. ----
    "q127_entity_resolution" -> Q(
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val allc = lshPairs(s, dir).select($"id_a", $"id_b")
          .unionByName(snCandidates(s, dir))
          .select(least($"id_a", $"id_b").as("id_a"),
            greatest($"id_a", $"id_b").as("id_b"))
          .distinct()
        graft.functions.SortedIntersectCount.register(s)
        val sets = codedSets(s, dir)
        val edges = allc
          .join(sets.select($"doc_id".as("id_a"), $"ws".as("wsa")), Seq("id_a"))
          .join(sets.select($"doc_id".as("id_b"), $"ws".as("wsb")), Seq("id_b"))
          .withColumn("c", graft.functions.SortedIntersectCount.sorted_intersect_count($"wsa", $"wsb"))
          .filter($"c".cast("double") / (size($"wsa") + size($"wsb") - $"c") >= 0.5)
          .select($"id_a", $"id_b")
        val labels = connectedComponents(docs.select($"doc_id"), edges)
        val wC = Window.partitionBy($"cluster_id")
        val full = wC.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        labels.join(docs.select($"doc_id", $"n_chars"), Seq("doc_id"))
          .withColumn("rep_doc", first($"doc_id")
            .over(wC.orderBy($"n_chars".desc, $"doc_id")
              .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .withColumn("n_members", count(lit(1)).over(full))
          .select($"doc_id", $"cluster_id", $"rep_doc", $"n_members")
          .orderBy($"doc_id")
      },
      Some(oracleCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + snCtes + s""",
        allc AS (SELECT DISTINCT least(id_a, id_b) AS id_a, greatest(id_a, id_b) AS id_b
          FROM (SELECT id_a, id_b FROM pairs UNION ALL SELECT id_a, id_b FROM cands)),
        sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY 1),
        inter AS (SELECT p.id_a, p.id_b, count(*) AS c FROM allc p
          JOIN shingles wa ON wa.doc_id=p.id_a
          JOIN shingles wb ON wb.doc_id=p.id_b AND wb.w=wa.w
          GROUP BY 1,2),
        e2 AS (SELECT i.id_a, i.id_b FROM inter i
          JOIN sizes sa ON sa.doc_id=i.id_a JOIN sizes sb ON sb.doc_id=i.id_b
          WHERE cast(i.c as double)/(sa.n + sb.n - i.c) >= 0.5),
        edges AS (SELECT id_a AS src, id_b AS dst FROM e2
          UNION ALL SELECT id_b, id_a FROM e2),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
        labels AS (SELECT node AS doc_id, min(lbl) AS cluster_id
          FROM reach GROUP BY node),
        sized AS (SELECT l.doc_id, l.cluster_id, d.n_chars
          FROM labels l JOIN documents d USING (doc_id)),
        surv AS (SELECT doc_id, cluster_id,
            first_value(doc_id) OVER (PARTITION BY cluster_id
              ORDER BY n_chars DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS rep_doc,
            count(*) OVER (PARTITION BY cluster_id) AS n_members
          FROM sized)
        SELECT doc_id, cluster_id, rep_doc, n_members
        FROM surv ORDER BY doc_id""")),

    // ---- exact dedup: group identical texts, keep lowest doc_id ----
    "q30_exact_dedup" -> Q(
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .groupBy($"text")
          .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .select($"keep_id", $"n_copies", md5($"text").as("text_md5"))
          .orderBy($"keep_id")
      },
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies, md5(text) AS text_md5
        FROM documents GROUP BY text ORDER BY keep_id""")),

    // ---- canonical-form dedup: normalize each doc (lowercase, strip
    // stopwords, collapse whitespace) and dedup on the md5 of the
    // canonical form — catches trivial near-dups ("the same text plus
    // a few articles") that byte-exact q30 misses, without paying
    // MinHash. Every doc emits one row carrying its canonical hash and
    // a keep flag (is it the group's min doc_id?), so the output
    // doubles as the drop-list. The normalizer is a codegen'd regex
    // chain that both engines evaluate identically (q63's rule: stay
    // within the syntax Java regex and RE2 share). Scale: one narrow
    // pass + one window keyed on the canonical hash — state per task
    // is one group's rows; no shuffle beyond that key. ----
    "q88_canonical_dedup" -> Q(
      (s, dir) => {
        import s.implicits._
        val stopRe = "\\b(the|a|of|and|in|to|is|it|for|on)\\b"
        val canon = trim(regexp_replace(
          regexp_replace(lower($"text"), stopRe, ""), "  *", " "))
        val nKept = when(length(canon) === 0, lit(0))
          .otherwise(size(split(canon, " ")))
        table(s, dir, "documents")
          .select($"doc_id",
            md5(canon).as("canon_md5"),
            size(split(lower($"text"), " ")).as("n_words"),
            nKept.as("n_kept"))
          .withColumn("keep",
            ($"doc_id" === min($"doc_id").over(
              org.apache.spark.sql.expressions.Window.partitionBy($"canon_md5")))
              .cast("int"))
          .orderBy($"doc_id")
      },
      Some {
        val canon = """trim(regexp_replace(regexp_replace(lower(text),
          '\b(the|a|of|and|in|to|is|it|for|on)\b', '', 'g'), '  *', ' ', 'g'))"""
        s"""WITH c AS (SELECT doc_id,
            md5($canon) AS canon_md5,
            cast(len(string_split(lower(text), ' ')) as int) AS n_words,
            cast(CASE WHEN length($canon) = 0 THEN 0
              ELSE len(string_split($canon, ' ')) END as int) AS n_kept
          FROM documents)
        SELECT doc_id, canon_md5, n_words, n_kept,
          cast(doc_id = min(doc_id) OVER (PARTITION BY canon_md5) as int) AS keep
        FROM c ORDER BY doc_id"""
      }),

    // ---- MinHash + LSH banding: candidate near-duplicate pairs ----
    "q31_minhash_lsh_pairs" -> Q(
      (s, dir) => lshPairs(s, dir).orderBy(col("id_a"), col("id_b")),
      Some(s"$oracleCtes SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b")),

    // ---- n-gram Jaccard: exact verification of the LSH candidates.
    // Shingle sets travel as arrays to the (small) candidate-pair set —
    // DICTIONARY-CODED sorted longs (codedSets), not strings, since
    // Jaccard needs only cardinalities; the intersection is a codegen'd
    // array op per pair — no shuffle proportional to shingle count. ----
    "q32_ngram_jaccard" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.functions.SortedIntersectCount.register(s)
        val sets = codedSets(s, dir)
        val inter = lshPairs(s, dir)
          .join(sets.select($"doc_id".as("id_a"), $"ws".as("wsa")), Seq("id_a"))
          .join(sets.select($"doc_id".as("id_b"), $"ws".as("wsb")), Seq("id_b"))
          .withColumn("c", graft.functions.SortedIntersectCount.sorted_intersect_count($"wsa", $"wsb"))
        inter
          .select($"id_a", $"id_b",
            rnd4($"c".cast("double") / (size($"wsa") + size($"wsb") - $"c")).as("jaccard"))
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""$oracleCtes,
        sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY 1),
        inter AS (SELECT p.id_a, p.id_b, count(*) AS c FROM pairs p
          JOIN shingles wa ON wa.doc_id=p.id_a
          JOIN shingles wb ON wb.doc_id=p.id_b AND wb.w=wa.w
          GROUP BY 1,2)
        SELECT i.id_a, i.id_b,
          floor(cast(i.c as double)/(sa.n + sb.n - i.c) * 10000 + 0.5) / 10000.0 AS jaccard
        FROM inter i JOIN sizes sa ON sa.doc_id=i.id_a
        JOIN sizes sb ON sb.doc_id=i.id_b
        ORDER BY i.id_a, i.id_b""")),

    // ---- exact set-similarity self-join: ALL pairs with shingle
    // Jaccard >= 0.6, guaranteed complete — the exact counterpart to
    // q32, whose candidate set is LSH's (high-probability, not
    // certain) recall. Prefix filtering (Bayardo et al. "Scaling Up
    // All Pairs Similarity Search" WWW'07; Xiao et al. PPJoin WWW'08):
    // order each doc's shingles by ascending global document
    // frequency, keep only the first n - ceil(0.6n) + 1 as the doc's
    // prefix; any pair with J >= 0.6 shares >= ceil(0.6*max(na,nb))
    // shingles, so by pigeonhole it shares at least one PREFIX
    // shingle — the inverted-index join on prefix shingles alone is
    // complete, and the df-ascending order stuffs prefixes with the
    // rarest shingles so index buckets stay small. A length filter
    // (5*min >= 3*max, necessary since c <= min and c >= 0.6*max)
    // prunes in the join condition; the index joins on xxhash64 of
    // the shingle — 8-byte longs through the hot exchange, and a
    // hash collision can only ADD a candidate (equal shingles always
    // hash equal), never drop one, so completeness survives and the
    // exact verify kills the strays. Verification is q32's
    // candidate-bounded array spelling: candidate ids join each doc's
    // collected shingle set once, `array_intersect` is row-local —
    // NOT a per-shingle exploded join, which would put |pairs| ×
    // |shingles/doc| rows through a shuffle (measured: that spelling
    // spilled the 100× probe to death). The threshold is integer
    // cross-multiplied (J >= 3/5 <=> 8c >= 3(na+nb)) and the output
    // carries (inter, un) as exact longs — no float anywhere, so the
    // driver hash is engine-exact. Scale: df is one vocab-sized agg;
    // the rank window is per-doc; nothing is all-pairs — the oracle's
    // brute-force self-join is the spelling this operator exists to
    // avoid. The honest bound: candidate volume is Σ C(prefix-df, 2),
    // which a small-vocabulary twin-dense corpus (the 100× probe's
    // designed worst case: 19k shingles over 500k docs) drives to
    // ~1.1B rows — exactness at that density is a measured tax
    // (SCALE.md), the same class as q35/q36/q123, and the LSH channel
    // (q31/q32) is the scale path when completeness is not
    // contractual. ----
    "q138_set_similarity_join" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.functions.WordShingles.register(s)
        val toks = table(s, dir, "documents").select($"doc_id",
          explode(array_distinct(
            graft.functions.WordShingles.word_shingles(lower($"text"), 3))).as("w"))
        val dfw = toks.groupBy($"w").agg(count(lit(1)).as("dfw"))
        val sizes = toks.groupBy($"doc_id").agg(count(lit(1)).as("n"))
        // persisted across gate + join: the gate's candidate-bound agg
        // and the self-join both consume `prefix`, and without the
        // cache the gate's honest price was a full second evaluation
        // of the shingle/rank plan (measured at sf0.1: 0.87 → 1.48 s
        // isolated). The narrow (doc_id, h, rk, n) frame is exactly
        // what both consumers need; released in the finally below.
        val prefix = toks.join(dfw, Seq("w"))
          .withColumn("rk", row_number().over(
            Window.partitionBy($"doc_id").orderBy($"dfw", $"w")))
          .join(sizes, Seq("doc_id"))
          .select($"doc_id", xxhash64($"w").as("h"), $"rk", $"n")
          .filter($"rk" <= $"n" - expr("(3*n + 4) div 5") + 1)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
        // positional filter (PPJoin): a qualifying pair's FIRST shared
        // shingle under the global (df, w) order has the smallest rank
        // among shared shingles in BOTH docs, so the c−1 remaining
        // shared shingles all rank after it: c ≤ 1 + min(na−rka,
        // nb−rkb). Rows whose positions can't reach the overlap bound
        // α = ceil(3(na+nb)/8) are never the first-shared-entry of a
        // true pair — dropping them is completeness-preserving and
        // cuts the pre-distinct candidate stream 3.4× on the 100×
        // twin corpus (3.85B → 1.12B rows, measured)
        // the gate's agg doubles as the cache materialization — the
        // join below reads the persisted blocks, not the plan
        ppjoinCandidateGate(s, prefix)
        val cand = prefix.as("a").join(prefix.as("b"),
            $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id" &&
              lit(5) * least($"a.n", $"b.n") >= lit(3) * greatest($"a.n", $"b.n") &&
              least($"a.n" - $"a.rk", $"b.n" - $"b.rk") + 1 >=
                floor((($"a.n" + $"b.n") * 3 + 7) / 8).cast("long"))
          .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
          .distinct()
        // verify ships the dictionary-coded sets (codedSets: same
        // distinct-shingle universe as toks, bijectively coded — inter/
        // na/nb are cardinalities, invariant under the coding)
        graft.functions.SortedIntersectCount.register(s)
        val sets = codedSets(s, dir)
        // the verified pair set is materialized EAGERLY (it is tiny —
        // pairs above the 0.6 threshold) so the persisted prefix can
        // be released before the query returns, not at session GC
        cand
          .join(sets.select($"doc_id".as("id_a"), $"ws".as("wsa")), Seq("id_a"))
          .join(sets.select($"doc_id".as("id_b"), $"ws".as("wsb")), Seq("id_b"))
          .withColumn("inter", graft.functions.SortedIntersectCount.sorted_intersect_count($"wsa", $"wsb").cast("long"))
          .withColumn("na", size($"wsa").cast("long"))
          .withColumn("nb", size($"wsb").cast("long"))
          .filter(lit(8) * $"inter" >= lit(3) * ($"na" + $"nb"))
          .select($"id_a", $"id_b", $"inter",
            ($"na" + $"nb" - $"inter").as("un"))
          .orderBy($"id_a", $"id_b")
          .localCheckpoint()
        } finally prefix.unpersist(blocking = true)
      },
      Some(s"""$oracleCtes,
        sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY 1),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM shingles a JOIN shingles b
          ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT i.id_a, i.id_b, cast(i.c AS bigint) AS inter,
          cast(sa.n + sb.n - i.c AS bigint) AS un
        FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
        JOIN sizes sb ON sb.doc_id = i.id_b
        WHERE 8 * i.c >= 3 * (sa.n + sb.n)
        ORDER BY id_a, id_b""")),

    // ---- containment screen: the ASYMMETRIC complement to q32's
    // Jaccard — containment(A in B) = |A∩B| / |A| catches the
    // quote-heavy or wrapper page that CONTAINS another doc whole
    // (Jaccard stays low when the container is much longer, so a
    // symmetric threshold misses it; Broder's original resemblance
    // paper treats containment as the second first-class measure).
    // Same LSH-pruned candidate set and shingle-set arithmetic as
    // q32, two divisions instead of one. ----
    "q133_containment" -> Q(
      (s, dir) => containmentScreen(s, dir, lshPairs(s, dir)),
      Some(s"""$oracleCtes,
        sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY 1),
        inter AS (SELECT p.id_a, p.id_b, count(*) AS c FROM pairs p
          JOIN shingles wa ON wa.doc_id=p.id_a
          JOIN shingles wb ON wb.doc_id=p.id_b AND wb.w=wa.w
          GROUP BY 1,2)
        SELECT * FROM (
          SELECT i.id_a, i.id_b,
            floor(cast(i.c as double)/sa.n * 10000 + 0.5) / 10000.0 AS cont_a_in_b,
            floor(cast(i.c as double)/sb.n * 10000 + 0.5) / 10000.0 AS cont_b_in_a
          FROM inter i JOIN sizes sa ON sa.doc_id=i.id_a
          JOIN sizes sb ON sb.doc_id=i.id_b)
        WHERE cont_a_in_b >= 0.8 OR cont_b_in_a >= 0.8
        ORDER BY id_a, id_b""")),

    // ---- dedup clusters: connected components over LSH pairs, each
    // doc labeled with its component's canonical (min) doc_id. Oracle
    // = transitive closure via recursive CTE. ----
    "q45_dedup_clusters" -> Q(
      (s, dir) => {
        import s.implicits._
        clusterLabels(s, dir).orderBy($"doc_id")
      },
      Some(oracleCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + s""",
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node)
        SELECT node AS doc_id, min(lbl) AS cluster_id
        FROM reach GROUP BY node ORDER BY doc_id""")),

    // ---- incremental cluster maintenance, end to end: snapshot the
    // md5-gated ~90% corpus slice into a store (band index + cluster
    // labels), merge the remaining ~10% as an arriving batch via the
    // supernode contraction, return the combined labels. The oracle is
    // q45's full-corpus recursive-CTE closure — the contract is that
    // the O(batch + clusters) merge is INDISTINGUISHABLE from
    // re-clustering everything. The snapshot is written ONCE per
    // (dir, gate) per JVM (VERDICT r5 next #5): in production the
    // store is a maintained artifact that exists before a batch
    // arrives, so the catalog query times the MERGE — the operator
    // under test — not a repeated snapshot rebuild; the once-per-
    // snapshot write cost is measured separately (SCALE.md round-5
    // addendum: 55.3 s write vs 17.6 s merge at 100×). ----
    "q137_incremental_clusters" -> Q(
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val gate = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
          .cast("long")
        val idx = snapshotStore(s, dir, 58982L)
        IndexStore.incrementalClusters(s, idx, docs.filter(gate >= 58982L))
          .orderBy($"doc_id")
      },
      Some(oracleCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + s""",
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node)
        SELECT node AS doc_id, min(lbl) AS cluster_id
        FROM reach GROUP BY node ORDER BY doc_id""")),

    // ---- dedup report: the governance numbers a curation run ships —
    // cluster-SIZE histogram (how much of the corpus sits in 1-, 2-,
    // k-member near-dup clusters) plus the corpus duplication factor
    // (docs per surviving canonical). Rides the memoized cluster
    // labels; everything after is two partial aggs over O(clusters)
    // rows + a 1-row broadcast ratio. ----
    "q129_dedup_report" -> Q(
      (s, dir) => dedupReportFrom(s, clusterLabels(s, dir)),
      Some(oracleCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + s""",
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
        labels AS (SELECT node AS doc_id, min(lbl) AS cluster_id
          FROM reach GROUP BY node),
        sizes AS (SELECT cluster_id, count(*) AS k FROM labels GROUP BY 1),
        totals AS (SELECT cast(sum(k) as bigint) AS n_docs,
            count(*) AS n_clusters FROM sizes)
        SELECT k, count(*) AS n_clusters_of_k,
          cast(k * count(*) as bigint) AS docs_covered,
          ${oRnd4("(SELECT cast(n_docs as double) / n_clusters FROM totals)")} AS dup_factor
        FROM sizes GROUP BY k ORDER BY k""")),

    // ---- cross-source duplicate matrix: which sources duplicate into
    // which — the attribution report that tells a pipeline owner WHERE
    // the near-dup mass comes from (mirror sites, syndication, intra-
    // source boilerplate on the diagonal). One join of the bounded
    // pair list to a narrow (doc_id, source) frame, then an O(sources²)
    // agg; source pairs are unordered (least/greatest) so mirror
    // directions collapse. ----
    "q130_cross_source_dups" -> Q(
      (s, dir) => {
        import s.implicits._
        val src = table(s, dir, "documents").select($"doc_id", $"source")
        lshPairs(s, dir)
          .join(src.select($"doc_id".as("id_a"), $"source".as("sa")), Seq("id_a"))
          .join(src.select($"doc_id".as("id_b"), $"source".as("sb")), Seq("id_b"))
          .groupBy(least($"sa", $"sb").as("source_x"),
            greatest($"sa", $"sb").as("source_y"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy($"source_x", $"source_y")
      },
      Some(s"""$oracleCtes
        SELECT least(da.source, db.source) AS source_x,
          greatest(da.source, db.source) AS source_y,
          count(*) AS n_pairs
        FROM pairs p
        JOIN documents da ON da.doc_id = p.id_a
        JOIN documents db ON db.doc_id = p.id_b
        GROUP BY 1, 2 ORDER BY source_x, source_y""")),

    // ---- edit-distance verification of LSH candidates: levenshtein
    // over a bounded prefix (the full-text DP is O(len²) per pair —
    // bound the window, or use it only on high-jaccard survivors) ----
    "q54_edit_distance" -> Q(
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents").select($"doc_id", substring(lower($"text"), 1, 64).as("pfx"))
        lshPairs(s, dir)
          .join(docs.select($"doc_id".as("id_a"), $"pfx".as("pfx_a")), Seq("id_a"))
          .join(docs.select($"doc_id".as("id_b"), $"pfx".as("pfx_b")), Seq("id_b"))
          .select($"id_a", $"id_b", levenshtein($"pfx_a", $"pfx_b").as("prefix_edit_dist"))
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""$oracleCtes
        SELECT p.id_a, p.id_b,
          levenshtein(substr(lower(da.text),1,64), substr(lower(db.text),1,64)) AS prefix_edit_dist
        FROM pairs p
        JOIN documents da ON da.doc_id = p.id_a
        JOIN documents db ON db.doc_id = p.id_b
        ORDER BY p.id_a, p.id_b""")),

    // ---- incremental dedup: screen an incoming batch (deterministic
    // ~10% hash-gated slice stands in for "today's crawl") against the
    // EXISTING corpus — exact text-hash matches and LSH band-bucket
    // collisions — without ever comparing incoming docs to each other
    // or re-deduplicating the existing side. This is the shape that
    // matters at 100 TB: the full corpus is minhashed ONCE (here the
    // memoized band keys; in production the stored signature index) and
    // each day's batch joins against that index — work is O(batch), not
    // O(corpus). Both screens are semi-joins, so band-bucket fan-out
    // never materializes pairs. ----
    "q71_incremental_dedup" -> Q(
      (s, dir) => {
        import s.implicits._
        val T = 58982L // uint16 gate ≈ 10% incoming
        def gate(c: Column) = conv(substring(md5(c.cast("string")), 1, 4), 16, 10).cast("long")
        val docs = table(s, dir, "documents")
        val b = bandKeys(s, dir)
        val nearHits = b.filter(gate($"doc_id") >= T).as("i")
          .join(b.filter(gate($"doc_id") < T).as("e"),
            $"i.band" === $"e.band" && $"i.band_key" === $"e.band_key", "left_semi")
          .select($"doc_id").distinct()
        val th = docs.select($"doc_id", md5($"text").as("t"))
        val exactHits = th.filter(gate($"doc_id") >= T)
          .join(th.filter(gate($"doc_id") < T).select($"t").distinct(),
            Seq("t"), "left_semi")
          .select($"doc_id")
        docs.filter(gate($"doc_id") >= T).select($"doc_id")
          .join(exactHits.withColumn("ex", lit(1)), Seq("doc_id"), "left")
          .join(nearHits.withColumn("nr", lit(1)), Seq("doc_id"), "left")
          .select($"doc_id",
            coalesce($"ex", lit(0)).as("exact_dup"),
            coalesce($"nr", lit(0)).as("near_dup"),
            when($"ex" === 1, "drop_exact").when($"nr" === 1, "drop_near")
              .otherwise("keep").as("decision"))
          .orderBy($"doc_id")
      },
      Some(s"""$oracleCtes,
        g AS (SELECT doc_id, CAST('0x' || substr(md5(cast(doc_id as varchar)), 1, 4) AS BIGINT) AS gv
          FROM documents),
        exb AS (SELECT b.* FROM bands b JOIN g USING (doc_id) WHERE g.gv < 58982),
        incb AS (SELECT b.* FROM bands b JOIN g USING (doc_id) WHERE g.gv >= 58982),
        near AS (SELECT DISTINCT i.doc_id FROM incb i
          JOIN exb e ON i.band = e.band AND i.band_key = e.band_key),
        tex AS (SELECT DISTINCT md5(text) AS t FROM documents d JOIN g USING (doc_id)
          WHERE g.gv < 58982),
        exct AS (SELECT DISTINCT d.doc_id FROM documents d JOIN g USING (doc_id)
          JOIN tex ON md5(d.text) = tex.t WHERE g.gv >= 58982)
        SELECT d.doc_id,
          CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END AS exact_dup,
          CASE WHEN nr.doc_id IS NOT NULL THEN 1 ELSE 0 END AS near_dup,
          CASE WHEN ex.doc_id IS NOT NULL THEN 'drop_exact'
               WHEN nr.doc_id IS NOT NULL THEN 'drop_near' ELSE 'keep' END AS decision
        FROM documents d JOIN g USING (doc_id)
        LEFT JOIN exct ex ON ex.doc_id = d.doc_id
        LEFT JOIN near nr ON nr.doc_id = d.doc_id
        WHERE g.gv >= 58982 ORDER BY d.doc_id""")),

    // ---- bloom-screened incremental exact dedup: q71's "screen
    // today's batch against the stored corpus" with the corpus side
    // compressed into Spark's own runtime-filter Bloom sketch
    // (BloomFilterAggregate, exposed as SQL `bloom_agg` /
    // `bloom_contains` — see functions/BloomFuncs.scala). The sketch
    // has NO false negatives, so it is a sound prefilter: batch docs
    // whose fingerprint misses the bloom are definitely new and never
    // enter a shuffle; only bloom HITS (true dups + the sketch's few
    // false positives) reach the exact anti-join. Output is therefore
    // EXACTLY the exact anti-join's output — oracle-checked, while the
    // join shuffles O(hits), not O(batch). At 100 TB the sketch is
    // built once from the stored fingerprint index, persisted, and
    // broadcast to each day's screen (here the scalar subquery builds
    // it in-query; ReuseSubquery collapses the two textual copies —
    // and an UNDERSIZED sketch degrades only selectivity, never
    // correctness). ----
    "q81_bloom_screen" -> Q(
      (s, dir) => {
        graft.functions.BloomFuncs.register(s)
        table(s, dir, "documents").createOrReplaceTempView("docs_q81")
        s.sql("""
          WITH g AS (SELECT doc_id, md5(text) AS fp,
              CAST(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) AS BIGINT) AS gv
            FROM docs_q81),
          corpus AS (SELECT fp FROM g WHERE gv < 58982),
          batch AS (SELECT doc_id, fp FROM g WHERE gv >= 58982),
          flagged AS (SELECT doc_id, fp,
              bloom_contains((SELECT bloom_agg(xxhash64(fp), 100000L) FROM corpus),
                xxhash64(fp)) AS maybe
            FROM batch)
          SELECT doc_id, fp FROM flagged WHERE NOT maybe
          UNION ALL
          SELECT f.doc_id, f.fp
          FROM (SELECT doc_id, fp FROM flagged WHERE maybe) f
          LEFT ANTI JOIN corpus c ON f.fp = c.fp
          ORDER BY doc_id""")
      },
      Some("""WITH g AS (SELECT doc_id, md5(text) AS fp,
            CAST('0x' || substr(md5(cast(doc_id as varchar)), 1, 4) AS BIGINT) AS gv
          FROM documents)
        SELECT b.doc_id, b.fp FROM g b
        WHERE b.gv >= 58982 AND NOT EXISTS (
          SELECT 1 FROM g c WHERE c.gv < 58982 AND c.fp = b.fp)
        ORDER BY b.doc_id""")),

    // ---- SimHash (16-bit variant; bit j comes from hex digit j/4 of
    // md5(word), so both engines derive identical bits) ----
    "q33_simhash" -> Q(
      (s, dir) => {
        import s.implicits._
        val words = table(s, dir, "documents")
          .select($"doc_id", explode(array_distinct(split(lower($"text"), " "))).as("w"))
          .filter(length($"w") > 0)
        val bits = words
          .withColumn("bit", explode(sequence(lit(0), lit(15))))
          .withColumn("hexval",
            conv(expr("substr(md5(w), cast(bit/4 as int) + 1, 1)"), 16, 10).cast("int"))
          .withColumn("sgn",
            when(expr("shiftright(hexval, cast(bit % 4 as int)) % 2") === 1, lit(1))
              .otherwise(lit(-1)))
          .groupBy($"doc_id", $"bit").agg(sum($"sgn").as("s"))
        bits
          .groupBy($"doc_id")
          .agg(sum(when($"s" >= 0, expr("shiftleft(1L, cast(bit as int))")).otherwise(0L))
            .as("simhash"))
          .orderBy($"doc_id")
      },
      Some("""WITH words AS (SELECT DISTINCT doc_id, w FROM
          (SELECT doc_id, unnest(string_split(lower(text),' ')) AS w FROM documents)
          WHERE length(w)>0),
        bits AS (SELECT doc_id, b.i AS bit,
          sum(CASE WHEN (
            (strpos('0123456789abcdef', substr(md5(w), cast(floor(b.i/4) as int)+1, 1)) - 1)
            >> (b.i % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS s
          FROM words CROSS JOIN range(16) b(i) GROUP BY 1,2)
        SELECT doc_id,
          cast(sum(CASE WHEN s >= 0 THEN 1 << bit ELSE 0 END) as bigint) AS simhash
        FROM bits GROUP BY doc_id ORDER BY doc_id""")),

    // ---- SimHash near-duplicate JOIN (Manku/Jain/Das Sarma, WWW'07 —
    // the Google web-crawl dedup): 60-bit per-doc fingerprint (15 md5
    // hex digits × 4 bits, majority vote per bit over the doc's
    // distinct words; 60 bits keeps every shift inside int64 in both
    // engines), then the PIGEONHOLE block join — any pair within
    // Hamming distance 3 must agree exactly on ≥1 of 4 disjoint
    // 15-bit blocks — and an exact bit_count(xor) ≤ 3 verify on the
    // candidates. Complements MinHash: simhash candidates share
    // near-identical term DISTRIBUTIONS (weighted bits), not shingle
    // sets. Scale: the fingerprint is two partial-agg groupBys (doc ×
    // 15 digit rows, never full text); the block join's fan-out is
    // Σ occupancy² over 4 × 2¹⁵ buckets — the bucket-width knob is
    // block count/width exactly as in the paper; verify is one codegen
    // integer op per candidate. ----
    "q128_simhash_join" -> Q(
      // candidate + FIRST-MATCH verify machinery lives in
      // [[pigeonholePairs]] (shared with the byte-level q141)
      (s, dir) => pigeonholePairs(simBlocks(simhash60(table(s, dir, "documents")))),
      Some("""WITH words AS (SELECT DISTINCT doc_id, w FROM
          (SELECT doc_id, unnest(string_split(lower(text),' ')) AS w FROM documents)
          WHERE length(w)>0),
        nib AS (SELECT doc_id, d, count(*) AS cnt,
            sum(hv & 1) AS s0, sum((hv >> 1) & 1) AS s1,
            sum((hv >> 2) & 1) AS s2, sum((hv >> 3) & 1) AS s3
          FROM (SELECT doc_id, b.i AS d,
              strpos('0123456789abcdef', substr(md5(w), cast(b.i as int) + 1, 1)) - 1 AS hv
            FROM words CROSS JOIN range(15) b(i))
          GROUP BY 1, 2),
        sims AS (SELECT doc_id, cast(sum(
            cast(CASE WHEN 2*s0 >= cnt THEN 1 ELSE 0 END
               + CASE WHEN 2*s1 >= cnt THEN 2 ELSE 0 END
               + CASE WHEN 2*s2 >= cnt THEN 4 ELSE 0 END
               + CASE WHEN 2*s3 >= cnt THEN 8 ELSE 0 END as bigint) << (d * 4))
            as bigint) AS sim
          FROM nib GROUP BY 1),
        blocks AS (SELECT doc_id, sim, b.i AS b, (sim >> (b.i * 15)) & 32767 AS bv
          FROM sims CROSS JOIN range(4) b(i)),
        cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
            x.sim AS sa, y.sim AS sb
          FROM blocks x JOIN blocks y
            ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id)
        SELECT id_a, id_b, cast(bit_count(xor(sa, sb)) as bigint) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= 3
        ORDER BY id_a, id_b""")),

    // ---- leakage-safe train/val/test split: the gate hashes the dedup
    // CLUSTER id, not the doc id, so near-duplicate documents can never
    // straddle a split boundary — the classic way eval contamination
    // sneaks past a q90-style per-doc split (a train doc's near-twin
    // lands in test and the model "memorizes" the answer). Assignment
    // is still a pure deterministic function (of the corpus snapshot's
    // clustering), docs in the same cluster move together by
    // construction, and the split column itself is one narrow
    // expression over the memoized cluster labels — the labels are
    // computed once per snapshot (q45's frame) and every downstream
    // stage reuses them. 80/10/10 here (cluster-granularity holdouts
    // need more mass than q90's 1% to be non-degenerate). Scale: one
    // broadcast-sized gate expression over the label frame + a doc_id
    // equi-join + a groupBy bounded by 3 × sources. ----
    "q102_cluster_safe_split" -> Q(
      (s, dir) => {
        import s.implicits._
        val gate = conv(substring(md5($"cluster_id".cast("string")), 1, 4), 16, 10).cast("long")
        val split = when(gate < 52429L, "train").when(gate < 58982L, "val").otherwise("test")
        clusterLabels(s, dir)
          .select($"doc_id", $"cluster_id", split.as("split"))
          .join(table(s, dir, "documents").select($"doc_id", $"source", $"n_chars"), Seq("doc_id"))
          .groupBy($"split", $"source")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct($"cluster_id").as("n_clusters"),
            sum($"n_chars").as("n_chars"))
          .orderBy($"split", $"source")
      },
      Some(oracleCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + s""",
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
        labels AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node),
        assigned AS (SELECT doc_id, cluster_id,
            CASE WHEN CAST('0x' || substr(md5(cast(cluster_id as varchar)), 1, 4) AS BIGINT) < 52429 THEN 'train'
                 WHEN CAST('0x' || substr(md5(cast(cluster_id as varchar)), 1, 4) AS BIGINT) < 58982 THEN 'val'
                 ELSE 'test' END AS split
          FROM labels)
        SELECT a.split, d.source, count(*) AS n_docs,
          count(DISTINCT a.cluster_id) AS n_clusters,
          cast(sum(d.n_chars) as bigint) AS n_chars
        FROM assigned a JOIN documents d ON d.doc_id = a.doc_id
        GROUP BY 1, 2 ORDER BY split, source""")),

    // ---- split-contamination audit: for every near-dup candidate
    // pair, does the holdout assignment separate the twins? Scores the
    // naive per-doc gate (q90's method, at q102's 80/10/10 thresholds)
    // against the cluster gate (q102's method) on the SAME pair set —
    // the doc gate leaks ~2·p·(1−p) of near-dup pairs across the
    // boundary, the cluster gate provably zero. This is the audit a
    // pipeline runs BEFORE training to certify its eval split; both
    // counts are oracle-checked, so the "cluster_gate n_cross = 0"
    // guarantee is pinned by the driver, not just a spec. Scale: two
    // broadcast-shaped joins of the pair list against the label frame
    // (both already materialized by the dedup stages). ----
    "q108_split_contamination" -> Q(
      (s, dir) => {
        import s.implicits._
        val gate = (c: Column) =>
          conv(substring(md5(c.cast("string")), 1, 4), 16, 10).cast("long")
        val splitOf = (g: Column) =>
          when(g < 52429L, "train").when(g < 58982L, "val").otherwise("test")
        val assign = clusterLabels(s, dir).select($"doc_id",
          splitOf(gate($"doc_id")).as("doc_split"),
          splitOf(gate($"cluster_id")).as("cl_split"))
        val j = lshPairs(s, dir)
          .join(assign.as("a"), $"id_a" === $"a.doc_id")
          .join(assign.as("b"), $"id_b" === $"b.doc_id")
        val byDoc = j.select(lit("doc_gate").as("method"),
          ($"a.doc_split" =!= $"b.doc_split").cast("long").as("x"))
        val byCl = j.select(lit("cluster_gate").as("method"),
          ($"a.cl_split" =!= $"b.cl_split").cast("long").as("x"))
        byDoc.unionAll(byCl)
          .groupBy($"method")
          .agg(count(lit(1)).as("n_pairs"), sum($"x").as("n_cross"))
          .orderBy($"method")
      },
      Some(oracleCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + s""",
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
        labels AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node),
        assign AS (SELECT doc_id,
            CASE WHEN CAST('0x' || substr(md5(cast(doc_id as varchar)), 1, 4) AS BIGINT) < 52429 THEN 'train'
                 WHEN CAST('0x' || substr(md5(cast(doc_id as varchar)), 1, 4) AS BIGINT) < 58982 THEN 'val'
                 ELSE 'test' END AS doc_split,
            CASE WHEN CAST('0x' || substr(md5(cast(cluster_id as varchar)), 1, 4) AS BIGINT) < 52429 THEN 'train'
                 WHEN CAST('0x' || substr(md5(cast(cluster_id as varchar)), 1, 4) AS BIGINT) < 58982 THEN 'val'
                 ELSE 'test' END AS cl_split
          FROM labels)
        SELECT method, count(*) AS n_pairs, cast(sum(x) as bigint) AS n_cross FROM (
          SELECT 'doc_gate' AS method,
            CASE WHEN a.doc_split <> b.doc_split THEN 1 ELSE 0 END AS x
          FROM pairs p JOIN assign a ON a.doc_id = p.id_a
            JOIN assign b ON b.doc_id = p.id_b
          UNION ALL
          SELECT 'cluster_gate',
            CASE WHEN a.cl_split <> b.cl_split THEN 1 ELSE 0 END
          FROM pairs p JOIN assign a ON a.doc_id = p.id_a
            JOIN assign b ON b.doc_id = p.id_b)
        GROUP BY method ORDER BY method""")),

    // ---- sketch-quality audit: per candidate pair, the minhash
    // ESTIMATE of Jaccard (fraction of the 16 signature slots that
    // collide — the quantity LSH actually thresholds on) next to the
    // EXACT shingle Jaccard and the absolute error. This is how you
    // tune rows-per-band before a 100 TB run: if the error
    // distribution is wide at the 0.8 operating point, you need more
    // hashes, and you want to learn that from an audit query, not
    // from a leaked near-dup. Signatures are REUSED from the memoized
    // band-key frame, reassembled ROW-WISE into one 16-slot array per
    // doc (band-ascending, slot order inside each band's CSV) — so the
    // est side is two joins of the pair list against a 1-row-per-doc
    // frame and a per-pair 16-element zip-compare, NOT a join against
    // 16-rows-per-doc position rows (which put |pairs|×16 rows through
    // two shuffles and a pair-keyed agg — 430M rows at the 100×
    // probe, measured 145 s; the whole agg existed only to reassemble
    // what one row can carry). ----
    "q109_sketch_quality" -> Q(
      (s, dir) => {
        import s.implicits._
        val sigArr = bandKeys(s, dir)
          .groupBy($"doc_id")
          .agg(array_sort(collect_list(struct($"band", $"band_key"))).as("bk"))
          .select($"doc_id",
            flatten(transform($"bk", b => split(b("band_key"), ","))).as("hs"))
        val est = lshPairs(s, dir)
          .join(sigArr.select($"doc_id".as("id_a"), $"hs".as("ha")), Seq("id_a"))
          .join(sigArr.select($"doc_id".as("id_b"), $"hs".as("hb")), Seq("id_b"))
          .select($"id_a", $"id_b",
            rnd4(size(filter(zip_with($"ha", $"hb", (x, y) => x === y),
              m => m)).cast("double") / 16.0).as("est_jaccard"))
        graft.functions.SortedIntersectCount.register(s)
        val sets = codedSets(s, dir)
        val exact = lshPairs(s, dir)
          .join(sets.select($"doc_id".as("id_a"), $"ws".as("wsa")), Seq("id_a"))
          .join(sets.select($"doc_id".as("id_b"), $"ws".as("wsb")), Seq("id_b"))
          .withColumn("c", graft.functions.SortedIntersectCount.sorted_intersect_count($"wsa", $"wsb"))
          .select($"id_a", $"id_b",
            rnd4($"c".cast("double") / (size($"wsa") + size($"wsb") - $"c")).as("jaccard"))
        est.join(exact, Seq("id_a", "id_b"))
          .select($"id_a", $"id_b", $"est_jaccard", $"jaccard",
            rnd4(abs($"est_jaccard" - $"jaccard")).as("abs_err"))
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""$oracleCtes,
        est AS (SELECT p.id_a, p.id_b,
            sum(CASE WHEN a.hmin = b.hmin THEN 1 ELSE 0 END) AS m
          FROM pairs p JOIN mh a ON a.doc_id = p.id_a
            JOIN mh b ON b.doc_id = p.id_b AND b.i = a.i
          GROUP BY 1, 2),
        sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY 1),
        inter AS (SELECT p.id_a, p.id_b, count(*) AS c FROM pairs p
          JOIN shingles wa ON wa.doc_id=p.id_a
          JOIN shingles wb ON wb.doc_id=p.id_b AND wb.w=wa.w
          GROUP BY 1,2),
        cmp AS (SELECT e.id_a, e.id_b,
            floor(cast(e.m as double) / 16.0 * 10000 + 0.5) / 10000.0 AS est_jaccard,
            floor(cast(i.c as double) / (sa.n + sb.n - i.c) * 10000 + 0.5) / 10000.0 AS jaccard
          FROM est e JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
          JOIN sizes sa ON sa.doc_id = e.id_a
          JOIN sizes sb ON sb.doc_id = e.id_b)
        SELECT id_a, id_b, est_jaccard, jaccard,
          floor(abs(est_jaccard - jaccard) * 10000 + 0.5) / 10000.0 AS abs_err
        FROM cmp ORDER BY id_a, id_b""")),

    // ---- duplicated spans: maximal ≥SpanK-word runs occurring ≥2×
    // corpus-wide (exact sequence-level dedup — see the SpanK scaladoc
    // for the plan shape and why this replaces the suffix array). ----
    "q112_duplicate_spans" -> Q(
      (s, dir) => {
        import s.implicits._
        duplicateSpans(s, dir)
          .select($"doc_id",
            $"span_start".cast("long").as("span_start"),
            $"span_end".cast("long").as("span_end"),
            ($"span_end" - $"span_start" + 1).cast("long").as("span_words"))
          .orderBy($"doc_id", $"span_start")
      },
      Some(s"""$spanCtes
        SELECT doc_id, span_start, span_end,
          span_end - span_start + 1 AS span_words
        FROM spans ORDER BY doc_id, span_start""")),

    // ---- span scrub: cut the duplicated spans out of each document
    // and witness the result byte-exactly (md5 of the rejoined kept
    // words). The only token-sized exchanges are the gram-key shuffle
    // q112 already pays (shared memo) and one anti-join of (doc_id,
    // pos) int pairs against the exploded span ranges — span coverage
    // is output-bounded, and raw text never enters a shuffle: the
    // rejoin groups (pos, word) pairs BY DOC KEY, so each task
    // reassembles whole documents locally. ----
    "q113_span_scrub" -> Q(
      (s, dir) => scrubBySpans(s, table(s, dir, "documents"),
        duplicateSpans(s, dir)),
      Some(s"""$spanCtes,
        cov AS (SELECT doc_id, unnest(generate_series(span_start, span_end)) AS pos FROM spans),
        tk AS (SELECT doc_id, i - 1 AS pos, ws[i] AS w
          FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM toks)),
        kept AS (SELECT t.doc_id, t.pos, t.w FROM tk t
          LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
          WHERE c.doc_id IS NULL),
        ag AS (SELECT doc_id, count(*) AS n_kept,
            md5(string_agg(w, ' ' ORDER BY pos)) AS clean_md5
          FROM kept GROUP BY 1)
        SELECT d.doc_id,
          cast(len(string_split(lower(d.text), ' ')) as int) AS n_words,
          coalesce(a.n_kept, 0) AS n_kept,
          cast(len(string_split(lower(d.text), ' ')) as bigint) - coalesce(a.n_kept, 0) AS n_removed,
          coalesce(a.clean_md5, md5('')) AS clean_md5
        FROM documents d LEFT JOIN ag a USING (doc_id) ORDER BY doc_id"""))
  )
}
