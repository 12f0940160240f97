package graft.ops

import org.apache.spark.sql.functions._
import graft.Core._

/** The end-to-end training-data curation pipeline (the north star's
  * point: these operators exist to curate corpora at 100 TB). One
  * composition over `documents`:
  *
  *   score quality → find near-dup candidates (MinHash LSH) →
  *   cluster candidates (connected components) → keep only each
  *   cluster's canonical doc → filter by quality → emit the curated
  *   set with its audit columns.
  *
  * Every stage is the already-verified operator (q41, q31, q45); the
  * composition itself is oracle-checked end-to-end as q47 — the whole
  * pipeline, quality formula through recursive-CTE clustering, must
  * hash-match DuckDB.
  *
  * Scale: quality is a narrow pass; LSH + clustering shuffle O(docs);
  * the final join is doc_id-keyed. Nothing quadratic, nothing
  * collected to the driver.
  */
object Corpus {

  val catalog: Map[String, Q] = Map(

    "q47_corpus_curation" -> Q(
      (s, dir) => {
        import s.implicits._
        // quality metrics and cluster labels both come from the
        // session-memoized frames (shared with q41/q76 and q45/q76)
        val scored = TextOps.scoredDocs(s, dir)
          .select($"doc_id", $"quality_score", $"n_tokens")
        val clusters = Dedup.clusterLabels(s, dir)
        scored.join(clusters, Seq("doc_id"))
          .filter($"doc_id" === $"cluster_id" && $"quality_score" >= 0.35)
          .select($"doc_id", $"cluster_id", $"quality_score", $"n_tokens")
          .orderBy($"doc_id")
      },
      Some(Dedup.oracleCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + s""",
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
        clusters AS (SELECT node AS doc_id, min(lbl) AS cluster_id
          FROM reach GROUP BY node),
        scored AS (SELECT doc_id,
          ${TextOps.oQualityScore} AS quality_score,
          cast(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) as int) AS n_tokens
          FROM documents)
        SELECT s.doc_id, c.cluster_id, s.quality_score, s.n_tokens
        FROM scored s JOIN clusters c USING(doc_id)
        WHERE s.doc_id = c.cluster_id AND s.quality_score >= 0.35
        ORDER BY s.doc_id""")),

    // ---- deterministic ~10% sample: hash-gate on the key, so the
    // same subset falls out on every engine, every run, any cluster
    // size — reproducible corpus subsetting (df.sample() is
    // seed+partitioning dependent and can't be oracle-checked) ----
    "q48_hash_sample" -> Q(
      (s, dir) => {
        import s.implicits._
        val gate = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
          .cast("long")
        table(s, dir, "documents")
          .filter(gate < 6554)   // 6554/65536 ≈ 10%
          .select($"doc_id", $"lang", $"n_chars")
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, lang, n_chars FROM documents
        WHERE CAST('0x' || substr(md5(cast(doc_id as varchar)), 1, 4) AS BIGINT) < 6554
        ORDER BY doc_id""")),

    // ---- stratified sample: a fixed per-language quota, ranked by the
    // md5 of the key so the SAME docs fall out on every engine, run,
    // and cluster size — the per-stratum version of q48. The quota is
    // taken by the heap-based TopKPerGroup operator (q53's physical
    // node): O(n log k) per stratum with a bounded k-element heap, so
    // a handful of hot strata never becomes a handful of giant sort
    // tasks the way a row_number window (which must fully sort each
    // stratum) would at 100 TB. The rn column is then a window over
    // the ALREADY-REDUCED ≤k rows per stratum — a bounded sort.
    // PlanSpec gates that the window sits above the heap operator. ----
    "q58_stratified_sample" -> Q(
      (s, dir) => {
        import s.implicits._
        if (!s.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
          s.experimental.extraStrategies =
            s.experimental.extraStrategies :+ graft.plans.TopKStrategy
        val keyed = table(s, dir, "documents")
          .withColumn("smp_key", md5($"doc_id".cast("string")))
        val quota = TopK.topKPerGroup(keyed, Seq("lang"),
          Seq("smp_key" -> false, "doc_id" -> false), 20)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"lang")
          .orderBy($"smp_key", $"doc_id")
        quota
          .withColumn("rn", row_number().over(w))
          .select($"lang", $"rn".cast("long").as("rn"), $"doc_id", $"n_chars")
          .orderBy($"lang", $"rn")
      },
      Some("""SELECT lang, rn, doc_id, n_chars FROM (
          SELECT lang, doc_id, n_chars,
            row_number() OVER (PARTITION BY lang
              ORDER BY md5(cast(doc_id as varchar)), doc_id) AS rn
          FROM documents) WHERE rn <= 20 ORDER BY lang, rn""")),

    // ---- the WHOLE training-data pipeline, one oracle-checked
    // composition: curate (quality gate + LSH→CC canonical dedup, q47
    // semantics) → domain-balance the survivors (q74's hash-gate
    // acceptance ∝ mix weight, weights recomputed over the CURATED
    // set) → chunk + pack into fixed 512-char training sequences (q70
    // semantics). The output is chunk-level: every kept doc's chunks
    // with their (bucket, seq_id, offset) slot — i.e. the physical
    // layout a trainer would read. Every stage is an already-verified
    // operator; what this adds (and the oracle pins end-to-end, raw
    // text through recursive-CTE clustering to packed offsets) is that
    // the composition seams — weight recomputation on a filtered set,
    // packing after two levels of filtering — introduce no drift.
    // Scale: the stages compose by doc_id-keyed joins and broadcast
    // scalars; no stage widens another's shuffle. ----
    "q76_training_pipeline" -> Q(
      (s, dir) => {
        import s.implicits._
        val BaseRate = 0.7
        val C = 64
        val Cap = 512L
        def gate(c: org.apache.spark.sql.Column) =
          conv(substring(md5(c.cast("string")), 1, 4), 16, 10).cast("long")
        val docs = table(s, dir, "documents")
        // stage 1: curate — canonical docs above the quality bar
        // (scoring and clustering ride the session-memoized frames)
        val scored = TextOps.scoredDocs(s, dir).select($"doc_id", $"quality_score".as("q"))
        val clusters = Dedup.clusterLabels(s, dir)
        val curated = scored.join(clusters, Seq("doc_id"))
          .filter($"doc_id" === $"cluster_id" && $"q" >= 0.35)
          .select($"doc_id")
        val cd = docs.join(curated, Seq("doc_id"))
        // stage 2: balance the curated mix (weights over the survivors)
        val bySrc = cd.groupBy($"source").agg(sum($"n_chars").as("src_chars"))
        val tot = bySrc.agg(sum($"src_chars").as("tot_chars"),
          count(lit(1)).as("n_sources"))
        val weighted = bySrc.crossJoin(broadcast(tot))
          .select($"source", least(lit(1.0),
            lit(BaseRate) * $"tot_chars" / ($"n_sources" * $"src_chars")).as("p"))
        val sampled = cd.join(broadcast(weighted), Seq("source"))
          .filter(gate($"doc_id") < floor($"p" * 65536).cast("long"))
        // stage 3: chunk + pack into training sequences
        val nch = greatest(ceil(length($"text") / lit(C.toDouble)).cast("long"), lit(1L))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"bucket").orderBy($"doc_id", $"chunk_idx")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        sampled
          .select($"doc_id", (gate($"doc_id") % 8).as("bucket"),
            explode(sequence(lit(0L), nch - 1)).as("chunk_idx"), $"text")
          .withColumn("clen",
            expr(s"length(substr(text, cast(chunk_idx*$C+1 as int), $C))"))
          .select($"doc_id", $"chunk_idx", $"bucket", $"clen")
          .withColumn("cb", coalesce(sum($"clen").over(w), lit(0L)))
          .select($"doc_id", $"chunk_idx", $"bucket", $"clen",
            floor($"cb" / lit(Cap.toDouble)).cast("long").as("seq_id"),
            ($"cb" % Cap).as("seq_off"))
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some(Dedup.oracleCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + s""",
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
        clusters AS (SELECT node AS doc_id, min(lbl) AS cluster_id
          FROM reach GROUP BY node),
        scored AS (SELECT doc_id, ${TextOps.oQualityScore} AS q FROM documents),
        curated AS (SELECT s.doc_id FROM scored s JOIN clusters c USING (doc_id)
          WHERE s.doc_id = c.cluster_id AND s.q >= 0.35),
        cd AS (SELECT d.* FROM documents d JOIN curated USING (doc_id)),
        by_src AS (SELECT source, sum(n_chars) AS src_chars FROM cd GROUP BY 1),
        tots AS (SELECT sum(src_chars) AS tot_chars, count(*) AS n_sources FROM by_src),
        w AS (SELECT source,
            least(1.0, 0.7 * tot_chars / (n_sources * src_chars)) AS p
          FROM by_src, tots),
        samp AS (SELECT cd.* FROM cd JOIN w USING (source)
          WHERE CAST('0x' || substr(md5(cast(doc_id as varchar)), 1, 4) AS BIGINT)
            < cast(floor(w.p * 65536) as bigint)),
        ch AS (SELECT doc_id,
            CAST('0x' || substr(md5(cast(doc_id as varchar)), 1, 4) AS BIGINT) % 8 AS bucket,
            unnest(generate_series(0, greatest(cast(ceil(length(text)/64.0) as bigint), 1) - 1)) AS chunk_idx,
            text
          FROM samp),
        cl AS (SELECT doc_id, bucket, chunk_idx,
            cast(length(substr(text, cast(chunk_idx*64+1 as int), 64)) as int) AS clen
          FROM ch),
        cum AS (SELECT doc_id, bucket, chunk_idx, clen,
            cast(coalesce(sum(clen) OVER (PARTITION BY bucket ORDER BY doc_id, chunk_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) AS cb
          FROM cl)
        SELECT doc_id, chunk_idx, bucket, clen,
          cast(floor(cb/512.0) as bigint) AS seq_id, cb % 512 AS seq_off
        FROM cum ORDER BY doc_id, chunk_idx"""))
  )
}
