package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Core._

/** Training-set assembly operators over `documents` — the stages that
  * turn a cleaned corpus into model-ready shards (north-star
  * LLM-pipeline surface; no analog in the reference, whose pipeline
  * ends at format conversion — unified_code.py:246–293).
  *
  *  - BPE merge-candidate statistics (q69): corpus-wide adjacent
  *    token-pair frequencies, the counting step a tokenizer-induction
  *    loop runs once per merge
  *  - sequence chunk + pack (q70): split docs into fixed-size chunks
  *    and concatenate-then-split them into fixed-capacity training
  *    sequences (GPT-style packing), deterministically
  *  - corpus shard shuffle (q73): a deterministic global permutation
  *    of the corpus into training shards with within-shard order —
  *    "shuffle once, stream forever"
  *
  * Scale design (100 TB): q69 is one explode + ONE partial-aggregated
  * groupBy (shuffle O(distinct pairs)) with a TakeOrdered top-k, never
  * a global sort. q70/q73 do their ordering *within* hash buckets /
  * shards: the only shuffle is the bucket hash-partitioning, and each
  * in-bucket sort is a bounded, spillable partition sort — exactly the
  * repartition + sortWithinPartitions write path a shard writer uses.
  * Nothing here carries `text` through a shuffle except q70's chunk
  * pass, which projects it away before the window.
  */
object Training {

  /** q48-style deterministic doc gate: md5 prefix as uint16. */
  private def docGate(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 4), 16, 10).cast("long")

  /** BPE merge APPLICATION (q124): run [[BpeRounds]] actual merge
    * rounds of byte-pair-encoding induction over the corpus token
    * stream — q69 counts the candidates; this executes the merges.
    * Each round: (1) count adjacent pairs, (2) pick the top pair
    * (count desc, pair lexical — deterministic), (3) GREEDY LEFTMOST
    * non-overlapping replacement, the sequential tokenizer semantics,
    * expressed declaratively: marked positions that are consecutive
    * form gaps-and-islands runs, and greedy-leftmost = the EVEN
    * offsets within each run ("a a a" → [aa, a], never [a, aa]);
    * (4) drop consumed positions and re-densify.
    *
    * Scale: per round, one pair-count partial agg (O(distinct pairs)
    * shuffle), a 1-row top-pair broadcast, and per-doc windows — the
    * token stream shuffles once per round on doc_id and never carries
    * full text. The oracle unrolls the rounds as MATERIALIZED CTEs
    * (q116's pattern: each round's stream is referenced twice). */
  private val BpeRounds = 2

  private def bpeMerged(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // lineage cut per round (q116's ckpt): wn is read three times per
    // round (pair counts, selection, rewrite) and the plan would
    // otherwise double each round
    def ckpt(df: org.apache.spark.sql.DataFrame) =
      df.localCheckpoint().select(df.columns.map(c => col(c).as(c)): _*)
    val byDoc = Window.partitionBy($"doc_id").orderBy($"pos")
    var toks = fanOut(s, table(s, dir, "documents"))
      .select($"doc_id", posexplode(split(lower($"text"), " ")).as(Seq("p", "tok")))
      .filter(length($"tok") > 0)
      .withColumn("pos",
        (row_number().over(Window.partitionBy($"doc_id").orderBy($"p")) - 1).cast("long"))
      .select($"doc_id", $"pos", $"tok")
    var exhausted = false
    for (_ <- 1 to BpeRounds if !exhausted) {
      val wn = ckpt(toks.withColumn("nxt", lead($"tok", 1).over(byDoc)))
      val top = wn.filter($"nxt".isNotNull)
        .groupBy($"tok", $"nxt").agg(count(lit(1)).as("c"))
        .orderBy($"c".desc, $"tok", $"nxt").limit(1)
        .select($"tok".as("m1"), $"nxt".as("m2"))
        .collect()
      // degenerate corpus guard: if NO adjacent pair exists anywhere
      // (every doc shorter than 2 tokens), an empty merge-pair frame
      // would cross-join the whole token stream to zero rows — the
      // oracle's LEFT-JOIN spelling instead passes tokens through
      // unmerged, so stop merging and do the same. The collect is the
      // 1-row TakeOrdered the scaladoc already promises; the selected
      // pair re-enters the plan as a local 1-row broadcast.
      if (top.isEmpty) exhausted = true
      else {
      val marked = wn.crossJoin(broadcast(
        Seq((top(0).getString(0), top(0).getString(1))).toDF("m1", "m2")))
      val sel = marked
        .filter($"nxt".isNotNull && $"tok" === $"m1" && $"nxt" === $"m2")
        .withColumn("rn", row_number().over(byDoc))
        .withColumn("off",
          $"rn" - min($"rn").over(Window.partitionBy($"doc_id", $"pos" - $"rn")))
        .filter($"off" % 2 === 0)
        .select($"doc_id", $"pos")
      toks = marked
        .join(sel.withColumn("m", lit(1)), Seq("doc_id", "pos"), "left")
        .join(sel.select($"doc_id", ($"pos" + 1).as("pos"), lit(1).as("d")),
          Seq("doc_id", "pos"), "left")
        .filter($"d".isNull)
        .select($"doc_id", $"pos",
          when($"m" === 1, concat($"tok", $"nxt")).otherwise($"tok").as("tok"))
        .withColumn("pos", (row_number().over(byDoc) - 1).cast("long"))
        .select($"doc_id", $"pos", $"tok")
      }
    }
    toks
  }

  /** Oracle mirror of [[bpeMerged]]: rounds unrolled as MATERIALIZED
    * CTEs (each `t_r` is read by both the pair counter and the next
    * rewrite, so default inlining would double per round). */
  private def oBpe(rounds: Int): String = {
    val sb = new StringBuilder(
      """WITH t0 AS MATERIALIZED (SELECT doc_id,
          cast(row_number() OVER (PARTITION BY doc_id ORDER BY i) as bigint) - 1 AS pos, tok
        FROM (SELECT doc_id, i, ws[i] AS tok
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws,
            unnest(generate_series(1, len(string_split(lower(text), ' ')))) AS i
          FROM documents))
        WHERE len(tok) > 0)""")
    for (r <- 1 to rounds) sb.append(s""",
      wn$r AS MATERIALIZED (SELECT doc_id, pos, tok,
          lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM t${r - 1}),
      tp$r AS MATERIALIZED (SELECT tok AS m1, nxt AS m2 FROM wn$r
        WHERE nxt IS NOT NULL GROUP BY tok, nxt
        ORDER BY count(*) DESC, m1, m2 LIMIT 1),
      sel$r AS MATERIALIZED (SELECT doc_id, pos FROM (
          SELECT doc_id, pos,
            rn - min(rn) OVER (PARTITION BY doc_id, pos - rn) AS off
          FROM (SELECT w.doc_id, w.pos,
              row_number() OVER (PARTITION BY w.doc_id ORDER BY w.pos) AS rn
            FROM wn$r w JOIN tp$r ON w.tok = m1 AND w.nxt = m2))
        WHERE off % 2 = 0),
      t$r AS MATERIALIZED (SELECT doc_id,
          cast(row_number() OVER (PARTITION BY doc_id ORDER BY pos) as bigint) - 1 AS pos, tok
        FROM (SELECT w.doc_id, w.pos,
            CASE WHEN s.pos IS NOT NULL THEN w.tok || w.nxt ELSE w.tok END AS tok
          FROM wn$r w
          LEFT JOIN sel$r s ON s.doc_id = w.doc_id AND s.pos = w.pos
          LEFT JOIN sel$r d ON d.doc_id = w.doc_id AND d.pos = w.pos - 1
          WHERE d.pos IS NULL))""")
    sb.toString
  }

  /** Web-scale spelling of q122's curriculum staging: the global
    * ntile(3) tercile window is replaced by two approx-quantile cut
    * points (q66's mergeable sketch — a partial+final aggregate)
    * broadcast as a 1-row frame, making stage assignment row-local;
    * the within-stage shuffle windows partition by stage exactly as
    * in the anchor. Divergence is confined to the cut line (tie
    * groups + sketch rank error); OpsSpec pins ≥95% per-doc stage
    * agreement and that positions are a correct per-stage md5-rank
    * permutation. The catalog q122 stays the oracle-checked ntile
    * spelling. */
  def curriculumOrderScalable(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val scored = TextOps.scoredDocs(s, dir).select(col("doc_id"), col("quality_score"))
    val cuts = scored.agg(percentile_approx(col("quality_score"),
        array(lit(2.0 / 3), lit(1.0 / 3)), lit(10000)).as("c"))
      .select(col("c")(0).as("t1"), col("c")(1).as("t2"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("stage",
        when(col("quality_score") >= col("t1"), 1)
          .when(col("quality_score") >= col("t2"), 2).otherwise(3))
      .withColumn("rk", md5(col("doc_id").cast("string")))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("stage")).orderBy(col("rk"), col("doc_id"))))
      .select(col("doc_id"), col("stage"), col("pos"))
      .orderBy(col("stage"), col("pos"))
  }

  val catalog: Map[String, Q] = Map(

    // ---- BPE merge application: the token stream after BpeRounds
    // actual greedy merges (see bpeMerged scaladoc). ----
    "q124_bpe_merge_apply" -> Q(
      (s, dir) => {
        import s.implicits._
        bpeMerged(s, dir).orderBy($"doc_id", $"pos")
      },
      Some(s"""${oBpe(BpeRounds)}
        SELECT doc_id, pos, tok FROM t$BpeRounds ORDER BY doc_id, pos""")),

    // ---- BPE merge-candidate statistics: frequency of every adjacent
    // token pair in the corpus, top 50. This is the inner counting step
    // of byte-pair-encoding vocabulary induction (each merge round
    // re-counts pairs over the updated token stream); one round is the
    // representative, oracle-checkable unit — the loop around it is
    // driver logic, not a new plan shape. Scale: pair generation is a
    // narrow generator expression (no self-join on position), counts
    // partial-aggregate map-side, and the top-50 is a TakeOrdered
    // (per-partition heaps + driver merge), never a global sort. ----
    "q69_bpe_pair_stats" -> Q(
      (s, dir) => {
        import s.implicits._
        // shares the session-memoized bigram frame with q77's LM model
        TextOps.bigramRows(s, dir)
          .select($"pr".as("pair"))
          .groupBy($"pair").agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"pair")
          .limit(50)
      },
      Some("""WITH toks AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
        prs AS (SELECT ws[i] || ' ' || ws[i+1] AS pair
          FROM (SELECT ws, unnest(generate_series(1, len(ws)-1)) AS i FROM toks))
        SELECT pair, count(*) AS n FROM prs
        GROUP BY 1 ORDER BY n DESC, pair LIMIT 50""")),

    // ---- sequence chunk + pack: split each doc into 64-char chunks,
    // then concatenate-and-split the chunk stream into 512-char
    // training sequences (the standard packing that wastes no tokens on
    // padding). Assignment is pure arithmetic on a running sum: chunk c
    // starts at global offset cum(c), so it lands in sequence
    // floor(cum/512) at offset cum%512 — deterministic, join-free, and
    // restart-safe. Packing runs independently inside 8 hash buckets
    // (at 100 TB: thousands), so the running-sum window sorts only one
    // bucket's chunk METADATA (text is projected away first); waste is
    // at most one partial sequence per bucket. ----
    "q70_chunk_pack" -> Q(
      (s, dir) => {
        import s.implicits._
        val C = 64
        val Cap = 512L
        val nch = greatest(ceil(length($"text") / lit(C.toDouble)).cast("long"), lit(1L))
        val w = Window.partitionBy($"bucket").orderBy($"doc_id", $"chunk_idx")
          .rowsBetween(Window.unboundedPreceding, -1)
        val cum = coalesce(sum($"clen").over(w), lit(0L))
        table(s, dir, "documents")
          .select($"doc_id", (docGate($"doc_id") % 8).as("bucket"),
            explode(sequence(lit(0L), nch - 1)).as("chunk_idx"), $"text")
          .withColumn("clen",
            expr(s"length(substr(text, cast(chunk_idx*$C+1 as int), $C))"))
          .select($"doc_id", $"chunk_idx", $"bucket", $"clen")
          .withColumn("cb", cum)
          .select($"doc_id", $"chunk_idx", $"bucket", $"clen",
            floor($"cb" / lit(Cap.toDouble)).cast("long").as("seq_id"),
            ($"cb" % Cap).as("seq_off"))
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some("""WITH ch AS (SELECT doc_id,
          CAST('0x' || substr(md5(cast(doc_id as varchar)), 1, 4) AS BIGINT) % 8 AS bucket,
          unnest(generate_series(0, greatest(cast(ceil(length(text)/64.0) as bigint), 1) - 1)) AS chunk_idx,
          text
        FROM documents),
        cl AS (SELECT doc_id, bucket, chunk_idx,
            cast(length(substr(text, cast(chunk_idx*64+1 as int), 64)) as int) AS clen
          FROM ch),
        cum AS (SELECT doc_id, bucket, chunk_idx, clen,
            cast(coalesce(sum(clen) OVER (PARTITION BY bucket ORDER BY doc_id, chunk_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) AS cb
          FROM cl)
        SELECT doc_id, chunk_idx, bucket, clen,
          cast(floor(cb/512.0) as bigint) AS seq_id, cb % 512 AS seq_off
        FROM cum ORDER BY doc_id, chunk_idx""")),

    // ---- corpus shard shuffle: a deterministic global permutation into
    // 8 training shards (at 100 TB: thousands) with a stable position
    // inside each shard. Rank = md5(doc_id) — reshuffling is just a new
    // salt in the hash, no RNG state to persist. The shard id is a hash
    // residue (so the permutation IS the partitioning: one shuffle,
    // then each shard's order is a bounded in-partition sort — the
    // sortWithinPartitions write path), and no global sort ever runs
    // over the corpus; the final orderBy here is only the driver-side
    // presentation of the 500-row test output. ----
    // ---- curriculum ordering (Bengio et al. '09): stage the corpus
    // easy→hard by quality tercile, then hash-shuffle WITHIN each
    // stage (q73's md5-rank trick) so a trainer that streams stages in
    // order sees decorrelated docs inside a stage. Rides the memoized
    // scoredDocs pass; ranking uses the rnd4-rounded score with
    // doc_id ties so the stage cut is engine-stable. Scale: the
    // tercile ntile is one global window over narrow (score, id) rows
    // — it survives here as the ORACLE anchor, while
    // curriculumOrderScalable is the web-scale spelling (two
    // broadcast approx-quantile thresholds from q66's sketch; the
    // within-stage position windows partition by stage either way),
    // agreement-pinned in OpsSpec and A/B'd by the probe. ----
    "q122_curriculum_order" -> Q(
      (s, dir) => {
        import s.implicits._
        val scored = TextOps.scoredDocs(s, dir).select($"doc_id", $"quality_score")
        scored
          .withColumn("stage", ntile(3).over(
            Window.orderBy($"quality_score".desc, $"doc_id")))
          .withColumn("rk", md5($"doc_id".cast("string")))
          .withColumn("pos", row_number().over(
            Window.partitionBy($"stage").orderBy($"rk", $"doc_id")))
          .select($"doc_id", $"stage", $"pos")
          .orderBy($"stage", $"pos")
      },
      Some(s"""WITH q AS (SELECT doc_id, ${TextOps.oQualityScore} AS quality_score
          FROM documents),
        st AS (SELECT doc_id,
            ntile(3) OVER (ORDER BY quality_score DESC, doc_id) AS stage,
            md5(cast(doc_id as varchar)) AS rk FROM q)
        SELECT doc_id, stage,
          cast(row_number() OVER (PARTITION BY stage ORDER BY rk, doc_id) as int) AS pos
        FROM st ORDER BY stage, pos""")),

    "q73_corpus_shard" -> Q(
      (s, dir) => {
        import s.implicits._
        val rk = md5($"doc_id".cast("string"))
        table(s, dir, "documents")
          .select($"doc_id", rk.as("rk"), (docGate($"doc_id") % 8).as("shard"))
          .withColumn("pos", row_number().over(
            Window.partitionBy($"shard").orderBy($"rk", $"doc_id")))
          .select($"doc_id", $"shard", $"pos")
          .orderBy($"shard", $"pos")
      },
      Some("""WITH r AS (SELECT doc_id, md5(cast(doc_id as varchar)) AS rk,
          CAST('0x' || substr(md5(cast(doc_id as varchar)), 1, 4) AS BIGINT) % 8 AS shard
        FROM documents)
        SELECT doc_id, shard,
          cast(row_number() OVER (PARTITION BY shard ORDER BY rk, doc_id) as int) AS pos
        FROM r ORDER BY shard, pos""")),

    // ---- epoch upsampling: materialize per-source repeat factors as
    // explicit (doc_id, epoch) rows — the "rare domains see more
    // epochs" counterpart to down-sampling (q74/q80 gate docs OUT;
    // this replays under-represented sources IN, capped at 4 epochs so
    // no source over-memorizes). r_s = clamp(ceil(uniform-mix weight),
    // 1, 4) — integer arithmetic on the q65 weight, so the blowup is
    // bounded by the cap, not by the skew. The epoch column then
    // feeds q73's shard shuffle so replicas land in different shards.
    // Scale: one partial-agg groupBy(source) → broadcast O(sources)
    // factors; the sequence explode is a narrow generator (no
    // shuffle); output is ≤4× input rows of METADATA (doc_id, not
    // text — a trainer resolves text by doc_id at read time). ----
    "q82_epoch_upsample" -> Q(
      (s, dir) => {
        import s.implicits._
        val MaxEpochs = 4L
        val docs = table(s, dir, "documents")
        val bySrc = docs.groupBy($"source").agg(sum($"n_chars").as("src_chars"))
        val tot = bySrc.agg(sum($"src_chars").as("tot_chars"),
          count(lit(1)).as("n_sources"))
        val rep = bySrc.crossJoin(broadcast(tot))
          .select($"source",
            least(lit(MaxEpochs), greatest(lit(1L),
              ceil($"tot_chars".cast("double") / ($"n_sources" * $"src_chars"))))
              .as("r"))
        docs.join(broadcast(rep), Seq("source"))
          .select($"doc_id", $"source",
            explode(sequence(lit(0L), $"r" - 1)).as("epoch"))
          .orderBy($"doc_id", $"epoch")
      },
      Some("""WITH by_src AS (SELECT source, sum(n_chars) AS src_chars
          FROM documents GROUP BY 1),
        tot AS (SELECT sum(src_chars) AS tot_chars, count(*) AS n_sources FROM by_src),
        rep AS (SELECT source,
            least(4, greatest(1,
              cast(ceil(cast(tot_chars as double) / (n_sources * src_chars)) as bigint))) AS r
          FROM by_src, tot)
        SELECT d.doc_id, d.source, unnest(generate_series(0, r - 1)) AS epoch
        FROM documents d JOIN rep USING (source)
        ORDER BY doc_id, epoch""")),

    // ---- sliding token context windows: assign every encoded token
    // to its overlapping attention windows (length 32, stride 16 — the
    // stride-half overlap a trainer uses so no boundary context is
    // lost). With W = 2·S each token belongs to at most two windows
    // (⌊i/S⌋ and its predecessor), so membership is a ≤2-row narrow
    // generator per token — NEVER a positions×windows join — followed
    // by one partial-agg groupBy(doc, window). Per-window content is
    // pinned by count + tid checksum + position span (the full token
    // list is q78's output; a trainer slices it by this index). The
    // dense in-doc index comes from a per-doc window — bounded by doc
    // length, the q70 in-bucket sort shape, never a global sort. ----
    "q83_token_windows" -> Q(
      (s, dir) => {
        import s.implicits._
        val S = 16L // stride; window length = 2·S
        val dense = TextOps.tokenIds(s, dir)
          .withColumn("i", row_number().over(
            Window.partitionBy($"doc_id").orderBy($"pos")).cast("long") - 1)
        dense
          .select($"doc_id", $"i", $"tid",
            explode(array(($"i" / S).cast("long"), ($"i" / S).cast("long") - 1)).as("win_id"))
          .filter($"win_id" >= 0)
          .groupBy($"doc_id", $"win_id")
          .agg(count(lit(1)).as("n_tok"), sum($"tid").as("sum_tid"),
            min($"i").as("first_i"), max($"i").as("last_i"))
          .withColumn("full", ($"n_tok" === 2 * S).cast("int"))
          .orderBy($"doc_id", $"win_id")
      },
      Some("""WITH toks AS (SELECT doc_id, cast(i-1 as int) AS pos, ws[i] AS tok
          FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents))
          WHERE length(ws[i]) > 0),
        vocab AS (SELECT tok,
            cast(row_number() OVER (ORDER BY count(*) DESC, tok) as int) AS tid
          FROM toks GROUP BY tok),
        dense AS (SELECT t.doc_id, v.tid,
            cast(row_number() OVER (PARTITION BY t.doc_id ORDER BY t.pos) as bigint) - 1 AS i
          FROM toks t JOIN vocab v USING (tok)),
        member AS (SELECT doc_id, i, tid, unnest([i // 16, i // 16 - 1]) AS win_id
          FROM dense)
        SELECT doc_id, win_id, count(*) AS n_tok,
          cast(sum(tid) as bigint) AS sum_tid,
          min(i) AS first_i, max(i) AS last_i,
          cast(CASE WHEN count(*) = 32 THEN 1 ELSE 0 END as int) AS "full"
        FROM member WHERE win_id >= 0
        GROUP BY doc_id, win_id ORDER BY doc_id, win_id"""))
  )
}
