package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Core._

/** Text-analysis operators over `documents` (north-star LLM-pipeline
  * surface): language-ID heuristic, quality scoring, token counting,
  * document fingerprinting.
  *
  * Everything is built from codegen'd built-ins (regexp_*, split, md5) —
  * one narrow pass per query, no UDFs, no shuffles except final sorts.
  * Integer-ratio roundings use Core.rnd4 (floor-based), which is
  * bit-identical across engines even on representable .xxxx5 ties.
  */
object TextOps {

  /** character-class count via global regexp removal (both engines). */
  private def ccount(c: Column, keepClass: String): Column =
    length(regexp_replace(c, keepClass, ""))

  private def oCcount(cls: String): String =
    s"(length(lower(text)) - length(regexp_replace(lower(text), '$cls', '', 'g')))"

  /** Composite quality score over a lower(text) column — shared by
    * q41 and the corpus-curation pipeline (q47). */
  private[ops] def qualityScore(txt: Column): Column = {
    val nWords = size(split(txt, " "))
    val nStop = size(regexp_extract_all(txt,
      lit("\\b(the|a|of|and|in|to|is|it|for|on)\\b"), lit(0)))
    val nPunct = length(txt) - ccount(txt, "[^a-z0-9 ]")
    val stopR = rnd4(nStop.cast("double") / nWords)
    val punctR = rnd4(nPunct.cast("double") / length(txt))
    val lenScore = rnd4(least(length(txt).cast("double") / 500, lit(1.0)))
    rnd4(lit(0.5) * stopR + lit(0.3) * lenScore + lit(0.2) * (lit(1.0) - punctR))
  }

  /** DuckDB fragment mirroring qualityScore over lower(text). */
  private[ops] val oQualityScore: String = {
    val stopR = oRnd4("cast(len(regexp_extract_all(lower(text), '\\b(the|a|of|and|in|to|is|it|for|on)\\b')) as double) / len(string_split(lower(text), ' '))")
    val punctR = oRnd4(s"cast(${oCcount("[^a-z0-9 ]")} as double) / length(lower(text))")
    val lenScore = oRnd4("least(cast(length(lower(text)) as double) / 500, 1.0)")
    oRnd4(s"0.5 * $stopR + 0.3 * $lenScore + 0.2 * (1.0 - $punctR)")
  }

  val catalog: Map[String, Q] = Map(

    // ---- language-ID heuristic: script + vowel-profile scoring.
    // Classifies by character statistics (latin/cyrillic/cjk/other);
    // emits the per-doc feature vector so the decision is auditable. ----
    "q40_lang_id" -> Q(
      (s, dir) => {
        import s.implicits._
        val txt = lower($"text")
        val n = length(txt)
        val latin = n - ccount(txt, "[a-z]")
        val cyr = n - ccount(txt, "[\\u0430-\\u044f]")
        val cjk = n - ccount(txt, "[\\u4e00-\\u9fff]")
        val vowels = n - ccount(txt, "[aeiou]")
        table(s, dir, "documents").select(
            $"doc_id", $"lang",
            rnd4(latin.cast("double") / n).as("latin_ratio"),
            rnd4(cyr.cast("double") / n).as("cyr_ratio"),
            rnd4(vowels.cast("double") / greatest(latin, lit(1))).as("vowel_ratio"),
            when(cjk * 4 > n, "cjk")
              .when(cyr * 2 > n, "cyrillic")
              .when(latin * 2 > n, "latin")
              .otherwise("other").as("script_guess"))
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id, lang,
        ${oRnd4(s"cast(${oCcount("[a-z]")} as double) / length(lower(text))")} AS latin_ratio,
        ${oRnd4(s"cast(${oCcount("[а-я]")} as double) / length(lower(text))")} AS cyr_ratio,
        ${oRnd4(s"cast(${oCcount("[aeiou]")} as double) / greatest(${oCcount("[a-z]")}, 1)")} AS vowel_ratio,
        CASE WHEN ${oCcount("[一-鿿]")} * 4 > length(lower(text)) THEN 'cjk'
             WHEN ${oCcount("[а-я]")} * 2 > length(lower(text)) THEN 'cyrillic'
             WHEN ${oCcount("[a-z]")} * 2 > length(lower(text)) THEN 'latin'
             ELSE 'other' END AS script_guess
        FROM documents ORDER BY doc_id""")),

    // ---- quality scoring: length/punct/stopword ratios ----
    "q41_quality_score" -> Q(
      (s, dir) => {
        import s.implicits._
        val txt = lower($"text")
        val nWords = size(split(txt, " "))
        val nStop = size(regexp_extract_all(txt,
          lit("\\b(the|a|of|and|in|to|is|it|for|on)\\b"), lit(0)))
        val nPunct = length(txt) - ccount(txt, "[^a-z0-9 ]")
        val stopR = rnd4(nStop.cast("double") / nWords)
        val punctR = rnd4(nPunct.cast("double") / length(txt))
        val lenScore = rnd4(least(length(txt).cast("double") / 500, lit(1.0)))
        table(s, dir, "documents").select(
            $"doc_id",
            nWords.as("n_words"),
            stopR.as("stopword_ratio"),
            punctR.as("punct_ratio"),
            lenScore.as("len_score"),
            qualityScore(txt).as("quality_score"))
          .orderBy($"doc_id")
      },
      Some {
        val stopR = oRnd4("cast(len(regexp_extract_all(lower(text), '\\b(the|a|of|and|in|to|is|it|for|on)\\b')) as double) / len(string_split(lower(text), ' '))")
        val punctR = oRnd4(s"cast(${oCcount("[^a-z0-9 ]")} as double) / length(lower(text))")
        val lenScore = oRnd4("least(cast(length(lower(text)) as double) / 500, 1.0)")
        s"""SELECT doc_id,
        cast(len(string_split(lower(text), ' ')) as int) AS n_words,
        $stopR AS stopword_ratio,
        $punctR AS punct_ratio,
        $lenScore AS len_score,
        $oQualityScore AS quality_score
        FROM documents ORDER BY doc_id"""
      }),

    // ---- token counting: whitespace + BPE-ish regex tokenizer ----
    "q42_token_count" -> Q(
      (s, dir) => {
        import s.implicits._
        val txt = lower($"text")
        val reTokens = size(regexp_extract_all(txt, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        table(s, dir, "documents").select(
            $"doc_id",
            size(split(txt, "\\s+")).as("ws_tokens"),
            reTokens.as("re_tokens"),
            $"n_chars",
            rnd4($"n_chars".cast("double") / reTokens).as("chars_per_token"))
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id,
        cast(len(regexp_split_to_array(lower(text), '\\s+')) as int) AS ws_tokens,
        cast(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) as int) AS re_tokens,
        n_chars,
        ${oRnd4("cast(n_chars as double) / len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))")} AS chars_per_token
        FROM documents ORDER BY doc_id""")),

    // ---- rolling-hash fingerprint via the custom codegen expressions
    // (RollingHash + WordShingles). No oracle: the 64-bit polynomial
    // hash isn't expressible in DuckDB SQL; DedupSimSpec pins the
    // values against a reference implementation instead. ----
    "q44_rolling_fingerprint" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.functions.RollingHash.register(s)
        graft.functions.WordShingles.register(s)
        table(s, dir, "documents").select(
            $"doc_id",
            graft.functions.RollingHash.rolling_hash(lower($"text")).as("doc_hash"),
            size(graft.functions.WordShingles.word_shingles(lower($"text"), 3))
              .as("n_shingles"))
          .orderBy($"doc_id")
      },
      None),

    // ---- vocabulary statistics: term frequency / document frequency /
    // IDF over the whole corpus (the TF row of SURVEY §2B text
    // analysis). Classic wordcount shape: generator explode → one
    // partial-aggregated groupBy(term) — shuffle O(distinct terms);
    // the corpus-size scalar joins in as a broadcast single row. ----
    "q57_vocab_stats" -> Q(
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val total = docs.agg(count(lit(1)).as("n_docs"))
        docs
          .select($"doc_id",
            explode(regexp_extract_all(lower($"text"), lit("[a-z]+"), lit(0))).as("term"))
          .groupBy($"term")
          .agg(countDistinct($"doc_id").as("df"), count(lit(1)).as("tf"))
          .filter($"tf" >= 50)
          .crossJoin(broadcast(total))
          .select($"term", $"df", $"tf",
            rnd4(log($"n_docs".cast("double") / $"df")).as("idf"))
          .orderBy($"tf".desc, $"term")
      },
      Some(s"""WITH terms AS (SELECT doc_id,
          unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term FROM documents),
        stats AS (SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf
          FROM terms GROUP BY term),
        tot AS (SELECT count(*) AS n_docs FROM documents)
        SELECT term, df, tf,
          ${oRnd4("ln(cast(n_docs as double) / df)")} AS idf
        FROM stats, tot WHERE tf >= 50 ORDER BY tf DESC, term""")),

    // ---- document fingerprint: md5 over whitespace-normalized text ----
    "q43_fingerprint" -> Q(
      (s, dir) => {
        import s.implicits._
        val norm = trim(regexp_replace(lower($"text"), "\\s+", " "))
        table(s, dir, "documents").select(
            $"doc_id",
            md5(norm).as("fingerprint"),
            substring(md5(norm), 1, 4).as("shard_key"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
        md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
        substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 4) AS shard_key
        FROM documents ORDER BY doc_id""")),

    // ---- heavy hitters: top-20 most frequent tokens via the
    // approx_top_k frequent-items sketch (Spark 4's ApproxTopK
    // aggregate). The sketch merges per-partition — shuffle is one
    // sketch per partition, NEVER a per-token row — which is the 100 TB
    // shape for "what are the dominant tokens" monitoring where q57's
    // exact groupBy would shuffle O(distinct terms). The sketch is
    // EXACT while distinct items fit its capacity (10k here vs a
    // 31-token test vocabulary), so the query is oracle-checkable; at
    // web-scale vocabularies counts above capacity become estimates
    // with the sketch's documented error — the capacity argument is
    // the knob. We pull every tracked item and apply our own
    // deterministic (count desc, token asc) top-20, so boundary ties
    // never depend on sketch-internal ordering. ----
    "q75_heavy_hitters" -> Q(
      (s, dir) => {
        import s.implicits._
        fanOut(s, table(s, dir, "documents"))
          .select(explode(split(lower($"text"), " ")).as("tok"))
          .filter(length($"tok") > 0)
          .agg(expr("approx_top_k(tok, 100, 10000)").as("tk"))
          .select(explode($"tk").as("e"))
          .select($"e.item".as("token"), $"e.count".as("est_n"))
          .orderBy($"est_n".desc, $"token")
          .limit(20)
      },
      Some("""SELECT w AS token, cast(count(*) as bigint) AS est_n
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
        WHERE length(w) > 0
        GROUP BY 1 ORDER BY est_n DESC, token LIMIT 20""")),

    // ---- statistical LM quality scoring: per-doc mean bigram
    // log-probability under the corpus's OWN bigram model (the
    // KenLM-style perplexity filter run before pretraining, with the
    // corpus as its own training set). P(w2|w1) = c(w1 w2)/c(w1 ·),
    // scored as avg ln P over the doc's adjacent pairs. Per-pair logs
    // ride through a decimal cast so the mean is order-independent
    // (ln parity with DuckDB has the q57-idf precedent). Scale: the
    // count model is two partial-agg groupBys bounded by vocab and
    // vocab² rows — broadcast back to the doc pairs — so scoring is a
    // narrow pass + one groupBy(doc_id); at web vocab the model join
    // falls back to a shuffle keyed by bigram, still O(doc tokens). ----
    "q77_lm_quality" -> Q(
      (s, dir) => {
        import s.implicits._
        val D = org.apache.spark.sql.types.DecimalType(28, 12)
        val docs = fanOut(s, table(s, dir, "documents"))
          .withColumn("ws", split(lower($"text"), " "))
        val pairs = docs.select($"doc_id", explode(expr(
            "transform(slice(ws, 1, size(ws)-1), (x, i) -> struct(x AS w1, concat(x, ' ', ws[i+1]) AS pr))"))
            .as("p"))
          .select($"doc_id", $"p.w1".as("w1"), $"p.pr".as("pr"))
        val c2 = pairs.groupBy($"w1", $"pr").agg(count(lit(1)).as("c2"))
        val c1 = pairs.groupBy($"w1").agg(count(lit(1)).as("c1"))
        val model = c2.join(c1, Seq("w1"))
          .select($"pr", ($"c2".cast("double") / $"c1").as("pcond"))
        pairs.join(broadcast(model), Seq("pr"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_pairs"),
            rnd4(sum(log($"pcond").cast(D)).cast("double") / count(lit(1))).as("mean_logp"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        prs AS (SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i+1] AS pr
          FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-1)) AS i FROM toks)),
        c2 AS (SELECT w1, pr, count(*) AS c2 FROM prs GROUP BY 1, 2),
        c1 AS (SELECT w1, count(*) AS c1 FROM prs GROUP BY 1),
        model AS (SELECT pr, cast(c2.c2 as double) / c1.c1 AS pcond
          FROM c2 JOIN c1 USING (w1)),
        scored AS (SELECT p.doc_id, count(*) AS n_pairs,
            cast(sum(cast(ln(m.pcond) as decimal(28,12))) as double) / count(*) AS mlp
          FROM prs p JOIN model m USING (pr) GROUP BY 1)
        SELECT doc_id, n_pairs, ${oRnd4("mlp")} AS mean_logp
        FROM scored ORDER BY doc_id""")),

    // ---- vocabulary encoding: map every token to a deterministic
    // integer id (frequency rank, ties broken lexically) — the
    // tokenize-to-ids step that turns curated text into the integer
    // sequences training actually consumes. The vocab is derived from
    // the corpus itself in one partial-agg groupBy; ids come from a
    // single window over the VOCAB (31 rows here; at web scale rank
    // the vocab by count range-partitioned — never window the corpus),
    // then broadcast-join back to the token stream. Positions keep
    // their pre-filter index so empty tokens (double spaces) never
    // shift alignment. Scale: encode is a narrow pass + broadcast
    // join; shuffle is only the vocab groupBy, O(distinct tokens). ----
    "q78_token_ids" -> Q(
      (s, dir) => {
        import s.implicits._
        val toks = fanOut(s, table(s, dir, "documents"))
          .select($"doc_id", posexplode(split(lower($"text"), " ")).as(Seq("pos", "tok")))
          .filter(length($"tok") > 0)
        val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("n"))
          .withColumn("tid", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy($"n".desc, $"tok")))
          .select($"tok", $"tid")
        toks.join(broadcast(vocab), Seq("tok"))
          .select($"doc_id", $"pos", $"tid")
          .orderBy($"doc_id", $"pos")
      },
      Some("""WITH toks AS (SELECT doc_id, cast(i-1 as int) AS pos, ws[i] AS tok
          FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents))
          WHERE length(ws[i]) > 0),
        vocab AS (SELECT tok,
            cast(row_number() OVER (ORDER BY count(*) DESC, tok) as int) AS tid
          FROM toks GROUP BY tok)
        SELECT t.doc_id, t.pos, v.tid
        FROM toks t JOIN vocab v USING (tok) ORDER BY doc_id, pos"""))
  )
}
