package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Core._

/** Corpus-hygiene operators over `documents` — the filters a training
  * pipeline runs between raw ingest and tokenization (north-star
  * LLM-pipeline surface; no analog in the reference, which stops at
  * format conversion — unified_code.py:246–293 is its whole transform).
  *
  *  - benchmark decontamination (q61): flag training docs sharing any
  *    word 5-gram with a held-out benchmark set
  *  - repetition / boilerplate scoring (q62): intra-doc duplicate
  *    n-gram ratio
  *  - PII scrubbing (q63): regex redaction of emails / phones / IPs
  *    with per-doc redaction counts
  *  - domain mixture report (q65): per-source shares + the reweighting
  *    factor to reach a uniform target mix
  *
  * All stages are codegen'd built-ins + the WordShingles expression;
  * shuffles are bounded (per-shingle hash keys for q61, per-source for
  * q65, none for q62/q63 beyond the output sort).
  */
object Hygiene {

  /** q48-style deterministic doc gate: md5 prefix as uint16. */
  private def docGate(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 4), 16, 10).cast("long")

  private val oDocGate = "CAST('0x' || substr(md5(cast(doc_id as varchar)), 1, 4) AS BIGINT)"

  /** ~5% of docs are the held-out "benchmark" set. */
  private val BenchGate = 3277L

  /** Docs surviving the per-source top-30% quality cut (q110's keep
    * set): narrow (doc_id, source, quality_score) rows ranked by the
    * session-shared scoring pass. */
  private def rankedQualityKeep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = TextOps.scoredDocs(s, dir).select($"doc_id", $"quality_score")
      .join(table(s, dir, "documents").select($"doc_id", $"source"), Seq("doc_id"))
    val w = Window.partitionBy($"source").orderBy($"quality_score".desc, $"doc_id")
    scored.withColumn("pr", percent_rank().over(w)).filter($"pr" <= 0.30)
  }

  /** Per-source quality thresholds (q110's cut scores) as a static
    * frame — the snapshot-frozen gate a streaming ingest
    * broadcast-joins per micro-batch (StreamingOps.gateIncoming). */
  def qualityThresholds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    rankedQualityKeep(s, dir)
      .groupBy($"source").agg(min($"quality_score").as("cut_score"))
  }

  val catalog: Map[String, Q] = Map(

    // ---- declarative constraint audit (Deequ-style data validation):
    // named row-level rules evaluated as conditional aggregates in ONE
    // scan per table (sum(case when violated)), plus referential
    // integrity as anti-join counts — the "assert the batch before it
    // enters the corpus" step of an ingest pipeline. Scale: each
    // per-table rule block is a single partial-agged pass regardless
    // of rule count; the FK checks shuffle only the key column, and
    // the result is a fixed handful of rows. A failed rule here gates
    // promotion; the audit itself never moves data. ----
    "q118_constraint_audit" -> Q(
      (s, dir) => {
        import s.implicits._
        val li = table(s, dir, "lineitem")
        val ord = table(s, dir, "orders")
        val liRules = Seq(
          ("lineitem.discount_range", $"l_discount" < 0 || $"l_discount" > 1),
          ("lineitem.price_nonneg", $"l_extendedprice" < 0),
          ("lineitem.qty_positive", $"l_quantity" <= 0))
        val ordRules = Seq(
          ("orders.status_domain", !$"o_orderstatus".isin("O", "F", "P")),
          ("orders.total_nonneg", $"o_totalprice" < 0))
        // all of a table's rules fold into ONE partial-agged scan; the
        // 1-row result fans back out to per-rule rows via stack()
        def audit(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)]) = {
          val aggs = count(lit(1)).as("checked") +: rules.zipWithIndex.map {
            case ((_, bad), i) => sum(when(bad, 1L).otherwise(0L)).as(s"v$i") }
          val one = df.agg(aggs.head, aggs.tail: _*)
          val stackArgs = rules.zipWithIndex
            .map { case ((n, _), i) => s"'$n', v$i" }.mkString(", ")
          one.select(expr(s"stack(${rules.size}, $stackArgs) AS (rule, violations)"),
            col("checked"))
            .select(col("rule"), col("checked"), col("violations"))
        }
        val fkOrders = li.select($"l_orderkey")
          .join(ord.select($"o_orderkey"), $"l_orderkey" === $"o_orderkey", "left_anti")
          .agg(lit("lineitem.fk_orders").as("rule"),
            count(lit(1)).as("violations"))
          .crossJoin(broadcast(li.agg(count(lit(1)).as("checked"))))
          .select($"rule", $"checked", $"violations")
        val fkCustomer = ord.select($"o_custkey")
          .join(table(s, dir, "customer").select($"c_custkey"),
            $"o_custkey" === $"c_custkey", "left_anti")
          .agg(lit("orders.fk_customer").as("rule"),
            count(lit(1)).as("violations"))
          .crossJoin(broadcast(ord.agg(count(lit(1)).as("checked"))))
          .select($"rule", $"checked", $"violations")
        audit(li, liRules).unionByName(audit(ord, ordRules))
          .unionByName(fkOrders).unionByName(fkCustomer)
          .orderBy($"rule")
      },
      Some("""SELECT * FROM (
          SELECT 'lineitem.discount_range' AS rule, count(*) AS checked,
            cast(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) as bigint) AS violations
          FROM lineitem
          UNION ALL SELECT 'lineitem.price_nonneg', count(*),
            cast(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) as bigint) FROM lineitem
          UNION ALL SELECT 'lineitem.qty_positive', count(*),
            cast(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) as bigint) FROM lineitem
          UNION ALL SELECT 'orders.status_domain', count(*),
            cast(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) as bigint) FROM orders
          UNION ALL SELECT 'orders.total_nonneg', count(*),
            cast(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) as bigint) FROM orders
          UNION ALL SELECT 'lineitem.fk_orders', (SELECT count(*) FROM lineitem),
            (SELECT count(*) FROM lineitem l LEFT JOIN orders o
              ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
          UNION ALL SELECT 'orders.fk_customer', (SELECT count(*) FROM orders),
            (SELECT count(*) FROM orders o LEFT JOIN customer c
              ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
        ) ORDER BY rule""")),

    // ---- adaptive per-source quality gate: keep each source's top
    // 30% by quality score instead of one global threshold — a global
    // cut starves clean-but-different domains and over-admits the
    // noisiest one; percentile gates are how real mixes hold their
    // per-domain quality bar. Scores come from the memoized
    // scoredDocs pass (one regexp sweep per session, shared with
    // q41/q47/q76); the window ranks a narrow (doc_id, score) frame
    // per source — text never enters the shuffle — and the tie-break
    // on doc_id makes every percent_rank engine-exact. ----
    "q110_adaptive_quality_gate" -> Q(
      (s, dir) => {
        import s.implicits._
        rankedQualityKeep(s, dir)
          .groupBy($"source")
          .agg(count(lit(1)).as("n_kept"),
            min($"quality_score").as("cut_score"),
            max($"quality_score").as("best_score"))
          .orderBy($"source")
      },
      Some(s"""WITH scored AS (SELECT doc_id, source,
            ${TextOps.oQualityScore} AS quality_score FROM documents),
        ranked AS (SELECT *, percent_rank() OVER (PARTITION BY source
            ORDER BY quality_score DESC, doc_id) AS pr FROM scored)
        SELECT source, count(*) AS n_kept,
          min(quality_score) AS cut_score, max(quality_score) AS best_score
        FROM ranked WHERE pr <= 0.30
        GROUP BY source ORDER BY source""")),

    // ---- corpus snapshot diff: the added / removed / changed /
    // unchanged ledger between two corpus versions — the audit that
    // runs before re-tokenizing an updated crawl (changed + added
    // docs re-enter the pipeline, removed ones retire from the
    // index). Versions are simulated deterministically from one
    // table: v1 is the ~90% lower gate slice, v2 the ~90% upper
    // slice, and a middle gate band carries a text revision — so all
    // four statuses materialize. The diff itself is the operator: one
    // full-outer equi-join on doc_id comparing md5 fingerprints,
    // O(corpus) with no text shuffle (fingerprints computed at scan). ----
    "q111_corpus_diff" -> Q(
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val g = docGate($"doc_id")
        val v1 = docs.filter(g < 58982L)
          .select($"doc_id", md5($"text").as("fp1"), $"source".as("src1"))
        val v2 = docs.filter(g >= 6554L)
          .select($"doc_id",
            md5(when(g >= 30000L && g < 40000L, concat($"text", lit(" rev2")))
              .otherwise($"text")).as("fp2"),
            $"source".as("src2"))
        v1.join(v2, Seq("doc_id"), "full")
          .select(
            when($"fp1".isNull, "added")
              .when($"fp2".isNull, "removed")
              .when($"fp1" =!= $"fp2", "changed")
              .otherwise("unchanged").as("status"),
            coalesce($"src1", $"src2").as("source"))
          .groupBy($"status", $"source")
          .agg(count(lit(1)).as("n"))
          .orderBy($"status", $"source")
      },
      Some(s"""WITH v1 AS (SELECT doc_id, md5(text) AS fp1, source AS src1
          FROM documents WHERE $oDocGate < 58982),
        v2 AS (SELECT doc_id,
            md5(CASE WHEN $oDocGate >= 30000 AND $oDocGate < 40000
                THEN text || ' rev2' ELSE text END) AS fp2,
            source AS src2
          FROM documents WHERE $oDocGate >= 6554)
        SELECT CASE WHEN fp1 IS NULL THEN 'added'
            WHEN fp2 IS NULL THEN 'removed'
            WHEN fp1 <> fp2 THEN 'changed'
            ELSE 'unchanged' END AS status,
          coalesce(src1, src2) AS source, count(*) AS n
        FROM v1 FULL JOIN v2 USING (doc_id)
        GROUP BY 1, 2 ORDER BY status, source""")),

    // ---- benchmark decontamination: a deterministic ~5% hash-gated
    // slice of the corpus stands in for the held-out eval set; any
    // training doc sharing a word 5-gram with it is contaminated (the
    // standard n-gram-overlap decontamination run before pretraining).
    // Scale: shingles travel as 60-bit md5-derived longs, not strings —
    // the join shuffles O(shingles) narrow rows keyed by shingle hash;
    // the grouped output is O(contaminated docs). 5-grams (not 3) so a
    // small vocab can't produce chance collisions — only true shared
    // passages flag. ----
    "q61_decontamination" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.functions.WordShingles.register(s)
        val docs = table(s, dir, "documents")
        def shingled(d: DataFrame): DataFrame = fanOut(s, d)
          .select($"doc_id",
            explode(graft.functions.WordShingles.word_shingles(lower($"text"), 5)).as("w"))
          .select($"doc_id",
            conv(substring(md5($"w"), 1, 15), 16, 10).cast("long").as("sh"))
        val bench = shingled(docs.filter(docGate($"doc_id") < BenchGate))
          .select($"sh").distinct()
        val train = shingled(docs.filter(docGate($"doc_id") >= BenchGate))
        // WordShingles emits per-doc DISTINCT shingles, so count(*) per
        // doc is already the distinct-shingle count
        val tot = train.groupBy($"doc_id").agg(count(lit(1)).as("n_shingles"))
        val hits = train.join(bench, "sh")
          .groupBy($"doc_id").agg(count(lit(1)).as("n_hits"))
        hits.join(tot, Seq("doc_id"))
          .select($"doc_id", $"n_shingles", $"n_hits",
            rnd4($"n_hits".cast("double") / $"n_shingles").as("contamination"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        sh5 AS (SELECT DISTINCT doc_id,
            CAST('0x' || substr(md5(ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]), 1, 15) AS BIGINT) AS sh
          FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-4)) AS i FROM toks)),
        bench AS (SELECT DISTINCT sh FROM sh5 WHERE $oDocGate < $BenchGate),
        train AS (SELECT doc_id, sh FROM sh5 WHERE $oDocGate >= $BenchGate),
        tot AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY 1),
        hits AS (SELECT t.doc_id, count(*) AS n_hits
          FROM train t JOIN bench b USING (sh) GROUP BY 1)
        SELECT h.doc_id, t.n_shingles, h.n_hits,
          ${oRnd4("cast(h.n_hits as double) / t.n_shingles")} AS contamination
        FROM hits h JOIN tot t USING (doc_id) ORDER BY doc_id""")),

    // ---- SURGICAL decontamination: instead of dropping a
    // contaminated doc (q61's flag), cut exactly the benchmark-
    // overlapping passages out of it and keep the rest — the
    // span-level removal frontier pipelines actually run, because a
    // long useful document shouldn't die for quoting one eval
    // question. Positional 5-gram hashes (GramHashes) of the training
    // side semi-join the benchmark gram set; matched window starts
    // merge into maximal spans (q112's gaps-and-islands); the scrub
    // is q113's anti-join + per-doc rejoin with a byte-exact md5
    // witness. Scale: the semi-join shuffles 60-bit gram longs (q61's
    // exchange class), spans are output-bounded, text never enters a
    // hash shuffle. ----
    "q131_decontaminate_scrub" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.functions.GramHashes.register(s)
        val docs = table(s, dir, "documents")
        def grams(d: DataFrame): DataFrame = fanOut(s, d)
          .select($"doc_id", posexplode(
            graft.functions.GramHashes.gram_hashes(lower($"text"), 5))
            .as(Seq("pos", "gh")))
        val bench = grams(docs.filter(docGate($"doc_id") < BenchGate))
          .select($"gh").distinct()
        val train = docs.filter(docGate($"doc_id") >= BenchGate)
        val starts = grams(train)
          .join(bench, Seq("gh"), "left_semi")
          .select($"doc_id", $"pos")
        Dedup.scrubBySpans(s, train, Dedup.mergeSpans(starts, 5))
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        g AS (SELECT doc_id, i - 1 AS pos,
            CAST('0x' || substr(md5(ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]), 1, 15) AS BIGINT) AS gh
          FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS i FROM toks)),
        bench AS (SELECT DISTINCT gh FROM g WHERE $oDocGate < $BenchGate),
        d AS (SELECT doc_id, pos FROM g
          WHERE $oDocGate >= $BenchGate AND gh IN (SELECT gh FROM bench)),
        m AS (SELECT doc_id, pos, max(pos) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM d),
        isl AS (SELECT doc_id, pos, sum(CASE WHEN pm IS NULL OR pos > pm + 5 THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY pos) AS span_id FROM m),
        spans AS (SELECT doc_id, min(pos) AS span_start, max(pos) + 4 AS span_end
          FROM isl GROUP BY doc_id, span_id),
        cov AS (SELECT doc_id, unnest(generate_series(span_start, span_end)) AS pos FROM spans),
        tk AS (SELECT doc_id, i - 1 AS pos, ws[i] AS w
          FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM toks)
          WHERE $oDocGate >= $BenchGate),
        kept AS (SELECT t.doc_id, t.pos, t.w FROM tk t
          LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
          WHERE c.doc_id IS NULL),
        ag AS (SELECT doc_id, count(*) AS n_kept,
            md5(string_agg(w, ' ' ORDER BY pos)) AS clean_md5
          FROM kept GROUP BY 1)
        SELECT dd.doc_id,
          cast(len(string_split(lower(dd.text), ' ')) as int) AS n_words,
          coalesce(a.n_kept, 0) AS n_kept,
          cast(len(string_split(lower(dd.text), ' ')) as bigint) - coalesce(a.n_kept, 0) AS n_removed,
          coalesce(a.clean_md5, md5('')) AS clean_md5
        FROM documents dd LEFT JOIN ag a ON a.doc_id = dd.doc_id
        WHERE ${oDocGate.replace("doc_id", "dd.doc_id")} >= $BenchGate
        ORDER BY dd.doc_id""")),

    // ---- repetition / boilerplate score: duplicate-trigram fraction
    // per doc (the Gopher-style repetition filter). One narrow codegen
    // pass — total trigrams is arithmetic on the word count, distinct
    // trigrams is the WordShingles array length; no shuffle except the
    // output sort. ----
    "q62_repetition" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.functions.WordShingles.register(s)
        val txt = lower($"text")
        val nWords = size(split(txt, " "))
        val nTri = greatest(nWords - 2, lit(0))
        val nDist = size(graft.functions.WordShingles.word_shingles(txt, 3))
        table(s, dir, "documents")
          .select($"doc_id",
            nWords.as("n_words"),
            nTri.as("n_trigrams"),
            nDist.as("n_distinct"),
            rnd4(when(nTri > 0,
              lit(1.0) - nDist.cast("double") / nTri).otherwise(lit(0.0))).as("dup_ratio"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        tri AS (SELECT doc_id, count(DISTINCT ws[i]||' '||ws[i+1]||' '||ws[i+2]) AS nd
          FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) AS i FROM toks)
          GROUP BY 1)
        SELECT t.doc_id,
          cast(len(t.ws) as int) AS n_words,
          cast(greatest(len(t.ws) - 2, 0) as int) AS n_trigrams,
          cast(coalesce(tr.nd, 0) as int) AS n_distinct,
          ${oRnd4("CASE WHEN len(t.ws) > 2 THEN 1.0 - cast(coalesce(tr.nd, 0) as double) / (len(t.ws) - 2) ELSE 0.0 END")} AS dup_ratio
        FROM toks t LEFT JOIN tri tr USING (doc_id) ORDER BY doc_id""")),

    // ---- PII scrubbing: regex redaction of emails, phone-like numbers
    // and IPv4 addresses, with per-doc redaction counts and the md5 of
    // the scrubbed text as a byte-exactness witness. The corpus itself
    // is synthetic word-soup with no PII, so the PII surface is
    // CONSTRUCTED deterministically from doc_id (both engines build the
    // identical string) — the scrub logic is what's under test. The
    // regexes stay within the syntax Java regex and RE2 share (classes,
    // bounded repeats, \b), so both engines redact identically.
    // Scale: narrow per-row pass, scan-bandwidth-bound, no shuffle. ----
    "q63_pii_scrub" -> Q(
      (s, dir) => {
        import s.implicits._
        val raw = concat(
          substring(lower($"text"), 1, 40),
          lit(" contact user"), $"doc_id".cast("string"),
          lit("@mail"), ($"doc_id" % 7).cast("string"), lit(".example.com"),
          lit(" tel 555-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
          lit(" host 10.0."), ($"doc_id" % 256).cast("string"),
          lit("."), (($"doc_id" * 7) % 256).cast("string"))
        val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
        val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
        val phoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
        val scrubbed = regexp_replace(
          regexp_replace(
            regexp_replace(raw, emailRe, "[EMAIL]"),
            ipRe, "[IP]"),
          phoneRe, "[PHONE]")
        table(s, dir, "documents")
          .select($"doc_id",
            size(regexp_extract_all(raw, lit(emailRe), lit(0))).as("n_emails"),
            size(regexp_extract_all(raw, lit(ipRe), lit(0))).as("n_ips"),
            size(regexp_extract_all(raw, lit(phoneRe), lit(0))).as("n_phones"),
            md5(scrubbed).as("scrub_md5"))
          .orderBy($"doc_id")
      },
      Some {
        val raw = """substr(lower(text), 1, 40) || ' contact user' || cast(doc_id as varchar)
          || '@mail' || cast(doc_id % 7 as varchar) || '.example.com'
          || ' tel 555-' || lpad(cast(doc_id % 10000 as varchar), 4, '0')
          || ' host 10.0.' || cast(doc_id % 256 as varchar)
          || '.' || cast(doc_id * 7 % 256 as varchar)"""
        val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
        val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
        val phoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
        s"""SELECT doc_id,
          cast(len(regexp_extract_all($raw, '$emailRe')) as int) AS n_emails,
          cast(len(regexp_extract_all($raw, '$ipRe')) as int) AS n_ips,
          cast(len(regexp_extract_all($raw, '$phoneRe')) as int) AS n_phones,
          md5(regexp_replace(regexp_replace(regexp_replace($raw,
            '$emailRe', '[EMAIL]', 'g'), '$ipRe', '[IP]', 'g'), '$phoneRe', '[PHONE]', 'g')) AS scrub_md5
        FROM documents ORDER BY doc_id"""
      }),

    // ---- corpus-wide repeated passages: word 8-grams appearing in ≥3
    // distinct docs — the boilerplate miner (shared headers/footers/
    // licence blocks) whose output feeds a strip pass before training.
    // Scale: one explode + ONE groupBy keyed on the passage md5;
    // countDistinct(doc_id) partial-aggregates map-side per (passage,
    // doc) and the filtered output is only the passages that repeat.
    // The 40-char prefix rides along (min over identical values) so
    // the report is human-auditable without a join back to text. ----
    "q67_repeated_passages" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.functions.WordShingles.register(s)
        fanOut(s, table(s, dir, "documents"))
          .select($"doc_id",
            explode(graft.functions.WordShingles.word_shingles(lower($"text"), 8)).as("w"))
          .select($"doc_id", md5($"w").as("passage_md5"), substring($"w", 1, 40).as("pfx"))
          .groupBy($"passage_md5")
          .agg(countDistinct($"doc_id").as("n_docs"), min($"pfx").as("prefix"))
          .filter($"n_docs" >= 3)
          .select($"passage_md5", $"prefix", $"n_docs")
          .orderBy($"n_docs".desc, $"passage_md5")
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        sh8 AS (SELECT DISTINCT doc_id,
            ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]||' '||ws[i+5]||' '||ws[i+6]||' '||ws[i+7] AS w
          FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-7)) AS i FROM toks)),
        rep AS (SELECT md5(w) AS passage_md5, min(substr(w, 1, 40)) AS prefix,
            count(DISTINCT doc_id) AS n_docs
          FROM sh8 GROUP BY 1)
        SELECT passage_md5, prefix, n_docs FROM rep WHERE n_docs >= 3
        ORDER BY n_docs DESC, passage_md5""")),

    // ---- domain mixture report: per-source doc/char shares and the
    // multiplicative reweighting factor that would equalize the mix on
    // characters (the knob a data-mixing stage turns). One partial-agg
    // groupBy(source) + a broadcast single-row total — the q57 scalar
    // pattern; shuffle is O(distinct sources). ----
    "q65_domain_mix" -> Q(
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val bySrc = docs.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"))
        val tot = bySrc.agg(
          sum($"n_docs").as("tot_docs"), sum($"n_chars").as("tot_chars"),
          count(lit(1)).as("n_sources"))
        bySrc.crossJoin(broadcast(tot))
          .select($"source", $"n_docs", $"n_chars",
            rnd4($"n_chars".cast("double") / $"tot_chars").as("char_share"),
            rnd4($"tot_chars".cast("double") / ($"n_sources" * $"n_chars")).as("mix_weight"))
          .orderBy($"source")
      },
      Some(s"""WITH by_src AS (SELECT source, count(*) AS n_docs,
          sum(n_chars) AS n_chars FROM documents GROUP BY 1),
        tot AS (SELECT sum(n_docs) AS tot_docs, sum(n_chars) AS tot_chars,
          count(*) AS n_sources FROM by_src)
        SELECT source, n_docs, cast(n_chars as bigint) AS n_chars,
          ${oRnd4("cast(n_chars as double) / tot_chars")} AS char_share,
          ${oRnd4("cast(tot_chars as double) / (n_sources * n_chars)")} AS mix_weight
        FROM by_src, tot ORDER BY source""")),

    // ---- domain-balanced sampling: APPLY q65's reweighting — keep
    // each doc with per-source probability base_rate × mix_weight via
    // the deterministic md5 gate, so over-represented sources are
    // down-sampled toward the uniform char mix in ONE pass with no
    // RNG state. The acceptance threshold floor(65536·p) is integer
    // arithmetic on an identically-derived double in both engines, so
    // the sample is oracle-exact and reproducible (re-running on the
    // grown corpus re-selects a consistent subset, shifting only with
    // the weights). Scale: one partial-agg groupBy(source) for the
    // weights (O(sources) rows, broadcast back), then a narrow
    // filter — no per-doc shuffle at all. ----
    "q74_domain_balanced_sample" -> Q(
      (s, dir) => {
        import s.implicits._
        val BaseRate = 0.5
        val docs = table(s, dir, "documents")
        val bySrc = docs.groupBy($"source").agg(sum($"n_chars").as("src_chars"))
        val tot = bySrc.agg(sum($"src_chars").as("tot_chars"),
          count(lit(1)).as("n_sources"))
        val weighted = bySrc.crossJoin(broadcast(tot))
          .select($"source",
            least(lit(1.0),
              lit(BaseRate) * $"tot_chars" / ($"n_sources" * $"src_chars")).as("p"))
        docs.join(broadcast(weighted), Seq("source"))
          .filter(docGate($"doc_id") < floor($"p" * 65536).cast("long"))
          .select($"doc_id", $"source")
          .orderBy($"doc_id")
      },
      Some(s"""WITH by_src AS (SELECT source, sum(n_chars) AS src_chars
          FROM documents GROUP BY 1),
        tot AS (SELECT sum(src_chars) AS tot_chars, count(*) AS n_sources FROM by_src),
        w AS (SELECT source,
            least(1.0, 0.5 * tot_chars / (n_sources * src_chars)) AS p
          FROM by_src, tot)
        SELECT d.doc_id, d.source
        FROM documents d JOIN w USING (source)
        WHERE $oDocGate < cast(floor(w.p * 65536) as bigint)
        ORDER BY d.doc_id""")),

    // ---- temperature-weighted mixture sampling: the multilingual /
    // multi-domain mixing rule q_s ∝ p_s^α (α = 0.5 here) — flatter
    // than the natural mix, so rare sources are upsampled relative to
    // dominant ones without going fully uniform (q74 is the α→0
    // endpoint of this knob). Per-doc acceptance a_s ∝ q_s / p_s
    // realizes the target mix in one deterministic md5-gated pass.
    // sqrt is IEEE-correctly-rounded (identical in both engines) and
    // the cross-source normalizer Σ√p rides a decimal cast so the
    // handful-of-rows sum is order-independent — the sample is
    // oracle-exact and reproducible. Scale: one partial-agg
    // groupBy(source) + two broadcast scalars, then a narrow filter —
    // no per-doc shuffle (q74's shape, one extra scalar pass). ----
    "q80_temperature_mix_sample" -> Q(
      (s, dir) => {
        import s.implicits._
        val D = org.apache.spark.sql.types.DecimalType(28, 12)
        val BaseRate = 0.5
        val docs = table(s, dir, "documents")
        val bySrc = docs.groupBy($"source").agg(sum($"n_chars").as("src_chars"))
        val tot = bySrc.agg(sum($"src_chars").as("tot_chars"))
        val shares = bySrc.crossJoin(broadcast(tot))
          .select($"source", ($"src_chars".cast("double") / $"tot_chars").as("p"))
        val norm = shares.agg(sum(sqrt($"p").cast(D)).as("z"))
        val weighted = shares.crossJoin(broadcast(norm))
          .select($"source",
            least(lit(1.0),
              lit(BaseRate) * (sqrt($"p") / $"z".cast("double")) / $"p").as("a"))
        docs.join(broadcast(weighted), Seq("source"))
          .filter(docGate($"doc_id") < floor($"a" * 65536).cast("long"))
          .select($"doc_id", $"source", $"n_chars")
          .orderBy($"doc_id")
      },
      Some(s"""WITH by_src AS (SELECT source, sum(n_chars) AS src_chars
          FROM documents GROUP BY 1),
        tot AS (SELECT sum(src_chars) AS tot_chars FROM by_src),
        shares AS (SELECT source, cast(src_chars as double) / tot_chars AS p
          FROM by_src, tot),
        norm AS (SELECT sum(cast(sqrt(p) as decimal(28,12))) AS z FROM shares),
        w AS (SELECT source,
            least(1.0, 0.5 * (sqrt(p) / cast(z as double)) / p) AS a
          FROM shares, norm)
        SELECT d.doc_id, d.source, d.n_chars
        FROM documents d JOIN w USING (source)
        WHERE $oDocGate < cast(floor(w.a * 65536) as bigint)
        ORDER BY d.doc_id""")),

    // ---- cross-corpus n-gram novelty: per source, the fraction of its
    // distinct word 5-grams absent from a reference corpus (source
    // 'src0' stands in for "what the model already trained on") — the
    // acquisition-time question "how much NEW content does this source
    // add?". Scale: shingles travel as 60-bit longs (q61's shape);
    // the per-source distinct is a partial-agg groupBy keyed on
    // (source, sh); the reference side is one anti-join probe whose
    // build side is O(reference distinct shingles). Output is
    // O(sources). ----
    "q86_ngram_novelty" -> Q(
      (s, dir) => {
        import s.implicits._
        graft.functions.WordShingles.register(s)
        val sh = fanOut(s, table(s, dir, "documents"))
          .select($"source",
            explode(graft.functions.WordShingles.word_shingles(lower($"text"), 5)).as("w"))
          .select($"source",
            conv(substring(md5($"w"), 1, 15), 16, 10).cast("long").as("sh"))
          .distinct()
        val ref = sh.filter($"source" === "src0").select($"sh")
        val tot = sh.groupBy($"source").agg(count(lit(1)).as("n_shingles"))
        val nov = sh.join(ref, Seq("sh"), "left_anti")
          .groupBy($"source").agg(count(lit(1)).as("n_novel"))
        tot.join(nov, Seq("source"), "left")
          .select($"source", $"n_shingles",
            coalesce($"n_novel", lit(0L)).as("n_novel"),
            rnd4(coalesce($"n_novel", lit(0L)).cast("double") / $"n_shingles").as("novelty"))
          .orderBy($"source")
      },
      Some(s"""WITH toks AS (SELECT doc_id, source, string_split(lower(text), ' ') AS ws FROM documents),
        sh5 AS (SELECT DISTINCT source,
            CAST('0x' || substr(md5(ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]), 1, 15) AS BIGINT) AS sh
          FROM (SELECT source, ws, unnest(generate_series(1, len(ws)-4)) AS i FROM toks)),
        ref AS (SELECT DISTINCT sh FROM sh5 WHERE source = 'src0'),
        tot AS (SELECT source, count(*) AS n_shingles FROM sh5 GROUP BY 1),
        nov AS (SELECT source, count(*) AS n_novel FROM sh5
          WHERE sh NOT IN (SELECT sh FROM ref) GROUP BY 1)
        SELECT t.source, t.n_shingles, coalesce(n.n_novel, 0) AS n_novel,
          ${oRnd4("cast(coalesce(n.n_novel, 0) as double) / t.n_shingles")} AS novelty
        FROM tot t LEFT JOIN nov n USING (source) ORDER BY t.source""")),

    // ---- token-budget sampling: take docs per source in deterministic
    // md5-rank order until a per-source token budget is filled — the
    // "assemble exactly N tokens of domain X" primitive a mixture
    // executor runs after q65/q80 decide the shares. The running sum is
    // a ROWS-frame window per source, so each partition's state is one
    // accumulator; the md5 rank makes the selection reproducible and
    // engine-independent (no RNG, no partition-order dependence).
    // Scale: one shuffle keyed on source; per-task state O(1). A
    // pathologically dominant source → salt the window key into ranked
    // sub-budgets, same as any skewed window. ----
    "q87_token_budget_sample" -> Q(
      (s, dir) => {
        import s.implicits._
        val Budget = 500L
        val toks = table(s, dir, "documents")
          .select($"doc_id", $"source",
            size(split(lower($"text"), " ")).cast("long").as("n_tokens"),
            md5($"doc_id".cast("string")).as("rk"))
        val w = Window.partitionBy($"source").orderBy($"rk", $"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        toks.withColumn("cum_tokens", sum($"n_tokens").over(w))
          .filter($"cum_tokens" <= Budget)
          .select($"doc_id", $"source", $"n_tokens", $"cum_tokens")
          .orderBy($"doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, source,
          cast(len(string_split(lower(text), ' ')) as bigint) AS n_tokens,
          md5(cast(doc_id as varchar)) AS rk FROM documents),
        c AS (SELECT doc_id, source, n_tokens,
            cast(sum(n_tokens) OVER (PARTITION BY source ORDER BY rk, doc_id
              ROWS UNBOUNDED PRECEDING) as bigint) AS cum_tokens
          FROM toks)
        SELECT doc_id, source, n_tokens, cum_tokens FROM c
        WHERE cum_tokens <= 500 ORDER BY doc_id""")),

    // ---- domain KL divergence: per source, KL(source unigram dist ‖
    // corpus unigram dist) — the mixture diagnostic that quantifies how
    // far each domain's token distribution sits from the blend the
    // model will actually see (high-KL sources shift the mix most per
    // token; near-zero KL sources are redundant with the blend).
    // Numeric discipline: every count is exact, each per-(source,word)
    // term p·ln(p/q) is one deterministic IEEE expression, and the
    // Σ over words rides a decimal(28,12) cast so partition order
    // can't perturb the sum (q80's Σ√p pattern). Scale: two partial-agg
    // groupBys — (source, word) is bounded by sources × vocab, word by
    // vocab — and the join back is a broadcast of the vocab-sized
    // side; the corpus text itself is scanned once. ----
    "q89_domain_kl" -> Q(
      (s, dir) => {
        import s.implicits._
        val D = org.apache.spark.sql.types.DecimalType(28, 12)
        val words = table(s, dir, "documents")
          .select($"source", explode(split(lower($"text"), " ")).as("word"))
        val bySrcWord = words.groupBy($"source", $"word").agg(count(lit(1)).as("c_sw"))
        val bySrc = bySrcWord.groupBy($"source").agg(sum($"c_sw").as("t_s"))
        val byWord = bySrcWord.groupBy($"word").agg(sum($"c_sw").as("c_w"))
        val tot = byWord.agg(sum($"c_w").as("t"))
        val term = ($"c_sw".cast("double") / $"t_s") *
          log(($"c_sw".cast("double") * $"t") / ($"t_s".cast("double") * $"c_w"))
        bySrcWord
          .join(bySrc, Seq("source"))
          .join(broadcast(byWord), Seq("word"))
          .crossJoin(broadcast(tot))
          .select($"source", $"t_s", term.cast(D).as("term"))
          .groupBy($"source", $"t_s")
          .agg(rnd4(sum($"term").cast("double")).as("kl"))
          .select($"source", $"t_s".as("n_tokens"), $"kl")
          .orderBy($"source")
      },
      Some(s"""WITH words AS (SELECT source, unnest(string_split(lower(text), ' ')) AS word
          FROM documents),
        bsw AS (SELECT source, word, count(*) AS c_sw FROM words GROUP BY 1, 2),
        bs AS (SELECT source, sum(c_sw) AS t_s FROM bsw GROUP BY 1),
        bw AS (SELECT word, sum(c_sw) AS c_w FROM bsw GROUP BY 1),
        tot AS (SELECT sum(c_w) AS t FROM bw),
        terms AS (SELECT bsw.source, bs.t_s,
            cast((cast(c_sw as double) / t_s) *
              ln((cast(c_sw as double) * t) / (cast(t_s as double) * c_w))
              as decimal(28,12)) AS term
          FROM bsw JOIN bs USING (source) JOIN bw USING (word), tot)
        SELECT source, cast(t_s as bigint) AS n_tokens,
          ${oRnd4("cast(sum(term) as double)")} AS kl
        FROM terms GROUP BY source, t_s ORDER BY source""")),

    // ---- deterministic train/val/test split: the 98/1/1 holdout
    // assignment every training run needs, as a pure function of
    // doc_id (the q48 md5-gate, thresholds on the 16-bit prefix) — no
    // RNG, no state, reproducible across engines, runs and cluster
    // sizes, and docs added later don't reshuffle existing
    // assignments. Disjointness and totality hold by construction
    // (the gate is a total function into three intervals). Output is
    // the per-(split, source) audit report a pipeline logs; the
    // assignment column itself is the narrow `split` expression.
    // Scale: one narrow pass + a groupBy bounded by 3 × sources. ----
    "q90_train_val_test" -> Q(
      (s, dir) => {
        import s.implicits._
        // 16-bit gate: 98% ≈ [0, 64225), 1% ≈ [64225, 64880), rest test
        val g = docGate($"doc_id")
        val split = when(g < 64225L, "train")
          .when(g < 64880L, "val")
          .otherwise("test")
        table(s, dir, "documents")
          .select(split.as("split"), $"source", $"n_chars")
          .groupBy($"split", $"source")
          .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"))
          .orderBy($"split", $"source")
      },
      Some(s"""WITH assigned AS (SELECT
          CASE WHEN $oDocGate < 64225 THEN 'train'
               WHEN $oDocGate < 64880 THEN 'val'
               ELSE 'test' END AS split,
          source, n_chars FROM documents)
        SELECT split, source, count(*) AS n_docs,
          cast(sum(n_chars) as bigint) AS n_chars
        FROM assigned GROUP BY 1, 2 ORDER BY split, source"""))
  )
}
