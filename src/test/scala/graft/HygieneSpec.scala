package graft

import org.apache.spark.sql.functions._
import graft.ops.{Hygiene, Similarity}

/** Corpus-hygiene operators (q61–q65): decontamination, repetition,
  * PII scrub, vector quantization, domain mixture. The oracle gate
  * hash-checks values against DuckDB; these specs pin the SEMANTIC
  * properties a hash can't express (e.g. "the scrubbed text contains
  * no redactable pattern", "codes span exactly 0..255"). */
class HygieneSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q118 constraint audit: counts match direct recomputation, all rules present") {
    Core.clearCaches(spark)
    val rows = SparkEntry.queries("q118_constraint_audit")(spark, dir)
      .as[(String, Long, Long)].collect()
      .map { case (r, c, v) => r -> ((c, v)) }.toMap
    assert(rows.keySet == Set(
      "lineitem.discount_range", "lineitem.price_nonneg", "lineitem.qty_positive",
      "orders.status_domain", "orders.total_nonneg",
      "lineitem.fk_orders", "orders.fk_customer"))
    val li = Core.table(spark, dir, "lineitem")
    val ord = Core.table(spark, dir, "orders")
    assert(rows("lineitem.qty_positive") ==
      ((li.count(), li.filter($"l_quantity" <= 0).count())))
    assert(rows("orders.status_domain") ==
      ((ord.count(), ord.filter(!$"o_orderstatus".isin("O", "F", "P")).count())))
    assert(rows("lineitem.fk_orders") == ((li.count(),
      li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti").count())))
    Core.clearCaches(spark)
  }

  test("q131 surgical decontamination: exactly the quoted passage is cut, clean docs untouched") {
    import org.apache.spark.sql.SaveMode
    def gate(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 4), 16)
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // pick real ids on each side of the md5 gate
    val benchId = (1L to 2000L).find(gate(_) < 3277L).get
    val trainIds = (1L to 2000L).filter(gate(_) >= 3277L).take(2)
    val quote = "alpha bravo charlie delta echo"
    val tmp = java.nio.file.Files.createTempDirectory("graft-decon").toString
    Seq(
      benchId -> s"$quote f1 f2 f3 f4 f5",
      trainIds(0) -> s"u1 u2 $quote v1 v2",        // quotes the benchmark
      trainIds(1) -> "w1 w2 w3 w4 w5 w6 w7 w8")    // clean
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/documents.parquet")
    Core.clearCaches(spark)
    val got = SparkEntry.queries("q131_decontaminate_scrub")(spark, tmp)
      .as[(Long, Int, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet == trainIds.toSet, "only train docs are reported")
    // the quoting doc loses exactly the 5 quoted words
    assert(got(trainIds(0)) == ((9, 4L, 5L, md5hex("u1 u2 v1 v2"))))
    // the clean doc is byte-identical
    assert(got(trainIds(1)) == ((8, 8L, 0L, md5hex("w1 w2 w3 w4 w5 w6 w7 w8"))))
    Core.clearCaches(spark)
  }

  test("q61 decontamination: flagged docs truly share a 5-gram with the benchmark slice") {
    graft.functions.WordShingles.register(spark)
    val got = Hygiene.catalog("q61_decontamination").fn(spark, dir)
    // independent brute-force check on the raw strings (no hashing):
    // docs flagged iff their 5-gram set intersects the benchmark's
    val docs = Core.table(spark, dir, "documents")
    val gate = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10).cast("long")
    val sh = docs.select($"doc_id", gate.as("g"),
      explode(graft.functions.WordShingles.word_shingles(lower($"text"), 5)).as("w"))
    val bench = sh.filter($"g" < 3277).select($"w").distinct()
    val expect = sh.filter($"g" >= 3277).join(bench, "w")
      .select($"doc_id").distinct().as[Long].collect().toSet
    val flagged = got.select($"doc_id").as[Long].collect().toSet
    assert(flagged == expect, s"flagged $flagged vs brute-force $expect")
    // contamination is a ratio of per-doc distinct-shingle counts
    val bad = got.filter($"contamination" <= 0 || $"contamination" > 1 ||
      $"n_hits" > $"n_shingles").count()
    assert(bad == 0)
  }

  test("q62 repetition: hand-computed duplicate-trigram ratio") {
    val got = Hygiene.catalog("q62_repetition").fn(spark, dir)
      .filter($"n_words" > 2)
    // invariants: 1 <= n_distinct <= n_trigrams = n_words - 2
    val bad = got.filter($"n_distinct" < 1 || $"n_distinct" > $"n_trigrams" ||
      $"n_trigrams" =!= $"n_words" - 2 ||
      $"dup_ratio" < 0 || $"dup_ratio" >= 1).count()
    assert(bad == 0)
    // a fully-repetitive synthetic doc: "a b a b a b" → 4 trigrams, 2 distinct
    graft.functions.WordShingles.register(spark)
    val r = spark.sql(
      "SELECT size(word_shingles('a b a b a b', 3)) AS nd").head().getInt(0)
    assert(r == 2)
  }

  test("q63 PII scrub: scrubbed text has zero redactable patterns left") {
    val got = Hygiene.catalog("q63_pii_scrub").fn(spark, dir)
    // every constructed doc has exactly one of each PII kind
    val bad = got.filter($"n_emails" =!= 1 || $"n_ips" =!= 1 || $"n_phones" =!= 1).count()
    assert(bad == 0, "constructed PII surface should have 1 email/ip/phone per doc")
    // re-scrub idempotence: rebuilding the scrubbed string and counting
    // patterns must give zero (the scrub actually removed them)
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val raw = concat(substring(lower($"text"), 1, 40),
      lit(" contact user"), $"doc_id".cast("string"),
      lit("@mail"), ($"doc_id" % 7).cast("string"), lit(".example.com"),
      lit(" tel 555-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
      lit(" host 10.0."), ($"doc_id" % 256).cast("string"),
      lit("."), (($"doc_id" * 7) % 256).cast("string"))
    val scrubbed = regexp_replace(regexp_replace(regexp_replace(raw,
      emailRe, "[EMAIL]"), ipRe, "[IP]"), "\\b[0-9]{3}-[0-9]{4}\\b", "[PHONE]")
    val leftover = Core.table(spark, dir, "documents")
      .select(
        size(regexp_extract_all(scrubbed, lit(emailRe), lit(0))).as("e"),
        size(regexp_extract_all(scrubbed, lit(ipRe), lit(0))).as("i"),
        size(regexp_extract_all(scrubbed, lit("\\b[0-9]{3}-[0-9]{4}\\b"), lit(0))).as("p"))
      .filter($"e" > 0 || $"i" > 0 || $"p" > 0).count()
    assert(leftover == 0, "scrub left redactable patterns behind")
  }

  test("q64 vector quantize: codes span exactly 0..255 and reconstruct within one step") {
    val got = Similarity.catalog("q64_vector_quantize").fn(spark, dir)
    val codes = got.select($"vec_id", $"mn", $"mx",
      transform(split($"codes", ","), c => c.cast("int")).as("cs"))
    // min element quantizes to 0, max element to 255; all codes in range
    val bad = codes.filter(
      array_min($"cs") =!= 0 || array_max($"cs") =!= 255 ||
        exists($"cs", c => c < 0 || c > 255)).count()
    assert(bad == 0)
    // dequantized values stay within one quantization step of the range
    val step = ($"mx" - $"mn") / 255.0
    val recon = codes.select($"mn", $"mx", step.as("st"),
        transform($"cs", c => $"mn" + c.cast("double") * step).as("deq"))
      .filter(exists($"deq", v => v < $"mn" - $"st" || v > $"mx" + $"st"))
    assert(recon.count() == 0)
  }

  test("q67 repeated passages: agrees with an independent transform/sequence formulation") {
    val got = Hygiene.catalog("q67_repeated_passages").fn(spark, dir)
      .select($"passage_md5", $"n_docs").as[(String, Long)].collect().toMap
    // independent implementation: built-in HOFs instead of WordShingles
    val docs = Core.table(spark, dir, "documents")
    val expect = docs.select($"doc_id",
        explode(array_distinct(expr(
          """transform(sequence(1, greatest(size(split(lower(text), ' ')) - 7, 0)),
             i -> array_join(slice(split(lower(text), ' '), i, 8), ' '))"""))).as("w"))
      .groupBy(md5($"w").as("passage_md5"))
      .agg(countDistinct($"doc_id").as("n_docs"))
      .filter($"n_docs" >= 3)
      .as[(String, Long)].collect().toMap
    assert(got == expect, s"got ${got.size} passages, independent recompute ${expect.size}")
    assert(got.values.forall(_ >= 3))
  }

  test("q65 domain mix: shares sum to 1, weights invert the shares") {
    val got = Hygiene.catalog("q65_domain_mix").fn(spark, dir)
    val tot = got.agg(sum($"char_share")).head().getDouble(0)
    assert(math.abs(tot - 1.0) < 0.01, s"char shares sum to $tot")
    // weight × share × n_sources ≈ 1 for every source (inverse mixing)
    val k = got.count()
    val bad = got.filter(
      abs($"mix_weight" * $"char_share" * k - 1.0) > 0.01).count()
    assert(bad == 0)
  }

  test("q74 balanced sample: acceptance equalizes expected char mass; counts track p") {
    // the test corpus is near-uniform by construction, so comparing
    // realized spreads would only measure sampling noise — instead
    // verify the MECHANISM: p_src ∝ 1/src_chars (capped at 1), which
    // makes expected post-sample char mass p_src·src_chars identical
    // across sources, and realized per-source keeps sit within
    // binomial tolerance of p_src·n_src
    val docs = graft.Core.table(spark, dir, "documents")
    val stats = docs.groupBy($"source")
      .agg(count(lit(1)).as("n"), sum($"n_chars").as("chars"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val totChars = stats.map(_._3).sum.toDouble
    val nSources = stats.length
    val p = stats.map { case (src, _, c) =>
      src -> math.min(1.0, 0.5 * totChars / (nSources * c))
    }.toMap
    // expected char mass per source is uniform wherever the cap is not
    // binding: p_src · chars_src = 0.5 · totChars / nSources
    val masses = stats.collect { case (src, _, c) if p(src) < 1.0 => p(src) * c }
    assert(masses.nonEmpty &&
      masses.forall(m => math.abs(m - masses.head) < 1e-6 * masses.head))
    val kept = Hygiene.catalog("q74_domain_balanced_sample").fn(spark, dir)
      .groupBy($"source").agg(count(lit(1)).as("k"))
      .as[(String, Long)].collect().toMap
    stats.foreach { case (src, n, _) =>
      val expect = p(src) * n
      val tol = 3 * math.sqrt(n * p(src) * (1 - p(src))) + 1
      val got = kept.getOrElse(src, 0L).toDouble
      assert(math.abs(got - expect) <= tol,
        s"$src kept $got, expected $expect ± $tol")
    }
    // the sample is the deterministic gate rule, not an RNG draw
    val a = Hygiene.catalog("q74_domain_balanced_sample").fn(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    val b = Hygiene.catalog("q74_domain_balanced_sample").fn(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("q80 temperature mix: acceptance ∝ p^(α-1), monotone against share; subset of corpus") {
    val docs = graft.Core.table(spark, dir, "documents")
    val stats = docs.groupBy($"source").agg(sum($"n_chars").as("chars"))
      .as[(String, Long)].collect().sortBy(_._1)
    val totChars = stats.map(_._2).sum.toDouble
    val z = stats.map(s => math.sqrt(s._2 / totChars)).sum
    val accept = stats.map { case (src, c) =>
      val p = c / totChars
      src -> math.min(1.0, 0.5 * (math.sqrt(p) / z) / p)
    }.toMap
    // α = 0.5 < 1: a bigger char share must never get a HIGHER
    // acceptance rate (the flattening direction of the temperature)
    val byShare = stats.sortBy(_._2)
    byShare.zip(byShare.tail).foreach { case ((lo, _), (hi, _)) =>
      assert(accept(lo) >= accept(hi) - 1e-12,
        s"acceptance not monotone: $lo=${accept(lo)} < $hi=${accept(hi)}")
    }
    // realized keeps per source within binomial tolerance of a_src·n
    val n = docs.groupBy($"source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val kept = Hygiene.catalog("q80_temperature_mix_sample").fn(spark, dir)
      .groupBy($"source").agg(count(lit(1)).as("k"))
      .as[(String, Long)].collect().toMap
    stats.foreach { case (src, _) =>
      val expect = accept(src) * n(src)
      val tol = 3 * math.sqrt(n(src) * accept(src) * (1 - accept(src))) + 1
      val got = kept.getOrElse(src, 0L).toDouble
      assert(math.abs(got - expect) <= tol, s"$src kept $got, expected $expect ± $tol")
    }
    // kept docs are a subset of the corpus (no fabricated rows)
    val ids = Hygiene.catalog("q80_temperature_mix_sample").fn(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    val all = docs.select($"doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(all))
  }

  test("q86 novelty: src0 is 0 against itself; agrees with a raw-string recompute") {
    val got = Hygiene.catalog("q86_ngram_novelty").fn(spark, dir)
    val bad = got.filter($"novelty" < 0 || $"novelty" > 1 ||
      $"n_novel" > $"n_shingles").count()
    assert(bad == 0)
    val src0 = got.filter($"source" === "src0")
      .select($"n_novel").as[Long].collect()
    assert(src0.sameElements(Array(0L)), "reference source must have zero novelty")
    // brute-force on raw shingle strings (no hashing): per-source
    // distinct 5-grams minus src0's
    graft.functions.WordShingles.register(spark)
    val sh = Core.table(spark, dir, "documents")
      .select($"source",
        explode(graft.functions.WordShingles.word_shingles(lower($"text"), 5)).as("w"))
      .distinct()
    val ref = sh.filter($"source" === "src0").select($"w").as[String].collect().toSet
    val expect = sh.as[(String, String)].collect().groupBy(_._1).map { case (s, ws) =>
      s -> ws.map(_._2).count(w => !ref.contains(w)).toLong
    }
    val gotMap = got.select($"source", $"n_novel").as[(String, Long)].collect().toMap
    assert(gotMap == expect)
  }

  test("q87 token budget: per-source cum <= budget, selection is the md5-rank prefix") {
    val got = Hygiene.catalog("q87_token_budget_sample").fn(spark, dir)
    assert(got.filter($"cum_tokens" > 500).count() == 0)
    assert(got.count() > 0)
    // the kept set per source is exactly the prefix of the md5-rank
    // order whose running token sum fits the budget
    val docs = Core.table(spark, dir, "documents")
      .select($"doc_id", $"source",
        size(split(lower($"text"), " ")).cast("long").as("n"),
        md5($"doc_id".cast("string")).as("rk"))
      .as[(Long, String, Long, String)].collect()
    val expect = docs.groupBy(_._2).values.flatMap { rows =>
      var cum = 0L
      rows.sortBy(r => (r._4, r._1)).takeWhile { r =>
        cum += r._3; cum <= 500L
      }.map(_._1)
    }.toSet
    val gotIds = got.select($"doc_id").as[Long].collect().toSet
    assert(gotIds == expect)
  }

  test("q90 split: partitions the corpus, ratios near 98/1/1, exact vs driver recompute") {
    val got = Hygiene.catalog("q90_train_val_test").fn(spark, dir)
      .as[(String, String, Long, Long)].collect()
    val docs = Core.table(spark, dir, "documents")
      .select($"doc_id", $"source", $"n_chars").as[(Long, String, Long)].collect()
    // totality: every doc lands in exactly one split
    assert(got.map(_._3).sum == docs.length)
    // exact agreement with a driver-side recompute of the md5 gate
    def gate(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(2).map("%02x".format(_)).mkString, 16)
    }
    def split(id: Long): String = {
      val g = gate(id)
      if (g < 64225L) "train" else if (g < 64880L) "val" else "test"
    }
    val expect = docs.groupBy(r => (split(r._1), r._2))
      .map { case (k, rs) => (k._1, k._2, rs.length.toLong, rs.map(_._3).sum) }
      .toSet
    assert(got.toSet == expect)
    // the train share dominates (98% nominal; binomial tolerance on a
    // small corpus)
    val train = got.filter(_._1 == "train").map(_._3).sum.toDouble / docs.length
    assert(train > 0.9, s"train share $train")
  }

  test("q89 domain KL: non-negative, and matches an independent driver-side recompute") {
    val got = Hygiene.catalog("q89_domain_kl").fn(spark, dir)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(got.forall(_._3 >= 0.0), "KL divergence must be non-negative")
    // independent recompute from raw word counts
    val counts = Core.table(spark, dir, "documents")
      .select($"source", explode(split(lower($"text"), " ")).as("w"))
      .groupBy($"source", $"w").count()
      .as[(String, String, Long)].collect()
    val bySrc = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val byWord = counts.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val t = byWord.values.sum.toDouble
    val expect = counts.groupBy(_._1).map { case (s, rows) =>
      s -> rows.map { case (_, w, c) =>
        val p = c.toDouble / bySrc(s)
        p * math.log((c.toDouble * t) / (bySrc(s).toDouble * byWord(w)))
      }.sum
    }
    got.foreach { case (s, n, kl) =>
      assert(n == bySrc(s))
      assert(math.abs(kl - expect(s)) < 1e-3, s"$s: got $kl expected ${expect(s)}")
    }
  }
}
