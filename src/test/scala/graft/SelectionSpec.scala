package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic pins for the data-selection family (ops.Selection) that
  * the DuckDB oracle can't express directly: helper-level invariants
  * on hand-built inputs where the expected answer is known by
  * construction, plus losslessness of the CDC chunker against the
  * real corpus. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // ---- triangleStats: known graphs, known censuses ----

  private def edges(pairs: (String, String)*) =
    pairs.toSeq.map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .distinct.toDF("a", "b")

  test("triangleStats on K4: every node closes 3 triangles, coefficient 1") {
    val k4 = edges("a" -> "b", "a" -> "c", "a" -> "d",
      "b" -> "c", "b" -> "d", "c" -> "d")
    val out = ops.Selection.triangleStats(k4)
      .orderBy("tok").collect().toSeq
    assert(out == Seq(
      Row("a", 3L, 3L, 1.0), Row("b", 3L, 3L, 1.0),
      Row("c", 3L, 3L, 1.0), Row("d", 3L, 3L, 1.0)))
  }

  test("triangleStats is exactly once per triangle: bowtie counts the shared node twice") {
    // two triangles sharing node x: x-a-b and x-c-d
    val bowtie = edges("x" -> "a", "x" -> "b", "a" -> "b",
      "x" -> "c", "x" -> "d", "c" -> "d")
    val out = ops.Selection.triangleStats(bowtie)
      .orderBy("tok").collect().toSeq
    // leaves: deg 2, 1 triangle, cc = 1; hub x: deg 4, 2 triangles, cc = 2*2/(4*3)
    assert(out == Seq(
      Row("a", 2L, 1L, 1.0), Row("b", 2L, 1L, 1.0),
      Row("c", 2L, 1L, 1.0), Row("d", 2L, 1L, 1.0),
      Row("x", 4L, 2L, 0.3333)))
  }

  test("triangleStats on triangle-free graphs returns no rows") {
    val square = edges("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
    val star = edges("h" -> "a", "h" -> "b", "h" -> "c", "h" -> "d")
    assert(ops.Selection.triangleStats(square).count() == 0)
    assert(ops.Selection.triangleStats(star).count() == 0)
  }

  test("triangleStats survives a celebrity hub: star + one closing edge") {
    // hub h with 50 leaves, plus one edge between two leaves — exactly
    // one triangle; the hub orientation means h (max degree) generates
    // no wedges itself.
    val leaves = (0 until 50).map(i => ("h", f"l$i%02d"))
    val g = edges(leaves :+ ("l00" -> "l01"): _*)
    val out = ops.Selection.triangleStats(g).orderBy("tok").collect().toSeq
    assert(out.map(r => (r.getString(0), r.getLong(2))) ==
      Seq(("h", 1L), ("l00", 1L), ("l01", 1L)))
  }

  // ---- cdcChunks: lossless, deterministic, boundary-local ----

  test("cdcChunks reassembles every document exactly (lossless chunking)") {
    val docs = Core.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val back = ops.Selection.cdcChunks(docs)
      .groupBy(col("doc_id"))
      .agg(concat_ws("", array_sort(collect_list(struct(col("idx"), col("chunk"))))
        .getField("chunk")).as("rebuilt"))
    val joined = docs.join(back, Seq("doc_id"))
    assert(joined.count() == docs.count())
    assert(joined.filter(col("rebuilt") =!= col("text")).count() == 0,
      "concatenated chunks must equal the original text")
  }

  test("cdcChunks boundaries are content-local: a prefix edit only disturbs the first chunks") {
    // same tail content, different head: chunk sets must agree on the
    // tail — that is the property that makes chunk-hash dedup robust
    // to near-duplicate drift (fixed-width chunking fails this).
    val tail = ("the quick brown fox jumps over the lazy dog " * 40).trim
    val d = Seq(
      ("a", "s", tail),
      ("b", "s", "INSERTED PREFIX 1234567890 " + tail)
    ).toDF("doc_id", "source", "text")
    val ch = ops.Selection.cdcChunks(d)
      .select(col("doc_id"), col("chunk")).as[(String, String)].collect()
    val ca = ch.filter(_._1 == "a").map(_._2).toSet
    val cb = ch.filter(_._1 == "b").map(_._2).toSet
    val shared = ca.intersect(cb)
    // all but the head chunk(s) of each doc realign
    assert(shared.size >= ca.size - 2,
      s"expected tail chunks to realign, shared=${shared.size} of ${ca.size}")
  }

  // ---- psiBySource: identical distribution ≈ 0, shifted >> 0 ----

  test("psiBySource: clone of the anchor scores ~0, shifted source trips the 0.25 line") {
    // constant 1-token texts: the token marginal is flat for every
    // source, so this pins the LENGTH marginal's arithmetic in
    // isolation (the token marginal has its own test below)
    val anchor = (0 until 600).map(i => ("ref", 40L + (i % 10) * 55, "t"))
    val clone = anchor.map { case (_, n, t) => ("clone", n, t) }
    val shifted = (0 until 600).map(i => ("shifted", 420L + (i % 4) * 60, "t"))
    val docs = (anchor ++ clone ++ shifted).toDF("source", "n_chars", "text")
    val out = ops.Selection.psiBySource(docs, "ref")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("psi_nchars"), r.getAs[Double]("psi_ntokens"),
          r.getAs[Double]("psi_max"))).toMap
    assert(out.keySet == Set("clone", "shifted"))
    assert(math.abs(out("clone")._1) < 1e-9, s"clone PSI should be 0, got ${out("clone")}")
    assert(out("shifted")._1 > 0.25, s"shifted PSI should alarm, got ${out("shifted")}")
    // flat token marginal: ~0 for both, and psi_max reduces to the
    // length PSI
    assert(math.abs(out("clone")._2) < 1e-9 && math.abs(out("shifted")._2) < 1e-9)
    assert(out("shifted")._3 == out("shifted")._1,
      "psi_max must be the greatest per-feature PSI")
  }

  test("the token marginal alarms on a content shift the length marginal cannot see (q163's blind spot)") {
    // identical n_chars distributions; the probe's texts collapse to
    // ONE whitespace token while the anchor spreads over token bins —
    // psi_nchars stays ~0, psi_ntokens alarms, psi_max carries it
    val anchor = (0 until 600).map(i =>
      ("ref", 300L, Seq.fill(16 + (i % 5) * 16)("w").mkString(" ")))
    val squash = (0 until 600).map(i =>
      ("squash", 300L, Seq.fill(16 + (i % 5) * 16)("w").mkString(".")))
    val docs = (anchor ++ squash).toDF("source", "n_chars", "text")
    val out = ops.Selection.psiBySource(docs, "ref").head()
    assert(math.abs(out.getAs[Double]("psi_nchars")) < 1e-9,
      "length marginal must be blind to the squash")
    assert(out.getAs[Double]("psi_ntokens") > 0.25,
      s"token marginal must alarm, got ${out.getAs[Double]("psi_ntokens")}")
    // the squash also moves the alphabet marginal (dots are outside
    // [a-z ]) AND the token-identity marginal (each squashed doc is
    // one previously-unseen token type) — psi_max is the greatest of
    // whichever alarmed
    assert(out.getAs[Double]("psi_max") ==
      Seq(out.getAs[Double]("psi_ntokens"),
        out.getAs[Double]("psi_nonalpha"),
        out.getAs[Double]("psi_tokhash")).max)
  }

  test("the alphabet marginal alarms on a shift BOTH other marginals cannot see (q166's blind spot)") {
    // identical n_chars AND identical token counts; the probe's texts
    // swap every letter to uppercase (1:1, spaces untouched) — the
    // length and token marginals are blind by construction, the
    // alphabet-class share flips from 0 to ~1
    val anchor = (0 until 600).map(i =>
      ("ref", 300L, Seq.fill(16 + (i % 5) * 16)("w").mkString(" ")))
    val upper = (0 until 600).map(i =>
      ("upper", 300L, Seq.fill(16 + (i % 5) * 16)("W").mkString(" ")))
    val docs = (anchor ++ upper).toDF("source", "n_chars", "text")
    val out = ops.Selection.psiBySource(docs, "ref").head()
    assert(math.abs(out.getAs[Double]("psi_nchars")) < 1e-9,
      "length marginal must be blind to the case swap")
    assert(math.abs(out.getAs[Double]("psi_ntokens")) < 1e-9,
      "token marginal must be blind to the case swap")
    assert(out.getAs[Double]("psi_nonalpha") > 0.25,
      s"alphabet marginal must alarm, got ${out.getAs[Double]("psi_nonalpha")}")
    assert(out.getAs[Double]("psi_max") == out.getAs[Double]("psi_nonalpha"))
  }

  test("the token-identity marginal alarms on a vocabulary swap ALL THREE doc marginals cannot see (q167's blind spot)") {
    // rot13 within [a-z]: 1:1, spaces untouched — n_chars, token count
    // and the non-[a-z ] share are preserved EXACTLY, while ~every
    // token TYPE moves to a different md5-mod-64 bucket
    def rot13(s: String): String = s.map {
      case c if c >= 'a' && c <= 'z' => (((c - 'a') + 13) % 26 + 'a').toChar
      case c => c
    }
    val words = (0 until 40).map(i => s"word$i")
    def textOf(i: Int): String =
      (0 until 24).map(j => words((i * 7 + j * 3) % 40)).mkString(" ")
    val anchor = (0 until 60).map(i => ("ref", 200L, textOf(i)))
    val swap = anchor.map { case (_, n, t) => ("swap", n, rot13(t)) }
    val clone = anchor.map { case (_, n, t) => ("clone", n, t) }
    val docs = (anchor ++ swap ++ clone).toDF("source", "n_chars", "text")
    val out = ops.Selection.psiBySource(docs, "ref")
      .collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("psi_nchars", "psi_ntokens", "psi_nonalpha"))
      assert(math.abs(out("swap").getAs[Double](c)) < 1e-9,
        s"doc marginal $c must be blind to the vocabulary swap")
    assert(out("swap").getAs[Double]("psi_tokhash") > 0.25,
      s"token-identity marginal must alarm, got ${out("swap")}")
    assert(out("swap").getAs[Double]("psi_max") ==
      out("swap").getAs[Double]("psi_tokhash"))
    // the clone (same 1440 tokens, above the floor) participates and
    // passes all four
    assert(out("clone").getAs[Double]("psi_tokhash") < 0.25 &&
      out("clone").getAs[Double]("psi_max") < 0.25,
      s"clone must pass all four marginals, got ${out("clone")}")
  }

  test("the token-identity marginal needs evidence: below the 512-token floor it is reported but never gates") {
    // disjoint unique-token vocabularies (the q158 md5-text shape) at
    // tiny sample sizes: the 64-bin histogram reads large PSI from
    // pure small-sample noise, so the value is REPORTED as evidence
    // while psi_max — the gate — excludes it on the evidence floor
    val anchor = (0 until 30).map(i => ("ref", 200L, s"anchortoken$i"))
    val other = (0 until 30).map(i => ("small", 200L, s"othertoken$i"))
    val docs = (anchor ++ other).toDF("source", "n_chars", "text")
    val out = ops.Selection.psiBySource(docs, "ref").head()
    assert(out.getAs[Double]("psi_tokhash") > 0.0,
      "the below-floor value must still be reported as evidence")
    assert(out.getAs[Double]("psi_max") ==
      Seq(out.getAs[Double]("psi_nchars"), out.getAs[Double]("psi_ntokens"),
        out.getAs[Double]("psi_nonalpha")).max,
      s"psi_max must exclude the below-floor token marginal, got $out")
  }

  // ---- governed store: the census channel IS the monitor's state ----

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-gov-$tag").toString

  /** 30 unique docs over 3 sources with source-distinct length
    * profiles (s2 deliberately shifted off the anchor s0). */
  private def govDocs(ids: Range) = ids.map { i =>
    val src = s"s${i % 3}"
    val n = (i % 3) match {
      case 0 => 50L + (i % 5) * 100   // anchor: spread over bins
      case 1 => 60L + (i % 5) * 100   // clone-ish
      case 2 => 450L + (i % 2) * 60   // shifted high
    }
    (i.toLong, s"unique document number $i with token$i inside", src, n)
  }.toDF("doc_id", "text", "source", "n_chars")

  test("governed store: drift from the census is bit-identical to session PSI, across folds, versions, and compact") {
    val idx = tmp("drift")
    ops.IndexStore.write(spark, govDocs(1 to 10), idx, governed = true)
    ops.IndexStore.append(spark, idx, govDocs(11 to 20))
    ops.IndexStore.append(spark, idx, govDocs(21 to 30))
    val session = ops.Selection.psiBySource(govDocs(1 to 30), "s0").collect().toSeq
    val store = ops.IndexStore.driftFromStore(spark, idx, "s0").collect().toSeq
    assert(store == session, "store-fed drift diverged from the session recomputation")
    // the timeline: version 1 sees only fold 1's census
    val v1 = ops.IndexStore.history(idx).head
    assert(ops.IndexStore.driftFromStoreAt(spark, idx, v1, "s0").collect().toSeq ==
      ops.Selection.psiBySource(govDocs(1 to 10), "s0").collect().toSeq,
      "version-1 drift must equal the session PSI of fold 1 alone")
    // compact collapses the census deltas without moving a number
    ops.IndexStore.compact(spark, idx)
    assert(ops.IndexStore.driftFromStore(spark, idx, "s0").collect().toSeq == session,
      "compaction changed the drift report")
  }

  test("governance is explicit opt-in; a governed store refuses a column-less fold") {
    // a DEFAULT write is ungoverned even when the frame carries the
    // governance columns — screens/folds legitimately run on bare
    // (doc_id, text) frames, and a store that silently became governed
    // would refuse them (the streaming dedup loop's shape)
    val bare = tmp("bare")
    ops.IndexStore.write(spark, govDocs(1 to 10), bare)
    val e1 = intercept[IllegalStateException] {
      ops.IndexStore.driftFromStore(spark, bare, "s0").collect()
    }
    assert(e1.getMessage.contains("mix_census"))
    // and an ungoverned store accepts bare folds
    ops.IndexStore.append(spark, bare,
      govDocs(11 to 20).select(col("doc_id"), col("text")))
    // a governed write without the columns is refused outright
    val e0 = intercept[IllegalStateException] {
      ops.IndexStore.write(spark,
        govDocs(1 to 10).select(col("doc_id"), col("text")),
        tmp("gov0"), governed = true)
    }
    assert(e0.getMessage.contains("GOVERNED"))
    val gov = tmp("gov")
    ops.IndexStore.write(spark, govDocs(1 to 10), gov, governed = true)
    val e2 = intercept[IllegalStateException] {
      ops.IndexStore.append(spark, gov,
        govDocs(11 to 20).select(col("doc_id"), col("text")))
    }
    assert(e2.getMessage.contains("GOVERNED"),
      s"expected the governance refusal, got: ${e2.getMessage}")
  }

  test("screenAndFold extends the census with exactly the KEPT docs (the ingest loop's shape)") {
    val idx = tmp("fold")
    val seed = govDocs(1 to 10)
    ops.IndexStore.write(spark, seed, idx, governed = true)
    // batch: 5 new docs + an exact twin of doc 1 under a fresh id —
    // the twin must be screened out AND stay out of the census (the
    // census describes what the store ingested, not what arrived)
    val twin = govDocs(1 to 1).withColumn("doc_id", lit(999L))
    val batch = govDocs(11 to 15).unionByName(twin)
    val dec = ops.IndexStore.screenAndFold(spark, idx, batch)
    val keptIds = dec.filter(col("decision") === "keep")
      .select("doc_id").as[Long].collect().toSet
    assert(!keptIds.contains(999L), "exact twin must not be kept")
    assert(keptIds.nonEmpty, "fixture degenerate: nothing kept")
    val kept = batch.filter(col("doc_id").isin(keptIds.toSeq: _*))
    assert(ops.IndexStore.driftFromStore(spark, idx, "s0").collect().toSeq ==
      ops.Selection.psiBySource(seed.unionByName(kept), "s0").collect().toSeq,
      "census after screenAndFold must census seed + kept docs exactly")
  }

  test("drift circuit breaker: a shifted source is held out of the fold, clean sources fold, recovery passes") {
    val idx = tmp("gate")
    // ids letter-encoded in the texts: digits are outside [a-z ], so a
    // digit-bearing id would move the ALPHABET marginal differently per
    // source (1- vs 2-digit ranges) and this test pins the LENGTH
    // gate's hold in isolation
    def alpha(i: Int): String = i.toString.map(c => ('a' + (c - '0')).toChar)
    val seed = (1 to 12).map { i =>
      (i.toLong, s"seed doc ${alpha(i)} tok${alpha(i)}", "s0", 50L + (i % 5) * 100)
    }.toDF("doc_id", "text", "source", "n_chars")
    ops.IndexStore.write(spark, seed, idx, governed = true)
    // batch: a clone-profile source sB (same length bins as the
    // anchor) + a shifted source sC (every doc lands in the bin the
    // anchor never populates)
    val batch = ((21 to 30).map { i =>
      (i.toLong, s"clone doc ${alpha(i)} tok${alpha(i)}", "sB", 60L + (i % 5) * 100)
    } ++ (31 to 40).map { i =>
      (i.toLong, s"shift doc ${alpha(i)} tok${alpha(i)}", "sC", 520L + (i % 2) * 40)
    }).toDF("doc_id", "text", "source", "n_chars")
    // the monitor itself is store-fed: census channel + the batch's
    // own bins agg, never a sibling channel or corpus scan
    val mp = ops.IndexStore.batchDriftVsStore(spark, idx, batch, "s0")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(mp.contains("mix_census") && !mp.contains("fingerprints") &&
      !mp.contains("band_keys"),
      s"gate must read only the census channel:\n${mp.take(1200)}")
    val (dec, rep) = ops.IndexStore.screenAndFoldGated(spark, idx, batch, "s0")
    val held = rep.filter(col("held")).select("source").as[String].collect().toSet
    assert(held == Set("sC"), s"expected only the shifted source held, got $held")
    assert(rep.filter(col("source") === "sC").head().getDouble(2) > 0.25,
      "the report must cite the measured PSI that tripped the hold")
    val decIds = dec.select("doc_id").as[Long].collect().toSet
    assert(decIds == (21L to 30L).toSet,
      s"decisions must cover exactly the admitted docs: $decIds")
    val censusSrcs = ops.IndexStore.channel(spark, idx, "mix_census")
      .select("source").distinct().as[String].collect().toSet
    assert(censusSrcs == Set("s0", "sB"),
      s"held source contaminated the census: $censusSrcs")
    // a later CLEAN tick from the held upstream passes the gate —
    // the hold is per-tick, not a ban
    val clean = (41 to 50).map { i =>
      (i.toLong, s"recovered doc ${alpha(i)} tok${alpha(i)}", "sC", 70L + (i % 5) * 100)
    }.toDF("doc_id", "text", "source", "n_chars")
    val (_, rep2) = ops.IndexStore.screenAndFoldGated(spark, idx, clean, "s0")
    assert(rep2.filter(col("held")).isEmpty,
      "a recovered source must pass the gate")
    assert(ops.IndexStore.channel(spark, idx, "mix_census")
      .select("source").distinct().count() == 3,
      "the recovered tick must join the census")
  }

  test("screenAndFoldGated orderGate: the dedup-family breaker holds the sorted probe, the exchangeable scrambles pass (VERDICT r15 #1)") {
    val idx = tmp("ordgate")
    val docs = graft.Core.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
    val boot = docs.filter(col("source") === "src0")
    ops.IndexStore.write(spark, boot, idx, governed = true)
    val slice = boot.filter(col("doc_id") % 40 === 0)
    def probe(name: String, off: Long, text: org.apache.spark.sql.Column) =
      slice.select((col("doc_id") + off).as("doc_id"), text.as("text"),
        lit(name).as("source"), col("n_chars"))
    // the q168/q170 construction: same token multisets, three orders —
    // the four position-free marginals read all three as the measured
    // clone band (psi_max 0.08–0.19 across shipped SFs)
    val batch = probe("probe_sorted", 1000000000L,
        concat_ws(" ", sort_array(split(col("text"), " "))))
      .unionByName(probe("probe_reversed", 2000000000L,
        concat_ws(" ", reverse(split(col("text"), " ")))))
      .unionByName(probe("probe_clone", 3000000000L, col("text")))
    val (_, rep) = ops.IndexStore.screenAndFoldGated(spark, idx, batch,
      "src0", maxPsi = ops.Selection.GatedUnifiedMaxPsi, orderGate = true)
    assert(rep.columns.contains("psi_order"),
      "the opted-in report must carry the order statistic")
    assert(rep.filter(col("held")).select("source").as[String]
      .collect().toSet == Set("probe_sorted"),
      "exactly the sorted probe must be held")
    val bySrc = rep.select(col("source"), col("psi_order"), col("psi_max"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(bySrc("probe_sorted")._2 > 0.25 && bySrc("probe_sorted")._3 < 1.0,
      s"the hold must be the order verdict alone: ${bySrc("probe_sorted")}")
    assert(bySrc("probe_reversed")._2 < 0.25 && bySrc("probe_clone")._2 < 0.25,
      s"the exchangeable scrambles must pass the self-null screen: $bySrc")
    // store effect: the held probe's census never landed. (probe_clone
    // is admitted but its texts are exact duplicates of the seeded
    // anchor docs, so the dedup-family SCREEN drops them — kept ≠
    // admitted is this family's documented contract; the reversed
    // probe's shingles differ and it lands.)
    val srcs = ops.IndexStore.channel(spark, idx, "mix_census")
      .select("source").distinct().as[String].collect().toSet
    assert(srcs.contains("probe_reversed") && !srcs.contains("probe_sorted"),
      s"order-held source must never enter the census: $srcs")
  }

  // ---- reanchorCensus: the audited anchor re-baseline (q169) ----

  private def probeDocs(ids: Range, src: String, base: Long) = ids.map { i =>
    (i.toLong, s"probe token$i here", src, base + (i % 2) * 40)
  }.toDF("doc_id", "text", "source", "n_chars")

  test("reanchorCensus: hold → re-anchor → the same probe construction passes; prior versions keep the old anchor") {
    val idx = tmp("rea")
    // bootstrap WITHOUT govDocs' deliberately-shifted s2: the
    // no-laundering scan must find a clean census on the happy path
    ops.IndexStore.write(spark,
      govDocs(1 to 30).filter(col("source") =!= "s2"), idx, governed = true)
    // a shifted source's tick is HELD (bin 5 vs the anchor's 0..4);
    // the all-held batch commits nothing (dense-history rule)
    val (_, rep1) = ops.IndexStore.screenAndFoldGated(spark, idx,
      probeDocs(101 to 110, "pX", 520L), "s0")
    assert(rep1.filter(col("held")).select("source").as[String]
      .collect().toSeq == Seq("pX"), "the shifted probe must be held")
    val vOld = ops.IndexStore.history(idx).last
    val before = ops.IndexStore.driftFromStore(spark, idx, "s0").collect().toSeq
    // the curated reference legitimately moved to the shifted regime
    ops.IndexStore.reanchorCensus(spark, idx, "s0", (201 to 220).map { i =>
      (i.toLong, s"anchor token$i here", "s0", 500L + (i % 5) * 20)
    }.toDF("doc_id", "text", "source", "n_chars"))
    // the SAME probe construction now passes the SAME gate and lands
    val (_, rep2) = ops.IndexStore.screenAndFoldGated(spark, idx,
      probeDocs(121 to 130, "pX", 520L), "s0")
    assert(rep2.filter(col("held")).isEmpty,
      "the probe must pass against the re-baselined anchor")
    val srcs = ops.IndexStore.channel(spark, idx, "mix_census")
      .select("source").distinct().as[String].collect().toSet
    assert(srcs == Set("s0", "s1", "pX"),
      s"census must hold exactly the anchor + admitted sources: $srcs")
    // the held tick of v-old never landed, and v-old still replays
    // against the OLD anchor bit-identically (the audit trail)
    assert(ops.IndexStore.driftFromStoreAt(spark, idx, vOld, "s0")
      .collect().toSeq == before,
      "re-anchor must not rewrite the drift history at prior versions")
    // re-anchor is its own timeline version: mix_census is the only
    // channel whose paths changed at that version
    val hist = ops.IndexStore.history(idx)
    assert(hist.size == 3, s"bootstrap + re-anchor + recovered fold: $hist")
    val (mOld, mRea) = (ops.IndexStore.manifestAt(idx, hist(0)),
      ops.IndexStore.manifestAt(idx, hist(1)))
    assert(mRea("mix_census") != mOld("mix_census") &&
      (mRea - "mix_census") == (mOld - "mix_census"),
      "the re-anchor commit must replace mix_census and carry every other channel forward")
  }

  test("reanchorCensus refuses by name: ungoverned store, unknown anchor, empty or stray-source batch, and LAUNDERING a currently-drifted census") {
    val bare = tmp("rea-bare")
    ops.IndexStore.write(spark, govDocs(1 to 10), bare)
    val e0 = intercept[IllegalArgumentException] {
      ops.IndexStore.reanchorCensus(spark, bare, "s0", govDocs(1 to 3))
    }
    assert(e0.getMessage.contains("mix_census"))
    val gov = tmp("rea-gov")
    // govDocs' s2 is deliberately shifted: an UNGATED bootstrap put a
    // drifted source in the census, so a re-anchor would absorb it
    ops.IndexStore.write(spark, govDocs(1 to 30), gov, governed = true)
    val e1 = intercept[IllegalArgumentException] {
      ops.IndexStore.reanchorCensus(spark, gov, "sZ",
        govDocs(1 to 3).withColumn("source", lit("sZ")))
    }
    assert(e1.getMessage.contains("no rows for anchor"))
    val e2 = intercept[IllegalArgumentException] {
      ops.IndexStore.reanchorCensus(spark, gov, "s0",
        govDocs(1 to 3).filter(col("doc_id") < 0))
    }
    assert(e2.getMessage.contains("empty"))
    val e3 = intercept[IllegalArgumentException] {
      ops.IndexStore.reanchorCensus(spark, gov, "s0", govDocs(1 to 6))
    }
    assert(e3.getMessage.contains("source other than"))
    val e4 = intercept[IllegalArgumentException] {
      ops.IndexStore.reanchorCensus(spark, gov, "s0",
        govDocs(3 to 3).filter(col("source") === "s0"))
    }
    assert(e4.getMessage.contains("launder"),
      s"a drifted stored census must refuse the re-baseline: ${e4.getMessage}")
    // and the refusals left no new version behind
    assert(ops.IndexStore.history(gov).size == 1,
      "a refused re-anchor must not commit")
  }

  test("q169 fixture: the probe is absent before the re-anchor and present after it, below the line (the replay's both-hold blind spot, pinned)") {
    val out = SparkEntry.queries("q169_census_reanchor_timeline")(spark, dir)
      .select(col("version"), col("source"), col("psi_max"))
      .as[(Int, String, Double)].collect().toSeq
    assert(out.map(_._1).distinct.sorted == Seq(1, 2, 3, 4),
      "bootstrap, hold, re-anchor, recovery — four versions")
    val probeVers = out.filter(_._2 == "probe_shift").map(v => v._1 -> v._3)
    assert(probeVers.map(_._1) == Seq(4),
      s"probe_shift must enter the census only at the recovered version: $probeVers")
    assert(probeVers.head._2 <= ops.Selection.GatedUnifiedMaxPsi,
      s"the recovered probe must read under the gate line: $probeVers")
  }

  test("reanchorCensus reads only the census channel and the reference batch — no corpus or sibling-channel scan") {
    val idx = tmp("rea-plan")
    ops.IndexStore.write(spark,
      govDocs(1 to 30).filter(col("source") =!= "s2"), idx, governed = true)
    // capture the jobs' scans via the rewrite plan: the new census =
    // stored non-anchor rows ∪ censusBins(batch); nothing here may
    // touch fingerprints/band_keys/sim_blocks (the re-anchor is a
    // governance statement, not a fold)
    val na = (201 to 220).map { i =>
      (i.toLong, s"anchor token$i here", "s0", 500L + (i % 5) * 20)
    }.toDF("doc_id", "text", "source", "n_chars")
    ops.IndexStore.reanchorCensus(spark, idx, "s0", na)
    val m = ops.IndexStore.manifestAt(idx, ops.IndexStore.history(idx).last)
    // the committed census dir contains ONLY census parquet — and the
    // commit carried every sibling channel forward untouched (path
    // equality is the no-scan proof at the artifact level: an op that
    // rewrote a sibling would have had to stage new paths for it)
    val reSnap = ops.IndexStore.history(idx).last
    assert(m("mix_census").paths.forall(_.startsWith(reSnap)),
      "the re-anchor commit must own its census paths")
    assert((m - "mix_census").values.flatMap(_.paths)
      .forall(!_.startsWith(reSnap)),
      "a re-anchor must not restage any sibling channel")
  }

  test("drift read plan touches only the census channel — no corpus scan at any version") {
    val idx = tmp("plan")
    ops.IndexStore.write(spark, govDocs(1 to 10), idx, governed = true)
    ops.IndexStore.append(spark, idx, govDocs(11 to 20))
    for (snap <- ops.IndexStore.history(idx)) {
      val p = ops.IndexStore.driftFromStoreAt(spark, idx, snap, "s0")
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      assert(p.contains("mix_census"), s"expected census scans:\n${p.take(1200)}")
      assert(!p.contains("documents") &&
        !p.contains("fingerprints") && !p.contains("band_keys"),
        s"drift must never rescan the corpus or sibling channels:\n${p.take(1200)}")
    }
  }

  test("crash after the census lands keeps readers on the old drift; retry recovers exactly") {
    val idx = tmp("crash")
    ops.IndexStore.write(spark, govDocs(1 to 10), idx, governed = true)
    val before = ops.IndexStore.driftFromStore(spark, idx, "s0").collect().toSeq
    ops.IndexStore.crashAfterChannel = Some("mix_census")
    try intercept[RuntimeException] {
      ops.IndexStore.append(spark, idx, govDocs(11 to 20))
    } finally ops.IndexStore.crashAfterChannel = None
    assert(ops.IndexStore.driftFromStore(spark, idx, "s0").collect().toSeq == before,
      "crashed fold changed the visible drift report")
    ops.IndexStore.append(spark, idx, govDocs(11 to 20))
    assert(ops.IndexStore.driftFromStore(spark, idx, "s0").collect().toSeq ==
      ops.Selection.psiBySource(govDocs(1 to 20), "s0").collect().toSeq,
      "post-recovery drift must equal the session PSI of the full corpus")
  }

  test("psiBySource is anchor-relative: anchor never appears in the output") {
    val docs = Core.table(spark, dir, "documents")
      .select(col("source"), col("n_chars"), col("text"))
    val out = ops.Selection.psiBySource(docs, "src0")
    assert(out.filter(col("source") === "src0").count() == 0)
    // PSI is non-negative by construction (sum of (p-q)ln(p/q) terms)
    assert(out.filter(col("psi_nchars") < 0 || col("psi_ntokens") < 0)
      .count() == 0)
  }

  test("q158 fixture: the gated-hold store holds exactly what an independent gate recompute holds, and the screen keeps every admitted doc") {
    val idx = ops.Selection.gatedHoldStore(spark, dir)
    val docs = Core.table(spark, dir, "documents")
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    // the fixture folded md5 texts — the recompute censuses the same
    // (the token marginal sees 1-token docs on BOTH sides, so the
    // verdict stays n_chars-driven; the max gate is still what runs)
    val md5Text = md5(col("doc_id").cast("string")).as("text")
    val evensM = evens.select(col("doc_id"), col("source"),
      col("n_chars"), md5Text)
    val batch = odds.filter(col("doc_id") % 10 =!= 1)
      .select(col("doc_id"), col("source"), col("n_chars"), md5Text)
      .unionByName(odds.filter(col("doc_id") % 10 === 1)
        .select(col("doc_id"), lit("probe_shift").as("source"),
          (col("n_chars") + 480).as("n_chars"), md5Text))
    // independent recompute of the gate verdict from raw documents —
    // batchDriftVsStore's arithmetic spelled through the session fns
    val gateBins = ops.Selection.censusBins(evensM)
      .filter(col("source") === "src0")
      .unionByName(ops.Selection.censusBins(batch)
        .filter(col("source") =!= "src0"))
    val held = ops.Selection.psiFromBins(gateBins, "src0")
      .filter(col("psi_max") > 0.25)
      .select(col("source")).as[String].collect().toSet
    assert(held.contains("probe_shift"),
      "fixture degenerate: the +480 shift must trip the gate")
    // the store's membership channel == evens ∪ admitted odds, EXACTLY:
    // every admitted doc kept (md5-unique texts make the screen a
    // structural no-op — the q158 oracle's standing assumption), every
    // held doc absent
    val admitted = batch.filter(!col("source").isin(held.toSeq: _*))
    val expected = evens.select(col("doc_id")).as[Long].collect().toSet ++
      admitted.select(col("doc_id")).as[Long].collect().toSet
    val stored = ops.IndexStore.channel(spark, idx, "fingerprints")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(stored == expected,
      s"store membership diverged from the recomputed gate: " +
        s"missing=${(expected -- stored).take(5)} extra=${(stored -- expected).take(5)}")
    // the census never saw a held source, and neither does q158's output
    assert(!ops.IndexStore.channel(spark, idx, "mix_census")
      .select(col("source")).distinct().as[String].collect().toSet
      .contains("probe_shift"), "held source contaminated the census")
    val out = SparkEntry.queries("q158_gated_hold_census")(spark, dir)
      .select(col("source")).as[String].collect().toSet
    assert(out.nonEmpty && !out.contains("probe_shift"),
      "the breaker's refusal must be invisible in the drift read — it never entered the census")
  }

  test("q161/q162 fixture: the two-fold gated unified store holds, then RECOVERS, exactly what an independent gate recompute says — across BOTH families") {
    val idx = ops.Selection.gatedUnifiedStore(spark, dir)
    val docs = Core.table(spark, dir, "documents")
    val evens = docs.filter(col("doc_id") % 2 === 0)
    def fold(residue: Int, shift: Long) = {
      val slice = docs.filter(col("doc_id") % 4 === residue)
      slice.filter(col("doc_id") % 10 =!= 1)
        .select(col("doc_id"), col("source"), col("n_chars"), col("text"))
        .unionByName(slice.filter(col("doc_id") % 10 === 1)
          .select(col("doc_id"), lit("probe_shift").as("source"),
            (col("n_chars") + shift).as("n_chars"), col("text")))
    }
    val thr = ops.Selection.GatedUnifiedMaxPsi
    def verdict(batch: org.apache.spark.sql.DataFrame,
        anchorRows: org.apache.spark.sql.DataFrame): Set[String] =
      ops.Selection.psiFromBins(
          ops.Selection.censusBins(anchorRows).filter(col("source") === "src0")
            .unionByName(ops.Selection.censusBins(batch)
              .filter(col("source") =!= "src0")), "src0")
        .filter(col("psi_max") > thr)
        .select(col("source")).as[String].collect().toSet
    // fold 1: the +480 probe must trip the gate
    val f1 = fold(1, 480L)
    val held1 = verdict(f1,
      evens.select(col("source"), col("n_chars"), col("text")))
    assert(held1.contains("probe_shift"),
      "fixture degenerate: the +480 shift must trip the unified gate")
    val adm1 = f1.filter(!col("source").isin(held1.toSeq: _*))
    // fold 2: the NORMALIZED probe must pass the same gate, computed
    // against the census fold 1 left behind — the recovery tick
    val f2 = fold(3, 0L)
    val c1Rows = evens.select(col("source"), col("n_chars"), col("text"))
      .unionByName(adm1.select(col("source"), col("n_chars"), col("text")))
    val held2 = verdict(f2, c1Rows)
    assert(!held2.contains("probe_shift"),
      "fixture degenerate: the normalized probe must RECOVER through the gate")
    val adm2 = f2.filter(!col("source").isin(held2.toSeq: _*))
    // TEXT family membership: evens ∪ fold-1 admitted ∪ fold-2 admitted
    val heldIds = f1.filter(col("source").isin(held1.toSeq: _*))
      .select(col("doc_id")).as[Long].collect().toSet ++
      f2.filter(col("source").isin(held2.toSeq: _*))
        .select(col("doc_id")).as[Long].collect().toSet
    val expected = evens.select(col("doc_id")).as[Long].collect().toSet ++
      adm1.select(col("doc_id")).as[Long].collect().toSet ++
      adm2.select(col("doc_id")).as[Long].collect().toSet
    val lens = ops.IndexStore.channel(spark, idx, "doc_lens")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(lens == expected,
      s"unified text membership diverged from the recomputed gate: " +
        s"missing=${(expected -- lens).take(5)} extra=${(lens -- expected).take(5)}")
    // VECTOR family: held ticks' vectors never landed; recovered tick's did
    val cells = ops.IndexStore.channel(spark, idx, "cells")
      .select(col("vec_id")).as[Long].collect().toSet
    assert(!heldIds.exists(cells),
      "held source's VECTORS leaked into the unified cells")
    val probe2Ids = f2.filter(col("source") === "probe_shift")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(probe2Ids.nonEmpty && probe2Ids.forall(cells),
      "recovered tick's VECTORS must fold with its docs")
    // census: probe_shift present ONLY via the recovered tick's rows
    // one marginal's counts (each doc contributes one row-count per
    // census feature, so the unfiltered sum would double-count)
    val censusProbeN = ops.IndexStore.channel(spark, idx, "mix_census")
      .filter(col("source") === "probe_shift" && col("feature") === "n_chars")
      .agg(sum(col("n"))).head().getLong(0)
    assert(censusProbeN == probe2Ids.size,
      s"census must carry exactly the recovered tick's probe rows: " +
        s"$censusProbeN != ${probe2Ids.size}")
    // and the TIMELINE read (q162) shows the full cycle: absent,
    // absent (held), present (recovered)
    val byVersion = SparkEntry.queries("q162_gate_recovery_timeline")(spark, dir)
      .filter(col("source") === "probe_shift")
      .select(col("version")).as[Int].collect().toSeq
    assert(byVersion == Seq(3),
      s"the recovery timeline must show probe_shift only at version 3, " +
        s"got versions $byVersion")
  }

  test("q165's media timeline plan is corpus-free: store channels only, never documents or payload bytes") {
    // the media family stores FINGERPRINT BLOCKS, not payloads, so the
    // per-version coverage read must touch only doc_lens ids and
    // media_sim_blocks rows — no scan of the documents table (and
    // there are no payload bytes anywhere in the store to read)
    val plan = SparkEntry.queries("q165_unified_media_timeline")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("media_sim_blocks") && plan.contains("doc_lens"),
      s"q165 must read the store channels:\n${plan.take(800)}")
    assert(!plan.contains("documents.parquet") && !plan.contains("payload"),
      s"q165's plan touches the corpus or payload bytes:\n${plan.take(800)}")
  }

  test("psiFromBins refuses the pre-r11 single-marginal census format by name (ADVICE r11)") {
    // a census persisted before the (source, feature, bin, n) contract
    // carries no feature axis — the arithmetic must refuse it loudly
    // instead of dying on an unresolved-column AnalysisException
    val old = Seq(("src0", 1L, 10L), ("srcA", 2L, 5L))
      .toDF("source", "bin", "n")
    val e = intercept[IllegalStateException] {
      ops.Selection.psiFromBins(old, "src0")
    }
    assert(e.getMessage.contains("pre-r11") &&
      e.getMessage.contains("feature"),
      s"expected the format refusal naming the pre-r11 census, got: ${e.getMessage}")
  }

  test("psiFromBins refuses a FEWER-marginal census and a mixed-generation census by name (never a NULL psi or a skewed one)") {
    // an r11-era census carries the feature column but only two
    // marginals: the missing feature must refuse by name on read, not
    // surface as a NULL psi column (an opaque non-nullable decode
    // crash in the gates) or a silently two-feature psi_max
    val twoFeature = Seq(
      ("src0", "n_chars", 1L, 10L), ("src0", "n_tokens", 1L, 10L),
      ("srcA", "n_chars", 2L, 5L), ("srcA", "n_tokens", 1L, 5L))
      .toDF("source", "feature", "bin", "n")
    val e1 = intercept[Exception] {
      ops.Selection.psiFromBins(twoFeature, "src0").collect()
    }
    assert(e1.getMessage.contains("older build") ||
      Option(e1.getCause).exists(_.getMessage.contains("older build")),
      s"expected the fewer-marginals refusal, got: ${e1.getMessage}")
    // a census mixing folds from both generations (the nonalpha rows
    // cover only the newer folds) has per-feature totals that
    // DISAGREE — a psi computed against the partial distribution
    // would be silently skewed, so it must refuse too. Coverage rows
    // are well-formed here so the equal-totals guard specifically is
    // what fires (the coverage guard has its own pin below).
    val mixed = Seq(
      ("src0", "n_chars", 1L, 10L), ("src0", "n_tokens", 1L, 10L),
      ("src0", "nonalpha", 0L, 4L),
      ("src0", "tokhash", -1L, 10L), ("src0", "tokhash", 3L, 20L),
      ("srcA", "n_chars", 2L, 5L), ("srcA", "n_tokens", 1L, 5L),
      ("srcA", "nonalpha", 0L, 2L),
      ("srcA", "tokhash", -1L, 5L), ("srcA", "tokhash", 7L, 9L))
      .toDF("source", "feature", "bin", "n")
    val e2 = intercept[Exception] {
      ops.Selection.psiFromBins(mixed, "src0").collect()
    }
    assert(e2.getMessage.contains("disagree") ||
      Option(e2.getCause).exists(_.getMessage.contains("disagree")),
      s"expected the mixed-generation refusal, got: ${e2.getMessage}")
    // a census whose TOKEN marginal covers only the newer folds
    // (coverage rows account for fewer docs than the doc marginals):
    // the token distribution would be silently partial — refuse by
    // name through the coverage rule, the guard the doc-level
    // equal-totals rule cannot provide for a token-count feature
    val partialTok = Seq(
      ("src0", "n_chars", 1L, 10L), ("src0", "n_tokens", 1L, 10L),
      ("src0", "nonalpha", 0L, 10L),
      ("src0", "tokhash", -1L, 10L), ("src0", "tokhash", 3L, 20L),
      ("srcA", "n_chars", 2L, 5L), ("srcA", "n_tokens", 1L, 5L),
      ("srcA", "nonalpha", 0L, 5L),
      ("srcA", "tokhash", -1L, 3L), ("srcA", "tokhash", 7L, 6L))
      .toDF("source", "feature", "bin", "n")
    val e3 = intercept[Exception] {
      ops.Selection.psiFromBins(partialTok, "src0").collect()
    }
    assert(e3.getMessage.contains("coverage") ||
      Option(e3.getCause).exists(_.getMessage.contains("coverage")),
      s"expected the tokhash-coverage refusal, got: ${e3.getMessage}")
    // and the well-formed census still reads clean through the guards
    val ok = ops.Selection.censusBins(
      Seq(("src0", 100L, "alpha beta"), ("srcA", 120L, "gamma delta"))
        .toDF("source", "n_chars", "text"))
    val rep = ops.Selection.psiFromBins(ok, "src0").collect()
    assert(rep.length == 1 && !rep.head.isNullAt(1),
      "well-formed census must pass the generational guards")
  }

  test("orderShiftPsi: sorted canonicalization held, clone/reversed/random-shuffle pass, evidence floor gates a tiny batch (q168)") {
    val docs = Core.table(spark, dir, "documents")
      .filter($"doc_id" % 40 === 0 && $"source" === "src0")
    def probe(name: String, text: org.apache.spark.sql.Column) =
      docs.select(lit(name).as("source"), text.as("text"))
    // a DETERMINISTIC random shuffle: order tokens by md5 of
    // (doc_id, pos, tok) — the exchangeable scramble the screen
    // cannot (and must not claim to) detect on this corpus
    val randShuf = docs.select($"doc_id",
        posexplode(split($"text", " ")).as(Seq("pos", "tok")))
      .withColumn("k", md5(concat_ws(":", $"doc_id", $"pos", $"tok")))
      .groupBy($"doc_id")
      .agg(concat_ws(" ", transform(array_sort(collect_list(
        struct($"k", $"tok"))), x => x.getField("tok"))).as("text"))
      .select(lit("probe_randshuf").as("source"), $"text")
    val rep = ops.Selection.orderShiftPsi(
        probe("probe_sorted",
          concat_ws(" ", sort_array(split($"text", " "))))
          .unionByName(probe("probe_reversed",
            concat_ws(" ", reverse(split($"text", " ")))))
          .unionByName(probe("probe_clone", $"text"))
          .unionByName(randShuf))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    val (nSorted, psiSorted, heldSorted) = rep("probe_sorted")
    assert(heldSorted && psiSorted > 0.25 * 4,
      s"sorted canonicalization must be held with margin, got $psiSorted")
    for (p <- Seq("probe_clone", "probe_reversed", "probe_randshuf")) {
      val (_, psi, held) = rep(p)
      assert(!held && psi < 0.25,
        s"$p must pass the screen (exchangeable order), got psi=$psi")
    }
    assert(nSorted >= ops.Selection.MinTokhashEvidence,
      "fixture degenerate: probe must clear the evidence floor")
    // evidence floor: a sub-floor batch never holds, even when its
    // (noisy) psi would clear the line
    val tiny = ops.Selection.orderShiftPsi(
        Seq(("probe_tiny", "b a"), ("probe_tiny", "d c"))
          .toDF("source", "text"))
      .collect().head
    assert(tiny.getLong(1) < ops.Selection.MinTokhashEvidence &&
      !tiny.getBoolean(3),
      "a batch below the evidence floor must never hold")
  }
}
