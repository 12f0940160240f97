package graft

import org.apache.spark.sql.execution.{CodegenMode, FormattedMode}

/** Physical-plan quality gates: these assert the *scale* properties the
  * engine promises (SURVEY.md §2B scale notes) — filters reach the
  * parquet scan, small dimensions broadcast, aggregates are
  * partial+final, column pruning holds, hot paths stay inside
  * whole-stage codegen. A refactor that silently loses one of these
  * would still pass value-equality tests but regress at scale; this
  * suite fails instead. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.explainString(FormattedMode)

  /** CodegenMode on an unexecuted AQE plan reports 0 subtrees; probe
    * codegen with AQE off (the generated stages are identical). */
  private def withAqeOff[T](f: => T): T = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def codegenOf(q: String): String = withAqeOff {
    SparkEntry.queries(q)(spark, dir).queryExecution.explainString(CodegenMode)
  }

  /** Run with interpreted fallback DISABLED: any janino compile error
    * in an expression's doGenCode surfaces as a test failure instead
    * of a silent interpreted-mode regression. (CodegenMode explain
    * only GENERATES source; compilation happens lazily at execution —
    * a generated-but-uncompilable expression passes a string check
    * and then quietly runs interpreted forever.) */
  private def withCodegenOnly[T](f: => T): T = {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try f finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("q01 pricing summary: filter pushed to parquet, partial+final hash agg, codegen") {
    val p = planOf("q01_pricing_summary")
    assert(p.contains("IsNotNull(l_shipdate)") && p.contains("LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final HashAggregate")
    val cg = codegenOf("q01_pricing_summary")
    assert("WholeStageCodegen subtrees".r.findFirstIn(cg).isDefined &&
      !cg.contains("Found 0 WholeStageCodegen"), "agg pipeline fell out of codegen")
  }

  test("q01 scan prunes to exactly the referenced columns") {
    val p = planOf("q01_pricing_summary")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    val cols = read.split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus", "l_shipdate"), s"read columns: $cols")
  }

  test("q03 multi-way join: dimension tables broadcast (no shuffle on dims)") {
    val p = planOf("q03_join_revenue_by_nation")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"customer/nation should broadcast:\n${p.take(2000)}")
  }

  test("q02 filter/project: predicates pushed; only the final sort shuffles") {
    val p = planOf("q02_filter_project")
    assert(p.contains("In(o_orderstatus"), "isin predicate should reach the scan")
    assert(!p.contains("hashpartitioning"),
      "row-level query must not hash-shuffle (only range for sort)")
  }

  test("q05 semi / q06 anti plans use semi/anti hash joins, not materialized subqueries") {
    assert(planOf("q05_semi_join_urgent_customers").contains("LeftSemi"))
    assert(planOf("q06_anti_join_orderless_customers").contains("LeftAnti"))
  }

  test("q35 knn: query side is broadcast, corpus side streams") {
    val p = planOf("q35_knn_exact")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query set should broadcast:\n${p.take(1500)}")
  }

  test("q31 minhash: signatures are row-local folds — no shuffle before the band join") {
    val p = planOf("q31_minhash_lsh_pairs")
    assert(!p.contains("posexplode"), "minhash must not explode per hash index")
    // the 16 minima fold inside the row (array_min ∘ transform); the
    // old explode+groupBy(doc_id) shuffled every (doc, shingle) row
    assert(!p.contains("hashpartitioning(doc_id"),
      s"minhash regressed to a per-doc aggregation shuffle:\n${p.take(1500)}")
    assert(p.contains("minhashsigs"), "expected the row-local MinHashSigs expression")
  }

  test("custom TopKPerGroup operator: heap exec planned via strategy, equals window top-k") {
    import spark.implicits._
    val orders = Core.table(spark, dir, "orders")
    val custom = ops.TopK.topKPerGroup(orders, Seq("o_orderpriority"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), 3)
    // SparkPlan display strips the "Exec" suffix from node names
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup ["), s"strategy did not plan the custom exec:\n$plan")
    // EnsureRequirements must have planted the group-key shuffle
    assert(plan.contains("hashpartitioning(o_orderpriority"), s"missing clustering:\n$plan")
    val got = custom.select($"o_orderpriority", $"o_orderkey").as[(String, Long)]
      .collect().toSet
    val viaWindow = SparkEntry.queries("q16_topk_per_group")(spark, dir)
      .select($"o_orderpriority", $"o_orderkey").as[(String, Long)].collect().toSet
    assert(got == viaWindow, "heap-based top-k disagrees with window top-k")
  }

  test("q58 stratified sample: quota via heap TopKPerGroup; window only sees reduced rows") {
    val df = SparkEntry.queries("q58_stratified_sample")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan display strips the "Exec" suffix from node names
    assert(plan.contains("TopKPerGroup ["),
      s"per-stratum quota must run through the heap operator:\n${plan.take(1500)}")
    val wIdx = plan.indexOf("Window")
    val tIdx = plan.indexOf("TopKPerGroup [")
    assert(wIdx >= 0 && wIdx < tIdx,
      s"rn window must sit ABOVE the heap operator (then it sorts only ≤k rows " +
        s"per stratum, never the full stratum):\n${plan.take(1500)}")
  }

  test("q34 near-dup: candidates come from a signature-bucket equi-join, never a loop join") {
    val p = planOf("q34_embedding_neardup")
    assert(p.contains("bkey"), s"candidate join must key on the band signature:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "near-dup pair generation regressed to an all-pairs loop join")
  }

  test("q61 decontamination: shingle-hash equi-join, partial-agg counts, no loop join") {
    val p = planOf("q61_decontamination")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"benchmark-overlap check regressed to a loop join:\n${p.take(1500)}")
    // the contamination join must key on the hashed shingle column
    assert(p.contains("[sh") || p.contains("sh#") || p.contains("(sh"),
      s"expected an equi-join keyed on the shingle hash:\n${p.take(1500)}")
    // per-doc counts partial-aggregate map-side before any shuffle
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "expected partial+final aggregates for bench-distinct and per-doc counts")
  }

  test("q39 IVF: corpus-side nearest-centroid is a partial aggregate, not a window sort") {
    // gate the reusable shape, not the full query (whose small query
    // side legitimately uses a window): per-vector argmax over
    // corpus × k must partial-aggregate, shuffling one row per vector
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.DotProduct.register(spark)
    val all = Core.table(spark, dir, "embeddings")
      .withColumn("unit", transform($"embedding", x => x.cast("double")))
      .select($"vec_id", $"unit")
    val cents = all.limit(4).select($"vec_id".as("cid"), $"unit".as("cvec"))
    val nearest = all.join(broadcast(cents))
      .withColumn("sim", graft.functions.DotProduct.dot_fast($"unit", $"cvec"))
      .groupBy($"vec_id")
      .agg(max(struct($"sim", (-$"cid").as("ncid"), $"cid")).as("b"))
    val p = nearest.queryExecution.explainString(FormattedMode)
    assert(!p.contains("Window"), s"argmin fell back to a window sort:\n${p.take(1500)}")
    assert(p.toLowerCase.contains("aggregate"), s"expected partial aggregation:\n${p.take(1500)}")
  }

  test("q69 BPE pairs: partial+final agg, top-50 is TakeOrdered (no global sort)") {
    val p = planOf("q69_bpe_pair_stats")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "pair counts must partial-aggregate map-side")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-50 must be a TakeOrdered, not sort-then-limit:\n${p.take(1500)}")
  }

  test("q70 chunk+pack: running-sum window is partitioned by bucket; text never shuffles") {
    val p = planOf("q70_chunk_pack")
    assert(p.contains("hashpartitioning(bucket"),
      s"packing window must partition by the hash bucket:\n${p.take(1500)}")
    // the chunk pass projects text away before the window shuffle: no
    // exchange in the plan may carry the text column
    val carriesText = "Exchange [^\\n]*".r.findAllIn(p).exists(_.contains("text"))
    assert(!carriesText, s"a shuffle carries the full text column:\n${p.take(2000)}")
  }

  test("q73 shard shuffle: one hash shuffle on shard, in-shard sort only") {
    val p = planOf("q73_corpus_shard")
    assert(p.contains("hashpartitioning(shard"),
      s"shard assignment must be the partitioning:\n${p.take(1500)}")
  }

  test("q75 heavy hitters: sketch merges partially — no per-token shuffle rows") {
    val p = planOf("q75_heavy_hitters")
    // partial + final sketch aggregation: the exchange carries one
    // sketch per partition, never a row per token
    assert("approx_top_k".r.findAllIn(p).size >= 2 ||
      "ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final sketch aggregation:\n${p.take(1500)}")
    assert(!p.contains("hashpartitioning(tok"),
      s"heavy hitters regressed to an exact per-token shuffle:\n${p.take(1500)}")
  }

  test("q72 semantic dedup: candidates from a (cell, band, signature) equi-join, no loop join") {
    val p = planOf("q72_semantic_dedup")
    assert(p.contains("bkey"), s"candidate join must key on the band signature:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"),
      "semantic dedup regressed to within-cell all-pairs")
    // the only BroadcastNestedLoopJoin allowed is the k-row centroid
    // cross join inside nearestCell; the candidate self-join must not
    // be one — it keys on (cid, band, bkey)
    assert(p.contains("cid") && (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin")),
      s"expected an equi-join keyed on cell+band:\n${p.take(1500)}")
  }

  test("q71 incremental dedup: both screens are semi-joins — no pair materialization") {
    val p = planOf("q71_incremental_dedup")
    assert("LeftSemi".r.findAllIn(p).size >= 2,
      s"band and text screens must be semi-joins:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "incremental screen regressed to a loop join")
  }

  test("q68 multi-probe: query side broadcast, corpus side never shuffles pre-join") {
    val p = planOf("q68_ann_multiprobe")
    assert(p.contains("BroadcastHashJoin"),
      s"probe keys must broadcast against the corpus signatures:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "multi-probe join regressed to a shuffle/loop join")
  }

  test("q81 bloom screen: sketch probes the batch before the anti-join; one bloom build") {
    val p = planOf("q81_bloom_screen")
    assert(p.contains("might_contain"),
      s"bloom probe missing from the physical plan:\n${p.take(1500)}")
    assert(p.contains("LeftAnti"),
      "exact verification of bloom hits must be an anti-join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "bloom screen regressed to a loop join")
    // every hosting site (both union branches + the inferred corpus
    // probe) must reference ONE logical bloom build — the analyzer
    // collapses the CTE's scalar subquery to a single exprId, and
    // Spark's subquery-reuse then executes it once. If a refactor
    // split the CTE into textually-separate subqueries, distinct
    // subquery ids would appear here (AQE explain doesn't print
    // ReusedSubquery markers, so the exprId is the checkable signal).
    val ids = "Subquery subquery#(\\d+)".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(ids.size == 1,
      s"expected one shared bloom-build subquery, got ids $ids:\n${p.take(1500)}")
  }

  test("q79 zipf slope: rank window partitioned by source over vocab-sized input") {
    val p = planOf("q79_zipf_slope")
    // freq and the regression sums must both partial-aggregate
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"expected partial+final aggs for freq and regression sums:\n${p.take(1500)}")
    // the rank window is keyed by source — never a global
    // single-partition sort of the whole frequency table
    assert(p.contains("hashpartitioning(source"),
      s"rank window lost its source partitioning:\n${p.take(1500)}")
    assert(!p.contains("Exchange SinglePartition"),
      "a global single-partition exchange appeared in the zipf plan")
  }

  test("custom-expression hot paths execute with interpreted fallback disabled") {
    // q31: WordShingles + MinHashSigs(md5) · q44: RollingHash ·
    // q34: DotProductExact — every custom doGenCode must COMPILE,
    // not just generate plausible-looking source
    // drop memoized frames first — a band-key cache materialized by an
    // earlier (fallback-mode) test would satisfy q31 without ever
    // compiling the expression
    Core.clearCaches(spark)
    withCodegenOnly {
      Seq("q31_minhash_lsh_pairs", "q44_rolling_fingerprint", "q34_embedding_neardup",
          "q112_duplicate_spans", "q128_simhash_join", "q141_multimodal_neardup")
        .foreach { q => assert(SparkEntry.queries(q)(spark, dir).count() > 0, q) }
      // the production (xxhash64) minhash path too
      graft.functions.WordShingles.register(spark)
      graft.functions.MinHashSigs.register(spark)
      assert(Core.table(spark, dir, "documents")
        .selectExpr("minhash_sigs_fast(word_shingles(lower(text), 3)) AS s")
        .count() > 0)
    }
    Core.clearCaches(spark)
  }

  test("custom expressions are compiled into generated code, not fallback") {
    graft.functions.DotProductExact.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // must read a real source: a literal input is constant-folded by
    // ConvertToLocalRelation and never reaches codegen at all
    val df = Core.table(spark, dir, "embeddings")
      .withColumn("embd", transform($"embedding", x => x.cast("double")))
      .select(graft.functions.DotProductExact.dot_exact($"embd", $"embd").as("d"))
    val cg = withAqeOff(df.queryExecution.explainString(CodegenMode))
    assert(cg.contains("DotProductExact"), s"dot_exact missing from generated code:\n${cg.take(800)}")
    assert(withCodegenOnly(df.agg(min($"d")).as[Double].head()) >= 0.0)
  }

  test("MinHashSigs compiles into generated code and matches its interpreted eval") {
    graft.functions.WordShingles.register(spark)
    graft.functions.MinHashSigs.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Core.table(spark, dir, "documents")
      .withColumn("shg", graft.functions.WordShingles.word_shingles(lower($"text"), 3))
      .filter(size($"shg") > 0)
      .select($"doc_id", graft.functions.MinHashSigs.minhash_sigs($"shg").as("sigs"))
    val cg = withAqeOff(df.queryExecution.explainString(CodegenMode))
    assert(cg.contains("minhashA") || cg.contains("MinHashSigs"),
      s"minhash_sigs missing from generated code:\n${cg.take(800)}")
    // codegen path (collect) vs interpreted path (expression eval via
    // a literal-driven local eval) must agree — sample 5 docs. The
    // collect runs under CODEGEN_ONLY so a doGenCode that generates
    // uncompilable Java fails HERE, not as a silent runtime fallback
    // (the double-stripMargin incident: an inner template's '|'-led
    // continuation line lost its OR operator to the outer stripMargin)
    val rows = withCodegenOnly(df.limit(5).as[(Long, Seq[Long])].collect())
    val texts = Core.table(spark, dir, "documents")
      .select($"doc_id", lower($"text")).as[(Long, String)].collect().toMap
    rows.foreach { case (id, sigs) =>
      val words = texts(id).split(" ")
      val shingles = words.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq.distinct
      val expect = (0 until 16).map { i =>
        shingles.map { w =>
          val d = java.security.MessageDigest.getInstance("MD5").digest(w.getBytes("UTF-8"))
          val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          (graft.functions.MinHashSigs.A(i) * h + graft.functions.MinHashSigs.B(i)) %
            graft.functions.MinHashSigs.P
        }.min
      }
      assert(sigs == expect, s"doc $id minhash mismatch")
    }
  }

  test("RademacherProject compiles into generated code and matches the relational projection") {
    graft.functions.RademacherProject.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Core.table(spark, dir, "embeddings")
      .select($"vec_id",
        graft.functions.RademacherProject.project($"embedding", 16).as("pv"))
    val cg = withAqeOff(df.queryExecution.explainString(CodegenMode))
    assert(cg.contains("RademacherProject") || cg.contains("rademacher"),
      s"rademacher_project missing from generated code:\n${cg.take(800)}")
    val rows = withCodegenOnly(df.limit(5).as[(Long, Seq[Double])].collect())
    assert(rows.nonEmpty && rows.forall(_._2.size == 16))
    // the row-local generated loop must agree with the relational
    // (oracle) route within summation-order ulp: the expression sums
    // IEEE doubles in index order, the q154 spelling sums decimals
    val rel = ops.Similarity.projections(spark, dir, 16)
      .groupBy($"vec_id")
      .agg(array_sort(collect_list(struct($"j", $"p"))).as("a"))
      .select($"vec_id", expr("transform(a, x -> x.p)").as("pv"))
      .as[(Long, Seq[Double])].collect().toMap
    rows.foreach { case (id, pv) =>
      pv.zip(rel(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"vec $id: codegen $a vs relational $b") }
    }
    // and the static sign table IS the relational md5 grid, bit for bit
    val sg = graft.functions.RademacherProject.signs(16, 64)
    spark.range(16).select($"id".as("j"))
      .crossJoin(spark.range(64).select($"id".as("i")))
      .select($"i", $"j",
        ((conv(substring(md5(concat_ws("_", $"i", $"j")), 1, 4), 16, 10)
          .cast("long") % 2) * 2 - 1).cast("int").as("sgn"))
      .as[(Long, Long, Int)].collect()
      .foreach { case (i, j, s) =>
        assert(sg((i * 16 + j).toInt) == s.toByte, s"sign mismatch at ($i,$j)") }
  }

  test("q85 ORC round-trip: re-scan prunes to the four written columns, partial+final agg") {
    val p = planOf("q85_orc_roundtrip")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    val cols = read.split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"),
      s"ORC re-scan should read exactly the projected columns: $cols")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final HashAggregate")
  }

  test("q86 novelty: reference screen is an anti-join, never a loop join") {
    val p = planOf("q86_ngram_novelty")
    assert(p.contains("LeftAnti"), s"expected an anti-join probe:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), "novelty must not cross-join shingle sets")
  }

  test("q87 token budget: exactly one hash shuffle (the per-source window)") {
    val p = planOf("q87_token_budget_sample")
    assert(p.contains("hashpartitioning(source"),
      s"running sum must partition by source:\n${p.take(1500)}")
    assert("hashpartitioning\\(".r.findAllIn(p).size == 1,
      s"budget sampling should shuffle once (plus the final range sort):\n${p.take(1500)}")
  }

  test("q88 canonical dedup: one hash shuffle (the keeper window on canon_md5)") {
    val p = planOf("q88_canonical_dedup")
    assert(p.contains("hashpartitioning(canon_md5"),
      s"keeper window must partition by the canonical hash:\n${p.take(1500)}")
    assert("hashpartitioning\\(".r.findAllIn(p).size == 1,
      s"canonical dedup should shuffle once (plus the final range sort):\n${p.take(1500)}")
  }

  test("q89 domain KL: vocab-sized side broadcasts; corpus text never re-shuffles") {
    val p = planOf("q89_domain_kl")
    assert(p.contains("BroadcastHashJoin"),
      s"per-word totals (vocab-bounded) should broadcast:\n${p.take(1500)}")
  }

  test("q92 EXISTS decorrelates to a semi join, never a per-row subquery") {
    val p = planOf("q92_exists_subquery")
    assert(p.contains("LeftSemi"), s"EXISTS should rewrite to a left-semi join:\n${p.take(1500)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the non-equi inner predicate must ride the equi-join as a residual condition")
  }

  test("q93 NOT EXISTS decorrelates to an anti join (the null-safe NOT IN spelling)") {
    val p = planOf("q93_not_exists_anti")
    assert(p.contains("LeftAnti"), s"NOT EXISTS should rewrite to a left-anti join:\n${p.take(1500)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "NOT EXISTS must not fall back to a loop join")
  }

  test("q94 correlated scalar avg decorrelates into a grouped agg + equi-join") {
    val p = planOf("q94_scalar_subquery")
    // the correlated avg becomes its own partial+final aggregate over
    // lineitem joined back on l_partkey — plus the outer group-by
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"expected decorrelated avg agg + outer agg, both partial+final:\n${p.take(1500)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "scalar subquery must not execute per outer row")
  }

  test("q96 TF-IDF: tf/df are partial+final aggs; documents scan prunes to id+text") {
    val p = planOf("q96_tfidf")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    val cols = read.split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("doc_id", "text"), s"documents scan should prune to doc_id+text: $cols")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"tf and df should each be partial+final HashAggregates:\n${p.take(1500)}")
  }

  test("q97 histogram: scan prunes to n_chars only, 21-group partial+final agg") {
    val p = planOf("q97_length_histogram")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    val cols = read.split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("n_chars"), s"histogram should read exactly n_chars: $cols")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final HashAggregate")
  }

  test("q98 salted join stays an equi hash/merge join (salt is an equi key)") {
    val p = planOf("q98_salted_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"salted join must remain an equi join:\n${p.take(1500)}")
  }

  test("q103 funnel: time window rides the user_id equi-join, never a loop join") {
    val p = planOf("q103_event_funnel")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the hour window must be a residual on the user_id equi-join:\n${p.take(1500)}")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    val cols = read.split(",").map(_.split(":")(0).trim).toSet
    assert(!cols.contains("props"), s"events scan must prune the wide props column: $cols")
  }

  test("q104 inverted index: text is projected away before any exchange") {
    val p = planOf("q104_inverted_index")
    // the posting rows that shuffle are (term, doc_id) — the document
    // text must not survive into any exchange's input row
    val exchangeInputs = """\(\d+\) Exchange[\s\S]*?Input \[\d+\]: (\[[^\]]*\])"""
      .r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchangeInputs.nonEmpty, s"expected shuffle details in:\n${p.take(800)}")
    assert(exchangeInputs.forall(!_.contains("text#")),
      s"raw text must not flow through a shuffle: $exchangeInputs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q105 MAD: both median passes share one per-group sort (no second shuffle of orders)") {
    val p = planOf("q105_mad_outliers")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"median/MAD must stay window + equi-join shaped:\n${p.take(1500)}")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    val cols = read.split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("o_orderpriority", "o_totalprice"),
      s"orders scan should prune to priority+price: $cols")
  }

  test("q106 transitions: one per-user window shuffle feeds a type²-bounded agg") {
    val p = planOf("q106_markov_transitions")
    assert(p.contains("Window"), "lag must plan as a window, not a self-join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    val cols = read.split(",").map(_.split(":")(0).trim).toSet
    assert(!cols.contains("props") && !cols.contains("value"),
      s"events scan must prune to the sequence columns: $cols")
  }

  test("q108/q109 audits: pair-list joins stay equi joins, never loop joins") {
    for (q <- Seq("q108_split_contamination", "q109_sketch_quality")) {
      val p = planOf(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q must join the pair list on keys only:\n${p.take(1200)}")
    }
  }

  test("q110/q111: no hash shuffle carries raw text (scores/fingerprints computed first)") {
    // the one text-bearing exchange allowed is Core.fanOut's RoundRobin
    // spread inside the memoized scoring pass — a single-parquet-file
    // test-scale affordance (Core.fanOut doc); the KEY-PARTITIONED
    // shuffles (window ranking, joins, aggs) must carry narrow columns
    for (q <- Seq("q110_adaptive_quality_gate", "q111_corpus_diff")) {
      val p = planOf(q)
      val hashExchanges =
        """\(\d+\) Exchange\s*\nInput \[\d+\]: (\[[^\]]*\])\s*\nArguments: (hashpartitioning[^\n]*)"""
          .r.findAllMatchIn(p).map(m => (m.group(2), m.group(1))).toSeq
      assert(hashExchanges.nonEmpty, s"expected hash exchanges in:\n${p.take(800)}")
      assert(hashExchanges.forall(!_._2.contains("text#")),
        s"$q hash-shuffles raw text: $hashExchanges")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("q112/q113 spans: raw text stays out of every hash shuffle; anti-join is equi") {
    // the gram pass is row-local (GramHashes array inside the row), so
    // the only token-sized exchanges carry (doc_id, pos, gh|w) — never
    // the full text column; the scrub's span anti-join must stay an
    // equi hash/merge join (a loop join would be pairs × positions)
    for (q <- Seq("q112_duplicate_spans", "q113_span_scrub")) {
      val p = planOf(q)
      val hashExchanges =
        """\(\d+\) Exchange\s*\nInput \[\d+\]: (\[[^\]]*\])\s*\nArguments: (hashpartitioning[^\n]*)"""
          .r.findAllMatchIn(p).map(m => (m.group(2), m.group(1))).toSeq
      assert(hashExchanges.nonEmpty, s"expected hash exchanges in:\n${p.take(800)}")
      assert(hashExchanges.forall(!_._2.contains("text#")),
        s"$q hash-shuffles raw text: $hashExchanges")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q fell back to a loop join")
    }
  }

  test("wave-6 ops: no loop joins, raw text out of every hash shuffle") {
    // q117's join-back, q119's marginal joins, q120's candidate joins
    // and q121/q122's score windows must all key on narrow columns;
    // a CartesianProduct anywhere here is quadratic at corpus scale.
    // q119's single allowed BroadcastNestedLoopJoin is the documented
    // crossJoin-of-a-broadcast-1-row-aggregate (the N total).
    for (q <- Seq("q117_winnow_fingerprints", "q119_pmi_collocations",
        "q120_sorted_neighborhood", "q121_lm_filter_buckets",
        "q122_curriculum_order", "q116_pagerank", "q124_bpe_merge_apply",
        "q127_entity_resolution", "q128_simhash_join",
        "q129_dedup_report", "q130_cross_source_dups",
        "q131_decontaminate_scrub")) {
      val p = planOf(q)
      val bnlAllowed = q match {
        // documented crossJoin-of-a-broadcast-1-row-aggregate uses:
        // q119's N total, q129's totals row, q124's top merge pair
        // (the final round's — earlier rounds sit behind checkpoints)
        case "q119_pmi_collocations" | "q129_dedup_report"
           | "q124_bpe_merge_apply" => 1
        case _ => 0
      }
      // count physical nodes via the formatted-details header — the
      // tree rendering repeats each operator name
      val bnlNodes = """\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(p).size
      assert(!p.contains("CartesianProduct") && bnlNodes <= bnlAllowed,
        s"$q fell back to a loop join ($bnlNodes nodes):\n${p.take(1200)}")
      val hashExchanges =
        """\(\d+\) Exchange\s*\nInput \[\d+\]: (\[[^\]]*\])\s*\nArguments: (hashpartitioning[^\n]*)"""
          .r.findAllMatchIn(p).map(m => m.group(1)).toSeq
      assert(hashExchanges.forall(!_.contains("text#")),
        s"$q hash-shuffles raw text: $hashExchanges")
    }
  }

  test("q123 hard negatives: anchor side is broadcast, corpus side streams") {
    // like q35: the non-equi (id, label) inequality join is legal ONLY
    // as a broadcast of the bounded anchor batch over the streaming
    // corpus — never a shuffled Cartesian
    val p = planOf("q123_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"q123 must broadcast the anchor batch:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), "q123 must not shuffle a Cartesian")
  }

  test("no catalog query plans an unpartitioned window outside the documented bounded set") {
    // The executable form of the r4 verdict's WindowExec invariant: a
    // Window with an empty partitionSpec funnels its whole input
    // through ONE task's external sort — fatal at corpus scale unless
    // the input is provably bounded. Every catalog query must either
    // plan zero unpartitioned windows or appear here with the reason
    // its frames stay small. (Same durability move as CODEGEN_ONLY:
    // the warning in the test log becomes a failing gate.)
    // (q127 shares q120's size-gated sn channel, but its candidate
    // frame sits behind the connected-components checkpoint and never
    // appears in its final plan)
    val bounded: Map[String, (Int, String)] = Map(
      "q115_hybrid_rrf" -> ((2,
        "both rank windows run over the two top-100 TakeOrdered frames")),
      "q120_sorted_neighborhood" -> ((1,
        "size-gated sn channel: the one-window spelling runs only ≤ SnWindowMaxDocs " +
          "(1M) corpus rows ≈ 50 MB single-task sort; snPairs is the scale path")),
      "q121_lm_filter_buckets" -> ((1,
        "ntile ORACLE anchor; lmBucketsScalable is the broadcast-threshold scale path")),
      "q122_curriculum_order" -> ((1,
        "ntile ORACLE anchor; curriculumOrderScalable is the broadcast-threshold scale path")),
      "q136_daily_reach" -> ((1,
        "cumulative window frame is the calendar-day domain, independent of event volume")),
      "q142_hybrid_store" -> ((1,
        "lex rank window runs over the store lookup's top-100 limit frame; " +
          "the semantic rank is qid-partitioned inside annFromStore")),
      "q153_hybrid_unified_store" -> ((1,
        "q142's exact route over the unified store: the one unpartitioned " +
          "window is the lex rank over the top-100 limit frame")))
    import org.apache.spark.sql.execution.window.WindowExec
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
      val n = SparkEntry.queries(q)(spark, dir).queryExecution.sparkPlan
        .collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        .size
      if (n > 0) Some(q -> n) else None
    }.toMap
    val unexpected = offenders.filter { case (q, n) =>
      !bounded.get(q).exists(_._1 == n) }
    assert(unexpected.isEmpty,
      s"unpartitioned corpus windows beyond the documented bounded set: " +
        s"${unexpected.toSeq.sorted.map { case (q, n) => s"$q($n)" }}")
    val stale = bounded.keySet -- offenders.keySet
    assert(stale.isEmpty,
      s"allowlist entries no longer needed (remove them): ${stale.toSeq.sorted}")
  }

  test("q107 SCD2 merge: one equi-join feeds all three merge branches") {
    val p = planOf("q107_scd2_merge")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"MERGE must compile to an equi-join + union:\n${p.take(1500)}")
    assert(p.contains("Union"), "expected the three merge branches unioned")
  }

  test("q146 DSIR: 256-row model broadcasts back, selection is TakeOrdered, no loop join") {
    val p = planOf("q146_dsir_selection")
    assert(p.contains("BroadcastHashJoin"),
      s"the bucket-weight model must broadcast against the token stream:\n${p.take(1500)}")
    assert(p.contains("TakeOrderedAndProject"),
      "top-slice selection must be TakeOrdered, never a global sort")
    assert(!p.contains("CartesianProduct"), "no cartesian anywhere in DSIR")
    // the only loop joins are the 1-row totals frames
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2,
      s"only the 1-row totals may nested-loop:\n${p.take(1500)}")
  }

  test("q147 quality classifier: token-weight join broadcasts; scoring aggregates partial+final") {
    val p = planOf("q147_quality_classifier")
    assert(p.contains("BroadcastHashJoin"),
      s"the vocabulary weight frame must broadcast:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"))
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "training counts and doc scoring must both partial-aggregate")
  }

  test("q148 triangles: wedge closure is a semi-join; no loop join closes triangles") {
    val p = planOf("q148_cooccur_triangles")
    assert(p.contains("LeftSemi"),
      s"triangle closure must be a semi-join on the (v,w) key:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), "triangle counting must never cross-join")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 output must be TakeOrdered, never a global sort")
  }

  test("q150 CDC chunking: zero joins — the only exchange feeds the per-source aggregate") {
    val p = planOf("q150_cdc_chunks")
    assert(!p.contains("Join"), s"chunking must be row-local, no join:\n${p.take(1500)}")
    // formatted mode prints each node twice (tree + detail): 4 distinct
    // exchanges — fan-out spread, partial+final count-distinct, sort
    assert("Exchange".r.findAllIn(p).size <= 8,
      s"expected only the count-distinct agg (+sort) exchanges:\n${p.take(1500)}")
  }

  test("q151 Kneser-Ney: model built from vocab²-bounded aggs, broadcast to the scoring pass") {
    val p = planOf("q151_kneser_ney")
    assert(p.contains("BroadcastHashJoin"),
      s"the KN model must broadcast against the bigram stream:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"))
    // one BNLJ node (the 1-row type total), printed twice in formatted mode
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2,
      "only the 1-row type total may nested-loop")
  }
}
