package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Persisted text-retrieval channel (IndexStore.writeText / appendText /
  * bm25FromStore): the retrieval-family member of the maintained-index
  * tier. Pins the three contracts that make the store a real index:
  * the store route is indistinguishable from the session route, an
  * O(batch) append is indistinguishable from a full rebuild, and the
  * query-term lookup actually prunes at the scan. */
class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-txt-$tag").toString

  test("bm25FromStore ≡ bm25 session route (catalog q139 ≡ q114)") {
    val a = SparkEntry.queries("q114_bm25")(spark, dir).collect().toSeq
    val b = SparkEntry.queries("q139_bm25_store")(spark, dir).collect().toSeq
    assert(a.nonEmpty && a == b,
      s"store route diverges from session route:\n  q114=${a.take(3)}\n  q139=${b.take(3)}")
  }

  test("bm25BatchFromStore: each qid bit-equal to its single-query lookup") {
    // the batched read shares one pruned postings scan across queries;
    // because the score sum is exact decimal (order-independent), each
    // query's results must be BIT-EQUAL to running it alone
    val idx = ops.TextOps.textStore(spark, dir)
    val t1 = ops.TextOps.qtermsOfExtreme(spark, dir, useMax = false)
    val t2 = ops.TextOps.qtermsOfExtreme(spark, dir, useMax = true)
    val batch = ops.IndexStore.bm25BatchFromStore(spark, idx,
      Seq(1 -> t1, 2 -> t2)).collect()
    assert(batch.length == 40, s"expected 2 × top-20, got ${batch.length}")
    for ((qid, terms) <- Seq(1 -> t1, 2 -> t2)) {
      val single = ops.IndexStore.bm25FromStore(spark, idx, terms)
        .orderBy($"score".desc, $"doc_id").limit(20)
        .select($"doc_id", $"n_hit", $"score").collect().toSeq
      val fromBatch = batch.filter(_.getInt(0) == qid).sortBy(_.getInt(1))
        .map(r => org.apache.spark.sql.Row(r.get(2), r.get(3), r.get(4))).toSeq
      assert(fromBatch == single,
        s"qid=$qid batch route diverges from single-query route")
    }
  }

  test("writeText(corpus) ≡ writeText(90%) + appendText(10%) on query results") {
    val docs = Core.table(spark, dir, "documents")
    val gate = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
      .cast("long")
    val full = tmp("full"); val rolled = tmp("rolled")
    ops.IndexStore.writeText(spark, docs, full)
    ops.IndexStore.writeText(spark, docs.filter(gate < 58982L), rolled)
    ops.IndexStore.appendText(spark, rolled, docs.filter(gate >= 58982L))
    // channel-level set equality — stats included: the merged 1-row
    // (n_docs, sum_dl) must equal a fresh full-corpus build's
    for (ch <- Seq("postings", "doc_lens", "stats")) {
      val a = ops.IndexStore.channel(spark, full, ch)
      val b = ops.IndexStore.channel(spark, rolled, ch)
      assert(a.count() == b.count() && a.except(b).isEmpty && b.except(a).isEmpty,
        s"channel $ch diverges after append")
    }
    // observation equality: same query, same scores, either store
    val terms = ops.TextOps.qtermsOf(spark, dir)
    val qa = ops.IndexStore.bm25FromStore(spark, full, terms)
      .orderBy($"doc_id").collect().toSeq
    val qb = ops.IndexStore.bm25FromStore(spark, rolled, terms)
      .orderBy($"doc_id").collect().toSeq
    assert(qa.nonEmpty && qa == qb, "append-maintained store scores diverge")
  }

  test("preTok route ≡ tokenize route: shared-pass folds land identical channels (VERDICT r11 #3)") {
    // the warm-consolidation contract: writeText/appendText fed a
    // pre-tokenized full-corpus frame (semi-joined per slice) must be
    // channel-for-channel indistinguishable from the per-fold
    // tokenization route — this is what lets the three text-carrying
    // bench fixtures share ONE tokenization pass
    val docs = Core.table(spark, dir, "documents")
    val preTok = Some(ops.TextOps.postingsFor(docs))
    val shared = tmp("pretok"); val solo = tmp("tokenized")
    val (even, odd) = ($"doc_id" % 2 === 0, $"doc_id" % 2 === 1)
    ops.IndexStore.writeText(spark, docs.filter(even), shared, preTok)
    ops.IndexStore.appendText(spark, shared, docs.filter(odd), preTok)
    ops.IndexStore.writeText(spark, docs.filter(even), solo)
    ops.IndexStore.appendText(spark, solo, docs.filter(odd))
    for (ch <- Seq("postings", "doc_lens", "stats")) {
      val a = ops.IndexStore.channel(spark, shared, ch)
      val b = ops.IndexStore.channel(spark, solo, ch)
      assert(a.count() == b.count() && a.except(b).isEmpty && b.except(a).isEmpty,
        s"channel $ch diverges between the preTok and tokenize routes")
    }
    val terms = ops.TextOps.qtermsOf(spark, dir)
    val qa = ops.IndexStore.bm25FromStore(spark, shared, terms)
      .orderBy($"doc_id").collect().toSeq
    val qb = ops.IndexStore.bm25FromStore(spark, solo, terms)
      .orderBy($"doc_id").collect().toSeq
    assert(qa.nonEmpty && qa == qb, "preTok-fed store scores diverge")
  }

  test("a stale/partial preTok frame fails the write LOUDLY instead of corrupting the postings (ADVICE r12 #1)") {
    // a batch doc with tokenizable text that the preTok frame does not
    // cover was previously indexed as an empty (dl=0) doc — the exact
    // silent corruption the caller contract warned about, enforced by
    // discipline alone. The in-plan coverage guard must refuse it.
    val docs = Core.table(spark, dir, "documents")
    val stale = Some(ops.TextOps.postingsFor(docs.filter($"doc_id" % 2 === 0)))
    val e = intercept[Exception] {
      ops.IndexStore.writeText(spark, docs, tmp("stalepretok"), stale)
    }
    def msgOf(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage)
        ++ Iterator(""))
        .find(m => m != null && m.contains("preTok")).getOrElse(t.getMessage)
    assert(msgOf(e) != null && msgOf(e).contains("absent from the supplied preTok"),
      s"expected the preTok coverage refusal, got: ${e.getMessage}")
    // a legitimately letterless doc is NOT a coverage violation: dl=0
    // is its true length, and the guarded route must still admit it
    val withBlank = docs.select($"doc_id", $"text").limit(3)
      .unionByName(Seq((999999L, "12345 678")).toDF("doc_id", "text"))
    val ok = tmp("blankok")
    ops.IndexStore.writeText(spark, withBlank,
      ok, Some(ops.TextOps.postingsFor(withBlank)))
    val dl = ops.IndexStore.channel(spark, ok, "doc_lens")
      .filter($"doc_id" === 999999L).select($"dl").as[Long].collect()
    assert(dl.toSeq == Seq(0L), s"letterless doc must land dl=0, got ${dl.toSeq}")
  }

  test("query-term lookup reaches the postings scan as a pushed In filter") {
    // the layout claim (term-range-partitioned + term-sorted → row-group
    // pruning) is only real if the filter is PUSHED, not post-scan
    val idx = tmp("push")
    ops.IndexStore.writeText(spark, Core.table(spark, dir, "documents"), idx)
    val plan = ops.IndexStore.bm25FromStore(spark, idx, Seq("the", "spark"))
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("postings"))
      .mkString("\n")
    assert(scanLine.contains("PushedFilters: [In(term, ["),
      s"term filter not pushed to the postings scan:\n${scanLine.take(800)}")
  }

  test("batch lookup: union In filter pushed, doc_lens absent, window qid-partitioned") {
    // the batch route inherits every single-route plan property: the
    // UNION of all queries' terms arrives as one pushed In filter on
    // the postings scan, the per-corpus-row doc_lens channel never
    // appears, and the top-k window partitions by qid (bounded per
    // query, never a single-task corpus sort)
    val idx = tmp("bpush")
    ops.IndexStore.writeText(spark, Core.table(spark, dir, "documents"), idx)
    val df = ops.IndexStore.bm25BatchFromStore(spark, idx,
      Seq(1 -> Seq("the", "spark"), 2 -> Seq("data", "spark")))
    val plan = df.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("postings"))
      .mkString("\n")
    assert(scanLine.contains("PushedFilters: [In(term, ["),
      s"union term filter not pushed to the postings scan:\n${scanLine.take(800)}")
    assert(!plan.contains("doc_lens"),
      s"batch lookup plan scans doc_lens — O(corpus) per batch:\n${plan.take(800)}")
    import org.apache.spark.sql.execution.window.WindowExec
    val unpart = df.queryExecution.sparkPlan
      .collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(unpart.isEmpty, "batch top-k window must be qid-partitioned")
  }

  test("lookup never touches the corpus: no doc_lens scan, stats read is 1 row") {
    // the O(Σ df) claim: dl rides inside the pruned postings rows and
    // (N, avgdl) is the persisted 1-row stats channel, so the ONLY
    // per-corpus-row channel (doc_lens) must be absent from the plan
    val idx = tmp("nodl")
    ops.IndexStore.writeText(spark, Core.table(spark, dir, "documents"), idx)
    val plan = ops.IndexStore.bm25FromStore(spark, idx, Seq("the", "spark"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("doc_lens"),
      s"lookup plan scans the doc_lens channel — O(corpus) per query:\n${plan.take(800)}")
    assert(ops.IndexStore.channel(spark, idx, "stats").count() == 1)
  }

  test("appendText refuses a batch overlapping the stored corpus") {
    val idx = tmp("guard")
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    ops.IndexStore.writeText(spark, docs, idx)
    val e = intercept[IllegalArgumentException] {
      ops.IndexStore.appendText(spark, idx,
        Seq((2L, "beta gamma"), (3L, "delta")).toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("already present"))
    // the guarded store is untouched: a disjoint append still works
    ops.IndexStore.appendText(spark, idx, Seq((3L, "delta")).toDF("doc_id", "text"))
    val st = ops.IndexStore.channel(spark, idx, "stats").head()
    assert(st.getAs[Long]("n_docs") == 3L)
  }

  test("appendText skips an exact micro-batch redelivery idempotently") {
    // foreachBatch is at-least-once: a crash between a successful store
    // commit and the stream's offset checkpoint REDELIVERS the batch on
    // restart — refusing it would wedge the stream forever, so an exact
    // id-level replay is a no-op, while partial overlap stays an error
    val idx = tmp("replay")
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    ops.IndexStore.writeText(spark, docs, idx)
    val batch = Seq((3L, "delta epsilon"), (4L, "zeta")).toDF("doc_id", "text")
    ops.IndexStore.appendText(spark, idx, batch)
    val hist = ops.IndexStore.history(idx)
    val stats = ops.IndexStore.channel(spark, idx, "stats").head()
    ops.IndexStore.appendText(spark, idx, batch) // redelivery
    assert(ops.IndexStore.history(idx) == hist,
      "an exact replay must not commit a new snapshot")
    assert(ops.IndexStore.channel(spark, idx, "stats").head() == stats,
      "an exact replay must not touch the stats channel")
    assert(ops.IndexStore.channel(spark, idx, "doc_lens").count() == 4)
  }

  test("a letterless doc cannot wedge replay: doc_lens is id-complete") {
    // a doc with zero [a-z] tokens emits no postings, but the
    // membership channel must still record it (dl=0) — otherwise an
    // exact redelivery of a batch containing it reads as PARTIAL
    // overlap and the stream wedges on the very guard built to
    // unwedge it. The stats census still counts only indexed docs.
    val idx = tmp("letterless")
    ops.IndexStore.writeText(spark,
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), idx)
    val batch = Seq((3L, "delta gamma"), (4L, "12345 !!!"))
      .toDF("doc_id", "text")
    ops.IndexStore.appendText(spark, idx, batch)
    val hist = ops.IndexStore.history(idx)
    ops.IndexStore.appendText(spark, idx, batch) // exact redelivery
    assert(ops.IndexStore.history(idx) == hist,
      "redelivery of a batch with a letterless doc must be a no-op")
    val dls = ops.IndexStore.channel(spark, idx, "doc_lens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dls == Map(1L -> 2L, 3L -> 2L, 4L -> 0L),
      s"doc_lens must be id-complete with dl=0 for letterless docs: $dls")
    val st = ops.IndexStore.channel(spark, idx, "stats").head()
    assert(st.getAs[Long]("n_docs") == 2L && st.getAs[Long]("sum_dl") == 4L,
      "stats must census only INDEXED (dl > 0) docs")
  }

  test("q143 timeline: one version per POPULATED doc_id%3 slice (empty residue commits nothing)") {
    // committed version ⇔ non-empty fold: residue 1 is empty here, so
    // the store holds two snapshots and the query emits two versions —
    // the same sequence the oracle derives from the same slicing
    // (a fixed 1..3 numbering would desynchronize engine and oracle)
    val fdir = tmp("q143edge")
    Seq((0L, "alpha beta"), (3L, "gamma"),
        (2L, "delta epsilon zeta"), (5L, "eta"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$fdir/documents.parquet")
    val rows = SparkEntry.queries("q143_store_time_travel")(spark, fdir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((1, 2L, 3L), (2, 4L, 7L)),
      s"per-populated-slice cumulative census mismatch: $rows")
  }

  test("an empty append on an initialized store is a no-op, not a snapshot") {
    val idx = tmp("emptyappend")
    ops.IndexStore.writeText(spark,
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), idx)
    val hist = ops.IndexStore.history(idx)
    ops.IndexStore.appendText(spark, idx,
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    assert(ops.IndexStore.history(idx) == hist,
      "an empty fold must not commit a snapshot")
  }

  test("an empty bootstrap batch does not wedge the store") {
    // a streaming ingest loop's opening micro-batch can be empty; the
    // bootstrap write must not commit part-file-less parquet paths a
    // later read cannot infer a schema from
    val idx = tmp("emptyboot")
    ops.IndexStore.appendText(spark, idx,
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    assert(ops.IndexStore.channel(spark, idx, "stats").head()
      .getAs[Long]("n_docs") == 0L)
    ops.IndexStore.appendText(spark, idx,
      Seq((1L, "alpha beta")).toDF("doc_id", "text"))
    assert(ops.IndexStore.channel(spark, idx, "doc_lens").count() == 1)
    assert(ops.IndexStore.bm25FromStore(spark, idx, Seq("alpha")).count() == 1)
  }

  test("streamed ingestAndMaintainText ≡ one-shot writeText (channels + scores)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tiny = "/root/testdata/sf0.001"
    val docs = Core.table(spark, tiny, "documents").select($"doc_id", $"text")
    val rows = docs.as[streaming.StreamingOps.DocRow].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val streamed = tmp("stream")
    val stream = MemoryStream[streaming.StreamingOps.DocRow]
    val q = stream.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        streaming.StreamingOps.ingestAndMaintainText(spark, streamed, b.toDF())
      }.start()
    Seq(b1, b2).foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    val oneShot = tmp("oneshot")
    ops.IndexStore.writeText(spark, docs, oneShot)
    for (ch <- Seq("postings", "doc_lens", "stats")) {
      val a = ops.IndexStore.channel(spark, streamed, ch)
      val b = ops.IndexStore.channel(spark, oneShot, ch)
      assert(a.count() == b.count() && a.except(b).isEmpty && b.except(a).isEmpty,
        s"channel $ch diverged after streamed maintenance")
    }
    val terms = ops.TextOps.qtermsOf(spark, tiny)
    val qa = ops.IndexStore.bm25FromStore(spark, streamed, terms)
      .orderBy($"doc_id").collect().toSeq
    val qb = ops.IndexStore.bm25FromStore(spark, oneShot, terms)
      .orderBy($"doc_id").collect().toSeq
    assert(qa.nonEmpty && qa == qb, "streamed store scores diverge from one-shot")
  }

  test("ingest loop honors the maxSnapshots gate: compacts mid-stream, still ≡ one-shot") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tiny = "/root/testdata/sf0.001"
    val docs = Core.table(spark, tiny, "documents").select($"doc_id", $"text")
    val rows = docs.as[streaming.StreamingOps.DocRow].collect().toSeq
    val batches = rows.grouped(math.max(1, rows.size / 4)).toSeq
    val streamed = tmp("gated")
    // single-owner stream: no readers outside the loop, so immediate
    // reclamation is safe — the vacuumOnCompact=true usage mode
    spark.conf.set("graft.store.maxSnapshots", "2")
    spark.conf.set("graft.store.vacuumOnCompact", "true")
    try {
      val stream = MemoryStream[streaming.StreamingOps.DocRow]
      val q = stream.toDF().writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          streaming.StreamingOps.ingestAndMaintainText(spark, streamed, b.toDF())
        }.start()
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      q.stop()
    } finally {
      spark.conf.unset("graft.store.maxSnapshots")
      spark.conf.unset("graft.store.vacuumOnCompact")
    }
    // the gate fired and vacuumed: on-disk snapshots are only the
    // referenced ones, and fewer than the batch count — the stream
    // compacted instead of fragmenting one snapshot per micro-batch
    val snapDirs = new java.io.File(streamed).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("snap_"))
      .map(_.getName).toSet
    assert(snapDirs.size <= 3 && snapDirs.size < batches.size,
      s"gate never fired: ${batches.size} batches left snapshots $snapDirs")
    val oneShot = tmp("gated-oneshot")
    ops.IndexStore.writeText(spark, docs, oneShot)
    for (ch <- Seq("postings", "doc_lens", "stats")) {
      val a = ops.IndexStore.channel(spark, streamed, ch)
      val b = ops.IndexStore.channel(spark, oneShot, ch)
      assert(a.count() == b.count() && a.except(b).isEmpty && b.except(a).isEmpty,
        s"channel $ch diverged under the compaction gate")
    }
    val terms = ops.TextOps.qtermsOf(spark, tiny)
    val qa = ops.IndexStore.bm25FromStore(spark, streamed, terms)
      .orderBy($"doc_id").collect().toSeq
    val qb = ops.IndexStore.bm25FromStore(spark, oneShot, terms)
      .orderBy($"doc_id").collect().toSeq
    assert(qa.nonEmpty && qa == qb, "gated streamed store scores diverge from one-shot")
  }

  test("empty term list returns no rows (and does not scan the corpus)") {
    val idx = tmp("empty")
    ops.IndexStore.writeText(spark,
      Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text"), idx)
    assert(ops.IndexStore.bm25FromStore(spark, idx, Seq.empty).count() == 0)
    assert(ops.IndexStore.bm25FromStore(spark, idx, Seq("zzz")).count() == 0)
    val hit = ops.IndexStore.bm25FromStore(spark, idx, Seq("beta"))
    assert(hit.count() == 2)
  }
}
