package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.EventRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Structured Streaming tests via MemoryStream + processAllAvailable
  * (SURVEY.md §5.2(4): no wall-clock sleeps, event-time only). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  private def runQuery[T](stream: MemoryStream[EventRow],
      out: org.apache.spark.sql.DataFrame, mode: OutputMode, name: String)(
      batches: Seq[Seq[EventRow]]): org.apache.spark.sql.DataFrame = {
    val q = out.writeStream.format("memory").queryName(name).outputMode(mode).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name)
  }

  test("tumbling window counts with watermark drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    val result = runQuery(stream,
      StreamingOps.tumblingCounts(stream.toDF()), OutputMode.Append, "tumble")(Seq(
      // batch 1: two events in hour 0, one in hour 1
      Seq(EventRow(1, ts(10), 1, "click", 1.0), EventRow(2, ts(20), 1, "click", 2.0),
        EventRow(3, ts(70), 2, "view", 3.0)),
      // batch 2: advance watermark far past hour 0 (ts=4h)
      Seq(EventRow(4, ts(240), 1, "click", 1.0)),
      // batch 3: a LATE event for hour 0 — must be dropped
      Seq(EventRow(5, ts(15), 1, "click", 99.0)),
      Seq(EventRow(6, ts(400), 1, "click", 1.0))))
    val hour0 = result.filter($"w_start" === ts(0) && $"event_type" === "click")
      .select("n", "sum_v").as[(Long, Double)].collect()
    assert(hour0.sameElements(Array((2L, 3.0))), s"late event leaked: ${hour0.mkString}")
  }

  test("session windows split on 30-minute gaps") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    val result = runQuery(stream,
      StreamingOps.sessionCounts(stream.toDF()), OutputMode.Append, "sessions")(Seq(
      Seq(EventRow(1, ts(0), 7, "c", 1.0), EventRow(2, ts(10), 7, "c", 1.0),
        EventRow(3, ts(100), 7, "c", 1.0)),   // gap > 30min → second session
      Seq(EventRow(9, ts(600), 7, "c", 1.0))))  // flush watermark
    val sessions = result.filter($"user_id" === 7 && $"s_start" < ts(500))
      .select("n").as[Long].collect().sorted
    assert(sessions.sameElements(Array(1L, 2L)), s"got ${sessions.mkString(",")}")
  }

  test("dropDuplicatesWithinWatermark dedups repeated event_ids") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    val result = runQuery(stream,
      StreamingOps.dedupWithinWatermark(stream.toDF()), OutputMode.Append, "dedup")(Seq(
      Seq(EventRow(1, ts(0), 1, "c", 1.0), EventRow(1, ts(1), 1, "c", 1.0),
        EventRow(2, ts(2), 1, "c", 1.0)),
      Seq(EventRow(1, ts(3), 1, "c", 1.0))))  // still within watermark → dropped
    assert(result.select("event_id").as[Long].collect().sorted.sameElements(Array(1L, 2L)))
  }

  test("stream-static join enriches each micro-batch against a broadcast dimension") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val stream = MemoryStream[EventRow]
    val result = runQuery(stream,
      StreamingOps.enrichWithStatic(stream.toDF(), dim, "user_id"),
      OutputMode.Append, "enriched")(Seq(
      Seq(EventRow(1, ts(0), 1, "c", 1.0), EventRow(2, ts(1), 3, "c", 1.0))))
    val tiers = result.select($"event_id", $"tier").as[(Long, Option[String])]
      .collect().toMap
    assert(tiers == Map(1L -> Some("gold"), 2L -> None))
  }

  test("stream-stream join pairs clicks with purchases within the time bound") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    val result = runQuery(stream,
      StreamingOps.clickToPurchase(stream.toDF()), OutputMode.Append, "cp")(Seq(
      Seq(
        EventRow(1, ts(0), 7, "click", 1.0),
        EventRow(2, ts(10), 7, "purchase", 5.0),   // within 30 min → pair
        EventRow(3, ts(100), 7, "purchase", 5.0),  // 100 min later → no pair
        EventRow(4, ts(5), 8, "purchase", 5.0)),   // other user → no pair
      Seq(EventRow(9, ts(600), 1, "click", 1.0)))) // advance watermark
    val pairs = result.select($"click_id", $"purchase_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("stream-stream LEFT OUTER join emits unconverted clicks once the window expires") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    val result = runQuery(stream,
      StreamingOps.clickToPurchase(stream.toDF(), "left_outer"),
      OutputMode.Append, "cp_outer")(Seq(
      Seq(
        EventRow(1, ts(0), 7, "click", 1.0),
        EventRow(2, ts(10), 7, "purchase", 5.0),   // converts click 1
        EventRow(3, ts(1), 8, "click", 1.0)),      // never converts
      // advance the watermark far past click 3's 30-min match window —
      // on BOTH inputs: the global watermark is the min over the two
      // sides, so a click alone would leave the purchase side at 0 …
      Seq(EventRow(9, ts(600), 1, "click", 1.0), EventRow(11, ts(600), 2, "purchase", 1.0)),
      // … and run one more batch so the expired state is emitted
      Seq(EventRow(10, ts(610), 1, "click", 1.0), EventRow(12, ts(610), 2, "purchase", 1.0))))
    val pairs = result.select($"click_id", $"purchase_id")
      .as[(Long, Option[Long])].collect().toSet
    assert(pairs.contains((1L, Some(2L))), s"matched pair missing: $pairs")
    assert(pairs.contains((3L, None)), s"unconverted click not emitted: $pairs")
  }

  test("file-stream checkpoint: restart resumes offsets without reprocessing (R17/R18)") {
    // the streaming successor to the reference's SQLite checkpoint
    // skip-on-replay (unified_code.py:437–439, SURVEY.md §4.4) — and
    // unlike the reference's CLI path, resume actually works
    val root = java.nio.file.Files.createTempDirectory("chk").toString
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    spark.range(0, 10).toDF("id").write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(in)
        .writeStream.format("json")
        .option("path", out).option("checkpointLocation", chk)
        .start()
      q.processAllAvailable(); q.stop()
    }
    run()
    spark.range(10, 25).toDF("id").write.mode("append").parquet(in)
    run()   // restart from the same checkpoint
    val ids = spark.read.json(out).select("id").as[Long].collect().sorted
    assert(ids.length == 25, s"batch replayed or lost: ${ids.length} rows")
    assert(ids.sameElements(0L until 25L))
  }

  test("foreachBatch composes streaming with the batch JSON sink") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("fb-out").toString
    val stream = MemoryStream[EventRow]
    val q = stream.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.etl.Sinks.jsonChunks(batch.withColumn("batch_id",
          org.apache.spark.sql.functions.lit(id)), s"$out/b$id")
      }
      .start()
    stream.addData(Seq(EventRow(1, ts(0), 1, "c", 1.0), EventRow(2, ts(1), 2, "c", 2.0)))
    q.processAllAvailable()
    stream.addData(Seq(EventRow(3, ts(2), 1, "c", 3.0)))
    q.processAllAvailable()
    q.stop()
    val back = spark.read.json(s"$out/*")
    assert(back.count() == 3)
    assert(back.select("batch_id").distinct().count() >= 2)
  }

  test("flatMapGroupsWithState keeps running per-user totals") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    val q = StreamingOps.runningUserTotals(stream.toDS())
      .writeStream.format("memory").queryName("totals").outputMode("update").start()
    stream.addData(Seq(EventRow(1, ts(0), 1, "c", 1.0), EventRow(2, ts(1), 1, "c", 2.0)))
    q.processAllAvailable()
    stream.addData(Seq(EventRow(3, ts(2), 1, "c", 4.0)))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("totals").as[StreamingOps.UserAgg].collect()
      .filter(_.user_id == 1L).maxBy(_.n)
    assert(last.n == 3L && last.total == 7.0)
  }

  test("streaming session sequences ≡ batch q125 on replay, flushed by watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    Core.clearCaches(spark)
    val evs = Core.table(spark, dir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventRow].collect().sortBy(e => (e.ts.getTime, e.event_id))
    // two far-future sentinel events (excluded user): the first
    // advances the watermark, the second triggers the timeout pass
    // that flushes every user's trailing open session
    val far1 = new Timestamp(evs.map(_.ts.getTime).max + 86400000L * 30)
    val far2 = new Timestamp(far1.getTime + 86400000L)
    val stream = MemoryStream[EventRow]
    val got = runQuery(stream, StreamingOps.sessionSequences(stream.toDS()).toDF(),
      OutputMode.Append, "sess_seq")(Seq(
        evs.toSeq,
        Seq(EventRow(900001L, far1, 999999L, "x", 0.0)),
        Seq(EventRow(900002L, far2, 999999L, "x", 0.0))))
      .as[StreamingOps.SessionSeq].collect()
      .filter(_.user_id != 999999L)
      .map(s => (s.user_id, s.session_id, s.n_events, s.seq)).toSet
    val want = SparkEntry.queries("q125_session_sequences")(spark, dir)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == want, s"streaming sessions must equal batch q125 " +
      s"(got ${got.size}, want ${want.size})")
    Core.clearCaches(spark)
  }

  test("a user returning after a timeout flush continues the session numbering") {
    // the tombstone path: user 42's first session is flushed by the
    // EventTimeTimeout (a batch where the user has NO data), then the
    // user comes back — the resumed session must number n+1 exactly
    // as a batch replay would, not restart at 1
    implicit val sqlCtx = spark.sqlContext
    def at(base: Long, min: Int) = new Timestamp(base + min * 60000L)
    val b0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val far1 = new Timestamp(b0 + 86400000L * 30)
    val far2 = new Timestamp(far1.getTime + 86400000L)
    val far3 = new Timestamp(far2.getTime + 86400000L)
    val far4 = new Timestamp(far3.getTime + 86400000L)
    val stream = MemoryStream[EventRow]
    val got = runQuery(stream,
      StreamingOps.sessionSequences(stream.toDS()).toDF(),
      OutputMode.Append, "sess_resume")(Seq(
        Seq(EventRow(1, at(b0, 0), 42, "a", 0.0), EventRow(2, at(b0, 1), 42, "b", 0.0),
          EventRow(3, at(b0, 2), 42, "c", 0.0)),
        Seq(EventRow(900001L, far1, 999999L, "x", 0.0)), // advance watermark
        Seq(EventRow(900002L, far2, 999999L, "x", 0.0)), // fire user 42's timeout
        Seq(EventRow(4, at(far2.getTime, 60), 42, "d", 0.0),
          EventRow(5, at(far2.getTime, 61), 42, "e", 0.0),
          EventRow(6, at(far2.getTime, 62), 42, "f", 0.0)), // the user returns
        Seq(EventRow(900003L, far3, 999999L, "x", 0.0)), // advance watermark
        Seq(EventRow(900004L, far4, 999999L, "x", 0.0)))) // fire the second flush
      .as[StreamingOps.SessionSeq].collect()
      .filter(_.user_id == 42L).map(s => (s.session_id, s.seq)).toSet
    assert(got == Set((1L, "a b c"), (2L, "d e f")),
      s"resumed user must continue the sequential numbering: got $got")
  }

  test("streaming ingest screen matches the batch incremental-dedup keep set") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // same deterministic split as batch q71: uint16 md5 gate at 58982
    def gate(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("string")), 1, 4), 16, 10).cast("long")
    val docs = Core.table(spark, dir, "documents").select($"doc_id", $"text")
    val existing = docs.filter(gate($"doc_id") < 58982L)
    val incomingRows = docs.filter(gate($"doc_id") >= 58982L)
      .as[(Long, String)].collect().toSeq
    // static indexes over the EXISTING side only (bandKeyIndex covers
    // the whole corpus — restrict it with the same gate)
    val bandIdx = ops.Dedup.bandKeyIndex(spark, dir)
      .filter(gate($"doc_id") < 58982L).select("band", "band_key")
    val textIdx = existing.select(md5($"text").as("t"))
    val stream = MemoryStream[(Long, String)]
    val screened = StreamingOps.screenIncoming(
      stream.toDF().toDF("doc_id", "text"), bandIdx, textIdx, md5Base = true)
    val q = screened.writeStream.format("memory").queryName("screen")
      .outputMode(OutputMode.Append).start()
    // two micro-batches to prove batch-boundary independence
    val (b1, b2) = incomingRows.splitAt(incomingRows.size / 2)
    Seq(b1, b2).foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    val kept = spark.table("screen").select("doc_id").as[Long].collect().toSet
    val batchKeep = SparkEntry.queries("q71_incremental_dedup")(spark, dir)
      .filter($"decision" === "keep").select("doc_id").as[Long].collect().toSet
    assert(kept == batchKeep,
      s"stream kept ${kept.size}, batch kept ${batchKeep.size}; " +
        s"diff=${(kept diff batchKeep) ++ (batchKeep diff kept)}")
  }

  test("streaming sim screen ≡ stored-index batch screen (keeps the non-near-dup slice)") {
    import org.apache.spark.sql.functions.{conv, substring, md5}
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-simstream").toString
    val docs = Core.table(spark, dir, "documents")
    val gate = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10).cast("long")
    graft.ops.IndexStore.write(spark, docs.filter(gate < 58982), out)
    val incoming = docs.filter(gate >= 58982)
      .select($"doc_id", $"text").as[StreamingOps.DocRow].collect()
    val stream = MemoryStream[StreamingOps.DocRow]
    val simIdx = graft.ops.IndexStore.channel(spark, out, "sim_blocks")
    val q = StreamingOps.screenIncomingSim(stream.toDF(), simIdx)
      .writeStream.format("memory").queryName("sim_screen")
      .outputMode("append").start()
    stream.addData(incoming.toSeq)
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("sim_screen").select($"doc_id").as[Long].collect().toSet
    val flagged = graft.ops.IndexStore
      .screenBatchSim(spark, out, docs.filter(gate >= 58982))
      .as[Long].collect().toSet
    val want = incoming.map(_.doc_id).toSet -- flagged
    assert(kept == want,
      s"streaming kept ${kept.size}, batch screen implies ${want.size}")
    Core.clearCaches(spark)
  }

  test("ingest-and-maintain: cross-micro-batch twins blocked, store stays write-equivalent") {
    import org.apache.spark.sql.functions.{conv, substring, md5 => smd5}
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val docs = Core.table(spark, dir, "documents")
    val gate = conv(substring(smd5($"doc_id".cast("string")), 1, 4), 16, 10).cast("long")
    val seed = docs.filter(gate < 58982L)
    val idx = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    ops.IndexStore.write(spark, seed, idx)
    ops.IndexStore.writeClusters(spark, seed, idx)
    // micro-batch 1 = q71's incoming slice; micro-batch 2 = EXACT
    // twins of every batch-1 doc under fresh ids. A twin of a KEPT
    // batch-1 doc is only blockable if batch 1 was folded into the
    // store between the two micro-batches — the frozen-index screens
    // above would wave it through.
    val b1 = docs.filter(gate >= 58982L).select($"doc_id", $"text")
      .as[StreamingOps.DocRow].collect().toSeq
    val b2 = b1.map(d => StreamingOps.DocRow(d.doc_id + 1000000L, d.text))
    val decisions = collection.mutable.ArrayBuffer[(Long, String)]()
    val stream = MemoryStream[StreamingOps.DocRow]
    val q = stream.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        decisions ++= StreamingOps.ingestAndMaintain(spark, idx, b.toDF())
          .select($"doc_id", $"decision").as[(Long, String)].collect()
        ()
      }.start()
    Seq(b1, b2).foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    val dec = decisions.toMap
    // batch-1 decisions replay the oracle-checked q71 exactly (same
    // seed store, same screen)
    val batchQ71 = SparkEntry.queries("q71_incremental_dedup")(spark, dir)
      .select($"doc_id", $"decision").as[(Long, String)].collect().toMap
    assert(b1.forall(d => dec(d.doc_id) == batchQ71(d.doc_id)),
      "micro-batch 1 decisions diverged from batch q71")
    // every twin: drop_exact if its original was kept (its fingerprint
    // entered the store via the append), else the original's own
    // verdict (it matches the seed the same way its original did)
    val wrong = b2.filter { d =>
      val orig = dec(d.doc_id - 1000000L)
      dec(d.doc_id) != (if (orig == "keep") "drop_exact" else orig)
    }
    assert(wrong.isEmpty, s"twin decisions wrong for ${wrong.take(5).map(_.doc_id)}")
    assert(b1.exists(d => dec(d.doc_id) == "keep"),
      "fixture degenerate: no batch-1 doc was kept, twin test vacuous")
    // final store ≡ a fresh write over seed ∪ kept batch-1 docs (no
    // twin survives, so batch 2 adds nothing)
    val keptIds = b1.map(_.doc_id).filter(dec(_) == "keep").toSet
    val keptDf = spark.createDataset(b1.filter(d => keptIds(d.doc_id))).toDF()
    val union = seed.select($"doc_id", $"text").unionByName(keptDf)
    val fresh = java.nio.file.Files.createTempDirectory("graft-ingestB").toString
    ops.IndexStore.write(spark, union, fresh)
    ops.IndexStore.writeClusters(spark, union, fresh)
    for (ch <- Seq("band_keys", "fingerprints", "sim_blocks", "cluster_labels")) {
      val a = ops.IndexStore.channel(spark, idx, ch)
      val b = ops.IndexStore.channel(spark, fresh, ch)
      assert(a.unionByName(b).distinct().count() == b.distinct().count() &&
          a.count() == b.count(),
        s"channel $ch diverged after streaming maintenance")
    }
    Core.clearCaches(spark)
  }

  test("streamed ingestAndMaintainVectors ≡ one-shot writeVectors (channels + ANN lookups)") {
    import org.apache.spark.sql.functions.{broadcast => _, _}
    implicit val sqlCtx = spark.sqlContext
    val tiny = "/root/testdata/sf0.001"
    val vecs = ops.Similarity.normalized(spark, tiny)
    val cents = ops.Similarity.ivfCentroids(spark, tiny)
    val gate = conv(substring(md5($"vec_id".cast("string")), 1, 4), 16, 10)
      .cast("long")
    // the store exists BEFORE the stream: writeVectors trains/writes
    // the frozen model; the stream only maintains cells under it
    val streamed = java.nio.file.Files.createTempDirectory("graft-vecstream").toString
    ops.IndexStore.writeVectors(spark, vecs.filter(gate < 32768L), cents, streamed)
    val rows = vecs.filter(gate >= 32768L)
      .as[StreamingOps.VecRow].collect().toSeq
    assert(rows.size >= 4, "fixture degenerate: too few streamed vectors")
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val stream = MemoryStream[StreamingOps.VecRow]
    val q = stream.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        StreamingOps.ingestAndMaintainVectors(spark, streamed, b.toDF())
      }.start()
    Seq(b1, b2).foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    val oneShot = java.nio.file.Files.createTempDirectory("graft-veconeshot").toString
    ops.IndexStore.writeVectors(spark, vecs, cents, oneShot)
    for (ch <- Seq("centroids", "cells")) {
      val a = ops.IndexStore.channel(spark, streamed, ch)
      val b = ops.IndexStore.channel(spark, oneShot, ch)
      assert(a.count() == b.count() && a.except(b).isEmpty && b.except(a).isEmpty,
        s"channel $ch diverged after streamed maintenance")
    }
    val qb = ops.Similarity.queryBatch(spark, tiny, vecs)
    val ra = ops.IndexStore.annFromStore(spark, streamed, qb).collect().toSeq
    val rb = ops.IndexStore.annFromStore(spark, oneShot, qb).collect().toSeq
    assert(ra.nonEmpty && ra == rb, "streamed store ANN diverges from one-shot")
    Core.clearCaches(spark)
  }

  test("streamed ingestAndMaintainUnified ≡ one-shot writeUnified; both families advance together at every version") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // deterministic paired fixture (UnifiedStoreSpec's generators):
    // each id carries a doc AND a vector, so every micro-batch is a
    // matched (docs, vectors) pair
    def docsOf(ids: Seq[Long]) = ids.map { i =>
      (i, s"alpha token$i beta${i % 3} gamma delta${i % 2}")
    }.toDF("doc_id", "text")
    def vecsOf(ids: Seq[Long]) = ids.map { i =>
      val ang = (i % 8) * math.Pi / 4 + 0.1
      (i, (i % 4).toInt, Seq(math.cos(ang), math.sin(ang)))
    }.toDF("vec_id", "label", "unit")
    val cents = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(-1.0, 0.0)), (3L, Seq(0.0, -1.0))).toDF("cid", "cvec")
    def rawOf(ids: Seq[Long]) = ids.map { i =>
      val ang = (i % 8) * math.Pi / 4 + 0.1
      (i, (i % 4).toInt, Seq(math.cos(ang), math.sin(ang)))
    }.toDF("vec_id", "label", "embedding")
    // media payloads per id (byte-twin-free, all fingerprintable):
    // since round 12 the media family rides the same pair-atomic
    // commits, so the streamed loop threads payloads alongside raw
    def paysOf(ids: Seq[Long]) = ids.map { i =>
      (i, s"stream payload body number $i".getBytes("UTF-8"))
    }.toDF("doc_id", "payload")
    val streamed = java.nio.file.Files.createTempDirectory("graft-unistream").toString
    ops.IndexStore.writeUnified(spark,
      docsOf(0L to 5L), vecsOf(0L to 5L), cents, streamed,
      payloads = Some(paysOf(0L to 5L)))
    // the streamed store carries the projected channels too, so every
    // micro-batch exercises the pair-atomic proj maintenance contract
    // (VERDICT r10 #1): the loop threads each batch's raw embeddings
    ops.IndexStore.writeProjections(spark, streamed,
      ops.Similarity.projectedUnitsOf(rawOf((0L to 5L).toSeq), 32),
      ops.Similarity.exactVecsOf(rawOf((0L to 5L).toSeq)))
    val stream = MemoryStream[Long]
    val q = stream.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ids = b.select(col("value")).as[Long].collect().toSeq.sorted
        StreamingOps.ingestAndMaintainUnified(spark, streamed,
          docsOf(ids), vecsOf(ids), raw = Some(rawOf(ids)),
          payloads = Some(paysOf(ids)))
      }.start()
    Seq(6L to 11L, 12L to 17L).foreach { b =>
      stream.addData(b.toSeq); q.processAllAvailable()
    }
    q.stop()
    val oneShot = java.nio.file.Files.createTempDirectory("graft-unioneshot").toString
    ops.IndexStore.writeUnified(spark,
      docsOf(0L to 17L), vecsOf(0L to 17L), cents, oneShot,
      payloads = Some(paysOf(0L to 17L)))
    ops.IndexStore.writeProjections(spark, oneShot,
      ops.Similarity.projectedUnitsOf(rawOf((0L to 17L).toSeq), 32),
      ops.Similarity.exactVecsOf(rawOf((0L to 17L).toSeq)))
    for (ch <- Seq("postings", "doc_lens", "centroids", "cells",
        "proj_units", "exact_vecs", "media_sim_blocks")) {
      val a = ops.IndexStore.channel(spark, streamed, ch)
      val b = ops.IndexStore.channel(spark, oneShot, ch)
      assert(a.count() == b.count() && a.except(b).isEmpty && b.except(a).isEmpty,
        s"channel $ch diverged after streamed unified maintenance")
    }
    // the cross-family atomicity the unified stream exists for: at
    // EVERY committed version both censuses describe the same paired
    // fold — no version where one family moved alone; once the
    // projected channels exist, their coverage census advances in the
    // SAME lockstep (no version where the projected arm lags the IVF
    // arm)
    for (snap <- ops.IndexStore.history(streamed)) {
      val nDocs = ops.IndexStore.channelAt(spark, streamed, snap, "stats")
        .head().getAs[Long]("n_docs")
      val nVecs = ops.IndexStore.channelAt(spark, streamed, snap, "vec_stats")
        .head().getAs[Long]("n_vecs")
      assert(nDocs == nVecs,
        s"version $snap: text census $nDocs != vector census $nVecs — a family moved alone")
      if (ops.IndexStore.manifestAt(streamed, snap).contains("proj_stats")) {
        val nProj = ops.IndexStore.channelAt(spark, streamed, snap, "proj_stats")
          .head().getAs[Long]("n_vecs")
        assert(nProj == nVecs,
          s"version $snap: projected census $nProj != vector census $nVecs — the projected arm lagged")
      }
      // media lockstep: every doc of this fixture carries a
      // fingerprintable payload, so the media family's distinct ids
      // must equal the text census at EVERY committed version
      val nMedia = ops.IndexStore.channelAt(spark, streamed, snap, "media_sim_blocks")
        .select(col("doc_id")).distinct().count()
      assert(nMedia == nDocs,
        s"version $snap: media coverage $nMedia != text census $nDocs — the media family lagged")
    }
    // exact THREE-family redelivery (at-least-once restart) is an
    // idempotent skip
    val h = ops.IndexStore.history(streamed)
    StreamingOps.ingestAndMaintainUnified(spark, streamed,
      docsOf(12L to 17L), vecsOf(12L to 17L), raw = Some(rawOf(12L to 17L)),
      payloads = Some(paysOf(12L to 17L)))
    assert(ops.IndexStore.history(streamed) == h,
      "redelivered pair must not publish a new version")
    Core.clearCaches(spark)
  }

  test("streamed governed unified loop: the breaker holds a drifting tick (publishing NOTHING) and admits its recovery") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    def gdocs(rows: Seq[(Long, String, Long)]) = rows.map { case (i, src, sh) =>
      (i, s"alpha token$i beta${i % 3} gamma delta${i % 2}",
        src, 120L + (i % 3) * 40 + sh)
    }.toDF("doc_id", "text", "source", "n_chars")
    def vecsOf(ids: Seq[Long]) = ids.map { i =>
      val ang = (i % 8) * math.Pi / 4 + 0.1
      (i, (i % 4).toInt, Seq(math.cos(ang), math.sin(ang)))
    }.toDF("vec_id", "label", "unit")
    val cents = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(-1.0, 0.0)), (3L, Seq(0.0, -1.0))).toDF("cid", "cvec")
    def paysOf(ids: Seq[Long]) = ids.map { i =>
      (i, s"governed stream payload number $i".getBytes("UTF-8"))
    }.toDF("doc_id", "payload")
    val root = java.nio.file.Files.createTempDirectory("graft-unigov").toString
    ops.IndexStore.writeUnified(spark,
      gdocs((0L to 39L).map((_, "src0", 0L)) ++ (40L to 59L).map((_, "srcA", 0L))),
      vecsOf(0L to 59L), cents, root, governed = true,
      payloads = Some(paysOf(0L to 59L)))
    val reports = scala.collection.mutable.ListBuffer.empty[(String, Boolean)]
    val stream = MemoryStream[(Long, String, Long)]
    val q = stream.toDS().writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[(Long, String, Long)], _: Long) =>
        val rows = b.collect().toSeq.sortBy(_._1)
        val rep = StreamingOps.ingestAndMaintainUnifiedGoverned(spark, root,
          gdocs(rows), vecsOf(rows.map(_._1)), "src0",
          payloads = Some(paysOf(rows.map(_._1))))
        reports ++= rep.select($"source", $"held").as[(String, Boolean)].collect()
        ()
      }.start()
    // tick 1: a clean source folds
    stream.addData((60L to 79L).map((_, "srcB", 0L))); q.processAllAvailable()
    val hAfterClean = ops.IndexStore.history(root)
    // tick 2: a fully-drifted tick (+480 chars, five bins right) — the
    // breaker must hold the WHOLE tick and publish no version at all
    stream.addData((80L to 99L).map((_, "srcRot", 480L))); q.processAllAvailable()
    assert(ops.IndexStore.history(root) == hAfterClean,
      "a fully-held tick must not publish a version")
    // tick 3: the same upstream recovers at normal lengths — same ids
    // (they were never folded, so nothing replays)
    stream.addData((80L to 99L).map((_, "srcRot", 0L))); q.processAllAvailable()
    q.stop()
    assert(reports.toList == List(
      ("srcB", false), ("srcRot", true), ("srcRot", false)),
      s"unexpected gate reports: $reports")
    val lens = ops.IndexStore.channel(spark, root, "doc_lens")
      .select($"doc_id").as[Long].collect().toSet
    val cells = ops.IndexStore.channel(spark, root, "cells")
      .select($"vec_id").as[Long].collect().toSet
    assert((60L to 99L).forall(lens) && (60L to 99L).forall(cells),
      "clean + recovered ticks must fold BOTH families")
    // the media family moves in the same lockstep: payloads landed for
    // exactly the folded docs — the held tick's fingerprints included
    // nothing (it published no version at all)
    val mediaIds = ops.IndexStore.channel(spark, root, "media_sim_blocks")
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(mediaIds == lens,
      s"media coverage diverged from doc membership: " +
        s"missing=${(lens -- mediaIds).take(5)} extra=${(mediaIds -- lens).take(5)}")
    assert(ops.IndexStore.channel(spark, root, "mix_census")
      .select($"source").distinct().as[String].collect().toSet ==
      Set("src0", "srcA", "srcB", "srcRot"),
      "census must carry exactly the folded sources")
  }

  test("streaming quality gate applies the snapshot thresholds exactly (≡ batch keep set)") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val thresholds = ops.Hygiene.qualityThresholds(spark, dir)
    val docs = Core.table(spark, dir, "documents")
      .select($"doc_id", $"text", $"source")
    val rows = docs.as[(Long, String, String)].collect().toSeq
    val stream = MemoryStream[(Long, String, String)]
    val gated = StreamingOps.gateIncoming(
      stream.toDF().toDF("doc_id", "text", "source"), thresholds)
    val q = gated.writeStream.format("memory").queryName("qgate")
      .outputMode(OutputMode.Append).start()
    val (b1, b2) = rows.splitAt(rows.size / 2)
    Seq(b1, b2).foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    val streamKept = spark.table("qgate").select("doc_id").as[Long].collect().toSet
    // batch reference: same thresholds applied to the same docs
    val batchKept = docs
      .withColumn("q", ops.TextOps.qualityScore(lower($"text")))
      .join(thresholds, Seq("source"))
      .filter($"q" >= $"cut_score")
      .select("doc_id").as[Long].collect().toSet
    assert(streamKept == batchKept && streamKept.nonEmpty,
      s"stream kept ${streamKept.size}, batch kept ${batchKept.size}")
    // and the keep set is exactly q110's per-source top-30% population
    val n110 = SparkEntry.queries("q110_adaptive_quality_gate")(spark, dir)
      .agg(sum($"n_kept")).as[Long].head()
    assert(streamKept.size >= n110,
      "gate must admit at least the snapshot's own keep population (ties included)")
  }

  test("governed unified stream past maxSnapshots with in-loop VACUUM: reads bit-identical across the reclaim, dropped versions refuse by name (VERDICT r14 next #6)") {
    import org.apache.spark.sql.functions._
    def gdocs(ids: Seq[Long], src: String) = ids.map { i =>
      (i, s"alpha token$i beta${i % 3} gamma delta${i % 2}",
        src, 120L + (i % 3) * 40)
    }.toDF("doc_id", "text", "source", "n_chars")
    def vecsOf(ids: Seq[Long]) = ids.map { i =>
      val ang = (i % 8) * math.Pi / 4 + 0.1
      (i, (i % 4).toInt, Seq(math.cos(ang), math.sin(ang)))
    }.toDF("vec_id", "label", "unit")
    val cents = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(-1.0, 0.0)), (3L, Seq(0.0, -1.0))).toDF("cid", "cvec")
    def paysOf(ids: Seq[Long]) = ids.map { i =>
      (i, s"vacuumed stream payload number $i".getBytes("UTF-8"))
    }.toDF("doc_id", "payload")
    val root = java.nio.file.Files.createTempDirectory("graft-univac").toString
    ops.IndexStore.writeUnified(spark, gdocs(0L to 19L, "src0"),
      vecsOf(0L to 19L), cents, root, governed = true,
      payloads = Some(paysOf(0L to 19L)))
    // tiny gates so the 4th referenced snapshot trips the in-loop
    // compaction, and the vacuum reclaims IMMEDIATELY with retain=2
    spark.conf.set("graft.store.maxSnapshots", "3")
    spark.conf.set("graft.store.vacuumOnCompact", "true")
    spark.conf.set("graft.store.vacuumRetain", "2")
    try {
      // 8 ticks: reclaim needs TWO in-loop compactions — the first
      // compact's vacuum retains a pre-compact manifest whose paths
      // still reach every old snapshot (reachability is structural),
      // so only the second compact orphans the early history
      val nTicks = 8
      val preHist = scala.collection.mutable.ListBuffer.empty[String]
      for (t <- 0 until nTicks) {
        val ids = (20L + t * 10L) to (29L + t * 10L)
        preHist ++= ops.IndexStore.history(root)
        StreamingOps.ingestAndMaintainUnifiedGoverned(spark, root,
          gdocs(ids, s"src${t % 3}"), vecsOf(ids), "src0",
          maxPsi = 5.0, payloads = Some(paysOf(ids)))
      }
      val live = ops.IndexStore.history(root).toSet
      val dropped = preHist.toSet -- live
      assert(dropped.nonEmpty,
        "fixture degenerate: the loop never triggered a compact+vacuum " +
          "(no version was reclaimed) — nothing under test ran")
      // every read over the reclaimed store is bit-identical to the
      // session recompute over everything the loop folded
      val all = gdocs(0L to 19L, "src0")
        .unionByName((0 until nTicks).map(t => gdocs(
          (20L + t * 10L) to (29L + t * 10L), s"src${t % 3}"))
          .reduce(_ unionByName _))
      assert(ops.IndexStore.driftFromStore(spark, root, "src0")
          .collect().toSeq ==
        ops.Selection.psiBySource(all, "src0").collect().toSeq,
        "post-vacuum drift diverged from the session recompute")
      // the doc/vector/media families survived the reclaim intact
      val expectIds = (0L until (20L + nTicks * 10L)).toSet
      val lens = ops.IndexStore.channel(spark, root, "doc_lens")
        .select($"doc_id").as[Long].collect().toSet
      assert(lens == expectIds, s"doc membership lost rows: ${lens.size}")
      val mediaIds = ops.IndexStore.channel(spark, root, "media_sim_blocks")
        .select($"doc_id").distinct().as[Long].collect().toSet
      assert(mediaIds == lens, "media coverage diverged across the reclaim")
      val (nPay, nBlk) = {
        val r = ops.IndexStore.channel(spark, root, "media_stats").head()
        (r.getAs[Long]("n_payloads"), r.getAs[Long]("n_blocks"))
      }
      assert(nPay == expectIds.size && nBlk == 4L * expectIds.size,
        s"media census diverged across the reclaim: $nPay/$nBlk")
      // the timeline only references LIVE versions, and a vacuumed
      // version refuses BY NAME — never a misread
      val tl = ops.IndexStore.describeStoreTimeline(spark, root)
        .select($"version").distinct().as[String].collect().toSet
      assert(tl.subsetOf(live), s"timeline references reclaimed versions: ${tl -- live}")
      val gone = dropped.head
      val e = intercept[IllegalStateException] {
        ops.IndexStore.channelAt(spark, root, gone, "mix_census").collect()
      }
      assert(e.getMessage.contains(gone),
        s"a reclaimed version must refuse by name: ${e.getMessage}")
    } finally {
      spark.conf.unset("graft.store.maxSnapshots")
      spark.conf.unset("graft.store.vacuumOnCompact")
      spark.conf.unset("graft.store.vacuumRetain")
    }
  }
}
