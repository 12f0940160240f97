package graft

/** Value-level invariants for the training-set assembly operators
  * (ops.Training). The DuckDB oracle already pins exact outputs; these
  * pin the *semantics* the numbers encode — packing conservation,
  * shard permutation density — so a refactor can't satisfy the oracle
  * by accident while breaking the contract. */
class TrainingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q70 chunk+pack: chunks cover each doc exactly; offsets stay within capacity") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q70_chunk_pack")(spark, dir)
    val docs = Core.table(spark, dir, "documents")
      .select($"doc_id", length($"text").as("len"))
    // conservation: per-doc chunk lengths sum to the doc length
    val bad = out.groupBy($"doc_id").agg(sum($"clen").as("covered"))
      .join(docs, "doc_id").filter($"covered" =!= $"len").count()
    assert(bad == 0, s"$bad docs not exactly covered by their chunks")
    // every offset is a valid in-sequence position
    assert(out.filter($"seq_off" < 0 || $"seq_off" >= 512).count() == 0)
    // chunk size bound: every chunk is 1..64 chars
    assert(out.filter($"clen" < 1 || $"clen" > 64).count() == 0)
    // packing is gapless within a bucket: consecutive chunks' global
    // offsets (seq_id*512 + seq_off) advance by exactly clen
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"bucket").orderBy($"doc_id", $"chunk_idx")
    val gaps = out
      .withColumn("goff", $"seq_id" * 512 + $"seq_off")
      .withColumn("nxt", lead($"goff", 1).over(w))
      .filter($"nxt".isNotNull && $"nxt" =!= $"goff" + $"clen")
      .count()
    assert(gaps == 0, s"$gaps gaps/overlaps in the packed stream")
  }

  test("q124 BPE merges: top pair by count, greedy leftmost replacement, hand-traced") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{length => slen, lit}
    val tmp = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Seq(1L -> "a a a b c a a", 2L -> "a a b c b c").toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", slen($"text").cast("long"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$tmp/documents.parquet")
    Core.clearCaches(spark)
    // round 1: (a,a) wins 4 > (b,c) 3; greedy "a a a" → [aa, a]
    // round 2: (b,c) wins 3; both doc-2 occurrences merge
    val got = SparkEntry.queries("q124_bpe_merge_apply")(spark, tmp)
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 0L, "aa"), (1L, 1L, "a"), (1L, 2L, "bc"), (1L, 3L, "aa"),
      (2L, 0L, "aa"), (2L, 1L, "bc"), (2L, 2L, "bc")))
    Core.clearCaches(spark)
  }

  test("q122 curriculum: stages are quality-ordered thirds, dense hash-shuffled positions within") {
    import spark.implicits._
    Core.clearCaches(spark)
    val rows = SparkEntry.queries("q122_curriculum_order")(spark, dir)
      .as[(Long, Int, Int)].collect()
    val byStage = rows.groupBy(_._2)
    assert(byStage.keySet == Set(1, 2, 3))
    val sizes = byStage.view.mapValues(_.length).toMap
    assert(sizes.values.max - sizes.values.min <= 1, s"uneven stages: $sizes")
    // positions dense 1..n within each stage, every doc exactly once
    byStage.foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length)) }
    assert(rows.map(_._1).distinct.length == rows.length)
    // the stage cut respects the quality order: every stage-1 doc
    // scores >= every stage-2 doc, etc. (ties may touch, never cross)
    val score = SparkEntry.queries("q41_quality_score")(spark, dir)
      .select($"doc_id", $"quality_score").as[(Long, Double)].collect().toMap
    def scores(st: Int) = byStage(st).map(r => score(r._1))
    assert(scores(1).min >= scores(2).max && scores(2).min >= scores(3).max)
    Core.clearCaches(spark)
  }

  test("q73 shard shuffle: dense 1..n positions per shard, all docs exactly once") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q73_corpus_shard")(spark, dir)
    val n = Core.table(spark, dir, "documents").count()
    assert(out.count() == n && out.select($"doc_id").distinct().count() == n)
    // positions within each shard are exactly 1..shard_size
    val holes = out.groupBy($"shard")
      .agg(count(lit(1)).as("sz"), min($"pos").as("mn"), max($"pos").as("mx"),
        countDistinct($"pos").as("nd"))
      .filter($"mn" =!= 1 || $"mx" =!= $"sz" || $"nd" =!= $"sz")
      .count()
    assert(holes == 0, "shard positions are not a dense permutation")
  }

  test("q69 BPE pair stats: counts match a per-doc recount on a sample") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q69_bpe_pair_stats")(spark, dir)
      .as[(String, Long)].collect()
    assert(out.length == 50 && out.sliding(2).forall(p => p(0)._2 >= p(1)._2))
    // independent recount of the top pair via a substring scan
    val (topPair, topN) = out.head
    val df = Core.table(spark, dir, "documents")
    val recount = df.select(split(lower($"text"), " ").as("ws"))
      .as[Seq[String]].collect()
      .map(ws => ws.sliding(2).count(p => p.length == 2 && s"${p(0)} ${p(1)}" == topPair))
      .sum
    assert(recount.toLong == topN, s"top pair '$topPair': catalog=$topN recount=$recount")
  }

  test("q82 epoch upsample: dense 0..r-1 epochs per doc, r within [1,4], rare sources replay more") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q82_epoch_upsample")(spark, dir)
    // per doc: epochs are exactly 0..r-1 (dense, no gaps or repeats)
    val perDoc = out.groupBy($"doc_id")
      .agg(count(lit(1)).as("r"), min($"epoch").as("lo"), max($"epoch").as("hi"),
        countDistinct($"epoch").as("d"))
    assert(perDoc.filter($"lo" =!= 0 || $"hi" =!= $"r" - 1 || $"d" =!= $"r").count() == 0)
    assert(perDoc.filter($"r" < 1 || $"r" > 4).count() == 0)
    // every doc appears; r is constant within a source
    val docs = Core.table(spark, dir, "documents")
    assert(perDoc.count() == docs.count())
    val bySrc = out.groupBy($"source", $"doc_id").agg(count(lit(1)).as("r"))
      .groupBy($"source").agg(countDistinct($"r").as("nr"), max($"r").as("r"))
    assert(bySrc.filter($"nr" =!= 1).count() == 0, "repeat factor varies within a source")
    // monotone: a source with FEWER chars never gets a SMALLER repeat factor
    val rs = bySrc.join(docs.groupBy($"source").agg(sum($"n_chars").as("c")), "source")
      .select($"c", $"r").as[(Long, Long)].collect().sortBy(_._1)
    rs.zip(rs.tail).foreach { case ((_, rLo), (_, rHi)) =>
      assert(rLo >= rHi, "rarer source got fewer epochs")
    }
  }

  test("q83 token windows: spans inside bounds, overlap conservation, dense window ids") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q83_token_windows")(spark, dir).cache()
    // every window's token span sits inside [16w, 16w+32); counts in 1..32
    val bad = out.filter($"n_tok" < 1 || $"n_tok" > 32 ||
      $"first_i" < $"win_id" * 16 || $"last_i" >= $"win_id" * 16 + 32 ||
      ($"full" === 1) =!= ($"n_tok" === 32)).count()
    assert(bad == 0)
    // stride-overlap conservation: tokens 0..15 belong to one window,
    // all others to exactly two — Σ n_tok = 2n − min(n, 16) per doc
    val tokCounts = graft.ops.TextOps.catalog("q78_token_ids").fn(spark, dir)
      .groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val cons = out.groupBy($"doc_id").agg(sum($"n_tok").as("s"),
        count(lit(1)).as("nwin"), max($"win_id").as("wmax"), min($"win_id").as("wmin"))
      .join(tokCounts, "doc_id")
      .filter($"s" =!= lit(2) * $"n" - least($"n", lit(16)) ||
        $"wmin" =!= 0 || $"nwin" =!= $"wmax" + 1)
      .count()
    assert(cons == 0, "window membership lost or duplicated tokens")
    out.unpersist()
  }

  test("q124 BPE on a corpus with no adjacent pairs passes tokens through unmerged") {
    // degenerate guard: every doc has exactly one token, so no merge
    // pair exists — the loop must stop and return the unmerged stream
    // (the oracle's LEFT-JOIN formulation), not cross-join it to zero
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    val tmp = java.nio.file.Files.createTempDirectory("graft-bpe1").toString
    Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q124_bpe_merge_apply")(spark, tmp)
      .as[(Long, Long, String)].collect().toSet
    assert(out == Set((1L, 0L, "alpha"), (2L, 0L, "beta"), (3L, 0L, "gamma")),
      s"degenerate corpus must pass through unmerged: got $out")
  }
}
