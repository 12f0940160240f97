package graft

import org.apache.spark.sql.functions._

/** Old-store/new-reader contract over the FROZEN r12-written store in
  * test resources (VERDICT r12 next #7): the versioned manifest
  * refuses unknown FORMATS loudly, but nothing previously pinned that
  * a store written by the PRIOR build keeps being readable by this
  * one for every channel family the prior build knew — and that the
  * one legitimate generational refusal (the census, which gained a
  * marginal in round 13) fires BY NAME at both read and fold time
  * instead of corrupting or silently emptying anything.
  *
  * The fixture is regenerated only by `graft.FreezeStoreFixture` and
  * only when the layout legitimately changes — see its scaladoc.
  */
class StoreCompatSpec extends SparkSpec {
  import spark.implicits._

  private def freshCopy(dir: String = FreezeStoreFixture.FixtureDir)
      : String = {
    val src = java.nio.file.Paths.get(dir)
    assert(java.nio.file.Files.exists(src),
      s"frozen fixture missing at $src — run " +
        "`sbt \"Test/runMain graft.FreezeStoreFixture\"` once")
    val dst = java.nio.file.Files.createTempDirectory("graft-compat")
    java.nio.file.Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    }
    dst.toString
  }

  test("every channel family the r12 build knew reads from the frozen store; both retrieval routes serve") {
    val root = freshCopy()
    assert(ops.IndexStore.history(root).size == 2,
      "frozen fixture must carry its 2-version history")
    // channel-family census: every family the r12 unified store could
    // hold must read non-empty through this build's resolver
    val expected = Seq("postings", "doc_lens", "stats", "centroids",
      "cells", "vec_stats", "mix_census", "media_sim_blocks",
      "proj_units", "exact_vecs", "proj_stats")
    for (ch <- expected) {
      val n = ops.IndexStore.channel(spark, root, ch).count()
      assert(n > 0, s"channel $ch read empty from the r12-written store")
    }
    // the prior build's census is THREE-marginal by construction —
    // this is what makes the fixture an r12 store and the refusals
    // below generational, not synthetic
    assert(ops.IndexStore.channel(spark, root, "mix_census")
      .select($"feature").distinct().as[String].collect().toSet ==
      Set("n_chars", "n_tokens", "nonalpha"),
      "fixture degenerate: census must be the r12 three-marginal shape")
    // serving reads: lexical, semantic and media routes all answer
    val lex = ops.IndexStore.bm25FromStore(spark, root, Seq("beta", "delta"))
      .orderBy($"doc_id").collect()
    assert(lex.nonEmpty, "BM25 lookup served nothing from the frozen store")
    val ann = ops.IndexStore.annFromStore(spark, root,
      FreezeStoreFixture.vecsOf(spark, 0 to 0).select($"vec_id", $"unit"),
      nprobe = 2, k = 3).collect()
    assert(ann.nonEmpty, "ANN lookup served nothing from the frozen store")
    ops.IndexStore.mediaPairsFromStore(spark, root).collect() // must run
    // the serving publish still works over the old layout
    val srv = java.nio.file.Files.createTempDirectory("graft-compat-srv").toString
    ops.IndexStore.cloneStoreAt(spark, root,
      ops.IndexStore.history(root).last, srv)
    assert(ops.IndexStore.bm25FromStore(spark, srv, Seq("beta", "delta"))
      .orderBy($"doc_id").collect().toSeq == lex.toSeq,
      "the clone of the r12 store diverged from the source reads")
  }

  test("the census generational refusals fire BY NAME on the frozen store: drift read refused, governed docs-fold refused, vectors-only catch-up still legal") {
    val root = freshCopy()
    // read side: the four-marginal drift arithmetic must refuse the
    // three-marginal census by name, never NULL-psi or silently skew
    val e1 = intercept[Exception] {
      ops.IndexStore.driftFromStore(spark, root, "src0").collect()
    }
    def msg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(msg(e1).contains("older build"),
      s"expected the generational drift refusal, got: ${msg(e1)}")
    // fold side: a governed docs-carrying fold would commit a
    // mixed-generation census — refused at fold time, store untouched
    val h0 = ops.IndexStore.history(root)
    val e2 = intercept[Exception] {
      ops.IndexStore.appendUnified(spark, root,
        FreezeStoreFixture.docsOf(spark, 20 to 23),
        FreezeStoreFixture.vecsOf(spark, 20 to 23),
        raw = Some(FreezeStoreFixture.rawOf(spark, 20 to 23)))
    }
    assert(msg(e2).contains("older build"),
      s"expected the fold-time census refusal, got: ${msg(e2)}")
    assert(ops.IndexStore.history(root) == h0,
      "the refused fold must leave the old store's history untouched")
    // a VECTORS-ONLY catch-up never touches the doc-mix census, so it
    // stays legal on the old store — generational refusal is scoped to
    // exactly the channel that changed
    ops.IndexStore.appendUnified(spark, root,
      FreezeStoreFixture.docsOf(spark, 0 until 0),
      FreezeStoreFixture.vecsOf(spark, 20 to 23),
      raw = Some(FreezeStoreFixture.rawOf(spark, 20 to 23)))
    assert(ops.IndexStore.history(root).size == h0.size + 1,
      "the vectors-only catch-up must commit on the r12-written store")
  }

  test("the r13-written frozen store is the PRIMARY read contract: every channel serves, drift reads, a governed docs-fold commits (VERDICT r13 next #2)") {
    val root = freshCopy(FreezeStoreFixture.FixtureDirR13)
    assert(ops.IndexStore.history(root).size == 2,
      "frozen r13 fixture must carry its 2-version history")
    val expected = Seq("postings", "doc_lens", "stats", "centroids",
      "cells", "vec_stats", "mix_census", "media_sim_blocks",
      "proj_units", "exact_vecs", "proj_stats")
    for (ch <- expected) {
      val n = ops.IndexStore.channel(spark, root, ch).count()
      assert(n > 0, s"channel $ch read empty from the r13-written store")
    }
    // the census is the r13 FOUR-marginal shape — this is what makes
    // the fixture an r13 store and the reads below current-generation
    assert(ops.IndexStore.channel(spark, root, "mix_census")
      .select($"feature").distinct().as[String].collect().toSet ==
      Set("n_chars", "n_tokens", "nonalpha", "tokhash"),
      "fixture degenerate: census must be the r13 four-marginal shape")
    // serving reads: lexical, semantic and media routes all answer
    val lex = ops.IndexStore.bm25FromStore(spark, root, Seq("beta", "delta"))
      .orderBy($"doc_id").collect()
    assert(lex.nonEmpty, "BM25 lookup served nothing from the r13 store")
    assert(ops.IndexStore.annFromStore(spark, root,
      FreezeStoreFixture.vecsOf(spark, 0 to 0).select($"vec_id", $"unit"),
      nprobe = 2, k = 3).collect().nonEmpty,
      "ANN lookup served nothing from the r13 store")
    ops.IndexStore.mediaPairsFromStore(spark, root).collect() // must run
    // UNLIKE the r12 generation, the four-marginal census is this
    // build's format: the drift read and a governed docs-carrying fold
    // must both WORK, not refuse
    assert(ops.IndexStore.driftFromStore(spark, root, "src0")
      .collect().nonEmpty,
      "drift read must serve from the r13 four-marginal census")
    val h0 = ops.IndexStore.history(root)
    ops.IndexStore.appendUnified(spark, root,
      FreezeStoreFixture.docsOf(spark, 20 to 23),
      FreezeStoreFixture.vecsOf(spark, 20 to 23),
      raw = Some(FreezeStoreFixture.rawOf(spark, 20 to 23)))
    assert(ops.IndexStore.history(root).size == h0.size + 1,
      "a governed docs-fold must commit on the r13-written store")
    assert(ops.IndexStore.driftFromStore(spark, root, "src0")
      .collect().nonEmpty,
      "drift must still read after the fold extended the census")
    // the serving publish works over the frozen layout
    val srv = java.nio.file.Files.createTempDirectory("graft-compat13").toString
    ops.IndexStore.cloneStoreAt(spark, root,
      ops.IndexStore.history(root).last, srv)
    assert(ops.IndexStore.bm25FromStore(spark, srv, Seq("beta", "delta"))
      .orderBy($"doc_id").collect().nonEmpty,
      "the clone of the r13 store served nothing")
  }
}
