package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties (SURVEY.md §5.2(3)): algebraic laws the
  * operators must satisfy on arbitrary inputs — rows include nulls,
  * empty strings, and unicode (the reference handles non-ASCII data,
  * unified_code.py:350). Generators are kept small: each property
  * round-trips through real Spark jobs. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Drive a Gen deterministically (fixed seed base, 10 cases) — the
    * scalatest-scalacheck bridge isn't on the offline classpath. */
  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    (0 until 10).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private val word = Gen.oneOf("the", "a", "spark", "столбец", "流", "x1", "", "join")
  private val text: Gen[String] = Gen.chooseNum(0, 12)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val texts: Gen[List[String]] = Gen.chooseNum(1, 12).flatMap(Gen.listOfN(_, text))

  test("census token marginal: hash-per-distinct ≡ hash-per-occurrence on arbitrary corpora (round-13 restructure)") {
    // the md5-per-distinct-(source, token) census must equal the naive
    // per-token-occurrence recompute on ANY corpus — binning then
    // counting ≡ counting then binning-and-summing. Drives unicode,
    // empties and duplicate tokens through both spellings.
    import org.apache.spark.sql.functions._
    forAll(texts) { ts =>
      val docs = ts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, s"src${i % 3}", (20 + i * 7).toLong)
      }.toDF("doc_id", "text", "source", "n_chars")
      val got = ops.Selection.censusBins(docs)
        .orderBy($"source", $"feature", $"bin")
        .collect().toSeq
      // naive reference: one row per token occurrence, binned eagerly
      val naiveTok = docs.select($"source",
          explode(expr("filter(split(lower(text), ' '), t -> length(t) > 0)"))
            .as("tok"))
        .select($"source", lit("tokhash").as("feature"),
          (conv(substring(md5($"tok"), 1, 4), 16, 10).cast("long")
            % ops.Selection.TokhashBins).as("bin"))
        .groupBy($"source", $"feature", $"bin").agg(count(lit(1)).as("n"))
      val gotTok = ops.Selection.censusBins(docs)
        .filter($"feature" === "tokhash" && $"bin" >= 0)
        .orderBy($"source", $"bin").collect().toSeq
      assert(gotTok == naiveTok.orderBy($"source", $"bin").collect().toSeq,
        s"vocab-agg census diverged from the per-occurrence recompute")
      // coverage rows account for every doc, per source
      val cov = got.filter(r => r.getString(1) == "tokhash" && r.getLong(2) == -1L)
        .map(r => r.getString(0) -> r.getLong(3)).toMap
      val perSrc = docs.groupBy($"source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(cov == perSrc, s"coverage rows $cov != doc counts $perSrc")
    }
  }

  test("census-fusion invariant: censusBins(batch) minus held sources ≡ censusBins(batch minus held sources) (VERDICT r15 #4)") {
    // the gated fold's census fusion (appendUnifiedGated computes
    // censusBins ONCE; the fold writes gate-bins-minus-held as its
    // mix_census delta) rests on exactly this: bins are per-source
    // additive and holds are whole-source, so filtering the AGGREGATED
    // bins equals aggregating the filtered batch — on ANY corpus,
    // including sub-evidence-floor and empty-after-hold sources. A
    // future per-doc screen on the unified path would break this law
    // and must then stop reusing the gate's bins (the dedup family's
    // screen already censuses its own kept frame for this reason).
    import org.apache.spark.sql.functions._
    forAll(Gen.zip(texts, Gen.chooseNum(0, 4))) { case (ts, nHeld) =>
      val docs = ts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, s"src${i % 4}", (20 + i * 7).toLong)
      }.toDF("doc_id", "text", "source", "n_chars")
      val held = (0 until nHeld).map(j => s"src$j")
      def drop(df: org.apache.spark.sql.DataFrame) =
        if (held.isEmpty) df else df.filter(!$"source".isin(held: _*))
      val fromFull = drop(ops.Selection.censusBins(docs))
        .orderBy($"source", $"feature", $"bin").collect().toSeq
      val fromFiltered = ops.Selection.censusBins(drop(docs))
        .orderBy($"source", $"feature", $"bin").collect().toSeq
      assert(fromFull == fromFiltered,
        s"held=$held: filtered-bins ${fromFull.size} rows diverge from " +
          s"bins-of-filtered ${fromFiltered.size} rows")
    }
  }

  test("dedup idempotence: dedup(dedup(x)) == dedup(x)") {
    forAll(texts) { ts =>
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = df.dropDuplicates(Seq("text"))
      val twice = once.dropDuplicates(Seq("text"))
      assert(once.count() == twice.count())
      assert(once.select("text").except(twice.select("text")).isEmpty)
    }
  }

  test("union count: |a union all b| == |a| + |b|") {
    forAll(Gen.zip(texts, texts)) { case ((a, b)) =>
      val da = a.toDF("t"); val db = b.toDF("t")
      assert(da.unionAll(db).count() == da.count() + db.count())
    }
  }

  test("sort permutation invariance: sorted output independent of input order") {
    forAll(texts) { ts =>
      val asc = ts.toDF("t").orderBy($"t").as[String].collect().toSeq
      val rev = ts.reverse.toDF("t").orderBy($"t").as[String].collect().toSeq
      assert(asc == rev)
      assert(asc.sorted == asc)
    }
  }

  test("rolling hash: deterministic and prefix-sensitive") {
    graft.functions.RollingHash.register(spark)
    forAll(texts) { ts =>
      val df = ts.toDF("t")
        .select(graft.functions.RollingHash.rolling_hash($"t").as("h"), $"t")
      val rows = df.collect().map(r => r.getString(1) -> r.getLong(0))
      // same string → same hash (functional purity across partitions)
      rows.groupBy(_._1).foreach { case (_, hs) => assert(hs.map(_._2).distinct.length == 1) }
    }
  }

  test("word shingles: count law |shingles| <= max(0, words - n + 1), and subset monotone") {
    graft.functions.WordShingles.register(spark)
    forAll(text) { t =>
      val n = t.split(" ", -1).length
      val sh = Seq(t).toDF("t")
        .select(graft.functions.WordShingles.word_shingles($"t", 3).as("s"))
        .as[Seq[String]].head()
      assert(sh.length <= math.max(0, n - 2))
      assert(sh.distinct.length == sh.length)
      // every shingle is 3 words drawn from the text in order
      sh.foreach(s => assert(s.split(" ", -1).length >= 3 || t.contains(s)))
    }
  }

  test("connected components agree with a union-find reference on random graphs") {
    val graphGen = for {
      n <- Gen.chooseNum(1, 15)
      m <- Gen.chooseNum(0, 12)
      edges <- Gen.listOfN(m, Gen.zip(Gen.chooseNum(0, n - 1), Gen.chooseNum(0, n - 1)))
    } yield (n, edges.filter { case (a, b) => a != b })
    forAll(graphGen) { case ((n, edges)) =>
      // union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(i => i.toLong -> {
        // canonical label = min of component = root under min-union
        find(i).toLong
      }).toMap
      val nodes = (0 until n).map(_.toLong).toDF("doc_id")
      val es = if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
        else edges.map { case (a, b) => (a.toLong, b.toLong) }.toDF("id_a", "id_b")
      val got = ops.Dedup.connectedComponents(nodes, es)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"n=$n edges=$edges")
    }
  }

  test("minhash containment: adding shingles never raises any per-permutation minimum") {
    val P = 4294967311L
    def mh(ws: Set[String], i: Int): Long = {
      val a = (1103515245L * (i + 1) + 12345L) % 2147483647L
      val b = (69069L * (i + 1) + 7L) % 2147483647L
      if (ws.isEmpty) Long.MaxValue
      else ws.map { w =>
        val h = java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5").digest(w.getBytes("UTF-8"))
            .take(4).map("%02x".format(_)).mkString, 16)
        (a * h + b) % P
      }.min
    }
    forAll(Gen.zip(texts, texts)) { case ((a, b)) =>
      val wa = a.flatMap(_.split(" ")).filter(_.nonEmpty).toSet
      val wboth = wa ++ b.flatMap(_.split(" ")).filter(_.nonEmpty).toSet
      (0 until 8).foreach(i => assert(mh(wboth, i) <= mh(wa, i)))
    }
  }

  test("MinHashSigs: codegen output equals brute-force on arbitrary unicode texts") {
    import org.apache.spark.sql.functions._
    graft.functions.WordShingles.register(spark)
    graft.functions.MinHashSigs.register(spark)
    val MH = graft.functions.MinHashSigs
    def brute(text: String): Option[Seq[Long]] = {
      // -1 keeps trailing empty tokens, matching Spark's split semantics
      val ws = text.toLowerCase.split(" ", -1)
      val sh = ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq.distinct
      if (sh.isEmpty) None
      else Some((0 until MH.NumHashes).map { i =>
        sh.map { w =>
          val d = java.security.MessageDigest.getInstance("MD5").digest(w.getBytes("UTF-8"))
          val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          (MH.A(i) * h + MH.B(i)) % MH.P
        }.min
      })
    }
    forAll(texts) { ts =>
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        .withColumn("shg", graft.functions.WordShingles.word_shingles(lower($"text"), 3))
        .filter(size($"shg") > 0)
        .select($"doc_id", MH.minhash_sigs($"shg").as("sigs"))
      val got = df.as[(Long, Seq[Long])].collect().toMap
      val expect = ts.zipWithIndex
        .flatMap { case (t, i) => brute(t).map(i.toLong -> _) }.toMap
      assert(got == expect, s"minhash mismatch on ${ts.take(3)}…")
    }
  }

  test("sorted_intersect_count: codegen merge walk equals Set.intersect on arbitrary id sets") {
    graft.functions.SortedIntersectCount.register(spark)
    val idSet: Gen[List[Long]] = Gen.chooseNum(0, 40)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-50L, 50L)))
    forAll(Gen.zip(idSet, idSet)) { case (a, b) =>
      val sa = a.distinct.sorted; val sb = b.distinct.sorted
      val expect = sa.toSet.intersect(sb.toSet).size
      val got = Seq((sa.toArray, sb.toArray)).toDF("a", "b")
        .selectExpr("sorted_intersect_count(a, b) AS c")
        .as[Int].head()
      assert(got == expect,
        s"merge walk=$got, Set.intersect=$expect on |a|=${sa.size}, |b|=${sb.size}")
    }
  }
}
