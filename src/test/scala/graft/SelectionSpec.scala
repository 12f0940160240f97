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
    val anchor = (0 until 600).map(i => ("ref", 40L + (i % 10) * 55))
    val clone = anchor.map { case (_, n) => ("clone", n) }
    val shifted = (0 until 600).map(i => ("shifted", 420L + (i % 4) * 60))
    val docs = (anchor ++ clone ++ shifted).toDF("source", "n_chars")
    val out = ops.Selection.psiBySource(docs, "ref")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.keySet == Set("clone", "shifted"))
    assert(math.abs(out("clone")) < 1e-9, s"clone PSI should be 0, got ${out("clone")}")
    assert(out("shifted") > 0.25, s"shifted PSI should alarm, got ${out("shifted")}")
  }

  test("psiBySource is anchor-relative: anchor never appears in the output") {
    val docs = Core.table(spark, dir, "documents").select(col("source"), col("n_chars"))
    val out = ops.Selection.psiBySource(docs, "src0")
    assert(out.filter(col("source") === "src0").count() == 0)
    // PSI is non-negative by construction (sum of (p-q)ln(p/q) terms)
    assert(out.filter(col("psi_nchars") < 0).count() == 0)
  }
}
