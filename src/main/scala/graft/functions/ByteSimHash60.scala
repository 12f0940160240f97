package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 60-bit majority-vote SimHash of a BINARY payload's distinct byte
  * n-grams — the content-level fingerprint that makes multimodal
  * columns a first-class member of the dedup family (q141): two
  * payloads whose byte-shingle distributions nearly coincide (the same
  * image re-encoded with a different tail, a video with trimmed
  * padding) land within a small Hamming distance, exactly as
  * [[SimHash60]] does for word distributions.
  *
  * Reuses SimHash60's accumulation core verbatim (same md5 hex-digit
  * bit derivation, same majority vote), so the fingerprint composes
  * with ALL existing simhash machinery unchanged: the 4 × 15-bit
  * pigeonhole block join (q128 / Dedup.simBlocks), the `bit_count(a ^
  * b) <= 3` verify, and the block-partitioned store channel layout.
  * The shingle unit is a byte WINDOW rather than a word: content-level
  * similarity needs no tokenizer and holds for non-text payloads.
  *
  * Row-local, stateless codegen (one MessageDigest + one HashSet
  * reused across windows, zero shuffle) — legal in append-mode
  * streaming plans like its word-level sibling. Returns NULL for a
  * payload shorter than one window (charged like "no words").
  */
case class ByteSimHash60(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"byte_sim_hash60 needs a binary input, got ${child.dataType.catalogString}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(
        s"byte_sim_hash60 needs a positive window size, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any = {
    val r = ByteSimHash60.compute(input.asInstanceOf[Array[Byte]], n)
    if (r == SimHash60.Empty) null else java.lang.Long.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ByteSimHash60.getClass.getName.stripSuffix("$") + "$.MODULE$"
    // a 60-bit value is never negative, so the Empty sentinel (-1)
    // doubles as the null marker in generated code
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.compute($c, $n);
      if (${ev.value} == ${SimHash60.Empty}L) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): ByteSimHash60 =
    copy(child = newChild)
}

object ByteSimHash60 {

  def compute(payload: Array[Byte], n: Int): Long = {
    if (payload.length < n) return SimHash60.Empty
    val ones = new Array[Int](60)
    var cnt = 0
    val md = SimHash60.digest.get()
    // distinctness key per window: for n ≤ 8 the raw bytes pack
    // losslessly into one Long — a boxed-Long set instead of a
    // per-window String decode (a 10 MB payload would otherwise
    // allocate ~10M strings on this row-local hot path); wider
    // windows (n > 8, never used by the engine's fingerprints) fall
    // back to the byte-exact ISO-8859-1 string key
    if (n <= 8) {
      val seen = new java.util.HashSet[java.lang.Long]()
      var i = 0
      while (i + n <= payload.length) {
        var key = 0L
        var j = 0
        while (j < n) { key = (key << 8) | (payload(i + j) & 0xffL); j += 1 }
        if (seen.add(key)) {
          cnt += 1
          md.reset()
          md.update(payload, i, n)
          SimHash60.accumulate(md.digest(), ones)
        }
        i += 1
      }
    } else {
      val seen = new java.util.HashSet[String]()
      var i = 0
      while (i + n <= payload.length) {
        val key = new String(payload, i, n, java.nio.charset.StandardCharsets.ISO_8859_1)
        if (seen.add(key)) {
          cnt += 1
          md.reset()
          md.update(payload, i, n)
          SimHash60.accumulate(md.digest(), ones)
        }
        i += 1
      }
    }
    SimHash60.majority(ones, cnt)
  }

  /** SQL registration: SELECT byte_sim_hash60(payload, 4) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "byte_sim_hash60",
      exprs => ByteSimHash60(exprs.head, ConstArgs.int("byte_sim_hash60", exprs(1))),
      "built-in")

  /** Column-API entry point — requires register(spark) first. */
  def byte_sim_hash60(c: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function("byte_sim_hash60", c,
      org.apache.spark.sql.functions.lit(n))
}
