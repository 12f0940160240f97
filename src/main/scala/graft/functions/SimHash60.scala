package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit majority-vote SimHash of a string's DISTINCT words — the
  * q128 fingerprint (15 md5 hex digits × 4 bits; bit d·4+b set iff at
  * least half the words have bit b of hex digit d set) as ONE
  * row-local codegen call.
  *
  * Why a custom expression: the declarative spelling (explode words ×
  * 15 digit positions → two groupBys) shuffles O(doc × 15) rows per
  * document only to reassemble per-row state — the same shape the
  * MinHashSigs round-3 rewrite removed for band keys. This is one
  * generated Java call per row (one MessageDigest + one HashSet
  * reused across words), so fingerprinting joins whole-stage codegen
  * with ZERO shuffle — and, being row-local and stateless, it is
  * legal in an append-mode streaming plan (StreamingOps'
  * sim-channel screen), where a groupBy-based fingerprint would not
  * be.
  *
  * Hash contract (oracle parity): bit values derive from the md5 hex
  * string exactly as DuckDB's
  * `strpos('0123456789abcdef', substr(md5(w), d+1, 1)) - 1` — hex
  * digit d is the high nibble of digest byte d/2 for even d, low for
  * odd. Returns NULL for a string with no non-empty words (the
  * declarative version dropped such docs at its groupBy).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sim_hash60 needs a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val r = SimHash60.compute(input.asInstanceOf[UTF8String])
    if (r == SimHash60.Empty) null else java.lang.Long.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash60.getClass.getName.stripSuffix("$") + "$.MODULE$"
    // a 60-bit value is never negative, so the Empty sentinel (-1)
    // doubles as the null marker in generated code
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.compute($c);
      if (${ev.value} == ${SimHash60.Empty}L) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {

  /** Sentinel for "no non-empty words" (a real fingerprint is ≥ 0). */
  final val Empty: Long = -1L

  private[functions] val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Fold one md5 digest's 15 hex digits × 4 bits into the vote
    * counters — shared by the word-level and byte-shingle variants. */
  private[functions] def accumulate(d: Array[Byte], ones: Array[Int]): Unit = {
    var j = 0
    while (j < 15) {
      val byte = d(j / 2) & 0xff
      val hv = if (j % 2 == 0) byte >> 4 else byte & 0xf
      var b = 0
      while (b < 4) {
        if (((hv >> b) & 1) == 1) ones(j * 4 + b) += 1
        b += 1
      }
      j += 1
    }
  }

  /** Majority vote over n contributors, or [[Empty]] for none. */
  private[functions] def majority(ones: Array[Int], n: Int): Long = {
    if (n == 0) return Empty
    var sim = 0L
    var k = 0
    while (k < 60) {
      if (2 * ones(k) >= n) sim |= 1L << k
      k += 1
    }
    sim
  }

  def compute(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[String]()
    val ones = new Array[Int](60)
    var n = 0
    val md = digest.get()
    var i = 0
    while (i < toks.length) {
      val w = toks(i)
      if (w.nonEmpty && seen.add(w)) {
        n += 1
        md.reset()
        accumulate(md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8)), ones)
      }
      i += 1
    }
    majority(ones, n)
  }

  /** SQL registration: SELECT sim_hash60(lower(text)) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sim_hash60", exprs => SimHash60(exprs.head), "built-in")

  /** Column-API entry point — requires register(spark) first. */
  def sim_hash60(c: Column): Column =
    org.apache.spark.sql.functions.call_function("sim_hash60", c)
}
