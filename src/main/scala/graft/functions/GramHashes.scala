package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** POSITIONAL word n-gram hashes of a string: element i is the 60-bit
  * md5-prefix hash of the n-gram starting at word i — one element per
  * window, duplicates KEPT, order = position (custom Catalyst
  * expression; the duplicate-SPAN dedup primitive, SURVEY.md §2B).
  *
  * [[WordShingles]] deliberately emits the DISTINCT shingle set (the
  * MinHash/Jaccard input, where position is noise); span-level dedup
  * needs the opposite — `posexplode` of this array yields
  * (position, gram-hash) rows, and a position whose hash repeats
  * corpus-wide is the start of a duplicated window.
  *
  * Hash contract (oracle parity): element i equals
  * `CAST('0x' || substr(md5(w_i || ' ' || … || w_{i+n-1}), 1, 15) AS
  * BIGINT)` over `string_split(text, ' ')` — the repo's standard
  * 60-bit md5-prefix convention (q61), so DuckDB reproduces the exact
  * values and span queries stay hash-checkable end to end. Fewer than
  * n words → empty array.
  *
  * Why a custom expression: the transform/sequence/slice composition
  * runs on Spark's interpreted higher-order-function path and builds
  * every gram string twice; this is one generated Java call per row
  * inside whole-stage codegen (PlanSpec runs it under CODEGEN_ONLY),
  * one StringBuilder + one MessageDigest reused across windows.
  */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_hashes needs a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    GramHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GramHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.compute($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val md = digest.get()
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = top 60 bits of the digest: pack the first
      // 8 bytes big-endian and drop the low nibble (the 16th hex char)
      var top = 0L
      var b = 0
      while (b < 8) { top = (top << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = top >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }

  /** SQL registration: SELECT gram_hashes(text, 8) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_hashes",
      exprs => GramHashes(exprs.head,
        ConstArgs.int("gram_hashes", exprs(1))), "built-in")

  /** Column-API entry point — requires register(spark) first. */
  def gram_hashes(c: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function("gram_hashes", c,
      org.apache.spark.sql.functions.lit(n))
}
