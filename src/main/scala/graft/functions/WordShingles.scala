package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a string (custom Catalyst
  * expression — the MinHash/Jaccard dedup hot path, SURVEY.md §2B).
  *
  * Semantically identical to
  * `array_distinct(transform(sequence(1, size(ws)-n+1), i =>
  * concat_ws(" ", ws[i], …, ws[i+n-1])))` over `ws = split(text, " ")`
  * (and to DuckDB's `ws[i] || ' ' || …` formulation): split on single
  * spaces keeping empty tokens, one shingle per window, first-seen
  * distinct. Fewer than n words → empty array.
  *
  * Why it exists: the transform/sequence composition runs on Spark's
  * interpreted higher-order-function path — three lambda invocations
  * per window per row. This is a single Java call per row inside
  * whole-stage codegen; on the 100 TB dedup path shingling touches
  * every byte of every document, so constant factors here dominate
  * the whole stage.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WordShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.compute($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
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
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles",
      exprs => WordShingles(exprs.head,
        ConstArgs.int("word_shingles", exprs(1))), "built-in")

  /** Column-API entry point — requires register(spark) first. */
  def word_shingles(c: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function("word_shingles", c,
      org.apache.spark.sql.functions.lit(n))
}
