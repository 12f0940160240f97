package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst Expression showcase (SURVEY.md §2B "UDx surface"):
  * a polynomial rolling hash (Rabin–Karp style) over a string column —
  * the document-fingerprinting primitive for shingling/dedup at scale.
  *
  *   h = Σ byte(i) · B^(n−1−i)  mod 2^64,  B = 31
  *
  * Implemented with `doGenCode`, so it fuses into whole-stage codegen
  * like a built-in — no UDF serialization, no boxing, operates
  * directly on UTF8String bytes. This is the preferred extension
  * shape: a scalar UDF doing the same work would box every row and
  * break the codegen stage in two.
  *
  * (The reference's only hash is a file-level MD5 integrity checksum,
  * converter.py:100–105 (pyc), which nothing consumes; this is engine
  * surface, not a port.)
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"RollingHash needs a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long ${ev.value}Acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  ${ev.value}Acc = ${ev.value}Acc * 31L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** SQL registration: SELECT rolling_hash(text) ... (Spark 4's Column
    * API no longer exposes raw Expressions, so the registry is the
    * injection point for custom expressions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")

  /** Column-API entry point — requires register(spark) first. */
  def rolling_hash(c: Column): Column =
    org.apache.spark.sql.functions.call_function("rolling_hash", c)
}
