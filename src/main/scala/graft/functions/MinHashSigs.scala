package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All 16 minhash minima over a shingle array in ONE generated loop.
  *
  * The row-local minhash formulation (`array_min(transform(...))` × 16)
  * is algebraically right but operationally wrong: Spark's higher-order
  * functions don't participate in whole-stage codegen, so it costs 16
  * interpreted array passes plus 16 intermediate arrays per row —
  * measured 4× SLOWER than the explode+groupBy it replaced at the 10×
  * probe. This expression keeps the shuffle-free shape and the codegen:
  * one pass over the shingle array, each shingle hashed once, 16
  * running minima updated in registers, no intermediate allocation.
  *
  * `md5Base = true` is the oracle-parity base hash (first 8 hex chars
  * of md5 as uint32 — identical to `conv(substr(md5(w),1,8),16,10)`,
  * which DuckDB mirrors); `false` is the production base hash
  * (xxhash64 mod 2^32, one long op per shingle — see
  * Dedup.bandKeysFast for why the md5 tax is oracle-only).
  *
  * The permutation family ((a_i·h + b_i) mod P, P prime > 2^32) is
  * shared VERBATIM with ops.Dedup's oracle SQL — any drift fails q31's
  * hash-exact oracle compare, which is the regression gate for these
  * constants.
  */
case class MinHashSigs(child: Expression, md5Base: Boolean) extends UnaryExpression {

  import MinHashSigs._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"MinHashSigs needs array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    var j = 0
    while (j < arr.numElements()) {
      val w = arr.getUTF8String(j)
      val h =
        if (md5Base) md5Prefix32(w.getBytes)
        else pmod32(org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(w, Seed))
      var i = 0
      while (i < NumHashes) {
        val v = (A(i) * h + B(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("minhashA", A, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", B, "long[]")
      val mins = ctx.freshName("mins")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val w = ctx.freshName("w")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val hashCode =
        if (md5Base) {
          val md = ctx.addMutableState("java.security.MessageDigest", "minhashMd",
            vn => s"""try { $vn = java.security.MessageDigest.getInstance("MD5"); }
                     |catch (Exception e) { throw new RuntimeException(e); }""".stripMargin)
          // NOTE: this block is re-interpolated into the outer template
          // below, whose stripMargin would eat any continuation line
          // starting with '|' (it deleted the OR operator here once —
          // janino's "is not a type" cast-parse error — and the whole
          // projection silently fell back to interpreted eval). Keep
          // the bit-fold on ONE line.
          s"""byte[] ${h}d = $md.digest($w.getBytes());
             |long $h = ((${h}d[0] & 0xffL) << 24) | ((${h}d[1] & 0xffL) << 16) | ((${h}d[2] & 0xffL) << 8) | (${h}d[3] & 0xffL);""".stripMargin
        } else {
          s"""long $h = org.apache.spark.sql.catalyst.expressions.XXH64
             |  .hashUTF8String($w, ${Seed}L);
             |$h = (($h % ${Mod32}L) + ${Mod32}L) % ${Mod32}L;""".stripMargin
        }
      s"""
         |long[] $mins = new long[${NumHashes}];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  UTF8String $w = $c.getUTF8String($j);
         |  $hashCode
         |  for (int $i = 0; $i < ${NumHashes}; $i++) {
         |    long $v = ($aRef[$i] * $h + $bRef[$i]) % ${P}L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  val NumHashes = 16
  /** Same universal-hash family as ops.Dedup's oracle SQL (verbatim). */
  val P = 4294967311L
  private val Mod32 = 4294967296L
  private val Seed = 42L // Spark's own xxhash64() seed
  val A: Array[Long] =
    (0 until NumHashes).map(i => (1103515245L * (i + 1) + 12345L) % 2147483647L).toArray
  val B: Array[Long] =
    (0 until NumHashes).map(i => (69069L * (i + 1) + 7L) % 2147483647L).toArray

  private def md5Prefix32(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  private def pmod32(x: Long): Long = ((x % Mod32) + Mod32) % Mod32

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs", exprs => MinHashSigs(exprs.head, md5Base = true), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs_fast", exprs => MinHashSigs(exprs.head, md5Base = false), "built-in")
  }

  def minhash_sigs(c: Column): Column =
    org.apache.spark.sql.functions.call_function("minhash_sigs", c)
  def minhash_sigs_fast(c: Column): Column =
    org.apache.spark.sql.functions.call_function("minhash_sigs_fast", c)
}
