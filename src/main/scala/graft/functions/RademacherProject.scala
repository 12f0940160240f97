package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** The whole JL projection of one vector in ONE generated loop —
  * out[j] = Σ_i sgn(i, j)·x[i] / √k over the md5-derived Rademacher
  * ±1 matrix (Achlioptas '01), the row-local scale path behind the
  * q154/q155 relational spelling.
  *
  * Why a custom expression: the relational route (posexplode → sign-
  * grid broadcast join → partial-agged groupBy) is the ORACLE path —
  * exact decimal sums, DuckDB-mirrored — but it pays n×d exploded rows
  * and an O(n × k) exchange to compute something that is row-local
  * arithmetic; and the HOF spelling (`transform(sequence(k), j ->
  * aggregate(...))`) falls out of whole-stage codegen entirely (the
  * dot-product lesson, SCALE.md ground rules). This expression is one
  * fused d×k multiply-add loop per row inside codegen: no explode, no
  * join, no shuffle, no per-row allocation beyond the k-length output.
  *
  * The sign matrix is derived from md5("i_j") EXACTLY as the
  * relational grid derives it (low bit of the first 4 hex chars), so
  * the two routes agree sign-for-sign — FunctionsSpec pins the
  * projections equal within summation-order ulp (the expression sums
  * IEEE doubles in index order; the oracle route sums decimals, which
  * is why q154's oracle stays on the relational spelling). Signs are
  * cached per (k, d) in a static table — k·d bytes, computed once per
  * JVM, shared by every task in the executor. */
case class RademacherProject(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val floatInput = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      if (k > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"rademacher_project needs k > 0, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"rademacher_project needs array<double> or array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val sg = RademacherProject.signs(k, d)
    val out = new Array[Double](k)
    var i = 0
    while (i < d) {
      val x = if (floatInput) arr.getFloat(i).toDouble else arr.getDouble(i)
      val base = i * k
      var j = 0
      while (j < k) { out(j) += sg(base + j) * x; j += 1 }
      i += 1
    }
    val scale = 1.0 / math.sqrt(k.toDouble)
    var j = 0
    while (j < k) { out(j) *= scale; j += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val d = ctx.freshName("d")
      // the sign table is a generated-class FIELD, fetched lazily on
      // the first row (and on a dimension change, which real data
      // never has): the per-row cost of the lookup is a null-compare
      // + int-compare, not a boxed (Int,Int) key allocation and a
      // ConcurrentHashMap probe inside the consume path
      val sg = ctx.addMutableState("byte[]", "rademacherSigns")
      val sgD = ctx.addMutableState("int", "rademacherSignsD",
        v => s"$v = -1;")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val base = ctx.freshName("base")
      val get = if (floatInput) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $d = $a.numElements();
         |if ($sg == null || $sgD != $d) {
         |  $sg = graft.functions.RademacherProject.signs($k, $d);
         |  $sgD = $d;
         |}
         |double[] $out = new double[$k];
         |for (int $i = 0; $i < $d; $i++) {
         |  double $x = $get;
         |  int $base = $i * $k;
         |  for (int $j = 0; $j < $k; $j++) {
         |    $out[$j] += $sg[$base + $j] * $x;
         |  }
         |}
         |for (int $j = 0; $j < $k; $j++) {
         |  $out[$j] *= ${1.0 / math.sqrt(k.toDouble)};
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RademacherProject =
    copy(child = newChild)
}

object RademacherProject {

  /** ±1 sign table for a (k, d) projection, laid out [i*k + j] so the
    * inner j-loop is sequential. sgn(i, j) = low bit of the first 4
    * hex chars of md5("i_j") mapped {0 → −1, 1 → +1} — byte-for-byte
    * the relational grid's `conv(substr(md5(i||'_'||j),1,4),16,10) %
    * 2 * 2 - 1` (the first 4 hex chars are the first two digest
    * bytes, so the parity is digest byte 1's low bit). Cached per
    * (k, d): k·d bytes, once per JVM. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Byte]]()

  def signs(k: Int, d: Int): Array[Byte] =
    cache.computeIfAbsent((k, d), { key =>
      val (kk, dd) = key
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Byte](kk * dd)
      var i = 0
      while (i < dd) {
        var j = 0
        while (j < kk) {
          md.reset()
          val h = md.digest(s"${i}_${j}".getBytes("UTF-8"))
          out(i * kk + j) = if ((h(1) & 1) == 1) 1 else -1
          j += 1
        }
        i += 1
      }
      out
    })

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rademacher_project",
      exprs => RademacherProject(exprs.head,
        ConstArgs.int("rademacher_project", exprs(1))), "built-in")

  /** Column-API entry point — requires register(spark) first. */
  def project(a: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function("rademacher_project", a,
      org.apache.spark.sql.functions.lit(k))
}
