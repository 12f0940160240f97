package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** |A ∩ B| of two SORTED-ascending long arrays via a single merge walk
  * (custom Catalyst expression — the exact-verify hot path of the dedup
  * family: q32/q109/q120/q127/q133 score every candidate pair with one
  * set intersection).
  *
  * Drop-in equal to `size(array_intersect(a, b))` on its contract
  * domain — sorted, duplicate-free, null-free arrays, exactly what
  * `sort_array(collect_set(...))` (Dedup.codedSets) produces; the
  * DedupSimSpec pin asserts the equality on the real corpus plus
  * randomized inputs. Why not array_intersect: per ROW it allocates and
  * fills an OpenHashSet of the left array, then probes every right
  * element — at 26.9M candidate pairs (the 100× probe) that is 26.9M
  * hash-set builds of ~200 entries each, all garbage after one row.
  * The merge walk is zero-allocation, branch-predictable, O(|A|+|B|)
  * long comparisons in registers, and stays inside whole-stage codegen.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count needs two array<bigint> inputs, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n1 = x.numElements()
    val n2 = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n1 && j < n2) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n1 = $a.numElements();
         |int $n2 = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n1 && $j < $n2) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "built-in")

  /** Column-API entry point — requires register(spark) first. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("sorted_intersect_count", a, b)
}
