package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator extension showcase (the deepest tier of the
  * extension ladder: custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, SURVEY.md guide §"Custom operator"): top-k rows per
  * group WITHOUT sorting each group.
  *
  * The DataFrame composition (`row_number().over(window) <= k`, q16)
  * must sort every partition — O(n log n) per group and the whole
  * group's rows pass through the sorter. This operator keeps a bounded
  * k-element heap per group — O(n log k), memory O(groups × k) — the
  * right physical shape when k ≪ group size, which is exactly the
  * training-data top-k-sampling case at 100 TB.
  *
  * The physical node declares `ClusteredDistribution(groupExprs)`, so
  * EnsureRequirements plants the single hash shuffle; everything else
  * is one streaming pass per partition.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val gExprs = groupExprs
    val so = order
    val kk = k
    child.execute().mapPartitions { it =>
      val groupProj = UnsafeProjection.create(gExprs, schema)
      val ordering = GenerateOrdering.generate(so, schema)
      // "top" = first k under the requested sort order; heap keeps the
      // current worst at its head so replacement is O(log k)
      val worstFirst = ordering.reverse
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = groupProj(row)
        var h = heaps.get(key)
        if (h == null) {
          h = new java.util.PriorityQueue[InternalRow](kk + 1, worstFirst)
          heaps.put(key.copy(), h)
        }
        if (h.size < kk) h.add(row.copy())
        else if (ordering.compare(row, h.peek()) < 0) {
          h.poll()
          h.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h =>
        val arr = h.toArray(new Array[InternalRow](h.size))
        java.util.Arrays.sort(arr, ordering)
        arr.iterator
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
