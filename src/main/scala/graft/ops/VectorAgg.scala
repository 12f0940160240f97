package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator (SURVEY.md §2B "custom typed agg"): the
  * element-wise mean of an embedding column, `Aggregator[IN, BUF, OUT]`
  * exposed via `udaf(...)` so it is usable from both the Dataset API and
  * SQL. The reference has no aggregates at all; this is engine surface.
  *
  * Scale: the buffer is a fixed-size double[] + count, merged
  * associatively — a classic partial-aggregate shape: each task reduces
  * its partition to one 64-float buffer, the shuffle moves only
  * num_groups × 520 bytes regardless of row count.
  */
object VectorMean extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    if (v == null) b
    else {
      val acc = if (b._1.length == 0) new Array[Double](v.length) else b._1
      var i = 0
      while (i < v.length) { acc(i) += v(i); i += 1 }
      (acc, b._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.length == 0) b
    else if (b._1.length == 0) a
    else {
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.toSeq.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** Double-input variant of [[VectorMean]], used by the IVF Lloyd step
  * (q39) to average unit vectors per cell: same fixed-width partial
  * aggregate, so each k-means iteration shuffles num_cells × 520-byte
  * buffers instead of posexploding corpus × dim rows. */
object VectorMeanD extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    if (v == null) b
    else {
      val acc = if (b._1.length == 0) new Array[Double](v.length) else b._1
      var i = 0
      while (i < v.length) { acc(i) += v(i); i += 1 }
      (acc, b._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
    VectorMean.merge(a, b)

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    VectorMean.finish(r)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    VectorMean.bufferEncoder

  override def outputEncoder: Encoder[Seq[Double]] =
    VectorMean.outputEncoder
}
