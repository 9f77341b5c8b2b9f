package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY.md §2.12): element-wise vector sum/mean as an
  * `Aggregator` — a single-pass alternative to the posexplode+groupBy(pos)
  * composition (V4). At scale this avoids exploding dim× rows before the
  * shuffle: partial buffers are one fixed-width array per (group, partition),
  * merged tree-wise like any other partial aggregate.
  */
case class CentroidBuffer(sums: Array[Double], n: Long)

/** Input is `Array[Float]`, not `Seq[Float]` (r22, VERDICT #2 hardening):
  * the primitive-array encoder deserializes each row with one
  * `toFloatArray` copy, where the Seq encoder boxed every element into a
  * WrappedArray — per-row garbage that is exactly the churn a 32-thread
  * ObjectHashAggregate amplifies. Accumulation order and arithmetic are
  * unchanged (same index-ascending double adds), so results are
  * bit-identical per partition.
  */
class CentroidAgg extends Aggregator[Array[Float], CentroidBuffer, Seq[Double]] {

  override def zero: CentroidBuffer = CentroidBuffer(Array.empty, 0L)

  override def reduce(b: CentroidBuffer, v: Array[Float]): CentroidBuffer = {
    val sums = if (b.sums.isEmpty) new Array[Double](v.length) else b.sums
    var i = 0
    while (i < v.length && i < sums.length) { sums(i) += v(i); i += 1 }
    CentroidBuffer(sums, b.n + 1)
  }

  override def merge(a: CentroidBuffer, b: CentroidBuffer): CentroidBuffer = {
    if (a.sums.isEmpty) b
    else if (b.sums.isEmpty) a
    else {
      var i = 0
      while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      CentroidBuffer(a.sums, a.n + b.n)
    }
  }

  override def finish(r: CentroidBuffer): Seq[Double] =
    if (r.n == 0) Seq.empty else r.sums.map(_ / r.n).toSeq

  override def bufferEncoder: Encoder[CentroidBuffer] = Encoders.product[CentroidBuffer]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object CentroidAgg {
  private lazy val fn = udaf(new CentroidAgg,
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
  def centroid(vec: Column): Column = fn(vec)
}
