package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise array aggregators (typed `Aggregator` UDAFs).
  *
  * Why: signature builds (MinHash, SimHash) are logically "combine one
  * small array per row, element-wise, per group". The naive plan —
  * posexplode to (group, i, v) rows + groupBy(group, i) — multiplies the
  * row count by the array length (×32/×64) before the exchange and
  * shuffles wide. These aggregators keep the array whole: map-side
  * partial combine produces ONE array per group per partition, so the
  * shuffle carries |groups| rows regardless of array length. At 100 TB
  * that's the difference between shuffling signatures and shuffling the
  * corpus.
  */
private[functions] abstract class ArrayLongReduce(n: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  protected def combine(a: Long, b: Long): Long
  protected def unit: Long

  override def zero: Array[Long] = Array.fill(n)(unit)
  override def reduce(buf: Array[Long], row: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { buf(i) = combine(buf(i), row(i)); i += 1 }
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    reduce(a, b)
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

private[functions] class ArrayMin(n: Int) extends ArrayLongReduce(n) {
  protected def combine(a: Long, b: Long): Long = math.min(a, b)
  protected def unit: Long = Long.MaxValue
}

private[functions] class ArraySum(n: Int) extends ArrayLongReduce(n) {
  protected def combine(a: Long, b: Long): Long = a + b
  protected def unit: Long = 0L
}

object ArrayAgg {
  /** Element-wise min over Array[Long] columns of length n. */
  def arrayMin(n: Int)(c: Column): Column =
    udaf(new ArrayMin(n), ExpressionEncoder[Array[Long]]()).apply(c)

  /** Element-wise sum over Array[Long] columns of length n. */
  def arraySum(n: Int)(c: Column): Column =
    udaf(new ArraySum(n), ExpressionEncoder[Array[Long]]()).apply(c)
}
