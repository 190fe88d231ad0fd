package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Element-wise array aggregation for signature builds (MinHash, SimHash).
  *
  * Why this shape: the naive plan — posexplode to (group, i, v) rows +
  * groupBy(group, i) — multiplies the row count by the array length
  * (×32/×64) before the exchange and shuffles wide. Aggregating the
  * array element-wise keeps the shuffle at |groups| rows × n longs
  * regardless of input size. At 100 TB that's the difference between
  * shuffling signatures and shuffling the corpus.
  *
  * Why n builtin aggs and not a typed Aggregator UDAF: a
  * `udaf(Aggregator[Array[Long], ...])` plans as ObjectHashAggregate
  * with a boxed buffer and a per-row catalyst<->JVM array round trip.
  * `array(min(c[0]), ..., min(c[n-1]))` plans as a codegen'd
  * HashAggregate over n primitive long slots — same shuffle bytes,
  * no per-row allocation (measured ~2x faster on the dd3/dd4 builds).
  */
/** Input contract (both the builtin and UDAF paths): every array is
  * non-null and exactly length n. Outside that contract the paths
  * diverge — under ANSI mode `element_at` throws on a shorter array and
  * a null array yields null slots, while the Aggregator clamps to the
  * row's length and skips nulls — so callers (the signature builds,
  * which construct fixed-width arrays) must guarantee it.
  * ArrayAggSpec pins the short-array behavior.
  */
object ArrayAgg {
  /** Element-wise min over Array[Long] columns of length n. */
  def arrayMin(n: Int)(c: Column): Column =
    array((0 until n).map(i => min(element_at(c, i + 1))): _*)

  /** Element-wise sum over Array[Long] columns of length n. */
  def arraySum(n: Int)(c: Column): Column =
    array((0 until n).map(i => sum(element_at(c, i + 1))): _*)

  /** Typed-Aggregator variants — the engine's UDAF surface (the
    * reference has none, SURVEY §2.10; this is the canonical custom-
    * aggregation extension point for semantics the builtin composition
    * can't express, e.g. non-decomposable state). ArrayAggSpec proves
    * both paths agree; the builtin forms above stay on the hot path.
    */
  def arrayMinUdaf(n: Int)(c: Column): Column =
    udaf(new ArrayMin(n), ExpressionEncoder[Array[Long]]()).apply(c)

  def arraySumUdaf(n: Int)(c: Column): Column =
    udaf(new ArraySum(n), ExpressionEncoder[Array[Long]]()).apply(c)
}

private[functions] abstract class ArrayLongReduce(n: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  protected def combine(a: Long, b: Long): Long
  protected def unit: Long

  override def zero: Array[Long] = Array.fill(n)(unit)
  override def reduce(buf: Array[Long], row: Array[Long]): Array[Long] = {
    // Off-contract inputs degrade instead of failing: a null array is
    // skipped, a short one clamps to its length (missing slots keep the
    // unit). The builtin path throws/nulls instead — see object scaladoc.
    if (row == null) return buf
    var i = 0
    val m = math.min(n, row.length)
    while (i < m) { buf(i) = combine(buf(i), row(i)); i += 1 }
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
