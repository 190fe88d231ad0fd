package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitters sketch as a typed Aggregator — the
  * bounded-memory frequent-items operator for the sketch family (HLL =
  * a13, GK quantiles = a16). The reference has no sketches at all; at
  * 100 TB a full `groupBy(token).count` of a web corpus shuffles the
  * whole vocabulary, while this keeps k counters per partition and
  * merges them associatively, so the exchange carries ≤ k (token, count)
  * pairs per map task.
  *
  * Guarantee (mergeable-summaries form): after any sequence of reduces
  * and merges over n items, every item with true frequency > n/(k+1) is
  * present in the summary, and each retained count underestimates the
  * true count by at most n/(k+1). The merge implements the standard
  * combine: sum counters, then subtract the (k+1)-th largest count and
  * drop non-positive entries — this preserves the error bound, which
  * HeavyHittersSpec checks against exact counts on skewed data.
  */
object HeavyHitters {

  /** MG summary of a string column: Map(token -> lower-bound count). */
  def mgSketch(k: Int)(c: Column): Column =
    udaf(new MisraGries(k), Encoders.STRING).apply(c)
}

class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, "MisraGries needs at least one counter")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
    if (tok == null) buf
    else buf.get(tok) match {
      case Some(c) => buf.updated(tok, c + 1)
      case None if buf.size < k => buf.updated(tok, 1L)
      // classic MG step: a new item with all counters busy decrements
      // every counter, evicting the ones that hit zero
      case None => buf.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  override def merge(a: Map[String, Long],
      b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from everything, keep > 0
      val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      sum.collect { case (t, c) if c - cut > 0 => t -> (c - cut) }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r
  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
