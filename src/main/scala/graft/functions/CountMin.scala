package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min sketch as a typed Aggregator — the point-query counting
  * sketch completing the mergeable-summaries family (HLL distinct =
  * a13, GK quantiles = a16, Misra-Gries heavy hitters = a17). d hash
  * rows × w counters; update adds 1 to one counter per row, estimate =
  * min over rows. Estimates NEVER underestimate, and overestimate by
  * more than (e/w)·n with probability ≤ e^−d. Merge is entrywise sum —
  * associative and commutative, so partial sketches combine map-side
  * and the exchange carries d·w longs per task regardless of input
  * size or cardinality (vs the full-vocabulary shuffle of an exact
  * groupBy count).
  *
  * Hashes are MurmurHash3 with row-index seeds — a pure function of
  * the token, so sketches are deterministic and cross-run reproducible
  * (same policy as the MinHash/SimHash signatures in operators/Dedup).
  */
object CountMin {
  /** CMS of a string column: FLAT Array(d·w) of counters, row-major. */
  def cmsSketch(d: Int, w: Int)(c: Column): Column =
    udaf(new CountMinAgg(d, w), Encoders.STRING).apply(c)

  private[graft] def bucket(tok: String, row: Int, w: Int): Int =
    (scala.util.hashing.MurmurHash3.stringHash(tok, 0x9747b28c + row)
      & 0x7fffffff) % w

  /** Point-query estimate = min over rows. A scalar UDF is justified
    * here: the probe is an irreducibly custom sketch lookup and runs
    * over the handful of probed tokens, never over the corpus (the
    * corpus-scale work is the codegen'd explode + the aggregator).
    */
  def probe(d: Int, w: Int): org.apache.spark.sql.expressions
      .UserDefinedFunction =
    org.apache.spark.sql.functions.udf((tok: String, arr: Seq[Long]) =>
      (0 until d).map(i => arr(i * w + bucket(tok, i, w))).min)
}

class CountMinAgg(d: Int, w: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(d >= 1 && w >= 1, "CountMin needs positive dimensions")

  override def zero: Array[Long] = Array.ofDim[Long](d * w)

  override def reduce(buf: Array[Long], tok: String): Array[Long] = {
    if (tok != null) {
      var i = 0
      while (i < d) {
        buf(i * w + CountMin.bucket(tok, i, w)) += 1
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
