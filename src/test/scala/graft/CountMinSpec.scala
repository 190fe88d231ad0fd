package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CountMin, CountMinAgg}

/** Count-Min contracts, driven directly through the Aggregator's
  * reduce/merge (plain Scala — no session needed): never-underestimate,
  * split-merge ≡ one-shot, and determinism of the hash family.
  */
class CountMinSpec extends AnyFunSuite {
  private val d = 4
  private val w = 64

  // skewed stream: token i appears ~1000/i times (Zipf-ish)
  private val stream: Seq[String] =
    (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"tok$i"))

  private def sketchOf(items: Seq[String]): Array[Long] = {
    val agg = new CountMinAgg(d, w)
    items.foldLeft(agg.zero)(agg.reduce)
  }

  private def est(sk: Array[Long], tok: String): Long =
    (0 until d).map(i => sk(i * w + CountMin.bucket(tok, i, w))).min

  test("estimates never underestimate and respect the epsilon bound on this stream") {
    val sk = sketchOf(stream)
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val n = stream.length
    exact.foreach { case (tok, c) =>
      val e = est(sk, tok)
      assert(e >= c, s"underestimate for $tok: $e < $c")
      // e/w * n bound (holds w.h.p.; deterministic on this fixed stream)
      assert(e - c <= math.ceil(math.E / w * n).toLong,
        s"overestimate for $tok: $e vs $c (n=$n)")
    }
  }

  test("merging split sketches equals the one-shot sketch exactly") {
    val agg = new CountMinAgg(d, w)
    val (a, b) = stream.splitAt(stream.length / 3)
    val merged = agg.merge(sketchOf(a), sketchOf(b))
    assert(merged.toSeq == sketchOf(stream).toSeq)
  }

  test("unseen tokens can only collide upward from zero — never negative") {
    val sk = sketchOf(stream)
    (1 to 20).foreach { i =>
      assert(est(sk, s"unseen$i") >= 0L)
    }
  }

  test("hash family is deterministic across instances") {
    (1 to 100).foreach { i =>
      val t = s"tok$i"
      (0 until d).foreach { r =>
        assert(CountMin.bucket(t, r, w) == CountMin.bucket(t, r, w))
        assert(CountMin.bucket(t, r, w) >= 0 && CountMin.bucket(t, r, w) < w)
      }
    }
  }
}
