package graft

import org.apache.spark.sql.DataFrame
import graft.harmonize.Harmonize
import graft.sources.SourceAdapter

/** Generated coverage for the incremental-harmonize merge identity:
  * HarmonizeSpec pins one fixed split and h12 pins the 13+1 split every
  * round; this fuzzes the CLAIM itself — for ANY partition of the 14
  * adapters into ordered batches, folding them through
  * `Harmonize.incremental` must be bit-identical to the one-shot build
  * over all sources. That identity (content-addressed ids + the
  * min-collapse that keeps merge associative) is what makes the 100 TB
  * ingestion story append-only, so it gets generated splits, not just
  * the two fixed points.
  */
class BrickMergeFuzzSpec extends SparkSpec {

  private def same(a: DataFrame, b: DataFrame, what: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, what)

  test("8 random adapter partitions: incremental fold ≡ one-shot build") {
    val rnd = new scala.util.Random(140882)
    // one-shot reference, checkpointed once and shared across plans
    val full = Harmonize.cachedBrick(spark, sf(), SourceAdapter.all)
    (1 to 8).foreach { i =>
      val order = rnd.shuffle(SourceAdapter.all)
      val nBatches = 2 + rnd.nextInt(2)
      // random cut points -> nBatches non-empty ordered batches
      val cuts = (rnd.shuffle((1 until order.size).toList)
        .take(nBatches - 1) :+ 0 :+ order.size).sorted
      val batches = cuts.sliding(2).map { case List(a, b) =>
        order.slice(a, b) }.filter(_.nonEmpty).toSeq
      val folded = batches.tail.foldLeft(
        Harmonize.brick(spark, sf(), batches.head)) { (acc, batch) =>
        Harmonize.incremental(spark, sf(), acc, batch)
      }
      val tag = s"plan $i: ${batches.map(_.map(_.name)).mkString(" + ")}"
      same(folded.substances, full.substances, s"$tag (substances)")
      same(folded.properties, full.properties, s"$tag (properties)")
      same(folded.activities, full.activities, s"$tag (activities)")
    }
  }
}
