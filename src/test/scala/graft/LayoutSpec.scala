package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Compaction and z-order clustering payoffs, measured on real file
  * stats rather than asserted by construction.
  */
class LayoutSpec extends SparkSpec {

  test("compaction collapses a fragmented directory into disjoint runs") {
    val base = Files.createTempDirectory("graft-compact").toString
    val frag = s"$base/frag"
    val tidy = s"$base/tidy"
    // simulate streaming debris: 64 tiny files, no ordering
    Tables.orders(spark, sf()).repartition(64)
      .write.mode("overwrite").parquet(frag)
    val fragged = spark.read.parquet(frag)
    val nFilesBefore = fragged.select(input_file_name()).distinct().count()
    assert(nFilesBefore >= 32) // genuinely fragmented input

    val rows = fragged.count()
    Layout.cluster(fragged, col("o_orderkey"), targetRows = rows / 4)
      .write.mode("overwrite").parquet(tidy)
    val compacted = spark.read.parquet(tidy)
    val stats = Layout.fileStats(compacted, Seq("o_orderkey")).collect()
    assert(stats.length <= 6, s"still fragmented: ${stats.length} files")
    assert(compacted.count() == rows)
    // files hold non-overlapping key ranges → a range predicate prunes
    // whole files via their footer stats
    val runs = stats.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    runs.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, "overlapping runs")
      case _ =>
    }
  }

  test("zorderValue interleaves bits and respects clamping") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (1L << 40, 2L))
      .toDF("x", "y")
      .select(Layout.zorderValue(Seq(col("x"), col("y")), 4).as("z"))
    // x occupies even bit positions, y odd; 2^40 clamps to 15
    assert(df.as[Long].collect().toSeq ==
      Seq(0L, 1L, 2L, 15L, // interleave(3,3): x bits at 0,2 + y bits at 1,3
        // clamp(2^40)=15 -> x bits 01010101 (85), y=2 -> bit 3 (8)
        93L))
  }

  test("z-order clustering shrinks per-file bounding boxes on both dims") {
    val base = Files.createTempDirectory("graft-zorder").toString
    // two independent uniform dims, quantized to 8 bits each
    val data = Tables.orders(spark, sf())
      .select((col("o_custkey") % 256).as("x"),
        (pmod(hash(col("o_orderkey")), lit(256))).cast("long").as("y"))
    // average box PERIMETER (sum of per-dim ranges): under uniform data
    // the box AREA is layout-invariant (16 files always tile the 2-D
    // space), but a single-dim predicate scans every file whose range on
    // THAT dim overlaps it — so what pruning sees is the per-dim extent.
    // Single-column sort: x-extent 1/16 of the space, y-extent all of it.
    // Z-order: both extents ~1/4. Perimeter captures exactly that.
    def boxPerimeter(dir: String): Double = {
      val st = Layout.fileStats(spark.read.parquet(dir), Seq("x", "y"))
        .collect()
      st.map { r =>
        (r.getLong(2) - r.getLong(1) + 1).toDouble +
          (r.getLong(4) - r.getLong(3) + 1)
      }.sum / st.length
    }
    val rows = data.count()
    // control: single-column sort — perfect on x, useless on y
    Layout.cluster(data, col("x"), rows / 16)
      .write.mode("overwrite").parquet(s"$base/linear")
    // z-order on both dims
    Layout.cluster(data,
        Layout.zorderValue(Seq(col("x"), col("y")), 8), rows / 16)
      .write.mode("overwrite").parquet(s"$base/zorder")
    val (linear, zordered) =
      (boxPerimeter(s"$base/linear"), boxPerimeter(s"$base/zorder"))
    // linear ≈ 16 + 256 = 272; z-order ≈ 64 + 64 = 128 — materially
    // tighter per-dim extents, i.e. fewer files scanned for a predicate
    // on either dimension
    assert(zordered < linear * 0.6,
      s"z-order gave no locality: linear=$linear zorder=$zordered")
  }

  test("zone-map pruned read opens only intersecting files, same answer") {
    val dir = Files.createTempDirectory("graft-zonemap").toString + "/t"
    val data = Tables.orders(spark, sf())
    val rows = data.count()
    Layout.cluster(data, col("o_orderkey"), rows / 8)
      .write.mode("overwrite").parquet(dir)
    val full = spark.read.parquet(dir)
    val stats = Layout.fileStats(full, Seq("o_orderkey"))
      .cache() // the persisted stats table stand-in
    val nFiles = stats.count()
    val (lo, hi) = (10L, 150L)
    val pruned = Layout.prunedRead(spark, dir, stats, "o_orderkey", lo, hi)
    // opened a strict subset of files (clustered layout → few intersect)
    val opened = pruned.select(input_file_name()).distinct().count()
    assert(opened < nFiles, s"no pruning: $opened of $nFiles")
    // and the pruned scan + residual filter equals the full-scan answer
    // (decimal sum: double addition order differs between the two reads)
    def summary(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("o_orderkey").between(lo, hi))
        .agg(count(lit(1)),
          graft.functions.Numeric.dsum(col("o_totalprice"))).head
    assert(summary(pruned) == summary(full))
    // a fully-out-of-range window prunes everything and yields empty,
    // schema intact
    val none = Layout.prunedRead(spark, dir, stats, "o_orderkey",
      10000000L, 20000000L)
    assert(none.count() == 0 && none.columns.sameElements(full.columns))

    // freshness contract: stats describing a DIFFERENT layout of the
    // directory must make prunedRead REFUSE (stale paths would fail or
    // silently miss files), never return a wrong answer
    spark.read.parquet(dir).limit(10).coalesce(1)
      .write.mode("overwrite").parquet(dir + "_v2")
    intercept[IllegalStateException] {
      Layout.prunedRead(spark, dir + "_v2", stats, "o_orderkey", lo, hi)
    }
    stats.unpersist()
  }
}
