package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout maintenance — the table-management side of a 100 TB
  * deployment that query operators rely on but don't perform:
  *
  *  - `compact`: small-file compaction. Streaming ingestion and
  *    per-integrator re-runs leave thousands of KB-sized parquet files;
  *    scan throughput collapses because every file pays open/footer
  *    costs and row-group stats stop pruning. Compaction rewrites a
  *    directory into ~`targetRows`-sized range-partitioned files sorted
  *    on a clustering key, so file-level min/max become disjoint and a
  *    range predicate prunes whole files.
  *
  *  - `zorderValue`: multi-dimensional clustering key. Sorting on one
  *    column gives perfect pruning on that column and none on others;
  *    interleaving the bit representations (Morton order) gives every
  *    interleaved column partial locality, shrinking each file's
  *    per-column min/max bounding box. LayoutSpec measures the payoff:
  *    z-ordered files have strictly smaller average 2-D bounding boxes
  *    than single-column-sorted files on the same data.
  *
  * Both are pure DataFrame transforms: `repartitionByRange` samples the
  * key to build balanced range bounds (one exchange), and the write is
  * embarrassingly parallel. No driver-side data movement.
  */
object Layout {

  /** Morton (z-order) interleave of `cols`, each quantized to `bits`
    * bits. Columns must be non-negative longs (callers quantize floats/
    * keys first); values ≥ 2^bits clamp to the top code so outliers
    * don't wrap. Built from shift/mask expressions only — codegen'd,
    * no UDF.
    */
  def zorderValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.size <= 63,
      "zorderValue needs 1..63 total bits")
    val top = (1L << bits) - 1
    val clamped = cols.map(c => least(greatest(c, lit(0L)), lit(top)))
    val terms = for {
      (c, ci) <- clamped.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(
      shiftrightunsigned(c, b).bitwiseAND(lit(1L)),
      b * cols.size + ci)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` as range-partitioned files of ~`targetRows` rows
    * sorted on `key` (pass a z-order value for multi-column
    * clustering). Returns the clustered frame ready to write; the
    * caller owns the write mode/path so compaction composes with
    * partitioned and bucketed layouts.
    */
  def cluster(df: DataFrame, key: Column, targetRows: Long): DataFrame = {
    // guard the integer-division foot-gun: rows/N with rows < N yields 0,
    // and 0 here would explode into Int.MaxValue range partitions
    require(targetRows >= 1, s"targetRows must be >= 1, got $targetRows")
    val n = df.count()
    clusterInto(df, key, math.max(1, math.ceil(n.toDouble / targetRows).toInt))
  }

  /** `cluster` with a known file count — skips the sizing `count()` pass
    * when the caller already knows the target layout (e.g. compacting to
    * a fixed shard count, or sizing from table stats).
    */
  def clusterInto(df: DataFrame, key: Column, files: Int): DataFrame = {
    require(files >= 1, s"files must be >= 1, got $files")
    df.repartitionByRange(files, key).sortWithinPartitions(key)
  }

  /** Per-file min/max stats of `statCols` for a parquet directory — the
    * zone-map view a scan planner prunes with, and what LayoutSpec
    * asserts on. One scan, grouped by file.
    */
  def fileStats(df: DataFrame, statCols: Seq[String]): DataFrame = {
    val aggs = statCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    df.withColumn("__file", input_file_name())
      .groupBy(col("__file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Zone-map pruned read: given a persisted stats table (built once by
    * `fileStats` after clustering, stored beside the data), open only
    * the files whose [min,max] interval on `statCol` intersects
    * [lo, hi]. Parquet footers already do this per row group, but at
    * 100 TB the planner-side variant avoids even LISTING/opening the
    * 99% of files a clustered layout excludes — the stats frame is tiny
    * (one row per file), so the collect is a metadata read, not data.
    *
    * Freshness contract: the stats snapshot must describe the directory
    * AS IT IS — a rewrite/re-compaction after `fileStats` leaves stale
    * paths (reads fail) or unlisted new files (rows silently missed), so
    * the file-name sets are compared up front and a mismatch throws
    * instead of returning a wrong answer. Unpartitioned directories
    * only: reading by explicit file list bypasses hive-style partition
    * discovery, so partition columns would be absent from the result.
    */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, dir: String,
      stats: DataFrame, statCol: String, lo: Long, hi: Long): DataFrame = {
    val statFiles = stats.select(col("__file")).collect()
      .map(_.getString(0))
    def basename(p: String): String = p.substring(p.lastIndexOf('/') + 1)
    val onDisk = java.nio.file.Files.list(java.nio.file.Paths.get(
        dir.stripPrefix("file:"))).iterator()
    val diskNames = new scala.collection.mutable.HashSet[String]
    while (onDisk.hasNext) {
      val n = onDisk.next().getFileName.toString
      if (n.endsWith(".parquet")) diskNames += n
    }
    val statNames = statFiles.map(basename).toSet
    if (statNames != diskNames)
      throw new IllegalStateException(
        s"stale zone-map stats for $dir: stats list ${statNames.size} " +
          s"files, directory has ${diskNames.size}; rebuild fileStats " +
          s"after any rewrite (missing=${(diskNames -- statNames).take(3)}" +
          s", gone=${(statNames -- diskNames).take(3)})")
    val files = stats
      .filter(col(s"max_$statCol") >= lo && col(s"min_$statCol") <= hi)
      .select(col("__file")).collect().map(_.getString(0))
    if (files.isEmpty)
      // everything pruned is the zone map's best case, not an error:
      // return an empty frame with the table's schema (metadata-only)
      spark.read.parquet(dir).where(lit(false))
    else spark.read.parquet(files.toIndexedSeq: _*)
  }
}
