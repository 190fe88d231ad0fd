package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, Options, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted word-5-gram window index — the ARTIFACT form of the
  * substring-dedup family's shared frame (x18/x20/x21/x22/x23 use the
  * session-memoized equivalent; this operator is the production
  * posture those queries' scaladocs point at: at corpus scale the
  * window explode is written ONCE next to the data and every dedup /
  * contamination / containment pass reads it instead of re-streaming
  * the text). Completes the persisted-index family alongside the
  * minhash/simhash band tables, ScalarQuantIndex, ProductQuantIndex,
  * and IvfPqIndex; x24_window_index_lifecycle puts write → append →
  * append under the DuckDB oracle every round.
  *
  * Layout under `path` — a SNAPSHOT-POINTER table (the round-11
  * redesign closing the r10 verdict/advice items: O(batch) appends,
  * no census-visibility gap, crash states recoverable):
  *
  *   batches/<id>/windows/  (doc_id, lang, source, g, h) — one row per
  *                          window position g (1-based), h = md5 of
  *                          the space-joined window
  *   batches/<id>/manifest/ (doc_id) — every doc the batch indexed
  *                          (including short docs with zero windows)
  *   census/<id>/           (h, d0, d1) — per-hash min/max doc_id over
  *                          ALL committed windows; the dup criterion
  *                          is d0 ≠ d1 (≥2 distinct docs)
  *   _CURRENT               one small text file: the committed census
  *                          id + the ordered committed batch ids
  *
  * The POINTER FILE is the single commit point. Every write/append
  * builds new immutable dirs under fresh unique ids, then atomically
  * replaces `_CURRENT` (FileContext.rename with OVERWRITE — atomic on
  * POSIX and HDFS). Readers resolve the pointer once and only ever
  * read dirs it lists, so a reader NEVER sees a half-written batch or
  * a missing census — the delete-then-rename visibility gap of the
  * r10 design is gone by construction. A crash at any point leaves
  * either the old pointer (plus inert orphan dirs, reclaimed by
  * [[vacuum]]) or the new pointer over fully-written dirs.
  *
  * Incremental maintenance is O(batch + |census|), never O(index):
  *
  *   - the `seen` anti-join reads the MANIFEST dirs (one narrow row
  *     per document), not a distinct-scan of every window row;
  *   - the census refresh merges the PRIOR census (one narrow row per
  *     distinct hash) with the new batch's min/max aggregate — text is
  *     never re-read and the full windows/ tree is never re-aggregated
  *     (min-of-mins / max-of-maxes is exact for the d0≠d1 criterion).
  *
  * WindowIndexSpec pins append(a)+append(b) ≡ write(a∪b), re-append
  * idempotence, the incremental census ≡ a full recompute, and that
  * orphan (uncommitted) dirs are invisible to readers.
  *
  * CONCURRENCY CONTRACT — single writer, many readers. Readers are
  * always safe (snapshot isolation via the pointer). Two concurrent
  * MAINTAINERS of one index path are NOT arbitrated here: both could
  * pass the manifest anti-join and double-insert a doc's windows, and
  * the last pointer flip wins. Route concurrent build-once use through
  * [[graft.ArtifactStore]] (which elects exactly one builder per
  * content key — the x24 gate query does exactly that) or serialize
  * maintenance externally.
  */
object WindowIndex {

  private val windowsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("source", StringType), StructField("g", IntegerType),
    StructField("h", StringType)))
  private val manifestSchema = StructType(Seq(
    StructField("doc_id", LongType)))
  private val censusSchema = StructType(Seq(
    StructField("h", StringType), StructField("d0", LongType),
    StructField("d1", LongType)))

  /** The window explode as a pure function of a documents frame —
    * SINGLE DEFINITION shared with the query-side session memo
    * (TextQueries.win5), so the artifact and the in-session frame
    * cannot drift. Linear in |tokens|; no shuffle.
    */
  def windows(docs: DataFrame): DataFrame =
    docs
      .withColumn("ts", split(lower(col("text")), " "))
      .filter(size(col("ts")) >= 5)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(expr(
          "transform(sequence(1, size(ts) - 4), g -> struct(g as g, " +
            "md5(concat_ws(' ', ts[g-1], ts[g], ts[g+1], ts[g+2], " +
            "ts[g+3])) as h))")).as("w"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("w.g").as("g"), col("w.h").as("h"))

  /** Hashes in ≥2 DISTINCT docs from a window frame — min≠max, never
    * countDistinct (one map-combinable aggregate; the r9 measured
    * 1.54×/1.29× shape note on TextQueries.dupHashes applies).
    */
  def dupHashesOf(wins: DataFrame): DataFrame =
    censusOf(wins).filter(col("d0") =!= col("d1")).select(col("h"))

  /** Per-hash (min doc, max doc) — the census row shape stored under
    * census/<id>/ and merged incrementally on append.
    */
  def censusOf(wins: DataFrame): DataFrame =
    wins.groupBy(col("h"))
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))

  /** Initialize (or reinitialize) the index at `path` from scratch. */
  def write(docs: DataFrame, path: String): Unit = {
    val spark = docs.sparkSession
    val fs = hfs(spark, path)
    fs.delete(new HPath(path), true)
    fs.mkdirs(new HPath(path))
    commitBatch(spark, path, docs, Nil)
  }

  /** Append only documents the index has not seen (anti-join on the
    * stored doc-id MANIFEST — retried batches are no-ops; an UPDATED
    * document requires a rebuild, the same frozen-per-id contract as
    * every index in the family). O(batch + |census|): neither the text
    * of prior batches nor their window rows are ever re-read.
    */
  def append(docsNew: DataFrame, path: String): Unit = {
    val spark = docsNew.sparkSession
    val cur = readCurrent(spark, path)
    val seen = readConcat(spark, path, cur.batches.map(b =>
      s"$path/batches/$b/manifest"), manifestSchema)
    val fresh = docsNew.join(seen, Seq("doc_id"), "left_anti")
    commitBatch(spark, path, fresh, cur.batches)
  }

  /** Write one batch's immutable dirs + the merged census under a
    * fresh unique id, then flip the pointer. `priorBatches` is the
    * committed list the new snapshot extends ([] for `write`).
    */
  private def commitBatch(spark: SparkSession, path: String,
      docs: DataFrame, priorBatches: Seq[String]): Unit = {
    val mf = docs.select(col("doc_id")).distinct()
    // a fully-redelivered batch commits nothing — not even an empty
    // snapshot (zero-row parquet dirs are unreadable; and the census
    // cannot have changed without new docs)
    if (priorBatches.nonEmpty && mf.isEmpty) return
    val id = java.util.UUID.randomUUID().toString
    mf.write.parquet(s"$path/batches/$id/manifest")
    windows(docs).write.parquet(s"$path/batches/$id/windows")
    // batch stats from the just-written COLUMNAR rows (no re-explode),
    // merged with the prior narrow census — min-of-mins/max-of-maxes
    val batchCensus = censusOf(
      readConcat(spark, path, Seq(s"$path/batches/$id/windows"),
        windowsSchema))
    val priorCensus = readCensus(spark, path, readPointer(spark, path))
    priorCensus.unionByName(batchCensus)
      .groupBy(col("h"))
      .agg(min(col("d0")).as("d0"), max(col("d1")).as("d1"))
      .write.parquet(s"$path/census/$id")
    flipPointer(spark, path, Snapshot(id, priorBatches :+ id))
  }

  /** Remove every batch/census dir the committed pointer does not
    * reference — orphans from crashed maintenance. Single-writer: run
    * only when no append is in flight (an in-flight append's dirs are
    * not yet referenced and would be reclaimed).
    */
  def vacuum(spark: SparkSession, path: String): Unit = {
    val fs = hfs(spark, path)
    val cur = readCurrent(spark, path)
    def sweep(sub: String, keep: Set[String]): Unit = {
      val d = new HPath(s"$path/$sub")
      if (fs.exists(d))
        fs.listStatus(d).foreach { st =>
          if (!keep.contains(st.getPath.getName))
            fs.delete(st.getPath, true): Unit
        }
    }
    sweep("batches", cur.batches.toSet)
    sweep("census", Set(cur.census))
  }

  def readWindows(spark: SparkSession, path: String): DataFrame = {
    val cur = readCurrent(spark, path)
    readConcat(spark, path,
      cur.batches.map(b => s"$path/batches/$b/windows"), windowsSchema)
  }

  def readManifest(spark: SparkSession, path: String): DataFrame = {
    val cur = readCurrent(spark, path)
    readConcat(spark, path,
      cur.batches.map(b => s"$path/batches/$b/manifest"), manifestSchema)
  }

  def readDup(spark: SparkSession, path: String): DataFrame =
    readCensusCur(spark, path)
      .filter(col("d0") =!= col("d1")).select(col("h"))

  /** The committed (h, d0, d1) census snapshot. */
  def readCensusCur(spark: SparkSession, path: String): DataFrame =
    readCensus(spark, path, Some(readCurrent(spark, path)))

  /** Count of committed batches — the lifecycle audit column x24 pins
    * (a no-op re-append must not grow it).
    */
  def batchCount(spark: SparkSession, path: String): Long =
    readCurrent(spark, path).batches.size.toLong

  // ---- snapshot pointer ----

  private case class Snapshot(census: String, batches: Seq[String])

  private def hfs(spark: SparkSession, path: String) =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readPointer(spark: SparkSession,
      path: String): Option[Snapshot] = {
    val fs = hfs(spark, path)
    val p = new HPath(s"$path/_CURRENT")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = try org.apache.commons.io.IOUtils.toByteArray(in)
      finally in.close()
      val lines = new String(bytes, StandardCharsets.UTF_8)
        .split('\n').map(_.trim).filter(_.nonEmpty).toSeq
      require(lines.nonEmpty, s"corrupt window-index pointer $p")
      Some(Snapshot(lines.head, lines.tail))
    }
  }

  private def readCurrent(spark: SparkSession, path: String): Snapshot =
    readPointer(spark, path).getOrElse(throw new java.io.IOException(
      s"no committed window index at $path (missing _CURRENT)"))

  /** Atomic pointer replace: write to a uniquely-named temp file, then
    * FileContext.rename with OVERWRITE — atomic on POSIX local fs and
    * HDFS, so a reader sees either the old or the new snapshot, never
    * a missing or partial pointer.
    */
  private def flipPointer(spark: SparkSession, path: String,
      snap: Snapshot): Unit = {
    val fs = hfs(spark, path)
    val tmp = new HPath(
      s"$path/._CURRENT.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write((snap.census +: snap.batches).mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val fc = FileContext.getFileContext(
      tmp.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new HPath(s"$path/_CURRENT"),
      Options.Rename.OVERWRITE)
  }

  private def readCensus(spark: SparkSession, path: String,
      snap: Option[Snapshot]): DataFrame =
    readConcat(spark, path,
      snap.map(s => s"$path/census/${s.census}").toSeq, censusSchema)

  /** Read the union of parquet dirs with a pinned schema; an empty dir
    * list yields an empty frame of that schema (a fresh index, or a
    * write() over empty docs) instead of a schema-inference failure.
    */
  private def readConcat(spark: SparkSession, path: String,
      dirs: Seq[String], schema: StructType): DataFrame =
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dirs: _*)
}
