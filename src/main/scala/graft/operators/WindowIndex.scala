package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted word-5-gram window index — the ARTIFACT form of the
  * substring-dedup family's shared frame (x18/x20/x21/x22/x23 use the
  * session-memoized equivalent; this operator is the production
  * posture those queries' scaladocs point at: at corpus scale the
  * window explode is written ONCE next to the data and every dedup /
  * contamination / containment pass reads it instead of re-streaming
  * the text). Completes the persisted-index family alongside the
  * minhash/simhash band tables, ScalarQuantIndex, ProductQuantIndex,
  * and IvfPqIndex.
  *
  * Layout under `path`:
  *
  *   windows/ (doc_id, lang, source, g, h) — one row per window
  *            position g (1-based), h = md5 of the space-joined window
  *   dup/     (h) — hashes present in ≥2 distinct docs (the shared
  *            dup criterion, derived VIEW of windows/)
  *
  * Incremental maintenance: `append` adds only NEW documents' windows
  * (anti-join on doc_id against the stored index — a re-appended
  * batch is a no-op, the IvfPqIndex.append idempotence contract), then
  * refreshes dup/ with one aggregate over the STORED window rows — the
  * census must be global (a new doc can flip an old hash into dup
  * status), but refreshing it never re-reads or re-explodes any text:
  * it is one map-combinable min/max pass over the columnar index, the
  * cheap leg by an order of magnitude. WindowIndexSpec pins
  * append(a)+append(b) ≡ write(a∪b) and re-append idempotence.
  */
object WindowIndex {

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
    wins.groupBy(col("h"))
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
      .filter(col("d0") =!= col("d1")).select(col("h"))

  def write(docs: DataFrame, path: String): Unit = {
    windows(docs).write.mode("overwrite").parquet(s"$path/windows")
    refreshDup(docs.sparkSession, path)
  }

  /** Append only documents the index has not seen (anti-join on
    * doc_id — retried batches are no-ops; an UPDATED document requires
    * a rebuild, the same frozen-per-id contract as every index in the
    * family), then refresh the global dup census off the stored rows.
    */
  def append(docsNew: DataFrame, path: String): Unit = {
    val spark = docsNew.sparkSession
    val seen = spark.read.parquet(s"$path/windows")
      .select(col("doc_id")).distinct()
    windows(docsNew.join(seen, Seq("doc_id"), "left_anti"))
      .write.mode("append").parquet(s"$path/windows")
    refreshDup(spark, path)
  }

  /** Rebuild dup/ from windows/ — one aggregate over the columnar
    * index, no text. Written to a temp sibling then swapped in, so a
    * concurrent reader never sees a half-written census.
    */
  private def refreshDup(spark: SparkSession, path: String): Unit = {
    val tmp = s"$path/.dup-next"
    dupHashesOf(spark.read.parquet(s"$path/windows"))
      .write.mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dup = new org.apache.hadoop.fs.Path(s"$path/dup")
    fs.delete(dup, true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dup))
      throw new java.io.IOException(s"could not publish $tmp -> $dup")
  }

  def readWindows(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/windows")

  def readDup(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/dup")
}
