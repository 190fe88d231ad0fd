package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated test tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir. At
  * cluster scale these would be partitioned directories; `spark.read
  * .parquet` handles both transparently, and Catalyst pushes filters /
  * prunes columns into the scan either way.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts arrives in one of two physical forms depending on the
    * testdata generation (both observed from the driver):
    *
    *   - parquet TIMESTAMP(NANOS): Spark's reader surfaces it as LongType
    *     (nanos since epoch) under the legacy conf. `ts_ns` keeps the raw
    *     long; `ts` is re-derived as a microsecond timestamp. Integer
    *     `div` (not `/`): Divide promotes to double and epoch nanos
    *     (~1e18) exceed 2^53, so a double round-trip can shift the value
    *     by up to ~256 ns and the truncated microsecond by 1.
    *   - parquet TIMESTAMP(MICROS, ntz): read natively as TIMESTAMP_NTZ;
    *     `ts_ns` is derived as micros × 1000 (sub-microsecond digits are
    *     zero by construction) and `ts` normalizes to a session-UTC
    *     timestamp.
    *
    * Either way the contract downstream is identical: `ts_ns` BIGINT
    * epoch-nanos that bit-matches DuckDB's `epoch_ns(ts)` on the same
    * file, and `ts` a microsecond-precision timestamp for event-time
    * work. Branching on the READ dtype (not a conf) keeps every
    * events-based query working across driver regenerations.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr}
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      case _ =>
        raw.select(col("event_id"),
          expr("unix_micros(cast(ts as timestamp)) * 1000").as("ts_ns"),
          col("user_id"), col("event_type"), col("value"), col("props"),
          col("ts").cast("timestamp").as("ts"))
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
