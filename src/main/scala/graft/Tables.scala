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

  /** events.ts is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; the legacy conf reads it as LongType
    * (nanos since epoch). `ts_ns` keeps the raw long for ordering;
    * `ts` is re-derived as a microsecond timestamp for event-time work.
    * Integer `div` (not `/`): Divide promotes to double and epoch nanos
    * (~1e18) exceed 2^53, so a double round-trip can shift the value by
    * up to ~256 ns and the truncated microsecond by 1.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts_ns div 1000)"))
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
