package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named batch of driver-checkable queries.
  *
  * `queries` maps name -> (spark, sfDir) => DataFrame; `oracle` maps the
  * same name -> equivalent DuckDB SQL over the same parquet tables. A query
  * with no oracle entry gets the driver's weaker rows-only check (used only
  * for ops not expressible in SQL, e.g. MinHash-LSH).
  *
  * Contract (driver compare): column NAMES must match between the Spark
  * result and the oracle result (the compare sorts columns by name), and
  * the row multiset must match. Every query here also sorts its output by
  * a unique key so row ORDER is deterministic under any partitioning.
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]
}
