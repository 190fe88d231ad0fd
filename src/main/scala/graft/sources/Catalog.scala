package graft.sources

import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.harmonize.Harmonize

/** Catalog surface: the testdata tables and the brick as named SQL
  * relations, three ways —
  *
  *   - `registerViews`: session temp views (the lightweight path the
  *     q2/q6-q9 SQL queries use ad hoc, centralized);
  *   - `registerExternal`: external catalog tables
  *     (`CREATE TABLE ... USING parquet LOCATION`) + `ANALYZE TABLE` so
  *     the tables carry row/size statistics — this is what unlocks
  *     cost-based join planning (CBO reorder, stats-driven broadcast
  *     decisions) for pure-SQL users, on top of AQE's runtime stats;
  *   - `registerBrick`: the harmonized tables as views.
  *
  * The reference has no catalog (paths wired through DVC stage args);
  * a queryable engine needs one (CatalogSpec).
  */
object Catalog {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Temp views named after the testdata tables (events carries the
    * ts_ns/ts normalization from Tables.events).
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach {
      case "events" =>
        Tables.events(spark, sfDir).createOrReplaceTempView("events")
      case t =>
        Tables.t(spark, sfDir, t).createOrReplaceTempView(t)
    }

  /** External catalog tables with computed statistics, in database
    * `db`. Raw file schemas (events keeps its nanos-long `ts`; the
    * legacy nanos conf is set so the scan works).
    */
  def registerExternal(spark: SparkSession, sfDir: String,
      db: String = "graft"): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    tableNames.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $db.$t")
      spark.sql(
        s"CREATE TABLE $db.$t USING parquet LOCATION '$sfDir/$t.parquet'")
      spark.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS")
    }
  }

  /** The harmonized brick as substances/properties/activities views. */
  def registerBrick(spark: SparkSession, brick: Harmonize.Brick): Unit = {
    brick.substances.createOrReplaceTempView("substances")
    brick.properties.createOrReplaceTempView("properties")
    brick.activities.createOrReplaceTempView("activities")
  }
}
