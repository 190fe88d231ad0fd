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

  /** Materialize the brick as BUCKETED catalog tables — the layout a
    * long-lived brick deployment wants at scale: activities and
    * substances co-bucketed (and sorted) on sid, properties on pid, so
    * every downstream sid/pid join or aggregation starts from the
    * join key's partitioning and elides its exchange entirely. The
    * bucket count is the knob to size so each bucket's biggest table
    * slice fits an executor (at 17 GB reference scale, hundreds; here
    * 8). BrickLayoutSpec asserts the exchange elision on the written
    * tables.
    */
  def writeBrickBucketed(spark: SparkSession, brick: Harmonize.Brick,
      path: String, db: String = "graft", buckets: Int = 8): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    def save(df: org.apache.spark.sql.DataFrame, name: String,
        key: String): Unit =
      df.write.mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", s"$path/$name").saveAsTable(s"$db.$name")
    save(brick.substances, "substances_b", "sid")
    save(brick.properties, "properties_b", "pid")
    save(brick.activities, "activities_b", "sid")
  }

  /** The consume path of the write-once artifact: a Brick whose three
    * tables are the BUCKETED catalog relations, so a fresh session (or
    * a downstream job that never ran harmonize) gets the exchange-free
    * sid/pid join layout straight from storage — no staging, no
    * assembly, no memo. This plus `writeBrickBucketed` is the 100 TB
    * brick lifecycle: one job builds and buckets; every consumer reads
    * the layout (BrickLayoutSpec proves read-back equality and that
    * the bucketing survives the round-trip).
    */
  def readBrickBucketed(spark: SparkSession,
      db: String = "graft"): Harmonize.Brick =
    Harmonize.Brick(
      spark.table(s"$db.substances_b"),
      spark.table(s"$db.properties_b"),
      spark.table(s"$db.activities_b"))

  /** Write the brick as BUCKETED FILES under `dir`, keeping no catalog
    * state (VERDICT r14 #2 — the ArtifactStore layout step). Spark's
    * only bucketed-file writer is saveAsTable, so each table goes
    * through a throwaway external catalog entry whose path is the
    * target subdir and which is dropped right after — the files, with
    * bucket ids encoded in their names, remain. Any session can later
    * adopt them with [[registerBrickBucketedFiles]]; the file layout is
    * also a superset of the plain artifact (spark.read.parquet ignores
    * bucket names), so non-catalog readers keep working.
    */
  def writeBrickBucketedFiles(spark: SparkSession, brick: Harmonize.Brick,
      dir: String, buckets: Int): Unit = {
    def save(df: org.apache.spark.sql.DataFrame, name: String,
        key: String): Unit = {
      val t = "graft_tmp_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      // repartition on the bucket key FIRST: repartition's
      // HashPartitioning and the bucket-file assignment use the same
      // murmur3 pmod, so each write task holds exactly one bucket and
      // emits exactly one file — without it every scan task writes its
      // own file per bucket (~94 files/bucket at sf0.1, 3 000 tiny
      // files per table; guide §6), and multi-file buckets also void
      // the SORTED BY metadata for readers.
      df.repartition(buckets, org.apache.spark.sql.functions.col(key))
        .write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
        .option("path", s"$dir/$name").saveAsTable(t)
      spark.sql(s"DROP TABLE $t")
    }
    save(brick.substances, "substances", "sid")
    save(brick.properties, "properties", "pid")
    save(brick.activities, "activities", "sid")
  }

  /** Adopt bucketed brick FILES (written by
    * [[writeBrickBucketedFiles]], possibly by another JVM) as catalog
    * tables in THIS session, returning the catalog-backed Brick. The
    * external CREATE TABLE carries the bucket spec (CLUSTERED/SORTED
    * BY), which is what makes every scan report hashpartitioning(key,
    * buckets) — sid/pid-keyed aggregates and joins over the brick then
    * plan with their fact-side exchange ELIDED, and the partitioning
    * survives a persist() (InMemoryRelation keeps the cached plan's
    * output partitioning; BrickLayoutSpec pins both). Table names are
    * keyed by a hash of the RESOLVED dir — not just the content key —
    * so differently-sourced bricks coexist AND two artifact-store
    * BASES holding the same content never collide on one table (a
    * temp-store test registering then deleting its base must not
    * leave a default-base session reading the dead location).
    * Registration is idempotent per session; an adopted existing
    * table is REFRESHed so a pruned-and-rebuilt dir (same path, new
    * part files) doesn't serve stale file listings.
    */
  def registerBrickBucketedFiles(spark: SparkSession, dir: String,
      buckets: Int): Harmonize.Brick = {
    val suffix = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(12)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_brick")
    def reg(name: String, key: String): org.apache.spark.sql.DataFrame = {
      val tbl = s"graft_brick.${name}_$suffix"
      if (!spark.catalog.tableExists(tbl))
        spark.sql(
          s"""CREATE TABLE $tbl
             |(${spark.read.parquet(s"$dir/$name").schema.toDDL})
             |USING parquet
             |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
             |LOCATION '$dir/$name'""".stripMargin)
      else spark.sql(s"REFRESH TABLE $tbl")
      spark.table(tbl)
    }
    Harmonize.Brick(reg("substances", "sid"), reg("properties", "pid"),
      reg("activities", "sid"))
  }
}
