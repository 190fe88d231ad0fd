package graft

import org.apache.spark.sql.functions._
import graft.sources.{Catalog, EventsAdapter, OrdersAdapter}

/** The SQL catalog surface: views, external tables with CBO statistics,
  * and the brick as named relations.
  */
class CatalogSpec extends SparkSpec {

  test("temp views expose every testdata table to SQL") {
    Catalog.registerViews(spark, sf())
    Catalog.tableNames.foreach { t =>
      assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) > 0, t)
    }
    // events view carries the normalized timestamp
    assert(spark.sql("SELECT ts FROM events LIMIT 1")
      .schema("ts").dataType.typeName == "timestamp")
  }

  test("external tables carry ANALYZE statistics for the cost-based planner") {
    Catalog.registerExternal(spark, sf(), db = "graft_test")
    val tables = spark.sql("SHOW TABLES IN graft_test")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(Catalog.tableNames.toSet.subsetOf(tables))
    // statistics stored in the catalog after ANALYZE...
    val described = spark.sql("DESC EXTENDED graft_test.lineitem")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(described.contains("Statistics"),
      described.keys.mkString(", "))
    assert(described("Statistics").contains("rows"), described("Statistics"))
    // ...and surfaced to the planner as a row count when CBO is on
    val cboWas = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val stats = spark.table("graft_test.lineitem")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.isDefined, "ANALYZE must produce a row count")
      assert(stats.rowCount.get.toLong ==
        Tables.lineitem(spark, sf()).count())
    } finally spark.conf.set("spark.sql.cbo.enabled", cboWas)
    // a stats-visible dimension joins broadcast without a hint
    val plan = spark.sql(
      """SELECT n_name, count(*) FROM graft_test.supplier
        |JOIN graft_test.nation ON s_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("the brick is queryable as named SQL relations") {
    import graft.harmonize.Harmonize
    Catalog.registerBrick(spark,
      Harmonize.cachedBrick(spark, sf(), Seq(EventsAdapter, OrdersAdapter)))
    val n = spark.sql(
      """SELECT count(*) FROM activities a
        |JOIN substances s ON a.sid = s.sid
        |JOIN properties p ON a.pid = p.pid""".stripMargin)
      .head().getLong(0)
    assert(n > 0)
    // smiles column reachable through SQL
    assert(spark.sql(
      "SELECT count(DISTINCT smiles) FROM activities").head().getLong(0) > 0)
  }
}
