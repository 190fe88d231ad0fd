package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Remaining source formats — SURVEY §2.1. S6 (delimited text scan +
  * broadcast lookup join, the GHS-table pattern of
  * src/05_integrate_reach.R:11-13) reads the repo-shipped TSV; the
  * oracle inlines the same 5 rows as VALUES so the driver needs no file
  * access. S2/S9 (glob scan + parquet sink round-trip) are covered in
  * SourceSinkSpec — they need a scratch directory, which oracle SQL
  * can't see. S5 (JDBC) is declared but untestable offline: no JDBC
  * driver jar ships with the container; the call shape is
  * `spark.read.format("jdbc").option("url", "jdbc:sqlite:...")` as in
  * SURVEY §2.1.
  */
object SourceSinkQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    "s6_csv_lookup" -> ((s, d) => {
      val lookup = s.read
        .option("sep", "\t").option("header", "true")
        .csv("/root/repo/resources/region_lookup.tsv")
      Tables.region(s, d)
        .join(broadcast(lookup), Seq("r_name"))
        .join(Tables.nation(s, d),
          col("r_regionkey") === col("n_regionkey"))
        .groupBy(col("continent_group"))
        .agg(count(lit(1)).as("n_nations"),
          countDistinct(col("code")).as("n_regions"))
        .orderBy(col("continent_group"))
    })
  )

  val oracle: Map[String, String] = Map(
    "s6_csv_lookup" ->
      """SELECT continent_group, count(*) AS n_nations,
        |  count(DISTINCT code) AS n_regions
        |FROM region
        |JOIN (VALUES ('AFRICA','AF','emea'), ('AMERICA','AM','amer'),
        |  ('ASIA','AS','apac'), ('EUROPE','EU','emea'),
        |  ('MIDDLE EAST','ME','emea'))
        |  AS l(r_name, code, continent_group) USING (r_name)
        |JOIN nation ON r_regionkey = n_regionkey
        |GROUP BY 1 ORDER BY continent_group""".stripMargin
  )
}
