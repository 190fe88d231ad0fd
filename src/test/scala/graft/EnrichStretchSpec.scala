package graft

import org.apache.spark.sql.functions._
import graft.enrich.Enrich
import graft.harmonize.Harmonize
import graft.sources.SourceAdapter

/** D6 title uniqueness at 10× the properties dimension (VERDICT r7 #6)
  * — the EnrichStretch transform over the sf0.001 fourteen-source
  * brick, asserted in-suite; the measured sf0.1 row lives in
  * BENCH_LOCAL.md (Test/runMain graft.EnrichStretch).
  */
class EnrichStretchSpec extends SparkSpec {

  private lazy val props =
    Harmonize.cachedBrick(spark, sf(), SourceAdapter.all).properties

  test("10x-replicated properties keep titles unique and deterministic") {
    val stretched = EnrichStretch.stretchProps(props, 10)
    val n = stretched.count()
    // the brick properties table holds one row per contributing source;
    // the enrichment contract (and the stretch) starts from the
    // distinct (pid, data) dimension
    assert(n == props.select("pid", "data").distinct().count() * 10)
    // pid space stays collision-free by construction
    assert(stretched.select("pid").distinct().count() == n)
    val t1 = Enrich.titles(stretched)
    EnrichStretch.checkTitles(t1)
    // replicas share payloads, so collision groups are 10x deep: every
    // base must fan out into exactly its group size of distinct titles
    val t2 = Enrich.titles(stretched)
    assert(t1.except(t2).isEmpty && t2.except(t1).isEmpty,
      "title pass not deterministic under replication")
  }

  test("suffix sequence is dense per collision group") {
    val stretched = EnrichStretch.stretchProps(props.limit(20), 10)
    val t = Enrich.titles(stretched)
      .withColumn("base",
        regexp_replace(col("title"), " #\\d+$", ""))
    val g = t.groupBy("base").agg(
      count(lit(1)).as("n"),
      sum(when(col("title") === col("base"), 1).otherwise(0)).as("n_base"))
    // exactly one unsuffixed winner per group
    assert(g.filter(col("n_base") =!= 1).isEmpty)
  }
}
