package graft

import org.apache.spark.sql.functions._
import graft.queries.CurationQueries
import graft.sources.{EventsAdapter, SourceAdapter}

/** Plan-shape and composition properties of the curation capstone, plus
  * the staged-triplet memo contract.
  */
class CurationSpec extends SparkSpec {

  test("curation composes as semi/anti joins — no cartesian, no sort-based sampling") {
    val out = CurationQueries.queries("c1_curation_pipeline")(spark, sf())
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"stage composition must not explode rows:\n$plan")
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      s"exact-keep (semi) and near-dup-drop (anti) joins expected:\n$plan")
  }

  test("each curation stage only shrinks the corpus") {
    val total = Tables.documents(spark, sf()).count()
    val out = CurationQueries.queries("c1_curation_pipeline")(spark, sf())
    val curated = out.agg(sum(col("n_docs"))).head.getLong(0)
    assert(curated > 0 && curated <= total,
      s"curated=$curated total=$total")
  }

  test("cachedStaging returns the identical triplet instance per (session, dir, adapter)") {
    val a = SourceAdapter.cachedStaging(EventsAdapter, spark, sf())
    val b = SourceAdapter.cachedStaging(EventsAdapter, spark, sf())
    assert(a.activities eq b.activities, "memo must hand back the same frame")
    // and the memoized frame agrees with a fresh (unmemoized) staging run
    val fresh = EventsAdapter.staging(spark, sf())
    assert(a.activities.exceptAll(fresh.activities).count() == 0)
    assert(fresh.activities.exceptAll(a.activities).count() == 0)
  }
}
