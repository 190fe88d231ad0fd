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

  test("c6 attributes every raw document to exactly one stage, agreeing with c1") {
    val raw = Tables.documents(spark, sf())
      .groupBy(col("lang")).agg(count(lit(1)).as("n_raw"))
    val c6 = CurationQueries.queries("c6_attrition_report")(spark, sf())
    // partition property: per-language stage counts sum back to the corpus
    val attributed = c6.groupBy(col("lang")).agg(sum(col("n_docs")).as("n_att"))
    val mismatch = attributed.join(raw, Seq("lang"))
      .filter(col("n_att") =!= col("n_raw")).count()
    assert(mismatch == 0, "stage counts must partition the raw corpus")
    // the 'kept' row per language IS c1's census count
    val kept = c6.filter(col("stage") === "kept")
      .select(col("lang"), col("n_docs"))
    val c1 = CurationQueries.queries("c1_curation_pipeline")(spark, sf())
      .select(col("lang"), col("n_docs"))
    assert(kept.exceptAll(c1).count() == 0 && c1.exceptAll(kept).count() == 0,
      "c6 'kept' must equal the c1 census")
    // composition stays keyed: left joins against one-row-per-doc_id sets
    val plan = c6.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("c7 component split leaks zero near-dup pairs across splits") {
    val out = CurationQueries.queries("c7_leakage_safe_split")(spark, sf())
      .collect()
    // the guarantee: no J>=0.5 pair straddles splits under the
    // component rule, while the naive per-doc rule does leak (the
    // fixtures plant near-dup pairs, so a zero here would mean the
    // audit join itself is broken)
    assert(out.forall(_.getAs[Long]("n_cross_component") == 0L))
    assert(out.head.getAs[Long]("n_cross_naive") > 0L,
      "planted near-dups must leak under the naive per-doc rule")
    // split assignment partitions the corpus
    val total = Tables.documents(spark, sf()).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == total)
    // group accounting: every doc belongs to exactly one group, and
    // groups never have more members than docs
    out.foreach { r =>
      assert(r.getAs[Long]("n_groups") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_grouped_docs") <= r.getAs[Long]("n_docs"))
    }
  }

  test("c5 deciles partition the corpus monotonically in score") {
    val out = CurationQueries.queries("c5_quality_deciles")(spark, sf())
      .collect().sortBy(_.getAs[Int]("decile"))
    // every document lands in exactly one decile
    val total = Tables.documents(spark, sf()).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == total)
    // bins are score-ordered and non-overlapping: each decile's max is
    // at most the next decile's min (ties share an edge, never cross it)
    out.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Double]("max_score") <= hi.getAs[Double]("min_score"),
          s"deciles overlap: $lo vs $hi")
      case _ =>
    }
    // exact decile edges keep the bins balanced: no bin drifts further
    // than the tie-mass from n/10
    val sizes = out.map(_.getAs[Long]("n_docs"))
    assert(sizes.forall(s => s >= total / 10 - 5 && s <= total / 10 + 5),
      sizes.mkString(","))
  }
}
