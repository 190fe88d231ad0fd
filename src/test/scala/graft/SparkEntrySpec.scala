package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries._

/** Contract guards for the driver surface: module key sets must be
  * disjoint (SparkEntry builds one Map — a duplicate name would silently
  * shadow a query), every oracle entry must have a query, and names must
  * be driver-safe.
  */
class SparkEntrySpec extends AnyFunSuite {

  private val modules: Seq[(String, QueryModule)] = Seq(
    "Relational" -> RelationalQueries,
    "Join" -> JoinQueries,
    "Window" -> WindowQueries,
    "SortSample" -> SortSampleQueries,
    "SetReshape" -> SetReshapeQueries,
    "ScalarFunc" -> ScalarFuncQueries,
    "Harmonize" -> HarmonizeQueries,
    "Text" -> TextQueries,
    "Dedup" -> DedupQueries,
    "Curation" -> CurationQueries,
    "Similarity" -> SimilarityQueries,
    "Streaming" -> StreamingQueries,
    "Multimodal" -> MultimodalQueries,
    "Enrich" -> EnrichQueries,
    "SourceSink" -> SourceSinkQueries)

  test("query names are globally unique across modules") {
    val all = modules.flatMap { case (m, q) => q.queries.keys.map(_ -> m) }
    val dupes = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dupes.isEmpty, s"duplicated query names: $dupes")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle entry has a matching query") {
    modules.foreach { case (m, q) =>
      val orphans = q.oracle.keySet -- q.queries.keySet
      assert(orphans.isEmpty, s"$m oracle without query: $orphans")
    }
  }

  test("names are driver-safe (no whitespace or path characters)") {
    SparkEntry.queries.keys.foreach { n =>
      assert(n.matches("[a-z0-9_]+"), s"unsafe query name: $n")
    }
  }

  test("the flagship entry query is registered") {
    assert(SparkEntry.queries.contains("q1_pricing_summary"))
  }

  // The round-5 gate-shrink tripwire (VERDICT r6 #7): the correctness
  // surface has a COMMITTED size, and every query must carry a DuckDB
  // oracle — the driver records a weaker rows-only check otherwise, and
  // a query silently dropping out of either map would otherwise ride a
  // full round unnoticed (round 5 shipped 176 → 138 exactly that way).
  test("gate integrity: surface size matches the committed count") {
    assert(SparkEntry.queries.size == SparkEntry.expectedQueryCount,
      s"queries.size=${SparkEntry.queries.size} != committed " +
        s"${SparkEntry.expectedQueryCount}; if the surface change is " +
        "intentional, update SparkEntry.expectedQueryCount")
  }

  test("gate integrity: every query has an oracle (full-strength gate)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }
}
