package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Connected-components correctness on hand-built graphs where the
  * component structure is known by construction, plus the transitivity
  * property dd8 exists to provide (a~b, b~c groups {a,b,c} even when
  * a~c is not an edge).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("chain collapses to one component labeled by its min node") {
    // 1-2-3-4-5 path: diameter 4, exercises multi-round propagation
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep separate min labels") {
    val got = components(Seq((1L, 2L), (5L, 6L), (6L, 7L), (9L, 9L)))
    assert(got == Map(1L -> 1L, 2L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 9L -> 9L))
  }

  test("transitive grouping: a~b, b~c puts a and c together without an a~c edge") {
    val got = components(Seq((10L, 20L), (20L, 30L)))
    assert(got(10L) == got(30L) && got(10L) == 10L)
  }

  test("edge direction does not matter") {
    val fwd = components(Seq((1L, 2L), (2L, 3L)))
    val rev = components(Seq((3L, 2L), (2L, 1L)))
    assert(fwd == rev)
  }

  test("long chain converges within the round budget (diameter rounds)") {
    // 15-node path needs 14 propagation rounds + 1 to confirm fixpoint,
    // inside the default maxIters=20
    val edges = (1L to 15L).sliding(2).map(w => (w(0), w(1))).toSeq
    val out = Graph.connectedComponents(edges.toDF("a", "b"), "a", "b")
    assert(out.as[(Long, Long)].collect().forall(_._2 == 1L))
  }

  private def componentsStar(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponentsStar(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("star variant agrees with propagation on chains, forks and self-pairs") {
    val cases = Seq(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)),
      Seq((1L, 2L), (5L, 6L), (6L, 7L), (9L, 9L)),
      Seq((10L, 20L), (20L, 30L)),
      Seq((3L, 2L), (2L, 1L), (7L, 8L), (8L, 6L), (6L, 7L)))
    cases.foreach { es =>
      assert(componentsStar(es) == components(es), s"disagree on $es")
    }
  }

  test("star variant collapses a chain far deeper than its round budget") {
    // 200-hop path: propagation would need 199 rounds; large/small-star
    // contracts it within the default 30 (O(log^2 n))
    val edges = (1L to 200L).sliding(2).map(w => (w(0), w(1))).toSeq
    val out = componentsStar(edges)
    assert(out.size == 200 && out.values.forall(_ == 1L))
  }

  test("star variant on branching graphs with cycles matches propagation") {
    // two shallow 7-ary trees (depth ~3, inside propagation's budget)
    // plus extra in-tree cross links that create cycles — deterministic,
    // no RNG
    val treeA = (1L to 400L).map(i => (i, i / 7))
    val treeB = (1L to 300L).map(i => (1000L + i, 1000L + i / 5))
    val cycles = (50L to 400L by 50L).map(i => (i, i - 3))
    val edges = (treeA ++ treeB ++ cycles).filter { case (a, b) => a != b }
    assert(componentsStar(edges) == components(edges))
  }

  test("incremental components over new edges equal a one-shot over full history") {
    // day 1: two components {1,2,3} and {10,11}, plus singleton 20
    val day1 = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L))
    val assign1 = Graph.connectedComponents(day1.toDF("a", "b"), "a", "b")
    // day 2: a bridge merging the two components, a brand-new pair, and
    // an edge attaching a new node to the singleton
    val day2 = Seq((3L, 10L), (30L, 31L), (20L, 21L))
    val got = Graph.incrementalComponents(
        assign1, day2.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val oneShot = components(day1 ++ day2)
    assert(got == oneShot, s"incremental $got vs one-shot $oneShot")
    // and the merged component is labeled by the global minimum
    assert(got(11L) == 1L && got(21L) == 20L && got(31L) == 30L)
  }

  test("incremental build over an empty increment is the identity") {
    val day1 = Seq((1L, 2L), (5L, 6L))
    val assign1 = Graph.connectedComponents(day1.toDF("a", "b"), "a", "b")
    val got = Graph.incrementalComponents(assign1,
        Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == components(day1))
  }
}
