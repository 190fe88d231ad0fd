package graft

import org.apache.spark.sql.functions._
import graft.functions.HeavyHitters

/** Misra-Gries guarantees that the a17 query relies on, checked on data
  * skewed enough to force evictions (the documents corpus is too uniform
  * to exercise them).
  */
class HeavyHittersSpec extends SparkSpec {

  test("containment and error bound hold on skewed data across partitions") {
    import spark.implicits._
    val k = 10
    val data = Seq.fill(1000)("hot") ++
      (1 to 9).flatMap(i => Seq.fill(100)(s"warm$i")) ++
      (1 to 400).map(i => s"cold$i")
    val n = data.size.toLong // 2300; error bound n/(k+1) = 209
    val sk = data.toDF("tok").repartition(8)
      .agg(HeavyHitters.mgSketch(k)(col("tok")))
      .head.getMap[String, Long](0).toMap
    assert(sk.size <= k, "summary exceeded its memory bound")
    // any item with freq > n/(k+1) must survive every merge order
    assert(sk.contains("hot"))
    // retained counts are lower bounds within the error bound
    sk.foreach { case (t, c) =>
      val truth =
        if (t == "hot") 1000L
        else if (t.startsWith("warm")) 100L
        else 1L
      assert(c <= truth, s"$t overestimated: $c > $truth")
      assert(truth - c <= n / (k + 1), s"$t undercounted past the bound")
    }
  }

  test("summary is exact when the vocabulary fits in k counters") {
    import spark.implicits._
    val data = Seq.fill(7)("a") ++ Seq.fill(5)("b") ++ Seq.fill(3)("c")
    val sk = data.toDF("tok").repartition(4)
      .agg(HeavyHitters.mgSketch(10)(col("tok")))
      .head.getMap[String, Long](0).toMap
    assert(sk == Map("a" -> 7L, "b" -> 5L, "c" -> 3L))
  }

  test("single-partition reduce path also respects the counter bound") {
    import spark.implicits._
    val data = (1 to 500).map(i => s"t${i % 37}")
    val sk = data.toDF("tok").repartition(1)
      .agg(HeavyHitters.mgSketch(5)(col("tok")))
      .head.getMap[String, Long](0).toMap
    assert(sk.size <= 5)
  }
}
