package graft

import org.apache.spark.sql.functions._

/** The exactness-config scale path (SURVEY §7.4 risk 6): approx
  * count-distinct must track exact within its rsd bound on real data.
  */
class ApproxSpec extends SparkSpec {
  test("approx_count_distinct within 10% of exact on lineitem keys") {
    val rows = Tables.lineitem(spark, sf())
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_suppkey"), 0.02).as("a"),
        countDistinct(col("l_suppkey")).as("e"))
      .collect()
    rows.foreach { r =>
      val a = r.getLong(1).toDouble
      val e = r.getLong(2).toDouble
      assert(math.abs(a - e) / e <= 0.10, s"approx $a vs exact $e")
    }
  }
}
