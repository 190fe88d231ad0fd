package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the 100 TB semi-join-reduction
  * story: when a selective dimension filter can't be pushed into the
  * fact scan (the filter is on the other side of the join), Spark can
  * inject a bloom filter built from the filtered dim keys and apply it
  * below the fact side's shuffle, cutting exchanged rows before the
  * join. This spec pins the engine-level knobs that make Catalyst's
  * InjectRuntimeFilter rule fire so the capability is proven, not
  * assumed; thresholds exist because the filter only pays off when the
  * fact scan is large and the dim side small — exactly the 100 TB shape.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val knobs = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    // test tables are tiny; drop the size gates so the rule applies
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    // disable broadcast so the join actually shuffles both sides —
    // broadcast joins don't need (or get) a runtime filter
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  test("a selective dim filter injects a bloom filter on the fact side") {
    val saved = knobs.map { case (key, _) => key -> spark.conf.getOption(key) }
    knobs.foreach { case (key, v) => spark.conf.set(key, v) }
    try {
      val dim = Tables.orders(spark, sf())
        .filter(col("o_orderpriority") === "1-URGENT")
      val fact = Tables.lineitem(spark, sf())
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("bloom"),
        s"no runtime bloom filter in plan:\n$optimized")
      // and the filtered plan still computes the right answer
      val expected = fact.join(dim.hint("broadcast"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .collect().toSet
      assert(joined.collect().toSet == expected)
    } finally {
      saved.foreach {
        case (key, Some(v)) => spark.conf.set(key, v)
        case (key, None)    => spark.conf.unset(key)
      }
    }
  }
}
