package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.harmonize.{DataQuality, Harmonize}
import graft.sources.{Catalog, SourceAdapter}

/** The bucketed brick layout over the full EIGHT-source brick: written
  * once via Catalog.writeBrickBucketed, read back via readBrickBucketed,
  * downstream sid-joins run with zero shuffle exchange.
  */
class BrickLayoutSpec extends SparkSpec {

  test("bucketed 8-source brick round-trips and the sid join elides the exchange") {
    val brick = Harmonize.cachedBrick(spark, sf(), SourceAdapter.all)
    val path = Files.createTempDirectory("graft-brick-b").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Catalog.writeBrickBucketed(spark, brick, path, db = "graft_t")
      val back = Catalog.readBrickBucketed(spark, db = "graft_t")

      // read-back equality: the artifact IS the brick (row-level, not
      // just counts — content-hash ids make except() exact)
      assert(back.activities.count() == brick.activities.count())
      assert(back.activities.exceptAll(brick.activities).isEmpty &&
        brick.activities.exceptAll(back.activities).isEmpty)
      assert(back.substances.exceptAll(brick.substances).isEmpty)
      assert(back.properties.exceptAll(brick.properties).isEmpty)

      // the 10-check QC suite holds on the read-back artifact
      val dq = DataQuality.run(back, SourceAdapter.all.map(_.name).toSet)
      assert(dq.count(_.passed) == dq.size, dq.filterNot(_.passed).toString)

      // co-bucketed sid join: no exchange on either side
      val joined = back.activities.join(back.substances, "sid")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed sid join must not shuffle:\n$plan")
      val expected = brick.activities.join(brick.substances, "sid").count()
      assert(joined.count() == expected && expected > 0)

      // a sid aggregation over the bucketed table also skips the exchange
      val agg = back.activities.groupBy(col("sid")).agg(count(lit(1)))
      assert(!agg.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        "bucketed groupBy(sid) should be exchange-free")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq("activities_b", "substances_b", "properties_b").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS graft_t.$t"))
      spark.sql("DROP DATABASE IF EXISTS graft_t")
    }
  }
}
