package graft

import graft.harmonize.Harmonize
import graft.sources.{EventsAdapter, LineitemAdapter, OrdersAdapter}

/** Dev tool: first-touch attribution for the brick build —
  * `sbt "Test/runMain graft.BrickProfile [sfDir]"` times each staging
  * triplet and the harmonized tables separately, so bench regressions in
  * the h-family can be pinned to a stage instead of guessed at.
  */
object BrickProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus, "brick-profile")
    spark.sparkContext.setLogLevel("ERROR")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[prof] $n%-26s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$c")
    }
    time("events.staging.acts") {
      EventsAdapter.staging(spark, d).activities.count()
    }
    time("orders.staging.acts") {
      OrdersAdapter.staging(spark, d).activities.count()
    }
    time("lineitem.staging.acts") {
      LineitemAdapter.staging(spark, d).activities.count()
    }
    time("events.staging.warm") {
      EventsAdapter.staging(spark, d).activities.count()
    }
    val b = Harmonize.brick(spark, d,
      Seq(EventsAdapter, OrdersAdapter, LineitemAdapter))
    time("brick.substances") { b.substances.count() }
    time("brick.properties") { b.properties.count() }
    time("brick.activities") { b.activities.count() }
    time("brick.activities.warm") { b.activities.count() }
    spark.stop()
  }
}
