package graft

import graft.harmonize.{DataQuality, Harmonize}
import graft.sources.SourceAdapter

/** Dev tool: stage attribution for the full harmonize macro-run —
  * `sbt "Test/runMain graft.BrickProfile [sfDir] [outDir]"` times every
  * adapter's staging, each harmonized table, the QC suite, and the
  * parquet write separately (the whole HarmonizeJob surface), so macro
  * regressions pin to a stage instead of being guessed at, and the
  * sf0.01 → sf0.1 ratio per stage exposes anything superlinear.
  */
object BrickProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse(
      s"/tmp/graft-brick-profile-${System.nanoTime()}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus, "brick-profile")
    spark.sparkContext.setLogLevel("ERROR")
    StretchGen.ensure(spark, d): Unit
    val t00 = System.nanoTime()
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[prof] $n%-26s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$c")
    }
    SourceAdapter.all.foreach { a =>
      time(s"${a.name}.staging.acts") {
        SourceAdapter.cachedStaging(a, spark, d).activities.count()
      }
    }
    val t1 = System.nanoTime()
    val b = Harmonize.cachedBrick(spark, d, SourceAdapter.all)
    println(f"[prof] brick.checkpoint         ${(System.nanoTime() - t1) / 1e9}%6.2fs (3 tables, from cached stagings)")
    time("brick.substances") { b.substances.count() }
    time("brick.properties") { b.properties.count() }
    time("brick.activities") { b.activities.count() }
    val t2 = System.nanoTime()
    val dq = DataQuality.run(b, SourceAdapter.all.map(_.name).toSet)
    println(f"[prof] data_quality(10 checks)  ${(System.nanoTime() - t2) / 1e9}%6.2fs pass=${dq.count(_.passed)}/10")
    val t3 = System.nanoTime()
    b.substances.write.mode("overwrite").parquet(s"$out/substances.parquet")
    b.properties.write.mode("overwrite").parquet(s"$out/properties.parquet")
    b.activities.write.mode("overwrite").parquet(s"$out/activities.parquet")
    println(f"[prof] brick.write.parquet      ${(System.nanoTime() - t3) / 1e9}%6.2fs -> $out")
    println(f"[prof] TOTAL                    ${(System.nanoTime() - t00) / 1e9}%6.2fs")
    spark.stop()
  }
}
