package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.enrich.Enrich
import graft.harmonize.Harmonize
import graft.sources.SourceAdapter

/** Enrichment at stretch scale (VERDICT r7 #6): the e1/e3 operators run
  * on the FOURTEEN-source brick's properties dimension replicated 10×
  * with fresh pids but UNCHANGED payloads — the worst case for the D6
  * title pass, because every replica of a property lands in the same
  * title-base collision group (group sizes grow 10×, forcing the
  * deterministic ' #n' suffix path on ~90% of rows instead of the ~0%
  * a same-shape corpus growth would produce).
  *
  * Shared by the spec (10× the sf0.001 brick, asserts) and the
  * measured probe main (10× the sf0.1 brick → ~344k properties,
  * BENCH_LOCAL.md round-8 row).
  */
object EnrichStretch {

  /** 10× the properties dim: one explode (no unioned self-scans), pid
    * remapped per replica exactly like StretchGen remaps entity keys —
    * md5-fresh so the pid space stays collision-free by construction.
    * The input is reduced to distinct (pid, data) first — the brick
    * properties table carries one row per CONTRIBUTING SOURCE (shared
    * properties appear once per source), and the enrichment operators
    * all start from the same distinct.
    */
  def stretchProps(props: DataFrame, factor: Int = 10): DataFrame =
    props.select(col("pid"), col("data")).distinct()
      .withColumn("__rep", explode(sequence(lit(0), lit(factor - 1))))
      .select(
        when(col("__rep") === 0, col("pid"))
          .otherwise(md5(concat(col("pid"), lit(":"), col("__rep"))))
          .as("pid"),
        col("data"))

  def checkTitles(titles: DataFrame): Unit = {
    val n = titles.count()
    val distinctTitles = titles.select("title").distinct().count()
    require(n == distinctTitles,
      s"title collision at stretch: $n rows, $distinctTitles titles")
    val distinctPids = titles.select("pid").distinct().count()
    require(n == distinctPids, s"pid fanout: $n rows, $distinctPids pids")
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "enrich-stretch")
    spark.sparkContext.setLogLevel("ERROR")
    StretchGen.ensure(spark, d): Unit
    import spark.implicits._

    val props = Harmonize.cachedBrick(spark, d, SourceAdapter.all)
      .properties
    val base = props.select("pid", "data").distinct().count()
    val stretched = stretchProps(props, factor)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = stretched.count()
    println(f"[estretch] properties: $base%d -> $n%d (${factor}x)")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[estretch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    // D5 throughput: the RuleLabeler flatMap over every property (the
    // e1 shape without the display sort)
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      val labeled = stretched.as[(String, String)]
        .flatMap { case (pid, data) =>
          Enrich.RuleLabeler.label(data).map { case (c, r, st) =>
            (pid, c, r, st) }
        }.toDF("pid", "category", "reason", "strength")
      val rows = labeled.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[estretch] e1.label pass$pass $rows%d labels  $sec%6.2fs  " +
        f"${n / sec}%,.0f props/s")
    }

    // D6 at 10×: deterministic and collision-free under 10×-deep
    // collision groups
    val t1 = time("e3.titles")(Enrich.titles(stretched)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
    t1.count()
    time("e3.uniqueness-check")(checkTitles(t1))
    val t2 = Enrich.titles(stretched)
    val diff = time("e3.determinism-diff")(
      t1.except(t2).count() + t2.except(t1).count())
    require(diff == 0, s"titles not deterministic at stretch: $diff rows")
    println("[estretch] OK")
    spark.stop()
  }
}
