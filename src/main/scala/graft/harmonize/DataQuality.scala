package graft.harmonize

import org.apache.spark.sql.functions._

/** Reusable data-quality suite — the reference's embedded assertions
  * (SURVEY §2.12) as named, composable checks over a Brick. The
  * reference fails its DVC stage on these (src/80_harmonize.py:96-105,
  * src/tests.py:17-56); here they return structured results so callers
  * choose between hard-fail (HarmonizeJob) and reporting.
  *
  * Scale notes: each check is one aggregate over already-materialized
  * brick tables — counts, distinct counts, and one anti-join; nothing
  * collects rows to the driver beyond the scalar results.
  */
object DataQuality {

  case class CheckResult(name: String, passed: Boolean, detail: String)

  /** Row-count floors, scaled by `minRows` (the reference hard-codes
    * 1e6/1e3/1e7 at production scale, src/80_harmonize.py:96-99).
    */
  def run(brick: Harmonize.Brick, adapterNames: Set[String],
      minRows: Long = 1): Seq[CheckResult] = {
    val nSubs = brick.substances.count()
    val nProps = brick.properties.count()
    val nActs = brick.activities.count()

    val pidDupes = nProps -
      brick.properties.select("pid", "source").distinct().count()

    val badSources = brick.activities.select("source").distinct()
      .collect().map(_.getString(0)).toSet -- adapterNames

    val aidDupes = nActs - brick.activities.select("aid").distinct().count()

    val orphanSids = brick.activities
      .join(brick.substances.select("sid"), Seq("sid"), "left_anti").count()
    val orphanPids = brick.activities
      .join(brick.properties.select("pid"), Seq("pid"), "left_anti").count()

    val propCounts = brick.properties.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val actPidCounts = brick.activities.groupBy("source")
      .agg(countDistinct(col("pid")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val badValues = brick.activities
      .filter(!col("value").isin("positive", "negative")).count()

    Seq(
      CheckResult("substances_nonempty", nSubs >= minRows,
        s"substances=$nSubs (floor $minRows)"),
      CheckResult("properties_nonempty", nProps >= 1,
        s"properties=$nProps"),
      CheckResult("activities_nonempty", nActs >= minRows,
        s"activities=$nActs (floor $minRows)"),
      CheckResult("pid_unique_per_source", pidDupes == 0,
        s"dupes=$pidDupes"),
      CheckResult("sources_closed", badSources.isEmpty,
        s"unknown=${badSources.mkString(",")}"),
      CheckResult("aid_unique", aidDupes == 0, s"dupes=$aidDupes"),
      CheckResult("fk_sid", orphanSids == 0, s"orphans=$orphanSids"),
      CheckResult("fk_pid", orphanPids == 0, s"orphans=$orphanPids"),
      CheckResult("property_count_consistency",
        propCounts == actPidCounts,
        s"properties=$propCounts activities=$actPidCounts"),
      CheckResult("closed_value_vocabulary", badValues == 0,
        s"bad=$badValues"))
  }
}
