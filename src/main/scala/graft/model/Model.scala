package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed core model — SURVEY §7.1 module 1. Case classes back the brick
  * tables with `Encoders.product` so pipelines can drop into typed
  * `Dataset[T]` where compile-time safety helps (ref schema:
  * src/80_harmonize.py:86-93 + README.md:2-31); `numvalue` closes the
  * README.md:24/37 gap. DataFrame remains the operator-boundary currency
  * (SURVEY §1.4).
  */
case class Substance(sid: String, source: String, data: String)

case class Property(pid: String, source: String, data: String)

case class Activity(aid: String, sid: String, pid: String, source: String,
    value: String, numvalue: Option[Double])

case class PropertyCategory(pid: String, category: String, reason: String,
    strength: Double)

case class PropertyTitle(pid: String, title: String)

object Model {
  def substances(df: DataFrame)(implicit s: SparkSession): Dataset[Substance] = {
    import s.implicits._; df.as[Substance]
  }
  def properties(df: DataFrame)(implicit s: SparkSession): Dataset[Property] = {
    import s.implicits._; df.as[Property]
  }
  def activities(df: DataFrame)(implicit s: SparkSession): Dataset[Activity] = {
    import s.implicits._; df.as[Activity]
  }
}
