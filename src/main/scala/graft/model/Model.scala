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

/** Full reference activities schema (src/80_harmonize.py:68-86 + README
  * ER diagram): `inchi` is the structure key the smiles enrichment joins
  * on, `smiles` the joined-back conversion, `binary_value` the 0/1 form
  * of `value`; `numvalue` additionally closes the README.md:24/37 gap
  * (the reference drops the raw magnitude).
  */
case class Activity(aid: String, sid: String, pid: String, source: String,
    inchi: String, smiles: String, value: String, binary_value: Int,
    numvalue: Option[Double])

case class PropertyCategory(pid: String, category: String, reason: String,
    strength: Double)

/** prop_json_data carries the property's canonical JSON alongside the
  * title (ref: src/92_llm_property_titles.py:71).
  */
case class PropertyTitle(pid: String, title: String, prop_json_data: String)

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
