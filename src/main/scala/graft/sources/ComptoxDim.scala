package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The comptox-shaped structure dimension both DSSTox-keyed integrators
  * join against (ref: src/01_integrate_toxvaldb.R:10-11 and
  * src/04_integrate_toxcast.R:12-14 both read
  * `comptox$dsstox_identifiers` and inner-join it to attach `inchi`).
  *
  * In the testdata the customer table stands in for the identifier dim:
  * one row per entity key, an InChI synthesized from the key, and a
  * deterministic slice of entities carrying a NULL structure — the
  * reference's records whose dsstox row lacks an InChI, which the
  * integrators drop with `filter(!is.na(inchi))` (R:11,
  * 09_integrate_pubchem's isnan guard). Sharing ONE dim object between
  * ToxvaldbAdapter and ToxcastAdapter mirrors the reference exactly: two
  * pipelines resolving structures through the same identifier brick, so
  * the same entity harmonizes to the same substance across sources.
  */
object ComptoxDim {

  /** (dtxsid_key, inchi) — inchi NULL for keys % 9 == 4. Callers inner
    * join on their natural key and filter `inchi IS NOT NULL`.
    */
  def apply(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey").as("dtxsid_key"),
        when(col("c_custkey") % 9 === 4, lit(null))
          .otherwise(concat(lit("InChI=1S/C"), col("c_custkey").cast("string")))
          .as("inchi"))
}
