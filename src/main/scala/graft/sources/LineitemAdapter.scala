package graft.sources

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.operators.Ops

/** Composite chembl-shaped integrator — the full multi-pattern pipeline
  * of the reference's richest source (ref: src/02_integrate_chembl.R:24-86)
  * over the testdata fact table:
  *
  *   1. id-per-group: sid per part, pid per supplier nation (R:24-26,55-57)
  *   2. 3-way join: lineitem ⋈ part ⋈ supplier (R:40) — compound and
  *      assay metadata attach to the fact rows
  *   3. case_when decode: return flag (+quantity threshold) → positive/
  *      negative, unmapped rows dropped (R:31-52)
  *   4. discordance filter: keep (sid, pid) pairs with a single distinct
  *      value (R:60)
  *   5. support filters: keep pids with enough distinct substances and
  *      enough of BOTH classes (R:61-62)
  *   6. nest-to-JSON substance/property payloads (R:67-86)
  *
  * Scale notes: the joins are equi-joins on the fact's foreign keys (AQE
  * broadcasts the dims at small scale, hash-partitions at large); the
  * discordance and support filters are window counts partitioned by their
  * group keys — no driver collect anywhere; the pair-level median is a
  * bounded-group percentile (one part×nation pair's rows).
  */
object LineitemAdapter extends SourceAdapter {
  val name = "lineitem"

  /** Support thresholds (chembl uses 100 distinct compounds / 50 per
    * class at production scale, R:60-62; scaled to testdata).
    */
  val MinSubstances = 20
  val MinPerClass = 10

  def staging(s: SparkSession, d: String): StagingTriplet = {
    val sid = md5(concat(lit("part:"), col("p_partkey").cast("string")))
    val pid = md5(concat(lit("snation:"), col("s_nationkey").cast("string")))

    // 3-way join + decode; `otherwise(null)` + filter drops unmapped
    // rows exactly like chembl's case_when → NA → drop
    val decoded = Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .withColumn("value",
        when(col("l_returnflag") === "A", "positive")
          .when(col("l_returnflag") === "R", "negative")
          .when(col("l_returnflag") === "N" && col("l_quantity") >= 40,
            "positive")
          .when(col("l_returnflag") === "N" && col("l_quantity") <= 10,
            "negative")
          .otherwise(lit(null)))
      .filter(col("value").isNotNull)
      .withColumn("sid", sid)
      .withColumn("pid", pid)

    // keep only unambiguous pairs, then one row per (sid, pid) with the
    // exact median magnitude (bounded group: one pair's rows)
    val pairs = Ops.discordanceFilter(decoded, Seq("sid", "pid"), "value")
      .groupBy(col("sid"), col("pid"), col("s_nationkey"), col("p_partkey"),
        col("p_brand"), col("value"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("numvalue"))

    // pid-level support: enough substances AND enough of both classes
    val w = Window.partitionBy(col("pid"))
    val supported = pairs
      .withColumn("__nsid", count(lit(1)).over(w))
      .withColumn("__npos",
        sum(when(col("value") === "positive", 1).otherwise(0)).over(w))
      .withColumn("__nneg",
        sum(when(col("value") === "negative", 1).otherwise(0)).over(w))
      .filter(col("__nsid") >= MinSubstances &&
        col("__npos") >= MinPerClass && col("__nneg") >= MinPerClass)
      .drop("__nsid", "__npos", "__nneg")

    // nest-to-JSON payloads from the SUPPORTED set, so the staging
    // triplet satisfies the properties↔activities consistency invariant
    // the reference tests (src/tests.py:17-56)
    val subs = supported.select(col("p_partkey"), col("p_brand")).distinct()
      .withColumn("data", to_json(struct(col("p_partkey"), col("p_brand"))))
      .withColumn("sid", sid)
      .select("sid", "data")

    val props = supported.select(col("s_nationkey")).distinct()
      .withColumn("data", to_json(struct(col("s_nationkey"))))
      .withColumn("pid", pid)
      .select("pid", "data")

    val acts = supported
      .withColumn("inchi",
        concat(lit("InChI=1S/P"), col("p_partkey").cast("string")))
      .withColumn("aid",
        concat(lit("lineitem-"), md5(concat_ws("|", col("sid"), col("pid")))))
      .select("aid", "sid", "pid", "inchi", "value", "numvalue")

    StagingTriplet(subs, props, acts)
  }
}
