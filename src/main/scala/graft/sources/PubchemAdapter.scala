package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Composite pubchem-shaped integrator
  * (ref: src/09_integrate_pubchem.py:24-62) — the reference's ONE
  * Spark-native pipeline, re-expressed over the testdata:
  *
  *   1. long-format compound properties: the raw compound table arrives
  *      as (id, property, value) key-value rows; compounds are the
  *      `property == 'PUBCHEM_IUPAC_INCHI'` slice (py:25-26). Here the
  *      part table unpivots to the same long shape, with a deterministic
  *      slice of ids carrying a SECOND conflicting InChI record.
  *   2. single-entry window filter: ids with more than one InChI row are
  *      ambiguous and dropped (py:28-30 `count over Window.partitionBy
  *      (id) == 1`) — the planted duplicates exercise exactly this.
  *   3. assay dim: one property row per bioassay with its descriptive
  *      columns (py:38-44) — an orders slice stands in.
  *   4. activities: the long bioassay table filtered to
  *      `pubchem_activity_outcome` ∈ {Active, Inactive} → pos/neg,
  *      NaN-cid guard, inner joins to the assay dim and the compound
  *      slice, then DISTINCT over (sid, pid, inchi, value) (py:51-59).
  *
  * Deviations, both documented engine conventions: ids are content
  * hashes, not `monotonically_increasing_id` (py:31 — non-deterministic
  * across runs/partitionings; SURVEY §4 decision 2), and the exported
  * substance/property rows are restricted to the joined activity set so
  * the brick's per-source pid consistency invariant holds (the reference
  * exports ALL bea rows and breaks its own src/tests.py invariant — same
  * stance as the bindingdb adapter's kept-set export).
  *
  * Scale notes: the unpivot is a map-side expand; the single-entry
  * filter is one window count keyed by compound id (bounded groups); the
  * two activity joins hash-partition on their keys and AQE broadcasts
  * the dims when small — the reference hand-tunes 200 shuffle partitions
  * for the same joins (py:12).
  */
object PubchemAdapter extends SourceAdapter {
  val name = "pubchem"

  def staging(s: SparkSession, d: String): StagingTriplet = {
    val part = Tables.part(s, d)

    // (id, property, pvalue) long rows: one InChI record per part, a
    // planted conflicting second record for ids % 13 == 0, plus the
    // non-structure properties the INCHI filter must discard
    val inchiRows = part.select(col("p_partkey").as("id"),
      lit("iupac_inchi").as("property"),
      concat(lit("InChI=1S/P"), col("p_partkey").cast("string")).as("pvalue"))
    val dupRows = part.filter(col("p_partkey") % 13 === 0)
      .select(col("p_partkey").as("id"),
        lit("iupac_inchi").as("property"),
        concat(lit("InChI=1S/P"), col("p_partkey").cast("string"),
          lit("v2")).as("pvalue"))
    val brandRows = part.select(col("p_partkey").as("id"),
      lit("brand").as("property"), col("p_brand").as("pvalue"))
    val typeRows = part.select(col("p_partkey").as("id"),
      lit("ptype").as("property"), col("p_type").as("pvalue"))
    val cmpLong = inchiRows
      .unionByName(dupRows).unionByName(brandRows).unionByName(typeRows)

    // py:25-30: INCHI slice + single-entry window filter
    val cmp = cmpLong
      .filter(col("property") === "iupac_inchi")
      .withColumnRenamed("pvalue", "inchi")
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col("id"))))
      .filter(col("__cnt") === 1)
      .drop("__cnt", "property")
      .withColumn("sid", md5(concat(lit("pc:"), col("id").cast("string"))))

    // py:38-44: the assay dim with its descriptive columns
    val bea = Tables.orders(s, d)
      .filter(col("o_orderkey") % 4 === 0)
      .select(col("o_orderkey").as("assay_id"), col("o_orderpriority"),
        col("o_orderstatus"))
      .withColumn("pid",
        md5(concat(lit("pcassay:"), col("assay_id").cast("string"))))

    // py:51-56: long activity rows → outcome filter → pos/neg decode
    val actlong = Tables.lineitem(s, d)
      .select(col("l_partkey").as("pubchem_cid"),
        col("l_orderkey").as("assay_id"),
        col("l_returnflag").as("outcome"), col("l_linestatus").as("status"))
      .unpivot(Array(col("pubchem_cid"), col("assay_id")),
        Array(col("outcome"), col("status")), "property", "avalue")
    val act1 = actlong
      .filter(col("property") === "outcome")
      .filter(col("avalue").isin("A", "R"))
      .filter(col("pubchem_cid").isNotNull)  // py:55 isnan guard
      .withColumn("value",
        when(col("avalue") === "A", "positive").otherwise("negative"))

    // py:57-59: join assay dim + compound slice, DISTINCT over the final
    // narrow schema, content-hash aid
    val act2 = act1
      .join(bea, Seq("assay_id"))
      .join(cmp.withColumnRenamed("id", "pubchem_cid"), Seq("pubchem_cid"))

    val subs = act2.select(col("pubchem_cid"), col("inchi")).distinct()
      .withColumn("data", to_json(struct(col("inchi"), col("pubchem_cid"))))
      .withColumn("sid",
        md5(concat(lit("pc:"), col("pubchem_cid").cast("string"))))
      .select("sid", "data")

    val props = act2
      .select(col("assay_id"), col("o_orderpriority"), col("o_orderstatus"))
      .distinct()
      .withColumn("data", to_json(struct(col("assay_id"),
        col("o_orderpriority"), col("o_orderstatus"))))
      .withColumn("pid",
        md5(concat(lit("pcassay:"), col("assay_id").cast("string"))))
      .select("pid", "data")

    val acts = act2
      .select(col("sid"), col("pid"), col("inchi"), col("value"))
      .distinct()
      .withColumn("aid", concat(lit("pubchem-"), md5(concat_ws("|",
        col("sid"), col("pid"), col("inchi"), col("value")))))
      .withColumn("numvalue", lit(null).cast("double"))
      .select("aid", "sid", "pid", "inchi", "value", "numvalue")

    StagingTriplet(subs, props, acts)
  }
}
