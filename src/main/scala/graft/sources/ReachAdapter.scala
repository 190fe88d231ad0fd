package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Ops

/** Composite reach-shaped integrator
  * (ref: src/05_integrate_reach.R:8-60) over lineitem × supplier:
  *
  *   1. GHS hazard lookup: the raw records inner-join a repo-shipped TSV
  *      of hazard-code → description rows (R:9-13 reads
  *      `src/helper/ghs.txt` and `inner_join(ghshazards, by="hazard")` —
  *      codes outside the table drop out). The lookup is a ~10-row file
  *      read with the delimited-text source and broadcast.
  *   2. corrupt-record removal: an ecnumber mapping to more than one
  *      SMILES is dropped (R:1 documents the corruption; R:17-18
  *      `group_by(ecnumber) filter(n_distinct(smiles)==1)`)
  *   3. structure build: smiles → inchi per surviving record (R:21-31's
  *      rdkit map, here the deterministic stub convention)
  *   4. per-property support: only hazards with > 100 positives AND
  *      > 100 negatives keep activities (R:51-53) — the reference's own
  *      thresholds, which hold at every testdata sf
  *
  * Scale notes: the lookup join is a broadcast of a static file; the
  * single-smiles filter is one window pass keyed by ecnumber (bounded
  * groups); the support filter is two conditional window counts per
  * hazard. The raw join (fact × supplier dim) broadcasts the dim.
  */
object ReachAdapter extends SourceAdapter {
  val name = "reach"

  def staging(s: SparkSession, d: String): StagingTriplet = {
    val ghs = s.read
      .option("sep", "\t").option("header", "true")
      .csv("/root/repo/resources/ghs_hazards.tsv")

    val raw = Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .withColumn("hazard",
        concat(lit("H2"), (col("s_nationkey") % 10).cast("string")))
      .join(broadcast(ghs), Seq("hazard"))  // R:13 inner join = filter
      .withColumn("ecnumber", concat(lit("EC"),
        col("l_orderkey").cast("string"), lit("-"),
        col("l_partkey").cast("string")))
      .withColumn("smiles", concat(lit("R"),
        col("l_partkey").cast("string"), lit("x"),
        col("l_linenumber").cast("string")))

    // R:17-18: ecnumbers with one distinct smiles survive
    val single = Ops.discordanceFilter(raw, Seq("ecnumber"), "smiles")

    val valued = single
      .withColumn("inchi", concat(lit("InChI=1S/"), col("smiles")))
      .withColumn("value",
        when(col("l_quantity") >= 25, "positive").otherwise("negative"))

    // R:51-53: > 100 positives AND > 100 negatives per hazard
    val wh = Window.partitionBy(col("hazard"))
    val sup = valued
      .withColumn("__npos",
        sum(when(col("value") === "positive", 1).otherwise(0)).over(wh))
      .withColumn("__nneg",
        sum(when(col("value") === "negative", 1).otherwise(0)).over(wh))
      .filter(col("__npos") > 100 && col("__nneg") > 100)
      .drop("__npos", "__nneg")

    val sid = md5(concat(lit("reach:"), col("ecnumber")))
    val pid = md5(concat(lit("ghs:"), col("hazard")))

    // the testdata fact table carries rare duplicate physical keys
    // (same order/part/line twice with different measures — the same
    // corruption the reference's header comment complains about); both
    // records share an ecnumber+smiles so the single-smiles filter
    // keeps them. Rank within ecnumber (quantity always differs inside
    // a duplicate pair) disambiguates the content-hash aid — the
    // bindingdb adapter's mrn pattern, a deterministic parallel
    // replacement for the reference's global row_number (R:56).
    val ranked = sup.withColumn("mrn", row_number().over(
      Window.partitionBy(col("ecnumber"))
        .orderBy(col("l_quantity"), col("l_suppkey"))))

    val subs = sup.select(col("ecnumber"), col("smiles"), col("inchi"))
      .distinct()
      .withColumn("data",
        to_json(struct(col("ecnumber"), col("inchi"), col("smiles"))))
      .withColumn("sid", sid)
      .select("sid", "data")

    val props = sup.select(col("hazard"), col("description")).distinct()
      .withColumn("data", to_json(struct(col("description"), col("hazard"))))
      .withColumn("pid", pid)
      .select("pid", "data")

    // numvalue keeps the measured magnitude the reference drops
    val acts = ranked
      .withColumn("sid", sid)
      .withColumn("pid", pid)
      .withColumn("numvalue", col("l_quantity").cast("double"))
      .withColumn("aid", concat(lit("reach-"), md5(concat_ws("|",
        col("sid"), col("pid"), col("mrn").cast("string")))))
      .select("aid", "sid", "pid", "inchi", "value", "numvalue")

    StagingTriplet(subs, props, acts)
  }
}
