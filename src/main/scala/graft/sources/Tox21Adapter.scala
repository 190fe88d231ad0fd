package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Ops

/** Composite tox21-shaped integrator
  * (ref: src/03_integrate_tox21.R:16-59) over lineitem × orders:
  *
  *   1. legal-outcome decode + categorical QC filters (R:19-25:
  *      `ASSAY_OUTCOME %in% legal_outcomes`, `PURITY_RATING == "A"`,
  *      `REPRODUCIBILITY %in% (...)` → returnflag decode to the three
  *      assay classes, order-status purity gate, quantity band)
  *   2. duplicate-sample removal: a structure key carrying more than one
  *      distinct physical sample is ambiguous and dropped (R:28
  *      `group_by(SMILES) filter(n_distinct(SAMPLE_ID)==1)` → here a
  *      part appearing twice in one order)
  *   3. the 3-class → 2-assay pos/neg EXPANSION (R:31-46 `posneg`): every
  *      surviving row is emitted once per active-assay outcome — positive
  *      for its own class, negative for the sibling class, inactive rows
  *      negative for both. This is the integrator's signature shape: a
  *      1→2 generator, NOT a join.
  *   4. per-(sid, pid) discordance filter (R:52 `filter(n_distinct(value)
  *      == 1)`) then collapse to one row per pair
  *   5. per-(pid, class) support floor (R:55 `n() > 100`, scaled: >= 26)
  *      and the two-class requirement (R:56 `n_distinct(value) == 2`)
  *
  * Scale notes: the expansion is a map-side explode over a 2-element
  * literal array (no shuffle, bounded 2× growth); the dup-sample and
  * discordance filters are single window passes keyed by composite keys
  * with bounded groups; support + two-class are two more window passes
  * on the collapsed (pid-sized) frame. No collect, no global window.
  */
object Tox21Adapter extends SourceAdapter {
  val name = "tox21"

  def staging(s: SparkSession, d: String): StagingTriplet = {
    val legal = Seq("active agonist", "active antagonist", "inactive")
    val raw = Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderstatus") === "F")                   // purity A
      .filter(col("l_quantity") >= 2 && col("l_quantity") <= 45) // repro
      .withColumn("outcome",
        when(col("l_returnflag") === "A", "active agonist")
          .when(col("l_returnflag") === "R", "active antagonist")
          .otherwise("inactive"))
      .filter(col("outcome").isin(legal: _*))                 // R:21

    // R:28 single-sample structures: (order, part) pairs listing the same
    // part on two lines are the testdata's duplicate-sample records
    val single = Ops.discordanceFilter(raw,
      Seq("l_orderkey", "l_partkey"), "l_linenumber")

    // R:31-46: the 2-assay expansion
    val expanded = single
      .withColumn("assay",
        explode(array(lit("active agonist"), lit("active antagonist"))))
      .withColumn("value",
        when(col("outcome") === col("assay"), "positive")
          .otherwise("negative"))

    // R:52 discordance at (sid, pid) granularity, then collapse
    val collapsed = Ops.discordanceFilter(expanded,
        Seq("l_partkey", "o_orderpriority", "l_linestatus", "assay"),
        "value")
      .select(col("l_partkey"), col("o_orderpriority"), col("l_linestatus"),
        col("assay"), col("value"))
      .distinct()

    // R:55 per-(pid, class) support; R:56 both classes present
    val sup = Ops.groupSupportFilter(collapsed,
      Seq("o_orderpriority", "l_linestatus", "assay", "value"), 26L)
    val wp = Window.partitionBy(col("o_orderpriority"), col("l_linestatus"),
      col("assay"))
    val kept = sup
      .withColumn("__two",
        min(col("value")).over(wp) =!= max(col("value")).over(wp))
      .filter(col("__two"))
      .drop("__two")

    val sid = md5(concat(lit("t21:"), col("l_partkey").cast("string")))
    val pid = md5(concat(lit("t21prop:"), col("o_orderpriority"), lit("|"),
      col("l_linestatus"), lit("|"), col("assay")))

    val subs = kept.select(col("l_partkey")).distinct()
      .withColumn("data", to_json(struct(col("l_partkey"))))
      .withColumn("sid", sid)
      .select("sid", "data")

    val props = kept
      .select(col("o_orderpriority"), col("l_linestatus"), col("assay"))
      .distinct()
      .withColumn("data", to_json(struct(col("assay"), col("l_linestatus"),
        col("o_orderpriority"))))
      .withColumn("pid", pid)
      .select("pid", "data")

    // one row per (sid, pid) after the filters (R:57-58 asserts exactly
    // this), so the content-hash aid is unique; no numeric magnitude in
    // this source (the reference's tox21 activities carry none either)
    val acts = kept
      .withColumn("sid", sid)
      .withColumn("pid", pid)
      .withColumn("inchi",
        concat(lit("InChI=1S/P"), col("l_partkey").cast("string")))
      .withColumn("aid",
        concat(lit("tox21-"), md5(concat_ws("|", col("sid"), col("pid")))))
      .withColumn("numvalue", lit(null).cast("double"))
      .select("aid", "sid", "pid", "inchi", "value", "numvalue")

    StagingTriplet(subs, props, acts)
  }
}
