package graft.sources

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Composite bindingdb-shaped integrator — the reference's wide-assay
  * pipeline (ref: src/10_integrate_bindingdb.R:44-88) over the testdata
  * fact table:
  *
  *   1. N-measure unpivot: six measured-value columns melt to
  *      (metric, value) rows, nulls dropped (R:54 `pivot_longer` with
  *      `values_drop_na`)
  *   2. metric subset: only four of the six unpivoted metrics carry
  *      activities (R:77 `metric %in% c('EC50','IC50','Kd','Ki')`)
  *   3. censored-value parse: measurements arrive as strings with
  *      comparator prefixes ('>1000', '<5') or as unparseable markers;
  *      strip the comparators, cast, drop what doesn't parse
  *      (R:76 `as.numeric(gsub(">|<", "", value))` + `!is.na`)
  *   4. per-metric threshold case_when → positive/negative (R:78-88)
  *   5. per-group ids: sid per substance group, pid per
  *      (property-columns, metric) group (R:55-56)
  *
  * Scale notes: the unpivot is a map-side 1→N expand (no shuffle); the
  * censor parse runs per metric on the wide row BEFORE the expand (see
  * the in-method comment — post-expand it trips a Spark 4.1.2
  * whole-stage-codegen subexpression-elimination bug and the stage
  * falls back to interpreted) and the thresholds are codegen'd
  * expressions on the expanded rows; the only shuffle is the
  * aid-disambiguation window, partitioned
  * by the near-unique physical row key (no skew, bounded state). The
  * reference assigns aid by a GLOBAL `row_number()` (R:74) — a
  * single-partition sort at scale; here the aid is a content hash of the
  * row key plus a per-key rank, deterministic and fully parallel.
  */
object BindingdbAdapter extends SourceAdapter {
  val name = "bindingdb"

  def staging(s: SparkSession, d: String): StagingTriplet = {
    // censored-value synthesis + parse, PER METRIC and BEFORE the
    // unpivot: a deterministic slice of the measurements carries
    // comparator prefixes or an unparseable marker (the raw bindingdb
    // dump's '>'/'<'/blank forms); the parse is the reference's
    // strip-and-cast, and rows that don't parse drop out. Only the four
    // metrics that carry activities are synthesized — the dropped two
    // never contribute activities/ids anyway (props derive from the
    // kept set). A null raw measure stays null through the parse
    // (concat/cast of null is null), so the unpivot's null drop below
    // subsumes the reference's pre-melt values_drop_na.
    //
    // Parsing BEFORE the unpivot (wide columns in, wide columns out) is
    // deliberate: when this expression sat after the Expand, the
    // pushed-down isnotnull(numvalue) filter duplicated it, and
    // whole-stage codegen's subexpression elimination hoisted the copy
    // into a helper function whose parameter was the Expand's
    // mutable-state slot — `UTF8String expand_mutableStateArray_0[0]`,
    // invalid Java — so janino rejected the stage and the WHOLE
    // unpivot+parse ran interpreted (Spark codegen bug, observed on
    // 4.1.2). Pre-Expand the inputs are plain locals, the stage stays
    // inside WholeStageCodegen, and the Expand carries 4 doubles
    // instead of 6, with all string work done once on the wide row.
    def parsed(metric: String, v: Column): Column = {
      val censor =
        (col("l_orderkey") + col("l_linenumber") + lit(metric.length)) % 11
      val vstr =
        when(censor === 3, concat(lit(">"), v.cast("string")))
          .when(censor === 5, concat(lit("<"), v.cast("string")))
          .when(censor === 7, lit("n/d"))
          .otherwise(v.cast("string"))
      // try_cast, not cast: ANSI mode (Spark 4 default) throws on 'n/d';
      // the reference's as.numeric yields NA — rows drop, jobs don't die
      regexp_replace(vstr, "[<>]", "").try_cast("double").as(metric)
    }
    val wide = Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
      col("l_linestatus"),
      parsed("m_qty", col("l_quantity").cast("double")),
      parsed("m_price", col("l_extendedprice").cast("double")),
      parsed("m_disc", col("l_discount").cast("double")),
      parsed("m_tax", col("l_tax").cast("double")))
    // 1→4 map-side expand; the null drop removes both the raw nulls and
    // the censor slice that failed to parse — same final set as the
    // post-expand filter chain it replaces
    val kept0 = wide.unpivot(
      Array(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_linestatus")),
      Array(col("m_qty"), col("m_price"), col("m_disc"), col("m_tax")),
      "metric", "numvalue")
      .filter(col("numvalue").isNotNull)

    // per-metric binarization thresholds (R:78-88's Ki/IC50/Kd/EC50
    // cutoffs, scaled to the testdata measure domains)
    val kept = kept0
      .withColumn("value",
        when(col("metric") === "m_qty" && col("numvalue") < 25, "positive")
          .when(col("metric") === "m_price" && col("numvalue") < 30000,
            "positive")
          .when(col("metric") === "m_disc" && col("numvalue") < 0.05,
            "positive")
          .when(col("metric") === "m_tax" && col("numvalue") < 0.04,
            "positive")
          .otherwise("negative"))
      // the testdata fact table has rare duplicate physical keys; rank
      // within (row key, metric) makes the aid a deterministic content
      // hash where the reference uses a global row_number (R:74)
      .withColumn("mrn", row_number().over(
        Window.partitionBy(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("metric"))
          .orderBy(col("numvalue"), col("l_linestatus"))))

    val sid = md5(concat(lit("bdbsub:"), col("l_partkey").cast("string")))
    val pid = md5(concat(lit("bdbmeas:"), col("l_linestatus"), lit("|"),
      col("metric")))

    // triplet from the KEPT set (props must match the pids that survive,
    // src/tests.py:17-56 invariant — the reference exports pids for all
    // six metrics and breaks it; see scaladoc)
    val subs = kept.select(col("l_partkey")).distinct()
      .withColumn("data", to_json(struct(col("l_partkey"))))
      .withColumn("sid", sid)
      .select("sid", "data")

    val props = kept.select(col("l_linestatus"), col("metric")).distinct()
      .withColumn("data", to_json(struct(col("l_linestatus"), col("metric"))))
      .withColumn("pid", pid)
      .select("pid", "data")

    val acts = kept
      .withColumn("sid", sid)
      .withColumn("pid", pid)
      .withColumn("inchi",
        concat(lit("InChI=1S/P"), col("l_partkey").cast("string")))
      .withColumn("aid", concat(lit("bindingdb-"), md5(concat_ws("|",
        col("l_orderkey").cast("string"), col("l_linenumber").cast("string"),
        col("l_partkey").cast("string"), col("metric"),
        col("mrn").cast("string")))))
      .select("aid", "sid", "pid", "inchi", "value", "numvalue")

    StagingTriplet(subs, props, acts)
  }
}
