package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable dataflow operators — SURVEY §7.1 core.ops. Each is a
  * `DataFrame => DataFrame` transformer expressed with built-in
  * (codegen'd) primitives only.
  */
object Ops {

  /** Binarize a numeric column against its per-group EXACT median
    * (ref: src/01_integrate_toxvaldb.R:24-25; SURVEY §4 decision 1:
    * `percentile`, not `percentile_approx`, for reproducible ids).
    *
    * Plan shape: aggregate-then-join-back. The median side is one row per
    * group — tiny — and explicitly broadcast, so the fact side never
    * shuffles. Survives 100× scale-up as long as group cardinality stays
    * far below the fact row count (true for assay-style data). At extreme
    * group cardinality, swap the broadcast for a shuffled join on the
    * group key — same code path, Catalyst picks it when the hint is
    * removed.
    */
  def binarizeByMedian(df: DataFrame, valueCol: String, groupCol: String,
      outCol: String = "value"): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    df.join(broadcast(med), Seq(groupCol))
      .withColumn(outCol,
        when(col(valueCol) >= col("__med"), "positive").otherwise("negative"))
      .drop("__med")
  }

  /** Keep rows whose group has at least `minN` members, preserving row
    * granularity (ref: src/01_integrate_toxvaldb.R:23, A6/W5). Window
    * count partitions by the group key — no driver collect, no global
    * sort.
    */
  def groupSupportFilter(df: DataFrame, groupCols: Seq[String],
      minN: Long): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") >= minN)
      .drop("__n")
  }

  /** Keep keys whose value column is single-valued within the key group —
    * the discordance filter (ref: src/03_integrate_tox21.R:24,47, W6).
    * min==max over the partition is exact and avoids a collect_set build.
    */
  def discordanceFilter(df: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
    df.withColumn("__single",
        min(col(valueCol)).over(w) === max(col(valueCol)).over(w))
      .filter(col("__single"))
      .drop("__single")
  }

  /** Cross the distinct key dimensions, left-join observed facts, and mark
    * missing combinations "negative" (ref: src/06_integrate_ice.R:102-105,
    * J5/J6). Dims are distinct projections — tiny relative to the fact
    * table — and the smaller one is broadcast.
    */
  def synthesizeNegatives(observed: DataFrame, dimACol: String,
      dimBCol: String, labelCol: String = "label"): DataFrame = {
    val a = observed.select(col(dimACol)).distinct()
    val b = observed.select(col(dimBCol)).distinct()
    val seen = observed.select(col(dimACol), col(dimBCol)).distinct()
      .withColumn("__seen", lit(1))
    a.crossJoin(broadcast(b))
      .join(seen, Seq(dimACol, dimBCol), "left")
      .withColumn(labelCol,
        when(col("__seen").isNull, "negative").otherwise("positive"))
      .drop("__seen")
  }

  /** Exact-n deterministic stratified sample: `n` rows per stratum chosen
    * by md5 order of the row key (ref: src/06_integrate_ice.R:107-110 made
    * deterministic, O4; SURVEY §7.4 risk 3).
    */
  def stratifiedExactSample(df: DataFrame, stratumCol: String,
      keyCols: Seq[String], n: Int): DataFrame = {
    val hk = md5(concat_ws("|", keyCols.map(col): _*))
    val w = Window.partitionBy(col(stratumCol)).orderBy(hk)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
