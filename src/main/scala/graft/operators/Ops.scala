package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable dataflow operators — SURVEY §7.1 core.ops. Each is a
  * `DataFrame => DataFrame` transformer expressed with built-in
  * (codegen'd) primitives only.
  */
object Ops {

  /** Exactness mode (SURVEY §7.4 risk 6): Exact for oracle-reproducible
    * results at test scale; Approx swaps in the sketch/streaming
    * algorithms (percentile_approx, HLL++) that keep the same plan shape
    * but bounded memory at 100 TB. Same operator API either way.
    */
  sealed trait Exactness
  case object Exact extends Exactness
  case object Approx extends Exactness

  /** Grouped median expression under the chosen exactness. */
  def medianExpr(valueCol: String, mode: Exactness):
      org.apache.spark.sql.Column = mode match {
    case Exact => expr(s"percentile($valueCol, 0.5)")
    case Approx => expr(s"percentile_approx($valueCol, 0.5, 10000)")
  }

  /** Distinct-count expression under the chosen exactness. */
  def nDistinctExpr(valueCol: String, mode: Exactness):
      org.apache.spark.sql.Column = mode match {
    case Exact => countDistinct(col(valueCol))
    case Approx => approx_count_distinct(col(valueCol), 0.02)
  }

  /** Session-level exactness switch (SURVEY §7.4 risk 6): integrators
    * that embed an exactness-sensitive aggregate read the mode from
    * `spark.graft.exactness` ("exact" default; "approx" swaps in the
    * bounded-memory sketch forms). Read at STAGING-BUILD time — a
    * memoized staging keeps the mode it was built with until the next
    * `MemoRegistry.evictAll`.
    */
  val ExactnessKey = "spark.graft.exactness"
  def exactnessFromConf(s: org.apache.spark.sql.SparkSession): Exactness =
    s.conf.getOption(ExactnessKey).map(_.trim.toLowerCase) match {
      case Some("approx") => Approx
      case Some("exact") | None => Exact
      case Some(other) => throw new IllegalArgumentException(
        s"$ExactnessKey must be 'exact' or 'approx', got '$other'")
    }

  /** Grouped median under the chosen exactness — one row per group
    * (groupCols*, out). Exact is the spillable sort+window formulation
    * (bit-identical to percentile(); OpsSpec) for oracle-reproducible
    * results; Approx is percentile_approx's GK sketch — bounded memory
    * per group at ANY group size, the 100 TB posture, at the price of a
    * rank error ≤ n/accuracy (it returns a REAL data value near the
    * median, never the even-count interpolation). ExactnessSpec pins
    * the tolerance contract between the two modes on the toxvaldb
    * integrator.
    */
  def groupedMedian(df: DataFrame, groupCols: Seq[String],
      valueCol: String, out: String, mode: Exactness): DataFrame =
    mode match {
      case Exact => groupedMedianBySort(df, groupCols, valueCol, out)
      case Approx => df.groupBy(groupCols.map(col): _*)
        .agg(expr(s"percentile_approx($valueCol, 0.5, 10000)").as(out))
    }

  /** Exact grouped median via sort + window — bit-identical to
    * `percentile(v, 0.5)` (same lower + (upper-lower)*0.5 interpolation)
    * but with a different physical shape: shuffle+sort and one window
    * pass instead of ObjectHashAggregate. The percentile aggregate
    * buffers EVERY group value in an in-memory map entry, which is the
    * formulation that dies on large groups at 100 TB; sort is spillable
    * and group size never matters. Returns one row per group:
    * (groupCols*, out). OpsSpec proves bit-equality on real data.
    */
  def groupedMedianBySort(df: DataFrame, groupCols: Seq[String],
      valueCol: String, out: String): DataFrame = {
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col(valueCol))
    val cw = Window.partitionBy(gcols: _*)
    val medNonNull = df.select(gcols :+ col(valueCol): _*)
      .filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      // integer div: Column./ promotes to double
      .filter(expr("__rn = (__n + 1) div 2 OR __rn = __n div 2 + 1"))
      .groupBy(gcols: _*)
      .agg((min(col(valueCol)) +
        (max(col(valueCol)) - min(col(valueCol))) * 0.5).as(out))
    // percentile() keeps all-NULL groups (median NULL); preserve that —
    // dropping them would silently delete those groups' rows downstream
    // of an inner join-back. Null-SAFE join: groupBy treats NULL as a
    // real key, so the re-attach must too (Seq-based join uses = and
    // would orphan a NULL group key).
    val keys = df.select(gcols: _*).distinct().alias("k")
    val m = medNonNull.alias("m")
    val cond = groupCols.map(c => col(s"k.$c") <=> col(s"m.$c"))
      .reduce(_ && _)
    keys.join(m, cond, "left")
      .select(groupCols.map(c => col(s"k.$c")) :+ col(s"m.$out"): _*)
  }

  /** Distributed EXACT global quantiles — the scale-safe replacement for
    * an ungrouped `percentile(v, array(...))`, whose ObjectHashAggregate
    * buffers the ENTIRE column in one in-memory aggregation buffer (the
    * one plan shape a 100 TB column cannot survive). Two passes instead:
    *
    *   1. count pass — the non-null count fixes each target's fractional
    *      rank `p * (n-1)`;
    *   2. rank pass — a range-partitioned distributed sort (the TeraSort
    *      shape: every partition sorts its slice, no single task sees the
    *      whole column) + a two-job zipWithIndex (per-partition sizes,
    *      then offset rank assignment), keeping ONLY the ≤ 2·|ps| order
    *      statistics the targets need.
    *
    * Interpolation replicates Spark's `Percentile` exactly
    * (`(higher-pos)*lowerVal + (pos-lower)*higherVal`), so results are
    * bit-identical to the aggregate (OpsSpec proves it). Returns one
    * Double per requested p — scalar results, like any global aggregate.
    * For repeated or latency-sensitive use at scale, `percentile_approx`
    * (the declared Approx swap, a16) remains the sketch path.
    */
  def exactQuantiles(df: DataFrame, valueCol: String,
      ps: Seq[Double]): Seq[Double] = {
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val n = vals.count()
    if (n == 0) return ps.map(_ => Double.NaN)
    val positions = ps.map(p => p * (n - 1)) // 0-based fractional ranks
    val needed = positions
      .flatMap(r => Seq(math.floor(r).toLong, math.ceil(r).toLong)).toSet
    val neededB = vals.sparkSession.sparkContext.broadcast(needed)
    import vals.sparkSession.implicits._
    val byRank = vals.sort("v").as[Double].rdd.zipWithIndex()
      .filter { case (_, i) => neededB.value.contains(i) }
      .collect().map(_.swap).toMap
    positions.map { pos =>
      val lower = math.floor(pos).toLong
      val higher = math.ceil(pos).toLong
      if (higher == lower) byRank(lower)
      else (higher - pos) * byRank(lower) + (pos - lower) * byRank(higher)
    }
  }

  /** Deterministic GLOBAL row index in `orderCol` order — the
    * training-data "global shuffle": order the corpus by a content hash
    * and hand every row its contiguous position, so downstream sharding
    * (`pos div shard_size`) and resume-from-step are reproducible across
    * runs and engines.
    *
    * The naive formulation — `row_number() OVER (ORDER BY hash)` — plans
    * as Exchange SinglePartition + Window: one task sorts and numbers
    * the entire corpus (SURVEY §7.4 risk 5, the shape this engine bans).
    * Here instead: range-partitioned distributed sort (TeraSort shape)
    * + zipWithIndex — one metadata job for per-partition sizes, then
    * offset assignment per partition. The RDD hop is the justified
    * imperative case (contiguous numbering is inherently per-partition
    * stateful); with unique order keys the result is partition-count
    * independent.
    */
  def globalRowIndex(df: DataFrame, orderCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val sorted = df.repartitionByRange(col(orderCol))
      .sortWithinPartitions(col(orderCol))
    val rdd = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    sorted.sparkSession.createDataFrame(rdd,
      sorted.schema.add("pos", LongType, nullable = false))
  }

  /** Stable train/val/test hash split on the LAST hex digit of md5(key):
    * '0'..'b' → train (12/16), 'c'/'d' → val (2/16), else test (2/16).
    * Growth-stable (a row's split never changes as the corpus grows) and
    * map-side at any scale. Single definition point: `hashSplitSql` is
    * the SAME rule as a SQL fragment for the DuckDB oracles, so query
    * and oracle cannot drift (TrainingMixSpec pins the buckets).
    */
  def hashSplit(key: org.apache.spark.sql.Column):
      org.apache.spark.sql.Column = {
    val h = substring(md5(key), 32, 1)
    when(h.between("0", "b"), "train")
      .when(h.isin("c", "d"), "val")
      .otherwise("test")
  }

  /** SQL twin of [[hashSplit]] over a key expression. */
  def hashSplitSql(keyExpr: String): String =
    s"""CASE WHEN substr(md5($keyExpr), 32, 1)
       |       BETWEEN '0' AND 'b' THEN 'train'
       |     WHEN substr(md5($keyExpr), 32, 1)
       |       IN ('c', 'd') THEN 'val'
       |     ELSE 'test' END""".stripMargin

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
      outCol: String = "value", mode: Exactness = Exact): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(medianExpr(valueCol, mode).as("__med"))
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

  /** As-of join: for each left row, attach the right row with the
    * greatest `ts` <= left's `ts` for the same `key` (the time-series
    * enrichment primitive Spark lacks as a builtin). Composed from
    * existing operators per the brief's preference order (a): tag both
    * sides, union, and carry the last right payload forward with an
    * ordered window — one shuffle on `key`, no range-join blowup, state
    * bounded per key. Ties (equal ts) match the right row, i.e. ">="
    * semantics, right-before-left via the tag sort.
    *
    * Caller contract: right must be unique per (key, ts) (pre-aggregate
    * ties), and right payload columns must be non-null and distinct from
    * left's column names.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      ts: String): DataFrame = {
    val payload = right.columns.filterNot(c => c == key || c == ts).toSeq
    val l = left.withColumn("__is_left", lit(1))
    val r = right.withColumn("__is_left", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__is_left") === 1)
      .drop("__is_left").drop(payload: _*)
  }

  /** Sub-quadratic range join: (point, interval) pairs with equal `key`
    * and `point.tsCol` ∈ [`startCol`, `endCol`] (inclusive, integer
    * domain — callers encode open ends with ±1). Spark's built-in answer
    * to a range predicate alongside an equi-key is a join on the key
    * with the range as a post-filter — fine until one key is hot — or,
    * with no key, a BroadcastNestedLoopJoin. This operator bins time:
    * each point lands in exactly one `binWidth` bin, each interval
    * explodes across the bins it spans, and the join becomes a pure
    * equi-join on (key, bin) + exact range filter. A point's single bin
    * matches each interval's bin list at most once, so no dedup pass is
    * needed. Shuffle volume: |points| + Σ interval-spans — sub-quadratic
    * and hash-partitioned, the shape that survives 100 TB. Pick
    * `binWidth` ≈ the typical interval length (span factor ≈ 2).
    */
  /** Data-derived bin width for [[rangeJoin]] / [[intervalOverlapJoin]]
    * (VERDICT r11 #6): the MEDIAN interval span (end − start + 1),
    * which is exactly the scaladoc's hand-tuning rule "binWidth ≈ the
    * typical interval length" — an interval then explodes into ≤ 2 bin
    * replicas while a bin's point population stays proportional to the
    * data within one typical span. Median, not mean: one open-ended
    * outlier interval would otherwise drag the width (and every row's
    * replica count) up for the whole corpus. Computed with
    * `percentile_approx` rather than the exact sort+window quantile
    * machinery, deliberately: a global (ungrouped) exact quantile
    * sorts the corpus through ONE partition, and a plan-sizing KNOB
    * must not cost more than the join it tunes — the approx sketch is
    * a single map-combinable aggregate pass and its error (≤ 1/10000
    * rank) is irrelevant to a power-of-data bin width. Floors at 1
    * (zero-length integer intervals). The explicit binWidth parameter
    * on both joins remains the manual override.
    */
  def derivedBinWidth(intervals: DataFrame, startCol: String,
      endCol: String): Long = {
    val r = intervals.agg(percentile_approx(
      (col(endCol) - col(startCol) + lit(1)).cast("double"),
      lit(0.5), lit(10000)).as("m")).head()
    require(!r.isNullAt(0), "derivedBinWidth over an EMPTY interval " +
      "frame - refusing to derive a bin width from zero intervals " +
      "(wrong path or a filter that dropped everything)")
    math.max(1L, math.round(r.getDouble(0)))
  }

  /** [[rangeJoin]] with the bin width derived from the interval-span
    * distribution ([[derivedBinWidth]]) — one extra aggregate pass over
    * `intervals`, then the explicit-width join.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
      tsCol: String, startCol: String, endCol: String): DataFrame =
    rangeJoin(points, intervals, key, tsCol, startCol, endCol,
      derivedBinWidth(intervals, startCol, endCol))

  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
      tsCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    val p = points.withColumn("__bin",
      floor(col(tsCol) / binWidth).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    p.join(iv, Seq(key, "__bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }

  /** Exact grouped quantiles via sort + window — [[groupedMedianBySort]]
    * generalized to arbitrary probability points, replacing
    * `percentile(v, array(ps))` whose ObjectHashAggregate buffers every
    * group value in one in-memory map entry (the formulation that dies
    * on large groups at 100 TB). Shape: one shuffle+sort by (group,
    * value), a row_number/count window pass, then ONLY the ≤ 2·|ps|
    * order statistics each group needs survive into a normal hash
    * aggregate — sort is spillable, group size never matters.
    * Interpolation replicates Spark's `Percentile` exactly
    * (`(higher−pos)·lowerVal + (pos−lower)·higherVal`, pos = p·(n−1)),
    * so results are bit-identical to the aggregate (OpsSpec proves it
    * on real data). All-NULL groups are preserved with NULL quantiles
    * (null-safe join-back), matching percentile(). Returns one row per
    * group: (groupCols*, names*).
    */
  def groupedQuantilesBySort(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[Double], names: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.length == names.length)
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col(valueCol))
    val cw = Window.partitionBy(gcols: _*)
    val ranked = df.select(gcols :+ col(valueCol): _*)
      .filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
    // per p: 0-based fractional rank pos = p·(n−1); keep only the rows
    // holding a floor/ceil rank some p needs (≤ 2·|ps| rows per group)
    def pos(p: Double) = lit(p) * (col("__n") - 1)
    val needed = ps.map { p =>
      (col("__rn") - 1 === floor(pos(p)).cast("long")) ||
        (col("__rn") - 1 === ceil(pos(p)).cast("long"))
    }.reduce(_ || _)
    val qcols = ps.zip(names).map { case (p, name) =>
      val lowerVal = max(when(
        col("__rn") - 1 === floor(pos(p)).cast("long"), col(valueCol)))
      val higherVal = max(when(
        col("__rn") - 1 === ceil(pos(p)).cast("long"), col(valueCol)))
      // per-group constants: __n is constant, so pos/floor/ceil are too
      val posC = lit(p) * (max(col("__n")) - 1)
      val lo = floor(posC)
      val hi = ceil(posC)
      when(hi === lo, lowerVal)
        .otherwise((hi - posC) * lowerVal + (posC - lo) * higherVal)
        .as(name)
    }
    val m = ranked.filter(needed)
      .groupBy(gcols: _*)
      .agg(qcols.head, qcols.tail: _*)
    // preserve all-NULL groups like percentile() does (NULL quantiles)
    val keys = df.select(gcols: _*).distinct().alias("k")
    val cond = groupCols.map(c => col(s"k.$c") <=> col(s"m.$c"))
      .reduce(_ && _)
    keys.join(m.alias("m"), cond, "left")
      .select(groupCols.map(c => col(s"k.$c")) ++
        names.map(n => col(s"m.$n")): _*)
  }

  /** Interval-OVERLAP equi-bin join — the interval×interval sibling of
    * [[rangeJoin]] (point×interval): pairs (a, b) sharing `key` whose
    * [start, end] ranges intersect (inclusive endpoints). Both sides
    * explode into ⌈len/binWidth⌉ bin replicas and equi-join on
    * (key, bin) — never an inequality-only join, which Spark can only
    * execute as a nested loop. A pair overlapping several shared bins
    * would match once per bin; the FIRST-SHARED-BIN filter (bin ==
    * max(⌊startA/w⌋, ⌊startB/w⌋)) keeps exactly one match per pair with
    * zero extra shuffle — no distinct pass, no row explosion survives
    * the join. Pick binWidth ≈ typical interval length: the per-row
    * replica count stays O(1) and each bin's population is what one
    * task joins. Column names must be disjoint across `a` and `b`
    * except `key`.
    */
  /** [[intervalOverlapJoin]] with the bin width derived from BOTH
    * sides' span distributions pooled ([[derivedBinWidth]] over the
    * unioned spans — one narrow aggregate pass per side).
    */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame, key: String,
      startA: String, endA: String, startB: String,
      endB: String): DataFrame = {
    val spans = a.select((col(endA) - col(startA)).as("s"))
      .unionAll(b.select((col(endB) - col(startB)).as("s")))
      .withColumn("e", col("s")).withColumn("s", lit(0L))
    intervalOverlapJoin(a, b, key, startA, endA, startB, endB,
      derivedBinWidth(spans, "s", "e"))
  }

  def intervalOverlapJoin(a: DataFrame, b: DataFrame, key: String,
      startA: String, endA: String, startB: String, endB: String,
      binWidth: Long): DataFrame = {
    def binned(df: DataFrame, s: String, e: String) = df.withColumn(
      "__bin", explode(sequence(floor(col(s) / binWidth).cast("long"),
        floor(col(e) / binWidth).cast("long"))))
    binned(a, startA, endA).join(binned(b, startB, endB),
        Seq(key, "__bin"))
      .filter(col(startA) <= col(endB) && col(startB) <= col(endA))
      .filter(col("__bin") === greatest(
        floor(col(startA) / binWidth).cast("long"),
        floor(col(startB) / binWidth).cast("long")))
      .drop("__bin")
  }

  /** Skew-guard join: salt the big side's key with a deterministic hash
    * of `uniqueCol` into `saltFactor` sub-keys and explode the small side
    * across all salts, so one hot key spreads over `saltFactor`
    * partitions. Result is row-identical to the unsalted join (OpsSpec).
    * AQE's skew-join handles moderate skew automatically; this is the
    * explicit operator for pathological keys.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      uniqueCol: String, saltFactor: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(uniqueCol)), lit(saltFactor)))
    val exploded = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
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
