package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Sorts / limits / top-k / sampling — SURVEY.md §2.6 (O1-O4).
  *
  * Scale notes: top-k by sort+limit compiles to Spark's TakeOrderedAndProject
  * (per-partition heap + driver merge — no global sort shuffle). The
  * stratified sample replaces the reference's unseeded `sample_n` (SURVEY
  * §7.4 risk 3) with an md5-keyed order: deterministic on any partitioning,
  * reproducible in any engine, and distributed (per-group window, no
  * driver collect).
  */
object SortSampleQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    // O1+O2: order-by + limit — top-k (ref: src/07_integrate_ctdbase.R:31).
    // Unique tiebreak (o_orderkey) makes the k-boundary deterministic.
    "o2_top_k" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // O3: max-of-counts — the tox21 single-activity-per-(sid,pid) check
    // (ref: src/03_integrate_tox21.R:90-91).
    "o3_max_of_counts" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("n"))
        .agg(max(col("n")).as("max_dup"))
    }),

    // Native per-group top-k — the custom LogicalPlan + Strategy +
    // SparkPlan operator (graft.plans.TopKPerGroup): bounded k-heaps, no
    // sort. Output limited to (group, order) columns so exact-value ties
    // at the k boundary compare as identical multisets across engines.
    "o5_native_topk" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"), col("value"))
      graft.plans.TopK.topKPerGroup(ev, Seq("event_type"), "value",
          desc = true, k = 5)
        .orderBy(col("event_type"), col("value").desc)
    }),

    // O4: stratified exact-n sampling — n rows per stratum, selected by a
    // content-hash order so the sample is stable across runs and engines
    // (ref: src/06_integrate_ice.R:107-110, made deterministic).
    // Deterministic sampling IS top-k on the content hash, so it runs on
    // the native two-phase heap operator: the window form sorts each
    // stratum in full (3 strata = 3 near-global sorts at scale), the
    // heap form streams the table through fixed 50-heaps and shuffles
    // only maps × strata × 50 rows. The hash key is unique per row, so
    // the selected set is identical to the row_number formulation.
    "o4_stratified_sample" -> ((s, d) => {
      val hk = md5(concat_ws("|", col("l_orderkey"), col("l_linenumber")))
      val sampled = graft.plans.TopK.topKPerGroup(
        Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
          .withColumn("hk", hk),
        Seq("l_returnflag"), "hk", desc = false, k = 50)
      sampled.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_sampled"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy(col("l_returnflag"))
    }),

    // Domain-mixture sampling: draw a target language mixture (40/20/20/
    // 10/10 over a 100-doc budget) from the corpus, deterministically by
    // content-hash order. This is the training-data "mix to a recipe"
    // operator: per-stratum quota join is a broadcast of the tiny recipe
    // table, and the per-stratum selection is a bounded window (a k-heap
    // per language at scale — same shape o4 runs natively).
    "o6_weighted_sample" -> ((s, d) => {
      import s.implicits._
      val recipe = Seq(("en", 40), ("es", 20), ("de", 20), ("fr", 10),
        ("zh", 10)).toDF("lang", "quota")
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(concat_ws("|", col("doc_id"))))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .join(broadcast(recipe), Seq("lang"))
        .filter(col("rn") <= col("quota"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("lang"))
    }),

    // Deterministic train/val/test split by content hash — the dataset-
    // split step: the last hex digit of md5(doc_id) buckets every doc
    // into 16 cells, carved 12/2/2 (75/12.5/12.5). Hash-keyed splits are
    // stable under re-partitioning, re-runs, and corpus growth (a doc
    // never migrates between splits), unlike rand()-seeded sampling.
    // Pure map-side projection + tiny census.
    // Weighted reservoir sampling WITHOUT replacement, cross-engine
    // EXACT. The float Efraimidis-Spirakis key (u^(1/w)) can't be
    // oracle-replayed — ln/pow ulp drift between engines flips ranks
    // near ties — but for INTEGER weights the equivalent min-of-w-keys
    // form is float-free: expand each row into w deterministic md5 draws
    // and order rows by their MINIMUM draw. All Σw draws are iid
    // uniforms, so row order = first-appearance order of a random
    // permutation of weight-many balls per row ⇒ successive selection
    // probability is exactly weight-proportional (the E-S semantics).
    // Scale: the expansion is a map-side 1→w flatMap (bounded by the
    // weight cap), the per-row min is a map-side-combined aggregate, and
    // the top-k is TakeOrderedAndProject — no global sort. For huge or
    // fractional weights, fall back to the float E-S form (then only
    // spec-checkable) or the o6 quota mixture.
    "o8_weighted_reservoir" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("wt", least(expr("n_chars div 500") + 1, lit(8)))
        .withColumn("j", explode(sequence(lit(1), col("wt"))))
        .withColumn("hk", md5(concat_ws("#", col("doc_id"), col("j"))))
        .groupBy(col("doc_id"), col("lang"), col("wt"))
        .agg(min(col("hk")).as("sel_key"))
        .orderBy(col("sel_key"))
        .limit(40)
    }),

    // Per-GROUP weighted reservoir: k weighted samples per language —
    // the "balanced multilingual subset" provisioning step (k docs per
    // lang, long docs favored). Same float-free min-of-w-draws keys as
    // o8, but the selection is top-k per group, so it runs on the
    // native two-phase TopKPerGroup heap operator: map-side partial
    // k-heaps per language below the exchange, never a per-language
    // full sort. Languages are low-cardinality, so the heap state
    // (groups × k) is tiny at any corpus size.
    "o9_grouped_reservoir" -> ((s, d) => {
      val keyed = Tables.documents(s, d)
        .withColumn("wt", least(expr("n_chars div 500") + 1, lit(8)))
        .withColumn("j", explode(sequence(lit(1), col("wt"))))
        .withColumn("hk", md5(concat_ws("#", col("doc_id"), col("j"))))
        .groupBy(col("doc_id"), col("lang"), col("wt"))
        .agg(min(col("hk")).as("sel_key"))
      graft.plans.TopK.topKPerGroup(keyed, Seq("lang"), "sel_key",
          desc = false, k = 10)
        .select(col("lang"), col("doc_id"), col("wt"), col("sel_key"))
        .orderBy(col("lang"), col("sel_key"))
    }),

    // Deterministic global shuffle: every document gets its contiguous
    // position in content-hash order (Ops.globalRowIndex — TeraSort-
    // shaped range sort + zipWithIndex, never a single-partition
    // window). The census output (per-lang count / min / max / SUM of
    // positions) pins the ENTIRE assignment: a numbering that is
    // non-contiguous, duplicated, or order-shuffled breaks the per-lang
    // position sums against the oracle's row_number replay.
    "o10_global_shuffle" -> ((s, d) => {
      val hk = Tables.documents(s, d)
        .withColumn("hk", md5(col("doc_id").cast("string")))
      graft.operators.Ops.globalRowIndex(hk, "hk")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("pos")).as("min_pos"),
          max(col("pos")).as("max_pos"),
          sum(col("pos")).as("sum_pos"))
        .orderBy(col("lang"))
    }),

    // Temperature-weighted language mixing (the multilingual-training
    // sampling rule): per-language quotas ∝ n^τ with τ=0.5 —
    // up-weights tail languages the way multilingual pretraining does —
    // apportioned exactly by largest remainder so the quotas SUM to k.
    // Cross-engine exactness: sqrt is IEEE-correctly-rounded on every
    // engine, and the weight is immediately integer-ized
    // (floor(sqrt(n)·2^20)) so every accumulation after it — total,
    // base quota, remainder ranking, leftover — is integer arithmetic,
    // immune to float addition order (a windowed double prefix-sum
    // would NOT be: engines disagree on summation trees). The global
    // windows here ride the per-LANGUAGE frame — bounded by the number
    // of languages, metadata-scale at any corpus size; the corpus-scale
    // work is the one map-combined groupBy count.
    "o11_temperature_mix" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val k = 1000L
      val full = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.documents(s, d)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .withColumn("w",
          floor(sqrt(col("n_docs").cast("double")) * lit(1048576L))
            .cast("long"))
        .withColumn("s", sum(col("w")).over(full))
        .withColumn("base", expr(s"($k * w) div s"))
        .withColumn("rem", (lit(k) * col("w")) % col("s"))
        .withColumn("rr", row_number().over(
          Window.orderBy(col("rem").desc, col("lang"))))
        .withColumn("leftover", lit(k) - sum(col("base")).over(full))
        .select(col("lang"), col("n_docs"),
          (col("base") +
            when(col("rr") <= col("leftover"), 1).otherwise(0))
            .as("quota"))
        .orderBy(col("lang"))
    }),

    "o7_hash_split" -> ((s, d) => {
      Tables.documents(s, d)
        // hex alphabet: '0'..'b' is exactly {0-9, a, b} = 12/16; the
        // rule lives in Ops.hashSplit so c2 and the oracles share it
        .withColumn("split",
          graft.operators.Ops.hashSplit(concat_ws("|", col("doc_id"))))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("split"))
    })
  )

  val oracle: Map[String, String] = Map(
    "o2_top_k" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "o3_max_of_counts" ->
      """SELECT max(n) AS max_dup FROM (
        |  SELECT l_orderkey, l_linenumber, count(*) AS n
        |  FROM lineitem GROUP BY 1, 2)""".stripMargin,

    "o5_native_topk" ->
      """SELECT event_type, value FROM (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC) AS rn
        |  FROM events)
        |WHERE rn <= 5 ORDER BY event_type, value DESC""".stripMargin,

    "o4_stratified_sample" ->
      """SELECT l_returnflag, count(*) AS n_sampled,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM (
        |  SELECT l_returnflag, l_orderkey,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY md5(concat_ws('|', l_orderkey, l_linenumber))) AS rn
        |  FROM lineitem)
        |WHERE rn <= 50 GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "o6_weighted_sample" ->
      """WITH recipe AS (
        |  SELECT * FROM (VALUES ('en', 40), ('es', 20), ('de', 20),
        |    ('fr', 10), ('zh', 10)) AS t(lang, quota)),
        |ranked AS (
        |  SELECT lang, n_chars, source,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(concat_ws('|', doc_id))) AS rn
        |  FROM documents)
        |SELECT lang, count(*) AS n_sampled,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  count(DISTINCT source) AS n_sources
        |FROM ranked JOIN recipe USING (lang)
        |WHERE rn <= quota
        |GROUP BY 1 ORDER BY lang""".stripMargin,

    "o8_weighted_reservoir" ->
      """WITH w AS (
        |  SELECT doc_id, lang, least(n_chars // 500 + 1, 8) AS wt
        |  FROM documents),
        |exp AS (
        |  SELECT doc_id, lang, wt, md5(concat_ws('#', doc_id, j)) AS hk
        |  FROM w, LATERAL (SELECT unnest(generate_series(1, wt)) AS j)),
        |keys AS (
        |  SELECT doc_id, lang, wt, min(hk) AS sel_key
        |  FROM exp GROUP BY 1, 2, 3)
        |SELECT doc_id, lang, wt, sel_key FROM keys
        |ORDER BY sel_key LIMIT 40""".stripMargin,

    "o9_grouped_reservoir" ->
      """WITH w AS (
        |  SELECT doc_id, lang, least(n_chars // 500 + 1, 8) AS wt
        |  FROM documents),
        |exp AS (
        |  SELECT doc_id, lang, wt, md5(concat_ws('#', doc_id, j)) AS hk
        |  FROM w, LATERAL (SELECT unnest(generate_series(1, wt)) AS j)),
        |keys AS (
        |  SELECT doc_id, lang, wt, min(hk) AS sel_key
        |  FROM exp GROUP BY 1, 2, 3),
        |ranked AS (
        |  SELECT lang, doc_id, wt, sel_key,
        |    row_number() OVER (PARTITION BY lang ORDER BY sel_key) AS rn
        |  FROM keys)
        |SELECT lang, doc_id, wt, sel_key FROM ranked
        |WHERE rn <= 10 ORDER BY lang, sel_key""".stripMargin,

    "o10_global_shuffle" ->
      """WITH idx AS (
        |  SELECT lang,
        |    row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1
        |      AS pos
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs, min(pos) AS min_pos,
        |  max(pos) AS max_pos, CAST(sum(pos) AS BIGINT) AS sum_pos
        |FROM idx GROUP BY 1 ORDER BY 1""".stripMargin,

    "o11_temperature_mix" ->
      """WITH counts AS (
        |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
        |wts AS (
        |  SELECT lang, n_docs,
        |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1048576) AS BIGINT)
        |      AS w
        |  FROM counts),
        |tot AS (
        |  SELECT lang, n_docs, w, CAST(sum(w) OVER () AS BIGINT) AS s
        |  FROM wts),
        |quota AS (
        |  SELECT lang, n_docs, (1000 * w) // s AS base,
        |    (1000 * w) % s AS rem
        |  FROM tot),
        |ranked AS (
        |  SELECT lang, n_docs, base, rem,
        |    row_number() OVER (ORDER BY rem DESC, lang) AS rr,
        |    1000 - CAST(sum(base) OVER () AS BIGINT) AS leftover
        |  FROM quota)
        |SELECT lang, n_docs,
        |  CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
        |    AS quota
        |FROM ranked ORDER BY lang""".stripMargin,

    "o7_hash_split" ->
      s"""SELECT split, count(*) AS n_docs,
        |  count(DISTINCT lang) AS n_langs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM (
        |  SELECT lang, n_chars,
        |    ${graft.operators.Ops.hashSplitSql("concat_ws('|', doc_id)")}
        |      AS split
        |  FROM documents)
        |GROUP BY 1 ORDER BY split""".stripMargin
  )
}
