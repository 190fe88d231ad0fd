package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** The training-data curation capstone: one query composing the
  * pipeline a 100 TB corpus actually runs before training — exact
  * dedup, near-dup dedup, quality filtering, length floor — and
  * emitting the per-language census of the surviving corpus.
  *
  * Every stage is a pattern proven elsewhere in isolation (dd1 exact
  * fingerprints, dd6 greedy near-dup policy over the shared Jaccard
  * frame, x3 quality scoring); this query proves they COMPOSE — the
  * joins stay semi/anti on doc_id (no row explosion), the drop sets
  * are computed once from session-shared frames, and the whole plan is
  * scan → narrow per-row compute → three hash semi/anti joins → small
  * final aggregate. At scale each stage is independently shuffle-
  * bounded: exact dedup is a hash groupBy on the fingerprint, the
  * near-dup set comes from the banded LSH-validated Jaccard frame, and
  * quality scoring is pure map-side.
  */
object CurationQueries extends QueryModule {

  private val stopWords = Seq("the", "a", "and", "of", "to", "el", "la",
    "de", "que", "y", "der", "die", "das", "und", "ist", "le", "et", "les")

  /** Raw documents + x3's quality score (type-token ratio + stopword
    * ratio + length prior; identical arithmetic to the oracle so the
    * 0.5 threshold is exact cross-engine). Stage input for both the
    * survivor filter and c6's attribution.
    */
  private def scoredDocs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val inList = stopWords.map(w => s"'$w'").mkString(",")
    Tables.documents(s, d)
      .withColumn("ts", split(lower(col("text")), " "))
      .withColumn("n_tok", size(col("ts")))
      .withColumn("ttr", size(array_distinct(col("ts"))) / col("n_tok"))
      .withColumn("stop_ratio",
        expr(s"size(filter(ts, x -> x IN ($inList)))") / col("n_tok"))
      .withColumn("len_prior", least(col("n_tok") / lit(100.0), lit(1.0)))
      .withColumn("score",
        col("ttr") * 0.3 + col("stop_ratio") * 0.3 + col("len_prior") * 0.4)
  }

  /** Exact-dedup keep set: lowest doc_id per full-content fingerprint
    * (one row per surviving doc_id).
    */
  private def keepExact(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(lower(col("text"))).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")

  /** Near-dup drop set: dd6's greedy keep-lowest-id policy over the
    * session-shared J>=0.5 pair frame (distinct doc_ids).
    */
  private def nearDropped(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    DedupQueries.cachedJaccard(s, d)
      .filter(col("j") >= 0.5)
      .select(col("db").as("doc_id")).distinct()

  /** The c1 surviving corpus: exact dedup, near-dup drop, quality
    * score + length floor. Shared by the c1 census and the c2
    * manifest; c6 reuses the same three building blocks for per-stage
    * attribution.
    */
  private[graft] def survivors(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    scoredDocs(s, d)
      .join(keepExact(s, d), Seq("doc_id"), "left_semi")
      .join(nearDropped(s, d), Seq("doc_id"), "left_anti")
      .filter(col("score") >= 0.5 && col("n_tok") >= 3)

  val queries: Map[String, Q] = Map(
    "c1_curation_pipeline" -> ((s, d) => {
      survivors(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang"))
    }),

    // The end-to-end manifest: curated corpus -> stable hash split ->
    // per-(split, language) token totals and sequence counts at a 2048
    // budget — the numbers a training run is actually provisioned from.
    // Composes c1's survivors with o7's split and x12's packing
    // arithmetic; everything after the survivor joins is map-side +
    // one small aggregate.
    "c2_training_manifest" -> ((s, d) => {
      survivors(s, d)
        .withColumn("split",
          graft.operators.Ops.hashSplit(concat_ws("|", col("doc_id"))))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          ceil(sum(col("n_tok")) / lit(2048.0)).cast("long")
            .as("n_sequences"))
        .orderBy(col("split"), col("lang"))
    }),

    // The SHARD manifest: deterministic global shuffle (o10's
    // Ops.globalRowIndex) → fixed-size shards by position → per-shard
    // doc counts, split mix (o7's shared hash rule), and char budget.
    // This is the physical layout a training job reads: shard k holds
    // exactly positions [100k, 100k+100), every run, every engine —
    // resume-from-shard and data-order reproducibility fall out of the
    // content-hash ordering. Everything after the index is one
    // map-side projection + a small aggregate.
    "c3_shard_manifest" -> ((s, d) => {
      val idx = graft.operators.Ops.globalRowIndex(
        graft.Tables.documents(s, d)
          .withColumn("hk", md5(col("doc_id").cast("string"))), "hk")
      idx
        .withColumn("shard", expr("pos div 100"))
        .withColumn("split",
          graft.operators.Ops.hashSplit(concat_ws("|", col("doc_id"))))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("split") === "train", 1)).as("n_train"),
          count(when(col("split") === "val", 1)).as("n_val"),
          count(when(col("split") === "test", 1)).as("n_test"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("pos")).as("min_pos"),
          max(col("pos")).as("max_pos"))
        .orderBy(col("shard"))
    }),

    // Second-order capstone: o9's per-language weighted reservoir
    // (min-of-w md5 draws on the native two-phase TopKPerGroup heap)
    // feeding c3's deterministic shard layout — the eval-subset export
    // job. Sample k docs per language by length-proportional weight,
    // then give the SAMPLE its own contiguous content-hash order and
    // cut fixed-size shards. Every stage is the already-verified
    // operator: the reservoir is map-side expand + map-combined min +
    // per-group heaps; the index is the TeraSort-shaped range sort
    // (never a single-partition window); the manifest is one small
    // aggregate. Languages interleave in the shards by construction —
    // the content-hash order is an unbiased shuffle of the sample.
    "c4_reservoir_shards" -> ((s, d) => {
      val keyed = graft.Tables.documents(s, d)
        .withColumn("wt", least(expr("n_chars div 500") + 1, lit(8)))
        .withColumn("j", explode(sequence(lit(1), col("wt"))))
        .withColumn("hk", md5(concat_ws("#", col("doc_id"), col("j"))))
        .groupBy(col("doc_id"), col("lang"), col("wt"))
        .agg(min(col("hk")).as("sel_key"))
      val sample = graft.plans.TopK.topKPerGroup(keyed, Seq("lang"),
          "sel_key", desc = false, k = 10)
        .select(col("lang"), col("doc_id"), col("wt"))
      val idx = graft.operators.Ops.globalRowIndex(
        sample.withColumn("hk", md5(col("doc_id").cast("string"))), "hk")
      idx
        .withColumn("shard", expr("pos div 8"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("wt")).as("sum_wt"),
          min(col("pos")).as("min_pos"),
          max(col("pos")).as("max_pos"))
        .orderBy(col("shard"))
    }),

    // Curriculum binning: exact decile edges of the per-document
    // quality score (x3's rule, defined once in
    // TextQueries.qualityScored) via the distributed exact-quantile
    // operator (f15's machinery — count pass + range-partitioned sort +
    // rank pick, never a single-buffer global percentile), then a
    // map-side bin assignment (decile = #edges ≤ score, a sum of
    // comparisons against nine scalar literals) and one small
    // aggregate. This is the curriculum-learning layout: a training
    // job consumes easy→hard (or hard-capped) deciles by filter, and
    // because the edges are exact order statistics the binning is
    // reproducible on any engine.
    "c5_quality_deciles" -> ((s, d) => {
      val scored = TextQueries.qualityScored(s, d)
      val edges = graft.operators.Ops.exactQuantiles(scored, "score",
        (1 to 9).map(_ / 10.0))
      val decile = edges.foldLeft(lit(0)) { (acc, e) =>
        acc + when(col("score") >= e, 1).otherwise(0)
      }
      scored
        .withColumn("decile", decile)
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("score")).as("min_score"),
          max(col("score")).as("max_score"))
        .orderBy(col("decile"))
    }),

    // Attrition funnel: attribute EVERY raw document to the curation
    // stage that dropped it ('exact_dup' → 'near_dup' → 'quality', in
    // c1's stage order) or to 'kept' — the audit report a governance
    // pass publishes alongside the c1 census, and the number you need
    // when a corpus shrinks unexpectedly ("which stage ate my data?").
    // Same three building blocks as c1, but where c1 composes them as
    // semi/anti filters this composes them as left joins against the
    // small keyed sets (both one-row-per-doc_id, so no row growth) and
    // a map-side case_when; one small aggregate at the end.
    "c6_attrition_report" -> ((s, d) => {
      scoredDocs(s, d)
        .join(keepExact(s, d).withColumn("kx", lit(1)),
          Seq("doc_id"), "left")
        .join(nearDropped(s, d).withColumn("nd", lit(1)),
          Seq("doc_id"), "left")
        .withColumn("stage",
          when(col("kx").isNull, "exact_dup")
            .when(col("nd").isNotNull, "near_dup")
            .when(col("score") < 0.5 || col("n_tok") < 3, "quality")
            .otherwise("kept"))
        .groupBy(col("lang"), col("stage"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"), col("stage"))
    }),

    // Leakage-safe split: assign train/val/test at near-dup-COMPONENT
    // granularity — every doc inherits its component representative's
    // hash bucket (singletons are their own representative), so a
    // near-duplicate of a training doc can never land in test. The
    // audit columns prove it cross-engine: n_cross_component (J>=0.5
    // pairs straddling splits under this rule) is 0 by construction,
    // while n_cross_naive (same pairs under o7's per-doc rule) is not.
    // Scale shape: components come from the session-shared dd8 frame
    // (banded at corpus scale), the assignment is one broadcast-size
    // left join + map-side hashSplit, and the audit joins the tiny
    // pair frame against the keyed assignment — no new quadratic work.
    "c7_leakage_safe_split" -> ((s, d) => {
      val comp = DedupQueries.cachedComponents(s, d)
        .withColumnRenamed("id", "doc_id")
      val assigned = Tables.documents(s, d)
        .join(comp, Seq("doc_id"), "left")
        .withColumn("rep", coalesce(col("component"), col("doc_id")))
        .withColumn("split",
          graft.operators.Ops.hashSplit(concat_ws("|", col("rep"))))
        .withColumn("naive_split",
          graft.operators.Ops.hashSplit(concat_ws("|", col("doc_id"))))
      val asg = assigned.select(col("doc_id"), col("split"),
        col("naive_split"))
      val audit = DedupQueries.cachedJaccard(s, d)
        .filter(col("j") >= 0.5).select(col("da"), col("db"))
        .join(asg.select(col("doc_id").as("da"), col("split").as("sa"),
          col("naive_split").as("na")), Seq("da"))
        .join(asg.select(col("doc_id").as("db"), col("split").as("sb"),
          col("naive_split").as("nb")), Seq("db"))
        .agg(count(when(col("sa") =!= col("sb"), 1))
            .as("n_cross_component"),
          count(when(col("na") =!= col("nb"), 1)).as("n_cross_naive"))
      assigned
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("rep")).as("n_groups"),
          count(col("component")).as("n_grouped_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .crossJoin(broadcast(audit))
        .orderBy(col("split"))
    }),

    // Mixture allocation: split a fixed sampling budget (100k docs'
    // worth of tokens) across sources proportional to token mass with
    // the largest-remainder (Hamilton) method — the deterministic,
    // integer-exact core of mixture design (what DoReMi-style weight
    // learning rounds down to when shipping an actual sample count per
    // source). floor_alloc = ⌊B·n_tok/T⌋ via integer DIV; the B−Σfloor
    // residual goes +1 each to the largest remainders (tie → source
    // asc). No float ever appears, so the oracle can't disagree on a
    // rounding boundary. Overflow bound: B·n_tok < 2^63 holds to
    // ~9e13-token sources at B=1e5; past that, rescale B or use
    // decimal. Scale shape: ONE map-side-combined corpus aggregate
    // (source → token mass); everything after operates on the
    // catalog-sized source dim (20 here, ≤ thousands in production) —
    // the rank self-join and both total frames are broadcast, so no
    // corpus-scale shuffle beyond the first aggregate, and no global
    // window (the rank is a count-of-better self-join, which stays
    // shuffle-free at any catalog size).
    "c8_source_budget" -> ((s, d) => {
      val B = 100000L
      val src = Tables.documents(s, d)
        .select(col("source"),
          size(split(lower(col("text")), " ")).cast("long").as("n"))
        .groupBy(col("source")).agg(sum(col("n")).as("n_tok"))
      val tot = src.agg(sum(col("n_tok")).as("t_tok"))
      val shares = src.crossJoin(broadcast(tot))
        .withColumn("floor_alloc", expr(s"($B * n_tok) DIV t_tok"))
        .withColumn("rem", expr(s"($B * n_tok) % t_tok"))
      val resid = shares.agg((lit(B) - sum(col("floor_alloc")))
        .as("n_extra"))
      val better = shares.select(col("source").as("s2"),
        col("rem").as("r2"))
      shares.join(broadcast(better),
          col("r2") > col("rem") ||
            (col("r2") === col("rem") && col("s2") < col("source")),
          "left")
        .groupBy(col("source"), col("n_tok"), col("floor_alloc"),
          col("rem"))
        .agg(count(col("s2")).as("n_better"))
        .crossJoin(broadcast(resid))
        .withColumn("alloc", col("floor_alloc") +
          when(col("n_better") < col("n_extra"), 1L).otherwise(0L))
        .select(col("source"), col("n_tok"), col("floor_alloc"),
          col("alloc"))
        .orderBy(col("source"))
    })
  )

  val oracle: Map[String, String] = Map(
    "c1_curation_pipeline" -> (DedupQueries.shCte +
      """, sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
        |  FROM sh a JOIN sh b
        |    ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |dropped AS (
        |  SELECT DISTINCT db AS doc_id
        |  FROM pairs JOIN sizes sa ON da = sa.doc_id
        |  JOIN sizes sb ON db = sb.doc_id
        |  WHERE common * 1.0 / (sa.n_sh + sb.n_sh - common) >= 0.5),
        |keepx AS (
        |  SELECT min(doc_id) AS doc_id FROM documents
        |  GROUP BY md5(lower(text))),
        |scored AS (
        |  SELECT doc_id, lang, n_chars, len(ts) AS n_tok,
        |    len(list_distinct(ts)) * 1.0 / len(ts) * 0.3 +
        |    len(list_filter(ts, x -> x IN ('the','a','and','of','to','el',
        |      'la','de','que','y','der','die','das','und','ist','le','et',
        |      'les'))) * 1.0 / len(ts) * 0.3 +
        |    least(len(ts) / 100.0, 1.0) * 0.4 AS score
        |  FROM (SELECT doc_id, lang, n_chars,
        |          string_split(lower(text), ' ') AS ts FROM documents))
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM scored
        |WHERE doc_id IN (SELECT doc_id FROM keepx)
        |  AND doc_id NOT IN (SELECT doc_id FROM dropped)
        |  AND score >= 0.5 AND n_tok >= 3
        |GROUP BY 1 ORDER BY lang""".stripMargin),

    "c2_training_manifest" -> (DedupQueries.shCte +
      s""", sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
        |  FROM sh a JOIN sh b
        |    ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |dropped AS (
        |  SELECT DISTINCT db AS doc_id
        |  FROM pairs JOIN sizes sa ON da = sa.doc_id
        |  JOIN sizes sb ON db = sb.doc_id
        |  WHERE common * 1.0 / (sa.n_sh + sb.n_sh - common) >= 0.5),
        |keepx AS (
        |  SELECT min(doc_id) AS doc_id FROM documents
        |  GROUP BY md5(lower(text))),
        |scored AS (
        |  SELECT doc_id, lang, len(ts) AS n_tok,
        |    len(list_distinct(ts)) * 1.0 / len(ts) * 0.3 +
        |    len(list_filter(ts, x -> x IN ('the','a','and','of','to','el',
        |      'la','de','que','y','der','die','das','und','ist','le','et',
        |      'les'))) * 1.0 / len(ts) * 0.3 +
        |    least(len(ts) / 100.0, 1.0) * 0.4 AS score
        |  FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS ts
        |        FROM documents))
        |SELECT
        |  ${graft.operators.Ops.hashSplitSql("concat_ws('|', doc_id)")}
        |    AS split,
        |  lang, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(ceil(sum(n_tok) / 2048.0) AS BIGINT) AS n_sequences
        |FROM scored
        |WHERE doc_id IN (SELECT doc_id FROM keepx)
        |  AND doc_id NOT IN (SELECT doc_id FROM dropped)
        |  AND score >= 0.5 AND n_tok >= 3
        |GROUP BY 1, 2 ORDER BY split, lang""".stripMargin),

    "c3_shard_manifest" ->
      s"""WITH idx AS (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1
        |      AS pos
        |  FROM documents),
        |tagged AS (
        |  SELECT pos // 100 AS shard, n_chars, pos,
        |    ${graft.operators.Ops.hashSplitSql("concat_ws('|', doc_id)")}
        |      AS split
        |  FROM idx)
        |SELECT shard, count(*) AS n_docs,
        |  count(CASE WHEN split = 'train' THEN 1 END) AS n_train,
        |  count(CASE WHEN split = 'val' THEN 1 END) AS n_val,
        |  count(CASE WHEN split = 'test' THEN 1 END) AS n_test,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(pos) AS min_pos, max(pos) AS max_pos
        |FROM tagged GROUP BY 1 ORDER BY 1""".stripMargin,

    "c4_reservoir_shards" ->
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
        |  SELECT lang, doc_id, wt,
        |    row_number() OVER (PARTITION BY lang ORDER BY sel_key) AS rn
        |  FROM keys),
        |samp AS (SELECT lang, doc_id, wt FROM ranked WHERE rn <= 10),
        |idx AS (
        |  SELECT lang, wt,
        |    row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1
        |      AS pos
        |  FROM samp)
        |SELECT pos // 8 AS shard, count(*) AS n_docs,
        |  count(DISTINCT lang) AS n_langs,
        |  CAST(sum(wt) AS BIGINT) AS sum_wt,
        |  min(pos) AS min_pos, max(pos) AS max_pos
        |FROM idx GROUP BY 1 ORDER BY 1""".stripMargin,

    "c5_quality_deciles" ->
      s"""WITH q AS (
        |  ${TextQueries.qualityScoreSql}),
        |e AS (
        |  SELECT ${(1 to 9).map(i =>
              s"quantile_cont(score, 0.$i) AS e$i").mkString(", ")}
        |  FROM q)
        |SELECT
        |  ${(1 to 9).map(i =>
              s"(CASE WHEN score >= e$i THEN 1 ELSE 0 END)").mkString(" + ")}
        |    AS decile,
        |  count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(score) AS min_score, max(score) AS max_score
        |FROM q CROSS JOIN e GROUP BY 1 ORDER BY 1""".stripMargin,

    "c6_attrition_report" -> (DedupQueries.shCte +
      """, sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
        |  FROM sh a JOIN sh b
        |    ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |dropped AS (
        |  SELECT DISTINCT db AS doc_id
        |  FROM pairs JOIN sizes sa ON da = sa.doc_id
        |  JOIN sizes sb ON db = sb.doc_id
        |  WHERE common * 1.0 / (sa.n_sh + sb.n_sh - common) >= 0.5),
        |keepx AS (
        |  SELECT min(doc_id) AS doc_id FROM documents
        |  GROUP BY md5(lower(text))),
        |scored AS (
        |  SELECT doc_id, lang, n_chars, len(ts) AS n_tok,
        |    len(list_distinct(ts)) * 1.0 / len(ts) * 0.3 +
        |    len(list_filter(ts, x -> x IN ('the','a','and','of','to','el',
        |      'la','de','que','y','der','die','das','und','ist','le','et',
        |      'les'))) * 1.0 / len(ts) * 0.3 +
        |    least(len(ts) / 100.0, 1.0) * 0.4 AS score
        |  FROM (SELECT doc_id, lang, n_chars,
        |          string_split(lower(text), ' ') AS ts FROM documents))
        |SELECT lang,
        |  CASE WHEN doc_id NOT IN (SELECT doc_id FROM keepx)
        |         THEN 'exact_dup'
        |       WHEN doc_id IN (SELECT doc_id FROM dropped)
        |         THEN 'near_dup'
        |       WHEN score < 0.5 OR n_tok < 3 THEN 'quality'
        |       ELSE 'kept' END AS stage,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM scored GROUP BY 1, 2 ORDER BY lang, stage""".stripMargin),

    "c7_leakage_safe_split" ->
      (DedupQueries.shCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      s""", shsizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |jpairs AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
        |  FROM sh a JOIN sh b
        |    ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |e0 AS (
        |  SELECT da, db FROM jpairs
        |  JOIN shsizes sa ON da = sa.doc_id
        |  JOIN shsizes sb ON db = sb.doc_id
        |  WHERE common * 1.0 / (sa.n_sh + sb.n_sh - common) >= 0.5),
        |edges AS (
        |  SELECT da AS a, db AS b FROM e0
        |  UNION SELECT db, da FROM e0),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT e.b AS id, reach.r FROM reach JOIN edges e
        |    ON reach.id = e.a),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY 1),
        |asg AS (
        |  SELECT d.doc_id, d.n_chars, c.component,
        |    COALESCE(c.component, d.doc_id) AS rep
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
        |asg2 AS (
        |  SELECT *,
        |    ${graft.operators.Ops.hashSplitSql("concat_ws('|', rep)")}
        |      AS split,
        |    ${graft.operators.Ops.hashSplitSql("concat_ws('|', doc_id)")}
        |      AS naive_split
        |  FROM asg),
        |audit AS (
        |  SELECT
        |    count(CASE WHEN a.split <> b.split THEN 1 END)
        |      AS n_cross_component,
        |    count(CASE WHEN a.naive_split <> b.naive_split THEN 1 END)
        |      AS n_cross_naive
        |  FROM e0 JOIN asg2 a ON e0.da = a.doc_id
        |  JOIN asg2 b ON e0.db = b.doc_id)
        |SELECT split, count(*) AS n_docs, count(DISTINCT rep) AS n_groups,
        |  count(component) AS n_grouped_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  n_cross_component, n_cross_naive
        |FROM asg2 CROSS JOIN audit
        |GROUP BY split, n_cross_component, n_cross_naive
        |ORDER BY split""".stripMargin),

    // integer DIV/% throughout — the largest-remainder allocation has
    // no float for the engines to round differently
    "c8_source_budget" ->
      """WITH src AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT)
        |      AS n_tok
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS t_tok FROM src),
        |shares AS (
        |  SELECT source, n_tok,
        |    (100000 * n_tok) // t_tok AS floor_alloc,
        |    (100000 * n_tok) % t_tok AS rem
        |  FROM src CROSS JOIN tot),
        |resid AS (
        |  SELECT 100000 - CAST(sum(floor_alloc) AS BIGINT) AS n_extra
        |  FROM shares),
        |ranked AS (
        |  SELECT a.source, a.n_tok, a.floor_alloc,
        |    count(b.source) AS n_better
        |  FROM shares a LEFT JOIN shares b
        |    ON b.rem > a.rem OR (b.rem = a.rem AND b.source < a.source)
        |  GROUP BY 1, 2, 3)
        |SELECT source, n_tok, CAST(floor_alloc AS BIGINT) AS floor_alloc,
        |  CAST(floor_alloc +
        |    CASE WHEN n_better < n_extra THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc
        |FROM ranked CROSS JOIN resid ORDER BY source""".stripMargin
  )
}
