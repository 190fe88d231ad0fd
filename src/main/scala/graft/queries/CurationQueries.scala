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

  /** The c1 surviving corpus: exact dedup (lowest doc_id per content
    * fingerprint), near-dup drop (dd6 policy over the session-shared
    * J>=0.5 frame), x3 quality score + length floor. Shared by the c1
    * census and the c2 manifest.
    */
  private def survivors(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("ts", split(lower(col("text")), " "))
      .withColumn("n_tok", size(col("ts")))

    // exact dedup: lowest doc_id survives per full-content fingerprint
    val keepExact = docs
      .groupBy(md5(lower(col("text"))).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")

    // near-dup dedup: dd6's greedy keep-lowest-id policy over the
    // session-shared J>=0.5 pair frame
    val dropped = DedupQueries.cachedJaccard(s, d)
      .filter(col("j") >= 0.5)
      .select(col("db").as("doc_id")).distinct()

    // x3's quality score: type-token ratio + stopword ratio + length
    // prior (identical arithmetic, so the 0.5 threshold is exact
    // cross-engine)
    val inList = stopWords.map(w => s"'$w'").mkString(",")
    docs
      .withColumn("ttr", size(array_distinct(col("ts"))) / col("n_tok"))
      .withColumn("stop_ratio",
        expr(s"size(filter(ts, x -> x IN ($inList)))") / col("n_tok"))
      .withColumn("len_prior", least(col("n_tok") / lit(100.0), lit(1.0)))
      .withColumn("score",
        col("ttr") * 0.3 + col("stop_ratio") * 0.3 + col("len_prior") * 0.4)
      .join(keepExact, Seq("doc_id"), "left_semi")
      .join(dropped, Seq("doc_id"), "left_anti")
      .filter(col("score") >= 0.5 && col("n_tok") >= 3)
  }

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
        |FROM q CROSS JOIN e GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
