package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Property enrichment — the reference's LLM stages re-architected
  * (ref: src/91_property_categories.py, src/92_llm_property_titles.py;
  * SURVEY §2.10 D5/D6, §7.1 module 7):
  *
  *   - `Labeler` is the pluggable backend (the reference calls GPT-4 with
  *     retries); `RuleLabeler` is the deterministic default so
  *     correctness never depends on a network (SURVEY §7.4 risk 3).
  *   - `cachedLabel` is the md5-keyed checkpoint cache: load cache table,
  *     anti-join to find misses, compute ONLY misses on executors,
  *     append back — the reference's joblib disk cache as a parquet
  *     table (ref: src/helper/cache_helper.py:4-26).
  *   - Title uniqueness replaces the reference's sequential
  *     retry-until-unique loop (inherently order-dependent,
  *     src/92_llm_property_titles.py:54-70) with a deterministic
  *     window: first pid (sorted) keeps the base title, later ones get a
  *     ' #n' suffix — same invariant (globally unique titles), fully
  *     distributed.
  */
object Enrich {

  /** category/reason/strength triples for one property's JSON. 1→N rows
    * (the reference's only UDTF-shaped mapping, D5).
    */
  trait Labeler extends Serializable {
    def label(propJson: String): Seq[(String, String, Double)]
  }

  /** Deterministic rule backend over the harmonized property JSON.
    * Parses the JSON (rather than substring-matching) so it is
    * insensitive to serialization style — canonical `data` uses Python
    * json.dumps spacing (see CanonicalJson).
    */
  object RuleLabeler extends Labeler {
    @transient private lazy val mapper =
      new com.fasterxml.jackson.databind.ObjectMapper()

    def label(propJson: String): Seq[(String, String, Double)] = {
      val tree =
        try mapper.readTree(propJson)
        catch { case scala.util.control.NonFatal(_) => null }
      def field(k: String): String = {
        if (tree == null) return null
        val n = tree.get(k)
        if (n == null) null else n.asText
      }
      val cats =
        if (field("s_nationkey") != null)
          Seq(("logistics", "supplier nation cohort"))
        else field("event_type") match {
          case "click" | "view" => Seq(("engagement", "ui interaction signal"))
          case "purchase" =>
            Seq(("commerce", "monetary event"), ("engagement", "active use"))
          case "signup" => Seq(("lifecycle", "account creation"))
          case "error" => Seq(("reliability", "failure signal"))
          case _ => Seq(("urgency", "order priority class"))
        }
      cats.map { case (c, r) => (c, r, (1 + c.length % 10).toDouble) }
    }
  }

  /** The closed category vocabulary — the reference constrains LLM output
    * to a fixed 38-entry list shipped as a resource file
    * (src/resources/property_categories.txt:1-38); this engine ships its
    * own list the same way and `cachedLabel` enforces membership.
    */
  lazy val vocabulary: Set[String] = {
    val in = getClass.getResourceAsStream("/category_vocabulary.txt")
    if (in == null)
      throw new IllegalStateException(
        "category_vocabulary.txt missing from classpath (packaging error)")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toSet
    finally in.close()
  }

  /** The vocabulary as a one-column table, for set-membership joins. */
  def vocabularyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    vocabulary.toSeq.sorted.toDF("category")
  }

  /** Categories for the requested properties, computed through the cache
    * table at `cacheDir` (parquet; created on first use). Returns
    * (pid, category, reason, strength) for exactly the requested pids.
    *
    * Concurrency contract: the check-then-append is NOT atomic — a task
    * retry or a concurrent job appending the same pids can leave
    * duplicate (pid, category) rows in the cache files. Single writer is
    * assumed (the reference's joblib cache has the same contract); the
    * read path defends anyway by deduplicating on (pid, category), so a
    * dirty cache degrades to wasted bytes, never to double-counted rows.
    */
  def cachedLabel(spark: SparkSession, properties: DataFrame,
      backend: Labeler, cacheDir: String,
      vocab: Set[String] = vocabulary, maxAttempts: Int = 3): DataFrame = {
    import spark.implicits._
    val props = properties.select(col("pid"), col("data")).distinct()
    val cached: DataFrame =
      try spark.read.parquet(cacheDir)
      catch { case _: Exception =>
        Seq.empty[(String, String, String, Double)]
          .toDF("pid", "category", "reason", "strength")
      }
    val misses = props.join(cached.select("pid").distinct(), Seq("pid"),
      "left_anti")
    // emptiness checked on the anti-join, NOT on the labeled frame — the
    // backend may be expensive (the reference's is an LLM call) and must
    // run exactly once per missing pid, in the write below.
    val all =
      if (misses.isEmpty) cached
      else {
        misses.as[(String, String)].flatMap { case (pid, data) =>
          labelInVocab(backend, vocab, maxAttempts, pid, data)
            .map { case (c, r, st) => (pid, c, r, st) }
        }.toDF("pid", "category", "reason", "strength")
          .write.mode("append").parquet(cacheDir)
        spark.read.parquet(cacheDir)
      }
    // Defensive read: collapse retry-duplicated rows DETERMINISTICALLY
    // (a nondeterministic backend can append differing reason/strength
    // for the same (pid, category); min-of-struct always picks the same
    // winner, where dropDuplicates would pick per partition order), and
    // return only the requested pids (the cache may hold a superset).
    all.groupBy(col("pid"), col("category"))
      .agg(min(struct(col("reason"), col("strength"))).as("__rs"))
      .select(col("pid"), col("category"),
        col("__rs.reason").as("reason"), col("__rs.strength").as("strength"))
      .join(props.select("pid"), Seq("pid"), "left_semi")
  }

  /** Closed-vocabulary enforcement with the reference's retry protocol
    * (src/helper/cache_helper.py:26-44: re-ask the backend up to N times,
    * then raise): a backend emitting a category outside the vocabulary is
    * re-invoked up to `maxAttempts` times — meaningful for a stochastic
    * LLM backend; a deterministic one fails fast — and the job aborts if
    * no attempt lands inside the vocabulary.
    */
  private def labelInVocab(backend: Labeler, vocab: Set[String],
      maxAttempts: Int, pid: String, data: String)
      : Seq[(String, String, Double)] = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val ls = backend.label(data)
      if (ls.forall { case (c, _, _) => vocab.contains(c) }) return ls
      attempt += 1
    }
    throw new IllegalStateException(
      s"labeler returned out-of-vocabulary category for pid=$pid " +
        s"after $maxAttempts attempts")
  }

  /** Globally-unique deterministic titles: base title from the property
    * JSON, ' #n' suffix for same-base collisions in pid order;
    * `prop_json_data` carries the property JSON alongside
    * (ref: src/92_llm_property_titles.py:71).
    */
  def titles(properties: DataFrame): DataFrame = {
    val base = coalesce(
      get_json_object(col("data"), "$.event_type"),
      get_json_object(col("data"), "$.o_orderpriority"),
      get_json_object(col("data"), "$.s_nationkey"),
      col("pid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("base")).orderBy(col("pid"))
    properties.select(col("pid"), col("data")).distinct()
      .withColumn("base", concat(lit("Property "), base))
      .withColumn("seq", row_number().over(w))
      .withColumn("title",
        when(col("seq") === 1, col("base"))
          .otherwise(concat(col("base"), lit(" #"), col("seq"))))
      .select(col("pid"), col("title"), col("data").as("prop_json_data"))
  }
}
