package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-3 training-data additions: the Q13 histogram,
  * benchmark decontamination, repetition quality rules, TF-IDF top
  * terms, and domain-mixture sampling.
  */
class TrainingMixSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf())

  test("q13 histogram accounts for every customer exactly once") {
    val hist = run("q13_order_distribution")
    val total = hist.agg(sum(col("custdist")).as("t")).head.getLong(0)
    assert(total == Tables.customer(spark, sf()).count())
    // the zero bucket holds exactly the customers the left join kept
    // despite having no qualifying order
    val orderless = Tables.customer(spark, sf())
      .join(Tables.orders(spark, sf())
        .filter(!col("o_orderpriority").startsWith("1-")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    val zeroBucket = hist.filter(col("c_count") === 0)
      .select(col("custdist")).collect().headOption.map(_.getLong(0))
      .getOrElse(0L)
    assert(zeroBucket == orderless)
  }

  test("x8 decontamination only flags non-benchmark docs, deterministically") {
    val a = run("x8_decontamination").collect()
    val b = run("x8_decontamination").collect()
    assert(a.sameElements(b))
    // every contaminated count is bounded by the lang's non-benchmark docs
    val perLang = Tables.documents(spark, sf())
      .filter(col("doc_id") % 37 =!= 0)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    a.foreach { r =>
      assert(r.getLong(1) <= perLang(r.getString(0)),
        s"lang ${r.getString(0)} contaminated > population")
      assert(r.getLong(1) <= r.getLong(2)) // docs <= gram hits
    }
  }

  test("x9 repetition flags are a subset of each language population") {
    run("x9_repetition_filter").collect().foreach { r =>
      val (n, flagged) = (r.getLong(1), r.getLong(2))
      assert(flagged >= 0 && flagged <= n)
      assert(r.getDouble(3) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("x10 yields exactly five ranked terms per language") {
    val rows = run("x10_tfidf").collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to 5), lang)
      // score is non-increasing down the ranks
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(5))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y }, lang)
    }
  }

  test("o6 fills each language quota exactly when population allows") {
    val quotas = Map("en" -> 40L, "es" -> 20L, "de" -> 20L,
      "fr" -> 10L, "zh" -> 10L)
    val rows = run("o6_weighted_sample").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) == quotas(r.getString(0)),
        s"quota miss for ${r.getString(0)}")
    }
    // deterministic: re-running selects the identical sample
    assert(run("o6_weighted_sample").collect().sameElements(rows))
  }

  test("w11 assigns every user at least one session bounded by event count") {
    val rows = run("w11_sessionize").collect()
    val perUser = Tables.events(spark, sf())
      .groupBy(col("user_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == perUser.size)
    rows.foreach { r =>
      val (sessions, maxEv) = (r.getLong(1), r.getLong(2))
      assert(sessions >= 1 && sessions <= perUser(r.getLong(0)))
      assert(maxEv >= 1 && r.getLong(3) >= 0)
    }
  }

  test("u7 merge changes exactly the re-emitted keys, keeps one row per key") {
    val ev = Tables.events(spark, sf())
    val rows = run("u7_upsert_latest").collect()
    assert(rows.map(_.getLong(1)).sum == ev.count())
    val updByType = ev.filter(col("event_id") % 10 === 0)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(3) == updByType.getOrElse(r.getString(0), 0L))
    }
  }

  test("x11 redacts one email per doc plus one more for even doc_ids") {
    val expected = Tables.documents(spark, sf())
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("doc_id") % 2 === 0, 2).otherwise(1)).as("exp"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    run("x11_pii_redact").collect().foreach { r =>
      val (n, exp) = expected(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == exp, s"redaction count for ${r.getString(0)}")
      assert(r.getLong(3) > 0) // masking shrank the text
    }
  }

  test("o7 hash split is disjoint, complete, and carves 12/2/2 buckets") {
    val rows = run("o7_hash_split").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("test", "train", "val"))
    assert(rows.map(_.getLong(1)).sum ==
      Tables.documents(spark, sf()).count())
    // independent formulation of the SAME contract (explicit hex-char
    // sets, not the query's range predicates) — a change to the query's
    // bucket boundaries fails here
    val h = substring(md5(concat_ws("|", col("doc_id"))), 32, 1)
    val expected = Tables.documents(spark, sf())
      .withColumn("split",
        when(h.isin("0123456789ab".split("").toIndexedSeq: _*), "train")
          .when(h.isin("c", "d"), "val")
          .when(h.isin("e", "f"), "test"))
      .groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(expected.keySet == Set("train", "val", "test"),
      "hex digit fell outside the three carve sets")
    rows.foreach { r =>
      assert(r.getLong(1) == expected(r.getString(0)), r.getString(0))
    }
  }

  test("o8 weighted reservoir: k distinct rows, deterministic, weight-biased") {
    val rows = run("o8_weighted_reservoir").collect()
    assert(rows.length == 40)
    assert(rows.map(_.getLong(0)).distinct.length == 40) // w/o replacement
    // deterministic: md5 draws, not RNG — a rerun is identical
    val again = run("o8_weighted_reservoir").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // weight-proportional selection: on this corpus the heavy bucket
    // (wt>=2, ~10% of docs) must land above its unweighted share
    val heavyShare = rows.count(_.getLong(2) >= 2) / 40.0
    val popShare = run("o8_weighted_reservoir").sparkSession
      .read.parquet(s"${sf()}/documents.parquet")
      .filter(expr("least(n_chars div 500 + 1, 8) >= 2")).count() / 500.0
    assert(heavyShare > popShare,
      s"sample heavy share $heavyShare <= population $popShare")
  }

  test("o9 grouped reservoir: k per language, native heap ≡ window form") {
    val rows = run("o9_grouped_reservoir").collect()
    val perLang = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(perLang.values.forall(_ == 10), s"per-lang counts: $perLang")
    assert(rows.map(_.getLong(1)).distinct.length == rows.length)
    // the native two-phase heap selects the same rows as the spillable
    // window formulation (one implementation checks the other)
    val keyed = spark.read.parquet(s"${sf()}/documents.parquet")
      .withColumn("wt", least(expr("n_chars div 500") + 1, lit(8)))
      .withColumn("j", explode(sequence(lit(1), col("wt"))))
      .withColumn("hk", md5(concat_ws("#", col("doc_id"), col("j"))))
      .groupBy(col("doc_id"), col("lang"), col("wt"))
      .agg(min(col("hk")).as("sel_key"))
    val windowed = graft.plans.TopK.topKPerGroupBySort(
        keyed, Seq("lang"), "sel_key", descending = false, k = 10)
      .select(col("lang"), col("doc_id"), col("wt"), col("sel_key"))
      .orderBy(col("lang"), col("sel_key")).collect()
    assert(rows.map(_.toSeq).toSeq == windowed.map(_.toSeq).toSeq)
  }

  test("s12 applies jsonl weights with a 1.0 default for unmatched types") {
    val rows = run("s12_jsonl_weights").collect()
    val byType = rows.map(r => r.getString(0) -> r).toMap
    assert(byType("error").getDouble(2) == 1.0)
    rows.foreach { r =>
      assert(r.getDouble(3) == r.getLong(1) * r.getDouble(2))
    }
  }
}
