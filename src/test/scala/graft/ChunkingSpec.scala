package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** x13 strided chunking: the per-language census must agree with an
  * independent driver-side evaluator over the raw documents, and the
  * plan must stay a pure per-row generator (no window, no pre-aggregate
  * shuffle) so it parallelizes per-document at corpus scale.
  */
class ChunkingSpec extends SparkSpec {
  private val W = 32
  private val S = 24

  test("x13 chunk census matches an independent per-doc evaluator") {
    val docs = Tables.documents(spark, sf())
      .select(col("lang"), lower(col("text")).as("t"))
      .collect()
      .map(r => (r.getString(0), r.getString(1).split(" ")))

    // independent evaluator: window starts 0, S, 2S, … < n_tok
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      val perDoc = ds.map { case (_, ts) =>
        val starts = 0 until ts.length by S
        (starts.length.toLong,
          starts.map(st => math.min(W, ts.length - st).toLong).sum,
          starts.count(st => ts.length - st >= W).toLong)
      }
      lang -> ((perDoc.map(_._1).sum, perDoc.map(_._2).sum, perDoc.map(_._3).sum))
    }

    val out = TextQueries.queries("x13_chunking")(spark, sf())
    out.collect().foreach { r =>
      val (nChunks, sumTok, nFull) = expected(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_chunks") == nChunks, s"n_chunks for $r")
      assert(r.getAs[Long]("sum_chunk_tokens") == sumTok, s"sum_chunk_tokens for $r")
      assert(r.getAs[Long]("n_full") == nFull, s"n_full for $r")
    }
    assert(out.count() == expected.size)
  }

  test("x14 LOO census matches an independent per-doc evaluator") {
    val docs = Tables.documents(spark, sf())
      .select(col("lang"), lower(col("text")).as("t"))
      .collect()
      .map(r => (r.getString(0),
        r.getString(1).split(" ").sliding(2).filter(_.length == 2)
          .map(_.mkString(" ")).toSeq))
      .filter(_._2.nonEmpty)

    val global = docs.flatMap(_._2).groupBy(identity).map { case (bg, xs) =>
      bg -> xs.length.toLong }
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      val perDoc = ds.map { case (_, bgs) =>
        val own = bgs.groupBy(identity).map { case (bg, xs) =>
          bg -> xs.length.toLong }
        val support = own.map { case (bg, c) => c * (global(bg) - c) }.sum
        (support, bgs.length.toLong)
      }
      lang -> ((perDoc.length.toLong,
        perDoc.count { case (sp, n) => sp >= 29 * n }.toLong,
        perDoc.map(_._1).sum, perDoc.map(_._2).sum))
    }

    val out = TextQueries.queries("x14_loo_fluency")(spark, sf())
    out.collect().foreach { r =>
      val (n, kept, support, bigrams) = expected(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_docs") == n, s"n_docs for $r")
      assert(r.getAs[Long]("n_kept") == kept, s"n_kept for $r")
      assert(r.getAs[Long]("sum_support") == support, s"sum_support for $r")
      assert(r.getAs[Long]("sum_bigrams") == bigrams, s"sum_bigrams for $r")
    }
    assert(out.count() == expected.size)
    // the threshold must actually discriminate on the fixtures — a
    // filter that keeps everything is vacuous
    val (n, kept) = expected.values.map(e => (e._1, e._2))
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(kept < n, "LOO threshold must drop at least one doc")
  }

  test("x14 global counts broadcast — the instance frame never shuffles for the join") {
    val plan = TextQueries.queries("x14_loo_fluency")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"broadcast expected:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no shuffle join expected:\n$plan")
  }

  test("x15 merge round matches an independent argmax + greedy-merge evaluator") {
    val docs = Tables.documents(spark, sf())
      .select(col("lang"), lower(col("text")).as("t"))
      .collect()
      .map(r => (r.getString(0), r.getString(1).split(" ")))

    // independent argmax over adjacent pairs with w1 != w2, tiebreak on
    // the pair string
    val pairCounts = docs.flatMap { case (_, ts) =>
      ts.sliding(2).filter(p => p.length == 2 && p(0) != p(1))
        .map(_.mkString(" "))
    }.groupBy(identity).map { case (p, xs) => p -> xs.length }
    val topPair = pairCounts.toSeq.sortBy { case (p, c) => (-c, p) }.head._1

    // greedy left-to-right merge count per doc — must equal the plain
    // occurrence count because w1 != w2 forbids overlaps
    val Array(w1, w2) = topPair.split(" ")
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      val merges = ds.map { case (_, ts) =>
        var i = 0; var m = 0L
        while (i < ts.length - 1) {
          if (ts(i) == w1 && ts(i + 1) == w2) { m += 1; i += 2 } else i += 1
        }
        m
      }.sum
      lang -> ((ds.length.toLong, merges, ds.map(_._2.length.toLong).sum))
    }

    val out = TextQueries.queries("x15_bpe_merge")(spark, sf())
    out.collect().foreach { r =>
      assert(r.getAs[String]("top_pair") == topPair, r.toString)
      val (n, merges, toks) = expected(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_docs") == n, r.toString)
      assert(r.getAs[Long]("n_merges") == merges, r.toString)
      assert(r.getAs[Long]("tokens_before") == toks, r.toString)
      assert(r.getAs[Long]("tokens_after") == toks - merges, r.toString)
    }
    assert(out.count() == expected.size)
  }

  test("x13 plan is generator + one aggregate — no window, no cartesian") {
    val plan = TextQueries.queries("x13_chunking")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"explode expected:\n$plan")
    assert(!plan.contains("Window"), s"no window functions expected:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
