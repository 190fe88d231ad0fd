package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** Generated coverage for the doc→training-sequence transforms: the
  * fixed-parameter oracles (x12 at budget 2048, x13 at 32/24) become
  * fuzzed families — random window widths, strides, and packing budgets
  * vs an independent in-memory evaluator. The claims under test are the
  * boundary conventions a packing/chunking pipeline lives or dies by:
  * window starts at 0, stride, … with a short tail allowed; a doc is
  * assigned to the sequence its FIRST token lands in; Spark split()'s
  * trailing-empty-token behavior flows through both.
  */
class TextFuzzSpec extends SparkSpec {

  private lazy val corpus: Seq[(Long, String, String)] =
    Tables.documents(spark, sf()).select("doc_id", "lang", "text")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private lazy val docsDf = Tables.documents(spark, sf())

  private def toks(text: String): Seq[String] =
    text.toLowerCase(java.util.Locale.ROOT).split(" ", -1).toSeq

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  test("30 generated chunking plans (window × stride) agree with the oracle") {
    val rnd = new scala.util.Random(51001)
    (1 to 30).foreach { i =>
      val w = 2 + rnd.nextInt(63)
      val stride = 1 + rnd.nextInt(w + 8)
      val m = 1 + rnd.nextInt(4)
      val r = rnd.nextInt(m)

      val got = TextQueries.chunked(
          docsDf.filter(col("doc_id") % m === r), w, stride)
        .select(col("doc_id"), col("st"), col("n_ck"), col("ck_fp"))
        .collect()
        .map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getString(3)))
        .toSet

      val want = corpus.filter(_._1 % m == r).flatMap { case (id, _, text) =>
        val ts = toks(text)
        (0 until ts.size by stride).map { st =>
          val chunk = ts.slice(st, st + w)
          (id, st, chunk.size, md5hex(chunk.mkString(" ")))
        }
      }.toSet
      assert(got == want, s"chunk plan $i (w=$w stride=$stride m=$m r=$r) " +
        s"diverged: spark=${got.size} oracle=${want.size}")
    }
  }

  test("20 generated packing plans (budget) agree with the oracle") {
    val rnd = new scala.util.Random(51002)
    (1 to 20).foreach { i =>
      val budget = Seq(64L, 128L, 256L, 512L, 2048L)(rnd.nextInt(5))
      val m = 1 + rnd.nextInt(3)
      val r = rnd.nextInt(m)

      // the x12 core at a generated budget: per-lang doc_id order,
      // running cumsum, doc → sequence of its first token
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      val got = docsDf.filter(col("doc_id") % m === r)
        .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("seq_id", floor((col("cum") - col("n_tok")) / budget))
        .groupBy(col("lang"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("fill"))
        .collect()
        .map(x => (x.getString(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3)))
        .toMap

      val want = corpus.filter(_._1 % m == r)
        .map { case (id, lang, text) =>
          (lang, id, text.split(" ", -1).length.toLong) }
        .groupBy(_._1)
        .toSeq                      // flatMap on a Map of pairs dedups keys
        .flatMap { case (lang, ds) =>
          var cum = 0L
          ds.sortBy(_._2).map { case (_, _, n) =>
            val seq = cum / budget
            cum += n
            (lang, seq) -> n
          }
        }
        .groupBy(_._1)
        .map { case (k, vs) =>
          k -> (vs.size.toLong, vs.map(_._2).sum) }
      assert(got == want, s"pack plan $i (budget=$budget m=$m r=$r) " +
        s"diverged: spark=${got.size} oracle=${want.size}")
    }
  }
}
