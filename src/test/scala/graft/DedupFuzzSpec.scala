package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.{Dedup, Graph}

/** Differential fuzzing of the DEDUP/SIMILARITY family (VERDICT r6 #6):
  * the dd-family oracles pin minhash/simhash/components at fixed
  * parameter points; this generates PARAMETERIZATIONS — shingle k ×
  * df-prune cutoff × (numHashes, rowsPerBand) banding shapes for
  * MinHash, pigeonhole block counts for SimHash, random graphs and
  * incremental split policies for components — and checks every plan
  * against an independent in-memory evaluator (plain Scala collections;
  * no shared code with the Spark plans — only the xxhash64 PRIMITIVE is
  * taken from Spark's XXH64, since the contract under test is the
  * banding/aggregation structure, not the hash constants).
  *
  * Contracts exercised per family:
  *   minhash — shingle set (windowing + per-doc distinct + df-prune on
  *     the post-distinct document frequency), per-slot signature mins
  *     over the seed-chained hash family, banded candidate generation
  *     (pair ⇔ some band slice identical), and the agreement-fraction
  *     estimate, all exact.
  *   simhash — tf-weighted bit votes (including Spark split()'s
  *     empty-token behavior), signature assembly, block pigeonhole
  *     candidates at 2/4/8 blocks, exact hamming.
  *   components — min-label propagation AND large/small-star vs
  *     union-find on random graphs (self-loops, duplicate and reversed
  *     edges included), plus incremental(assign(batch1), batch2) ≡
  *     one-shot over the union — the index/merge contract dd11 relies
  *     on, across 30 random splits instead of one fixed point.
  */
class DedupFuzzSpec extends SparkSpec {

  private lazy val corpus: Seq[(Long, String, String)] =
    Tables.documents(spark, sf()).select("doc_id", "lang", "text")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private lazy val docsDf = Tables.documents(spark, sf())
    .select("doc_id", "lang", "text")

  // ---- in-memory evaluator -------------------------------------------

  /** xxhash64(lit(i): int, sh: string) — seed-chained like the Spark
    * expression: seed 42 → hashInt → hashUnsafeBytes.
    */
  private def xxIntStr(i: Int, s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes,
      XXH64.hashInt(i, 42L))
  }

  /** xxhash64(w: string) with the default seed. */
  private def xxStr(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  /** Spark split(text, " ") keeps trailing empty tokens (unlike Java's
    * default split) — mirror with limit -1.
    */
  private def tokens(text: String): Seq[String] = text.split(" ", -1).toSeq

  /** Per-doc distinct k-shingles after df-pruning: doc -> shingle set. */
  private def oracleShingles(docs: Seq[(Long, String, String)], k: Int,
      maxDf: Long): Map[Long, Set[String]] = {
    val perDoc = docs.map { case (id, _, text) =>
      val ts = tokens(text)
      id -> (if (ts.size < k) Set.empty[String]
             else ts.sliding(k).map(_.mkString(" ")).toSet)
    }.toMap
    val df = perDoc.values.flatten.groupBy(identity)
      .map { case (sh, occ) => sh -> occ.size.toLong }
    val hot = df.filter(_._2 > maxDf).keySet
    perDoc.map { case (id, shs) => id -> (shs -- hot) }
      .filter(_._2.nonEmpty)
  }

  private def oracleSignature(shs: Set[String], numHashes: Int): Seq[Long] =
    (0 until numHashes).map(i => shs.map(sh => xxIntStr(i, sh)).min)

  // ---- family 1: minhash banding ------------------------------------

  test("40 generated minhash banding plans agree with the oracle") {
    val rnd = new scala.util.Random(20260814)
    (1 to 40).foreach { i =>
      val k = 1 + rnd.nextInt(4)                       // shingle k 1..4
      val maxDf = Seq(5L, 20L, 100L, 10000L)(rnd.nextInt(4))
      val (numHashes, rowsPerBand) = Seq(
        (8, 2), (8, 4), (16, 2), (16, 4), (16, 8), (32, 4), (32, 8),
        (64, 8))(rnd.nextInt(8))
      // vary the corpus: a residue-class subset keeps plans independent
      val m = 1 + rnd.nextInt(4)
      val r = rnd.nextInt(m)
      val docs = corpus.filter(_._1 % m == r)
      val sub = docsDf.filter(col("doc_id") % m === r)

      val got = Dedup.minhashCandidates(
          Dedup.shingles(sub, maxDf, k), numHashes, rowsPerBand)
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet

      val shs = oracleShingles(docs, k, maxDf)
      val sigs = shs.map { case (id, s) =>
        id -> oracleSignature(s, numHashes) }
      val ids = sigs.keys.toSeq.sorted
      val nBands = numHashes / rowsPerBand
      val want = (for {
        ai <- ids.indices; bi <- (ai + 1) until ids.size
        a = ids(ai); b = ids(bi)
        sa = sigs(a); sb = sigs(b)
        if (0 until nBands).exists(bd =>
          sa.slice(bd * rowsPerBand, (bd + 1) * rowsPerBand) ==
            sb.slice(bd * rowsPerBand, (bd + 1) * rowsPerBand))
      } yield {
        val agree = sa.zip(sb).count { case (x, y) => x == y }
        (a, b, agree.toDouble / numHashes)
      }).toSet
      assert(got == want,
        s"minhash plan $i (k=$k maxDf=$maxDf nh=$numHashes rpb=$rowsPerBand " +
          s"m=$m r=$r) diverged: spark=${got.size} oracle=${want.size} " +
          s"sparkOnly=${(got -- want).take(3)} oracleOnly=${(want -- got).take(3)}")
    }
  }

  // ---- family 2: simhash pigeonhole ---------------------------------

  test("30 generated simhash block plans agree with the oracle") {
    val rnd = new scala.util.Random(777001)
    (1 to 30).foreach { i =>
      val nBlocks = Seq(2, 4, 8)(rnd.nextInt(3))
      val m = 1 + rnd.nextInt(5)
      val r = rnd.nextInt(m)
      val docs = corpus.filter(_._1 % m == r)
      val sub = docsDf.filter(col("doc_id") % m === r)

      val got = Dedup.simhashCandidates(sub, nBlocks)
        .select("da", "db", "hamming")
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet

      val sigs = docs.map { case (id, _, text) =>
        val cnt = tokens(text).map(_.toLowerCase(java.util.Locale.ROOT))
          .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
        val tot = cnt.values.sum
        val sim = (0 until 64).map { j =>
          val raw = cnt.map { case (w, c) => c * ((xxStr(w) >> j) & 1L) }.sum
          if (2 * raw - tot > 0) 1L << j else 0L
        }.sum
        id -> sim
      }.toMap
      val bits = 64 / nBlocks
      val mask = if (bits == 64) -1L else (1L << bits) - 1L
      val ids = sigs.keys.toSeq.sorted
      val want = (for {
        ai <- ids.indices; bi <- (ai + 1) until ids.size
        a = ids(ai); b = ids(bi)
        if (0 until nBlocks).exists(bd =>
          ((sigs(a) >> (bd * bits)) & mask) == ((sigs(b) >> (bd * bits)) & mask))
      } yield (a, b, java.lang.Long.bitCount(sigs(a) ^ sigs(b)))).toSet
      assert(got == want,
        s"simhash plan $i (nBlocks=$nBlocks m=$m r=$r) diverged: " +
          s"spark=${got.size} oracle=${want.size} " +
          s"sparkOnly=${(got -- want).take(3)} oracleOnly=${(want -- got).take(3)}")
      // the pigeonhole guarantee itself: every pair with hamming <=
      // nBlocks-1 must be a candidate
      val lowHam = (for {
        ai <- ids.indices; bi <- (ai + 1) until ids.size
        a = ids(ai); b = ids(bi)
        if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= nBlocks - 1
      } yield (a, b)).toSet
      assert(lowHam.subsetOf(want.map(t => (t._1, t._2))),
        s"simhash plan $i: pigeonhole recall hole")
    }
  }

  // ---- family 3: components + incremental merge ---------------------

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val nx = parent(c); parent(c) = r; c = nx
      }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(x => x -> find(x)).toMap
  }

  private def edgeDf(edges: Seq[(Long, Long)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        edges.map { case (a, b) => Row(a, b) }, 2),
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))

  test("30 generated component plans: both variants + incremental ≡ oracle") {
    val rnd = new scala.util.Random(90210)
    (1 to 30).foreach { i =>
      val n = 20 + rnd.nextInt(180)
      val mEdges = 1 + rnd.nextInt(2 * n)
      // raw generator: self-loops, duplicates, and reversed duplicates
      // all occur naturally and must be harmless
      val edges = (0 until mEdges).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }
      val want = unionFind(n, edges)

      // random sparse graphs routinely have component diameter beyond
      // the shallow-cluster default maxIters (the documented refinement
      // cutoff) — pass the diameter-safe bound, n rounds
      val gotProp = Graph.connectedComponents(edgeDf(edges), "a", "b", n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotProp == want, s"component plan $i: propagation diverged " +
        s"(n=$n m=$mEdges)")

      val gotStar = Graph.connectedComponentsStar(edgeDf(edges), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotStar == want, s"component plan $i: star variant diverged " +
        s"(n=$n m=$mEdges)")

      // random split point: day-1 assignment + day-2 edges must merge to
      // the one-shot answer (dd11's contract, here at a random cut and
      // with batch-2 edges that may bridge, duplicate, or ignore batch 1)
      val cut = rnd.nextInt(edges.size + 1)
      val (b1, b2) = edges.splitAt(cut)
      val merged =
        if (b1.isEmpty) Graph.connectedComponents(edgeDf(b2), "a", "b", n)
        else Graph.incrementalComponents(
          Graph.connectedComponents(edgeDf(b1), "a", "b", n),
          edgeDf(b2.toSeq), "a", "b", n)
      val gotInc = merged.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val wantInc =
        if (b2.isEmpty && b1.isEmpty) Map.empty[Long, Long] else want
      assert(gotInc == wantInc,
        s"component plan $i: incremental(cut=$cut) diverged")
    }
  }
}
