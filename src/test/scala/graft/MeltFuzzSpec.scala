package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Expand, LogicalPlan, Union}
import org.apache.spark.sql.functions._
import graft.plans.Melt

/** Generated-plan fuzz for MeltUnionToExpand's firing predicate: across
  * random same-child unions — lit-tagged melts, disjoint measure pools,
  * overlapping self-union shapes, and mixtures — the rewrite must (a)
  * never change the result multiset and (b) fire exactly when the
  * documented guard says (literal discriminator with ≥2 values, OR
  * pairwise-disjoint branch column references).
  */
class MeltFuzzSpec extends SparkSpec {

  private lazy val src = spark.read.parquet(s"${sf()}/part.parquet")
    .select(col("p_partkey").as("k"),
      col("p_size").cast("double").as("m1"),
      col("p_retailprice").cast("double").as("m2"),
      (col("p_size") * 2).cast("double").as("m3"))
    .localCheckpoint()

  private def count(p: LogicalPlan, cls: Class[_]): Int =
    p.collect { case n if cls.isInstance(n) => n }.size

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  // one slice: optional literal tag + a chosen measure column
  private def slice(label: Option[String], m: String): DataFrame =
    label match {
      case Some(l) => src.select(lit(l).as("label"), col(m).as("v"))
      case None => src.select(col(m).as("v"))
    }

  test("fuzz: rewrite fires iff label-or-disjoint, values always equal") {
    val rnd = new scala.util.Random(2026)
    val measures = Seq("m1", "m2", "m3", "k")
    for (trial <- 1 to 40) {
      val n = 2 + rnd.nextInt(3)
      val tagged = rnd.nextBoolean()
      val cols = Seq.fill(n)(measures(rnd.nextInt(measures.size)))
      val slices =
        if (tagged) cols.zipWithIndex.map { case (m, i) =>
          slice(Some(s"l$i"), m) }
        else cols.map(m => slice(None, m))
      val naive = slices.reduce(_ union _)
      val rewritten = Melt.rewrite(naive)
      val plan = rewritten.queryExecution.analyzed
      // prediction: tagged unions always rewrite (n distinct labels);
      // untagged ones only when every branch uses a DISTINCT column
      val expectFire = tagged || cols.distinct.size == cols.size
      val fired = count(plan, classOf[Union]) == 0 &&
        count(plan, classOf[Expand]) == 1
      assert(fired == expectFire,
        s"trial $trial: tagged=$tagged cols=$cols fired=$fired")
      assert(rows(rewritten) == rows(naive),
        s"trial $trial: values diverged (tagged=$tagged cols=$cols)")
    }
  }

  test("fuzz: bare-attribute branches under downstream filters") {
    // the ADVICE r8 wrong-results shape generalized: branches project
    // BARE attributes (head branch output reuses child exprIds), a
    // random predicate lands on top — filter pushdown below the Expand
    // must never apply the head column's filter to other projections.
    val rnd = new scala.util.Random(99)
    val measures = Seq("m1", "m2", "m3", "k")
    for (trial <- 1 to 25) {
      val n = 2 + rnd.nextInt(3)
      val cols = rnd.shuffle(measures).take(n) // distinct → rewrite fires
      val slices = cols.map(m => src.select(col(m)))
      val naive = slices.reduce(_ union _)
      val rewritten = Melt.rewrite(naive)
      val plan = rewritten.queryExecution.analyzed
      assert(count(plan, classOf[Expand]) == 1 &&
        count(plan, classOf[Union]) == 0, s"trial $trial: $cols")
      // the invariant itself: no Expand output attribute may alias a
      // child output (that is what licenses the pushdown)
      val e = plan.collect { case x: Expand => x }.head
      assert(!e.output.exists(e.child.outputSet.contains),
        s"trial $trial: Expand output reuses child exprIds")
      val thr = Seq(0d, 5d, 50d, 1000d)(rnd.nextInt(4))
      val p = col(cols.head) > lit(thr)
      assert(rows(rewritten.filter(p)) == rows(naive.filter(p)),
        s"trial $trial: filtered values diverged (cols=$cols thr=$thr)")
    }
  }

  test("fuzz: BARE incremental folds re-fold through the restore Project") {
    // the r9 slices() composition: a bare-attribute incremental loop
    // produces Project(restore, Expand(...)) at step 1 (fresh-exprId
    // invariant), and every later step must compose through it back to
    // ONE Expand — while the invariant and downstream-filter soundness
    // hold at EVERY intermediate step, not just the last
    val rnd = new scala.util.Random(41)
    val measures = Seq("m1", "m2", "m3", "k")
    for (trial <- 1 to 15) {
      val n = 2 + rnd.nextInt(3)
      val cols = rnd.shuffle(measures).take(n)
      val slices = cols.map(m => src.select(col(m)))
      var acc = slices.head
      slices.tail.zipWithIndex.foreach { case (s, step) =>
        acc = Melt.rewrite(acc union s)
        val plan = acc.queryExecution.analyzed
        assert(count(plan, classOf[Union]) == 0 &&
          count(plan, classOf[Expand]) == 1,
          s"trial $trial step $step: unfused (cols=$cols)")
        val e = plan.collect { case x: Expand => x }.head
        assert(e.projections.size == step + 2,
          s"trial $trial step $step: wrong arity")
        assert(!e.output.exists(e.child.outputSet.contains),
          s"trial $trial step $step: Expand output reuses child exprIds")
      }
      val naive = slices.reduce(_ union _)
      assert(rows(acc) == rows(naive), s"trial $trial: values (cols=$cols)")
      val thr = Seq(0d, 5d, 50d, 1000d)(rnd.nextInt(4))
      val p = col(cols.head) > lit(thr)
      assert(rows(acc.filter(p)) == rows(naive.filter(p)),
        s"trial $trial: filtered values diverged (cols=$cols thr=$thr)")
    }
  }

  test("fuzz: incremental acc-union folding preserves the predicate") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 10) {
      val n = 2 + rnd.nextInt(3)
      val slices = (0 until n).map(i => slice(Some(s"t$i"), "m1"))
      // fold one slice at a time, rewriting eagerly at each step — the
      // user's acc = acc.union(slice) loop under an extensions session
      val folded = slices.reduce((acc, s) => Melt.rewrite(acc union s))
      val plan = folded.queryExecution.analyzed
      assert(count(plan, classOf[Union]) == 0, s"trial $trial")
      assert(count(plan, classOf[Expand]) == 1, s"trial $trial")
      val e = plan.collect { case x: Expand => x }.head
      assert(e.projections.size == n, s"trial $trial")
      assert(rows(folded) == rows(slices.reduce(_ union _)),
        s"trial $trial")
    }
  }
}
