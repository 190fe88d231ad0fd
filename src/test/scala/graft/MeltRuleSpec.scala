package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Expand, LogicalPlan, Union}
import org.apache.spark.sql.functions._
import graft.plans.{Melt, MeltUnionToExpand}

/** plans.MeltUnionToExpand — the R2 loop-union melt rewritten to one
  * Expand (the plan `.unpivot` produces). Pins: the rewrite itself, its
  * equivalence to unpivot (values AND plan shape), the incremental
  * acc-union-slice path, the no-label pooled-measures shape, the
  * analyzer injection through GraftExtensions, and the negative guards
  * (nondeterministic source, different sources).
  */
class MeltRuleSpec extends SparkSpec {

  private def wide = spark.read.parquet(s"${sf()}/part.parquet").select(
    col("p_partkey"),
    (col("p_size") > 25).cast("int").as("nr_large"),
    col("p_type").like("%BRASS%").cast("int").as("nr_brass"),
    col("p_type").like("PROMO%").cast("int").as("sr_promo"),
    (col("p_retailprice") < 1400).cast("int").as("sr_economy"))

  private def slice(df: DataFrame, l: String): DataFrame =
    df.select(col("p_partkey"), lit(l).as("label"),
      col(l).cast("double").as("value"))

  private def count(p: LogicalPlan, cls: Class[_]): Int =
    p.collect { case n if cls.isInstance(n) => n }.size

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("loop-union melt rewrites to exactly one Expand, zero Union") {
    val labels = Seq("nr_large", "nr_brass", "sr_promo")
    val naive = labels.map(slice(wide, _)).reduce(_ union _)
    val rewritten = Melt.rewrite(naive)
    val plan = rewritten.queryExecution.analyzed
    assert(count(plan, classOf[Expand]) == 1, plan)
    assert(count(plan, classOf[Union]) == 0, plan)
    // Expand carries one projection per slice
    val e = plan.collect { case x: Expand => x }.head
    assert(e.projections.size == labels.size)
    assert(sortedRows(rewritten) == sortedRows(naive))
  }

  test("rewritten plan matches .unpivot: same values, same Expand shape") {
    val labels = Seq("nr_large", "nr_brass", "sr_promo", "sr_economy")
    val naive = labels.map(slice(wide, _)).reduce(_ union _)
    val viaRule = Melt.rewrite(naive)
    val viaUnpivot = wide
      .unpivot(Array(col("p_partkey")), labels.map(col).toArray,
        "label", "value")
      .select(col("p_partkey"), col("label"), col("value").cast("double"))
    assert(sortedRows(viaRule) == sortedRows(viaUnpivot))
    // both optimize to a single Expand over a single scan, no Union —
    // the h18/sider plan shape
    for (df <- Seq(viaRule, viaUnpivot)) {
      val opt = df.queryExecution.optimizedPlan
      assert(count(opt, classOf[Expand]) == 1, opt)
      assert(count(opt, classOf[Union]) == 0, opt)
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("Union"), phys)
    }
  }

  test("fuzz: N-slice unions for N in 2..4 with shuffled label order") {
    val all = Seq("nr_large", "nr_brass", "sr_promo", "sr_economy")
    for (n <- 2 to all.size; rot <- 0 until 2) {
      val labels = (all.drop(rot) ++ all.take(rot)).take(n)
      val naive = labels.map(slice(wide, _)).reduce(_ union _)
      val rewritten = Melt.rewrite(naive)
      val plan = rewritten.queryExecution.analyzed
      assert(count(plan, classOf[Expand]) == 1, s"n=$n rot=$rot: $plan")
      assert(count(plan, classOf[Union]) == 0, s"n=$n rot=$rot")
      assert(sortedRows(rewritten) == sortedRows(naive), s"n=$n rot=$rot")
    }
  }

  test("incremental acc-union-slice folds into the existing Expand") {
    // the eager-analysis path: each union step is rewritten as it is
    // built, so step k sees Union(Expand-from-step-k-1, newSlice)
    val s1 = slice(wide, "nr_large"); val s2 = slice(wide, "nr_brass")
    val s3 = slice(wide, "sr_promo")
    val step1 = Melt.rewrite(s1 union s2)
    val step2 = Melt.rewrite(step1 union s3)
    val plan = step2.queryExecution.analyzed
    assert(count(plan, classOf[Expand]) == 1, plan)
    assert(count(plan, classOf[Union]) == 0, plan)
    val e = plan.collect { case x: Expand => x }.head
    assert(e.projections.size == 3)
    val naive = (s1 union s2) union s3
    assert(sortedRows(step2) == sortedRows(naive))
  }

  test("bare-attribute incremental union folds through the restore Project") {
    // NOTES r9 #2: the ADVICE-r8 fix emits Project(restore, Expand(...))
    // for bare-attribute branches, and that Project used to block the
    // NEXT incremental step from folding (slices() saw a Project over an
    // Expand and gave up) — correct but unfused, N-1 Expands for N
    // slices. slices() now composes the projection through the Expand,
    // so the eager-analysis loop folds back to ONE Expand while the
    // fresh-exprId invariant (and thus filter-pushdown correctness)
    // still holds at every step.
    // branches must project bare SOURCE columns — only then does the
    // union output reuse the relation's exprId, forcing the fresh-id +
    // restore-Project shape at step 1 (disjoint string columns of the
    // raw table; wide's derived columns alias underneath and never
    // trigger the restore)
    val part = spark.read.parquet(s"${sf()}/part.parquet")
    val a = part.select(col("p_name"))
    val b = part.select(col("p_brand"))
    val c = part.select(col("p_type"))
    val step1 = Melt.rewrite(a union b)
    // step 1 really is the restore shape: Project over one Expand
    val p1 = step1.queryExecution.analyzed
    assert(count(p1, classOf[Expand]) == 1, p1)
    assert(p1.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.Project], p1)
    val step2 = Melt.rewrite(step1 union c)
    val plan = step2.queryExecution.analyzed
    assert(count(plan, classOf[Expand]) == 1, plan)
    assert(count(plan, classOf[Union]) == 0, plan)
    val e = plan.collect { case x: Expand => x }.head
    assert(e.projections.size == 3, plan)
    // the Expand invariant survives the re-fold
    assert(!e.output.exists(e.child.outputSet.contains), plan)
    val naive = (a union b) union c
    assert(sortedRows(step2) == sortedRows(naive))
    // and a downstream filter on the head column stays sound
    // keeps all of branch a, none of b, some of c — a pushdown bug
    // that applies the head predicate per-branch changes the multiset
    val fNaive = sortedRows(naive.filter(col("p_name") > "PROMO"))
    val fRule = sortedRows(step2.filter(col("p_name") > "PROMO"))
    assert(fRule == fNaive && fNaive.nonEmpty)
  }

  test("no-label same-child unions collapse when slices are disjoint") {
    // no literal discriminator, branches reference DISJOINT child
    // columns — the r6_stacked_measures pooled-measures shape, where
    // one Expand scan replaces N passes over the source. Fires.
    val a = wide.select(col("nr_large").cast("double").as("v"))
    val b = wide.select(col("nr_brass").cast("double").as("v"))
    val pooled = Melt.rewrite(a union b)
    val plan = pooled.queryExecution.analyzed
    assert(count(plan, classOf[Expand]) == 1, plan)
    assert(count(plan, classOf[Union]) == 0, plan)
    assert(sortedRows(pooled) == sortedRows(a union b))
  }

  test("unaliased branches + downstream filter: pushdown stays correct") {
    // ADVICE r8 (high): when the head branch projects a BARE attribute,
    // the Expand output used to reuse the child exprId at a position
    // where other branches emit different expressions — the optimizer
    // then pushed parent filters below the Expand (the attribute looked
    // like a passthrough) and applied them to the source column for ALL
    // projections, returning wrong rows. The fix emits a fresh exprId
    // there plus a restoring Project. This is the reproduction shape.
    val a = wide.select(col("nr_large"))
    val b = wide.select(col("nr_brass"))
    val naive = a union b // plain session: no rule, ground truth
    val rewritten = Melt.rewrite(naive)
    // rewrite still fires (disjoint-slice pooled shape) ...
    val plan = rewritten.queryExecution.analyzed
    assert(count(plan, classOf[Expand]) == 1, plan)
    assert(count(plan, classOf[Union]) == 0, plan)
    // ... but no Expand output attribute may alias a child output —
    // that is the invariant filter pushdown relies on
    val e = plan.collect { case x: Expand => x }.head
    val childIds = e.child.outputSet
    assert(!e.output.exists(childIds.contains),
      s"Expand output reuses child exprIds: $plan")
    // the filtered frames must agree — pre-fix the rewritten side
    // returned branch-B rows filtered on the SOURCE nr_large column
    val fNaive = sortedRows(naive.filter(col("nr_large") > 0))
    val fRule = sortedRows(rewritten.filter(col("nr_large") > 0))
    assert(fRule == fNaive)
    assert(fNaive.nonEmpty, "vacuous reproduction: filter kept no rows")
    // unfiltered multisets agree too
    assert(sortedRows(rewritten) == sortedRows(naive))
  }

  test("genuine passthrough (bare id in every branch) keeps plain Expand") {
    // the common melt shape keeps the id column bare and identical in
    // every branch — a true passthrough, no restoring Project needed,
    // and pushing an id filter below the Expand IS correct there
    val s1 = wide.select(col("p_partkey"), lit("a").as("label"),
      col("nr_large").cast("double").as("value"))
    val s2 = wide.select(col("p_partkey"), lit("b").as("label"),
      col("nr_brass").cast("double").as("value"))
    val naive = s1 union s2
    val rewritten = Melt.rewrite(naive)
    val plan = rewritten.queryExecution.analyzed
    // root is the Expand itself — no restoring Project was added
    assert(plan.isInstanceOf[Expand], plan)
    val fNaive = sortedRows(naive.filter(col("p_partkey") <= 20))
    val fRule = sortedRows(rewritten.filter(col("p_partkey") <= 20))
    assert(fRule == fNaive)
    assert(fNaive.nonEmpty)
  }

  test("no-label unions with OVERLAPPING references do NOT rewrite") {
    // same-child unions re-reading the same columns have no scan to
    // save, and rewriting them blocks PushDistinctThroughUnion —
    // measured 2.6x slower on the graph-components sym union. The
    // edge-symmetrization shape and the pure self-union must survive.
    val e = wide.select(col("p_partkey").as("a"),
      col("nr_large").cast("long").as("b"))
    val sym = Melt.rewrite(
      e union e.select(col("b").as("a"), col("a").as("b")))
    assert(count(sym.queryExecution.analyzed, classOf[Union]) == 1)
    assert(count(sym.queryExecution.analyzed, classOf[Expand]) == 0)
    val dup = Melt.rewrite(e union e)
    assert(count(dup.queryExecution.analyzed, classOf[Union]) == 1)
  }

  test("guards: nondeterministic and mixed-source unions survive") {
    // nondeterministic source — collapsing two scans into one changes
    // semantics, must not fire
    val nd = wide.withColumn("r", rand(7))
    val ndU = Melt.rewrite(
      nd.select(col("p_partkey"), lit("a").as("label"), col("r"))
        union
        nd.select(col("p_partkey"), lit("b").as("label"), col("r") + 1))
    assert(count(ndU.queryExecution.analyzed, classOf[Union]) == 1)
    // different sources with identical schemas — children not
    // canonically equal, must not fire
    val other = spark.read.parquet(s"${sf()}/supplier.parquet").select(
      col("s_suppkey").as("p_partkey"),
      (col("s_acctbal") > 0).cast("int").as("nr_large"),
      lit(0).as("nr_brass"), lit(0).as("sr_promo"),
      lit(0).as("sr_economy"))
    val mixed = Melt.rewrite(slice(wide, "nr_large") union slice(other, "nr_brass"))
    assert(count(mixed.queryExecution.analyzed, classOf[Union]) == 1)
  }

  test("GraftExtensions injects the rule: naive union plans as Expand") {
    // a fresh SparkSession over the SAME SparkContext with the graft
    // extensions applied — the driver's Verify/Bench sessions get the
    // same wiring via the spark.sql.extensions conf at context creation
    // (conf-based injection can't retrofit this JVM's pre-existing
    // context, so the test injects through withExtensions explicitly)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(e => new graft.functions.GraftExtensions()(e))
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(s ne spark, "expected a fresh session with extensions")
      val w = s.read.parquet(s"${sf()}/part.parquet").select(
        col("p_partkey"),
        (col("p_size") > 25).cast("int").as("nr_large"),
        col("p_type").like("%BRASS%").cast("int").as("nr_brass"))
      val naive = Seq("nr_large", "nr_brass").map(slice(w, _))
        .reduce(_ union _)
      val analyzed = naive.queryExecution.analyzed
      assert(count(analyzed, classOf[Expand]) == 1, analyzed)
      assert(count(analyzed, classOf[Union]) == 0, analyzed)
      // and the physical plan reads the source once
      val phys = naive.queryExecution.executedPlan.toString
      assert(!phys.contains("Union"), phys)
      assert(phys.contains("Expand"), phys)
      // r5_melt_union through the extensions session = Expand plan
      val r5 = SparkEntry.queries("r5_melt_union")(s, sf())
      val r5a = r5.queryExecution.analyzed
      assert(count(r5a, classOf[Expand]) == 1, r5a)
      assert(count(r5a, classOf[Union]) == 0, r5a)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
