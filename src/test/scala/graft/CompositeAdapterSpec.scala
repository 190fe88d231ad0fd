package graft

import org.apache.spark.sql.functions._
import graft.harmonize.{DataQuality, Harmonize}
import graft.sources.{BindingdbAdapter, CtdbaseAdapter, SourceAdapter,
  ToxrefdbAdapter}

/** The three round-4 composite integrators end-to-end: bindingdb-shaped
  * (wide-assay unpivot), ctdbase-shaped (cached REST lookup + direction
  * flip), toxrefdb-shaped (multi-table JDBC with pushdown) — plus the
  * full eight-source brick passing the reference's QC suite.
  */
class CompositeAdapterSpec extends SparkSpec {

  private lazy val bdb = BindingdbAdapter.staging(spark, sf())
  private lazy val ctd = CtdbaseAdapter.staging(spark, sf())
  private lazy val tox = ToxrefdbAdapter.staging(spark, sf())

  test("bindingdb: unpivot keeps 4 of 6 metrics, censored rows drop") {
    val acts = bdb.activities
    val n = acts.count()
    // 6000 lineitem rows x 4 kept metrics, minus the deterministic
    // unparseable slice (~1/11 per metric)
    assert(n > 20000 && n < 24000, n)
    assert(acts.select("aid").distinct().count() == n) // aid unique
    assert(bdb.properties.count() == 8) // 2 linestatus x 4 metrics
  }

  test("bindingdb: parse stage stays inside whole-stage codegen") {
    // Regression guard for a Spark 4.1.2 codegen bug: with the censor
    // parse AFTER the unpivot, subexpression elimination hoisted the
    // duplicated parse into a helper whose parameter was the Expand's
    // mutable-state slot (`UTF8String expand_mutableStateArray_0[0]` —
    // invalid Java), janino rejected it, and the stage silently ran
    // interpreted. The adapter now parses pre-Expand; this pins that
    // every codegen subtree of the staging plan actually compiles
    // (codegenToSeq reports ByteCodeStats(-1,…) on compile failure).
    import org.apache.spark.sql.execution.debug._
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false") // expose subtrees
    val acts = BindingdbAdapter.staging(s2, sf()).activities
    val stats = acts.queryExecution.debug.codegenToSeq()
    assert(stats.nonEmpty)
    stats.foreach { case (subtree, _, bc) =>
      assert(bc.maxMethodCodeSize > 0, s"codegen failed for:\n$subtree")
    }
  }

  test("bindingdb: props/subs cover exactly the surviving activities") {
    val actPids = bdb.activities.select("pid").distinct()
    val propPids = bdb.properties.select("pid").distinct()
    assert(actPids.except(propPids).isEmpty && propPids.except(actPids).isEmpty)
    val actSids = bdb.activities.select("sid").distinct()
    val subSids = bdb.substances.select("sid").distinct()
    assert(actSids.except(subSids).isEmpty && subSids.except(actSids).isEmpty)
  }

  test("ctdbase: direction flip is an involution — classes balance") {
    val byValue = ctd.activities.groupBy("value").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byValue("positive") == byValue("negative"), byValue)
    // ctd is the no-magnitude source: numvalue is NULL throughout
    assert(ctd.activities.filter(col("numvalue").isNotNull).count() == 0)
  }

  test("ctdbase: second staging run is served from the lookup cache") {
    ctd.activities.count() // populate the cache
    // a fresh adapter pass over the same keys must anti-join to zero
    // misses and fetch nothing; equality of output proves the cache path
    val again = CtdbaseAdapter.staging(spark, sf()).activities
    assert(again.except(ctd.activities).isEmpty &&
      ctd.activities.except(again).isEmpty)
  }

  test("toxrefdb: noael predicate pushes into the JDBC source") {
    // the pod scan inside the staging plan must carry the pushed filter
    val plans = tox.activities.queryExecution.executedPlan
      .collectLeaves().map(_.toString)
    assert(plans.exists(p => p.contains("POD_TYPE") &&
      p.contains("PushedFilters")), plans.mkString("\n"))
  }

  test("toxrefdb: null-guideline studies and structureless chemicals drop") {
    // guideline_number 5 never exists (5-LOW carries NULL in the source)
    val pids = tox.properties
      .select(get_json_object(col("data"), "$.guideline_number").as("g"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(pids == Set("1", "2", "3", "4"), pids)
    // chemicals whose dsstox id has no comptox structure never appear
    val badSid = md5(concat(lit("toxchem:"), lit("7")))
    assert(tox.activities.filter(col("sid") === badSid).count() == 0)
  }

  test("fourteen-source brick passes the full DataQuality suite") {
    val brick = Harmonize.cachedBrick(spark, sf(), SourceAdapter.all)
    val res = DataQuality.run(brick, SourceAdapter.all.map(_.name).toSet)
    assert(res.forall(_.passed), res.filterNot(_.passed).mkString("; "))
    val sources = brick.activities.select("source").distinct()
      .collect().map(_.getString(0)).toSet
    assert(sources == SourceAdapter.all.map(_.name).toSet)
  }

  test("brick collapse keeps one row per aid with the min magnitude") {
    val brick = Harmonize.cachedBrick(spark, sf(), SourceAdapter.all)
    val acts = brick.activities
    assert(acts.count() == acts.select("aid").distinct().count())
    // bindingdb repeats measurements per (sid, pid, value) — the brick
    // must collapse to exactly one row per staging group carrying the
    // group minimum: group counts and the min-sum must both agree
    val expect = bdb.activities
      .groupBy("sid", "pid", "value")
      .agg(min("numvalue").as("mn"))
      .agg(count(lit(1)).as("n"), sum("mn").as("s"))
      .collect().head
    val got = acts.filter(col("source") === "bindingdb")
      .agg(count(lit(1)).as("n"), sum("numvalue").as("s"))
      .collect().head
    assert(got.getLong(0) == expect.getLong(0),
      s"brick ${got.getLong(0)} vs staging groups ${expect.getLong(0)}")
    assert(math.abs(got.getDouble(1) - expect.getDouble(1)) < 1e-6)
    // and the collapse is real: staging has more rows than groups
    assert(bdb.activities.count() > expect.getLong(0))
  }
}
