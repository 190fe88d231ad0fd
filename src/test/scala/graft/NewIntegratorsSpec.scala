package graft

import org.apache.spark.sql.functions._
import graft.sources._
import graft.harmonize.{DataQuality, Harmonize}

/** Invariants for the five round-6 integrator adapters (toxvaldb, tox21,
  * toxcast, reach, pubchem) — each pinning the behavior its reference
  * script defines, on top of the h13–h17 full-output oracles.
  */
class NewIntegratorsSpec extends SparkSpec {

  private lazy val tval = SourceAdapter.cachedStaging(ToxvaldbAdapter, spark, sf())
  private lazy val t21 = SourceAdapter.cachedStaging(Tox21Adapter, spark, sf())
  private lazy val tcast = SourceAdapter.cachedStaging(ToxcastAdapter, spark, sf())
  private lazy val reach = SourceAdapter.cachedStaging(ReachAdapter, spark, sf())
  private lazy val pc = SourceAdapter.cachedStaging(PubchemAdapter, spark, sf())

  private def coverExactly(t: StagingTriplet): Unit = {
    val actPids = t.activities.select("pid").distinct()
    val propPids = t.properties.select("pid").distinct()
    assert(actPids.except(propPids).isEmpty && propPids.except(actPids).isEmpty)
    val actSids = t.activities.select("sid").distinct()
    val subSids = t.substances.select("sid").distinct()
    assert(actSids.except(subSids).isEmpty && subSids.except(actSids).isEmpty)
  }

  test("toxvaldb: QC filters, support floor, and binarization hold") {
    val acts = tval.activities
    assert(acts.count() > 0)
    // R:23's support floor, scaled: every property keeps >= 6 pairs
    val minSupport = acts.groupBy("pid").count()
      .agg(min("count")).collect().head.getLong(0)
    assert(minSupport >= 6, minSupport)
    // both classes exist somewhere (median split), magnitudes retained
    assert(acts.select("value").distinct().count() == 2)
    assert(acts.filter(col("numvalue").isNull).count() == 0)
    // qa filter: no property derives from the 'error' event type
    val errPid = tval.properties
      .filter(get_json_object(col("data"), "$.event_type") === "error")
    assert(errPid.isEmpty)
    // comptox join: entities with a NULL-structure identifier row
    // (key % 9 == 4) never appear
    val badSid = md5(concat(lit("tval:"), lit("4")))
    assert(acts.filter(col("sid") === badSid).count() == 0)
    coverExactly(tval)
  }

  test("tox21: expansion, discordance, support and two-class floors hold") {
    val acts = t21.activities
    assert(acts.count() > 0)
    // one row per (sid, pid) — the reference's closing assertion (R:57-58)
    assert(acts.groupBy("sid", "pid").count()
      .filter(col("count") > 1).isEmpty)
    // every pid carries BOTH classes (R:56) with >= 26 examples each (R:55)
    val perClass = acts.groupBy("pid", "value").count()
    assert(perClass.agg(min("count")).collect().head.getLong(0) >= 26)
    assert(perClass.groupBy("pid").count()
      .filter(col("count") =!= 2).isEmpty)
    // the assay axis exists: both expanded outcomes appear as pids
    val assays = t21.properties
      .select(get_json_object(col("data"), "$.assay").as("a"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(assays == Set("active agonist", "active antagonist"), assays)
    // no numeric magnitude in this source (reference exports none)
    assert(acts.filter(col("numvalue").isNotNull).count() == 0)
    coverExactly(t21)
  }

  test("toxcast: consensus is a rounded median over {0,1} hitcalls") {
    val acts = tcast.activities
    assert(acts.count() > 0)
    // numvalue carries the consensus: exactly 0.0 or 1.0, value matches
    assert(acts.filter(!col("numvalue").isin(0.0, 1.0)).isEmpty)
    assert(acts.filter(
      (col("numvalue") === 1.0 && col("value") =!= "positive") ||
      (col("numvalue") === 0.0 && col("value") =!= "negative")).isEmpty)
    // two-class + support floors (R:46-47)
    val perClass = acts.groupBy("pid", "value").count()
    assert(perClass.agg(min("count")).collect().head.getLong(0) >= 4)
    assert(perClass.groupBy("pid").count()
      .filter(col("count") =!= 2).isEmpty)
    // NULL-structure entities dropped through the shared comptox dim
    val badSid = md5(concat(lit("tcast:"), lit("4")))
    assert(acts.filter(col("sid") === badSid).count() == 0)
    coverExactly(tcast)
  }

  test("reach: GHS lookup filters hazards; double support floor holds") {
    val acts = reach.activities
    assert(acts.count() > 0)
    // only the 7 TSV hazards can survive the inner join (R:13)
    val hazards = reach.properties
      .select(get_json_object(col("data"), "$.hazard").as("h"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(hazards.subsetOf(
      Set("H20", "H21", "H22", "H23", "H24", "H25", "H26")), hazards)
    // > 100 positives AND > 100 negatives per surviving hazard (R:51-53)
    val perClass = acts.groupBy("pid", "value").count()
    assert(perClass.agg(min("count")).collect().head.getLong(0) > 100)
    assert(perClass.groupBy("pid").count()
      .filter(col("count") =!= 2).isEmpty)
    // rank-disambiguated content aids are unique even on the testdata's
    // duplicate physical records (same ecnumber, two measures)
    assert(acts.count() == acts.select("aid").distinct().count())
    coverExactly(reach)
  }

  test("pubchem: single-entry window filter drops planted duplicates") {
    val acts = pc.activities
    assert(acts.count() > 0)
    // ids % 13 == 0 carry a second conflicting InChI record and must be
    // dropped by the count-over-id == 1 filter (py:28-30)
    val dupSid = md5(concat(lit("pc:"), lit("13")))
    assert(acts.filter(col("sid") === dupSid).count() == 0)
    assert(pc.substances
      .filter(get_json_object(col("data"), "$.pubchem_cid") % 13 === 0)
      .isEmpty)
    // assay dim restricted to the % 4 slice (py:38-44 stand-in)
    assert(pc.properties
      .filter(get_json_object(col("data"), "$.assay_id") % 4 =!= 0)
      .isEmpty)
    // distinct over the final narrow schema: aid unique (py:57-59)
    assert(acts.count() == acts.select("aid").distinct().count())
    coverExactly(pc)
  }

  private lazy val sider = SourceAdapter.cachedStaging(SiderAdapter, spark, sf())

  test("sider: multi-label unpivot retains matrix nulls; filters hold") {
    val acts = sider.activities
    assert(acts.count() > 0)
    // the reference's BBBP-style non-empty staging assertion (13:66-68)
    // — here, not in staging(), which runs under the global memo lock
    assert(!sider.substances.isEmpty, "sider substances staging is empty")
    assert(!sider.properties.isEmpty, "sider properties staging is empty")
    // exactly the 5 discovered label columns become properties
    assert(sider.properties.count() == 5)
    // the unpivot must RETAIN null matrix cells (the load-bearing
    // Dataset.unpivot-vs-SQL-UNPIVOT distinction): every surviving
    // compound yields exactly |labels| activity rows
    assert(acts.groupBy("sid").count()
      .filter(col("count") =!= 5).isEmpty)
    // the null→positive reference wart (15:79): missing cells carry
    // value=positive with a NULL numvalue
    val missing = acts.filter(col("numvalue").isNull)
    assert(missing.count() > 0)
    assert(missing.filter(col("value") =!= "positive").isEmpty)
    // measured cells: 0→negative, 1→positive, numvalue ∈ {0.0, 1.0}
    val measured = acts.filter(col("numvalue").isNotNull)
    assert(measured.filter(!col("numvalue").isin(0.0, 1.0)).isEmpty)
    assert(measured.filter(
      (col("numvalue") === 0.0 && col("value") =!= "negative") ||
      (col("numvalue") === 1.0 && col("value") =!= "positive")).isEmpty)
    // filter 1: null-smiles compounds (partkey % 97 == 0) dropped
    assert(acts.filter(col("sid") === md5(lit("sider:S97"))).isEmpty)
    // filter 2: failed conversions (smiles ending in '7') dropped —
    // every surviving inchi is non-empty and well-formed
    assert(acts.filter(!col("inchi").startsWith("InChI=1S/S")).isEmpty)
    assert(acts.filter(col("inchi").endsWith("7")).isEmpty)
    assert(acts.count() == acts.select("aid").distinct().count())
    coverExactly(sider)
  }

  test("fourteen-source brick: new sources harmonize and pass DataQuality") {
    val brick = Harmonize.cachedBrick(spark, sf(), SourceAdapter.all)
    val sources = brick.activities.select("source").distinct()
      .collect().map(_.getString(0)).toSet
    assert(Set("toxvaldb", "tox21", "toxcast", "reach", "pubchem")
      .subsetOf(sources), sources)
    val res = DataQuality.run(brick, SourceAdapter.all.map(_.name).toSet)
    assert(res.forall(_.passed), res.filterNot(_.passed).mkString("; "))
    // cross-source structure identity: toxvaldb and toxcast resolve the
    // same entities through the same comptox dim, so their canonical
    // substance JSON collides into SHARED brick sids — the harmonize
    // merge the shared dim exists to produce
    val bySrc = brick.substances
      .filter(col("source").isin("toxvaldb", "toxcast"))
    val shared = bySrc.groupBy("sid")
      .agg(countDistinct("source").as("ns"))
      .filter(col("ns") === 2)
    assert(shared.count() > 0)
  }
}
