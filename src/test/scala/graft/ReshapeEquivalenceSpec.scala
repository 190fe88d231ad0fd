package graft

import org.apache.spark.sql.functions._
import graft.harmonize.Harmonize
import graft.sources.{EventsAdapter, OrdersAdapter}

/** Pins the two round-15 query reshapes to their flat originals on
  * real fixture data — the offline guard for the algebra the DuckDB
  * oracle also checks end-to-end every round (the oracle SQL kept the
  * flat formulations on purpose, so a drift in either identity fails
  * the gate too; this spec localizes the failure to the identity).
  *
  *   - h6: aid = '<source>-'||md5(sid|...) determines sid, so
  *     aid-distinct sets are disjoint across sids and per-sid distinct
  *     counts SUM to the flat global countDistinct.
  *   - x14: count(*) per bigram over the instance frame equals the
  *     sum of per-(doc,lang,bigram) counts per bigram.
  */
class ReshapeEquivalenceSpec extends SparkSpec {

  test("h6 sid-pyramid distinct == flat countDistinct on the brick") {
    val acts = Harmonize
      .brick(spark, sf(), Seq(EventsAdapter, OrdersAdapter)).activities
    val flat = acts
      .agg(count(lit(1)).as("n_raw"), countDistinct(col("aid")).as("n_aids"))
      .collect().head
    val pyramid = acts
      .groupBy(col("sid"))
      .agg(count(lit(1)).as("n_s"), countDistinct(col("aid")).as("na_s"))
      .agg(coalesce(sum(col("n_s")), lit(0L)).as("n_raw"),
        coalesce(sum(col("na_s")), lit(0L)).as("n_aids"))
      .collect().head
    assert(flat.getLong(0) > 0, "fixture brick is empty")
    assert(pyramid.getLong(0) == flat.getLong(0) &&
      pyramid.getLong(1) == flat.getLong(1),
      s"pyramid (${pyramid.getLong(0)}, ${pyramid.getLong(1)}) != " +
        s"flat (${flat.getLong(0)}, ${flat.getLong(1)})")
  }

  test("h6 pyramid keeps the one-row-on-empty global-aggregate contract") {
    val acts = Harmonize
      .brick(spark, sf(), Seq(EventsAdapter, OrdersAdapter)).activities
    val empty = acts.filter(lit(false))
      .groupBy(col("sid"))
      .agg(count(lit(1)).as("n_s"), countDistinct(col("aid")).as("na_s"))
      .agg(coalesce(sum(col("n_s")), lit(0L)).as("n_raw"),
        coalesce(sum(col("na_s")), lit(0L)).as("n_aids"))
      .collect()
    assert(empty.length == 1 &&
      empty.head.getLong(0) == 0L && empty.head.getLong(1) == 0L)
  }

  test("x14 global bigram counts off the instance frame == derived from perDoc") {
    val bi = Tables.documents(spark, sf())
      .withColumn("ts", split(lower(col("text")), " "))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(1, size(ts)-1), " +
          "g -> concat_ws(' ', ts[g-1], ts[g]))")).as("bg"))
    val direct = bi.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
    val derived = bi
      .groupBy(col("doc_id"), col("lang"), col("bg"))
      .agg(count(lit(1)).as("c_doc"))
      .groupBy(col("bg")).agg(sum(col("c_doc")).as("cnt"))
    assert(direct.count() > 0, "fixture corpus has no bigrams")
    assert(direct.exceptAll(derived).count() == 0 &&
      derived.exceptAll(direct).count() == 0)
  }
}
