package graft

import org.apache.spark.sql.functions._
import graft.queries.{RelationalQueries, SetReshapeQueries}

/** u8 SCD2 interval build and a20 skew profile: conservation laws the
  * censuses must obey, checked against independently computed totals.
  */
class ProfilingSpec extends SparkSpec {

  test("u8 intervals conserve events and open exactly one interval per user") {
    val ev = Tables.events(spark, sf())
    val out = SetReshapeQueries.queries("u8_scd2_intervals")(spark, sf())
      .collect()
    // every event opens exactly one interval
    assert(out.map(_.getAs[Long]("n_intervals")).sum == ev.count())
    // exactly one open (current) interval per user
    val nUsers = ev.select(col("user_id")).distinct().count()
    assert(out.map(_.getAs[Long]("n_open")).sum == nUsers)
    // closed durations are non-negative and total to the per-user
    // (max ts - min ts) span sum — intervals tile each user's timeline
    val span = ev.groupBy(col("user_id"))
      .agg((max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
        .as("span"))
      .agg(sum(col("span"))).head.getLong(0)
    assert(out.map(_.getAs[Long]("sum_dur_us")).sum == span)
  }

  test("a20 skew stats agree with direct computation") {
    val kc = Tables.lineitem(spark, sf())
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
      .select(col("c")).collect().map(_.getLong(0))
    val r = RelationalQueries.queries("a20_skew_profile")(spark, sf())
      .head
    assert(r.getAs[Long]("n_keys") == kc.length)
    assert(r.getAs[Long]("n_rows") == kc.sum)
    assert(r.getAs[Long]("max_per_key") == kc.max)
    val mean = kc.sum.toDouble / kc.length
    assert(r.getAs[Long]("n_hot_keys") == kc.count(_ > 2 * mean))
    assert(math.abs(r.getAs[Double]("skew_ratio") - kc.max / mean) < 1e-9)
  }
}
