package graft

import org.apache.spark.sql.functions._
import graft.queries.RelationalQueries

/** a19 exact-power-sums moments: the single-pass integer-sum derivation
  * must agree with Spark's own CentralMomentAgg-based var_pop/corr (a
  * different algorithm — shifted central moments in floats), and the
  * plan must be one scan + one aggregate.
  */
class MomentsSpec extends SparkSpec {

  test("a19 moments agree with Spark's builtin var_pop/corr") {
    val builtin = Tables.documents(spark, sf())
      .select(col("lang"), col("n_chars").cast("double").as("x"),
        size(split(lower(col("text")), " ")).cast("double").as("y"))
      .groupBy(col("lang"))
      .agg(avg(col("x")).as("b_mean"), var_pop(col("x")).as("b_var"),
        corr(col("x"), col("y")).as("b_corr"))
    val out = RelationalQueries.queries("a19_exact_moments")(spark, sf())
      .join(builtin, Seq("lang"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      def rel(a: Double, b: Double) = math.abs(a - b) / math.max(math.abs(b), 1e-12)
      assert(rel(r.getAs[Double]("mean_x"), r.getAs[Double]("b_mean")) < 1e-9, r.toString)
      assert(rel(r.getAs[Double]("var_x"), r.getAs[Double]("b_var")) < 1e-9, r.toString)
      assert(rel(r.getAs[Double]("corr_xy"), r.getAs[Double]("b_corr")) < 1e-9, r.toString)
      assert(r.getAs[Double]("var_x") >= 0 &&
        math.abs(r.getAs[Double]("corr_xy")) <= 1.0, r.toString)
    }
  }

  test("a19 plan is one scan + one aggregate pair — no join, no second pass") {
    val plan = RelationalQueries.queries("a19_exact_moments")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"single-pass expected:\n$plan")
    // exactly one exchange: the group-by shuffle (partials combine map-side)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1, plan)
  }
}
