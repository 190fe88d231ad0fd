package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.KMeans

/** Distributed spherical k-means — determinism, Lloyd convergence
  * behavior, and mean correctness.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sf())
  }

  private def init(k: Int) = vecs.filter(col("vec_id") < k)
    .select(col("vec_id").as("cid"),
      expr("transform(embedding, x -> cast(x AS double))").as("cv"))

  test("assignment is total and deterministic") {
    val a1 = KMeans.assign(vecs, init(8), "vec_id", "embedding")
    assert(a1.count() == vecs.count())
    assert(a1.select("vec_id").distinct().count() == vecs.count())
    val a2 = KMeans.assign(vecs, init(8), "vec_id", "embedding")
    assert(a1.select("vec_id", "cid")
      .exceptAll(a2.select("vec_id", "cid")).count() == 0)
  }

  test("argmax-struct assignment is identical to the row_number window form") {
    // assign's aggregate shape (the scale fix: N winners cross the
    // exchange instead of N×k sorted rows) must pick the same centroid
    // as the window formulation on real data
    import org.apache.spark.sql.expressions.Window
    val cents = init(8)
    val viaAgg = KMeans.assign(vecs, cents, "vec_id", "embedding")
      .select("vec_id", "cid")
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("__ccos").desc, col("cid"))
    val viaWin = vecs.crossJoin(broadcast(cents))
      .withColumn("__ccos", expr("cosine_sim(embedding, cv)"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select("vec_id", "cid")
    assert(viaAgg.exceptAll(viaWin).count() == 0 &&
      viaWin.exceptAll(viaAgg).count() == 0)
    // and carried non-key columns survive with their values
    val lbl = KMeans.assign(vecs, cents, "vec_id", "embedding")
      .select("vec_id", "label")
    assert(lbl.exceptAll(vecs.select("vec_id", "label")).count() == 0)
  }

  test("assignment ties break to the lowest cid") {
    val v = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cents = Seq((7L, Array(1.0, 0.0)), (3L, Array(1.0, 0.0)))
      .toDF("cid", "cv")
    val got = KMeans.assign(v, cents, "vec_id", "embedding")
      .select("cid").head.getLong(0)
    assert(got == 3L)
    val fused = KMeans.assignFused(v, cents, "embedding")
      .select("cid").head.getLong(0)
    assert(fused == 3L)
  }

  test("fused assignment matches the aggregate form on real data") {
    // the NearestCentroid expression (k×d loop in generated code, no
    // N×k row stream) must pick the same centroid AND report the same
    // cosine as the relational argmax; ccos is cross-checked against
    // the native cosine_sim of the chosen centroid so the fused
    // arithmetic can't drift from the expression every query uses
    val cents = init(8)
    val fused = KMeans.assignFused(vecs, cents, "embedding")
    val viaAgg = KMeans.assign(vecs, cents, "vec_id", "embedding")
      .select("vec_id", "cid")
    assert(fused.select("vec_id", "cid").exceptAll(viaAgg).count() == 0 &&
      viaAgg.exceptAll(fused.select("vec_id", "cid")).count() == 0)
    val badCos = fused.join(cents, Seq("cid"))
      .withColumn("ref", expr("cosine_sim(embedding, cv)"))
      .filter(col("ref") =!= col("ccos"))
    assert(badCos.count() == 0)
    // interpreted path (eval) agrees with the codegen'd run above
    val rows = cents.select(col("cid").cast("long"), col("cv")).collect()
    val ncExpr = graft.functions.NearestCentroid(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false),
        nullable = true),
      rows.map(_.getLong(0)), rows.map(_.getSeq[Double](1).toArray))
    val expect = fused.select("vec_id", "cid", "ccos").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    vecs.select("vec_id", "embedding").collect().foreach { r =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        r.getSeq[Float](1).toArray)
      val out = ncExpr.eval(org.apache.spark.sql.catalyst
        .InternalRow(arr)).asInstanceOf[
        org.apache.spark.sql.catalyst.InternalRow]
      val (ecid, eccos) = expect(r.getLong(0))
      assert(out.getLong(0) == ecid &&
        java.lang.Double.doubleToLongBits(out.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(eccos),
        s"vec ${r.getLong(0)}: eval (${out.getLong(0)}, ${out.getDouble(1)}) vs codegen ($ecid, $eccos)")
    }
    // null input array → null result
    assert(ncExpr.eval(org.apache.spark.sql.catalyst.InternalRow(null))
      == null)
  }

  test("a singleton cluster's mean is the member vector itself") {
    val one = Seq((1L, Array(1.0, 2.0, 3.0)), (2L, Array(5.0, 5.0, 5.0)))
      .toDF("vec_id", "v").withColumn("cid", col("vec_id"))
    val m = KMeans.meanCentroids(one, "v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(m(1L) == Seq(1.0, 2.0, 3.0))
    assert(m(2L) == Seq(5.0, 5.0, 5.0))
  }

  test("a Lloyd round does not increase within-cluster spread") {
    // inertia proxy: mean cosine of each vector to its centroid must
    // not get worse after one assign+mean round (Lloyd monotonicity,
    // up to the spherical-vs-euclidean mean approximation; on this
    // data it strictly improves)
    def meanCos(cents: org.apache.spark.sql.DataFrame): Double =
      KMeans.assign(vecs, cents, "vec_id", "embedding")
        .join(cents, Seq("cid"))
        .withColumn("c", expr("cosine_sim(embedding, cv)"))
        .agg(avg(col("c"))).head().getDouble(0)
    val c0 = init(8)
    val c1 = KMeans.lloyd(vecs, c0, "vec_id", "embedding", 1)
    assert(meanCos(c1) >= meanCos(c0) - 1e-12,
      s"round worsened fit: ${meanCos(c0)} -> ${meanCos(c1)}")
    // training moved the centroids off the raw init vectors
    val moved = c1.select(col("cid"), col("cv").as("cv1"))
      .join(c0.select(col("cid"), col("cv").as("cv0")), Seq("cid"))
      .filter(col("cv0") =!= col("cv1")).count()
    assert(moved > 0)
  }
  test("fused top-n probes match the row_number window form on real data") {
    // probesFused (VERDICT r12 #2) must emit exactly the rows the
    // crossJoin + row_number formulation ranks — same (cid, rk) per
    // vector AND bit-identical ccos
    import org.apache.spark.sql.expressions.Window
    val cents = init(8)
    val fused = KMeans.probesFused(
      vecs.select(col("vec_id"), col("embedding")), cents, "embedding", 2)
      .select("vec_id", "cid", "ccos", "rk")
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val viaWin = vecs.crossJoin(broadcast(cents))
      .withColumn("ccos", expr("cosine_sim(embedding, cv)"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select("vec_id", "cid", "ccos", "rk")
    assert(fused.exceptAll(viaWin).count() == 0 &&
      viaWin.exceptAll(fused).count() == 0)
    assert(fused.count() == vecs.count() * 2)
  }

  test("fused probes pin window semantics on ties, NaN, and short tables") {
    // ties break to the lowest cid at EVERY rank; a zero vector's NaN
    // cosines rank greatest (Double.compare order, same as the desc
    // window); fewer valid centroids than n emit fewer rows
    val v = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((7L, Array(1.0, 0.0)), (3L, Array(1.0, 0.0)),
      (5L, Array(0.0, 1.0))).toDF("cid", "cv")
    val got = KMeans.probesFused(v, cents, "embedding", 2)
      .select("vec_id", "cid", "rk").collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    assert(got((1L, 1)) == 3L && got((1L, 2)) == 7L) // tie → lowest cid
    assert(got((2L, 1)) == 3L && got((2L, 2)) == 5L) // all-NaN: cid order
    val one = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val shortTable = Seq((9L, Array(1.0, 0.0))).toDF("cid", "cv")
    assert(KMeans.probesFused(one, shortTable, "embedding", 2)
      .count() == 1) // k=1 < n=2 → one probe row, not a padded one
  }

  test("fused probe plan has no window, heap, or join — scan+project only") {
    // the point of the fused expression: the N×k scored stream never
    // exists, so the probe plan must contain no WindowExec, no
    // TopKPerGroup heap exec, no join of any kind, and no exchange
    val plan = KMeans.probesFused(
      vecs.select(col("vec_id"), col("embedding")), init(8),
      "embedding", 2)
      .queryExecution.executedPlan.toString
    Seq("Window", "TopKPerGroup", "Join", "Exchange").foreach { bad =>
      assert(!plan.contains(bad), s"probe plan contains $bad:\n$plan")
    }
  }

  test("fused assignment fails loudly on a dimension-mismatched vector") {
    // ADVICE r9: a vector no centroid can score must fail the build,
    // not silently vanish (IvfPqIndex would give it codes but no lists
    // row, and the append anti-joins pin the gap forever)
    val v = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((3L, Array(1.0, 0.0))).toDF("cid", "cv")
    val ex = intercept[Exception] {
      KMeans.assignFused(v, cents, "embedding").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("assignFused")), msgs(ex).mkString("|"))
    // a clean corpus still assigns every vector
    val ok = KMeans.assignFused(v.filter(col("vec_id") === 1L), cents,
      "embedding")
    assert(ok.count() == 1 && ok.select("cid").head.getLong(0) == 3L)
  }
}
