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
}
