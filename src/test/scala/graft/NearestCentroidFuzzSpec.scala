package graft

import org.apache.spark.sql.functions._
import graft.operators.KMeans

/** Differential fuzzing of the FUSED centroid-scoring expressions
  * (NearestCentroid / NearestCentroids, round 13): the KMeansSpec pins
  * fixed tie/NaN/short-table points; this generates PARAMETERIZATIONS
  * — corpus size × dim × centroid count × probe width n × float/double
  * elements × planted pathologies (duplicated centroids for ties,
  * zero vectors for all-NaN cosine, n > k) — and checks every case
  * against the relational row_number-window formulation over the
  * native cosine_sim expression, the exact form the DuckDB oracles
  * replay. Agreement must be total: same (vec, cid, rk) triples AND
  * bit-identical ccos doubles, so a codegen drift in the in-register
  * loop (accumulation order, tie direction, NaN rank, insertion-shift
  * bug) cannot hide behind float tolerance.
  *
  * Determinism note: fixtures derive from a seeded scala.util.Random —
  * same cases every run, like the other fuzz suites.
  */
class NearestCentroidFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(1013L)

  private def genCase(ci: Int): (Seq[(Long, Array[Float])],
      Seq[(Long, Array[Double])], Int) = {
    val dim = 1 + rnd.nextInt(8)
    val nVec = 1 + rnd.nextInt(40)
    val k = 1 + rnd.nextInt(12)
    val n = 1 + rnd.nextInt(4)
    def fvec(): Array[Float] =
      Array.fill(dim)((rnd.nextInt(9) - 4).toFloat)
    val vecs = (0 until nVec).map { i =>
      // ~1 in 8 vectors is all-zero: cosine NaN against EVERY centroid
      val v = if (rnd.nextInt(8) == 0) Array.fill(dim)(0.0f) else fvec()
      (i.toLong, v)
    }
    val baseCents = (0 until k).map { j =>
      (j.toLong, fvec().map(_.toDouble))
    }
    // ~half the cases plant a duplicated centroid under a HIGHER cid —
    // the tie must break to the lower one at whatever rank it lands
    val cents =
      if (k >= 2 && rnd.nextBoolean())
        baseCents :+ ((k.toLong, baseCents(rnd.nextInt(k))._2.clone()))
      else baseCents
    (vecs, cents, n)
  }

  test("fused top-n probes ≡ window formulation across 40 random cases") {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    for (ci <- 0 until 40) {
      val (vecs, cents, n) = genCase(ci)
      val v = vecs.toDF("vec_id", "embedding")
      val c = cents.toDF("cid", "cv")
      val fused = KMeans.probesFused(v, c, "embedding", n)
        .select(col("vec_id"), col("cid"), col("ccos"), col("rk"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)),
          r.getInt(3))).toSet
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cid"))
      val win = v.crossJoin(broadcast(c))
        .withColumn("ccos", expr("cosine_sim(embedding, cv)"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= n)
        .select(col("vec_id"), col("cid"), col("ccos"), col("rk"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)),
          r.getInt(3))).toSet
      assert(fused == win,
        s"case $ci (n=$n, k=${cents.size}, vecs=${vecs.size}): " +
          s"fused-only=${(fused -- win).take(5)} " +
          s"window-only=${(win -- fused).take(5)}")
      // argmax (n=1 path of the single-winner expression) agrees too
      val a1 = KMeans.assignFused(v, c, "embedding")
        .select(col("vec_id"), col("cid"), col("ccos")).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
      val top1 = fused.filter(_._4 == 1).map(t => (t._1, t._2, t._3))
      assert(a1 == top1, s"case $ci: assignFused != probesFused rk=1")
    }
  }
}
