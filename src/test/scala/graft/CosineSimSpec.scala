package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  test("cosine_sim computes the expected value") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
      .toDF("a", "b")
    val c = df.select(expr("cosine_sim(a, b)")).collect()(0).getDouble(0)
    val expected = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(c - expected) < 1e-12)
  }

  test("orthogonal -> 0, identical -> 1, opposite -> -1") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), "orth"),
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f), "same"),
      (Array(1.0f, 2.0f), Array(-1.0f, -2.0f), "opp")
    ).toDF("a", "b", "k")
    val m = df.select(col("k"), expr("cosine_sim(a, b)").as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(m("orth")) < 1e-12)
    assert(math.abs(m("same") - 1.0) < 1e-12)
    assert(math.abs(m("opp") + 1.0) < 1e-12)
  }

  test("mixed float/double arrays are accepted") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0, 2.0))).toDF("a", "b")
    val c = df.select(expr("cosine_sim(a, b)")).collect()(0).getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("codegen and interpreted paths agree") {
    val df = Tables.embeddings(spark, sf()).limit(50)
      .select(col("vec_id"), col("embedding"))
    val self = df.select(expr("cosine_sim(embedding, embedding)").as("c"))
    // self-cosine must be exactly 1 within fp error on both paths
    val offCodegen = self.collect().map(r => math.abs(r.getDouble(0) - 1.0)).max
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val offInterp = self.collect().map(r => math.abs(r.getDouble(0) - 1.0)).max
      assert(offCodegen < 1e-12 && offInterp < 1e-12)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("length mismatch and null elements yield null, not garbage") {
    // ADVICE r1: silent truncation / undefined reads replaced with null.
    val mism = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)))
      .toDF("a", "b")
      .select(expr("cosine_sim(a, b)").as("c")).collect()(0)
    assert(mism.isNullAt(0))
    val withNullElem = Seq((Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))))
      .toDF("a", "b")
      .select(expr("cosine_sim(a, b)").as("c")).collect()(0)
    assert(withNullElem.isNullAt(0))
    // interpreted path agrees
    import graft.functions.CosineSim
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val lit2 = Literal(ArrayData.toArrayData(Array(1.0, 2.0)),
      ArrayType(DoubleType, containsNull = false))
    val lit3 = Literal(ArrayData.toArrayData(Array(1.0, 2.0, 3.0)),
      ArrayType(DoubleType, containsNull = false))
    assert(CosineSim(lit2, lit3).eval(null) == null)
  }

  test("zero vectors yield NaN (0/0), documented") {
    val r = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(expr("cosine_sim(a, b)").as("c")).collect()(0)
    assert(!r.isNullAt(0) && r.getDouble(0).isNaN)
  }

  test("non-array input is rejected at analysis") {
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[Exception] { df.select(expr("cosine_sim(a, b)")).collect() }
  }

  test("LSH bucket top-1 is far better than a random neighbor") {
    // With uniform random 64-dim vectors the global NN is only cos≈0.5, so
    // single-probe 4-bit LSH can't guarantee finding IT (P≈0.2, by the
    // (1-θ/π)^k collision bound). The property that must hold: the LSH
    // top-1 is a best-of-bucket (~N/16 candidates) pick, so its cosine
    // sits far in the right tail while the corpus average is ≈0.
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("nv"))
    val allCos = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(expr("cosine_sim(qv, nv)").as("cos"))
    val meanAll = allCos.agg(avg("cos")).collect()(0).getDouble(0)

    val lshTop = graft.queries.SimilarityQueries
      .queries("ann2_lsh_topk")(spark, sf())
      .filter(col("rank") === 1)
    val withCos = lshTop
      .join(q, Seq("query_id"))
      .join(c, Seq("neighbor_id"))
      .select(expr("cosine_sim(qv, nv)").as("cos"))
    val meanLsh = withCos.agg(avg("cos")).collect()(0).getDouble(0)
    assert(withCos.count() >= 5)
    assert(meanLsh > meanAll + 0.15,
      s"LSH top-1 mean cos $meanLsh not above corpus mean $meanAll")
  }
}
