package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  FloatType, LongType, StructField, StructType}

/** Fused nearest-centroid argmax: for one embedding row, loop the whole
  * centroid matrix in generated code and emit ONE struct
  * (cid, ccos) — the winner by highest cosine, ties to the lowest cid.
  *
  * Why an Expression (the same doGenCode discipline as [[CosineSim]]):
  * the relational formulations of assignment materialize an N×k row
  * stream — the original row_number window additionally shuffled and
  * sorted it (~150 GB at 200k vectors × 1415 lists), and even the
  * argmax-struct aggregate that replaced it (only N winners cross the
  * exchange) still pays a BroadcastNestedLoopJoin row stream plus a
  * per-row aggregate-hash update per CENTROID. Here the k×d loop runs
  * in registers inside WholeStageCodegen: per vector one pass to read
  * the elements and its norm, then k dot products against
  * driver-resident double[][] (reference objects, not literals — no
  * code-size blowup), one struct out. Centroid norms are precomputed
  * once at construction, so per-vector cost is d + k·d multiplies —
  * the FLOP floor of exact assignment.
  *
  * The centroid table is quantizer-scale (k = ⌈√(10·N)⌉ rows — the
  * same bounded artifact every search broadcasts), so holding it as a
  * plain array is the moral equivalent of a broadcast, not a
  * corpus-sized collect.
  *
  * Semantics are pinned to the relational forms (KMeansSpec):
  * comparison via Double.compare — NaN ranks greatest (a zero-norm
  * cosine loses to any real cosine only if a real one exists... NaN
  * actually WINS, exactly like the desc window and the struct max,
  * both of which rank NaN above every real double); equal cosines
  * break to the lowest cid; a centroid whose length differs from the
  * vector is skipped (its cosine is NULL in the relational forms,
  * which likewise loses); null input array, or any null element,
  * yields NULL. Element reads mirror cosine_sim (float or double
  * arrays).
  */
case class NearestCentroid(child: Expression, cids: Array[Long],
    cvs: Array[Array[Double]]) extends UnaryExpression {

  require(cids.length == cvs.length && cids.nonEmpty,
    "NearestCentroid needs a non-empty centroid table")

  // precomputed ||c|| per centroid — shared by eval and codegen
  @transient lazy val norms: Array[Double] =
    cvs.map(cv => math.sqrt(cv.map(x => x * x).sum))

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("ccos", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"nearest_centroid expects array<float>/array<double>, got " +
              other.catalogString)
    }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val d = a.numElements()
    val vec = new Array[Double](d)
    val f = isFloat
    var i = 0
    while (i < d) {
      if (a.isNullAt(i)) return null
      vec(i) = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    var na = 0.0
    i = 0
    while (i < d) { na += vec(i) * vec(i); i += 1 }
    val sna = math.sqrt(na)
    var bestCos = 0.0
    var bestCid = 0L
    var found = false
    var j = 0
    while (j < cvs.length) {
      val cv = cvs(j)
      if (cv.length == d) {
        var dot = 0.0
        i = 0
        while (i < d) { dot += vec(i) * cv(i); i += 1 }
        val cos = dot / (sna * norms(j))
        val cmp = java.lang.Double.compare(cos, bestCos)
        if (!found || cmp > 0 || (cmp == 0 && cids(j) < bestCid)) {
          bestCos = cos; bestCid = cids(j); found = true
        }
      }
      j += 1
    }
    if (!found) null
    else InternalRow(bestCid, bestCos)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cvsRef = ctx.addReferenceObj("cvs", cvs, "double[][]")
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    val get =
      if (isFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    val rowCls = classOf[org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow].getName
    nullSafeCodeGen(ctx, ev, a => {
      val d = ctx.freshName("d")
      val vec = ctx.freshName("vec")
      val na = ctx.freshName("na")
      val sna = ctx.freshName("sna")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val cos = ctx.freshName("cos")
      val cmp = ctx.freshName("cmp")
      val bestCos = ctx.freshName("bestCos")
      val bestCid = ctx.freshName("bestCid")
      val found = ctx.freshName("found")
      val cv = ctx.freshName("cv")
      val vals = ctx.freshName("vals")
      s"""
         |int $d = $a.numElements();
         |double[] $vec = new double[$d];
         |double $na = 0.0;
         |for (int $i = 0; $i < $d; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $vec[$i] = ${get(a, i)};
         |  $na += $vec[$i] * $vec[$i];
         |}
         |if (!${ev.isNull}) {
         |  double $sna = Math.sqrt($na);
         |  double $bestCos = 0.0; long $bestCid = 0L; boolean $found = false;
         |  for (int $j = 0; $j < $cvsRef.length; $j++) {
         |    double[] $cv = $cvsRef[$j];
         |    if ($cv.length != $d) continue;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $d; $i++) { $dot += $vec[$i] * $cv[$i]; }
         |    double $cos = $dot / ($sna * $normsRef[$j]);
         |    int $cmp = java.lang.Double.compare($cos, $bestCos);
         |    if (!$found || $cmp > 0 || ($cmp == 0 && $cidsRef[$j] < $bestCid)) {
         |      $bestCos = $cos; $bestCid = $cidsRef[$j]; $found = true;
         |    }
         |  }
         |  if (!$found) { ${ev.isNull} = true; }
         |  else {
         |    Object[] $vals = new Object[2];
         |    $vals[0] = $bestCid; $vals[1] = $bestCos;
         |    ${ev.value} = new $rowCls($vals);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
