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

/** Fused top-`n` centroid probes — the nprobe>1 extension of
  * [[NearestCentroid]] (VERDICT r12 #2): for one embedding row, loop
  * the whole centroid matrix in generated code and emit the `n` best
  * (cid, ccos) structs as an array ORDERED best-first — cosine
  * descending, ties to the lowest cid, exactly the composite the
  * row_number-window and bounded-heap formulations use (struct(ccos,
  * −cid) desc).
  *
  * Why: the relational multi-probe selection materializes an N×k row
  * stream (crossJoin against the broadcast centroids) and then ranks
  * it — with a window (sorts N×k rows) or the TopKPerGroup heaps
  * (streams them, but the N×k rows still exist and each pays a heap
  * update through codegen boundaries). Here NOTHING materializes: per
  * vector the k×d loop runs in registers with an n-slot insertion
  * (n is 2-4 — shifting beats a heap at that size), one array comes
  * out, and posexplode turns it into the (cid, ccos, rk) rows
  * downstream joins expect. Centroid count k is quantizer-scale
  * (⌈√(10·N)⌉ — 51 MB of doubles at a BILLION vectors), so the
  * driver-resident matrix is the moral equivalent of a broadcast.
  *
  * Semantics pinned to the relational forms (KMeansSpec): Double.compare
  * ordering (NaN greatest), ties to the lowest cid, dim-mismatched
  * centroids skipped, fewer than `n` valid centroids → shorter array,
  * zero valid → null, null input array or element → null.
  */
case class NearestCentroids(child: Expression, cids: Array[Long],
    cvs: Array[Array[Double]], n: Int) extends UnaryExpression {

  require(cids.length == cvs.length && cids.nonEmpty,
    "NearestCentroids needs a non-empty centroid table")
  require(n >= 1, s"n must be >= 1, got $n")

  @transient lazy val norms: Array[Double] =
    cvs.map(cv => math.sqrt(cv.map(x => x * x).sum))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("ccos", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroids"

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
            s"nearest_centroids expects array<float>/array<double>, got " +
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
    val bc = new Array[Double](n)
    val bi = new Array[Long](n)
    var cnt = 0
    var j = 0
    while (j < cvs.length) {
      val cv = cvs(j)
      if (cv.length == d) {
        var dot = 0.0
        i = 0
        while (i < d) { dot += vec(i) * cv(i); i += 1 }
        val cos = dot / (sna * norms(j))
        // insertion position: entries 0..cnt-1 are best-first
        var p = if (cnt < n) cnt else n
        while (p > 0 && {
          val cmp = java.lang.Double.compare(cos, bc(p - 1))
          cmp > 0 || (cmp == 0 && cids(j) < bi(p - 1))
        }) p -= 1
        if (p < n) {
          var q = math.min(cnt, n - 1)
          while (q > p) { bc(q) = bc(q - 1); bi(q) = bi(q - 1); q -= 1 }
          bc(p) = cos; bi(p) = cids(j)
          if (cnt < n) cnt += 1
        }
      }
      j += 1
    }
    if (cnt == 0) null
    else {
      val out = new Array[Any](cnt)
      i = 0
      while (i < cnt) { out(i) = InternalRow(bi(i), bc(i)); i += 1 }
      new GenericArrayData(out)
    }
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
    val arrCls = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val d = ctx.freshName("d")
      val vec = ctx.freshName("vec")
      val na = ctx.freshName("na")
      val sna = ctx.freshName("sna")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val q = ctx.freshName("q")
      val dot = ctx.freshName("dot")
      val cos = ctx.freshName("cos")
      val cmp = ctx.freshName("cmp")
      val bc = ctx.freshName("bc")
      val bi = ctx.freshName("bi")
      val cnt = ctx.freshName("cnt")
      val cv = ctx.freshName("cv")
      val out = ctx.freshName("out")
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
         |  double[] $bc = new double[$n];
         |  long[] $bi = new long[$n];
         |  int $cnt = 0;
         |  for (int $j = 0; $j < $cvsRef.length; $j++) {
         |    double[] $cv = $cvsRef[$j];
         |    if ($cv.length != $d) continue;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $d; $i++) { $dot += $vec[$i] * $cv[$i]; }
         |    double $cos = $dot / ($sna * $normsRef[$j]);
         |    int $p = ($cnt < $n) ? $cnt : $n;
         |    while ($p > 0) {
         |      int $cmp = java.lang.Double.compare($cos, $bc[$p - 1]);
         |      if ($cmp > 0 || ($cmp == 0 && $cidsRef[$j] < $bi[$p - 1])) {
         |        $p--;
         |      } else break;
         |    }
         |    if ($p < $n) {
         |      for (int $q = java.lang.Math.min($cnt, $n - 1); $q > $p; $q--) {
         |        $bc[$q] = $bc[$q - 1]; $bi[$q] = $bi[$q - 1];
         |      }
         |      $bc[$p] = $cos; $bi[$p] = $cidsRef[$j];
         |      if ($cnt < $n) $cnt++;
         |    }
         |  }
         |  if ($cnt == 0) { ${ev.isNull} = true; }
         |  else {
         |    Object[] $out = new Object[$cnt];
         |    for (int $i = 0; $i < $cnt; $i++) {
         |      Object[] $vals = new Object[2];
         |      $vals[0] = $bi[$i]; $vals[1] = $bc[$i];
         |      $out[$i] = new $rowCls($vals);
         |    }
         |    ${ev.value} = new $arrCls($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
