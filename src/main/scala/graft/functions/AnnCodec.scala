package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused native kernels for the IVF-PQ index hot path
  * ([[graft.operators.AnnIndex]]).
  *
  * The composed forms — `array_min(transform(centroidsLit, …))` for
  * the coarse assignment and explode → broadcast-codebook join →
  * two groupBy argmins for the PQ codes — are semantically right but
  * evaluate Catalyst higher-order lambdas per element: the assignment
  * alone is nCentroids·dim ≈ 1000 interpreted lambda calls plus 17
  * array allocations PER ROW, and it was the measured floor of the
  * index build and append (encodeSource materialization 3.6 s of the
  * 10 s sf0.1 build; the append pays it again). These expressions do
  * the same integer arithmetic in one tight codegen'd loop per row —
  * no shuffle, no join, no per-element lambda — and the relational
  * forms stay as the SQL-replayable twins, pinned bit-identical by
  * AnnCodecSpec (same argmin, same tie-breaks, same scaled rounding).
  *
  * Rounding contract: every distance uses [[AnnCodec.roundScaled]],
  * a replica of Spark's `round(x * 1e6).cast("long")` (Round is
  * BigDecimal HALF_UP on doubles — NOT `Math.round`, which differs on
  * negatives and on 0.49999999999999994-style boundary doubles).
  */
object AnnCodec {

  /** `round(x * 1e6).cast("long")` exactly as Spark evaluates it:
    * double multiply, then BigDecimal(HALF_UP) round, then truncating
    * long cast. Public static so generated code can call it. */
  def roundScaled(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP)
      .doubleValue().toLong

  private[graft] def scaledVec(v: Array[Double]): Array[Long] =
    v.map(roundScaled)

  /** Column form: nearest centroid by exact scaled L2 + residual, one
    * pass. `cents` must be (cid, vec) pairs; ties break to the
    * SMALLEST cid (the `array_min(struct(d, cid))` order). */
  def nearestCentroid(v: Column, cents: Array[(Int, Array[Double])],
      residual: Boolean): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(NearestCentroidL2(ColumnBridge.expression(v),
      cents.map(_._1), cents.map(_._2), residual))
  }

  /** Column form: PQ code assignment, one pass. `codebooks(m)(code)`
    * are the sub-codewords; ties break to the SMALLEST code (the
    * `min(struct(d, code))` order). */
  def pqCodes(rv: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(PqEncodeCodes(ColumnBridge.expression(rv), codebooks))
  }

  /** Column form: nearest centroid by COSINE (the IVF trainer's /
    * ivfTopK's metric), one pass. Ties break to the LARGEST cid (the
    * `array_max(struct(score, cid))` order). */
  def nearestCentroidCosine(v: Column,
      cents: Array[(Int, Array[Double])]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(NearestCentroidCosine(ColumnBridge.expression(v),
      cents.map(_._1), cents.map(_._2)))
  }
}

/** int cid — the nearest centroid by cosine similarity, fused.
  * Bit-identical to `array_max(transform(centroidsLit,
  * struct(CosineSim(v, c.vec), c.cid)))`: the per-centroid cosine is
  * [[CosineSim]]'s exact accumulation order (dot/na/nb in one pass,
  * `0.0` on zero denominator), and the argmax compares scores with
  * `java.lang.Double.compare` — NOT primitive `>` — because struct
  * ordering distinguishes -0.0 < 0.0 and a primitive compare would
  * tie-break such pairs to the wrong cid. Ties → LARGER cid
  * (array_max order). AnnCodecSpec pins both. */
case class NearestCentroidCosine(child: Expression, cids: Array[Int],
    cents: Array[Array[Double]]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid_cosine"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid_cosine expects array<double>, got $t")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var bestScore = Double.NegativeInfinity
    var bestCid = Int.MinValue
    var first = true
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = math.min(v.numElements(), cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = v.getDouble(i); val y = cv(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      val s = if (denom == 0.0) 0.0 else dot / denom
      val cmp = java.lang.Double.compare(s, bestScore)
      if (first || cmp > 0 || (cmp == 0 && cids(c) > bestCid)) {
        bestScore = s; bestCid = cids(c); first = false
      }
      c += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val rc = ctx.addReferenceObj("rawCents", cents, "double[][]")
      val ids = ctx.addReferenceObj("cids", cids, "int[]")
      val bs = ctx.freshName("bestScore"); val bc = ctx.freshName("bestCid")
      val first = ctx.freshName("first"); val c = ctx.freshName("c")
      val cv = ctx.freshName("cv"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val denom = ctx.freshName("denom"); val s = ctx.freshName("s")
      val cmp = ctx.freshName("cmp")
      s"""
         |double $bs = Double.NEGATIVE_INFINITY; int $bc = Integer.MIN_VALUE;
         |boolean $first = true;
         |for (int $c = 0; $c < $rc.length; $c++) {
         |  double[] $cv = $rc[$c];
         |  int $n = java.lang.Math.min($v.numElements(), $cv.length);
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $v.getDouble($i); double $y = $cv[$i];
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  double $s = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |  int $cmp = java.lang.Double.compare($s, $bs);
         |  if ($first || $cmp > 0 || ($cmp == 0 && $ids[$c] > $bc)) {
         |    $bs = $s; $bc = $ids[$c]; $first = false;
         |  }
         |}
         |${ev.value} = $bc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** struct<cid:int, rv:array<double>> — the nearest centroid of an
  * array<double> vector by exact scaled-integer L2 (ties → smaller
  * cid), plus the residual `v − centroid` (or `v` unchanged when
  * `residual = false`). Bit-identical to
  * `array_min(transform(centroidsLit, struct(intL2(v,c.vec), c.cid)))`
  * followed by the broadcast-centroid `zip_with` subtraction
  * (AnnCodecSpec pins all three forms against each other). */
case class NearestCentroidL2(child: Expression, cids: Array[Int],
    cents: Array[Array[Double]], residual: Boolean)
    extends UnaryExpression {

  @transient private lazy val scaled: Array[Array[Long]] =
    cents.map(AnnCodec.scaledVec)

  override def dataType: DataType = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("rv", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  override def prettyName: String = "nearest_centroid_l2"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid_l2 expects array<double>, got $t")
    }
  }

  private def bestIndex(q: Array[Long]): Int = {
    var bi = 0; var bd = Long.MaxValue; var bc = Int.MaxValue
    var c = 0
    while (c < scaled.length) {
      val cv = scaled(c)
      val n = math.min(q.length, cv.length)
      var d = 0L; var i = 0
      while (i < n) { val t = q(i) - cv(i); d += t * t; i += 1 }
      if (d < bd || (d == bd && cids(c) < bc)) { bd = d; bc = cids(c); bi = c }
      c += 1
    }
    bi
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) { q(i) = AnnCodec.roundScaled(v.getDouble(i)); i += 1 }
    val bi = bestIndex(q)
    val rv = new Array[Double](dim)
    if (residual) {
      val cv = cents(bi)
      var j = 0
      while (j < dim) {
        rv(j) = v.getDouble(j) - (if (j < cv.length) cv(j) else 0.0); j += 1
      }
    } else {
      var j = 0
      while (j < dim) { rv(j) = v.getDouble(j); j += 1 }
    }
    new GenericInternalRow(Array[Any](cids(bi), new GenericArrayData(rv)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val sc = ctx.addReferenceObj("scaledCents", scaled, "long[][]")
      val rc = ctx.addReferenceObj("rawCents", cents, "double[][]")
      val ids = ctx.addReferenceObj("cids", cids, "int[]")
      val dim = ctx.freshName("dim"); val q = ctx.freshName("q")
      val bi = ctx.freshName("bi"); val bd = ctx.freshName("bd")
      val bc = ctx.freshName("bc"); val c = ctx.freshName("c")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val t = ctx.freshName("t"); val cv = ctx.freshName("cv")
      val rv = ctx.freshName("rv"); val best = ctx.freshName("best")
      val resid = if (residual)
        s"""double[] $best = $rc[$bi];
           |for (int $i = 0; $i < $dim; $i++)
           |  $rv[$i] = $v.getDouble($i) - ($i < $best.length ? $best[$i] : 0.0);
         """.stripMargin
      else
        s"for (int $i = 0; $i < $dim; $i++) $rv[$i] = $v.getDouble($i);"
      s"""
         |int $dim = $v.numElements();
         |long[] $q = new long[$dim];
         |for (int $i = 0; $i < $dim; $i++)
         |  $q[$i] = graft.functions.AnnCodec.roundScaled($v.getDouble($i));
         |int $bi = 0; long $bd = Long.MAX_VALUE; int $bc = Integer.MAX_VALUE;
         |for (int $c = 0; $c < $sc.length; $c++) {
         |  long[] $cv = $sc[$c];
         |  long $d = 0L;
         |  int ${i}n = java.lang.Math.min($dim, $cv.length);
         |  for (int $i = 0; $i < ${i}n; $i++) { long $t = $q[$i] - $cv[$i]; $d += $t * $t; }
         |  if ($d < $bd || ($d == $bd && $ids[$c] < $bc)) { $bd = $d; $bc = $ids[$c]; $bi = $c; }
         |}
         |double[] $rv = new double[$dim];
         |$resid
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { (Object) java.lang.Integer.valueOf($bc),
         |    (Object) new org.apache.spark.sql.catalyst.util.GenericArrayData($rv) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<int> PQ codes of an array<double> vector: per subspace m,
  * the argmin over codewords of the exact scaled L2 between the
  * sub-vector and the codeword (ties → smaller code). Bit-identical
  * to [[graft.operators.Similarity.pqEncode]]'s
  * explode → broadcast join → `min(struct(d, code))` relational form
  * (AnnCodecSpec). */
case class PqEncodeCodes(child: Expression,
    codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {

  @transient private lazy val scaled: Array[Array[Array[Long]]] =
    codebooks.map(_.map(AnnCodec.scaledVec))

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode_codes"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pq_encode_codes expects array<double>, got $t")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) { q(i) = AnnCodec.roundScaled(v.getDouble(i)); i += 1 }
    val m = scaled.length
    val sub = if (m == 0) 0 else dim / m
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val cb = scaled(mi)
      var bd = Long.MaxValue; var bcode = Int.MaxValue
      var code = 0
      while (code < cb.length) {
        val cw = cb(code)
        val n = math.min(sub, cw.length)
        var d = 0L; var j = 0
        while (j < n) { val t = q(mi * sub + j) - cw(j); d += t * t; j += 1 }
        if (d < bd) { bd = d; bcode = code }
        code += 1
      }
      codes(mi) = bcode
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("scaledCodebooks", scaled, "long[][][]")
      val dim = ctx.freshName("dim"); val q = ctx.freshName("q")
      val i = ctx.freshName("i"); val m = ctx.freshName("m")
      val sub = ctx.freshName("sub"); val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi"); val bd = ctx.freshName("bd")
      val bcode = ctx.freshName("bcode"); val code = ctx.freshName("code")
      val cw = ctx.freshName("cw"); val d = ctx.freshName("d")
      val j = ctx.freshName("j"); val t = ctx.freshName("t")
      s"""
         |int $dim = $v.numElements();
         |long[] $q = new long[$dim];
         |for (int $i = 0; $i < $dim; $i++)
         |  $q[$i] = graft.functions.AnnCodec.roundScaled($v.getDouble($i));
         |int $m = $cb.length;
         |int $sub = ($m == 0) ? 0 : $dim / $m;
         |int[] $codes = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  long $bd = Long.MAX_VALUE; int $bcode = Integer.MAX_VALUE;
         |  for (int $code = 0; $code < $cb[$mi].length; $code++) {
         |    long[] $cw = $cb[$mi][$code];
         |    int ${j}n = java.lang.Math.min($sub, $cw.length);
         |    long $d = 0L;
         |    for (int $j = 0; $j < ${j}n; $j++) { long $t = $q[$mi * $sub + $j] - $cw[$j]; $d += $t * $t; }
         |    if ($d < $bd) { $bd = $d; $bcode = $code; }
         |  }
         |  $codes[$mi] = $bcode;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
