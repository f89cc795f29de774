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

  /** Column form: the n nearest centroids by COSINE, descending score
    * with ties → SMALLER cid — the array order of
    * `slice(array_sort(transform(centroidsLit, struct(-cosine, cid))), 1, n)
    * .getField("cid")`, the query-side nProbe expansion this kernel
    * fuses ([[graft.operators.Similarity.ivfTopK]]). */
  def topNCentroidsCosine(v: Column, cents: Array[(Int, Array[Double])],
      n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(TopNCentroidsCosine(ColumnBridge.expression(v),
      cents.map(_._1), cents.map(_._2), n))
  }

  /** Column form: the n nearest centroids by exact scaled L2,
    * ascending distance with ties → SMALLER cid — the array order of
    * `slice(array_sort(transform(centroidsLit, struct(intL2, cid))), 1, n)
    * .getField("cid")` ([[graft.operators.AnnIndex.probe]]'s
    * query-side ranking). */
  def topNCentroidsL2(v: Column, cents: Array[(Int, Array[Double])],
      n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(TopNCentroidsL2(ColumnBridge.expression(v),
      cents.map(_._1), cents.map(_._2), n))
  }

  /** Column form: exact-integer-replayable L2 normalization, fused
    * (one pass: exact scaled norm, then per-element scale — the
    * composed `transform(v, x => x·1000/sqrt(aggregate(...)))` twin
    * re-evaluates the norm AGGREGATE per element, dim² interpreted
    * lambda calls per row; it stays as
    * [[graft.operators.Similarity.l2NormalizeExactComposed]], pinned
    * bit-identical in AnnCodecSpec). */
  def l2NormalizeExact(v: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(L2NormalizeExact(ColumnBridge.expression(v)))
  }

  /** Per-row body of [[L2NormalizeExact]] — shared between
    * interpreted eval and codegen. S = Σ [[roundScaled]](x²) exactly
    * as `round(x*x*1e6).cast("long")` sums; then one IEEE
    * multiply/divide/sqrt per element; the all-zero vector (S == 0)
    * maps to itself, matching the composed form's guard. */
  def l2NormalizeExactBody(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var s = 0L
    var i = 0
    while (i < n) { val x = v.getDouble(i); s += roundScaled(x * x); i += 1 }
    val out = new Array[Double](n)
    if (s == 0L) {
      var j = 0
      while (j < n) { out(j) = v.getDouble(j); j += 1 }
    } else {
      val inv = math.sqrt(s.toDouble)
      var j = 0
      while (j < n) { out(j) = v.getDouble(j) * 1000.0 / inv; j += 1 }
    }
    new GenericArrayData(out)
  }

  /** `array_sort`'s double ordering exactly
    * (SQLOrderingUtil.compareDoubles): +0.0 and -0.0 compare EQUAL
    * (`x == y` first), NaN sorts greatest — `java.lang.Double.compare`
    * alone would order -0.0 < 0.0 and break struct ties differently. */
  private def cmpD(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  /** Bounded insertion select: the min(n, |key|) entries in
    * (key asc, cid asc) order — the exact prefix `array_sort` of the
    * full (key, cid) struct array would produce. One pass, O(nc·n)
    * on model-sized arrays. */
  private def selectTopN(key: Array[Double], cids: Array[Int],
      n: Int): Array[Int] = {
    val k = math.min(n, key.length)
    val bk = new Array[Double](k); val bc = new Array[Int](k)
    var size = 0
    var c = 0
    while (c < key.length) {
      val better = size < k || {
        val cmp = cmpD(key(c), bk(size - 1))
        cmp < 0 || (cmp == 0 && cids(c) < bc(size - 1))
      }
      if (better) {
        var pos = if (size < k) size else k - 1
        while (pos > 0 && {
          val cmp = cmpD(key(c), bk(pos - 1))
          cmp < 0 || (cmp == 0 && cids(c) < bc(pos - 1))
        }) { bk(pos) = bk(pos - 1); bc(pos) = bc(pos - 1); pos -= 1 }
        bk(pos) = key(c); bc(pos) = cids(c)
        if (size < k) size += 1
      }
      c += 1
    }
    if (size == k) bc else java.util.Arrays.copyOf(bc, size)
  }

  /** Per-row body of [[TopNCentroidsCosine]] — public static so both
    * the interpreted eval and the generated code call the SAME
    * bytes (bit-equality between paths by construction). The sort key
    * is the NEGATED cosine (matching the composed form's `-cosine`
    * struct field, including its -0.0 for a +0.0 score — harmless
    * under [[cmpD]], which treats them equal). */
  def topNCosine(v: ArrayData, cents: Array[Array[Double]],
      cids: Array[Int], n: Int): ArrayData = {
    val neg = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val m = math.min(v.numElements(), cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < m) {
        val x = v.getDouble(i); val y = cv(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      neg(c) = -(if (denom == 0.0) 0.0 else dot / denom)
      c += 1
    }
    new GenericArrayData(selectTopN(neg, cids, n))
  }

  /** [[selectTopN]] with exact LONG keys (intL2 distances can exceed
    * 2^53 on large-magnitude vectors, where a double key would lose
    * the composed form's exact struct ordering). */
  private def selectTopNL(key: Array[Long], cids: Array[Int],
      n: Int): Array[Int] = {
    val k = math.min(n, key.length)
    val bk = new Array[Long](k); val bc = new Array[Int](k)
    var size = 0
    var c = 0
    while (c < key.length) {
      val better = size < k ||
        key(c) < bk(size - 1) ||
        (key(c) == bk(size - 1) && cids(c) < bc(size - 1))
      if (better) {
        var pos = if (size < k) size else k - 1
        while (pos > 0 && (key(c) < bk(pos - 1) ||
            (key(c) == bk(pos - 1) && cids(c) < bc(pos - 1)))) {
          bk(pos) = bk(pos - 1); bc(pos) = bc(pos - 1); pos -= 1
        }
        bk(pos) = key(c); bc(pos) = cids(c)
        if (size < k) size += 1
      }
      c += 1
    }
    if (size == k) bc else java.util.Arrays.copyOf(bc, size)
  }

  /** Per-row body of [[TopNCentroidsL2]]: exact scaled-integer L2
    * per centroid (the [[graft.operators.Similarity.intL2]]
    * arithmetic — both sides element-rounded via [[roundScaled]],
    * diffs squared and summed as longs), then the bounded select
    * over exact long keys. */
  def topNL2(v: ArrayData, scaledCents: Array[Array[Long]],
      cids: Array[Int], n: Int): ArrayData = {
    val dim = v.numElements()
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) { q(i) = roundScaled(v.getDouble(i)); i += 1 }
    val key = new Array[Long](scaledCents.length)
    var c = 0
    while (c < scaledCents.length) {
      val cv = scaledCents(c)
      val m = math.min(dim, cv.length)
      var d = 0L; var j = 0
      while (j < m) { val t = q(j) - cv(j); d += t * t; j += 1 }
      key(c) = d
      c += 1
    }
    new GenericArrayData(selectTopNL(key, cids, n))
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

/** array<double> — the exact-integer-replayable L2 normalization
  * x·1000/√(Σ round(x²·10⁶)) in one codegen'd pass (the cosine
  * serving tier's hot path: [[graft.operators.AnnIndex.buildCosine]]
  * normalizes the whole corpus through this). Interpreted eval and
  * generated code share [[AnnCodec.l2NormalizeExactBody]]. */
case class L2NormalizeExact(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "l2_normalize_exact"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"l2_normalize_exact expects array<double>, got $t")
    }
  }

  override def nullSafeEval(input: Any): Any =
    AnnCodec.l2NormalizeExactBody(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.AnnCodec.l2NormalizeExactBody($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<int> — the n nearest centroids of an array<double> vector by
  * cosine, descending score, ties → SMALLER cid. Bit-identical to the
  * composed query-side nProbe expansion it fuses
  * (`slice(array_sort(transform(centroidsLit, struct(-cosine(v, c.vec),
  * c.cid))), 1, n).getField("cid")` —
  * [[graft.operators.Similarity.topNCentroidsCosineComposed]]): the
  * per-centroid cosine is [[CosineSim]]'s exact accumulation order,
  * the sort key is the same NEGATED score, and the comparator is
  * array_sort's double ordering (+0.0 == -0.0, NaN greatest). The
  * composed form evaluated nCentroids interpreted lambda calls plus a
  * full struct-array sort PER QUERY ROW — the last interpreted HOF in
  * the ANN hot path (round-10 verdict ask #1); this is one codegen'd
  * static call. Interpreted eval and generated code share the same
  * [[AnnCodec.topNCosine]] body, so the two paths cannot diverge. */
case class TopNCentroidsCosine(child: Expression, cids: Array[Int],
    cents: Array[Array[Double]], n: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_n_centroids_cosine"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"top_n_centroids_cosine expects array<double>, got $t")
    }
  }

  override def nullSafeEval(input: Any): Any =
    AnnCodec.topNCosine(input.asInstanceOf[ArrayData], cents, cids, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val rc = ctx.addReferenceObj("rawCents", cents, "double[][]")
      val ids = ctx.addReferenceObj("cids", cids, "int[]")
      s"${ev.value} = graft.functions.AnnCodec.topNCosine($v, $rc, $ids, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<int> — the n nearest centroids by exact scaled-integer L2,
  * ascending distance, ties → SMALLER cid. Bit-identical to
  * `slice(array_sort(transform(centroidsLit, struct(intL2(v, c.vec),
  * c.cid))), 1, n).getField("cid")`
  * ([[graft.operators.AnnIndex.topNByL2Composed]], the persisted
  * index's query-side ranking) — same per-element [[AnnCodec
  * .roundScaled]] scaling, exact long distances, same tie order.
  * Shares its body ([[AnnCodec.topNL2]]) between interpreted eval and
  * codegen. */
case class TopNCentroidsL2(child: Expression, cids: Array[Int],
    cents: Array[Array[Double]], n: Int) extends UnaryExpression {

  @transient private lazy val scaled: Array[Array[Long]] =
    cents.map(AnnCodec.scaledVec)

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_n_centroids_l2"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"top_n_centroids_l2 expects array<double>, got $t")
    }
  }

  override def nullSafeEval(input: Any): Any =
    AnnCodec.topNL2(input.asInstanceOf[ArrayData], scaled, cids, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val sc = ctx.addReferenceObj("scaledCents", scaled, "long[][]")
      val ids = ctx.addReferenceObj("cids", cids, "int[]")
      s"${ev.value} = graft.functions.AnnCodec.topNL2($v, $sc, $ids, $n);"
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
