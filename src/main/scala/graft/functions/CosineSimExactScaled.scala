package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: the ORDER-INDEPENDENT exact-scaled
  * cosine ([[graft.operators.Similarity.cosineExactScaled]]) in one
  * fused pass — `Σ round(x·y·10⁶) / (√Σ round(x²·10⁶) ·
  * √Σ round(y²·10⁶))` with every per-element product scaled to an
  * exact BIGINT via [[AnnCodec.roundScaled]] (Spark `round`'s
  * BigDecimal HALF_UP, NOT `Math.round` — the boundary cases differ)
  * and the final division/sqrt the same IEEE chain as the composed
  * form, so the value is bit-identical to the
  * `aggregate(zip_with(…))` triple it replaces (law in
  * SimilaritySpec) on every non-zero-norm input. On zero norms the
  * two deliberately diverge: ANSI mode (Spark 4 default) makes the
  * composed form's division THROW DIVIDE_BY_ZERO, while this kernel
  * stays TOTAL with the IEEE ±Inf/NaN — a scorer must not kill a job
  * over a degenerate row (no gate scores zero vectors; pinned in the
  * law test).
  *
  * Scale rationale: the composed form evaluates THREE interpreted
  * `aggregate(zip_with(…))` HOFs per pair — 3·dim lambda
  * invocations and three intermediate arrays per scored pair, the
  * exact per-row interpreted floor the [[NearestCentroidL2]] /
  * [[L2NormalizeExact]] family removed from the index paths, still
  * alive in the brute-force scorer (q248 kNN: |Q|·|corpus| pairs).
  */
case class CosineSimExactScaled(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim_exact_scaled"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim_exact_scaled expects two array<double> arguments, got $l and $r")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    CosineSimExactScaled.compute(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSimExactScaled.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object CosineSimExactScaled {

  /** One pass; `zip_with` pads the shorter array with null and
    * `aggregate`'s `acc + null` nulls the whole sum — but every
    * caller scores equal-length vectors, and the equal-length case is
    * the contract (asserted by the law test). Norms use each array's
    * own full length, exactly like the composed `sdot(a,a)`/
    * `sdot(b,b)`. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    val n = math.min(na, nb)
    var dot = 0L; var sa = 0L; var sb = 0L
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += AnnCodec.roundScaled(x * y)
      sa += AnnCodec.roundScaled(x * x)
      sb += AnnCodec.roundScaled(y * y)
      i += 1
    }
    var j = n
    while (j < na) { val x = a.getDouble(j); sa += AnnCodec.roundScaled(x * x); j += 1 }
    j = n
    while (j < nb) { val y = b.getDouble(j); sb += AnnCodec.roundScaled(y * y); j += 1 }
    dot.toDouble / (math.sqrt(sa.toDouble) * math.sqrt(sb.toDouble))
  }

  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      CosineSimExactScaled(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
