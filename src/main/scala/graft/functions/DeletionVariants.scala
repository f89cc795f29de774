package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the distinct ≤k-deletion neighborhood
  * of a string (k = 1 or 2), the string itself included —
  * `deletion_variants(s, k)` ≡ [[graft.operators.Dedup
  * .deletionVariants]]'s built-in HOF chain value-for-value AND
  * order-for-order (self, then 1-deletions by position, then
  * 2-deletions in (i, j) lexicographic order; first occurrence wins
  * on duplicates — asserted in DedupSpec).
  *
  * Scale rationale: the HOF chain (`transform` over `sequence`, a
  * NESTED transform·transform for the 2-deletion tier, `flatten`,
  * `array_distinct`, with three `substr`/`concat` per variant)
  * evaluates interpreted with per-element lambda boxing and builds
  * each variant from three intermediate UTF8Strings — it was the
  * dominant cost of q246's blocking stage. This expression emits the
  * identical array in one imperative pass inside the scan's codegen
  * span. Deletion positions count CODE POINTS (Spark `substr`
  * semantics), not UTF-16 units, so non-BMP text agrees with the
  * built-in form.
  *
  * It is also the generator [[graft.plans.FuzzyLevJoinRule]] plants
  * when it rewrites a `levenshtein(a, b) <= k` join — an optimizer
  * rule cannot phrase the HOF chain without the Column API, but it
  * can plant one expression node.
  */
case class DeletionVariants(child: Expression, maxDeletions: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "deletion_variants"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType if maxDeletions >= 1 && maxDeletions <= 2 =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"deletion_variants expects a string column and k in 1..2, got $t / $maxDeletions")
    }
  }

  override def nullSafeEval(input: Any): Any =
    DeletionVariants.compute(input.asInstanceOf[UTF8String], maxDeletions)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DeletionVariants.compute($a, $maxDeletions);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeletionVariants {

  /** The whole neighborhood in one pass; shared by the interpreted
    * and generated paths. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val cps = s.toString.codePoints.toArray
    val n = cps.length
    val out = new java.util.LinkedHashSet[UTF8String](1 + n + n * n / 2)
    def mk(skip1: Int, skip2: Int): UTF8String = {
      val sb = new java.lang.StringBuilder(n)
      var i = 0
      while (i < n) {
        if (i != skip1 && i != skip2) sb.appendCodePoint(cps(i))
        i += 1
      }
      UTF8String.fromString(sb.toString)
    }
    out.add(UTF8String.fromString(s.toString))
    var i = 0
    while (i < n) { out.add(mk(i, -1)); i += 1 }
    if (k >= 2) {
      var a = 0
      while (a < n - 1) {
        var b = a + 1
        while (b < n) { out.add(mk(a, b)); b += 1 }
        a += 1
      }
    }
    new GenericArrayData(out.toArray[AnyRef](new Array[AnyRef](out.size)))
  }

  /** Column-level entry point. */
  def apply(s: Column, maxDeletions: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      DeletionVariants(ColumnBridge.expression(s), maxDeletions))
  }
}
