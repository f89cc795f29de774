package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Position-tagged ≤k-deletion neighborhood, pre-hashed —
  * `deletion_variants_tagged(s, k)` emits one
  * `struct<h: bigint, nd: int, pos: int>` per variant where `h` is
  * Spark's `xxhash64` of the variant string (seed 42 — bit-identical
  * to `xxhash64(variant)`, asserted in DedupSpec), `nd` the deletion
  * count, and `pos` the deletion positions (code-point indices;
  * `i` for nd=1, `i·2¹⁶+j` for nd=2, −1 for the string itself).
  *
  * Why positions: [[graft.operators.Dedup.fuzzyJoinPairs]]'s ed ≤ 2
  * blocking needs the (2,2) candidate channel ONLY for
  * 2-substitution pairs, and those share an aligned witness (both
  * sides delete the SAME two positions) — so the 2-deletion
  * equi-join can carry `pos` in its key, which splits the dominant
  * buckets (a 2-deletion variant of a structured identifier collides
  * with every id sharing a length-(L−2) subsequence; position-tagged,
  * only with ids differing exactly at those two positions). Every
  * other ed ≤ 2 shape is covered by the (0-or-1)-deletion channels,
  * where positions stay UNRESTRICTED (a 1-ins+1-del pair's witness
  * deletes different positions) — the channel-completeness law is
  * DedupSpec's blocked ≡ brute over the adversarial radii fixture.
  *
  * Why pre-hashed: the blocking join carries two longs per row
  * either way; hashing inside the kernel skips materializing every
  * variant string into the row just to hash it one projection later.
  * nd ≤ 1 variants are string-deduplicated (duplicates from repeated
  * characters would inflate the unrestricted channels); nd = 2 rows
  * are NOT deduplicated across positions — `pos` is part of their
  * join key, and a (string, i, j) triple is unique by construction.
  */
case class DeletionVariantsTagged(child: Expression, maxDeletions: Int)
    extends UnaryExpression {

  override def dataType: DataType = DeletionVariantsTagged.outType
  override def prettyName: String = "deletion_variants_tagged"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType if maxDeletions >= 1 && maxDeletions <= 2 =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"deletion_variants_tagged expects a string column and k in 1..2, got $t / $maxDeletions")
    }
  }

  override def nullSafeEval(input: Any): Any =
    DeletionVariantsTagged.compute(input.asInstanceOf[UTF8String], maxDeletions)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DeletionVariantsTagged.compute($a, $maxDeletions);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeletionVariantsTagged {

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("nd", IntegerType, nullable = false),
    StructField("pos", IntegerType, nullable = false))), containsNull = false)

  private def xx(s: UTF8String): Long =
    XxHash64Function.hash(s, StringType, 42L)

  /** One imperative pass; shared by interpreted and generated paths. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val cps = s.toString.codePoints.toArray
    val n = cps.length
    def mk(skip1: Int, skip2: Int): UTF8String = {
      val sb = new java.lang.StringBuilder(n)
      var i = 0
      while (i < n) {
        if (i != skip1 && i != skip2) sb.appendCodePoint(cps(i))
        i += 1
      }
      UTF8String.fromString(sb.toString)
    }
    val rows = new java.util.ArrayList[AnyRef](1 + n + n * n / 2)
    def add(h: Long, nd: Int, pos: Int): Unit =
      rows.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](h, nd, pos)))
    // nd <= 1: dedupe by variant STRING (repeated characters yield the
    // same 1-deletion string from several positions — one row suffices
    // in the position-free channels)
    val seen = new java.util.HashSet[UTF8String](1 + n)
    val self = UTF8String.fromString(s.toString)
    seen.add(self); add(xx(self), 0, -1)
    var i = 0
    while (i < n) {
      val v = mk(i, -1)
      if (seen.add(v)) add(xx(v), 1, i)
      i += 1
    }
    if (k >= 2) {
      var a = 0
      while (a < n - 1) {
        var b = a + 1
        while (b < n) { add(xx(mk(a, b)), 2, a * 65536 + b); b += 1 }
        a += 1
      }
    }
    new GenericArrayData(rows.toArray(new Array[AnyRef](rows.size())))
  }

  /** Column-level entry point. */
  def apply(s: Column, maxDeletions: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      DeletionVariantsTagged(ColumnBridge.expression(s), maxDeletions))
  }
}
