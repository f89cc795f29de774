package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: Z-order (Morton) clustering key — the
  * low `bits` bits of k long columns interleaved into one long, so a
  * single range-partitioned sort co-locates rows that are close in
  * EVERY dimension. This is the data-layout primitive behind
  * multi-dimensional min-max skipping at 100 TB: writing shards
  * sorted by `zorder_key(a, b)` makes parquet row-group min/max
  * stats selective for filters on `a`, on `b`, or both, where a
  * lexicographic sort serves only its leading column.
  *
  * Pure bit arithmetic — one fused pass with whole-stage codegen, no
  * hash, no allocation; bit-for-bit replayable in any engine as
  * Σ_b Σ_d ((x_d >> b) & 1) << (b·k + d). Dimensions clamp to their
  * low `bits` bits (the caller range-normalizes, e.g. via a
  * width_bucket-style quantization); k·bits must fit a long. Any
  * null dimension nulls the key (SQL semantics).
  */
case class ZOrderKey(children: Seq[Expression], bits: Int) extends Expression {

  require(children.nonEmpty, "zorder_key needs at least one dimension")
  require(bits > 0 && children.length * bits <= 63,
    s"zorder_key: ${children.length} dims x $bits bits exceeds a long")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    children.find(_.dataType != LongType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"zorder_key expects long dimensions, got ${c.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def eval(input: InternalRow): Any = {
    val k = children.length
    var key = 0L
    var d = 0
    while (d < k) {
      val v = children(d).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        key |= ((x >>> b) & 1L) << (b * k + d)
        b += 1
      }
      d += 1
    }
    key
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = children.length
    val parts = children.map(_.genCode(ctx)).zipWithIndex.map { case (e, d) =>
      val b = ctx.freshName("b")
      s"""
         |if (!${ev.isNull}) {
         |  ${e.code}
         |  if (${e.isNull}) {
         |    ${ev.isNull} = true;
         |  } else {
         |    for (int $b = 0; $b < $bits; $b++) {
         |      ${ev.value} |= ((${e.value} >>> $b) & 1L) << ($b * $k + $d);
         |    }
         |  }
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(code = code"""
      |boolean ${ev.isNull} = false;
      |long ${ev.value} = 0L;
      |$parts
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZOrderKey {
  /** Column-level entry point: `zorderKey(16, col("a"), col("b"))`. */
  def apply(bits: Int, dims: Column*): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ZOrderKey(dims.map(ColumnBridge.expression), bits))
  }

  /** The engine-portable SQL twin of one key — the exact expression
    * any engine can replay: Σ_b Σ_d ((dim_d >> b) & 1) << (b·k + d). */
  def sqlTwin(bits: Int, dims: Seq[String]): String = {
    val k = dims.length
    val terms = for {
      b <- 0 until bits
      (dim, d) <- dims.zipWithIndex
    } yield s"((($dim >> $b) & 1) << ${b * k + d})"
    terms.mkString("(", " | ", ")")
  }
}
