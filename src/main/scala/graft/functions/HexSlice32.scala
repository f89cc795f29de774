package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression: unsigned 32-bit value of the 8 hex
  * chars at 0-based char offset `start` of a hex string — the hot
  * kernel of the engine-portable md5 idiom (`graft.operators.Sampling
  * .md5Bits32`, `graft.operators.Sketches.bucket`). Value-identical
  * on hex input to `conv(substr(hex, start+1, 8), 16, 10)` and to
  * DuckDB's `('0x' || substr(hex, start+1, 8))::BIGINT`, but a plain
  * fixed-count bit loop inside whole-stage codegen instead of conv's
  * interpreted radix converter (which round-trips through a decimal
  * string per call — measured ~25× slower per row on the Count-Min
  * cell build). Any null input nulls the result; a slice that runs
  * past the string or contains a non-hex char is null (never happens
  * on md5 output — conv would instead best-effort-parse, a deviation
  * that is unreachable from the md5-only call sites).
  */
case class HexSlice32(hex: Expression, start: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(hex, start)
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (hex.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"hex_slice32 expects a string hex column, got ${hex.dataType}")
    else if (start.dataType != IntegerType) TypeCheckResult.TypeCheckFailure(
      s"hex_slice32 expects an int start offset, got ${start.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def prettyName: String = "hex_slice32"
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val h = hex.eval(input)
    val s = start.eval(input)
    if (h == null || s == null) null
    else {
      val v = HexSlice32.parse(
        h.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        s.asInstanceOf[Int])
      if (v < 0) null else v
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = hex.genCode(ctx)
    val s = start.genCode(ctx)
    val cls = HexSlice32.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      |${h.code}
      |${s.code}
      |boolean ${ev.isNull} = ${h.isNull} || ${s.isNull};
      |long ${ev.value} = 0L;
      |if (!${ev.isNull}) {
      |  ${ev.value} = $cls.parse(${h.value}, ${s.value});
      |  if (${ev.value} < 0L) { ${ev.isNull} = true; ${ev.value} = 0L; }
      |}
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hex = newChildren(0), start = newChildren(1))
}

object HexSlice32 {
  /** Parse 8 hex chars at char offset `start`; -1 on any malformed
    * input (out of bounds / non-hex / non-ASCII). The valid result
    * range [0, 2^32) never collides with the sentinel. Operates on
    * the UTF8String bytes directly — hex is ASCII, so byte index ==
    * char index whenever the slice is well-formed, and any multi-byte
    * char in the slice fails the per-byte hex check anyway. */
  def parse(hex: org.apache.spark.unsafe.types.UTF8String, start: Int): Long = {
    if (start < 0 || start + 8 > hex.numBytes()) return -1L
    var v = 0L
    var i = 0
    while (i < 8) {
      val b = hex.getByte(start + i)
      val d =
        if (b >= '0' && b <= '9') b - '0'
        else if (b >= 'a' && b <= 'f') b - 'a' + 10
        else if (b >= 'A' && b <= 'F') b - 'A' + 10
        else return -1L
      v = (v << 4) | d
      i += 1
    }
    v
  }

  /** Column entry point: `HexSlice32(hexCol, startCol)`; `start` is a
    * 0-based CHAR offset (so hash row r of a sliced md5 is start
    * r*8). */
  def apply(hex: Column, start: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      HexSlice32(ColumnBridge.expression(hex), ColumnBridge.expression(start)))
  }
}
