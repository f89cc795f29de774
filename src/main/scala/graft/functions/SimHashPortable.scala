package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the md5-PORTABLE SimHash signature
  * words of a token array in one pass — `simhash_portable(tokens)` ≡
  * the relational `explode → md5 → HexSlice32 → 64 × sum(±1) →
  * assemble` chain, bit-for-bit (asserted in DedupSpec), with NO
  * explode and NO shuffle: votes fold inside the scan.
  *
  * Hash identity: Spark's `md5(tok)` is the hex of the MD5 digest of
  * the token's UTF-8 bytes; `HexSlice32(hex, 0)` / `HexSlice32(hex,
  * 8)` are the first / second 4 digest bytes as unsigned 32-bit
  * big-endian values — computed here directly from the digest, no
  * hex round-trip. This keeps the expression DuckDB-replayable
  * (`('0x' || substr(md5(tok), 1, 8))::BIGINT`), unlike the xxhash64
  * production signature ([[SimHash64]]).
  *
  * Null/empty arrays yield null (the relational form emits no row
  * for a token-less doc). Output: array<long> of [sim1, sim2], each
  * an unsigned-32-bit word. */
case class SimHashPortable(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_portable"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash_portable expects array<string>, got $t")
    }
  }

  override def nullSafeEval(input: Any): Any =
    SimHashPortable.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = SimHashPortable.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val out = ctx.freshName("sims")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out = ($cls).compute($a);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashPortable {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One-pass vote fold; null for inputs with no non-null tokens. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var seen = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        seen = true
        val dg = md.get(); dg.reset()
        val h = dg.digest(arr.getUTF8String(j).getBytes)
        val h1 = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
          ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
        val h2 = ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
          ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
        var b = 0
        while (b < 32) {
          votes(b) += (if (((h1 >> b) & 1L) == 1L) 1 else -1)
          votes(32 + b) += (if (((h2 >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      j += 1
    }
    if (!seen) return null
    val sims = new Array[Long](2)
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) sims(0) |= 1L << b
      if (votes(32 + b) > 0) sims(1) |= 1L << b
      b += 1
    }
    new GenericArrayData(sims)
  }

  def apply(tokens: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SimHashPortable(ColumnBridge.expression(tokens)))
  }
}
