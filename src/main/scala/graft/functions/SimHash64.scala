package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash of a token array in one
  * narrow pass — `simhash64(tokens)` ≡ the
  * `explode → xxhash64(lit(7), tok) → groupBy(doc) → 64 conditional
  * sums → bit recombine` aggregation, bit-for-bit, with NO shuffle
  * (same rationale as [[MinHashSig]]: the tokens are already grouped
  * per doc in the source array).
  *
  * Vote semantics match the aggregate form exactly: each distinct
  * token's hash contributes +1 to bit j if set, −1 otherwise; the
  * signature bit is 1 iff the vote is strictly positive. The caller
  * is responsible for passing DISTINCT tokens (as the aggregate form
  * dedups via array_distinct) — [[graft.operators.TextOps.wordShingles]]
  * already returns distinct shingles. Null/empty arrays yield null.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects array<string>, got $t")
    }
  }

  /** The aggregate form's hash is `xxhash64(lit(7), tok)` — an INT 7
    * child folded first: hashUTF8String(tok, hashInt(7, 42)). */
  private val Seed: Long = XXH64.hashInt(7, 42L)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(j), Seed)
        var b = 0
        while (b < 64) {
          votes(b) += (if ((h & (1L << b)) != 0L) 1 else -1)
          b += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      val xxh = classOf[XXH64].getName
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $votes = new int[64];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      long $h = $xxh.hashUTF8String(($utf8) $a.getUTF8String($i), ${Seed}L);
         |      for (int $b = 0; $b < 64; $b++) {
         |        $votes[$b] += (($h & (1L << $b)) != 0L) ? 1 : -1;
         |      }
         |    }
         |  }
         |  long $sig = 0L;
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ($votes[$b] > 0) $sig |= (1L << $b);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Column-level entry point. */
  def apply(tokens: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  }
}
