package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the full MinHash signature of a token
  * array in ONE narrow pass — `minhash_sig(tokens, n)` ≡ the
  * `explode → groupBy(doc) → n × min(xxhash64(lit(i), tok))`
  * aggregation, bit-for-bit, with NO shuffle.
  *
  * Scale rationale: the aggregate form shuffles the entire exploded
  * token stream (tokens-per-doc × corpus rows) just to bring each
  * doc's tokens back together — but they were already together in the
  * source array. At 100 TB that shuffle is the dominant cost of
  * signature building; this expression keeps signature computation
  * inside the scan's WholeStageCodegen span. The aggregate form
  * remains for inputs that genuinely arrive exploded.
  *
  * Hash identity: Spark's `xxhash64(lit(i), tok)` folds children as
  * `hashUTF8String(tok, hashInt(i, 42))`; the per-seed inner values
  * are precomputed once and the same fold is applied per element, so
  * the signature equals the aggregate form exactly (asserted in
  * DedupSpec). Null/empty arrays yield null (the aggregate form emits
  * no row for a token-less doc).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  // null also for EMPTY (non-null) input arrays, so the codegen and
  // eval paths must own the null flag even under a non-null child
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) if numHashes > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<string> and a positive hash count, got $t / $numHashes")
    }
  }

  /** hashInt(i, 42) per seed — the running hash after the literal
    * INT seed child (`lit(i)` in the aggregate form is an Int),
    * precomputed once per expression instance. */
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val tok = arr.getUTF8String(j)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashUTF8String(tok, seeds(i))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val tok = ctx.freshName("tok")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    if (!$a.isNullAt($j)) {
         |      $utf8 $tok = $a.getUTF8String($j);
         |      for (int $i = 0; $i < $numHashes; $i++) {
         |        long $h = $xxh.hashUTF8String($tok, $seedsRef[$i]);
         |        if ($h < $mins[$i]) $mins[$i] = $h;
         |      }
         |    }
         |  }
         |  ${ev.value} = new $gad($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** Column-level entry point. */
  def apply(tokens: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(tokens), numHashes))
  }
}
