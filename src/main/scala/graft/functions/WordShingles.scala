package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: distinct word k-shingles of a text
  * column in ONE imperative pass — `word_shingles(text, k)` ≡
  * `array_distinct(transform(sequence(...), i => concat_ws("_",
  * slice(tokens, i+1, k))))` value-for-value.
  *
  * Scale rationale: the built-in form chains THREE higher-order
  * functions (`filter` inside the tokenizer, `transform`, plus the
  * lambda-bound `slice`), and Spark evaluates higher-order functions
  * interpreted (CodegenFallback) with per-element lambda boxing —
  * measured ~0.8 ms/doc on 54-token docs, which made shingling the
  * dominant cost of every dedup/decontamination query (q93: 3.6 s of
  * a 5 s query at sf0.1). This expression does the identical work in
  * a tight loop inside the scan's codegen span.
  *
  * Exact-equivalence contract (asserted in DedupSpec):
  *  - tokenization = `filter(split(lower(text), "\\s+"), length > 0)`:
  *    UTF8String.toLowerCase (Spark's `lower`), Java-regex split,
  *    empties dropped;
  *  - k <= 1 → distinct tokens in first-occurrence order;
  *  - k > 1 → positions 0..max(n−k, 0): join of
  *    tokens[i, min(i+k, n)) with '_' — including the built-in
  *    `slice` clamp (sub-k-token docs yield ONE short shingle, and a
  *    token-less doc yields [""], exactly as
  *    `concat_ws` over an empty slice does);
  *  - null text → null.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType if k > 0 => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects a string column and positive k, got $t / $k")
    }
  }

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordShingles.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** The whole tokenize→shingle→distinct pass; shared by the
    * interpreted and generated paths. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    // UTF8String.toLowerCase IS Spark's `lower`; Java-regex split IS
    // Spark's `split` (same pattern class, limit -1)
    val parts = Ws.split(text.toLowerCase.toString, -1)
    val toks = new java.util.ArrayList[String](parts.length)
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) toks.add(parts(i))
      i += 1
    }
    val n = toks.size
    val out = new java.util.LinkedHashSet[String]()
    if (k <= 1) {
      var j = 0
      while (j < n) { out.add(toks.get(j)); j += 1 }
    } else {
      // positions 0..max(n-k, 0) with the slice clamp: a doc shorter
      // than k tokens yields one short shingle; an empty doc yields ""
      val last = math.max(n - k, 0)
      var p = 0
      while (p <= last) {
        val sb = new java.lang.StringBuilder()
        val end = math.min(p + k, n)
        var q = p
        while (q < end) {
          if (q > p) sb.append('_')
          sb.append(toks.get(q))
          q += 1
        }
        out.add(sb.toString)
        p += 1
      }
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator()
    var w = 0
    while (it.hasNext) { arr(w) = UTF8String.fromString(it.next()); w += 1 }
    new GenericArrayData(arr)
  }

  /** Column-level entry point. */
  def apply(text: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), k))
  }
}
