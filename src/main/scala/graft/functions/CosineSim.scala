package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two
  * array<double> columns in ONE fused pass (dot + both norms), with
  * whole-stage codegen.
  *
  * The composable alternative — `aggregate(zip_with(a,b,*), …)` for
  * the dot product plus two more aggregates for the norms — walks the
  * arrays four times and allocates an intermediate array per row;
  * in the ANN hot path (|corpus| × |queries| evaluations) that is the
  * dominant cost. This expression is the SURVEY §4.2 "custom only if
  * benchmarks demand" case: same semantics, same IEEE operation
  * order (sequential fold), ~4× less array traffic.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects two array<double> arguments, got $l and $r")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}

/** SparkSessionExtensions hook: registers `cosine_sim` for SQL use —
  * `spark.sql("SELECT cosine_sim(a, b) …")`. Install with
  * `.withExtensions(new GraftExtensions)` or the
  * `spark.sql.extensions` conf key. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) =>
        MinHashSig(children(0), children(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children(0))))
    // the exact-integer-replayable unit normalization the cosine
    // serving tier is built on (graft.operators.AnnIndex.buildCosine)
    // — SQL users normalize with the same single-pass kernel
    ext.injectFunction((
      new FunctionIdentifier("l2_normalize_exact"),
      new ExpressionInfo(classOf[L2NormalizeExact].getName,
        "l2_normalize_exact"),
      (children: Seq[Expression]) => L2NormalizeExact(children(0))))
    // zorder_key(d1, …, dk, bits): the data-layout key behind
    // multi-dimensional row-group skipping — last argument is the
    // per-dimension bit width (a foldable int, like minhash_sig's n)
    ext.injectFunction((
      new FunctionIdentifier("zorder_key"),
      new ExpressionInfo(classOf[ZOrderKey].getName, "zorder_key"),
      (children: Seq[Expression]) => ZOrderKey(children.init,
        children.last.eval().asInstanceOf[Number].intValue())))
    // whole-operator extension: BETWEEN-join → binned equi-join
    // (graft.plans.BinnedRangeJoinRule) — keeps interval lookups off
    // the BroadcastNestedLoopJoin path
    ext.injectOptimizerRule(_ => new graft.plans.BinnedRangeJoinRule)
    // whole-operator extension: levenshtein(a,b) <= k join → FastSS
    // deletion-variant equi-join (graft.plans.FuzzyLevJoinRule)
    ext.injectOptimizerRule(_ => new graft.plans.FuzzyLevJoinRule)
    // whole-operator extension: unpartitioned rank windows over
    // data-sized inputs → range-partitioned two-pass global rank
    // (graft.plans.GlobalRankWindowRule)
    ext.injectOptimizerRule(_ => new graft.plans.GlobalRankWindowRule)
    // TABLE functions: the pruning tables reachable from pure SQL —
    // `FROM graft_merge_table('<dir>')` (bucket + zone pruning,
    // snapshot semantics) and `FROM graft_zonemap_table('<path>')`
    // (file-level data skipping). The path argument must be a string
    // literal; the plan is built at analysis time against the
    // manifest/sidecar current at that moment.
    def litPath(args: Seq[Expression], fn: String): String = args match {
      case Seq(org.apache.spark.sql.catalyst.expressions.Literal(
        s: org.apache.spark.unsafe.types.UTF8String,
        _: org.apache.spark.sql.types.StringType)) if s != null => s.toString
      case _ => throw new IllegalArgumentException(
        s"$fn expects exactly one string-literal path argument")
    }
    ext.injectTableFunction((
      new FunctionIdentifier("graft_merge_table"),
      new ExpressionInfo("graft.operators.MergeTable", "graft_merge_table"),
      (args: Seq[Expression]) => graft.operators.MergeTable.tablePlan(
        org.apache.spark.sql.SparkSession.active,
        litPath(args, "graft_merge_table"))))
    ext.injectTableFunction((
      new FunctionIdentifier("graft_zonemap_table"),
      new ExpressionInfo("graft.sources.ZoneMap", "graft_zonemap_table"),
      (args: Seq[Expression]) => graft.sources.ZoneMap.tablePlan(
        org.apache.spark.sql.SparkSession.active,
        litPath(args, "graft_zonemap_table"))))
  }
}
