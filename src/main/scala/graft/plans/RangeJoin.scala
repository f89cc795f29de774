package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, concat, explode, expr, lit, raise_error, sequence, when}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Binned range join — the missing whole-operator in open-source
  * Spark: an inner join whose ONLY predicate is `x BETWEEN lo AND hi`
  * has no equi-key, so the planner falls back to
  * BroadcastNestedLoopJoin (or a cartesian) — O(|probe|·|ranges|)
  * comparisons, the canonical 100 TB scale-killer for interval
  * lookups (IP→geo ranges, price bands, genomic intervals; the
  * reference's contig-window overlap scans in bin/ share this shape).
  *
  * The standard fix (Flink interval joins, Databricks' range-join
  * binning) re-expresses the interval predicate as an equi-join on a
  * quantized bin key: every range row is exploded to the bins its
  * [lo, hi] span covers, every probe row computes its single
  * containing bin, the join runs as a hash/sort-merge join on the bin
  * plus the original predicate as a residual filter. Each probe row
  * lands in exactly one bin, so no dedup pass is needed; cost becomes
  * O(|ranges|·span/binWidth + matches) — linear, shuffle-partitioned,
  * AQE-skew-splittable. Truncating integer division is monotone, so
  * x ∈ [lo, hi] ⇒ bin(x) ∈ [bin(lo), bin(hi)] holds for negative
  * values too.
  *
  * Two surfaces:
  *  - [[RangeJoin.binned]]: the explicit DataFrame operator.
  *  - [[BinnedRangeJoinRule]]: a Catalyst optimizer rule (registered
  *    through [[graft.functions.GraftExtensions]]) that detects the
  *    no-equi-key BETWEEN join in ANY query — SQL or DataFrame — and
  *    rewrites it to the binned plan automatically, so a user writing
  *    plain `JOIN ... ON x BETWEEN lo AND hi` gets the linear plan
  *    without knowing this library exists. Pattern (c) of the
  *    engine's extension ladder: compose-if-possible, Expression if
  *    scalar, logical Rule when the OPTIMIZER must see the rewrite.
  */
object RangeJoin {

  val BinColumn = "__graft_bin"

  /** Inner-join `probe` rows to every `ranges` row whose
    * [`loCol`, `hiCol`] interval contains `xCol`, via bin-key
    * equi-join. All three columns must be integral; `binWidth` should
    * approximate the TYPICAL range span — each range row explodes to
    * ~span/binWidth bin rows, each probe row to exactly one. Column
    * names of the two inputs must be disjoint (the result carries
    * both sides' columns, minus the internal bin key). */
  def binned(probe: DataFrame, xCol: String, ranges: DataFrame,
      loCol: String, hiCol: String, binWidth: Long,
      maxBinsPerRange: Long = DefaultMaxBins): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = probe.columns.toSet.intersect(ranges.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint, both have: $overlap")
    val p = probe.withColumn(BinColumn,
      expr(s"CAST(`$xCol` AS BIGINT) div $binWidth"))
    val loBin = expr(s"CAST(`$loCol` AS BIGINT) div $binWidth")
    val hiBin = expr(s"CAST(`$hiCol` AS BIGINT) div $binWidth")
    // wide-interval fuse (see BinnedRangeJoinRule scaladoc): an
    // open-ended sentinel range must fail loudly, not OOM in Sequence
    val guardedHi = when(hiBin - loBin > maxBinsPerRange,
      raise_error(concat(lit("graft range join: interval spans "),
        (hiBin - loBin + 1).cast("string"),
        lit(s" bins (cap $maxBinsPerRange). Raise binWidth, pre-split or " +
          "clamp open-ended intervals, or raise maxBinsPerRange."))).cast("bigint"))
      .otherwise(hiBin)
    val r = ranges.withColumn(BinColumn,
      explode(sequence(loBin, guardedHi)))
    p.join(r, Seq(BinColumn))
      .where(col(xCol) >= col(loCol) && col(xCol) <= col(hiCol))
      .drop(BinColumn)
  }

  /** Default per-range bin-count cap: 2²⁰ bins ≈ 8 MB of bin rows per
    * range row — far above any sane binWidth choice, low enough that a
    * Long.MaxValue sentinel fails in milliseconds instead of OOMing. */
  val DefaultMaxBins: Long = 1L << 20
}

/** Optimizer rule: rewrite `A JOIN B ON x >= lo AND x <= hi [AND ...]`
  * (no equi-conjunct, integral bound columns, inner join) into the
  * binned equi-join of [[RangeJoin]]. Conservative by construction:
  *  - fires only when NO equi-conjunct spans both sides (if one
  *    exists, the native hash join is already linear);
  *  - fires only on deterministic BETWEEN-shaped conjunct pairs over
  *    integral types;
  *  - keeps the ORIGINAL join condition as a residual, so the rewrite
  *    is semantics-preserving by inspection;
  *  - the rewritten join HAS an equi-conjunct, so the rule cannot
  *    re-fire on its own output (safe under the optimizer's fixpoint).
  *
  * Bin width comes from `spark.graft.rangejoin.binwidth` (default
  * 4096); `spark.graft.rangejoin.enabled=false` switches the rule
  * off.
  *
  * WIDE-INTERVAL HAZARD + FUSE: the rewrite explodes each range row to
  * span/binWidth bin rows, so a single very wide or open-ended
  * interval (e.g. a `hi = Long.MaxValue` sentinel) would make
  * `sequence()` demand billions of elements — a query that merely ran
  * slowly under BroadcastNestedLoopJoin would instead OOM. The rule
  * therefore guards every range row with a bin-count fuse,
  * `spark.graft.rangejoin.maxbins` (default 2²⁰): a row past the cap
  * raises a deliberate, actionable error naming the three remedies
  * (raise `binwidth` so wide intervals span fewer bins, pre-split or
  * clamp sentinel intervals, or set `enabled=false` to fall back to
  * the nested-loop plan). Failing loudly is the designed behavior —
  * silently clamping would drop matches, and silently falling back
  * per-row would need a runtime union the optimizer cannot size. */
class BinnedRangeJoinRule extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.rangejoin.enabled", "true").toBoolean) {
      return plan
    }
    val binWidth =
      conf.getConfString("spark.graft.rangejoin.binwidth", "4096").toLong
    val maxBins =
      conf.getConfString("spark.graft.rangejoin.maxbins",
        RangeJoin.DefaultMaxBins.toString).toLong
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && findRange(j, cond).isDefined =>
        val (x, lo, hi, probeIsLeft) = findRange(j, cond).get
        val w = Literal(binWidth)
        def toBin(e: Expression) = IntegralDivide(Cast(e, LongType), w)
        val binAlias = Alias(toBin(x), RangeJoin.BinColumn)()
        val binsAttr =
          AttributeReference(RangeJoin.BinColumn + "s", LongType, nullable = false)()
        val (probe, ranges) = if (probeIsLeft) (left, right) else (right, left)
        val probeProj = Project(probe.output :+ binAlias, probe)
        // wide-interval fuse (see class scaladoc): a range row spanning
        // more than maxbins bins raises an actionable error instead of
        // asking Sequence for billions of elements
        val span = Subtract(toBin(hi), toBin(lo))
        val guardedHi = If(GreaterThan(span, Literal(maxBins)),
          Cast(new RaiseError(Concat(Seq(
            Literal("graft range join: interval spans "),
            Cast(Add(span, Literal(1L)), org.apache.spark.sql.types.StringType),
            Literal(s" bins (cap spark.graft.rangejoin.maxbins=$maxBins). " +
              "Raise spark.graft.rangejoin.binwidth, pre-split or clamp " +
              "open-ended intervals, or set spark.graft.rangejoin.enabled=false.")))),
            LongType),
          toBin(hi))
        // Sequence is TimeZoneAwareExpression: without an explicit
        // timeZoneId it stays unresolved post-analysis
        val rangeGen = Generate(
          Explode(new Sequence(toBin(lo), guardedHi, None,
            Some(conf.sessionLocalTimeZone))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(binsAttr), child = ranges)
        val (newLeft, newRight) =
          if (probeIsLeft) (probeProj, rangeGen) else (rangeGen, probeProj)
        val newJoin = Join(newLeft, newRight, Inner,
          Some(And(EqualTo(binAlias.toAttribute, binsAttr), cond)), hint)
        Project(j.output, newJoin)
    }
  }

  /** Detect the BETWEEN shape: two conjuncts x >= lo and x <= hi (in
    * either written orientation) with x's references wholly on one
    * side, lo's and hi's wholly on the other, all integral and
    * deterministic — and NO equi-conjunct across the sides. Returns
    * (x, lo, hi, probeIsLeft). */
  private def findRange(j: Join, cond: Expression)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    val cs = conjuncts(cond)
    val hasCrossEqui = cs.exists {
      case EqualTo(a, b) => crossSides(j, a, b)
      case EqualNullSafe(a, b) => crossSides(j, a, b)
      case _ => false
    }
    if (hasCrossEqui) return None
    // normalize every GE/LE conjunct to (big, small) meaning big >= small
    val gePairs = cs.collect {
      case GreaterThanOrEqual(a, b) => (a, b)
      case LessThanOrEqual(a, b) => (b, a)
    }.filter { case (a, b) =>
      a.deterministic && b.deterministic &&
        integral(a.dataType) && integral(b.dataType)
    }
    val candidates = for {
      (x1, lo) <- gePairs // x >= lo
      (hi, x2) <- gePairs // hi >= x
      if x1.semanticEquals(x2) && !lo.semanticEquals(hi)
      xSide <- sideOf(j, x1)
      loSide <- sideOf(j, lo)
      hiSide <- sideOf(j, hi)
      if loSide == hiSide && xSide != loSide
    } yield (x1, lo, hi, xSide)
    candidates.headOption
  }

  private def crossSides(j: Join, a: Expression, b: Expression): Boolean = {
    val spansA = sideOf(j, a)
    val spansB = sideOf(j, b)
    spansA.isDefined && spansB.isDefined && spansA != spansB
  }

  /** Some(true) if e references only the left side, Some(false) only
    * the right, None if empty or mixed. */
  private def sideOf(j: Join, e: Expression): Option[Boolean] =
    if (e.references.isEmpty) None
    else if (e.references.subsetOf(j.left.outputSet)) Some(true)
    else if (e.references.subsetOf(j.right.outputSet)) Some(false)
    else None
}
