package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Optimizer rule: rewrite an UNPARTITIONED rank-family window —
  * `row_number()/rank()/percent_rank()/ntile(k) OVER (ORDER BY ...)`
  * with no PARTITION BY — over a DATA-SIZED input into the
  * range-partitioned two-pass plan of [[graft.operators.GlobalRank]].
  * The stock plan moves the ENTIRE input through one task (Spark logs
  * "No Partition Defined ... serious performance degradation"); a
  * plain-SQL user gets the distributed plan without knowing this
  * library exists — the third whole-operator extension beside
  * [[BinnedRangeJoinRule]] and [[FuzzyLevJoinRule]].
  *
  * Rewrite: repartitionByRange(orderSpec) → per-partition
  * row_number + rank (ONE window, PARTITIONED by the range id) →
  * per-partition counts prefix-summed (a ≤ |shuffle partitions|-row
  * table — the only single-partition window left) → broadcast-join
  * offsets back. Outputs are bit-identical: row_number/ntile are
  * positional (global position = local + offset; ties land in ONE
  * range partition, so any positional choice matches some one-task
  * order — same output multiset), rank/percent_rank are tie-aware
  * via the local RANK + offset, and ntile/percent_rank derive from
  * (position, n) by the SQL-standard closed forms.
  *
  * Conservative by construction: fires only on resolved Window nodes
  * whose every window expression is rank-family with a deterministic
  * non-empty ORDER BY, and only when the child's estimated size is
  * ≥ `spark.graft.globalrank.minbytes` (default 8 MiB) — bounded
  * sketch/dim tables keep the cheap one-task plan (its scheduling
  * floor beats a multi-stage plan at tiny sizes). The rewritten tree
  * contains only pid-PARTITIONED rank windows and a SUM window over
  * the aggregated count table, so the rule cannot re-fire on its own
  * output. `spark.graft.globalrank.enabled=false` switches it off.
  */
class GlobalRankWindowRule extends Rule[LogicalPlan] {

  private def rankFamily(e: Expression): Boolean = e match {
    case _: RowNumber | _: Rank | _: PercentRank => true
    case NTile(Literal(_, IntegerType)) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.globalrank.enabled", "true").toBoolean) {
      return plan
    }
    val minBytes = BigInt(
      conf.getConfString("spark.graft.globalrank.minbytes",
        (8L * 1024 * 1024).toString).toLong)
    plan.transformUp {
      case w @ Window(wexprs, Seq(), orderSpec, child, _)
          if w.resolved && orderSpec.nonEmpty &&
            orderSpec.forall(_.deterministic) &&
            wexprs.forall {
              case Alias(WindowExpression(f, _), _) => rankFamily(f)
              case _ => false
            } &&
            child.stats.sizeInBytes >= minBytes =>
        rewrite(wexprs, orderSpec, child)
    }
  }

  private def rewrite(wexprs: Seq[NamedExpression], orderSpec: Seq[SortOrder],
      child: LogicalPlan): LogicalPlan = {
    val parts = conf.numShufflePartitions
    val repart = RepartitionByExpression(orderSpec, child, parts)
    val pid = Alias(SparkPartitionID(), "__gr_pid")()
    val projPid = Project(child.output :+ pid, repart)
    val pidAttr = pid.toAttribute
    val rowFrame =
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val localSpec = WindowSpecDefinition(Seq(pidAttr), orderSpec, rowFrame)
    val lrk = Alias(WindowExpression(RowNumber(), localSpec), "__gr_lrk")()
    val ltr = Alias(
      WindowExpression(Rank(orderSpec.map(_.child)), localSpec), "__gr_ltr")()
    // one pid-partitioned window computes both positional and
    // tie-aware local positions
    val localWin =
      Window(Seq(lrk, ltr), Seq(pidAttr), orderSpec, projPid, None)

    // stats branch over the SAME projPid subtree: per-pid counts,
    // prefix-summed offsets + grand total (≤ `parts` rows end to end)
    val cnt = Alias(Count(Literal(1)).toAggregateExpression(), "__gr_cnt")()
    val agg = Aggregate(Seq(pidAttr), Seq(pidAttr, cnt), projPid)
    val cntAttr = cnt.toAttribute
    val pidOrder = Seq(SortOrder(pidAttr, Ascending))
    val offSpec = WindowSpecDefinition(Nil, pidOrder,
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-1)))
    val allSpec = WindowSpecDefinition(Nil, pidOrder,
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing))
    val offRaw = Alias(
      WindowExpression(Sum(cntAttr).toAggregateExpression(), offSpec),
      "__gr_off_raw")()
    val nRaw = Alias(
      WindowExpression(Sum(cntAttr).toAggregateExpression(), allSpec),
      "__gr_n_raw")()
    val statsWin = Window(Seq(offRaw, nRaw), Nil, pidOrder, agg, None)
    // fresh output ids on the broadcast side: the two join children
    // share the projPid subtree, and Join requires disjoint outputs
    val pidR = Alias(pidAttr, "__gr_pid_r")()
    val off = Alias(
      Coalesce(Seq(offRaw.toAttribute, Literal(0L))), "__gr_off")()
    val nTot = Alias(nRaw.toAttribute, "__gr_n")()
    val statsProj = Project(Seq(pidR, off, nTot), statsWin)
    // hint carried on the Join itself: EliminateResolvedHint already
    // ran by the time optimizer extensions fire
    val joined = Join(localWin, statsProj, Inner,
      Some(EqualTo(pidAttr, pidR.toAttribute)),
      JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))

    // row_number/rank emit IntegerType; widen before the long offset
    val posG = Add(Cast(lrk.toAttribute, LongType), off.toAttribute)
    val tieG = Add(Cast(ltr.toAttribute, LongType), off.toAttribute)
    val nA = nTot.toAttribute
    def idiv(a: Expression, b: Expression): Expression = IntegralDivide(a, b)
    val outExprs: Seq[NamedExpression] = wexprs.map {
      case a @ Alias(WindowExpression(f, _), name) =>
        val replaced: Expression = f match {
          case _: RowNumber => Cast(posG, IntegerType)
          case _: Rank => Cast(tieG, IntegerType)
          case _: PercentRank =>
            If(LessThanOrEqual(nA, Literal(1L)), Literal(0.0d),
              Divide(Cast(Subtract(tieG, Literal(1L)), DoubleType),
                Cast(Subtract(nA, Literal(1L)), DoubleType)))
          case NTile(Literal(k, IntegerType)) =>
            // SQL-standard NTILE from (position, n): first n % k
            // buckets hold ceil(n/k) rows, the rest floor(n/k)
            val kL = Literal(k.asInstanceOf[Int].toLong)
            val q = idiv(nA, kL)
            val rem = Remainder(nA, kL)
            val big = Add(q, Literal(1L))
            val headRows = Multiply(big, rem)
            val inHead = LessThanOrEqual(posG, headRows)
            val headBucket = Add(idiv(Subtract(posG, Literal(1L)), big),
              Literal(1L))
            val tailBucket = Add(Add(rem,
              idiv(Subtract(Subtract(posG, Literal(1L)), headRows),
                Greatest(Seq(q, Literal(1L))))), Literal(1L))
            Cast(If(inHead, headBucket, tailBucket), IntegerType)
          case other =>
            throw new IllegalStateException(s"unexpected window fn $other")
        }
        Alias(replaced, name)(exprId = a.exprId)
    }
    Project(child.output ++ outExprs, joined)
  }
}
