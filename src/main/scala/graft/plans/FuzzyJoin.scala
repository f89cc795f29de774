package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Count
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, Join, JoinHint, LeafNode, LogicalPlan, Project, Repartition, SubqueryAlias, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, LongType, MapType, StringType}

/** Optimizer rule: rewrite `A JOIN B ON levenshtein(a, b) <= k`
  * (k ≤ 2, no equi-conjunct, inner join) into the FastSS
  * deletion-neighborhood equi-join of [[graft.operators.Dedup
  * .fuzzyJoinPairs]] — the second whole-operator extension beside
  * [[BinnedRangeJoinRule]] on the same ladder rung: a predicate the
  * stock planner can only run as BroadcastNestedLoopJoin with an
  * O(|A|·|B|) edit-distance evaluation becomes a hash join on shared
  * deletion variants ([[graft.functions.DeletionVariants]] planted as
  * the generator) with the ORIGINAL condition kept as residual — so a
  * user writing plain SQL entity resolution gets the linear plan
  * without knowing this library exists.
  *
  * Exact-multiset semantics: a qualifying row pair shares SEVERAL
  * deletion variants, so the variant join inflates multiplicity. The
  * rewrite therefore tags each input row with a
  * `monotonically_increasing_id` BEFORE the explode and collapses
  * the join output with a distinct over (lid, rid, output columns) —
  * duplicate INPUT rows keep their duplicate output pairs, while the
  * variant multiplicity collapses to exactly one row per qualifying
  * pair, like the original nested-loop join.
  *
  * Conservative by construction (mirrors [[BinnedRangeJoinRule]]):
  * fires only on resolved INNER joins, only when no equi-conjunct
  * already spans the sides (then the native hash join is linear
  * anyway), only for a deterministic `levenshtein` conjunct with a
  * literal bound ≤ `spark.graft.fuzzyjoin.maxdist` (default 2 — the
  * neighborhood is O(L^k) variants per row), only when every output
  * column is groupable without normalization (no MapType, and no
  * Float/Double — grouping canonicalizes -0.0/NaN), and the rewritten
  * join carries a cross-side equi-conjunct so the rule cannot re-fire
  * on its own output. `spark.graft.fuzzyjoin.enabled=false` switches
  * it off.
  *
  * Two multiset-restoring shapes, chosen per child (round-9 verdict
  * ask #8 lifted the shuffle-free restriction):
  *
  *  - **shuffle-free narrow children** ([[midSafe]]): tag rows with
  *    `monotonically_increasing_id` before the explode and distinct
  *    over (lid, rid, output) — no extra shuffle on either side, but
  *    the tags are retry-stable ONLY when each tagged partition
  *    recomputes the same rows in the same order;
  *  - **anything else** (joins, aggregates, repartitions upstream):
  *    DETERMINISTIC content counting — pre-aggregate each side to
  *    (distinct row, multiplicity), variant-join the distinct rows,
  *    collapse variant multiplicity with a distinct over the row
  *    contents, then re-expand each surviving pair
  *    `explode(sequence(1, lcnt·rcnt))` times. Output multiplicity is
  *    exactly the nested-loop join's countL(row)·countR(row), every
  *    operator is deterministic, so task retries downstream of any
  *    exchange replay identically — no localCheckpoint, no
  *    mid-optimizer materialization, pure plan. The per-side groupBy
  *    is the price; those children already carry a shuffle.
  *    `spark.graft.fuzzyjoin.shuffledchildren=false` restores the
  *    old decline-to-rewrite behavior.
  */
class FuzzyLevJoinRule extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Output columns the multiset-restoring Aggregate may group on:
    * MapType is not groupable at all, and Float/Double are excluded
    * because grouping NORMALIZES them (-0.0 → 0.0, NaN → canonical
    * NaN), so the rewrite could return different bits than the
    * un-rewritten nested-loop join. Joins carrying such columns fall
    * back to the stock plan. */
  private def groupable(dt: DataType): Boolean = dt match {
    case MapType(_, _, _) => false
    case FloatType | DoubleType => false
    case org.apache.spark.sql.types.ArrayType(et, _) => groupable(et)
    case org.apache.spark.sql.types.StructType(fields) =>
      fields.forall(f => groupable(f.dataType))
    case _ => true
  }

  /** MonotonicallyIncreasingID row tags are stable across task
    * retries only when the tagged partition recomputes the same rows
    * in the same order. That holds for shuffle-free narrow trees over
    * sources (file scans enumerate splits deterministically; narrow
    * deterministic operators preserve order) but NOT downstream of an
    * exchange, whose reduce-side fetch order varies across attempts —
    * there a retried map task could re-tag rows differently and the
    * distinct could gain or lose output pairs. The rule fires only
    * when both children pass this check; anything else keeps the
    * stock (slow but retry-safe) nested-loop plan. */
  private def midSafe(plan: LogicalPlan): Boolean = plan match {
    case _: LeafNode => true
    case p: Project => p.projectList.forall(_.deterministic) && midSafe(p.child)
    case f: Filter => f.condition.deterministic && midSafe(f.child)
    case g: Generate => g.generator.deterministic && midSafe(g.child)
    case s: SubqueryAlias => midSafe(s.child)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.fuzzyjoin.enabled", "true").toBoolean) {
      return plan
    }
    val maxDist =
      conf.getConfString("spark.graft.fuzzyjoin.maxdist", "2").toInt
    val shuffledOk = conf.getConfString(
      "spark.graft.fuzzyjoin.shuffledchildren", "true").toBoolean
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && j.output.forall(a => groupable(a.dataType)) &&
            (shuffledOk || (midSafe(left) && midSafe(right))) &&
            findLev(j, cond, maxDist).isDefined =>
        val (a, b, k) = findLev(j, cond, maxDist).get
        if (midSafe(left) && midSafe(right)) {
          // retry-stable tags: no extra shuffle, distinct restores the
          // nested-loop multiset exactly
          val lid = Alias(MonotonicallyIncreasingID(), "__graft_lid")()
          val rid = Alias(MonotonicallyIncreasingID(), "__graft_rid")()
          val newJoin = neighborhoodJoin(a, b, k,
            Project(left.output :+ lid, left),
            Project(right.output :+ rid, right), cond, hint)
          val groupCols: Seq[Attribute] =
            lid.toAttribute +: rid.toAttribute +: j.output
          Project(j.output, Aggregate(groupCols, groupCols, newJoin))
        } else {
          // shuffled children: deterministic content counting — tags
          // would not survive task retries past an exchange
          val lcnt = Alias(Count(Literal(1)).toAggregateExpression(),
            "__graft_lcnt")()
          val rcnt = Alias(Count(Literal(1)).toAggregateExpression(),
            "__graft_rcnt")()
          val newJoin = neighborhoodJoin(a, b, k,
            Aggregate(left.output, left.output :+ lcnt, left),
            Aggregate(right.output, right.output :+ rcnt, right), cond, hint)
          val groupCols: Seq[Attribute] =
            (j.output :+ lcnt.toAttribute) :+ rcnt.toAttribute
          val collapsed = Aggregate(groupCols, groupCols, newJoin)
          val copy =
            AttributeReference("__graft_copy", LongType, nullable = false)()
          // Sequence is TimeZoneAware: without an explicit zone it is
          // UNRESOLVED, and analysis (ResolveTimeZone) already ran
          val expand = Generate(
            Explode(Sequence(Literal(1L),
              Multiply(lcnt.toAttribute, rcnt.toAttribute), None,
              Some(conf.sessionLocalTimeZone))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(copy), child = collapsed)
          Project(j.output, expand)
        }
    }
  }

  /** The variant-blocking join both multiset-restoring shapes share.
    * `lChild`/`rChild` already carry their tag/count column; the
    * returned plan's output is `lChild.output ++ rChild.output`
    * (variant plumbing projected away), with `cond` — the original
    * levenshtein predicate — kept as residual in every branch.
    *
    * k ≤ 1: one equi-join on the deletion-variant string.
    *
    * k = 2: the deletion-count CHANNEL split of [[graft.operators
    * .Dedup.fuzzyJoinPairs]] (its completeness case analysis on the
    * edit script is law-pinned blocked ≡ brute in DedupSpec), planted
    * as a union of four joins over position-tagged pre-hashed
    * variants ([[graft.functions.DeletionVariantsTagged]]): the
    * (≤1,≤1), (≤1,2) and (2,≤1) channels join on the variant hash
    * alone, while the dominant (2,2) channel — needed ONLY for
    * 2-substitution pairs, whose witnesses delete the SAME two
    * positions from both sides — carries `pos` in its key, splitting
    * the "every row sharing a length-(L−2) subsequence" buckets into
    * position-aligned cells. Channel overlap (one pair found by
    * several channels) collapses in the caller's distinct, exactly
    * like variant multiplicity. The four branches re-reference the
    * same tagged-child subtrees — legal duplicate subplans, like a
    * self-union; the two hash-keyed probes of each side share one
    * exchange at execution (ReuseExchange). */
  private def neighborhoodJoin(a: Expression, b: Expression, k: Int,
      lChild0: LogicalPlan, rChild0: LogicalPlan, cond: Expression,
      hint: JoinHint): LogicalPlan = {
    // PARALLELIZE THE NEIGHBORHOOD (optimization guide §2.5 "input
    // skew", measured round 13): the fuzzy gates' inputs are one small
    // parquet file → a 1-partition scan, and the explode amplifies
    // each row ~O(L^k) INSIDE that single task — the event log showed
    // the entire variant generation + hash probe + levenshtein verify
    // of q254 serialized into two 1-task stages (7.0 s and 8.9 s on a
    // 32-core host). Statistics cannot see the amplification (Spark
    // estimates Generate output at child size), so redistribute
    // explicitly: a round-robin Repartition of the PRE-explode rows —
    // tag/count columns already attached below it, so monotonic ids
    // stay retry-stable (assigned under the exchange on the
    // deterministic narrow subtree) — spreads the variant work over
    // the session's shuffle parallelism. The shuffled rows are the
    // small un-exploded side (bytes ∝ input, not neighborhood);
    // REPARTITION_BY_NUM is exempt from AQE coalescing, so the
    // parallelism survives tiny byte sizes. Round 14 (r13 verdict
    // item 2): SCALE-CONDITIONAL — a child whose size statistics show
    // it already scans at ≥ the session parallelism keeps its own
    // distribution (an unconditional fixed-count Repartition would
    // COALESCE a 10k-partition 100 TB scan down to the session count,
    // serializing the amplification this exchange exists to spread).
    val np = conf.numShufflePartitions
    def spread(child: LogicalPlan): LogicalPlan =
      if (graft.operators.Spread.underPartitioned(child, conf))
        Repartition(np, shuffle = true, child)
      else child
    val lChild = spread(lChild0)
    val rChild = spread(rChild0)
    if (k <= 1) {
      val varL =
        AttributeReference("__graft_var_l", StringType, nullable = false)()
      val varR =
        AttributeReference("__graft_var_r", StringType, nullable = false)()
      def gen(e: Expression, out: Attribute, child: LogicalPlan) =
        Generate(Explode(graft.functions.DeletionVariants(e, k)),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(out), child = child)
      Join(gen(a, varL, lChild), gen(b, varR, rChild),
        Inner, Some(And(EqualTo(varL, varR), cond)), hint)
    } else {
      val tType = graft.functions.DeletionVariantsTagged.outType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      def taggedGen(e: Expression, child: LogicalPlan, side: String)
          : (LogicalPlan, Attribute, Attribute, Attribute) = {
        val t = AttributeReference(s"__graft_t_$side", tType, nullable = false)()
        val g = Generate(
          Explode(graft.functions.DeletionVariantsTagged(e, 2)),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(t), child = child)
        val h = Alias(GetStructField(t, 0, Some("h")), s"__graft_h_$side")()
        val nd = Alias(GetStructField(t, 1, Some("nd")), s"__graft_nd_$side")()
        val pos = Alias(GetStructField(t, 2, Some("pos")), s"__graft_pos_$side")()
        (Project(child.output ++ Seq(h, nd, pos), g),
          h.toAttribute, nd.toAttribute, pos.toAttribute)
      }
      val (tl, hl, ndl, posl) = taggedGen(a, lChild, "l")
      val (tr, hr, ndr, posr) = taggedGen(b, rChild, "r")
      def small(p: LogicalPlan, nd: Attribute) =
        Filter(LessThanOrEqual(nd, Literal(1)), p)
      def two(p: LogicalPlan, nd: Attribute) =
        Filter(EqualTo(nd, Literal(2)), p)
      val hEq = EqualTo(hl, hr)
      val want: Seq[Attribute] = lChild.output ++ rChild.output
      val branches = Seq(
        Join(small(tl, ndl), small(tr, ndr), Inner, Some(And(hEq, cond)), hint),
        Join(small(tl, ndl), two(tr, ndr), Inner, Some(And(hEq, cond)), hint),
        Join(two(tl, ndl), small(tr, ndr), Inner, Some(And(hEq, cond)), hint),
        Join(two(tl, ndl), two(tr, ndr), Inner,
          Some(And(And(hEq, EqualTo(posl, posr)), cond)), hint))
      Union(branches.map(br => Project(want, br)))
    }
  }

  /** Detect a `levenshtein(a, b) <= k` conjunct (either written
    * orientation, `<` normalized to `<=`): a's references wholly on
    * one side, b's wholly on the other, both deterministic, bound a
    * non-negative integer literal ≤ maxDist — and NO equi-conjunct
    * across the sides. Returns (leftExpr, rightExpr, k) with
    * leftExpr on the join's left side. */
  private def findLev(j: Join, cond: Expression,
      maxDist: Int): Option[(Expression, Expression, Int)] = {
    val cs = conjuncts(cond)
    val hasCrossEqui = cs.exists {
      case EqualTo(a, b) => crossSides(j, a, b)
      case EqualNullSafe(a, b) => crossSides(j, a, b)
      case _ => false
    }
    if (hasCrossEqui) return None
    val bounded = cs.collectFirst(Function.unlift {
      case LessThanOrEqual(lev: Levenshtein, Literal(k: Int, _)) =>
        Some((lev, k))
      case GreaterThanOrEqual(Literal(k: Int, _), lev: Levenshtein) =>
        Some((lev, k))
      case LessThan(lev: Levenshtein, Literal(k: Int, _)) =>
        Some((lev, k - 1))
      case GreaterThan(Literal(k: Int, _), lev: Levenshtein) =>
        Some((lev, k - 1))
      case _ => None
    })
    bounded.flatMap { case (lev, k) =>
      if (k < 0 || k > maxDist || k > 2 || lev.threshold.isDefined) None
      else {
        val (x, y) = (lev.left, lev.right)
        if (!x.deterministic || !y.deterministic) None
        else (sideOf(j, x), sideOf(j, y)) match {
          case (Some(true), Some(false)) => Some((x, y, math.max(k, 1)))
          case (Some(false), Some(true)) => Some((y, x, math.max(k, 1)))
          case _ => None
        }
      }
    }
  }

  private def crossSides(j: Join, a: Expression, b: Expression): Boolean = {
    val sa = sideOf(j, a)
    val sb = sideOf(j, b)
    sa.isDefined && sb.isDefined && sa != sb
  }

  private def sideOf(j: Join, e: Expression): Option[Boolean] =
    if (e.references.isEmpty) None
    else if (e.references.subsetOf(j.left.outputSet)) Some(true)
    else if (e.references.subsetOf(j.right.outputSet)) Some(false)
    else None
}
