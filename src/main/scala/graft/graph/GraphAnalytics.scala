package graft.graph

import org.apache.spark.graphx.{Edge => GXEdge, Graph => GXGraph}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph analytics (SURVEY §2.10).
  *
  * Two execution tiers, mirroring the reference's split between
  * whole-network igraph calls and per-sample subgraph loops:
  *
  *  - **Global graph** → GraphX (`pageRank`, `connectedComponents`,
  *    `labelPropagation`, degrees): one distributed graph, Pregel
  *    under the hood. Right tier when the graph itself is huge.
  *  - **Per-group subgraphs** → `perGroupMetrics`/`perGroupEigen`:
  *    `groupByKey(group).mapGroups` feeding [[LocalGraph]] kernels.
  *    One shuffle on the group key, then thousands of small graphs
  *    execute in parallel across executors — the 100 TB-scale path
  *    for "compute centrality per sample" (reference
  *    bin/interpersonaldiversity.R:82-115) where groups are small but
  *    group count is massive.
  *
  * β-diversity ops (G17/G18) are pure relational plans — no graph
  * materialization at all.
  */
object GraphAnalytics {

  /** PropertyGraph → GraphX graph with a double edge weight. */
  def toGraphX(g: PropertyGraph, weightCol: String,
      partitions: Int = 0): GXGraph[String, Double] = {
    val vrdd0 = g.nodes.select("id", "name").rdd
      .map(r => (r.getLong(0), r.getString(1)))
    val erdd0 = g.edges.select(col("src"), col("dst"), col(weightCol).cast("double")).rdd
      .map(r => GXEdge(r.getLong(0), r.getLong(1), r.getDouble(2)))
    val (vrdd, erdd) =
      if (partitions > 0) (vrdd0.coalesce(partitions), erdd0.coalesce(partitions))
      else (vrdd0, erdd0)
    GXGraph(vrdd, erdd)
  }

  /** GraphX partition sizing: one task per ~100k edges, clamped to
    * [4, defaultParallelism]. Iterative GraphX jobs run several stages
    * PER superstep, so per-task overhead multiplies by ~3× iteration
    * count; inheriting the SQL-side partition count over-fragments
    * small graphs (measured on the sf0.1 graph: PageRank+CC core
    * 9.0 s at 32 partitions → 4.8 s at 8). The edge-count scaling
    * restores full spread on real volumes — the same size-to-data
    * rule as the streaming state stores. */
  private[graft] def gxPartitions(spark: SparkSession, nEdges: Long): Int =
    math.max(4, math.min(spark.sparkContext.defaultParallelism,
      (nEdges / 100000L).toInt))

  /** Shuffle sizing for the exact-scaled superstep kernels: one task
    * per ~64k state rows, clamped to [4, defaultParallelism] — the
    * same size-to-data rule as [[gxPartitions]] and the streaming
    * state stores. Rationale: these kernels run ~3 exchanges per
    * superstep × 5-10 supersteps, so per-task scheduling latency
    * multiplies by ~30; at the session default (cores) a 2.7k-row
    * state table schedules ~1000 tasks of pure overhead, which is
    * exactly the surface a co-tenant load amplifies 10-20× (the
    * round-6 driver bench measured q110 at 57.9 s under contention vs
    * 2.4 s idle). Sizing to volume keeps small graphs at 4 tasks per
    * exchange while a real 100 TB edge table scales the count back to
    * full cluster spread. */
  private[graft] def superstepPartitions(spark: SparkSession, rows: Long): Int =
    math.max(4, math.min(spark.sparkContext.defaultParallelism,
      (rows / 65536L).toInt))

  /** Run `body` with `spark.sql.shuffle.partitions` scoped to n — the
    * batch twin of StreamOps.withStatePartitions. Only jobs EXECUTED
    * inside the scope see n (the conf is read at planning time), which
    * is why the superstep kernels materialize every iterate eagerly
    * inside the scope instead of returning one deep lazy plan. */
  private[graft] def withShufflePartitions[A](spark: SparkSession, n: Int)(body: => A): A = {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  /** [[withShufflePartitions]] with ADAPTIVE EXECUTION scoped OFF —
    * the superstep-kernel execution scope. Rationale (guide §1.2/§2):
    * these kernels size every exchange explicitly from measured data
    * volume ([[superstepPartitions]]), so AQE's partition coalescing
    * has nothing to decide — but its stage-by-stage re-optimization
    * turns each materialization into one JOB PER EXCHANGE (the
    * round-14 listener trace: 14-28 jobs per gate for ~60 byte-tiny
    * tasks), and a ~30-superstep kernel multiplies that scheduling
    * fixed cost. With AQE off the whole chained recurrence runs as ONE
    * job whose stages the DAG scheduler pipelines. Scale note: this is
    * scoped to the kernels, not the session — their join sides are
    * explicitly co-partitioned and message skew is absorbed by partial
    * (map-side) aggregation, the two things AQE would otherwise
    * handle. */
  private[graft] def withSuperstepScope[A](spark: SparkSession, n: Int)(body: => A): A = {
    val oldA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try withShufflePartitions(spark, n)(body)
    finally spark.conf.set("spark.sql.adaptive.enabled", oldA)
  }

  /** Eagerly materialize a superstep operand (localCheckpoint: cuts
    * lineage AND executes now, so the kernel's conf scope applies) and
    * return it with its row count — the count is a cheap second pass
    * over the checkpointed partitions, and sizes the kernel's shuffle
    * partitions. Checkpointed iterates are freed by the context
    * cleaner when unreferenced; at gate scale each holds a few
    * thousand rows. */
  private def materialized(df: DataFrame): (DataFrame, Long) = {
    val c = df.localCheckpoint(true)
    (c, c.count())
  }

  /** Chain `iters` LAZY superstep transforms and materialize the whole
    * chain with ONE eager localCheckpoint — the round-14 action-count
    * fix (guide §5: the driver should do almost no work; the round-13
    * event log showed every exact-scaled kernel paying one full
    * QueryExecution (analyze/optimize/plan) + job-launch round-trip
    * PER superstep over byte-tiny states, ~0.25 s of driver-side fixed
    * cost per iteration on a 32-core host). Contract: `step` must
    * consume its iterate exactly ONCE and otherwise reference only
    * materialized (checkpointed) leaves, so the lazy plan grows
    * LINEARLY in `iters` (a kernel whose recurrence reads the iterate
    * twice — kcore's two-endpoint membership, HITS normalization —
    * keeps its per-round materialization instead). The final
    * checkpoint runs inside the caller's conf scope, so the
    * superstep partition sizing still applies to every exchange. */
  private def chainSupersteps(init: DataFrame, iters: Int)(
      step: DataFrame => DataFrame): DataFrame = {
    var cur = init
    var i = 0
    while (i < iters) { cur = step(cur); i += 1 }
    cur.localCheckpoint(true)
  }

  /** Weighted PageRank on the symmetrized graph (reference
    * bin/compareTwins.R:93 page_rank(directed=F)); returns (id, pagerank).
    * Fixed iteration count (staticPageRank): predictable cost at scale —
    * tolerance-driven convergence on a big graph is an unbounded number
    * of full-graph passes. */
  def pageRank(spark: SparkSession, g: PropertyGraph, weightCol: String,
      iters: Int = 10): DataFrame = {
    val sym = PropertyGraph(g.nodes,
      g.edges.unionByName(g.edges
        .withColumn("tmp", col("src")).withColumn("src", col("dst"))
        .withColumn("dst", col("tmp")).drop("tmp")))
    val ranks = toGraphX(sym, weightCol,
      gxPartitions(spark, sym.edges.count())).staticPageRank(iters).vertices
    spark.createDataFrame(ranks.map(t => Row(t._1, t._2)),
      new org.apache.spark.sql.types.StructType()
        .add("id", "long").add("pagerank", "double"))
  }

  /** PageRank + weak components off ONE cached GraphX graph — the two
    * jobs share the materialized vertex/edge RDDs instead of
    * rebuilding the graph per metric. Returns (id, pagerank, component). */
  def pageRankAndComponents(spark: SparkSession, g: PropertyGraph,
      weightCol: String, iters: Int = 10): DataFrame = {
    val sym = PropertyGraph(g.nodes,
      g.edges.unionByName(g.edges
        .withColumn("tmp", col("src")).withColumn("src", col("dst"))
        .withColumn("dst", col("tmp")).drop("tmp")))
    val gx = toGraphX(sym, weightCol,
      gxPartitions(spark, sym.edges.count())).cache()
    val pr = gx.staticPageRank(iters).vertices
    val cc = gx.connectedComponents().vertices
    // materialize the (vertex-sized) result while the graph is cached,
    // then free the graph: without this, every call leaks a cached
    // edge+vertex RDD pair and repeated use degrades under heap
    // pressure (measured: 9.7 s → 36 s on the third call)
    val joined = pr.join(cc).map { case (id, (rank, comp)) => Row(id, rank, comp) }
      .cache()
    joined.count()
    gx.unpersist(blocking = false)
    spark.createDataFrame(joined,
      new org.apache.spark.sql.types.StructType()
        .add("id", "long").add("pagerank", "double").add("component", "long"))
  }

  /** PageRank + weak components as PURE DataFrame iterations — the
    * production form of [[pageRankAndComponents]] (GraphX stays the
    * law twin; PageRankParitySpec pins component identity and rank
    * agreement). Reproduces GraphX `staticPageRank` semantics on the
    * symmetrized multigraph exactly: r₀ = 1, r' = 0.15 + 0.85·Σ
    * incoming r/outdeg (edge MULTIPLICITY counts in the out-degree,
    * dangling mass dropped — none exists on a symmetric graph), 10
    * fixed supersteps. Components are min-vertex-id labels (GraphX's
    * own convention) via min-label propagation with POINTER JUMPING
    * (`l ← l∘l` each round), so rounds ∝ log(diameter), not
    * diameter; convergence is detected, not assumed. Why this tier:
    * each superstep is one co-partitioned join + one partial
    * aggregation under Catalyst/AQE and whole-stage codegen, where
    * GraphX materializes fresh vertex/edge RDD pairs per superstep —
    * measured 9.2 s → DataFrame ~3 s on the same sf0.1 graph, and
    * the gap widens with scale (the RDD path neither prunes columns
    * nor codegens). Returns (id, pagerank, component) for every
    * node, isolated nodes included (rank 0.15·Σ0.85ⁱ partial — the
    * same value GraphX assigns). */
  def pageRankAndComponentsDF(spark: SparkSession, g: PropertyGraph,
      iters: Int = 10): DataFrame = {
    val dir = g.edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    // edge MULTISET (parallel edges count in the out-degree — GraphX
    // keeps them too); the symmetrized table is the superstep operand,
    // checkpointed ONCE, hash-partitioned AND SORTED on the join key:
    // localCheckpoint preserves both, so each superstep's sort-merge
    // join re-sorts only the vertex-sized iterate, never the edges
    // (unsorted checkpoints re-sorted 2.4M rows per superstep —
    // measured 28 s → 5 s for the 10-step loop at sf0.1)
    val nE = 2L * dir.count()
    // ~128k edge rows per task, not the 64k generic superstep rule:
    // this kernel runs 2 edge-sized joins + an agg per superstep ×
    // (10 PR + ~4 CC) rounds, so per-task scheduling overhead
    // multiplies ~40×; a same-JVM sweep at sf0.1 (2.4M sym edges)
    // measured 13.0 s / 8.8 s / 10.7 s at 8 / 16 / 32 partitions —
    // the coarser grain wins locally while a real cluster still caps
    // at full parallelism
    withSuperstepScope(spark, math.max(4,
        math.min(spark.sparkContext.defaultParallelism, (nE / 131072L).toInt))) {
      val sym = dir
        .unionByName(dir.select(col("dst").as("src"), col("src").as("dst")))
      // per-edge transition weight, precomputed ONCE like GraphX's
      // mapTriplets(1.0 / outdeg): msg = r_src · w — the single
      // long-lived superstep operand, serving BOTH kernels
      val w = sym
        .join(sym.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
        .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w"))
        .repartition(col("src")).sortWithinPartitions("src")
        .localCheckpoint(true)
      val v = g.nodes.select(col("id").cast("long").as("id"))
        .unionByName(w.select(col("src").as("id"))).distinct()
        .repartition(col("id")).sortWithinPartitions("id")
        .localCheckpoint(true)
      // FUSED supersteps: rank and component label ride ONE state row
      // and ONE message aggregation (sum for rank, min for label), so
      // the edge table is scanned once per round for both kernels.
      // Labels converge by min-propagation + pointer jumping (l ← l∘l,
      // label reach doubles per round → rounds ∝ log diameter, checked
      // not assumed); once converged, remaining rank supersteps run
      // the cheap single-materialization form. Every frame that feeds
      // a self-join materializes first (an un-checkpointed operand
      // would execute its plan on both sides).
      var state = v.select(col("id"), lit(1.0).as("pr"), col("id").as("comp"))
        .localCheckpoint(true)
      var ccDone = false
      var rounds = 0
      def ccRound(withRank: Boolean): Unit = {
        rounds += 1
        require(rounds <= 64, "component labeling did not converge")
        val msgs = w.join(state.select(col("id").as("src"), col("pr"),
            col("comp")), Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(sum(col("pr") * col("w")).as("m"), min("comp").as("nmin"))
        val s1 = state.join(msgs, Seq("id"), "left_outer")
          .select(col("id"),
            (if (withRank)
              lit(0.15) + lit(0.85) * coalesce(col("m"), lit(0.0))
            else col("pr")).as("pr"),
            least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"),
            col("comp").as("old"))
          .localCheckpoint(true)
        // the convergence statistic is collected DURING the pointer-
        // jump checkpoint action (Observation) instead of a third
        // per-round job scanning s2 again — round-14 action-count fix
        val obs = org.apache.spark.sql.Observation()
        val s2 = s1.join(s1.select(col("id").as("c2"), col("comp").as("comp2")),
            col("comp") === col("c2"), "left_outer")
          .select(col("id"), col("pr"),
            coalesce(col("comp2"), col("comp")).as("comp"), col("old"))
          .observe(obs, sum(when(col("comp") =!= col("old"), 1L)
            .otherwise(0L)).as("changed"))
          .localCheckpoint(true)
        ccDone = obs.get.getOrElse("changed", null) match {
          case n: java.lang.Long => n.longValue() == 0L
          case _ => true // empty state: nothing left to change
        }
        state = s2.select("id", "pr", "comp")
      }
      var step = 0
      while (step < iters) {
        if (!ccDone) { ccRound(withRank = true); step += 1 }
        else {
          // labels settled: ALL remaining rank supersteps as one lazy
          // linear chain materialized by a single action — the iterate
          // carries only (id, pr) and is consumed once per step (the
          // old two-deep batching re-joined the iterate with itself,
          // doubling the plan per step); the converged component label
          // re-attaches once at the end from the checkpointed state
          val compT = state.select(col("id"), col("comp"))
          var pr = state.select(col("id"), col("pr"))
          (step until iters).foreach { _ =>
            val msgs = w.join(pr.select(col("id").as("src"), col("pr")),
                Seq("src"))
              .groupBy(col("dst").as("id"))
              .agg(sum(col("pr") * col("w")).as("m"))
            pr = v.join(msgs, Seq("id"), "left_outer")
              .select(col("id"),
                (lit(0.15) + lit(0.85) * coalesce(col("m"), lit(0.0))).as("pr"))
          }
          state = pr.join(compT, Seq("id")).select("id", "pr", "comp")
            .localCheckpoint(true)
          step = iters
        }
      }
      // a deeper-than-iters graph finishes labeling rank-frozen
      while (!ccDone) ccRound(withRank = false)
      state.select(col("id"), col("pr").as("pagerank"),
        col("comp").as("component"))
    }
  }

  /** Exact-scaled static PageRank as pure DataFrame iterations — the
    * driver-oracle-able form of [[pageRank]] (G12). Ranks live in
    * scaled-BIGINT units (1e6 = rank 1.0); each per-edge contribution
    * `⌊0.85 · pr / outdeg + 0.5⌋` rounds to an integer BEFORE the sum
    * (floor(x+0.5), pure IEEE ops — `round` on doubles differs between
    * engines: Spark goes through decimal-string HALF_UP, DuckDB uses C
    * round, and they disagree on epsilon-below-half doubles),
    * so the aggregation is order-independent and any engine reproduces
    * it bit-for-bit (the ExactNum idiom). Dangling-node mass is
    * dropped (documented semantics, matching the oracle). One
    * shuffle join + one aggregation per iteration — the same
    * per-superstep cost shape as Pregel, with Catalyst/AQE planning
    * each step; edges should be pre-persisted (each iteration reads
    * them once for the join). */
  def pageRankExactScaled(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val (e0, nE) = materialized(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct())
    withSuperstepScope(spark, superstepPartitions(spark, nE)) {
      // co-partition the per-step join operand ONCE by its key so each
      // superstep re-shuffles only the rank iterate, not the edges —
      // and attach the LOOP-INVARIANT out-degree to the edge row here
      // (was one extra join per superstep)
      val e = e0.join(
          e0.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), Seq("src"))
        .repartition(col("src")).localCheckpoint(true)
      val v = e.select(col("src").as("id"))
        .unionByName(e.select(col("dst").as("id"))).distinct()
        .repartition(col("id")).localCheckpoint(true)
      // the iterate is consumed once per step over checkpointed leaves,
      // so the whole 10-step recurrence runs as ONE action
      val r = chainSupersteps(
          v.select(col("id"), lit(1000000L).as("pr")), iters) { r =>
        val msgs = e
          .join(r.select(col("id").as("src"), col("pr")), Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(sum(floor(lit(0.85) * col("pr") / col("outdeg") + lit(0.5))).as("m"))
        v.join(msgs, Seq("id"), "left_outer")
          .select(col("id"), (lit(150000L) + coalesce(col("m"), lit(0L))).as("pr"))
      }
      r.select(col("id"), col("pr").as("pr_scaled"))
    }
  }

  /** Weighted exact-scaled static PageRank on the SYMMETRIZED graph —
    * the reference's `page_rank(directed=F)` semantic
    * (bin/compareTwins.R:93) in driver-oracle-able form. Same
    * contract as [[pageRankExactScaled]] (scaled-BIGINT ranks,
    * per-edge `⌊0.85·r·w / strength + 0.5⌋` before the sum ⇒
    * order-independent ⇒ engine-independent), with integer edge
    * weights and out-strength normalization. */
  def pageRankWeightedExactScaled(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("weight").cast("long").as("w"))
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))
    val (symRaw, nE) = materialized(e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .groupBy("src", "dst").agg(sum(col("w")).as("w")))
    withSuperstepScope(spark, superstepPartitions(spark, nE)) {
      // loop-invariant out-strength rides the edge row (was one extra
      // join per superstep); iterate consumed once per step → the full
      // recurrence materializes as ONE action (see chainSupersteps)
      val sym = symRaw.join(
          symRaw.groupBy(col("src")).agg(sum(col("w")).as("s")), Seq("src"))
        .repartition(col("src")).localCheckpoint(true)
      val v = sym.select(col("src").as("id")).distinct()
        .repartition(col("id")).localCheckpoint(true)
      val r = chainSupersteps(
          v.select(col("id"), lit(1000000L).as("pr")), iters) { r =>
        val msgs = sym
          .join(r.select(col("id").as("src"), col("pr")), Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(sum(floor(lit(0.85) * col("pr") * col("w") / col("s") + lit(0.5))).as("m"))
        v.join(msgs, Seq("id"), "left_outer")
          .select(col("id"), (lit(150000L) + coalesce(col("m"), lit(0L))).as("pr"))
      }
      r.select(col("id"), col("pr").as("pr_scaled"))
    }
  }

  /** Exact-scaled power iteration for per-group eigencentrality — the
    * driver-oracle-able companion of the LocalGraph eigen kernel (G6).
    * Works on the symmetrized unweighted group graphs: v₀ = 1e6 for
    * every node; each step sums neighbor scores (exact BIGINTs) and
    * max-normalizes with one rounded scaled division per node,
    * `⌊s·1e6 / max(s) + 0.5⌋` — both the sum and the max are
    * order-independent integers, so every engine reproduces the
    * trajectory bit-for-bit. Fixed step count: predictable cost at
    * scale, same rationale as static PageRank. One shuffle join + two
    * aggregations per step, all keyed by (group, node). */
  def eigenExactScaled(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("group").as("grp"),
      col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
    val (symRaw, nRows) = materialized(
      e.unionByName(e.select(col("grp"), col("b").as("a"), col("a").as("b")))
        .distinct())
    withSuperstepScope(spark, superstepPartitions(spark, nRows)) {
      // co-partition the edge table by the per-step join key once
      val sym = symRaw.repartition(col("grp"), col("b")).localCheckpoint(true)
      // the group max comes from a WINDOW over the neighbor-sum table,
      // not a self-join: one pass instead of consuming the sum twice —
      // which also keeps the iterate single-consumption, so the whole
      // recurrence materializes as ONE action (see chainSupersteps)
      val byGroup = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      val v = chainSupersteps(
          sym.select(col("grp"), col("a").as("node")).distinct()
            .select(col("grp"), col("node"), lit(1000000L).as("v")), iters) { v =>
        sym.join(v.select(col("grp"), col("node").as("b"), col("v")), Seq("grp", "b"))
          .groupBy(col("grp"), col("a").as("node"))
          .agg(sum(col("v")).as("s"))
          .withColumn("mx", max(col("s")).over(byGroup))
          .select(col("grp"), col("node"),
            floor(col("s") * lit(1000000.0) / col("mx") + lit(0.5)).as("v"))
      }
      v.select(col("grp"), col("node"), col("v").as("eigen_scaled"))
    }
  }

  /** WEIGHTED [[eigenExactScaled]] — the production per-group eigen
    * kernel ([[perGroupEigen]], reference eigen_centrality with edge
    * weights) iterates weighted neighbor sums; this is its
    * oracle-able form. Integer edge weights keep Σ w·v exact; the
    * max-normalization stays one rounded scaled division per node per
    * step. Weights symmetrize by summing both directions, matching
    * igraph's undirected view of a weighted multigraph. */
  def eigenWeightedExactScaled(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val e0 = edges.select(col("group").as("grp"),
      col("src").cast("long").as("a"), col("dst").cast("long").as("b"),
      col("weight").cast("long").as("w"))
    val (symRaw, nRows) = materialized(e0.unionByName(
        e0.select(col("grp"), col("b").as("a"), col("a").as("b"), col("w")))
      .groupBy("grp", "a", "b").agg(sum(col("w")).as("w")))
    withSuperstepScope(spark, superstepPartitions(spark, nRows)) {
      val sym = symRaw.repartition(col("grp"), col("b")).localCheckpoint(true)
      val byGroup = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      // single-consumption iterate → ONE action for the whole chain
      val v = chainSupersteps(
          sym.select(col("grp"), col("a").as("node")).distinct()
            .select(col("grp"), col("node"), lit(1000000L).as("v")), iters) { v =>
        sym.join(v.select(col("grp"), col("node").as("b"), col("v")), Seq("grp", "b"))
          .groupBy(col("grp"), col("a").as("node"))
          .agg(sum(col("w") * col("v")).as("s"))
          .withColumn("mx", max(col("s")).over(byGroup))
          .select(col("grp"), col("node"),
            floor(col("s") * lit(1000000.0) / col("mx") + lit(0.5)).as("v"))
      }
      v.select(col("grp"), col("node"), col("v").as("eigen_scaled"))
    }
  }

  /** Distributed single-source shortest paths per group — Bellman-Ford
    * min-plus supersteps on the symmetrized weighted graph (source =
    * each group's min node id). The Pregel SSSP shape: each step joins
    * the frontier with the edge list and takes a min — integer
    * weights keep every distance exact, and min is order-independent,
    * so an external oracle replays the trajectory. `iters` bounds the
    * hop count (paths longer than `iters` hops stay at their best
    * bound — callers size it to the expected diameter); unreached
    * nodes are absent from the output. This is the whole-graph-scale
    * companion of the task-local Dijkstra kernel (G4 weighted): one
    * shuffle join + one min-agg per step. */
  def ssspExactScaled(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val e0 = edges.select(col("group").as("grp"),
      col("src").cast("long").as("a"), col("dst").cast("long").as("b"),
      col("weight").cast("long").as("w"))
    // weight-0 self-loops carry each node's current bound through the
    // relax join, so `dist` is consumed ONCE per step — the naive
    // "dist ∪ relax(dist)" form reads it twice per superstep. Same
    // trick in the oracle.
    val sym = e0.unionByName(
        e0.select(col("grp"), col("b").as("a"), col("a").as("b"), col("w")))
      .groupBy("grp", "a", "b").agg(min(col("w")).as("w"))
    val (hopRaw, nRows) = materialized(sym.unionByName(
      sym.select(col("grp"), col("a")).distinct()
        .select(col("grp"), col("a"), col("a").as("b"), lit(0L).as("w"))))
    withSuperstepScope(spark, superstepPartitions(spark, nRows)) {
      val hop = hopRaw.repartition(col("grp"), col("a")).localCheckpoint(true)
      // single-consumption iterate → ONE action for the whole chain
      val dist = chainSupersteps(
          hop.where(col("w") === 0L).groupBy(col("grp"))
            .agg(min(col("a")).as("node"))
            .select(col("grp"), col("node"), lit(0L).as("dist")), iters) { dist =>
        hop
          .join(dist.select(col("grp"), col("node").as("a"), col("dist")), Seq("grp", "a"))
          .groupBy(col("grp"), col("b").as("node"))
          .agg(min(col("dist") + col("w")).as("dist"))
      }
      dist.select(col("grp"), col("node"), col("dist"))
    }
  }

  /** K-core peeling per group (beyond-reference): nodes surviving
    * `iters` rounds of "drop every node with fewer than k neighbors
    * still standing", with their within-core degree. Pure integer
    * set/degree arithmetic — both engines run the same fixed peel
    * count, so the oracle replays it exactly (a fixpoint loop would
    * need data-dependent iteration; fixed rounds bound cost at scale
    * the same way the static supersteps do). Each round recomputes
    * degrees from the ORIGINAL edge list restricted to survivors: two
    * semi-joins + one agg — membership is consumed twice per round,
    * so keep `iters` small (plan size grows 2^iters; 4 rounds
    * suffices for per-sample graphs). */
  def kcore(edges: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("group").as("grp"),
      col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
    val (symRaw, nRows) = materialized(
      e.unionByName(e.select(col("grp"), col("b").as("a"), col("a").as("b")))
        .distinct())
    withSuperstepScope(spark, superstepPartitions(spark, nRows)) {
      val sym = symRaw.repartition(col("grp"), col("a")).localCheckpoint(true)
      var keep = sym.select(col("grp"), col("a").as("node")).distinct()
      var deg: DataFrame = null
      (0 until iters).foreach { _ =>
        // membership is consumed twice per round (both endpoints must
        // survive), so truncate its lineage each round — the standard
        // iterative-algorithm checkpoint; it also executes the round
        // inside this kernel's partition scope
        val kept = keep.localCheckpoint(true)
        deg = sym
          .join(kept.select(col("grp"), col("node").as("a")), Seq("grp", "a"))
          .join(kept.select(col("grp"), col("node").as("b")), Seq("grp", "b"))
          .groupBy(col("grp"), col("a").as("node"))
          .agg(count(lit(1)).as("deg"))
        keep = deg.where(col("deg") >= k).select("grp", "node")
      }
      deg.where(col("deg") >= k).select(col("grp"), col("node"), col("deg"))
        .localCheckpoint(true)
    }
  }

  /** Deterministic synchronous label propagation per group (G14/G15
    * family — the distributed community detector; reference uses
    * igraph community kernels, bin/CompareNetworkGroups.R:67-68).
    * Every node starts labeled with its own id; each superstep it
    * adopts the most frequent label among its neighbors, ties broken
    * by the smallest label. Max-count-then-min-label is a total order
    * on (count, label), so unlike GraphX's hashmap-iteration
    * tie-break the trajectory is engine-reproducible — an external
    * oracle replays it as grouped counts + row_number. Fixed `iters`
    * bounds cost (synchronous LPA may oscillate on bipartite graphs;
    * a fixed step count makes that a deterministic snapshot, not a
    * liveness hazard). Per step: one shuffle join on the label table
    * (consumed once — linear plan growth) + two aggs, all keyed by
    * (group, node). */
  def lpaExactScaled(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val e0 = edges.select(col("group").as("grp"),
      col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
    val (symRaw, nRows) = materialized(e0.unionByName(
      e0.select(col("grp"), col("b").as("a"), col("a").as("b"))).distinct())
    withSuperstepScope(spark, superstepPartitions(spark, nRows)) {
      val sym = symRaw.repartition(col("grp"), col("b")).localCheckpoint(true)
      // single-consumption iterate → ONE action for the whole chain
      val lab = chainSupersteps(
          sym.select(col("grp"), col("a").as("node")).distinct()
            .select(col("grp"), col("node"), col("node").as("lab")), iters) { lab =>
        sym
          .join(lab.select(col("grp"), col("node").as("b"), col("lab")), Seq("grp", "b"))
          .groupBy(col("grp"), col("a"), col("lab"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("grp"), col("a").as("node"))
          // argmax with min-label tie-break as one order-independent agg:
          // max over (count, -label) structs, then negate back
          .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
          .select(col("grp"), col("node"), (-col("m.nl")).as("lab"))
      }
      lab.select(col("grp"), col("node"), col("lab").as("community"))
    }
  }

  /** Newman modularity of the [[lpaExactScaled]] community assignment,
    * per group — the quality score the reference's igraph workflow
    * reads off its community kernels (modularity() over
    * cluster_walktrap etc., bin/CompareNetworkGroups.R). Exact
    * integer arithmetic to the last step: with m2 = |sym| = 2m and
    * per-community sym-intra edge count I_c and degree mass D_c,
    * Q = Σ_c [L_c/m − (D_c/2m)²] = (Σ_c m2·I_c − D_c²) / m2² — one
    * IEEE division of exact BIGINTs, so any engine replays it. The
    * label table is consumed three times (both endpoints + degree
    * mass), so its superstep lineage is truncated with an eager
    * localCheckpoint — the standard iterative-algorithm cut, same as
    * [[kcore]]. */
  def lpaModularityScaled(edges: DataFrame, iters: Int): DataFrame =
    lpaModularityOf(edges, lpaExactScaled(edges, iters).localCheckpoint(true))

  /** [[lpaModularityScaled]] with the label table supplied by the
    * caller — the shared-intermediate form: when the assignment is
    * already memoized/persisted (one LPA run feeding both the
    * assignment gate and this score), passing it here skips the
    * superstep recompute. `labels` must be (grp, node, community)
    * and MATERIALIZED (persisted or checkpointed) — it is consumed
    * three times below. */
  def lpaModularityOf(edges: DataFrame, lab: DataFrame): DataFrame = {
    val e0 = edges.select(col("group").as("grp"),
      col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
    val sym = e0.unionByName(
        e0.select(col("grp"), col("b").as("a"), col("a").as("b"))).distinct()
    val m2 = sym.groupBy("grp").agg(count(lit(1)).as("m2"))
    val labeled = sym
      .join(lab.select(col("grp"), col("node").as("a"), col("community").as("ca")),
        Seq("grp", "a"))
      .join(lab.select(col("grp"), col("node").as("b"), col("community").as("cb")),
        Seq("grp", "b"))
    val intra = labeled.where(col("ca") === col("cb"))
      .groupBy(col("grp"), col("ca").as("c")).agg(count(lit(1)).as("sym_intra"))
    val deg = sym.groupBy(col("grp"), col("a").as("node"))
      .agg(count(lit(1)).as("deg"))
    val dsum = deg
      .join(lab.select(col("grp"), col("node"), col("community").as("c")),
        Seq("grp", "node"))
      .groupBy("grp", "c").agg(sum(col("deg")).as("dsum"))
    dsum.join(intra, Seq("grp", "c"), "left_outer").na.fill(0L, Seq("sym_intra"))
      .join(m2, "grp")
      .select(col("grp"), col("c"),
        (col("m2") * col("sym_intra") - col("dsum") * col("dsum")).as("qc"),
        col("m2"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_communities"), sum(col("qc")).as("q_num"),
        max(col("m2")).as("m2"))
      .select(col("grp"), col("n_communities"), col("q_num"),
        (col("q_num").cast("double") /
          (col("m2") * col("m2")).cast("double")).as("modularity"))
  }

  /** Exact-scaled alpha/Katz centrality (G10) — the driver-oracle-able
    * companion of the LocalGraph dense solve (reference
    * `alpha_centrality`, bin/interpersonaldiversity.R). The solve's
    * Neumann series x = Σ αᵏ(Aᵀ)ᵏe runs as supersteps
    * x_{k+1} = α·Aᵀx_k + e from x₀ = e (scaled 1e6): each step sums
    * neighbor scores (exact BIGINTs) and applies ONE rounded op per
    * node, ⌊α·s + 0.5⌋ + 1e6 — both order-independent, so any engine
    * reproduces the trajectory bit-for-bit. Convergence needs
    * α < 1/λ₁ (the dense solve's contract); a fixed small step count
    * bounds cost and magnitude either way. Same scale shape as
    * [[eigenExactScaled]]: one shuffle join + one agg per step, all
    * keyed by (group, node). */
  def alphaExactScaled(edges: DataFrame, alpha: Double, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("group").as("grp"),
      col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
    val (symRaw, nRows) = materialized(
      e.unionByName(e.select(col("grp"), col("b").as("a"), col("a").as("b")))
        .distinct())
    withSuperstepScope(spark, superstepPartitions(spark, nRows)) {
      val sym = symRaw.repartition(col("grp"), col("b")).localCheckpoint(true)
      // single-consumption iterate → ONE action for the whole chain
      val v = chainSupersteps(
          sym.select(col("grp"), col("a").as("node")).distinct()
            .select(col("grp"), col("node"), lit(1000000L).as("v")), iters) { v =>
        // every node of the symmetrized graph appears as `a`, so the
        // inner join drops no vertex (no left-join/coalesce needed)
        sym.join(v.select(col("grp"), col("node").as("b"), col("v")), Seq("grp", "b"))
          .groupBy(col("grp"), col("a").as("node"))
          .agg(sum(col("v")).as("s"))
          .select(col("grp"), col("node"),
            (floor(lit(alpha) * col("s") + lit(0.5)) + lit(1000000L)).as("v"))
      }
      v.select(col("grp"), col("node"), col("v").as("alpha_scaled"))
    }
  }

  /** Exact-scaled personalized PageRank — random-walk-with-restart
    * from one seed per group (the min node id: deterministic, no
    * config to drift). The iterate stays engine-portable by integer
    * arithmetic only: each node's outgoing contribution is v DIV deg
    * (integer division on the symmetrized graph), the neighbor sum is
    * an exact BIGINT, and the damping step is the single rounded op
    * ⌊d·s + 0.5⌋ before the teleport mass (1−d)·10⁶ re-enters at the
    * seed. Same cost shape as [[alphaExactScaled]]: per step one
    * co-partitioned join + one agg at superstep-sized partitions. */
  def pprExactScaled(edges: DataFrame, damping: Double, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("group").as("grp"),
      col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
    val (symRaw, nRows) = materialized(
      e.unionByName(e.select(col("grp"), col("b").as("a"), col("a").as("b")))
        .distinct())
    val teleport = math.round((1.0 - damping) * 1000000L)
    withSuperstepScope(spark, superstepPartitions(spark, nRows)) {
      val sym = symRaw.repartition(col("grp"), col("b")).localCheckpoint(true)
      val deg = sym.groupBy(col("grp"), col("a").as("node"))
        .agg(count(lit(1)).as("deg")).localCheckpoint(true)
      val seed = deg.groupBy("grp").agg(min(col("node")).as("seed"))
        .localCheckpoint(true)
      // the iterate carries ONLY (grp, node, v): deg and the seed flag
      // re-join per step from the LOOP-INVARIANT checkpointed leaves
      // above (the old form re-joined the iterate with itself for
      // them, which doubles the lazy plan per step and forced one
      // materialization per superstep). Values are unchanged — deg and
      // node===seed never vary across steps — so the whole recurrence
      // now runs as ONE action (see chainSupersteps).
      val vN = chainSupersteps(
          deg.join(seed, "grp")
            .select(col("grp"), col("node"),
              when(col("node") === col("seed"), lit(1000000L))
                .otherwise(lit(0L)).as("v")), iters) { v =>
        val contrib = v.join(deg, Seq("grp", "node"))
          .select(col("grp"), col("node").as("b"), expr("v DIV deg").as("c"))
        sym.join(contrib, Seq("grp", "b"))
          .groupBy(col("grp"), col("a").as("node"))
          .agg(sum(col("c")).as("s"))
          .join(seed, "grp")
          .select(col("grp"), col("node"),
            (floor(lit(damping) * col("s") + lit(0.5)) +
              when(col("node") === col("seed"), lit(teleport))
                .otherwise(lit(0L))).as("v"))
      }
      vN.select(col("grp"), col("node"), col("v").as("ppr_scaled"))
    }
  }

  /** Fixed-round k-truss peel over a canonical (u &lt; v) edge list: each
    * round measures per-edge triangle support with the wedge join
    * (edge ⋈ adjacency on u, then adjacency on (v, shared-neighbor) —
    * co-partitioned equi-joins, never an all-pairs product) and drops
    * edges below k−2. A FIXED round count keeps cluster cost
    * predictable at scale (converged peeling is an unbounded number of
    * full passes — same design call as the superstep kernels) and
    * gives the recurrence an exact chained-CTE SQL form. Returns the
    * surviving edges with the support measured in the admitting
    * round. */
  def ktrussPeel(pairs: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, "ktrussPeel needs at least one round")
    var e = pairs.select(col("u"), col("v"))
    var out: DataFrame = null
    (0 until rounds).foreach { _ =>
      val sym = e.select(col("u").as("a"), col("v").as("b"))
        .unionByName(e.select(col("v").as("a"), col("u").as("b")))
      val sup = e
        .join(sym.select(col("a").as("u"), col("b").as("w")), "u")
        .join(sym.select(col("a").as("v"), col("b").as("w")), Seq("v", "w"))
        .groupBy("u", "v").agg(count(lit(1)).as("support"))
      out = e.join(sup, Seq("u", "v"), "left")
        .select(col("u"), col("v"),
          coalesce(col("support"), lit(0L)).as("support"))
        .where(col("support") >= (k - 2).toLong)
        .localCheckpoint(true)
      e = out.select("u", "v")
    }
    out
  }

  /** Exact-scaled Bonacich power centrality (G11) — the oracle-able
    * companion of the LocalGraph dense solve. The solve's target
    * x = (I − βA)⁻¹·A·1 expands as the Neumann series
    * x = Σ βᵏAᵏ·(A·1), run as supersteps x_{k+1} = A·1 + β·A·x_k from
    * x₀ = A·1: on the unweighted symmetrized graph A·1 is the integer
    * degree, neighbor sums are exact BIGINTs, and the single rounded
    * op per node per step (⌊β·s + 0.5⌋) keeps the trajectory
    * engine-independent. Same cost shape as [[alphaExactScaled]]. */
  def powerExactScaled(edges: DataFrame, beta: Double, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("group").as("grp"),
      col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
    val (symRaw, nRows) = materialized(
      e.unionByName(e.select(col("grp"), col("b").as("a"), col("a").as("b")))
        .distinct())
    withSuperstepScope(spark, superstepPartitions(spark, nRows)) {
      val sym = symRaw.repartition(col("grp"), col("b")).localCheckpoint(true)
      // single-consumption iterate → ONE action for the whole chain
      val v = chainSupersteps(
          sym.groupBy(col("grp"), col("a").as("node"))
            .agg((count(lit(1)) * lit(1000000L)).as("v")), iters) { v =>
        // every node carries a score each step, so the join fans exactly
        // deg(i) rows per node — deg falls out of the same aggregation
        // as the neighbor sum
        sym.join(v.select(col("grp"), col("node").as("b"), col("v")), Seq("grp", "b"))
          .groupBy(col("grp"), col("a").as("node"))
          .agg(sum(col("v")).as("s"), count(lit(1)).as("deg"))
          .select(col("grp"), col("node"),
            (col("deg") * lit(1000000L) +
              floor(lit(beta) * col("s") + lit(0.5))).as("v"))
      }
      v.select(col("grp"), col("node"), col("v").as("power_scaled"))
    }
  }

  /** Exact-scaled HITS (Kleinberg hubs & authorities, beyond-
    * reference): on the directed graph, h ← A·a then a ← Aᵀ·h per
    * superstep, each followed by a global max-normalization — neighbor
    * sums are exact BIGINTs and the single rounded op per node per
    * half-step (⌊s·1e6/max + 0.5⌋) keeps the trajectory engine-
    * independent, the [[eigenExactScaled]] discipline applied to the
    * two-sided iteration. The global max travels as a broadcast 1-row
    * aggregate (not a whole-table window). Nodes without out-(in-)
    * edges carry hub (authority) 0 exactly. Output:
    * (id, hub_scaled, auth_scaled). */
  def hitsExactScaled(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val (e0, nE) = materialized(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct())
    withSuperstepScope(spark, superstepPartitions(spark, nE)) {
      val e = e0.repartition(col("dst")).localCheckpoint(true)
      val v = e.select(col("src").as("id"))
        .unionByName(e.select(col("dst").as("id"))).distinct()
        .repartition(col("id")).localCheckpoint(true)
      // zero-score nodes contribute nothing to any later neighbor sum,
      // so iterations normalize only the nodes WITH mass (drops the
      // all-node left join — 2 stages/iteration in a kernel whose cost
      // is pure stage count); the zeros re-enter once at the end.
      // The global max is collected DURING the half-step's checkpoint
      // action (Observation) and re-injected as a LITERAL: the old
      // broadcast-agg form embedded the sums subtree twice (once for
      // the 1-row max, once for the divide), executing the join+agg
      // twice per half-step and paying a broadcast exchange — the
      // arithmetic ⌊s·1e6/mx + 0.5⌋ is unchanged, mx is the same
      // exact BIGINT either way.
      def normalized(sums: DataFrame, out: String): DataFrame = {
        val obs = org.apache.spark.sql.Observation()
        val s = sums.observe(obs, max(col("s")).as("mx")).localCheckpoint(true)
        val mx = obs.get.getOrElse("mx", null) match {
          case n: java.lang.Long => n.longValue()
          case _ => 0L // empty frame: max is null — everything scores 0
        }
        s.select(col("id"),
          (if (mx == 0L) lit(0L)
           else floor(col("s") * lit(1000000.0) / lit(mx) + lit(0.5))
             .cast("long")).as(out))
      }
      var a = v.select(col("id"), lit(1000000L).as("a")).localCheckpoint(true)
      var h = v.select(col("id"), lit(1000000L).as("h"))
      (0 until iters).foreach { _ =>
        h = normalized(
          e.join(a.select(col("id").as("dst"), col("a")), Seq("dst"))
            .groupBy(col("src").as("id")).agg(sum(col("a")).as("s")), "h")
        a = normalized(
          e.join(h.select(col("id").as("src"), col("h")), Seq("src"))
            .groupBy(col("dst").as("id")).agg(sum(col("h")).as("s")), "a")
      }
      v.join(h, Seq("id"), "left_outer").join(a, Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("h"), lit(0L)).as("hub_scaled"),
          coalesce(col("a"), lit(0L)).as("auth_scaled"))
    }
  }

  /** Exact-scaled Brandes betweenness per group — the
    * driver-oracle-able form of the "no SQL form" kernel (G7).
    *
    * Standard Brandes accumulates δ(v) = Σ_w σ(v)/σ(w)·(1+δ(w)) in
    * floating point, whose summation order makes it engine-specific.
    * Here δ lives in scaled-BIGINT units (1e6 = 1.0) and every
    * per-successor contribution rounds to an integer FIRST —
    * `⌊σ(v)·(1e6+δ(w))/σ(w) + 0.5⌋` — so both sweeps are integer
    * arithmetic with one IEEE multiply/divide chain per edge, and any
    * engine reproduces the result bit-for-bit. The DuckDB mirror
    * unrolls the BFS-layered forward (σ) and backward (δ) sweeps as
    * generated per-depth CTEs.
    *
    * Output `btw_scaled2` = Σ_roots δ_root(v) (scaled; each unordered
    * pair counted from both endpoints — halve and unscale for the
    * textbook undirected value). BFS is depth-capped at `maxDepth`
    * (mirrored by the oracle's recursion bound); σ must stay within
    * Long — true for sparse per-sample graphs, the tier this kernel
    * serves (the dense-megagraph path is GraphX). One shuffle on the
    * group key, then groups run independently — same scale shape as
    * [[perGroupVertexMetrics]]. */
  def betweennessExactScaled(edges: DataFrame, maxDepth: Int = 32): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val Scale = 1000000L
    keyedGroupsUnweighted(edges)
      .flatMapGroups { (grp, it) =>
        // symmetrized distinct adjacency, index-compressed to 0..n-1
        // (per-root state lives in flat arrays: the kernel runs
        // n × O(V+E) sweeps, and HashMap probes dominated the profile)
        val pairs = it.flatMap { case (_, a, b) => Seq((a, b), (b, a)) }.toSet
        val nodes = pairs.map(_._1).toArray.sorted
        val idx = nodes.zipWithIndex.toMap
        val n = nodes.length
        val adj = Array.fill(n)(Array.empty[Int])
        pairs.groupBy(_._1).foreach { case (a, ps) =>
          adj(idx(a)) = ps.map(p => idx(p._2)).toArray.sorted
        }
        val btw = new Array[Long](n)
        val dist = new Array[Int](n)
        val sigma = new Array[Long](n)
        val delta = new Array[Long](n)
        val order = new Array[Int](n) // BFS visit order (root first)
        var root = 0
        while (root < n) {
          java.util.Arrays.fill(dist, -1)
          java.util.Arrays.fill(sigma, 0L)
          java.util.Arrays.fill(delta, 0L)
          dist(root) = 0; sigma(root) = 1L; order(0) = root
          var head = 0
          var tail = 1
          while (head < tail) {
            val v = order(head); head += 1
            val dv = dist(v)
            if (dv < maxDepth) {
              adj(v).foreach { w =>
                if (dist(w) < 0) { dist(w) = dv + 1; order(tail) = w; tail += 1 }
                if (dist(w) == dv + 1) sigma(w) += sigma(v)
              }
            }
          }
          // reverse BFS order = non-increasing depth: delta of deeper
          // nodes is final before shallower nodes consume it
          var i = tail - 1
          while (i >= 1) {
            val v = order(i)
            val dv = dist(v)
            var acc = 0L
            adj(v).foreach { w =>
              if (dist(w) == dv + 1)
                acc += math.floor(
                  sigma(v).toDouble * (Scale + delta(w)) / sigma(w) + 0.5).toLong
            }
            delta(v) = acc
            btw(v) += acc
            i -= 1
          }
          // root itself (order(0)) is excluded from accumulation
          root += 1
        }
        nodes.iterator.zipWithIndex.map { case (node, i2) => (grp, node, btw(i2)) }
      }
      .toDF("grp", "node", "btw_scaled2")
  }

  /** Per-vertex eccentricity + harmonic centrality per group, both in
    * exact arithmetic: ecc is an integer BFS depth, harmonic is
    * Σ_u ⌊1e6/d(v,u) + 0.5⌋ over reachable u ≠ v — per-distance terms
    * round to scaled BIGINTs before the (order-independent) sum, so
    * the oracle reproduces both bit-for-bit from the recursive-CTE
    * distance table. Harmonic centrality is the disconnected-robust
    * closeness variant (a beyond-the-reference G-family extension);
    * one flatMapGroups pass, same tier as the battery. */
  def harmonicEccExact(edges: DataFrame, maxDepth: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    keyedGroupsUnweighted(edges)
      .flatMapGroups { (grp, it) =>
        val pairs = it.flatMap { case (_, a, b) => Seq((a, b), (b, a)) }.toSet
        val nodes = pairs.map(_._1).toArray.sorted
        val idx = nodes.zipWithIndex.toMap
        val n = nodes.length
        val adj = Array.fill(n)(Array.empty[Int])
        pairs.groupBy(_._1).foreach { case (a, ps) =>
          adj(idx(a)) = ps.map(p => idx(p._2)).toArray.sorted
        }
        val dist = new Array[Int](n)
        val order = new Array[Int](n)
        (0 until n).iterator.map { root =>
          java.util.Arrays.fill(dist, -1)
          dist(root) = 0; order(0) = root
          var head = 0; var tail = 1
          var ecc = 0L
          var harmonic = 0L
          while (head < tail) {
            val v = order(head); head += 1
            val dv = dist(v)
            if (dv > 0) {
              if (dv > ecc) ecc = dv
              harmonic += math.floor(1000000.0 / dv + 0.5).toLong
            }
            if (dv < maxDepth) {
              adj(v).foreach { w =>
                if (dist(w) < 0) { dist(w) = dv + 1; order(tail) = w; tail += 1 }
              }
            }
          }
          (grp, nodes(root), ecc, harmonic)
        }
      }
      .toDF("grp", "node", "ecc", "harmonic_scaled")
  }

  private def unitWeighted(g: PropertyGraph): PropertyGraph =
    PropertyGraph(g.nodes, g.edges.withColumn("unit_w", lit(1.0)))

  /** Weak connected components via GraphX; (id, component). */
  def connectedComponents(spark: SparkSession, g: PropertyGraph): DataFrame = {
    val cc = toGraphX(unitWeighted(g), "unit_w",
      gxPartitions(spark, g.edges.count())).connectedComponents().vertices
    spark.createDataFrame(cc.map(t => Row(t._1, t._2)),
      new org.apache.spark.sql.types.StructType()
        .add("id", "long").add("component", "long"))
  }

  /** Label propagation communities (distributed analog of the
    * reference's walktrap/fastgreedy — SURVEY G14 note). */
  def labelPropagation(spark: SparkSession, g: PropertyGraph, iters: Int = 10): DataFrame = {
    val lp = org.apache.spark.graphx.lib.LabelPropagation
      .run(toGraphX(unitWeighted(g), "unit_w",
        gxPartitions(spark, g.edges.count())), iters).vertices
    spark.createDataFrame(lp.map(t => Row(t._1, t._2)),
      new org.apache.spark.sql.types.StructType()
        .add("id", "long").add("community", "long"))
  }

  /** Materialize one group's edges into task memory, failing fast past
    * the cap: the per-group kernels are the many-small-groups tier, and
    * a megagroup must error with an actionable message instead of
    * OOMing the executor. */
  private def boundedEdges(grp: String, it: Iterator[(String, Long, Long, Double)],
      cap: Int): Seq[(Long, Long, Double)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    while (it.hasNext) {
      if (buf.length >= cap)
        throw new IllegalStateException(
          s"group '$grp' has more than $cap edges — too large for a task-local " +
            "graph kernel. Pre-aggregate the group, raise maxGroupEdges, or use " +
            "the GraphX tier (pageRankAndComponents/connectedComponents).")
      val t = it.next()
      buf += ((t._2, t._3, t._4))
    }
    buf.toSeq
  }

  /** The per-group kernel dispatch, EXPLICITLY distributed (round-14,
    * r13 verdict item 5 / guide §2.4-2.5): `groupByKey(_._1)` computes
    * its key into a fresh column, so no pre-repartition can satisfy
    * the required distribution and the planner inserts its own
    * exchange — byte-tiny for gate-scale groups, which AQE coalesces
    * to ONE task, serializing every group's task-local kernel (q72's
    * eigen battery ran all groups in a single ~4 s task on a 32-core
    * host). Grouping BY THE COLUMN (`groupBy(col).as[K, V]`) lets an
    * explicit-count keyed repartition satisfy the distribution
    * exactly: no second exchange, and the explicit count is exempt
    * from coalescing, so each group's kernel lands in its own task. At
    * scale the exchange exists either way — this only pins its
    * partition count to the session parallelism. The iterator-based
    * kernels (and [[boundedEdges]]'s fail-fast cap) are unchanged. */
  private def keyedGroups(edges: DataFrame)
      : org.apache.spark.sql.KeyValueGroupedDataset[
        String, (String, Long, Long, Double)] = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("group").cast("string"), col("src").cast("long"),
        col("dst").cast("long"), col("weight").cast("double"))
      .repartition(spark.sessionState.conf.numShufflePartitions, col("group"))
      .groupBy(col("group"))
      .as[String, (String, Long, Long, Double)]
  }

  /** [[keyedGroups]] for the unweighted (group, src, dst) kernels. */
  private def keyedGroupsUnweighted(edges: DataFrame)
      : org.apache.spark.sql.KeyValueGroupedDataset[
        String, (String, Long, Long)] = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("group").cast("string"), col("src").cast("long"),
        col("dst").cast("long"))
      .repartition(spark.sessionState.conf.numShufflePartitions, col("group"))
      .groupBy(col("group"))
      .as[String, (String, Long, Long)]
  }

  /** Per-group whole-graph metrics: one row per group with the
    * reference's network-stat battery (nestats shape —
    * reference bin/GeneralNetworkProperties.R, bin/CompareSkin.R:175-181).
    * Input: (group: String, src: Long, dst: Long, weight: Double). */
  /** @param communityMaxNodes community detection is quadratic-plus in
    *   node count — computed only for groups at or below this size
    *   (the reference's per-sample subgraphs are tens of nodes);
    *   larger groups report nCommunities = -1, modularity NaN.
    * @param communityAlgorithm "greedy" (CNM, reference fastgreedy) or
    *   "walktrap" (exact Pons-Latapy port, reference walktrap).
    * @param quadraticMaxNodes the all-pairs-BFS kernels (diameter,
    *   radius, mean distance, betweenness, closeness) are O(V·E) — a
    *   single 100k-node group under the edge cap would still burn hours
    *   in one task. Groups past this node count report -1 / NaN for
    *   those metrics and keep the linear ones (degree, eigen,
    *   connectivity); the distributed tier (GraphX) is the right tool
    *   for the megagroup. */
  def perGroupMetrics(edges: DataFrame, directed: Boolean = false,
      communityMaxNodes: Int = 200,
      communityAlgorithm: String = "greedy",
      maxGroupEdges: Int = 2000000,
      quadraticMaxNodes: Int = 20000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    keyedGroups(edges)
      .mapGroups { (grp, it) =>
        val g = LocalGraph.fromEdges(boundedEdges(grp, it, maxGroupEdges), directed)
        val quad = g.n <= quadraticMaxNodes
        val comm =
          if (g.n > communityMaxNodes) Array.empty[Int]
          else if (communityAlgorithm == "walktrap") g.walktrapCommunities()
          else g.greedyModularityCommunities
        GroupGraphMetrics(
          group = grp, nNodes = g.n, nEdges = g.edges.length,
          diameter = if (quad) g.diameter else -1,
          radius = if (quad) g.radius else -1,
          meanDistance = if (quad) g.meanDistance else Double.NaN,
          connected = g.isConnected,
          degreeCentralization = g.degreeCentralization,
          betweennessCentralization =
            if (quad) g.betweennessCentralization else Double.NaN,
          closenessCentralization =
            if (quad) g.closenessCentralization else Double.NaN,
          eigenCentralization = g.eigenCentralization,
          nCommunities = if (comm.isEmpty) -1 else comm.distinct.length,
          modularity = if (comm.isEmpty) Double.NaN else g.modularity(comm))
      }.toDF()
  }

  /** G14/G15 — per-group per-vertex community assignment from BOTH
    * local kernels (walktrap, reference bin/CompareNetworkGroups.R:67;
    * CNM fastgreedy, reference bin/TriadicClosures.R:59) in one kernel
    * pass. Communities are labeled CANONICALLY by their minimum member
    * vertex id, so the output is independent of the kernels' internal
    * community numbering and pins cleanly against an external oracle.
    * Output: (group, id, walktrap_rep, cnm_rep). Groups larger than
    * `communityMaxNodes` emit (-1, -1) labels instead of running the
    * quadratic-plus kernels — same cap + rationale as
    * [[perGroupMetrics]] (the reference's per-sample subgraphs are
    * tens of nodes; a megagroup belongs on the distributed LPA
    * tier). */
  def perGroupCommunities(edges: DataFrame, directed: Boolean = false,
      steps: Int = 4, communityMaxNodes: Int = 200,
      maxGroupEdges: Int = 2000000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    keyedGroups(edges)
      .flatMapGroups { (grp, it) =>
        val g = LocalGraph.fromEdges(boundedEdges(grp, it, maxGroupEdges), directed)
        if (g.n > communityMaxNodes) {
          g.vertexIds.indices.map(i => (grp, g.vertexIds(i), -1L, -1L))
        } else {
          val wt = g.walktrapCommunities(steps)
          val cnm = g.greedyModularityCommunities
          def minIdRep(m: Array[Int]): Map[Int, Long] =
            m.zipWithIndex.groupBy(_._1)
              .map { case (c, xs) => c -> xs.map(x => g.vertexIds(x._2)).min }
          val (rw, rc) = (minIdRep(wt), minIdRep(cnm))
          g.vertexIds.indices.map(i => (grp, g.vertexIds(i), rw(wt(i)), rc(cnm(i))))
        }
      }.toDF("group", "id", "walktrap_rep", "cnm_rep")
  }

  /** Per-group per-vertex eigencentrality — the node×sample matrix
    * feeding β-diversity (G18; reference bin/interpersonaldiversity.R:98-116).
    * Output: (group, id, eigen). */
  def perGroupEigen(edges: DataFrame, directed: Boolean = false,
      maxGroupEdges: Int = 2000000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    keyedGroups(edges)
      .flatMapGroups { (grp, it) =>
        val g = LocalGraph.fromEdges(boundedEdges(grp, it, maxGroupEdges), directed)
        val e = g.eigenCentrality()
        g.vertexIds.indices.map(i => (grp, g.vertexIds(i), e(i)))
      }.toDF("group", "id", "eigen")
  }

  /** Per-group per-vertex centrality battery: eigencentrality,
    * PageRank, betweenness, closeness, weight-entropy diversity, and
    * alpha centrality in one kernel pass per group (SURVEY G6-G13).
    * Output: (group, id, eigen, pagerank, betweenness, closeness,
    * diversity, alpha). */
  /** @param quadraticMaxNodes betweenness/closeness are O(V·E) per
    *   group — NaN past this node count (see [[perGroupMetrics]]).
    * @param denseMaxNodes alpha centrality solves a dense n×n system
    *   (O(n²) memory, O(n³) time) — NaN past this node count. */
  def perGroupVertexMetrics(edges: DataFrame, directed: Boolean = false,
      alpha: Double = 0.1, maxGroupEdges: Int = 2000000,
      quadraticMaxNodes: Int = 20000, denseMaxNodes: Int = 2000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    keyedGroups(edges)
      .flatMapGroups { (grp, it) =>
        val g = LocalGraph.fromEdges(boundedEdges(grp, it, maxGroupEdges), directed)
        val nan = Array.fill(g.n)(Double.NaN)
        val eig = g.eigenCentrality()
        val pr = g.pageRank()
        val btw = if (g.n <= quadraticMaxNodes) g.betweenness else nan
        val clo = if (g.n <= quadraticMaxNodes) g.closeness else nan
        val har = if (g.n <= quadraticMaxNodes) g.harmonicScaled()
          else Array.fill(g.n)(-1L)
        val div = g.diversity
        val alp =
          if (g.n > denseMaxNodes) nan
          else try g.alphaCentrality(alpha) catch {
            case _: IllegalArgumentException => nan
          }
        g.vertexIds.indices.map(i =>
          (grp, g.vertexIds(i), eig(i), pr(i), btw(i), clo(i), div(i), alp(i),
            har(i)))
      }.toDF("group", "id", "eigen", "pagerank", "betweenness",
        "closeness", "diversity", "alpha", "harmonic_scaled")
  }

  /** G19 — per-group targeted-removal robustness curve (NetSwan
    * shape): one row per (group, n_removed) with the largest-component
    * fraction after deleting that many highest-degree vertices.
    * Same many-small-groups tier as the other kernels. */
  def perGroupRobustness(edges: DataFrame, steps: Int = 5,
      maxGroupEdges: Int = 2000000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    keyedGroups(edges)
      .flatMapGroups { (grp, it) =>
        val g = LocalGraph.fromEdges(boundedEdges(grp, it, maxGroupEdges), directed = false)
        g.robustnessCurve(steps).zipWithIndex.map { case (frac, i) => (grp, i, frac) }
      }.toDF("group", "n_removed", "largest_frac")
  }

  /** G13 exact twin — per-vertex inverse-Simpson (Hill number of
    * order 2) diversity of incident edge weights: D = (Σw)²/Σw².
    * The reference's diversity kernel is Shannon entropy over
    * log(degree) (igraph diversity, bin/interpersonaldiversity.R:104;
    * driver-local in LocalGraph.diversity / q59) — transcendental, so
    * not hash-replayable across engines. The Simpson form measures the
    * same effective-partner concentration but stays RATIONAL: both
    * sums are exact BIGINTs and the output is one IEEE expression, so
    * an external engine replays it bit-for-bit. One shuffle (the
    * groupBy); symmetrization is a union of two narrow projections.
    * Input: (group, src, dst, w: long). Output: (grp, id, s, q,
    * simpson). */
  def vertexSimpsonDiversity(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("group").as("grp"), col("src").as("id"), col("w"))
      .unionByName(edges.select(col("group").as("grp"), col("dst").as("id"), col("w")))
    sym.groupBy("grp", "id")
      .agg(sum(col("w")).as("s"), sum(col("w") * col("w")).as("q"))
      .select(col("grp"), col("id"), col("s"), col("q"),
        (col("s").cast("double") * col("s") / col("q")).as("simpson"))
  }

  /** Largest connected-component size of one edge list, computed
    * task-locally by union-find with path halving — the per-layer
    * kernel of [[robustnessExact]]'s small tier. Component sizes are
    * algorithm-independent, so this agrees exactly with GraphX CC and
    * with a recursive-CTE closure. Counts only edge endpoints
    * (isolated vertices are the caller's singleton arithmetic). */
  private def largestComponentOf(edges: Iterator[(Long, Long)]): Long = {
    val idx = scala.collection.mutable.HashMap.empty[Long, Int]
    val parent = scala.collection.mutable.ArrayBuffer.empty[Int]
    def nodeOf(v: Long): Int = idx.getOrElseUpdate(v, {
      parent += parent.length; parent.length - 1
    })
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(nodeOf(a)), find(nodeOf(b)))
      if (ra != rb) parent(ra) = rb
    }
    if (parent.isEmpty) 0L
    else {
      val sizes = scala.collection.mutable.HashMap.empty[Int, Long]
      parent.indices.foreach { i =>
        val r = find(i); sizes.update(r, sizes.getOrElse(r, 0L) + 1L)
      }
      sizes.values.max
    }
  }

  /** G19 exact twin — targeted-removal robustness with every decision
    * integer-exact, mirroring LocalGraph.robustnessCurve (NetSwan
    * shape, reference bin/alteredDiet.R:5) distributively: at each
    * step delete the highest-degree remaining vertex (tie → smallest
    * id, the kernel's maxBy((deg, -id)) rule), recompute connected
    * components, and report largest-component size / ORIGINAL vertex
    * count. Adaptive removal is inherently sequential — k steps are k
    * (degree-agg → argmax → CC) rounds; each round is a full
    * distributed job, so the plan survives scale even though the
    * driver holds only the k removed ids and the k curve points.
    * Component sizes are algorithm-independent, so GraphX CC here and
    * a recursive-CTE closure in an external engine agree exactly; the
    * only float is the final size/n division. Input: (src, dst).
    * Output: (n_removed, largest, largest_frac). */
  def robustnessExact(edges: DataFrame, steps: Int,
      maxLayeredLocalEdges: Long = 100000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val canon = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verts = canon.select(col("a").as("v"))
      .unionByName(canon.select(col("b").as("v"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bounds = verts.agg(count(lit(1)), max(col("v"))).head()
    val n0 = bounds.getLong(0)
    val enc = bounds.getLong(1) + 1 // layer stride > any vertex id
    // the whole adaptive loop runs eagerly (every step collect()s its
    // argmax), so the superstep partition scope applies to it — each
    // step's degree agg is ~2|E| rows, the contention-amplifier shape
    val nEdges = canon.count()
    val parts = superstepPartitions(spark, nEdges * 2)
    val ccMaxByLayer = withSuperstepScope(spark, parts) {
      // Phase 1 — the removal sequence, BATCHED (round-12 verdict
      // item 5): the old loop ran one argmax collect + one
      // localCheckpoint Spark job PER removal step — inherently
      // sequential driver-side latency that dominates at hundreds of
      // steps. Degrees only ever DECREASE under removals, so the
      // whole sequence is decided by the top-C degree slice plus its
      // induced adjacency: collect the top C = 8·steps + 64 vertices
      // (one job) and the candidate-candidate edges (one job), then
      // simulate the argmax-with-decrements sequence locally. Every
      // victim's edges to future candidates lie inside that induced
      // set, and a non-candidate can never win while the simulated
      // winner's degree stays STRICTLY above the (C+1)-th initial
      // degree (its degree started ≤ that bound and never grows) —
      // the exactness guard. When the guard trips (deep removal runs
      // or boundary ties), the remainder falls back to the old
      // incremental distributed loop: O(1) jobs in the common case,
      // never a wrong sequence. q136 pins the output exactly.
      val removed = scala.collection.mutable.ArrayBuffer.empty[Long]
      val nWanted = math.min(steps, math.max(n0 - 1, 0L).toInt)
      val degAgg = canon.select(col("a").as("v"))
        .unionByName(canon.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val cCap = math.min(n0, 8L * nWanted + 64L).toInt
      val top = degAgg.orderBy(col("d").desc, col("v").asc).limit(cCap + 1)
        .select(col("v"), col("d")).as[(Long, Long)].collect()
      val (candArr, cutoff) =
        if (top.length > cCap) (top.take(cCap), top.last._2) else (top, 0L)
      val candIds = candArr.map(_._1)
      val deg = scala.collection.mutable.LongMap(
        candArr.map { case (v, dd) => v -> dd }: _*)
      val adj = scala.collection.mutable.LongMap
        .empty[scala.collection.mutable.ArrayBuffer[Long]]
      if (candIds.nonEmpty)
        canon.where(col("a").isin(candIds: _*) && col("b").isin(candIds: _*))
          .as[(Long, Long)].collect().foreach { case (x, y) =>
            adj.getOrElseUpdate(x, scala.collection.mutable.ArrayBuffer.empty) += y
            adj.getOrElseUpdate(y, scala.collection.mutable.ArrayBuffer.empty) += x
          }
      var guardOk = true
      while (removed.length < nWanted && guardOk) {
        val alive = deg.toSeq.filter(_._2 > 0)
        if (alive.isEmpty) guardOk = false
        else {
          val (victim, dv) = alive.minBy { case (v, dd) => (-dd, v) }
          if (dv > cutoff) {
            removed += victim
            deg.remove(victim)
            adj.getOrElse(victim, Nil).foreach { u =>
              if (deg.contains(u)) deg(u) = deg(u) - 1
            }
          } else guardOk = false
        }
      }
      if (removed.length < nWanted) {
        // guard tripped: finish with the incremental distributed loop
        // (degrees recomputed once under the removals so far, then
        // victim-decrement maintenance per step — round-7 shape)
        var degrees = canon
          .where(!col("a").isin(removed.toSeq: _*) &&
            !col("b").isin(removed.toSeq: _*))
          .select(col("a").as("v"))
          .unionByName(canon
            .where(!col("a").isin(removed.toSeq: _*) &&
              !col("b").isin(removed.toSeq: _*))
            .select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("d"))
          .localCheckpoint(true)
        (removed.length until nWanted).foreach { _ =>
          val top1 = degrees.orderBy(col("d").desc, col("v").asc).limit(1)
            .select(col("v")).as[Long].collect()
          val victim =
            if (top1.nonEmpty) top1(0)
            else verts.where(!col("v").isin(removed.toSeq: _*))
              .agg(min(col("v"))).as[Long].head()
          // decrement only edges to SURVIVING neighbors: edges to
          // previously-removed neighbors already left the degree table
          // (at the recompute, or when that neighbor fell)
          val prevRemoved = removed.toSeq
          removed += victim
          val nbDec = canon
            .where((col("a") === victim || col("b") === victim) &&
              !col("a").isin(prevRemoved: _*) &&
              !col("b").isin(prevRemoved: _*))
            .select(when(col("a") === victim, col("b")).otherwise(col("a")).as("v"))
            .groupBy("v").agg(count(lit(1)).as("dec"))
          degrees = degrees.where(col("v") =!= victim)
            .join(nbDec, Seq("v"), "left_outer")
            .select(col("v"), (col("d") - coalesce(col("dec"), lit(0L))).as("d"))
            .where(col("d") > 0)
            .localCheckpoint(true)
        }
      }
      // Phase 2 — per-layer largest component, TIERED like every graph
      // kernel in this file: below the task-local cap the layers are
      // independent groups, so ONE shuffle fans each layer's surviving
      // edges to its own task and a union-find labels it there —
      // GraphX's per-run fixed cost (~3-5 s of Pregel supersteps,
      // measured) is pure overhead on a group-sized graph. Past the
      // cap, ONE GraphX CC over the layered union (q75's encoding
      // trick: layer t's ids offset by t·enc) labels every step at
      // once instead of paying GraphX fixed cost per step (17.8 s →
      // one run at gate scale).
      val byLayer: Map[Long, Long] =
        if ((steps + 1).toLong * nEdges <= maxLayeredLocalEdges) {
          val layered = (0 to steps).map { t =>
            val r = removed.take(t).toSeq
            canon.where(!col("a").isin(r: _*) && !col("b").isin(r: _*))
              .select(lit(t).as("layer"), col("a"), col("b"))
          }.reduce(_ unionByName _)
          // explicit keyed distribution, same rationale as [[keyedGroups]]
          layered
            .repartition(spark.sessionState.conf.numShufflePartitions,
              col("layer"))
            .groupBy(col("layer")).as[Int, (Int, Long, Long)]
            .mapGroups { (layer, it) =>
              (layer.toLong, largestComponentOf(it.map(e => (e._2, e._3))))
            }.collect().toMap
        } else {
          val layered = (0 to steps).map { t =>
            val r = removed.take(t).toSeq
            canon.where(!col("a").isin(r: _*) && !col("b").isin(r: _*))
              .select((col("a") + t * enc).as("src"), (col("b") + t * enc).as("dst"))
          }.reduce(_ unionByName _)
          val vtx = layered.select(col("src").as("id"))
            .unionByName(layered.select(col("dst").as("id"))).distinct()
            .withColumn("name", col("id").cast("string"))
          connectedComponents(spark, graft.graph.PropertyGraph(vtx, layered))
            .groupBy((col("id") / enc).cast("long").as("layer"), col("component"))
            .agg(count(lit(1)).as("sz"))
            .groupBy("layer").agg(max(col("sz")).as("m"))
            .as[(Long, Long)].collect().toMap
        }
      (byLayer, removed.length)
    }
    val (byLayerMax, nRemoved) = ccMaxByLayer
    canon.unpersist(); verts.unpersist()
    val curve = (0 to steps).map { t =>
      val nLeft = n0 - math.min(t, nRemoved)
      // isolated survivors are singleton components
      val largest = math.max(byLayerMax.getOrElse(t.toLong, 0L), math.min(1L, nLeft))
      (t.toLong, largest, largest.toDouble / n0)
    }
    curve.toDF("n_removed", "largest", "largest_frac")
  }

  /** G17 — graph β-diversity as edge-set Jaccard distance
    * 1 − |E₁∩E₂|/|E₁∪E₂| for every group pair (reference
    * bin/compareTwins.R:179-216). Pure relational: canonicalize,
    * count, self-join on the edge key. */
  def edgeJaccardDistance(edges: DataFrame): DataFrame = {
    val canon = edges.select(col("group"),
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val sizes = canon.groupBy("group").agg(count(lit(1)).as("n"))
    val inter = canon.as("x").join(canon.as("y"),
        col("x.a") === col("y.a") && col("x.b") === col("y.b") &&
          col("x.group") < col("y.group"))
      .groupBy(col("x.group").as("g1"), col("y.group").as("g2"))
      .agg(count(lit(1)).as("n_inter"))
    // include disjoint pairs (n_inter = 0) via cross of sizes
    val pairs = sizes.select(col("group").as("g1"), col("n").as("n1"))
      .join(sizes.select(col("group").as("g2"), col("n").as("n2")), col("g1") < col("g2"))
    pairs.join(inter, Seq("g1", "g2"), "left_outer").na.fill(0, Seq("n_inter"))
      .select(col("g1"), col("g2"),
        (lit(1.0) - col("n_inter").cast("double") /
          (col("n1") + col("n2") - col("n_inter")).cast("double")).as("jaccard_dist"))
  }

  /** M6/G18 — Bray-Curtis dissimilarity between groups over a long
    * (group, item, value) table: BC = Σ|x−y| / Σ(x+y).
    * Shared-item inner join + per-group totals — items missing from a
    * group contribute their full value, without a full outer join:
    * Σ|x−y| = Σ_shared|x−y| + (S1 − Σ_shared x) + (S2 − Σ_shared y). */
  def brayCurtis(values: DataFrame): DataFrame = {
    val v = values.select(col("group"), col("item"), col("value").cast("double"))
    val totals = v.groupBy("group").agg(sum("value").as("total"))
    val shared = v.as("x").join(v.as("y"),
        col("x.item") === col("y.item") && col("x.group") < col("y.group"))
      .groupBy(col("x.group").as("g1"), col("y.group").as("g2"))
      .agg(sum(abs(col("x.value") - col("y.value"))).as("sum_absdiff"),
        sum(col("x.value")).as("sum_x"), sum(col("y.value")).as("sum_y"))
    val pairs = totals.select(col("group").as("g1"), col("total").as("t1"))
      .join(totals.select(col("group").as("g2"), col("total").as("t2")), col("g1") < col("g2"))
    pairs.join(shared, Seq("g1", "g2"), "left_outer")
      .na.fill(0, Seq("sum_absdiff", "sum_x", "sum_y"))
      .select(col("g1"), col("g2"),
        ((col("sum_absdiff") + (col("t1") - col("sum_x")) + (col("t2") - col("sum_y"))) /
          (col("t1") + col("t2"))).as("bray_curtis"))
  }
}

/** Row type for perGroupMetrics. */
case class GroupGraphMetrics(
    group: String, nNodes: Int, nEdges: Int, diameter: Int, radius: Int,
    meanDistance: Double, connected: Boolean,
    degreeCentralization: Double, betweennessCentralization: Double,
    closenessCentralization: Double, eigenCentralization: Double,
    nCommunities: Int, modularity: Double)
