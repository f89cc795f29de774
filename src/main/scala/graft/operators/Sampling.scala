package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stochastic operators (SURVEY §2.8 R1-R6) — all seeded and
  * partition-independent. The reference seeds once globally
  * (bin/ReshapeAlignedAbundance.R:8 set.seed(1234)) and its own
  * Makefile warns results shift between runs (Makefile:189-190); here
  * every draw is keyed by (seed, group/row identity) so results are
  * identical across partitionings, cluster sizes, and reruns.
  */
object Sampling {

  /** Uniform [0,1) deterministic per-row noise from hashed columns —
    * the primitive under the samplers. xxhash64 → 53-bit mantissa. */
  def hashUnit(seed: Long, cols: Column*): Column =
    (shiftrightunsigned(xxhash64((lit(seed) +: cols): _*), 11).cast("double") /
      lit((1L << 53).toDouble))

  /** R2/R5 — stratified fraction sampling: keep ~`fraction` of rows per
    * stratum, deterministic per row identity (reference
    * group_by %>% sample_frac, bin/error_interpersonaldiversity.R:63-66;
    * caret createDataPartition, bin/CalculatePredModel.R:72-77). */
  def stratifiedSample(df: DataFrame, idCols: Seq[String], fraction: Double,
      seed: Long): DataFrame =
    df.where(hashUnit(seed, idCols.map(col): _*) < fraction)

  /** R4 — seeded random permutation order (stable shuffle). */
  def permuted(df: DataFrame, idCols: Seq[String], seed: Long): DataFrame =
    df.orderBy(xxhash64((lit(seed) +: idCols.map(col)): _*))

  /** Engine-portable 32-bit uniform from md5 — the cross-engine twin
    * of [[hashUnit]]. xxhash64 is Spark-private, so decisions derived
    * from it can only be output-pinned by an external oracle (q85/q86
    * style); md5 hex is identical in every engine, so an oracle can
    * RECOMPUTE the decision. Spark `conv(hex,16,10)` ≡ DuckDB
    * `('0x'||hex)::BIGINT`. md5 costs ~4× xxhash64 — keep [[hashUnit]]
    * for hot paths with no cross-engine replay requirement.
    * Null keys: `concat` (not `concat_ws`, which silently SKIPS null
    * columns) — a NULL id nulls the whole hash, the `<` comparison is
    * NULL, and the WHERE drops the row, exactly matching the `||`
    * concatenation the oracles use. */
  def md5Bits32(seed: Long, cols: Column*): Column = {
    val key = cols.foldLeft(lit(seed.toString)) { (acc, c) =>
      concat(acc, lit("|"), c.cast("string"))
    }
    // native hex parse (graft.functions.HexSlice32) — value-identical
    // to conv(substring(md5,1,8),16,10) but codegen'd; conv's
    // interpreted radix converter dominated every md5-portable scan
    graft.functions.HexSlice32(md5(key), lit(0))
  }

  /** R2/R5, portable form: same stratified-fraction semantics as
    * [[stratifiedSample]] but the keep decision replays in any engine
    * with md5. Exact integer threshold: keep iff bits32 < ⌊f·2³²⌋. */
  def stratifiedSamplePortable(df: DataFrame, idCols: Seq[String],
      fraction: Double, seed: Long): DataFrame =
    df.where(md5Bits32(seed, idCols.map(col): _*) <
      lit(math.floor(fraction * 4294967296.0).toLong))

  /** R6, portable form of [[randomFragment]]: offset from the md5
    * uniform via exact integer mod, so the substring replays in any
    * engine. */
  def randomFragmentPortable(seq: Column, id: Column, fraction: Double,
      seed: Long): Column = {
    val fragLen = greatest(floor(length(seq) * fraction), lit(1)).cast("int")
    val maxStart = greatest((length(seq) - fragLen + 1).cast("long"), lit(1L))
    val start = (md5Bits32(seed, id) % maxStart + 1).cast("int")
    seq.substr(start, fragLen)
  }

  /** Mixture / temperature sampling (beyond-reference, training-data
    * pipelines): keep each row with a per-stratum rate — the
    * source-weighting step of a pretraining data mixture ("web at
    * 0.5×, books at 1×, …"). Rates map stratum value → fraction;
    * unlisted strata fall back to `default`. The keep decision uses
    * the portable md5 uniform, so an external oracle recomputes it
    * per row; a stateless codegen'd filter, no shuffle, pushdown-
    * friendly — rebalancing a 100 TB corpus is scan-bound. */
  def mixtureSamplePortable(df: DataFrame, stratumCol: String,
      idCols: Seq[String], rates: Map[String, Double], default: Double,
      seed: Long): DataFrame = {
    def thresh(f: Double) = lit(math.floor(f * 4294967296.0).toLong)
    val cutoff = rates.toSeq.sortBy(_._1).foldLeft(thresh(default)) {
      case (acc, (k, f)) => when(col(stratumCol) === k, thresh(f)).otherwise(acc)
    }
    df.where(md5Bits32(seed, idCols.map(col): _*) < cutoff)
  }

  /** Fixed-size per-stratum sample (beyond-reference, training-data
    * pipelines): exactly `k` rows per stratum — the "carve a 1000-doc
    * eval set from every source" op, where a fraction-based sampler
    * can't bound the size. Keeps the k rows with the smallest
    * (md5-uniform, id) per stratum: deterministic under any
    * partitioning, portable (an external oracle replays the same
    * ranking), and one shuffle on the stratum key — rank-k within
    * group, no global sort. */
  def fixedSizeSamplePortable(df: DataFrame, stratumCol: String,
      idCols: Seq[String], k: Int, seed: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratumCol)
      .orderBy((md5Bits32(seed, idCols.map(col): _*) +: idCols.map(col)): _*)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k).drop("__rk")
  }

  /** Portable stratified k-fold assignment — the cross-validation
    * splitter (SURVEY M2's fold structure) as a pure projection +
    * window: rows rank within their stratum by the md5-portable
    * uniform (ties → id columns) and fold = (rank − 1) mod k, so every
    * stratum's rows spread across folds as evenly as arithmetic allows
    * (fold sizes differ by ≤ 1 per stratum — the property plain
    * hash-mod-k sampling does NOT give) and any engine replays every
    * assignment. One exchange on the stratum key; the fold column
    * composes with anti/semi-joins for train/heldout selection. */
  def kfoldPortable(df: DataFrame, stratumCol: String, idCols: Seq[String],
      k: Int, seed: Long): DataFrame = {
    require(k >= 2, s"k-fold needs k >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratumCol)
      .orderBy((md5Bits32(seed, idCols.map(col): _*) +: idCols.map(col)): _*)
    df.withColumn("fold", pmod(row_number().over(w) - 1, lit(k)))
  }

  /** Weighted priority sampling without replacement, md5-portable:
    * each row draws the uniform u = md5bits32 and competes on priority
    * u / max(weight, 1) — a heavier row gets a proportionally smaller
    * priority, so the k smallest priorities per stratum form a
    * weight-biased sample any engine replays (the priority is ONE IEEE
    * division; ties break on the id columns). Same shuffle shape as
    * [[kfoldPortable]]: one exchange on the stratum key, rank window,
    * k rows out per stratum. */
  def weightedSamplePortable(df: DataFrame, stratumCol: String,
      idCols: Seq[String], weightCol: String, k: Int, seed: Long): DataFrame = {
    require(k >= 1, s"weighted sample needs k >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val pri = md5Bits32(seed, idCols.map(col): _*).cast("double") /
      greatest(col(weightCol).cast("double"), lit(1.0))
    val w = Window.partitionBy(stratumCol)
      .orderBy((pri +: idCols.map(col)): _*)
    df.withColumn("priority", pri)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** R3 — seeded subsample of a column list (driver-side choice, as in
    * the reference's 25%-of-samples workaround,
    * bin/ReshapeAlignedAbundance.R:41-45). */
  def sampleColumns(columns: Seq[String], fraction: Double, seed: Long): Seq[String] = {
    val rng = new scala.util.Random(seed)
    val k = math.max(1, math.round(columns.size * fraction).toInt)
    rng.shuffle(columns).take(k).sorted
  }

  /** R6 — random genome fragmenter (reference
    * bin/RandomContigGenerator.pl:30-60): deterministic substring of
    * `fraction`·len starting at a hashed offset. */
  def randomFragment(seq: Column, id: Column, fraction: Double, seed: Long): Column = {
    val fragLen = greatest(floor(length(seq) * fraction), lit(1)).cast("int")
    val maxStart = (length(seq) - fragLen + 1).cast("double")
    val start = (floor(hashUnit(seed, id) * maxStart) + 1).cast("int")
    seq.substr(start, fragLen)
  }

  /** R1 — **rarefaction** (vegan::rrarefy; reference
    * bin/interpersonaldiversity.R:60-76): per group, draw exactly
    * `depth` units without replacement from the count vector
    * (multivariate hypergeometric), so every group has equal depth;
    * items drawn to zero disappear.
    *
    * Groups whose total < depth are dropped (vegan warns and keeps —
    * the reference pre-filters with min-depth, so dropping is the
    * composed behavior).
    *
    * Distributed: one shuffle on the group key, then each group draws
    * locally with an RNG seeded by (seed, groupKey) — deterministic
    * under any partitioning. Per-item draws use the sequential
    * conditional-hypergeometric decomposition, O(items) per group.
    *
    * Input (group, item, count) → output (group, item, count).
    */
  def rarefy(df: DataFrame, depth: Long, seed: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("group").cast("string"), col("item").cast("string"),
        col("count").cast("long"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (grp, it) =>
        val items = it.map(t => (t._2, t._3)).toArray.sortBy(_._1)
        val total = items.map(_._2).sum
        if (total < depth) Iterator.empty
        else {
          val rng = new scala.util.Random(seed ^ scala.util.hashing.MurmurHash3
            .stringHash(grp).toLong << 17)
          var remainingTotal = total
          var remainingDraw = depth
          items.iterator.flatMap { case (item, c) =>
            // X ~ Hypergeometric(remainingTotal, c, remainingDraw)
            val x = hypergeometric(rng, remainingTotal, c, remainingDraw)
            remainingTotal -= c
            remainingDraw -= x
            if (x > 0) Iterator((grp, item, x)) else Iterator.empty
          }
        }
      }.toDF("group", "item", "count")
  }

  /** R1, deterministic twin: **proportional rarefaction** by largest-
    * remainder (Hamilton) apportionment — the expected-value form of
    * [[rarefy]]. Each group's counts scale to exactly `depth` units:
    * base = ⌊depth·count/total⌋, then the leftover units go to the
    * largest scaled remainders (ties by item id). Use when equal-depth
    * normalization must be reproducible across engines — pure integer
    * arithmetic, no RNG, so an external oracle replays it exactly;
    * [[rarefy]] remains the statistically faithful (hypergeometric)
    * form. Same scale shape: one shuffle on the group key, window math
    * within groups. Groups with total < depth are dropped, matching
    * [[rarefy]]. */
  def rarefyProportional(df: DataFrame, depth: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy("group")
    val ranked = df.select(col("group").cast("string").as("group"),
        col("item").cast("string").as("item"), col("count").cast("long").as("count"))
      .withColumn("total", sum(col("count")).over(byGroup))
      .where(col("total") >= depth)
      .withColumn("base", expr(s"($depth * count) div total"))
      .withColumn("rem", lit(depth) * col("count") - col("base") * col("total"))
      .withColumn("leftover", lit(depth) - sum(col("base")).over(byGroup))
      .withColumn("rk", row_number().over(
        byGroup.orderBy(col("rem").desc, col("item"))))
    ranked
      .select(col("group"), col("item"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("count"))
      .where(col("count") > 0)
  }

  /** M12 — rarefaction curve (vegan::rarecurve; reference
    * bin/OpfRarefaction.R:12-16): distinct-item richness per group at
    * each depth. One rarefy pass per depth, union-all tagged by depth. */
  def rarefactionCurve(df: DataFrame, depths: Seq[Long], seed: Long): DataFrame =
    depths.map { dep =>
      rarefy(df, dep, seed)
        .groupBy("group")
        .agg(count(lit(1)).as("richness"))
        .withColumn("depth", lit(dep))
    }.reduce(_ unionByName _)

  /** Sample from Hypergeometric(N, K, n): number of "successes" when
    * drawing n without replacement from N units of which K are
    * successes. Inverse-CDF walk in log space — exact, O(K). */
  private[operators] def hypergeometric(rng: scala.util.Random, N: Long, K: Long,
      n: Long): Long = {
    if (n <= 0 || K <= 0) return 0L
    if (n >= N) return K
    val kMax = math.min(K, n)
    val xMin = math.max(0L, n - (N - K)) // support lower bound
    if (xMin == kMax) return xMin
    // Work with masses relative to the mode (value 1 there) — immune
    // to the tail underflow that kills a walk from x = xMin when the
    // support is wide. Mass ratio P(x+1)/P(x) = (K-x)(n-x)/((x+1)(N-K-n+x+1)).
    val mode = math.min(kMax, math.max(xMin, ((n + 1).toDouble * (K + 1) / (N + 2)).toLong))
    def ratio(x: Long): Double = // P(x+1)/P(x)
      (K - x).toDouble * (n - x) / ((x + 1).toDouble * (N - K - n + x + 1))
    val eps = 1e-18
    // extend left and right of the mode until masses are negligible
    var lo = mode; var hi = mode
    val masses = scala.collection.mutable.ArrayDeque(1.0)
    var m = 1.0
    while (lo > xMin && m > eps) { m /= ratio(lo - 1); masses.prepend(m); lo -= 1 }
    m = 1.0
    while (hi < kMax && m > eps) { m *= ratio(hi); masses.append(m); hi += 1 }
    val total = masses.sum
    var u = rng.nextDouble() * total
    var x = lo
    val it = masses.iterator
    while (it.hasNext && x < hi) {
      u -= it.next()
      if (u <= 0) return x
      x += 1
    }
    x
  }
}
