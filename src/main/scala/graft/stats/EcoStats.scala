package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community-ecology statistics (SURVEY §2.11 M7-M12). The reference
  * runs these on matrices of at most a few hundred rows
  * (per-sample distances / centralities), so they are driver-local by
  * design (SURVEY §7: "inherently iterative/local; keep them
  * driver-side and bounded"). `wilcoxonRankSumDF` is the distributed
  * variant for when the two samples are themselves large.
  *
  * Normal-approximation p-values use tie AND continuity correction —
  * R's wilcox.test(correct=TRUE, exact=FALSE) default (see the cc term
  * in approxMannWhitneyP); small untied samples use the exact
  * distribution, also R's default.
  */
object EcoStats {

  // ---- ranking helpers ----

  /** Average ranks (1-based) with ties sharing the mean rank. */
  def ranks(xs: Array[Double]): Array[Double] = {
    val idx = xs.indices.sortBy(xs(_))
    val r = new Array[Double](xs.length)
    var i = 0
    while (i < idx.length) {
      var j = i
      while (j + 1 < idx.length && xs(idx(j + 1)) == xs(idx(i))) j += 1
      val avg = (i + j + 2) / 2.0 // mean of ranks i+1..j+1
      (i to j).foreach(k => r(idx(k)) = avg)
      i = j + 1
    }
    r
  }

  private def normalSf(z: Double): Double = { // 1 - Φ(z)
    // Abramowitz-Stegun 7.1.26 erfc approximation
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(z) / math.sqrt(2.0))
    val poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 +
      t * (-1.453152027 + t * 1.061405429))))
    val erfc = poly * math.exp(-z * z / 2.0)
    if (z >= 0) 0.5 * erfc else 1.0 - 0.5 * erfc
  }

  // ---- M10: Wilcoxon tests ----

  /** Two-sample Wilcoxon rank-sum (Mann-Whitney), two-sided. Exact
    * distribution for small untied samples (R's default for n<50,
    * no ties), tie-corrected normal approximation otherwise.
    * Returns (U statistic of sample x, p-value). */
  def wilcoxonRankSum(x: Array[Double], y: Array[Double]): (Double, Double) = {
    val n1 = x.length.toDouble; val n2 = y.length.toDouble
    val all = x ++ y
    val hasTies = all.distinct.length != all.length
    val r = ranks(all)
    val r1 = r.take(x.length).sum
    val u = r1 - n1 * (n1 + 1) / 2.0
    val n = n1 + n2
    if (!hasTies && n <= 30) return (u, exactMannWhitneyP(x.length, y.length, u))
    val tieTerm = all.groupBy(identity).values
      .map(g => g.length.toDouble).map(t => t * t * t - t).sum
    (u, approxMannWhitneyP(n1, n2, u, tieTerm))
  }

  /** Tie-corrected, continuity-corrected normal approximation — R's
    * wilcox.test default when exact is unavailable. */
  private def approxMannWhitneyP(n1: Double, n2: Double, u: Double,
      tieTerm: Double): Double = {
    val n = n1 + n2
    val mu = n1 * n2 / 2.0
    val sigma = math.sqrt(n1 * n2 / 12.0 * ((n + 1) - tieTerm / (n * (n - 1))))
    if (sigma == 0) return 1.0
    val cc = if (u > mu) 0.5 else if (u < mu) -0.5 else 0.0
    val z = (u - mu - cc) / sigma
    math.min(1.0, 2.0 * normalSf(math.abs(z)))
  }

  /** Exact two-sided Mann-Whitney p via the U-count recurrence
    * w(m,n,u) = w(m-1,n,u-n) + w(m,n-1,u). */
  private def exactMannWhitneyP(m: Int, n: Int, uObs: Double): Double = {
    val uMax = m * n
    // counts(u) for current (i, j) built bottom-up over i=0..m
    val table = Array.ofDim[Double](m + 1, n + 1, uMax + 1)
    (0 to n).foreach(j => table(0)(j)(0) = 1.0)
    (1 to m).foreach { i =>
      (0 to n).foreach { j =>
        (0 to uMax).foreach { u =>
          val a = if (u - j >= 0) table(i - 1)(j)(u - j) else 0.0
          val b = if (j >= 1) table(i)(j - 1)(u) else 0.0
          table(i)(j)(u) = a + b
        }
      }
    }
    val counts = table(m)(n)
    val total = counts.sum
    val uInt = math.round(uObs).toInt
    val pLower = counts.take(uInt + 1).sum / total
    val pUpper = counts.drop(uInt).sum / total
    math.min(1.0, 2.0 * math.min(pLower, pUpper))
  }

  /** Paired Wilcoxon signed-rank, two-sided normal approximation
    * (reference bin/interpersonaldiversity.R:147 wilcox.test(paired=T)). */
  def wilcoxonSignedRank(x: Array[Double], y: Array[Double]): (Double, Double) = {
    require(x.length == y.length, "paired test needs equal lengths")
    val d = x.zip(y).map { case (a, b) => a - b }.filter(_ != 0.0)
    val n = d.length.toDouble
    if (n == 0) return (0.0, 1.0)
    val r = ranks(d.map(math.abs))
    val wPlus = d.zip(r).collect { case (di, ri) if di > 0 => ri }.sum
    val mu = n * (n + 1) / 4.0
    val tieTerm = d.map(math.abs).groupBy(identity).values
      .map(g => g.length.toDouble).map(t => t * t * t - t).sum
    val sigma = math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - tieTerm / 48.0)
    if (sigma == 0) return (wPlus, 1.0)
    val z = (wPlus - mu) / sigma
    (wPlus, math.min(1.0, 2.0 * normalSf(math.abs(z))))
  }

  /** Holm-corrected pairwise rank-sum tests across groups (reference
    * pairwise.wilcox.test, bin/CompareSkin.R:247). */
  def pairwiseWilcoxonHolm(groups: Map[String, Array[Double]])
      : Seq[(String, String, Double)] = {
    val keys = groups.keys.toSeq.sorted
    val raw = for {
      i <- keys.indices; j <- (i + 1) until keys.length
    } yield (keys(i), keys(j), wilcoxonRankSum(groups(keys(i)), groups(keys(j)))._2)
    // Holm step-down
    val m = raw.length
    val sorted = raw.sortBy(_._3).zipWithIndex
    var runningMax = 0.0
    val adjusted = sorted.map { case ((a, b, p), k) =>
      runningMax = math.max(runningMax, math.min(1.0, (m - k) * p))
      (a, b, runningMax)
    }
    adjusted.sortBy(t => (t._1, t._2))
  }

  /** Distributed rank-sum: two samples as DataFrames of (value) —
    * global sort-rank via window, tie-corrected normal p. For the
    * rare case where a single test's samples are huge. */
  def wilcoxonRankSumDF(x: DataFrame, y: DataFrame, valueCol: String)
      : (Double, Double) = {
    import org.apache.spark.sql.expressions.Window
    val tagged = x.select(col(valueCol).cast("double").as("v"), lit(1).as("g"))
      .unionAll(y.select(col(valueCol).cast("double").as("v"), lit(0).as("g")))
    val ranked = tagged.withColumn("r", avg(row_number().over(
        Window.orderBy("v"))).over(Window.partitionBy("v")))
    val agg = ranked.agg(
      sum(when(col("g") === 1, col("r"))).as("r1"),
      sum(when(col("g") === 1, 1L)).as("n1"),
      count(lit(1)).as("n")).head()
    val (r1, n1, n) = (agg.getDouble(0), agg.getLong(1).toDouble, agg.getLong(2).toDouble)
    val ties = ranked.groupBy("v").agg(count(lit(1)).cast("double").as("t"))
      .agg(sum(col("t") * col("t") * col("t") - col("t"))).head().getDouble(0)
    val n2 = n - n1
    val u = r1 - n1 * (n1 + 1) / 2.0
    (u, approxMannWhitneyP(n1, n2, u, ties))
  }

  // ---- M8: ANOSIM ----

  /** ANOSIM R statistic + permutation p (vegan::anosim; reference
    * bin/interpersonaldiversity.R:194). `dist(i)(j)` symmetric,
    * `grouping` per index; seeded permutations. */
  def anosim(dist: Array[Array[Double]], grouping: Array[Int],
      permutations: Int = 999, seed: Long = 42L): (Double, Double) = {
    val n = grouping.length
    val pairs = for { i <- 0 until n; j <- (i + 1) until n } yield (i, j)
    val dvals = pairs.map { case (i, j) => dist(i)(j) }.toArray
    val r = ranks(dvals)
    def rStat(g: Array[Int]): Double = {
      var wSum = 0.0; var wCnt = 0; var bSum = 0.0; var bCnt = 0
      pairs.indices.foreach { k =>
        val (i, j) = pairs(k)
        if (g(i) == g(j)) { wSum += r(k); wCnt += 1 }
        else { bSum += r(k); bCnt += 1 }
      }
      val rw = if (wCnt == 0) 0.0 else wSum / wCnt
      val rb = if (bCnt == 0) 0.0 else bSum / bCnt
      (rb - rw) / (pairs.length / 2.0)
    }
    val obs = rStat(grouping)
    val rng = new scala.util.Random(seed)
    var ge = 1 // observed counts itself (vegan convention)
    (1 to permutations).foreach { _ =>
      val perm = rng.shuffle(grouping.toSeq).toArray
      if (rStat(perm) >= obs) ge += 1
    }
    (obs, ge.toDouble / (permutations + 1))
  }

  /** M8, distributed + engine-portable form: the whole ANOSIM — Bray-
    * Curtis distances from an abundance table, midranks, the R
    * statistic, and the permutation test — as ONE relational plan, with
    * permutations drawn from the md5-portable uniform
    * ([[graft.operators.Sampling.md5Bits32]] idiom) so an external
    * engine REPLAYS the statistic and p-value exactly:
    *  - distances are one IEEE expression over exact integer sums
    *    (the q53 Bray-Curtis idiom), used only through their RANKS;
    *  - midranks are avg(row_number) per tie-class — multiples of 0.5,
    *    so every downstream sum is exact in binary regardless of
    *    accumulation order;
    *  - permutation p assigns the grouping of the sample at canonical
    *    position row_number(ORDER BY md5(seed|p|sample), sample);
    *    p = 0 is the identity (the observed labeling).
    * Output: one row (r_statistic, n_ge, p_value) with the vegan
    * convention p = (n_ge + 1) / (permutations + 1) (reference
    * bin/interpersonaldiversity.R:194). Scale: pair count is
    * quadratic in SAMPLES (inherent to ANOSIM — bounded input by
    * design), items only pass through one equi-join + aggregation. */
  def anosimPortable(ab: DataFrame, sampleCol: String, groupCol: String,
      itemCol: String, valueCol: String, permutations: Int = 99,
      seed: Long = 7L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = ab.sparkSession
    // sample-level from here on: #samples rows by contract, so the
    // tiny downstream stages run single-task (the data-scale work is
    // the abundance agg above this call and the item self-join below)
    val samples = ab.groupBy(col(sampleCol).as("s"), col(groupCol).as("g"))
      .agg(sum(col(valueCol).cast("long")).as("tot")).coalesce(1)
    // shared-item Σmin per pair (a < b); pairs sharing nothing get 0
    val a = ab.select(col(sampleCol).as("sa"), col(itemCol).as("item"),
      col(valueCol).cast("long").as("va"))
    val b = ab.select(col(sampleCol).as("sb"), col(itemCol).as("item"),
      col(valueCol).cast("long").as("vb"))
    val minsum = a.join(b, Seq("item")).where(col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(sum(least(col("va"), col("vb"))).as("m"))
      .coalesce(1)
    val pairs = samples.select(col("s").as("sa"), col("tot").as("ta"))
      .crossJoin(broadcast(samples.select(col("s").as("sb"), col("tot").as("tb"))))
      .where(col("sa") < col("sb"))
      .join(minsum, Seq("sa", "sb"), "left_outer")
      .select(col("sa"), col("sb"),
        (lit(1.0) - lit(2.0) * coalesce(col("m"), lit(0L)).cast("double") /
          (col("ta") + col("tb")).cast("double")).as("d"))
    // materialize the SAMPLE-LEVEL rank table (≤ #samples² rows by
    // contract): it is the root of everything downstream, and an
    // un-checkpointed frame would splice the whole data-scale
    // abundance-agg + item-self-join subtree into the permutation
    // plan — round 13 measured q133/q134 spending most of their gate
    // time in Catalyst planning + duplicated subtree re-execution
    // (5.8 s SQL execution with <1 s of stage time)
    val ranked = pairs
      .withColumn("rn", row_number().over(Window.orderBy("d", "sa", "sb")))
      .withColumn("r", avg(col("rn")).over(Window.partitionBy("d")))
      .select("sa", "sb", "r")
      .localCheckpoint(true)
    // portable permutations: p=0 identity, p>=1 the md5 shuffle.
    // base is referenced twice below (the shuffle and the position
    // lookup) — checkpointed so the samples aggregate runs once.
    val base = samples.select(col("s"), col("g"))
      .withColumn("k", row_number().over(Window.orderBy("s")))
      .localCheckpoint(true)
    val ps = spark.range(0, permutations + 1).select(col("id").cast("int").as("p"))
    val wh = base.crossJoin(broadcast(ps)).withColumn("h",
      graft.functions.HexSlice32(md5(concat(lit(seed.toString), lit("|"),
        col("p").cast("string"), lit("|"), col("s"))), lit(0)))
      .withColumn("hr", row_number().over(Window.partitionBy("p").orderBy("h", "s")))
    val assign = wh
      .select(col("p"), col("s"),
        when(col("p") === 0, col("k")).otherwise(col("hr")).as("pos"))
      .join(base.select(col("k").as("pos"), col("g").as("gp")), Seq("pos"))
    val rs = ranked
      .join(assign.select(col("p"), col("s").as("sa"), col("gp").as("ga")), Seq("sa"))
      .join(assign.select(col("p"), col("s").as("sb"), col("gp").as("gb")), Seq("p", "sb"))
      .groupBy("p")
      .agg(((avg(when(col("ga") =!= col("gb"), col("r"))) -
        avg(when(col("ga") === col("gb"), col("r")))) /
        (count(lit(1)).cast("double") / lit(2))).as("rstat"))
    val obs = rs.where(col("p") === 0).select(col("rstat").as("r_obs"))
    rs.where(col("p") > 0).crossJoin(broadcast(obs))
      .agg(max(col("r_obs")).as("r_statistic"),
        sum(when(col("rstat") >= col("r_obs"), 1L).otherwise(0L)).as("n_ge"))
      .select(col("r_statistic"), col("n_ge"),
        ((col("n_ge") + lit(1)).cast("double") / lit(permutations + 1))
          .as("p_value"))
  }

  /** M10, distributed + engine-portable form: pairwise two-sample
    * Wilcoxon rank-sum over a long (grp, id, v) table, permutation
    * two-sided p — the q133 midrank idiom applied to the rank-sum
    * statistic so an external engine replays EVERY number:
    *  - `v` must already be an exact integer (scale decimals with the
    *    ExactNum idiom first);
    *  - midranks are carried doubled — mid2 = min(rn)+max(rn) over the
    *    tie window — so rank sums are pure BIGINTs (W2 = 2W, U2 = 2U);
    *  - the permutation test exploits that relabeling a pooled sample
    *    leaves pooled ranks FIXED: each permutation only re-selects
    *    which n1 observations count as group 1, via the md5-portable
    *    uniform (q101 idiom), so no re-ranking per permutation;
    *  - two-sided deviation |U2 − n1·n2| is an exact BIGINT; the only
    *    float outputs are u = U2/2 and p = (n_ge+1)/(B+1), one IEEE
    *    division each.
    * The driver-local [[wilcoxonRankSum]] keeps R's exact/normal
    * p-values (golden-pinned in specs); THIS gates the rank arithmetic
    * distributively with a replayable permutation p. Scale: windows
    * and aggs are keyed by (pair) / (pair, permutation); B bounds the
    * expansion. Output per pair g1 < g2:
    * (g1, g2, n1, n2, w2, u, n_ge, p_value). */
  def wilcoxonPairsPortable(obs: DataFrame, permutations: Int = 99,
      seed: Long = 11L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = obs.sparkSession
    val o = obs.select(col("grp"), col("id"), col("v").cast("long").as("v"))
    val gs = o.select("grp").distinct()
    val pairs = gs.select(col("grp").as("g1"))
      .crossJoin(gs.select(col("grp").as("g2"))).where(col("g1") < col("g2"))
    val pooled = o.join(broadcast(pairs),
      col("grp") === col("g1") || col("grp") === col("g2"))
    val byPair = Window.partitionBy("g1", "g2")
    val tieWin = Window.partitionBy("g1", "g2", "v")
    val ranked = pooled
      .withColumn("rn", row_number().over(byPair.orderBy(col("v"), col("id"))))
      .withColumn("mid2",
        min(col("rn")).over(tieWin) + max(col("rn")).over(tieWin))
    val sizes = pooled.groupBy("g1", "g2")
      .agg(sum(when(col("grp") === col("g1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("grp") === col("g2"), 1L).otherwise(0L)).as("n2"))
    val ps = spark.range(0, permutations + 1).select(col("id").cast("int").as("p"))
    val wh = ranked.select("g1", "g2", "grp", "id", "mid2")
      .crossJoin(broadcast(ps))
      .withColumn("h",
        graft.functions.HexSlice32(md5(concat(lit(seed.toString), lit("|"),
          col("p").cast("string"), lit("|"), col("id").cast("string"))), lit(0)))
      .withColumn("hr", row_number().over(
        Window.partitionBy("g1", "g2", "p").orderBy(col("h"), col("id"))))
    val w = wh.join(sizes, Seq("g1", "g2"))
      .where(when(col("p") === 0, col("grp") === col("g1"))
        .otherwise(col("hr") <= col("n1")))
      .groupBy("g1", "g2", "p")
      .agg(sum(col("mid2")).as("w2"), max(col("n1")).as("n1"),
        max(col("n2")).as("n2"))
      .withColumn("u2", col("w2") - col("n1") * (col("n1") + 1))
      .withColumn("dev", abs(col("u2") - col("n1") * col("n2")))
    val obs0 = w.where(col("p") === 0)
      .select(col("g1"), col("g2"), col("w2").as("w2o"), col("u2").as("u2o"),
        col("dev").as("devo"))
    w.where(col("p") > 0).join(obs0, Seq("g1", "g2"))
      .groupBy("g1", "g2")
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(col("w2o")).as("w2"),
        (max(col("u2o")).cast("double") / 2).as("u"),
        sum(when(col("dev") >= col("devo"), 1L).otherwise(0L)).as("n_ge"))
      .select(col("g1"), col("g2"), col("n1"), col("n2"), col("w2"), col("u"),
        col("n_ge"),
        ((col("n_ge") + lit(1)).cast("double") / lit(permutations + 1))
          .as("p_value"))
  }

  /** M9, distributed + engine-portable form: PERMDISP (betadisper +
    * permutest) as ONE relational plan with every decision integer-
    * exact, so an external engine replays F and the permutation p:
    *  - Bray-Curtis distances are one IEEE expression over exact
    *    integer sums, then SCALED to BIGINTs (round(d·10⁶), the q77
    *    idiom) before anything is compared or summed;
    *  - the group medoid is the argmin of exact integer distance sums
    *    (tie → smallest sample), so medoid selection replays exactly;
    *  - dispersions are the scaled integer distances to the medoid;
    *  - permutations shuffle DISPERSION group labels (vegan's
    *    permutest permutes residuals, not distances — medoids are not
    *    recomputed) via the md5-portable uniform;
    *  - with equal group sizes m (k groups, n = k·m), the F statistic
    *    reduces to ONE float expression of exact BIGINTs:
    *    F = ISSB·(n−k) / (n²·(k−1)·ISSW) where
    *    ISSB = Σ_g (n·S_g − m·S)² and ISSW = m·ΣQ_g − ΣS_g².
    * Requires equal-size groups (the reduction above); the general
    * unequal-size form stays on the driver-local [[permdisp]].
    * Output: one row (f_statistic, n_ge, p_value), vegan convention
    * p = (n_ge + 1)/(permutations + 1). */
  def permdispPortable(ab: DataFrame, sampleCol: String, groupCol: String,
      itemCol: String, valueCol: String, permutations: Int = 99,
      seed: Long = 11L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = ab.sparkSession
    // sample-level from here on: #samples rows by contract, so the
    // tiny downstream stages run single-task (the data-scale work is
    // the abundance agg above this call and the item self-join below)
    val samples = ab.groupBy(col(sampleCol).as("s"), col(groupCol).as("g"))
      .agg(sum(col(valueCol).cast("long")).as("tot")).coalesce(1)
    val a = ab.select(col(sampleCol).as("sa"), col(itemCol).as("item"),
      col(valueCol).cast("long").as("va"))
    val b = ab.select(col(sampleCol).as("sb"), col(itemCol).as("item"),
      col(valueCol).cast("long").as("vb"))
    val minsum = a.join(b, Seq("item")).where(col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(sum(least(col("va"), col("vb"))).as("m"))
      .coalesce(1)
    val half = samples.select(col("s").as("sa"), col("tot").as("ta"))
      .crossJoin(broadcast(samples.select(col("s").as("sb"), col("tot").as("tb"))))
      .where(col("sa") < col("sb"))
      .join(minsum, Seq("sa", "sb"), "left_outer")
      .select(col("sa"), col("sb"),
        round((lit(1.0) - lit(2.0) * coalesce(col("m"), lit(0L)).cast("double") /
          (col("ta") + col("tb")).cast("double")) * 1000000, 0)
          .cast("long").as("di"))
      // sample-pair-level (≤ #samples² rows): checkpointed because the
      // symmetric view below references it TWICE and the medoid /
      // dispersion joins fan further — see the q133 note above
      .localCheckpoint(true)
    // symmetric view: distance FROM x TO y, both directions
    val sym = half.select(col("sa").as("x"), col("sb").as("y"), col("di"))
      .unionByName(half.select(col("sb").as("x"), col("sa").as("y"), col("di")))
    val gOf = samples.select(col("s"), col("g"))
    // within-group distance sums → medoid = argmin (sum, sample)
    val within = sym
      .join(gOf.select(col("s").as("x"), col("g")), Seq("x"))
      .join(gOf.select(col("s").as("y"), col("g").as("gy")), Seq("y"))
      .where(col("g") === col("gy"))
    val medoid = within.groupBy(col("g"), col("x"))
      .agg(sum(col("di")).as("sd"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("sd"), col("x"))))
      .where(col("rk") === 1)
      .select(col("g"), col("x").as("medoid"))
    // dispersion of each sample: scaled distance to its group medoid
    // (the medoid itself: 0)
    val disp = gOf.join(medoid, Seq("g"))
      .join(sym.select(col("x").as("s"), col("y").as("medoid"), col("di")),
        Seq("s", "medoid"), "left_outer")
      .select(col("s"), col("g"), coalesce(col("di"), lit(0L)).as("dsp"))
    // portable permutations of the GROUP LABELS over dispersions;
    // base (#samples rows) is referenced twice — checkpoint it
    val base = disp.withColumn("k", row_number().over(Window.orderBy("s")))
      .localCheckpoint(true)
    val ps = spark.range(0, permutations + 1).select(col("id").cast("int").as("p"))
    val assign = base.select(col("s"), col("k"), col("dsp")).crossJoin(broadcast(ps))
      .withColumn("h",
        graft.functions.HexSlice32(md5(concat(lit(seed.toString), lit("|"),
          col("p").cast("string"), lit("|"), col("s"))), lit(0)))
      .withColumn("hr", row_number().over(Window.partitionBy("p").orderBy("h", "s")))
      .select(col("p"), col("dsp"),
        when(col("p") === 0, col("k")).otherwise(col("hr")).as("pos"))
      .join(base.select(col("k").as("pos"), col("g").as("gp")), Seq("pos"))
    // per-perm per-group exact sums → the integer F reduction
    val perGroup = assign.groupBy(col("p"), col("gp"))
      .agg(count(lit(1)).as("m"), sum(col("dsp")).as("sg"),
        sum(col("dsp") * col("dsp")).as("qg"))
    val fs = perGroup.groupBy("p").agg(
      count(lit(1)).as("k"), sum(col("m")).as("n"), max(col("m")).as("mx"),
      min(col("m")).as("mn"), sum(col("sg")).as("s"),
      sum((lit(0L) + col("sg")) * col("sg")).as("ssq"), sum(col("qg")).as("q"))
      .select(col("p"),
        // ISSB needs Σ(n·S_g − m·S)²: expand to n²·ΣS_g² − 2nmS·ΣS_g + k·m²S²
        // = n²·ssq − 2·n·m·s·s + k·m²·s² (ΣS_g = S); all BIGINT-exact
        (col("n") * col("n") * col("ssq") - lit(2L) * col("n") * col("mx") * col("s") * col("s")
          + col("k") * col("mx") * col("mx") * col("s") * col("s")).as("issb"),
        (col("mx") * col("q") - col("ssq")).as("issw"),
        col("k"), col("n"), col("mx"), col("mn"))
    // Guard (the q120 lesson): 0/0 is NaN in Spark but engine-dependent
    // elsewhere, and the integer reduction is only valid for equal group
    // sizes — emit NULL on both violations so every engine agrees (a NULL
    // fstat contributes 0 to n_ge under both when() and CASE WHEN).
    val f = fs.select(col("p"),
      when(col("issw") === 0L || col("mx") =!= col("mn"), lit(null).cast("double"))
        .otherwise(col("issb").cast("double") * (col("n") - col("k")) /
          (col("n").cast("double") * col("n") * (col("k") - 1) * col("issw")))
        .as("fstat"))
    val obs = f.where(col("p") === 0).select(col("fstat").as("f_obs"))
    f.where(col("p") > 0).crossJoin(broadcast(obs))
      .agg(max(col("f_obs")).as("f_statistic"),
        sum(when(col("fstat") >= col("f_obs"), 1L).otherwise(0L)).as("n_ge"))
      .select(col("f_statistic"), col("n_ge"),
        ((col("n_ge") + lit(1)).cast("double") / lit(permutations + 1))
          .as("p_value"))
  }

  // ---- M9: PERMDISP (betadisper + permutest, simplified) ----

  /** Multivariate homogeneity of dispersions: distance of each point
    * to its group's spatial median proxy (centroid in the distance
    * space via PCoA is the full method; this uses the medoid — the
    * point minimizing summed distance), F-statistic across groups,
    * permutation p. */
  def permdisp(dist: Array[Array[Double]], grouping: Array[Int],
      permutations: Int = 999, seed: Long = 42L): (Double, Double) = {
    val n = grouping.length
    def dispersions(g: Array[Int]): Array[Double] = {
      val byG = (0 until n).groupBy(g(_))
      val medoid = byG.map { case (grp, idxs) =>
        grp -> idxs.minBy(i => idxs.map(j => dist(i)(j)).sum)
      }
      (0 until n).map(i => dist(i)(medoid(g(i)))).toArray
    }
    def fStat(g: Array[Int]): Double = {
      val d = dispersions(g)
      val byG = (0 until n).groupBy(g(_)).values.toSeq
      val grand = d.sum / n
      val k = byG.size
      if (k < 2 || n - k == 0) return 0.0
      val ssb = byG.map { idxs =>
        val m = idxs.map(d(_)).sum / idxs.size
        idxs.size * (m - grand) * (m - grand)
      }.sum
      val ssw = byG.map { idxs =>
        val m = idxs.map(d(_)).sum / idxs.size
        idxs.map(i => (d(i) - m) * (d(i) - m)).sum
      }.sum
      if (ssw == 0) 0.0 else (ssb / (k - 1)) / (ssw / (n - k))
    }
    val obs = fStat(grouping)
    val rng = new scala.util.Random(seed)
    var ge = 1
    (1 to permutations).foreach { _ =>
      if (fStat(rng.shuffle(grouping.toSeq).toArray) >= obs) ge += 1
    }
    (obs, ge.toDouble / (permutations + 1))
  }

  // ---- M11: KDE-based empirical CDF below zero ----

  /** P(X < 0) via Gaussian KDE with Silverman bandwidth (reference
    * density→approxfun→integrate, bin/interpersonaldiversity.R:141-145). */
  def kdeCdfBelowZero(xs: Array[Double]): Double = {
    val n = xs.length
    if (n == 0) return 0.0
    val mean = xs.sum / n
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / math.max(1, n - 1))
    val sorted = xs.sorted
    val iqr = sorted(((n - 1) * 3) / 4) - sorted((n - 1) / 4)
    val h0 = 0.9 * math.min(sd, if (iqr > 0) iqr / 1.34 else sd) * math.pow(n, -0.2)
    val h = if (h0 > 0) h0 else 1e-9
    xs.map(x => 1.0 - normalSf(-x / h)).sum / n // Σ Φ((0 - x)/h) / n
  }

  // ---- M7: NMDS (PCoA start + Kruskal stress majorization) ----

  /** Non-metric MDS to k dims: classical PCoA initialization then
    * iterative monotone-regression stress minimization (vegan
    * metaMDS analog; reference bin/interpersonaldiversity.R:177).
    * Returns (coordinates[n][k], final stress). */
  def nmds(dist: Array[Array[Double]], k: Int = 2, iters: Int = 100,
      seed: Long = 42L): (Array[Array[Double]], Double) = {
    val n = dist.length
    if (n == 0) return (Array.empty, 0.0)
    // --- PCoA init: double-center -0.5*D², top-k eigenvectors (power iteration)
    val b = Array.tabulate(n, n) { (i, j) => -0.5 * dist(i)(j) * dist(i)(j) }
    val rowMean = b.map(r => r.sum / n)
    val grand = rowMean.sum / n
    val g = Array.tabulate(n, n) { (i, j) => b(i)(j) - rowMean(i) - rowMean(j) + grand }
    val rng = new scala.util.Random(seed)
    val coords = Array.fill(n, k)(0.0)
    val deflated = g.map(_.clone())
    (0 until k).foreach { dim =>
      var v = Array.fill(n)(rng.nextGaussian())
      (0 until 100).foreach { _ =>
        val w = Array.tabulate(n)(i => (0 until n).map(j => deflated(i)(j) * v(j)).sum)
        val norm = math.sqrt(w.map(x => x * x).sum)
        if (norm > 0) v = w.map(_ / norm)
      }
      val lambda = (0 until n).map(i => v(i) *
        (0 until n).map(j => deflated(i)(j) * v(j)).sum).sum
      val scale = math.sqrt(math.abs(lambda))
      (0 until n).foreach(i => coords(i)(dim) = v(i) * scale)
      (0 until n).foreach(i => (0 until n).foreach(j =>
        deflated(i)(j) -= lambda * v(i) * v(j)))
    }
    // --- Kruskal iterations: isotonic fit of config distances to dissimilarity order
    val pairs = (for { i <- 0 until n; j <- (i + 1) until n } yield (i, j)).toArray
    val order = pairs.indices.sortBy(pi => dist(pairs(pi)._1)(pairs(pi)._2)).toArray
    def cdist(a: Int, bI: Int) =
      math.sqrt((0 until k).map(d => math.pow(coords(a)(d) - coords(bI)(d), 2)).sum)
    var stress = Double.MaxValue
    (0 until iters).foreach { _ =>
      val dv = pairs.map { case (i, j) => cdist(i, j) }
      // pool-adjacent-violators over dissimilarity order
      val fitted = new Array[Double](pairs.length)
      val vals = order.map(dv(_))
      val blockSum = scala.collection.mutable.ArrayBuffer[(Double, Int)]()
      vals.foreach { v =>
        blockSum += ((v, 1))
        while (blockSum.length > 1 && {
          val (s2, c2) = blockSum(blockSum.length - 1)
          val (s1, c1) = blockSum(blockSum.length - 2)
          s1 / c1 > s2 / c2
        }) {
          val (s2, c2) = blockSum.remove(blockSum.length - 1)
          val (s1, c1) = blockSum.remove(blockSum.length - 1)
          blockSum += ((s1 + s2, c1 + c2))
        }
      }
      var pos = 0
      blockSum.foreach { case (s, c) =>
        (0 until c).foreach { _ => fitted(order(pos)) = s / c; pos += 1 }
      }
      val num = pairs.indices.map(pi => math.pow(dv(pi) - fitted(pi), 2)).sum
      val den = pairs.indices.map(pi => dv(pi) * dv(pi)).sum
      stress = if (den == 0) 0.0 else math.sqrt(num / den)
      // Guttman transform step toward fitted distances
      val newCoords = Array.fill(n, k)(0.0)
      pairs.indices.foreach { pi =>
        val (i, j) = pairs(pi)
        val d = dv(pi)
        val ratio = if (d > 1e-12) fitted(pi) / d else 0.0
        (0 until k).foreach { dim =>
          val diff = coords(i)(dim) - coords(j)(dim)
          newCoords(i)(dim) += coords(j)(dim) + ratio * diff
          newCoords(j)(dim) += coords(i)(dim) - ratio * diff
        }
      }
      (0 until n).foreach(i => (0 until k).foreach(d =>
        coords(i)(d) = newCoords(i)(d) / (n - 1)))
    }
    (coords, stress)
  }
}
