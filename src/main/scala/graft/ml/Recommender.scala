package graft.ml

import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collaborative-filtering recommender (beyond-reference ML breadth
  * next to the RF classifier): ALS matrix factorization over the
  * implicit customer→part interaction strengths derived from order
  * quantities — the "customers who bought X" model a commerce
  * pipeline trains on exactly this schema.
  *
  * Scale notes: ALS is THE distributed factorization (alternating
  * least squares block-solves user/item factor matrices; shuffle per
  * iteration ∝ ratings, state ∝ (users+items)·rank). Seeded runs are
  * deterministic for a fixed partitioning; like the RF family the
  * gate evidence is rows-only + spec laws (matrix factorization has
  * no ANSI-SQL form), with the spec asserting the model genuinely
  * fits: reconstruction RMSE must beat the global-mean baseline by a
  * margin on training interactions.
  */
object Recommender {

  /** (customer, part, strength) implicit ratings: summed quantities,
    * log-free (integer) so the table is engine-exact. */
  def interactions(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").cast("int").as("user"),
        col("l_partkey").cast("int").as("item"))
      .agg(sum(col("l_quantity").cast("double")).as("rating"))

  def fit(ratings: DataFrame, rank: Int = 8, iters: Int = 6,
      reg: Double = 0.1, seed: Long = 42L)
      : org.apache.spark.ml.recommendation.ALSModel =
    new ALS().setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setRank(rank).setMaxIter(iters).setRegParam(reg).setSeed(seed)
      .setImplicitPrefs(false).setColdStartStrategy("drop")
      .fit(ratings)

  /** Top-k part recommendations per customer, EXCLUDING already-
    * purchased parts (the deployment form). Deterministic given the
    * model: ties break on item id.
    *
    * Two-pass candidate pull: every user first gets a cheap `k·4`
    * over-fetch; only the users the anti-join leaves SHORT of k (they
    * owned too many of their top-scored items) are re-fetched via
    * `recommendForUserSubset` at `k + their max owned count` — so a
    * heavy user still receives a full k, but the heavy tail no longer
    * prices the whole fleet's candidate generation (the earlier
    * uniform `k + max(owned)` pull made EVERY user pay the heaviest
    * user's depth: measured 7.7 s → 17.7 s on the gate; this form
    * restores the cheap path and the short set is empty there). */
  def topK(model: org.apache.spark.ml.recommendation.ALSModel,
      ratings: DataFrame, k: Int): DataFrame = {
    def unseen(recs: DataFrame): DataFrame = recs
      .select(col("user"), explode(col("recommendations")).as("r"))
      .select(col("user"), col("r.item").as("item"),
        col("r.rating").as("score"))
      .join(ratings.select(col("user"), col("item"), lit(1).as("owned")),
        Seq("user", "item"), "left_outer")
      .where(col("owned").isNull)
    def rank(recs: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      recs.withColumn("rk", row_number().over(
          Window.partitionBy("user").orderBy(col("score").desc, col("item"))))
        .where(col("rk") <= k)
        .select(col("user"), col("rk").cast("long").as("rk"), col("item"))
    }
    // cache scope is THIS call: the result is materialized (eager
    // localCheckpoint — executor-memory blocks the ContextCleaner
    // reclaims once the frame is unreachable) before the finally
    // unpersists, so repeated topK calls no longer accrete cached
    // candidate frames for the session's lifetime
    val first = rank(unseen(model.recommendForAllUsers(k * 4))).cache()
    try {
      // shortness is judged against the FULL user universe: a user whose
      // every candidate was owned has zero rows in `first`, not a small
      // count — a groupBy over `first` alone would never see them
      val short = ratings.groupBy("user").agg(count(lit(1)).as("owned"))
        .join(first.groupBy("user").agg(count(lit(1)).as("n")),
          Seq("user"), "left_outer")
        .where(coalesce(col("n"), lit(0L)) < k)
        .select("user", "owned")
      val shortRows = short.collect() // user ids only; empty in the common case
      val out =
        if (shortRows.isEmpty) first
        else {
          val depth = k + shortRows.map(_.getLong(1)).max.toInt
          val users = short.select("user")
          val retry = rank(unseen(model.recommendForUserSubset(users, depth)))
          first.join(users.withColumnRenamed("user", "u"),
              col("user") === col("u"), "left_anti")
            .unionByName(retry)
        }
      out.localCheckpoint(true)
    } finally first.unpersist()
  }

  /** Rank-1 ALS in EXACT scaled-integer arithmetic — the driver-
    * oracle-able twin of [[fit]] (the q90/q96/q199 ExactNum idiom
    * applied to matrix factorization). Alternating least squares at
    * rank 1 has a closed per-row solve — `u = Σ r·v / Σ v²` over the
    * user's OBSERVED items, then the symmetric item step — i.e. the
    * observed-entry power iteration; every sum is an order-
    * independent BIGINT, every division is one rounded scaled
    * integer op (`⌊a/b + ½⌋ = (2a+b) div 2b`), and each half-step
    * max-normalizes to the 1e3 factor scale, so ANY engine replays
    * the trajectory bit-for-bit — the oracle unrolls the iterations
    * as chained CTEs. Two-and-a-half alternations (v₀=1000 const →
    * u₁ → v₁ → u₂) then top-k unseen scoring `u₂·v₁` per selected
    * user, ties on item id. Same shuffle shape per step as [[fit]]
    * (join ratings with the fixed side, aggregate by the solved
    * side); the candidate cross join is bounded by the user-modulus
    * selection, never all users × all items. */
  def alsRank1ExactScaled(interactions: DataFrame, userMod: Long,
      k: Int): DataFrame = {
    val r = interactions.select(col("user").cast("long").as("u"),
      col("item").cast("long").as("i"), col("rating").cast("long").as("r"))
      .localCheckpoint(true) // read 5× below; plan once
    def solveNorm(grouped: DataFrame): DataFrame = {
      // grouped: (id, num, den) → rounded scaled solve, then
      // max-normalize to the 1e3 factor scale (both integer-exact).
      // The solve MATERIALIZES before the crossJoin: `s` feeds both
      // sides (values + their max), and the normalized factor feeds
      // both the next alternation and the scoring join — without the
      // checkpoints each reuse re-executes the ratings-sized upstream
      // join, compounding across alternations (measured ~2× the gate)
      val s = grouped.selectExpr("id",
        "CASE WHEN den = 0 THEN 0L ELSE (2*num*1000000 + den) DIV (2*den) END AS s")
        .localCheckpoint(true)
      s.crossJoin(s.agg(max(col("s")).as("m")))
        .selectExpr("id", "CASE WHEN m = 0 THEN 0L ELSE (2*s*1000 + m) DIV (2*m) END AS f")
        .localCheckpoint(true)
    }
    val u1 = solveNorm(r.groupBy(col("u").as("id"))
      .agg((sum(col("r")) * 1000L).as("num"),
        (count(lit(1)) * 1000000L).as("den")))
    val v1 = solveNorm(r.join(u1.withColumnRenamed("id", "u"), "u")
      .groupBy(col("i").as("id"))
      .agg(sum(col("r") * col("f")).as("num"),
        sum(col("f") * col("f")).as("den")))
    val u2 = solveNorm(r.join(v1.withColumnRenamed("id", "i"), "i")
      .groupBy(col("u").as("id"))
      .agg(sum(col("r") * col("f")).as("num"),
        sum(col("f") * col("f")).as("den")))
    val users = u2.where(col("id") % userMod === 0)
      .select(col("id").as("u"), col("f").as("uf"))
    val cand = users.crossJoin(
        v1.select(col("id").as("i"), col("f").as("vf")))
      .join(r.select("u", "i"), Seq("u", "i"), "left_anti")
      .select(col("u"), col("i"), (col("uf") * col("vf")).as("score"))
    import org.apache.spark.sql.expressions.Window
    cand.withColumn("rk", row_number().over(
        Window.partitionBy("u").orderBy(col("score").desc, col("i"))))
      .where(col("rk") <= k)
      .select(col("u").as("user"), col("rk").cast("long").as("rk"),
        col("i").as("item"), col("score"))
  }

  /** Training-set reconstruction RMSE of the model vs the global-mean
    * baseline — the fit-quality pair the spec asserts on. */
  def rmseVsBaseline(model: org.apache.spark.ml.recommendation.ALSModel,
      ratings: DataFrame): (Double, Double) = {
    val pred = model.transform(ratings)
      .select(col("rating"), col("prediction").cast("double"))
    val n = pred.count().toDouble
    val rmse = math.sqrt(pred.select(
      sum(pow(col("rating") - col("prediction"), 2)).as("s"))
      .head().getDouble(0) / n)
    val mean = ratings.select(avg("rating")).head().getDouble(0)
    val base = math.sqrt(ratings.select(
      sum(pow(col("rating") - mean, 2)).as("s")).head().getDouble(0) / n)
    (rmse, base)
  }
}
