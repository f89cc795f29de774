package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RecommenderSpec extends SparkSpec {

  private lazy val ratings = Recommender.interactions(
    Tables.lineitem(spark, sf), Tables.orders(spark, sf)).cache()

  test("ALS fits: reconstruction RMSE beats the global-mean baseline") {
    val model = Recommender.fit(ratings)
    val (rmse, base) = Recommender.rmseVsBaseline(model, ratings)
    assert(rmse < base * 0.8, s"ALS rmse $rmse not well under baseline $base")
  }

  test("top-k recs: k per user, never an owned item, deterministic ranks") {
    val model = Recommender.fit(ratings)
    val recs = Recommender.topK(model, ratings, k = 5).cache()
    val perUser = recs.groupBy("user").count().collect()
    assert(perUser.forall(_.getLong(1) <= 5))
    assert(perUser.exists(_.getLong(1) == 5L), "no user got a full rec list")
    val owned = recs.join(ratings, Seq("user", "item"), "inner").count()
    assert(owned == 0, s"$owned recommendations are already-owned items")
    val badRk = recs.groupBy("user").agg(max("rk").as("mx"), count(lit(1)).as("n"))
      .where(col("mx") =!= col("n")).count()
    assert(badRk == 0, "rank sequence has holes")
  }

  test("heavy user owning far more than 3k items still receives a full k") {
    import spark.implicits._
    // 40 items; user 1 owns 35 of them (>> 3k for k=3), users 2..9 own a few
    val heavy = (0 until 35).map(i => (1, i, 5.0 + (i % 7)))
    val light = (2 to 9).flatMap(u => (0 until 4).map(i => (u, (u * 5 + i) % 40, 3.0 + i)))
    val r = (heavy ++ light).toDF("user", "item", "rating")
    val model = Recommender.fit(r, rank = 4, iters = 5)
    val recs = Recommender.topK(model, r, k = 3).cache()
    val heavyRecs = recs.where($"user" === 1).collect()
    assert(heavyRecs.length == 3,
      s"heavy user got ${heavyRecs.length} recs, wanted 3")
    assert(heavyRecs.forall(row => !heavy.exists(_._2 == row.getInt(2))),
      "recommended an owned item to the heavy user")
  }
}
