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
}
