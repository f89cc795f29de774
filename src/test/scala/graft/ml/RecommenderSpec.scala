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

  /** Parity law wiring spark.ml ALS (the q235 production tier) to the
    * exact rank-1 alternating-solve family q296 gates (the q57↔q90
    * pattern): at rank 1 with negligible regularization, ALS IS the
    * observed-entry power iteration — u = Σrv/Σv², v = Σru/Σu² —
    * whose fixed point is init-independent (positive ratings, one
    * dominant direction). The driver-side float reference runs the
    * same alternation to convergence; the fitted spark.ml item
    * factors must align with it in direction (cosine after sign
    * orientation), which pins the production solver's NUMERICS, not
    * just its API shape — the evidence that lets q235 stay rows-only
    * honestly. */
  test("rank-1 ALS parity: spark.ml factors align with the exact alternating-solve twin") {
    val rows = ratings.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val users = rows.map(_._1).distinct.sorted
    val items = rows.map(_._2).distinct.sorted
    val uIdx = users.zipWithIndex.toMap
    val iIdx = items.zipWithIndex.toMap
    var u = Array.fill(users.length)(0.0)
    var v = Array.fill(items.length)(1.0)
    (1 to 200).foreach { _ =>
      val num = Array.fill(users.length)(0.0); val den = Array.fill(users.length)(0.0)
      rows.foreach { case (uu, ii, r) =>
        num(uIdx(uu)) += r * v(iIdx(ii)); den(uIdx(uu)) += v(iIdx(ii)) * v(iIdx(ii))
      }
      u = num.zip(den).map { case (n, d) => if (d == 0) 0.0 else n / d }
      val ni = Array.fill(items.length)(0.0); val di = Array.fill(items.length)(0.0)
      rows.foreach { case (uu, ii, r) =>
        ni(iIdx(ii)) += r * u(uIdx(uu)); di(iIdx(ii)) += u(uIdx(uu)) * u(uIdx(uu))
      }
      v = ni.zip(di).map { case (n, d) => if (d == 0) 0.0 else n / d }
      val m = v.map(math.abs).max
      v = v.map(_ / m) // normalize like the exact-scaled form
    }
    // ALS's per-iteration lineage needs a checkpoint dir past ~15
    // iterations (task serialization overflows the stack otherwise —
    // the documented spark.ml ALS deployment requirement)
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-als-ckpt").toString)
    val model = Recommender.fit(ratings, rank = 1, iters = 15, reg = 1e-6)
    val mlV = model.itemFactors.collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).head.toDouble).toMap
    val both = items.filter(mlV.contains)
    assert(both.length == items.length, "spark.ml dropped item factors")
    val a = both.map(i => v(iIdx(i)))
    val b0 = both.map(mlV)
    // orient: flip the ml vector if the dominant component disagrees
    val dom = a.zip(b0).maxBy { case (x, _) => math.abs(x) }
    val b = if (dom._1 * dom._2 < 0) b0.map(-_) else b0
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val cos = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(y => y * y).sum))
    info(f"rank-1 item-factor cosine vs exact alternation: $cos%.6f over ${both.length} items")
    assert(cos > 0.99,
      f"spark.ml rank-1 item factors diverge from the exact alternating solve (cos=$cos%.6f)")
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
