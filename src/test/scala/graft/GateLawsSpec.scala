package graft

import graft.graph.GraphAnalytics
import org.apache.spark.sql.functions._

/** Invariant laws for the round-7 analytics/statistics gates — the
  * oracle proves engine-equality at one dataset; these pin the
  * algebraic properties that must hold at ANY scale or partitioning.
  */
class GateLawsSpec extends SparkSpec {
  import spark.implicits._

  private def edges = Seq(
    // two groups; g1 is a path 1-2-3-4 plus chord 1-3, g2 a star
    ("g1", 1L, 2L), ("g1", 2L, 3L), ("g1", 3L, 4L), ("g1", 1L, 3L),
    ("g2", 10L, 11L), ("g2", 10L, 12L), ("g2", 10L, 13L))
    .toDF("group", "src", "dst")

  test("pprExactScaled: partitioning-independent, seed-positive, teleport floor") {
    val a = GraphAnalytics.pprExactScaled(edges, damping = 0.85, iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = GraphAnalytics.pprExactScaled(edges.repartition(7), damping = 0.85, iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b, "PPR depends on input partitioning")
    // the seed (min node) re-receives the teleport mass every step, so
    // it holds at least (1-d)*1e6; every score is non-negative
    assert(a(("g1", 1L)) >= 150000L && a(("g2", 10L)) >= 150000L)
    assert(a.values.forall(_ >= 0L))
    // g2's star: leaves are symmetric → identical scores
    assert(a(("g2", 11L)) == a(("g2", 12L)) &&
      a(("g2", 12L)) == a(("g2", 13L)))
    // proximity: in g1 the seed's neighbors outrank the far end
    assert(a(("g1", 2L)) >= a(("g1", 4L)))
  }

  test("q176 link prediction: no existing edge emitted; cn bounded by degrees") {
    val out = SparkEntry.queries("q176_link_prediction")(spark, sf)
    val bad = out.filter(col("cn") > least(col("deg_u"), col("deg_v")) ||
      col("jaccard") <= 0 || col("jaccard") > 1).count()
    assert(bad == 0, "cn exceeds a degree bound or jaccard out of (0,1]")
    // candidates must be non-adjacent: rebuild the edge set and anti-check
    val e = graft.queries.AnalyticsQueries.groupEdges(spark, sf)
      .select(col("group").as("grp"), col("src").cast("long").as("u"),
        (col("dst")).cast("long").as("v"))
    val overlap = out.join(e, Seq("grp", "u", "v")).count() +
      out.join(e.select(col("grp"), col("v").as("u"), col("u").as("v")),
        Seq("grp", "u", "v")).count()
    assert(overlap == 0, "an adjacent pair leaked into the candidate set")
  }

  test("q175 attribution: per-conversion credit conserved up to integer rounding") {
    // k touches each get floor(1e6/k): the total lost to rounding is < k
    val ev = Tables.events(spark, sf)
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), col("user_id"), col("ts").as("cts"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts"))
    val k = conv.join(touches, Seq("user_id"))
      .where(col("ts") <= col("cts") && col("ts") > col("cts") - expr("INTERVAL 7 DAYS"))
      .groupBy("conv_id").agg(count(lit(1)).as("k"))
    val credited = k.select(sum(expr("k * (CAST(1000000 AS BIGINT) DIV k)")).as("c"),
      sum(lit(1000000L)).as("full"), sum(col("k")).as("ks")).head()
    val (c, full, ks) = (credited.getLong(0), credited.getLong(1), credited.getLong(2))
    assert(c <= full && full - c < ks, s"credit not conserved: $c of $full, slack ${full - c}")
    // and the gate's channel totals sum to exactly the same credited mass
    val gate = SparkEntry.queries("q175_attribution")(spark, sf)
      .agg(sum("credit_ppm")).head.getLong(0)
    assert(gate == c, s"gate credit $gate != recomputed $c")
  }

  test("q179 bootstrap CI: ordered bounds that bracket the grand spread") {
    val out = SparkEntry.queries("q179_bootstrap_ci")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      assert(lo <= hi, s"ci_lo $lo > ci_hi $hi")
      // resample means live inside the sample's value range by construction
      val m = r.getAs[Double]("mean_obs")
      assert(lo <= m * 2 && hi >= m / 2, "CI wildly off the observed mean")
    }
  }

  test("q173 collocations: bigram support never exceeds either unigram count") {
    val out = SparkEntry.queries("q173_collocations")(spark, sf)
    assert(out.filter(col("c_ab") > least(col("c_a"), col("c_b"))).count() == 0)
    assert(out.filter(col("lift") <= 0).count() == 0)
  }

  test("q178 profile: null/distinct counts reconcile with direct recompute") {
    val out = SparkEntry.queries("q178_profile")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val li = Tables.lineitem(spark, sf)
    val want = li.select(countDistinct("l_returnflag")).head.getLong(0)
    assert(out("l_returnflag").getAs[Long]("n_distinct") == want)
    assert(out.values.forall(_.getAs[Long]("n_nulls") == 0L))
  }
}
