package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Law twin for the DataFrame-native PageRank+components tier
  * ([[GraphAnalytics.pageRankAndComponentsDF]], gate q57): the GraphX
  * run is the semantic reference (BASELINE.json mandates the GraphX
  * tier exists), the DataFrame run is the production plan — they must
  * agree on COMPONENTS exactly (both are min-vertex-id labels) and on
  * RANKS to float-summation-order tolerance (identical recurrence,
  * different reduction order). */
class PageRankParitySpec extends SparkSpec {

  test("DataFrame PageRank+CC == GraphX PageRank+CC (components exact, ranks 1e-8)") {
    val g = GraphBuild.tpchGraph(spark, sf)
    val gx = GraphAnalytics.pageRankAndComponents(spark, g, "weight")
    val df = GraphAnalytics.pageRankAndComponentsDF(spark, g)
    assert(gx.count() == df.count(), "one row per vertex on both tiers")
    val joined = gx.select(col("id"), col("pagerank").as("pr_gx"),
        col("component").as("c_gx"))
      .join(df.select(col("id"), col("pagerank").as("pr_df"),
        col("component").as("c_df")), "id")
      .localCheckpoint(true)
    assert(joined.count() == gx.count(), "same vertex set")
    assert(joined.where(col("c_gx") =!= col("c_df")).isEmpty,
      "component labels must be identical (min vertex id per component)")
    val maxDiff = joined
      .select(max(abs(col("pr_gx") - col("pr_df"))).as("d")).head().getDouble(0)
    assert(maxDiff < 1e-8, s"rank divergence $maxDiff exceeds tolerance")
    // the published semantic spot-check: ranks sum to ~N·(something
    // positive), every rank ≥ the 0.15 teleport floor
    assert(joined.where(col("pr_df") < 0.15 - 1e-12).isEmpty)
  }

  test("isolated vertices keep the teleport-only rank and label themselves") {
    import spark.implicits._
    val nodes = Seq((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "x"))
      .toDF("id", "name", "kind")
    val edges = Seq((1L, 2L, 1L)).toDF("src", "dst", "weight")
    val out = GraphAnalytics.pageRankAndComponentsDF(
      spark, PropertyGraph(nodes, edges)).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out(3L)._2 == 3L, "isolated vertex is its own component")
    assert(out(1L)._2 == 1L && out(2L)._2 == 1L)
    // teleport-only trajectory for the isolated vertex: r ← 0.15 +
    // 0.85·0 every step → exactly 0.15 after the first superstep
    assert(math.abs(out(3L)._1 - 0.15) < 1e-12)
  }
}
