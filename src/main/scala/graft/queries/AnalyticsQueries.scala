package graft.queries

import graft.{QuerySpec, Tables}
import graft.graph.{GraphAnalytics, GraphBuild}
import org.apache.spark.sql.functions._

/** β-diversity + per-group graph analytics in the correctness gate
  * (SURVEY G17/G18/M6, §2.10). The relational β-diversity ops carry
  * exact DuckDB oracles; kernel-based per-group metrics and GraphX
  * jobs are rows-only (deterministic, not ANSI-SQL-expressible).
  */
object AnalyticsQueries {

  /** Long-format abundance: group = return flag, item = part,
    * value = total quantity (integral, so double sums stay exact). */
  private def abundance(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("group"), col("l_partkey").as("item"))
      .agg(sum(col("l_quantity").cast("long")).cast("double").as("value"))

  /** Per-group supplier→customer edges (high-quantity lineitems keep
    * the subgraphs per-sample-sized, as in the reference). */
  private def groupEdges(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 49)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("group"), col("l_suppkey").as("src"),
        (col("o_custkey") + 1000000L).as("dst"))
      .agg(sum(col("l_quantity").cast("long")).cast("double").as("weight"))
      .cache() // q55 and q59 share this plan via the cache manager

  /** M6/G18 — Bray-Curtis dissimilarity between groups. */
  val q53 = QuerySpec.sql(
    "q53_bray_curtis",
    """WITH v AS (
      |  SELECT l_returnflag AS grp, l_partkey AS item,
      |         CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS val
      |  FROM lineitem GROUP BY 1, 2),
      |totals AS (SELECT grp, sum(val) AS t FROM v GROUP BY grp),
      |shared AS (
      |  SELECT x.grp AS g1, y.grp AS g2,
      |         sum(abs(x.val - y.val)) AS sad,
      |         sum(x.val) AS sx, sum(y.val) AS sy
      |  FROM v x JOIN v y ON x.item = y.item AND x.grp < y.grp
      |  GROUP BY 1, 2)
      |SELECT t1.grp AS g1, t2.grp AS g2,
      |       (COALESCE(sad, 0) + (t1.t - COALESCE(sx, 0)) + (t2.t - COALESCE(sy, 0)))
      |         / (t1.t + t2.t) AS bray_curtis
      |FROM totals t1
      |JOIN totals t2 ON t1.grp < t2.grp
      |LEFT JOIN shared ON g1 = t1.grp AND g2 = t2.grp""",
    "pairwise Bray-Curtis over grouped abundances (SURVEY M6,G18)") { (s, d) =>
    GraphAnalytics.brayCurtis(abundance(s, d))
  }

  /** G17 — edge-set Jaccard distance between group subgraphs. */
  val q54 = QuerySpec.sql(
    "q54_edge_jaccard",
    """WITH e AS (
      |  SELECT DISTINCT l_returnflag AS grp,
      |         least(l_suppkey, l_partkey + 1000000) AS a,
      |         greatest(l_suppkey, l_partkey + 1000000) AS b
      |  FROM lineitem WHERE l_quantity >= 40),
      |sizes AS (SELECT grp, count(*) AS n FROM e GROUP BY grp),
      |inter AS (
      |  SELECT x.grp AS g1, y.grp AS g2, count(*) AS ni
      |  FROM e x JOIN e y ON x.a = y.a AND x.b = y.b AND x.grp < y.grp
      |  GROUP BY 1, 2)
      |SELECT s1.grp AS g1, s2.grp AS g2,
      |       1.0 - COALESCE(ni, 0) * 1.0 / (s1.n + s2.n - COALESCE(ni, 0)) AS jaccard_dist
      |FROM sizes s1 JOIN sizes s2 ON s1.grp < s2.grp
      |LEFT JOIN inter ON g1 = s1.grp AND g2 = s2.grp""",
    "graph β-diversity as edge-set Jaccard (SURVEY G17)") { (s, d) =>
    val edges = Tables.lineitem(s, d).filter(col("l_quantity") >= 40)
      .select(col("l_returnflag").as("group"), col("l_suppkey").as("src"),
        (col("l_partkey") + 1000000L).as("dst"), lit(1.0).as("weight"))
    GraphAnalytics.edgeJaccardDistance(edges)
  }

  /** G1-G9/G14 — per-group network-stat battery via mapGroups kernels. */
  val q55 = QuerySpec.rowsOnly(
    "q55_group_graph_metrics",
    "per-group diameter/centralization battery (SURVEY G3-G9,G14)") { (s, d) =>
    GraphAnalytics.perGroupMetrics(groupEdges(s, d))
  }

  // (q56 per-group eigencentrality was superseded by q59's battery —
  // perGroupEigen itself remains in use by q72 and the specs)

  /** G12/G5 — GraphX global PageRank + connected components. */
  val q57 = QuerySpec.rowsOnly(
    "q57_global_pagerank_cc",
    "GraphX weighted PageRank + components on the derived graph (SURVEY G5,G12)") { (s, d) =>
    val g = GraphBuild.tpchGraph(s, d)
    GraphAnalytics.pageRankAndComponents(s, g, "weight")
      .join(g.nodes, "id")
      .select(col("name"), col("kind"), col("pagerank"), col("component"))
  }

  /** G6-G13 — full per-vertex centrality battery per group. */
  val q59 = QuerySpec.rowsOnly(
    "q59_vertex_centralities",
    "per-group eigen/pagerank/betweenness/closeness/diversity/alpha (SURVEY G6-G13)") { (s, d) =>
    GraphAnalytics.perGroupVertexMetrics(groupEdges(s, d))
  }

  val all: Seq[QuerySpec] = Seq(q53, q54, q55, q57, q59)
}
