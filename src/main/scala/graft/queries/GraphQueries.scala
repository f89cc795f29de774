package graft.queries

import graft.QuerySpec
import graft.graph.GraphBuild
import org.apache.spark.sql.functions._

/** Graph-shaped queries in the driver correctness gate: the motif API
  * (SURVEY J7/J8, §3.3) compiled over a property graph derived from
  * the test tables, oracled by equivalent relational SQL — which is
  * exactly the point: motif patterns ARE join plans.
  */
object GraphQueries {

  /** The §3.3 workhorse shape: two entities linked through a shared
    * neighbor with edge predicates — here customer—part—supplier. */
  val q50 = QuerySpec.sql(
    "q50_motif_find",
    """WITH ordered AS (
      |  SELECT o_custkey AS ck, l_partkey AS pk,
      |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |supplies AS (
      |  SELECT l_suppkey AS sk, l_partkey AS pk,
      |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s_name AS supplier_name, count(*) AS n_paths,
      |       CAST(sum(ordered.w) AS BIGINT) AS total_ordered_qty
      |FROM ordered
      |JOIN supplies ON ordered.pk = supplies.pk
      |JOIN supplier ON s_suppkey = supplies.sk
      |WHERE ordered.w >= 80 AND supplies.w >= 60
      |GROUP BY s_name""",
    "motif pattern → join plan (SURVEY J7, §3.3)") { (s, d) =>
    val g = GraphBuild.tpchGraph(s, d)
    g.find("(c:Customer)-[o:ordered]->(p:Part); (v:Supplier)-[u:supplies]->(p)")
      .where(col("o_weight") >= 80 && col("u_weight") >= 60)
      .groupBy(col("v_name").as("supplier_name"))
      .agg(count(lit(1)).as("n_paths"), sum("o_weight").as("total_ordered_qty"))
  }

  /** The motif-compiled co-supplier pair projection — the canonical
    * triadic co-edge set in graph-id space, memoized+persisted per
    * (session, dir) exactly like the coSupplier/coTriangles chain
    * (AnalyticsQueries): one derived pair table shared and warmed
    * instead of re-running the motif self-join per consumer. The
    * distinct runs on the 16-byte id pair BEFORE any names attach —
    * the co-supplier fan-out (parts × suppliers²) shrinks ~10× at the
    * distinct, so wide string columns never ride the fan-out. */
  private[graft] def motifCoSupplierPairs(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.Memo.df(s, "motifCoSupplierPairs", d) {
      GraphBuild.tpchGraph(s, d)
        .find("(a:Supplier)-[s1:supplies]->(p:Part); (b:Supplier)-[s2:supplies]->(p)")
        .where(col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id")).distinct()
    }

  /** Triadic closure through the motif engine (SURVEY J8/G16;
    * reference bin/TriadicClosures.R:89) — co-suppliers of a part.
    * Both orders of each unordered pair survive the id distinct; the
    * name predicate then keeps exactly one. */
  val q51 = QuerySpec.sql(
    "q51_motif_triadic",
    """WITH e AS (SELECT DISTINCT s_name, l_partkey
      |           FROM lineitem JOIN supplier ON l_suppkey = s_suppkey)
      |SELECT DISTINCT a.s_name AS name1, b.s_name AS name2
      |FROM e a JOIN e b ON a.l_partkey = b.l_partkey AND a.s_name < b.s_name""",
    "triadic closure via motif self-join (SURVEY J8,G16)") { (s, d) =>
    val g = GraphBuild.tpchGraph(s, d)
    val names = g.nodes.where(col("kind") === "Supplier")
      .select(col("id"), col("name"))
    motifCoSupplierPairs(s, d)
      .join(broadcast(names.select(col("id").as("a_id"), col("name").as("name1"))), "a_id")
      .join(broadcast(names.select(col("id").as("b_id"), col("name").as("name2"))), "b_id")
      .where(col("name1") < col("name2"))
      .select("name1", "name2")
  }

  /** Degree family (SURVEY G3/G9) over the derived graph, oracled
    * relationally: per-part in-degree by relationship type. */
  val q52 = QuerySpec.sql(
    "q52_graph_degrees",
    """WITH ordered AS (
      |  SELECT DISTINCT o_custkey AS src, l_partkey AS pk
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |supplies AS (SELECT DISTINCT l_suppkey AS src, l_partkey AS pk FROM lineitem)
      |SELECT p_name AS part_name,
      |       (SELECT count(*) FROM ordered  WHERE pk = p_partkey) AS n_customers,
      |       (SELECT count(*) FROM supplies WHERE pk = p_partkey) AS n_suppliers
      |FROM part
      |WHERE p_partkey IN (SELECT pk FROM ordered) OR p_partkey IN (SELECT pk FROM supplies)""",
    "per-node typed in-degree (SURVEY G3,G9)") { (s, d) =>
    val g = GraphBuild.tpchGraph(s, d)
    val inDeg = g.edges.groupBy(col("dst").as("id"))
      .agg(count(when(col("relType") === "ordered", 1)).as("n_customers"),
        count(when(col("relType") === "supplies", 1)).as("n_suppliers"))
    inDeg.join(g.nodes.filter(col("kind") === "Part"), Seq("id"))
      .select(col("name").as("part_name"), col("n_customers"), col("n_suppliers"))
  }

  /** Cyclic 4-constraint motif — the §3.3 workhorse topology
    * ((x)-->(y)-->(z)-->(a)<--(b) with cross-links): customer and
    * supplier connected through TWO different parts. Exercises
    * cross-chain variable unification on a cycle. */
  val q58 = QuerySpec.sql(
    "q58_motif_cycle",
    """WITH ordered AS (
      |  SELECT o_custkey AS ck, l_partkey AS pk
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2 HAVING sum(CAST(l_quantity AS BIGINT)) >= 40),
      |supplies AS (
      |  SELECT l_suppkey AS sk, l_partkey AS pk FROM lineitem
      |  GROUP BY 1, 2 HAVING sum(CAST(l_quantity AS BIGINT)) >= 40)
      |SELECT o1.ck AS custkey, s1.sk AS suppkey, count(*) AS n_shared_part_pairs
      |FROM ordered o1 JOIN supplies s1 ON o1.pk = s1.pk
      |JOIN ordered o2 ON o2.ck = o1.ck
      |JOIN supplies s2 ON s2.pk = o2.pk AND s2.sk = s1.sk
      |WHERE o1.pk < o2.pk
      |GROUP BY 1, 2
      |HAVING count(*) >= 2""",
    "cyclic multi-constraint motif (SURVEY J7 §3.3 topology)") { (s, d) =>
    // edge-weight predicate pushed onto the graph BEFORE pattern
    // compilation — selective hops keep the cyclic join bounded
    val g0 = GraphBuild.tpchGraph(s, d)
    val g = g0.copy(edges = g0.edges.filter(col("weight") >= 40))
    g.find("(c:Customer)-[o1:ordered]->(p1:Part); (v:Supplier)-[s1:supplies]->(p1); " +
        "(c)-[o2:ordered]->(p2:Part); (v)-[s2:supplies]->(p2)")
      .where(col("p1_id") < col("p2_id"))
      .groupBy(col("c_key").as("custkey"), col("v_key").as("suppkey"))
      .agg(count(lit(1)).as("n_shared_part_pairs"))
      .where(col("n_shared_part_pairs") >= 2)
  }

  /** G20 — schema introspection: the graph's architecture table
    * (distinct srcKind—relType→dstKind triples with edge counts,
    * reference bin/RenderGraphArchitecture.R:63-67), oracled by
    * counting the distinct natural-key pairs each relationship
    * aggregates over. */
  val q81 = QuerySpec.sql(
    "q81_graph_schema",
    """WITH o AS (SELECT count(*) AS n FROM
      |  (SELECT DISTINCT o_custkey, l_partkey
      |   FROM lineitem JOIN orders ON l_orderkey = o_orderkey)),
      |s AS (SELECT count(*) AS n FROM
      |  (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem))
      |SELECT 'Customer' AS "srcKind", 'ordered' AS "relType",
      |       'Part' AS "dstKind", CAST(o.n AS BIGINT) AS n_edges FROM o
      |UNION ALL
      |SELECT 'Supplier', 'supplies', 'Part', CAST(s.n AS BIGINT) FROM s""",
    "graph schema introspection, oracled (SURVEY G20)") { (s, d) =>
    GraphBuild.tpchGraph(s, d).describe
  }

  /** G2 — simplify (drop self-loops + parallel edges; reference
    * bin/TriadicClosures.R:45), oracled end-to-end: the edge list is
    * built RAW from lineitem (one edge per row → real parallel edges)
    * plus planted supplier self-loops, on natural long ids so DuckDB
    * replays the exact least/greatest-DISTINCT canonicalization. */
  val q132 = QuerySpec.sql(
    "q132_simplify",
    """SELECT DISTINCT
      |  least(CAST(l_suppkey AS BIGINT), CAST(l_partkey + 1000000 AS BIGINT)) AS a,
      |  greatest(CAST(l_suppkey AS BIGINT), CAST(l_partkey + 1000000 AS BIGINT)) AS b
      |FROM lineitem""",
    "simplify: self-loop + parallel-edge dedup, oracled (SURVEY G2)") { (s, d) =>
    import graft.Tables
    val li = Tables.lineitem(s, d)
    // one edge PER lineitem row (parallel when a supplier ships the
    // same part repeatedly) + a planted self-loop per 50th order
    val real = li.select(col("l_suppkey").cast("long").as("src"),
      (col("l_partkey") + 1000000L).cast("long").as("dst"),
      lit("ships").as("relType"))
    val loops = li.filter(pmod(col("l_orderkey"), lit(50)) === 0)
      .select(col("l_suppkey").cast("long").as("src"),
        col("l_suppkey").cast("long").as("dst"), lit("self").as("relType"))
    val nodes = li.select(col("l_suppkey").cast("long").as("id")).distinct()
      .select(col("id"), col("id").cast("string").as("name"), lit("S").as("kind"))
    graft.graph.PropertyGraph(nodes, real.unionByName(loops))
      .simplifiedUndirected
      .select(col("a"), col("b"))
  }

  val all: Seq[QuerySpec] = Seq(q50, q51, q52, q58, q81, q132)
}
