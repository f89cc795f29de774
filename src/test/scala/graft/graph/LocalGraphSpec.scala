package graft.graph

/** Golden assertions derived from igraph semantics on tiny graphs
  * (SURVEY §5: "igraph-generated per-operator goldens ... pinned"). */
class LocalGraphSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val path4 = LocalGraph.fromEdges(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0)))
  private val star4 = LocalGraph.fromEdges(Seq((0L, 1L, 1.0), (0L, 2L, 1.0), (0L, 3L, 1.0)))
  private val tri   = LocalGraph.fromEdges(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (0L, 2L, 1.0)))

  test("BFS family on P4: eccentricity/diameter/radius/mean distance") {
    assert(path4.eccentricities.toSeq == Seq(3, 2, 2, 3))
    assert(path4.diameter == 3)
    assert(path4.radius == 2)
    assert(math.abs(path4.meanDistance - 20.0 / 12.0) < 1e-12)
  }

  test("closeness on P4 matches igraph normalized closeness") {
    val c = path4.closeness
    assert(math.abs(c(0) - 0.5) < 1e-12)   // 3/(1+2+3)
    assert(math.abs(c(1) - 0.75) < 1e-12)  // 3/(1+1+2)
  }

  test("betweenness: P4 = [0,2,2,0], star center = (n-1)(n-2)/2, triangle = 0") {
    assert(path4.betweenness.toSeq == Seq(0.0, 2.0, 2.0, 0.0))
    assert(star4.betweenness.toSeq == Seq(3.0, 0.0, 0.0, 0.0))
    assert(tri.betweenness.forall(_ == 0.0))
  }

  test("centralizations: star is 1.0 for degree/betweenness/closeness") {
    assert(math.abs(star4.degreeCentralization - 1.0) < 1e-12)
    assert(math.abs(star4.betweennessCentralization - 1.0) < 1e-12)
    assert(math.abs(star4.closenessCentralization - 1.0) < 1e-12)
    assert(math.abs(path4.degreeCentralization - 1.0 / 3.0) < 1e-12)
  }

  test("eigencentrality: P4 interior=1, ends=sin(36°)/sin(72°); star leaves=1/sqrt(3)") {
    val p = path4.eigenCentrality()
    val ratio = math.sin(math.toRadians(36)) / math.sin(math.toRadians(72))
    assert(math.abs(p(1) - 1.0) < 1e-9)
    assert(math.abs(p(0) - ratio) < 1e-6)
    val s = star4.eigenCentrality()
    assert(math.abs(s(0) - 1.0) < 1e-9)
    assert(math.abs(s(1) - 1.0 / math.sqrt(3)) < 1e-6)
  }

  test("alpha centrality solves (I - aA^T)x = e") {
    val g = LocalGraph(Array(0L, 1L), Array((0L, 1L, 1.0)), directed = true)
    val x = g.alphaCentrality(alpha = 0.5)
    assert(math.abs(x(0) - 1.0) < 1e-12)
    assert(math.abs(x(1) - 1.5) < 1e-12)
  }

  test("pagerank on star4 matches closed form") {
    val pr = star4.pageRank()
    val pc = 0.8875 / 1.85
    assert(math.abs(pr(0) - pc) < 1e-6)
    assert(math.abs(pr.sum - 1.0) < 1e-9)
  }

  test("weighted diameter via dijkstra") {
    val g = LocalGraph.fromEdges(Seq((0L, 1L, 2.0), (1L, 2L, 3.0)))
    assert(math.abs(g.weightedDiameter - 5.0) < 1e-12)
  }

  test("diversity: equal weights → 1, single edge → 0, isolated → NaN") {
    val g = LocalGraph(Array(0L, 1L, 2L, 3L),
      Array((0L, 1L, 1.0), (0L, 2L, 1.0), (1L, 2L, 5.0)), directed = false)
    val d = g.diversity
    assert(math.abs(d(0) - 1.0) < 1e-12)       // weights (1,1)
    assert(d(3).isNaN)                          // isolated
    val single = LocalGraph.fromEdges(Seq((0L, 1L, 1.0)))
    assert(single.diversity(0) == 0.0)
  }

  test("modularity: one community = 0; two disjoint triangles split at Q=0.5") {
    assert(math.abs(tri.modularity(Array(0, 0, 0))) < 1e-12)
    val twoTri = LocalGraph.fromEdges(Seq(
      (0L, 1L, 1.0), (1L, 2L, 1.0), (0L, 2L, 1.0),
      (3L, 4L, 1.0), (4L, 5L, 1.0), (3L, 5L, 1.0)))
    assert(math.abs(twoTri.modularity(Array(0, 0, 0, 1, 1, 1)) - 0.5) < 1e-12)
    val comm = twoTri.greedyModularityCommunities
    assert(comm.distinct.length == 2)
    assert(comm(0) == comm(1) && comm(1) == comm(2))
    assert(comm(3) == comm(4) && comm(4) == comm(5))
    assert(comm(0) != comm(3))
  }

  test("connectivity") {
    assert(path4.isConnected)
    val disc = LocalGraph.fromEdges(Seq((0L, 1L, 1.0), (2L, 3L, 1.0)))
    assert(!disc.isConnected)
    assert(disc.componentIds.distinct.length == 2)
  }

  test("walktrap: two-triangle barbell splits at max modularity") {
    val twoTri = LocalGraph.fromEdges(Seq(
      (0L, 1L, 1.0), (1L, 2L, 1.0), (0L, 2L, 1.0),
      (3L, 4L, 1.0), (4L, 5L, 1.0), (3L, 5L, 1.0),
      (2L, 3L, 1.0))) // bridge
    val comm = twoTri.walktrapCommunities()
    assert(comm.distinct.length == 2)
    assert(comm(0) == comm(1) && comm(1) == comm(2))
    assert(comm(3) == comm(4) && comm(4) == comm(5))
    assert(comm(0) != comm(3))
    // agrees with greedy CNM on this clean structure
    assert(twoTri.modularity(comm) == twoTri.modularity(twoTri.greedyModularityCommunities))
  }

  test("walktrap: clique stays one community; disconnected components never merge") {
    val k4 = LocalGraph.fromEdges(for {
      i <- 0 until 4; j <- (i + 1) until 4
    } yield (i.toLong, j.toLong, 1.0))
    assert(k4.walktrapCommunities().distinct.length == 1 ||
      k4.modularity(k4.walktrapCommunities()) == 0.0)
    val disc = LocalGraph.fromEdges(Seq((0L, 1L, 1.0), (2L, 3L, 1.0)))
    val dc = disc.walktrapCommunities()
    assert(dc(0) == dc(1) && dc(2) == dc(3) && dc(0) != dc(2))
  }
}
