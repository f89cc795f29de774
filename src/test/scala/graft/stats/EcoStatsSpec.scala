package graft.stats

import graft.SparkSpec

class EcoStatsSpec extends SparkSpec {
  import spark.implicits._

  test("ranks: ties share mean rank") {
    assert(EcoStats.ranks(Array(10.0, 20.0, 20.0, 30.0)).toSeq == Seq(1.0, 2.5, 2.5, 4.0))
  }

  test("wilcoxon rank-sum: clearly separated samples → tiny p; identical → p=1") {
    val (_, pSep) = EcoStats.wilcoxonRankSum(
      Array(1.0, 2, 3, 4, 5, 6, 7, 8, 9, 10), Array(101.0, 102, 103, 104, 105, 106, 107, 108, 109, 110))
    assert(pSep < 1e-3)
    val (_, pSame) = EcoStats.wilcoxonRankSum(Array(5.0, 5, 5), Array(5.0, 5, 5))
    assert(pSame == 1.0)
  }

  test("wilcoxon rank-sum matches R reference value (exact, small untied samples)") {
    // R's wilcox.test example (permeability constants):
    // wilcox.test(x, y) → W = 58, p-value = 0.1329 (exact)
    val x = Array(1.83, 0.50, 1.62, 2.48, 1.68, 1.88, 1.55, 3.06, 1.30)
    val y = Array(0.878, 0.647, 0.598, 2.05, 1.06, 1.29, 1.06, 3.14, 1.29)
    val (w, p) = EcoStats.wilcoxonRankSum(x, y)
    assert(w == 58.0)
    assert(math.abs(p - 0.1329) < 0.001)
  }

  test("paired signed-rank detects a constant shift") {
    val x = Array(1.0, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    val y = x.map(_ + 2.0)
    val (_, p) = EcoStats.wilcoxonSignedRank(x, y)
    assert(p < 0.01)
    val (_, pNull) = EcoStats.wilcoxonSignedRank(x, x)
    assert(pNull == 1.0)
  }

  test("pairwise Holm: adjusted ps are monotone and >= raw") {
    val groups = Map(
      "a" -> Array(1.0, 2, 3, 4, 5, 4, 3, 2),
      "b" -> Array(11.0, 12, 13, 14, 15, 14, 13, 12),
      "c" -> Array(1.5, 2.5, 3.5, 4.5, 5.5, 4.4, 3.3, 2.2))
    val adj = EcoStats.pairwiseWilcoxonHolm(groups)
    assert(adj.length == 3)
    val m = adj.map(t => (t._1, t._2) -> t._3).toMap
    assert(m(("a", "b")) < 0.05)
    assert(m(("a", "c")) > 0.3)
    adj.foreach { case (_, _, p) => assert(p >= 0 && p <= 1) }
  }

  test("anosimPortable observed R equals the driver-local kernel's R") {
    // abundance: 6 samples in 2 groups; within-group pairs are more
    // similar than between-group pairs → positive R
    val ab = Seq(
      ("s1", 0, "i1", 10L), ("s1", 0, "i2", 5L),
      ("s2", 0, "i1", 9L), ("s2", 0, "i2", 6L),
      ("s3", 0, "i1", 11L), ("s3", 0, "i3", 1L),
      ("s4", 1, "i3", 10L), ("s4", 1, "i4", 5L),
      ("s5", 1, "i3", 8L), ("s5", 1, "i4", 7L),
      ("s6", 1, "i4", 12L), ("s6", 1, "i1", 1L)
    ).toDF("s", "g", "item", "v")
    val row = EcoStats.anosimPortable(ab, "s", "g", "item", "v",
      permutations = 49, seed = 3L).head()
    // the driver-local kernel on the same Bray-Curtis matrix
    val names = Seq("s1", "s2", "s3", "s4", "s5", "s6")
    val vecs: Map[String, Map[String, Long]] = ab.collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) =>
        s -> rs.map(r => r.getString(2) -> r.getLong(3)).toMap
      }
    def bc(a: String, b: String): Double = {
      val (va, vb) = (vecs(a), vecs(b))
      val shared = va.keySet.intersect(vb.keySet)
        .toSeq.map(k => math.min(va(k), vb(k))).sum
      1.0 - 2.0 * shared / (va.values.sum + vb.values.sum)
    }
    val dist = Array.tabulate(6, 6)((i, j) => bc(names(i), names(j)))
    val (rLocal, _) = EcoStats.anosim(dist, Array(0, 0, 0, 1, 1, 1))
    assert(math.abs(row.getDouble(0) - rLocal) < 1e-12)
    assert(row.getDouble(0) > 0.5) // clear group separation
    val p = row.getDouble(2)
    assert(p > 0 && p <= 1 && math.abs(p * 50 - math.round(p * 50)) < 1e-9)
  }

  test("permdispPortable observed F equals the driver-local kernel on scaled distances") {
    // same 6-sample / 2-equal-group abundance as the ANOSIM twin test
    val ab = Seq(
      ("s1", 0, "i1", 10L), ("s1", 0, "i2", 5L),
      ("s2", 0, "i1", 9L), ("s2", 0, "i2", 6L),
      ("s3", 0, "i1", 11L), ("s3", 0, "i3", 1L),
      ("s4", 1, "i3", 10L), ("s4", 1, "i4", 5L),
      ("s5", 1, "i3", 8L), ("s5", 1, "i4", 7L),
      ("s6", 1, "i4", 12L), ("s6", 1, "i1", 1L)
    ).toDF("s", "g", "item", "v")
    val row = EcoStats.permdispPortable(ab, "s", "g", "item", "v",
      permutations = 49, seed = 3L).head()
    // driver-local F on the SAME exact-scaled integer distances (F is
    // scale-invariant, so feeding round(d*1e6) reproduces the portable
    // arithmetic up to float-summation order)
    val names = Seq("s1", "s2", "s3", "s4", "s5", "s6")
    val vecs: Map[String, Map[String, Long]] = ab.collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) =>
        s -> rs.map(r => r.getString(2) -> r.getLong(3)).toMap
      }
    def bc(a: String, b: String): Double = {
      if (a == b) return 0.0
      val (va, vb) = (vecs(a), vecs(b))
      val shared = va.keySet.intersect(vb.keySet)
        .toSeq.map(k => math.min(va(k), vb(k))).sum
      math.round((1.0 - 2.0 * shared / (va.values.sum + vb.values.sum)) * 1e6).toDouble
    }
    val dist = Array.tabulate(6, 6)((i, j) => bc(names(i), names(j)))
    val (fLocal, _) = EcoStats.permdisp(dist, Array(0, 0, 0, 1, 1, 1))
    val fPortable = row.getDouble(0)
    assert(math.abs(fPortable - fLocal) / fLocal < 1e-9,
      s"portable F $fPortable vs local $fLocal")
    val p = row.getDouble(2)
    assert(p > 0 && p <= 1 && math.abs(p * 50 - math.round(p * 50)) < 1e-9)
  }

  test("distributed rank-sum equals local on the same data") {
    // a cross-sample tie (7.0) forces the normal-approx path in both
    val x = Array(1.0, 2, 3, 4, 5, 7, 20, 30)
    val y = Array(7.0, 8, 9, 10, 11, 12, 13, 14)
    val local = EcoStats.wilcoxonRankSum(x, y)
    val dist = EcoStats.wilcoxonRankSumDF(
      x.toSeq.toDF("v"), y.toSeq.toDF("v"), "v")
    assert(math.abs(local._1 - dist._1) < 1e-9)
    assert(math.abs(local._2 - dist._2) < 1e-9)
  }

  test("wilcoxonPairsPortable: observed U matches the driver-local kernel per pair") {
    import org.apache.spark.sql.functions.col
    // 3 groups with ties within and across groups (integer values)
    val rows = Seq(
      ("A", 1L, 10L), ("A", 2L, 12L), ("A", 3L, 12L), ("A", 4L, 19L),
      ("A", 5L, 25L), ("A", 6L, 31L),
      ("B", 11L, 12L), ("B", 12L, 18L), ("B", 13L, 22L), ("B", 14L, 25L),
      ("B", 15L, 40L), ("B", 16L, 41L),
      ("C", 21L, 5L), ("C", 22L, 6L), ("C", 23L, 7L), ("C", 24L, 12L),
      ("C", 25L, 13L), ("C", 26L, 14L))
    val df = rows.toDF("grp", "id", "v")
    val got = EcoStats.wilcoxonPairsPortable(df, permutations = 99, seed = 3L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("w2"),
          r.getAs[Double]("u"), r.getAs[Double]("p_value"))).toMap
    assert(got.size == 3)
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._3.toDouble).toArray).toMap
    for (((g1, g2), (n1, n2, w2, u, p)) <- got) {
      val (uLocal, _) = EcoStats.wilcoxonRankSum(byG(g1), byG(g2))
      assert(n1 == byG(g1).length && n2 == byG(g2).length, s"$g1/$g2 sizes")
      assert(u == uLocal, s"$g1/$g2: distributed U $u != local $uLocal")
      // W2 = 2U + n1(n1+1) — the doubled rank sum is consistent (2U may
      // be odd when midranks land on .5)
      assert(w2 == math.round(2 * uLocal) + n1 * (n1 + 1), s"$g1/$g2 W2")
      assert(p > 0 && p <= 1 && math.abs(p * 100 - math.round(p * 100)) < 1e-9)
    }
    // C is stochastically far below B → permutation p should be small
    assert(got(("B", "C"))._5 <= 0.05)
  }

  test("ANOSIM: strong group structure → R near 1, significant") {
    // two tight clusters far apart; n=8 per group so the label-pattern
    // space is large enough for p < 0.05 under permutation
    val pts = (0 until 8).map(_ * 0.1).toArray ++ (0 until 8).map(10.0 + _ * 0.1)
    val n = pts.length
    val dist = Array.tabulate(n, n)((i, j) => math.abs(pts(i) - pts(j)))
    val grouping = Array.fill(8)(0) ++ Array.fill(8)(1)
    val (r, p) = EcoStats.anosim(dist, grouping, permutations = 199)
    assert(r > 0.9)
    assert(p < 0.05)
    // alternating grouping → weaker R, not significant
    val (r2, p2) = EcoStats.anosim(dist, Array.tabulate(n)(_ % 2), permutations = 199)
    assert(r2 < r)
    assert(p2 > 0.05)
  }

  test("PERMDISP: unequal dispersions detected") {
    // group 0 tight around 0, group 1 spread
    val pts = Array(0.0, 0.01, -0.01, 0.02, -5.0, 5.0, -8.0, 8.0)
    val dist = Array.tabulate(8, 8)((i, j) => math.abs(pts(i) - pts(j)))
    val grouping = Array(0, 0, 0, 0, 1, 1, 1, 1)
    val (f, p) = EcoStats.permdisp(dist, grouping, permutations = 199)
    assert(f > 1.0)
    assert(p < 0.2)
  }

  test("KDE CDF below zero: symmetric data → ~0.5, positive data → ~0") {
    val sym = Array(-2.0, -1, -0.5, 0.5, 1, 2)
    assert(math.abs(EcoStats.kdeCdfBelowZero(sym) - 0.5) < 0.05)
    assert(EcoStats.kdeCdfBelowZero(Array(5.0, 6, 7, 8)) < 0.01)
  }

  test("NMDS: recovers cluster separation in 2D with low stress") {
    val pts = Array(0.0, 0.3, 0.6, 20.0, 20.3, 20.6)
    val dist = Array.tabulate(6, 6)((i, j) => math.abs(pts(i) - pts(j)))
    val (coords, stress) = EcoStats.nmds(dist, k = 2, iters = 50)
    assert(stress < 0.1)
    // cluster distances in the embedding: within << between
    def d(a: Int, b: Int) = math.sqrt(
      coords(a).zip(coords(b)).map { case (x, y) => (x - y) * (x - y) }.sum)
    val within = Seq(d(0, 1), d(1, 2), d(3, 4), d(4, 5)).max
    val between = Seq(d(0, 3), d(2, 5), d(1, 4)).min
    assert(between > 3 * within)
  }
}
