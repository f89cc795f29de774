package graft

import graft.graph.GraphAnalytics
import graft.operators.Sampling
import graft.stats.EcoStats
import org.apache.spark.sql.functions._

/** Noise-tolerance harness (SURVEY §5): the reference re-runs its
  * centrality → Bray-Curtis → Wilcoxon analysis with edges subsampled
  * to 90..60% and checks the conclusion survives (reference
  * bin/error_interpersonaldiversity.R:63-66,593-706). Same protocol
  * here with deterministic hash subsampling: two structural classes
  * of group-graphs must stay separable at every perturbation level. */
class NoiseToleranceSpec extends SparkSpec {
  import spark.implicits._

  /** 12 groups: class A graphs are hubs (one center), class B are
    * rings — eigencentrality profiles differ structurally. */
  private def edges = {
    // shared vertex universe 0..20 so Bray-Curtis compares like items;
    // per-group weight jitter keeps within-class distances nonzero
    val rows = (0 until 12).flatMap { g =>
      if (g % 2 == 0) // hub
        (1 to 20).map(i => (s"g$g", 0L, i.toLong, 1.0 + ((i + g) % 3)))
      else // ring
        (0 until 20).map(i => (s"g$g", i.toLong, ((i + 1) % 20).toLong, 1.0 + ((i + g) % 3)))
    }
    rows.toDF("group", "src", "dst", "weight")
  }

  private def conclusion(frac: Double): Double = {
    val perturbed =
      if (frac >= 1.0) edges
      else Sampling.stratifiedSample(edges, Seq("group", "src", "dst"), frac, seed = 7)
    val eigen = GraphAnalytics.perGroupEigen(perturbed)
      .select(col("group"), col("id").as("item"), col("eigen").as("value"))
    val bc = GraphAnalytics.brayCurtis(eigen).collect()
    def cls(g: String) = g.stripPrefix("g").toInt % 2
    val within = bc.collect { case r if cls(r.getString(0)) == cls(r.getString(1)) =>
      r.getDouble(2) }
    val between = bc.collect { case r if cls(r.getString(0)) != cls(r.getString(1)) =>
      r.getDouble(2) }
    EcoStats.wilcoxonRankSum(within, between)._2
  }

  test("class separation survives 10-40% edge loss (reference error protocol)") {
    val ps = Seq(1.0, 0.9, 0.8, 0.7, 0.6).map(f => f -> conclusion(f))
    ps.foreach { case (f, p) => info(f"subsample $f%.1f → Wilcoxon p=$p%.4g") }
    val (_, pFull) = ps.head
    assert(pFull < 0.05, s"baseline conclusion not significant: p=$pFull")
    ps.foreach { case (f, p) =>
      assert(p < 0.1, s"conclusion lost at subsample fraction $f (p=$p)")
    }
  }
}
