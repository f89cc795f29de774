package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

/** Laws for the top-principal-component operator: the exact-scaled
  * gate path (q199) must be partitioning-independent and aligned with
  * the converged double path; the double path must satisfy the
  * eigenpair definition on a corpus with a planted dominant direction.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val d = 8

  /** 200 synthetic vectors: strong variance along a planted direction
    * (alternating ±1/√d signs) plus small deterministic per-dim
    * jitter, so the top component is unambiguous. */
  private def planted = {
    val dir = Array.tabulate(d)(i => if (i % 2 == 0) 1.0 else -1.0)
    (0 until 200).map { r =>
      val a = if (r % 2 == 0) 1.0 else -1.0 // ± along the direction
      val v = Array.tabulate(d)(i =>
        (a * dir(i) * 0.5 + 0.01 * ((r * 7 + i * 3) % 11 - 5)).toFloat)
      (r.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("exact-scaled path: partitioning-independent, nonzero, aligned with plant") {
    val a = Pca.topComponentExactScaled(planted, "embedding", d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Pca.topComponentExactScaled(planted.repartition(13), "embedding", d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "exact-scaled component depends on partitioning")
    assert(a.values.exists(_ != 0L), "degenerate all-zero component")
    // alternating-sign structure of the planted direction is recovered
    val signs = (0 until d).map(i => math.signum(a(i.toLong).toDouble))
    assert(signs.forall(_ != 0.0), s"zero entry in $a")
    assert((0 until d).forall(i => signs(i) == signs(0) * (if (i % 2 == 0) 1 else -1)),
      s"component $a does not alternate with the planted direction")
  }

  test("double path: unit norm, eigenpair residual small, dominates coordinate variance") {
    val (v, lambda) = Pca.topComponent(planted, "embedding", d)
    val nrm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-9, s"not unit norm: $nrm")
    assert(lambda > 0.0)
    // rebuild the covariance independently (double precision, driver)
    val rows = planted.collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val n = rows.length.toDouble
    val mean = Array.tabulate(d)(i => rows.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum * n * n / n)
    val av = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
    val residual = math.sqrt(av.zip(v).map { case (x, y) => (x - lambda * y) * (x - lambda * y) }.sum) / lambda
    assert(residual < 1e-3, s"eigenpair residual $residual")
    // the component's variance beats every single coordinate's variance
    val coordVar = (0 until d).map(i => cov(i)(i)).max
    assert(lambda >= coordVar * 0.999, s"lambda $lambda < max coord var $coordVar")
  }

  test("exact and double paths agree in direction (|cos| > 0.99)") {
    val vi = Pca.topComponentExactScaled(planted, "embedding", d)
      .orderBy("pos").collect().map(_.getLong(1).toDouble)
    val (vd, _) = Pca.topComponent(planted, "embedding", d)
    val dot = vi.zip(vd).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) / math.sqrt(vi.map(x => x * x).sum)
    assert(cos > 0.99, s"exact-scaled vs double alignment $cos")
  }

  test("overflow guard fires loudly past the documented n bound") {
    val ex = intercept[IllegalArgumentException] {
      // vScale pushed high enough that 200 rows exceed the bound
      Pca.topComponentExactScaled(planted, "embedding", d,
        xScale = 1L << 20, steps = 1, vScale = 1L << 30)
    }
    assert(ex.getMessage.contains("overflow"))
  }
}
