package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top principal component of an embedding column — the dimensionality
  * signal a retrieval/training pipeline uses for embedding whitening,
  * dominant-direction removal (the "all-but-the-top" trick) and drift
  * monitoring.
  *
  * Scale design: the ONLY data-sized work is one scan that folds each
  * row's d-vector into a d²-slot moments buffer (count, per-dim sums,
  * Gram matrix) via a typed [[Aggregator]] — map-side combine means
  * the shuffle carries `partitions × (1+d+d²)` longs, never rows. The
  * d²-sized eigensolve then belongs on the driver (constant state, a
  * few KB for d=64): distributing a 4096-cell matrix-vector multiply
  * would be pure scheduler overhead at any corpus size. This is the
  * same state-is-constant contract as the Count-Min / IVF-centroid
  * operators ([[Sketches]], [[Similarity]]).
  *
  * Portability: the gate path scales inputs to integers
  * (`floor(x·xScale)`), builds the covariance as exact BIGINTs
  * (`n·Σxy − Σx·Σy`) and runs a fixed number of power-iteration steps
  * whose only division is truncating integer division — which Spark
  * `div`, Java `/` on longs and DuckDB `//` all define identically
  * (round toward zero), so the resulting integer eigvector is
  * bit-identical to a DuckDB chained-CTE replay. The production path
  * keeps full double precision and iterates to convergence.
  */
object Pca {

  /** One-pass moments: buffer[0] = n, buffer[1..d] = Σx_i,
    * buffer[1+d + i·d + j] = Σ x_i·x_j (row-major Gram). Input rows
    * are the pre-scaled integer vectors. */
  class MomentsAgg(d: Int)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {

    override def zero: Array[Long] = Array.ofDim[Long](1 + d + d * d)

    override def reduce(buf: Array[Long], x: Array[Long]): Array[Long] = {
      buf(0) += 1L
      var i = 0
      while (i < d) {
        val xi = x(i)
        buf(1 + i) += xi
        var j = 0
        val base = 1 + d + i * d
        while (j < d) { buf(base + j) += xi * x(j); j += 1 }
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Distributed moments pass over `vecCol: array<numeric>` scaled by
    * `floor(x·xScale)`. Returns the driver-side moments buffer. */
  private def moments(df: DataFrame, vecCol: String, d: Int,
      xScale: Long): Array[Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    val scaled = df
      .select(transform(col(vecCol),
        x => floor(x.cast("double") * xScale).cast("long")).as("x"))
      .as[Array[Long]]
    scaled.select(new MomentsAgg(d).toColumn).head()
  }

  /** Exact integer covariance (×n² scale): cov[i][j] = n·Σxy − Σx·Σy. */
  private[operators] def covFromMoments(m: Array[Long], d: Int): Array[Array[Long]] = {
    val n = m(0)
    Array.tabulate(d, d)((i, j) =>
      n * m(1 + d + i * d + j) - m(1 + i) * m(1 + j))
  }

  /** Fixed-step integer power iteration from v₀ = 1ᵈ. Each step:
    * w = cov·v, then v' = w / ceil(max|w| / vScale) with TRUNCATING
    * division (the semantics all three engines share). Deterministic,
    * partition-independent, overflow-safe for
    * n·xScale²·d·vScale < 2⁶³ (documented contract, asserted). */
  private[operators] def powerIterExact(cov: Array[Array[Long]], steps: Int,
      vScale: Long): Array[Long] = {
    val d = cov.length
    var v = Array.fill(d)(1L)
    (0 until steps).foreach { _ =>
      val w = Array.tabulate(d)(i => {
        var acc = 0L; var j = 0
        while (j < d) { acc += cov(i)(j) * v(j); j += 1 }
        acc
      })
      val m = w.map(math.abs).max
      // ceil(m/vScale) clamped to ≥1 (all-zero w stays all-zero) —
      // mirrors the oracle's greatest((max|w| + vScale-1) // vScale, 1)
      val div = math.max((m + vScale - 1) / vScale, 1L)
      v = w.map(_ / div) // trunc toward zero in Spark div, Java /, DuckDB //
    }
    v
  }

  /** Gate path: (pos, v) rows of the exact-scaled top component after
    * `steps` power iterations — bit-replayable in ANSI SQL. */
  def topComponentExactScaled(df: DataFrame, vecCol: String, d: Int,
      xScale: Long = 512L, steps: Int = 3, vScale: Long = 4096L): DataFrame = {
    val m = moments(df, vecCol, d, xScale)
    // |cov| ≤ 2n²·xScale²; |w| ≤ d·|cov|·(vScale+1) must stay < 2⁶³
    val nBound = math.sqrt(Long.MaxValue.toDouble /
      (2.0 * d * xScale * xScale * (vScale + 1))).toLong
    require(m(0) <= nBound,
      s"exact-scaled PCA overflow bound exceeded: n=${m(0)} > $nBound rows " +
        s"with xScale=$xScale, d=$d, vScale=$vScale — use topComponent " +
        "(double path) or lower the scales")
    val v = powerIterExact(covFromMoments(m, d), steps, vScale)
    val spark = df.sparkSession
    import spark.implicits._
    v.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toSeq
      .toDF("pos", "v")
  }

  /** Production path: double-precision covariance from the same
    * one-pass integer moments (xScale high enough that quantization
    * is below float32 input noise), power iteration with unit-norm
    * normalization until the direction moves < tol. Returns the unit
    * eigvector and its eigenvalue (Rayleigh quotient, covariance
    * scale — i.e. variance along the component × n²). */
  def topComponent(df: DataFrame, vecCol: String, d: Int,
      xScale: Long = 1 << 20, maxIters: Int = 100,
      tol: Double = 1e-12): (Array[Double], Double) = {
    val m = moments(df, vecCol, d, xScale)
    val n = m(0).toDouble
    val cov = Array.tabulate(d, d)((i, j) =>
      (n * m(1 + d + i * d + j).toDouble -
        m(1 + i).toDouble * m(1 + j).toDouble) / (xScale.toDouble * xScale))
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    var it = 0
    var moved = Double.MaxValue
    while (it < maxIters && moved > tol) {
      val w = Array.tabulate(d)(i => {
        var acc = 0.0; var j = 0
        while (j < d) { acc += cov(i)(j) * v(j); j += 1 }
        acc
      })
      val nrm = math.sqrt(w.map(x => x * x).sum)
      if (nrm == 0.0) { moved = 0.0 }
      else {
        val vn = w.map(_ / nrm)
        moved = vn.zip(v).map { case (a, b) => math.abs(a - b) }.max
        v = vn
        lambda = nrm
      }
      it += 1
    }
    (v, lambda)
  }
}
