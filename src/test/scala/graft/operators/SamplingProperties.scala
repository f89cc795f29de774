package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the stochastic operators (SURVEY §5:
  * "depth preserved, zero-loss rows dropped"), run against the
  * hypergeometric kernel directly — the distributed wrapper is
  * covered by SamplingSpec. */
object SamplingProperties extends Properties("Sampling") {

  private val genParams = for {
    nTotal <- Gen.choose(1L, 2000L)
    k <- Gen.choose(0L, nTotal)
    n <- Gen.choose(0L, nTotal)
    seed <- Gen.choose(0L, 10000L)
  } yield (nTotal, k, n, seed)

  property("hypergeometric stays within its support") = forAll(genParams) {
    case (nn, k, n, seed) =>
      val x = Sampling.hypergeometric(new scala.util.Random(seed), nn, k, n)
      x >= math.max(0L, n - (nn - k)) && x <= math.min(k, n)
  }

  property("hypergeometric is deterministic for a given rng seed") = forAll(genParams) {
    case (nn, k, n, seed) =>
      Sampling.hypergeometric(new scala.util.Random(seed), nn, k, n) ==
        Sampling.hypergeometric(new scala.util.Random(seed), nn, k, n)
  }

  private val genCounts = for {
    nItems <- Gen.choose(1, 12)
    counts <- Gen.listOfN(nItems, Gen.choose(0L, 500L))
    seed <- Gen.choose(0L, 1000L)
  } yield (counts, seed)

  /** The sequential conditional decomposition must draw exactly the
    * requested depth when feasible — the invariant rarefy relies on. */
  property("sequential decomposition sums to the requested depth") = forAll(genCounts) {
    case (counts, seed) =>
      val total = counts.sum
      val depth = math.min(total, math.max(0L, total / 2))
      val rng = new scala.util.Random(seed)
      var remTotal = total
      var remDraw = depth
      var drawn = 0L
      counts.foreach { c =>
        val x = Sampling.hypergeometric(rng, remTotal, c, remDraw)
        drawn += x
        remTotal -= c
        remDraw -= x
      }
      drawn == depth
  }

  property("sampleColumns returns a sorted subset of requested size") =
    forAll(Gen.choose(1, 50), Gen.choose(0.05, 1.0), Gen.choose(0L, 99L)) {
      (nCols, frac, seed) =>
        val cols = (1 to nCols).map(i => s"c$i")
        val out = Sampling.sampleColumns(cols, frac, seed)
        out == out.sorted && out.toSet.subsetOf(cols.toSet) &&
          out.size == math.max(1, math.round(nCols * frac).toInt)
    }
}
