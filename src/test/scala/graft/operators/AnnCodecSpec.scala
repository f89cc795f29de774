package graft.operators

import graft.SparkSpec
import graft.functions.AnnCodec
import org.apache.spark.sql.functions._

/** Equality laws for the fused ANN kernels (round-9 verdict ask #1):
  * the native [[graft.functions.NearestCentroidL2]] /
  * [[graft.functions.PqEncodeCodes]] expressions, the composed
  * literal forms they replaced, and the broadcast-FRAME argmin twin
  * the verdict named must be BIT-IDENTICAL — same argmin, same
  * ties → smaller-cid/code break, same scaled rounding — because four
  * pinned oracles (q244/q245/q250/q262) hash the downstream results.
  */
class AnnCodecSpec extends SparkSpec {

  private def emb = graft.Tables.embeddings(spark, sf)

  private def cents: Array[(Int, Array[Double])] = {
    val c = emb.select(col("vec_id").as("vid"),
      Similarity.asDouble(col("embedding")).as("v"))
    Similarity.ivfTrain(c, 8, 1)
  }

  test("roundScaled replicates Spark's round(x*1e6).cast(long) on boundary doubles") {
    import spark.implicits._
    // the traps: HALF_UP on negatives (Math.round rounds toward +inf),
    // the JDK floor(x+0.5) boundary double, exact .5 scaled values,
    // and plain float-noise magnitudes like the embedding columns'
    val xs = Seq(0.49999999999999994e-6, -0.49999999999999994e-6,
      2.5e-6, -2.5e-6, 1.5e-6, -1.5e-6, 0.5e-6, -0.5e-6, 3.5e-6,
      1e-13, -1e-13, 0.1 + 0.2, -(0.1 + 0.2), 123.456789012345,
      -987.654321098765, 0.0, -0.0, 1.0000005, -1.0000005)
    val got = xs.toDF("x")
      .select(round(col("x") * 1e6).cast("long")).as[Long].collect()
    val want = xs.map(AnnCodec.roundScaled)
    assert(got.toSeq == want,
      xs.zip(got.toSeq.zip(want)).filter(t => t._2._1 != t._2._2).toString)
    // and across a real embedding sample, element by element
    val sample = emb.limit(50)
      .select(explode(Similarity.asDouble(col("embedding"))).as("x"))
    val both = sample
      .select(col("x"), round(col("x") * 1e6).cast("long").as("s"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(1) == AnnCodec.roundScaled(r.getDouble(0)),
        s"mismatch at ${r.getDouble(0)}")
    }
  }

  test("native nearest-centroid ≡ composed literal argmin ≡ broadcast-frame twin (cid), rv bit-identical") {
    val cs = cents
    val native = AnnIndex.encodeSource(emb, "vec_id", "embedding", cs,
      residual = true).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Double](2).toList)).toMap
    // the composed form this replaced: literal array_min argmin +
    // broadcast-centroid zip_with subtraction
    val cdf = broadcast(AnnIndex.centroidsDf(spark, cs))
    val composed = emb
      .select(col("vec_id").as("vid"),
        Similarity.asDouble(col("embedding")).as("v"))
      .withColumn("cid", AnnIndex.nearestByL2(col("v"), cs))
      .join(cdf, "cid")
      .select(col("vid"), col("cid"),
        zip_with(col("v"), col("cvec_full"), (x, c) => x - c).as("rv"))
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Double](2).toList)).toMap
    assert(native == composed,
      "fused kernel diverged from the composed literal form")
    // the verdict's broadcast-frame shape agrees on every assignment
    val frame = AnnIndex.nearestByL2FrameTwin(emb, "vec_id", "embedding", cs)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(native.view.mapValues(_._1).toMap == frame,
      "broadcast-frame argmin diverged from the fused kernel")
    assert(native.nonEmpty)
  }

  test("all three argmin forms break exact-distance ties to the SMALLEST cid") {
    import spark.implicits._
    // cids deliberately out of order; two centroids identical, the
    // third equidistant from the probe — every distance ties
    val tieCents = Array(3 -> Array(1.0, 0.0), 1 -> Array(1.0, 0.0),
      2 -> Array(-1.0, 0.0))
    val probes = Seq((10L, Seq(0.0f, 0.0f)), (11L, Seq(0.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    def cidsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val native = cidsOf(AnnIndex.encodeSource(probes, "vec_id", "embedding",
      tieCents, residual = true).select("vid", "cid"))
    val literal = cidsOf(probes.select(col("vec_id").as("vid"),
      AnnIndex.nearestByL2(
        Similarity.asDouble(col("embedding")), tieCents).as("cid")))
    val frame = cidsOf(AnnIndex.nearestByL2FrameTwin(
      probes, "vec_id", "embedding", tieCents))
    assert(native == literal && literal == frame)
    assert(native(10L) == 1, "equidistant tie must break to smallest cid")
    assert(native(11L) == 1, "identical-centroid tie must break to smallest cid")
  }

  test("fused arg-top-N ≡ composed slice(array_sort(transform(...))) — cosine and L2, all n, tie order") {
    val cs = cents
    val v = Similarity.asDouble(col("embedding"))
    def arrays(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    // n below / at / above the centroid count — slice caps at length,
    // the kernel must cap identically
    for (n <- Seq(1, 3, cs.length, cs.length + 5)) {
      val fusedCos = arrays(emb.select(col("vec_id"),
        AnnCodec.topNCentroidsCosine(v, cs, n).as("a")))
      val composedCos = arrays(emb.select(col("vec_id"),
        Similarity.topNCentroidsCosineComposed(v, cs, n).as("a")))
      assert(fusedCos == composedCos, s"cosine top-$n diverged")
      val fusedL2 = arrays(emb.select(col("vec_id"),
        AnnCodec.topNCentroidsL2(v, cs, n).as("a")))
      val composedL2 = arrays(emb.select(col("vec_id"),
        AnnIndex.topNByL2Composed(v, cs, n).as("a")))
      assert(fusedL2 == composedL2, s"L2 top-$n diverged")
      assert(fusedCos.head._2.size == math.min(n, cs.length))
    }
    // tie fixtures: duplicate centroids under out-of-order cids must
    // order ties cid-ascending, exactly like the struct sort; the
    // equidistant probe (10) ties ALL distances/scores
    import spark.implicits._
    val tieCents = Array(3 -> Array(1.0, 0.0), 1 -> Array(1.0, 0.0),
      2 -> Array(-1.0, 0.0))
    val probes = Seq((10L, Seq(0.0f, 0.0f)), (11L, Seq(2.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pv = Similarity.asDouble(col("embedding"))
    for (n <- Seq(1, 2, 3)) {
      val f = arrays(probes.select(col("vec_id"),
        AnnCodec.topNCentroidsCosine(pv, tieCents, n).as("a")))
      val cT = arrays(probes.select(col("vec_id"),
        Similarity.topNCentroidsCosineComposed(pv, tieCents, n).as("a")))
      assert(f == cT, s"cosine tie top-$n diverged")
      val fL = arrays(probes.select(col("vec_id"),
        AnnCodec.topNCentroidsL2(pv, tieCents, n).as("a")))
      val cL = arrays(probes.select(col("vec_id"),
        AnnIndex.topNByL2Composed(pv, tieCents, n).as("a")))
      assert(fL == cL, s"L2 tie top-$n diverged")
    }
    // the zero vector scores 0.0 against everything (CosineSim's
    // zero-denominator guard) → the full ranking is the cid order
    val zeroTop = arrays(probes.where(col("vec_id") === 10)
      .select(col("vec_id"),
        AnnCodec.topNCentroidsCosine(pv, tieCents, 3).as("a")))(10L)
    assert(zeroTop == List(1, 2, 3), s"all-tied ranking must be cid asc: $zeroTop")
  }

  test("fused l2NormalizeExact ≡ composed HOF form, bit-identical incl. the zero-vector guard") {
    val v = Similarity.asDouble(col("embedding"))
    def vecs(c: org.apache.spark.sql.Column) =
      emb.select(col("vec_id"), c.as("n"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    assert(vecs(Similarity.l2NormalizeExact(v)) ==
      vecs(Similarity.l2NormalizeExactComposed(v)),
      "fused normalization diverged from the composed HOF form")
    // zero vector: S == 0 → identity, not NaN — in both forms
    import spark.implicits._
    val z = Seq((1L, Seq(0.0, 0.0, 0.0)), (2L, Seq(3.0, 0.0, 4.0))).toDF("vec_id", "v")
    def zv(c: org.apache.spark.sql.Column) = z.select(col("vec_id"), c.as("n"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    val f = zv(Similarity.l2NormalizeExact(col("v")))
    assert(f == zv(Similarity.l2NormalizeExactComposed(col("v"))))
    assert(f(1L) == List(0.0, 0.0, 0.0), "zero vector must map to itself")
    // a normalized vector has scaled norm ~1e6 (unit up to rounding)
    val s = f(2L).map(x => math.round(x * x * 1e6)).sum
    assert(math.abs(s - 1000000L) < 100, s"not unit after normalization: $s")
  }

  test("native PQ codes ≡ relational pqEncode, ties to smallest code; dim hint changes nothing") {
    val c = emb.select(col("vec_id").as("vid"),
      Similarity.asDouble(col("embedding")).as("v"))
    val model = Similarity.pqTrain(c, "vid", "v", m = 8, k = 4)
    val hinted = Similarity.pqTrain(c, "vid", "v", m = 8, k = 4,
      dim = model.dim)
    assert(model.m == hinted.m && model.k == hinted.k &&
      model.dim == hinted.dim &&
      model.codebooks.flatten.flatten.toSeq ==
        hinted.codebooks.flatten.flatten.toSeq,
      "dim hint changed the trained model")
    val relational = Similarity.pqEncode(c, "vid", "v", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val native = c.select(col("vid"),
        AnnCodec.pqCodes(col("v"), model.codebooks).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(native == relational,
      "fused PQ encoder diverged from the relational form")
    // tie fixture: duplicate codewords — argmin must keep the smaller
    // code, exactly like min(struct(d, code))
    import spark.implicits._
    val dupCb = Array.fill(2)(Array(Array(0.5, 0.5), Array(0.5, 0.5)))
    val got = Seq((1L, Seq(0.5, 0.5, 0.5, 0.5))).toDF("vid", "v")
      .select(AnnCodec.pqCodes(col("v"), dupCb).as("codes"))
      .collect().head.getSeq[Int](0)
    assert(got == Seq(0, 0), "duplicate-codeword tie must keep code 0")
  }
}
