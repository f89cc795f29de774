package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 2.0f))
    ).toDF("a", "b")
    val got = df.select(Similarity.cosine(
      transform(col("a"), _.cast("double")),
      transform(col("b"), _.cast("double"))).as("c")).collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
  }

  test("bruteForceTopK returns k ranked neighbors, no self-matches") {
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 3).cache()
    assert(out.count() == 15)
    assert(out.filter(col("query_id") === col("neighbor_id")).count() == 0)
    // ranks are 1..k and scores non-increasing within each query
    val byQ = out.collect().groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lsh buckets are deterministic and bucket-mates share hyperplane side") {
    val emb = Tables.embeddings(spark, sf)
    val b1 = emb.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), 8, 64).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = emb.repartition(13).select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), 8, 64).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
    assert(b1.values.toSet.size > 1, "multiple buckets expected")
  }

  test("cosineExactScaled fused kernel == composed triple-aggregate, bit-identical") {
    // real embeddings all-pairs (vec_id < 40), plus adversarial rows:
    // rounding boundaries (x·y·1e6 landing on .5), zero vectors (the
    // composed form divides by 0 → ±Inf/NaN — the kernel must NOT
    // guard), negatives, and unequal norms
    val emb = Tables.embeddings(spark, sf)
    val pairs = emb.where(col("vec_id") < 40).select(col("vec_id").as("i"),
        transform(col("embedding"), _.cast("double")).as("a"))
      .crossJoin(emb.where(col("vec_id") < 40).select(col("vec_id").as("j"),
        transform(col("embedding"), _.cast("double")).as("b")))
    val adv = Seq(
      // dot terms land on the .5 rounding boundary (HALF_UP vs rint
      // discriminator) while every norm stays non-zero after scaling
      (Array(1.0, 1.0), Array(0.0000005, 1.0)),
      (Array(1.0, -1.0), Array(-0.0000005, 2.0)),
      (Array(1.5, -2.25), Array(-0.5, 3.125))
    ).toDF("a", "b").select(lit(-1L).as("i"), col("a"), lit(-2L).as("j"), col("b"))
    val all = pairs.unionByName(adv)
    val cmp = all.select(
        Similarity.cosineExactScaled(col("a"), col("b")).as("fused"),
        Similarity.cosineExactScaledComposed(col("a"), col("b")).as("composed"))
      .collect()
    cmp.foreach { r =>
      val f = r.getDouble(0); val c = r.getDouble(1)
      assert(java.lang.Double.doubleToRawLongBits(f) ==
        java.lang.Double.doubleToRawLongBits(c),
        s"fused $f != composed $c (bitwise)")
    }
    // zero norms: ANSI mode makes the composed form THROW
    // (DIVIDE_BY_ZERO — double division included in Spark 4); the
    // kernel is deliberately TOTAL instead: IEEE ±Inf/NaN. No gate
    // scores zero vectors; the kernel must not kill a job that does.
    val z = Seq((Array(0.0, 0.0), Array(1.0, 2.0)),
      (Array(0.0, 0.0), Array(0.0, 0.0))).toDF("a", "b")
      .select(Similarity.cosineExactScaled(col("a"), col("b")).as("f"))
      .collect().map(_.getDouble(0))
    assert(z(0).isNaN || z(0).isInfinite)
    assert(z(1).isNaN)
  }

  test("cosineExactScaled is partition-independent and tracks exact cosine") {
    val emb = Tables.embeddings(spark, sf)
    def run(df: org.apache.spark.sql.DataFrame) = Similarity.bruteForceTopK(
      df.filter(col("vec_id") < 5), df, "vec_id", "embedding", 3,
      scorer = Similarity.cosineExactScaled)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val a = run(emb)
    val b = run(emb.repartition(17))
    assert(a == b, "scaled scorer must be bit-identical across partitionings")
    // scaled score stays within quantization error of the exact scorer
    val exact = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 3)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    a.foreach { case (q, _, n, s) =>
      exact.get((q, n)).foreach(e => assert(math.abs(s - e) < 1e-3)) }
  }

  test("ivfTopK probes buckets and never beats brute-force top-1") {
    val emb = Tables.embeddings(spark, sf).cache()
    val q = emb.filter(col("vec_id") < 5)
    val ivf = Similarity.ivfTopK(q, emb, "vec_id", "embedding",
      nCentroids = 8, nProbe = 3, k = 3).cache()
    assert(ivf.count() > 0)
    assert(ivf.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    ivf.collect().foreach { r =>
      assert(r.getDouble(3) <= bf(r.getLong(0)) + 1e-12,
        "IVF can miss neighbors but can never invent a better score")
    }
    // probing ALL centroids must recover the exact brute-force top-k
    val full = Similarity.ivfTopK(q, emb, "vec_id", "embedding",
      nCentroids = 8, nProbe = 8, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bf3 = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == bf3, "nProbe = nCentroids degenerates to exact search")
  }

  test("ivfTopK centroid training is partition-independent") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 3)
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopK(q, df, "vec_id", "embedding", 8, 2, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(run(emb) == run(emb.repartition(13)))
  }

  test("ivfTopK recall@10 vs brute-force stays high at partial probe") {
    // measured 1.000 on the fixture at nProbe=2..4 of 8; the 0.95
    // floor pins centroid assignment + bucket routing — a routing bug
    // (probing the wrong inverted lists) craters recall long before
    // it breaks the never-beats-exact ordering law above
    val emb = Tables.embeddings(spark, sf).cache()
    val q = emb.filter(col("vec_id") < 50)
    val ivf = Similarity.ivfTopK(q, emb, "vec_id", "embedding",
        nCentroids = 8, nProbe = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.95, f"IVF recall@10 degraded: $recall%.3f")
  }

  test("lshTopK neighbors are a subset of brute-force candidates in quality") {
    val emb = Tables.embeddings(spark, sf).cache()
    val bf = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", 6, 64, 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // LSH can miss, but found scores can never beat exact top-1
    lsh.foreach { case (q, s) => assert(s <= bf(q) + 1e-12) }
    assert(lsh.nonEmpty)
  }

  test("knnClassify: vote invariants and IVF-candidate agreement with the exact form") {
    val emb = Tables.embeddings(spark, sf).cache()
    val q = emb.filter(col("vec_id") < 25)
    val exact = Similarity.knnClassify(q, emb, "vec_id", "embedding", "label",
        k = 10, scorer = Similarity.cosineExactScaled)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(exact.size == 25)
    val labelDomain = emb.select(col("label").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(exact.values.forall { case (l, v) => labelDomain.contains(l) && v >= 1 && v <= 10 })
    // partition independence
    val re = Similarity.knnClassify(q.repartition(7), emb.repartition(11),
        "vec_id", "embedding", "label", k = 10,
        scorer = Similarity.cosineExactScaled)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(exact == re)
    // the scale path: IVF candidates into the same vote — high agreement
    val ivfNn = Similarity.ivfTopK(q, emb, "vec_id", "embedding",
      nCentroids = 16, nProbe = 8, k = 10)
    val ivf = Similarity.majorityVote(ivfNn, emb, "vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = exact.count { case (id, (l, _)) => ivf.get(id).contains(l) }
    assert(agree >= 18, s"IVF-candidate kNN agreement degraded: $agree/25")
  }

  test("PQ/ADC with every row a seed degenerates to exact L2 search") {
    // k = corpus size makes each vector's own sub-vectors codebook
    // entries: assignment distance 0, ADC == exact integer L2, so the
    // ADC top-k must equal the brute-force L2 top-k bit-for-bit
    val emb = Tables.embeddings(spark, sf).cache()
    val n = emb.count().toInt
    val q = emb.filter(col("vec_id") < 5)
    val model = Similarity.pqTrain(emb, "vec_id", "embedding",
      m = 8, k = n, refineIters = 0)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", model)
    val adc = Similarity.pqAdcTopK(q, codes, "vec_id", "embedding", model, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bfL2 = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5,
        scorer = (a, b) => -Similarity.intL2(a, b).cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(adc == bfL2, "full-codebook PQ must be exact")
  }

  test("PQ training/encoding is partition-independent and codes are in range") {
    val emb = Tables.embeddings(spark, sf)
    def run(df: org.apache.spark.sql.DataFrame) = {
      val model = Similarity.pqTrain(df, "vec_id", "embedding",
        m = 8, k = 8, refineIters = 1)
      Similarity.pqEncode(df, "vec_id", "embedding", model)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).sortBy(_._1).toSeq
    }
    val base = run(emb)
    assert(base == run(emb.repartition(13)))
    assert(base.forall(_._2.forall(c => c >= 0 && c < 8)))
    assert(base.forall(_._2.length == 8))
  }

  test("PQ/ADC recall@10 vs brute-force L2 on the fixture") {
    // uniform-random 64-d embeddings are PQ's worst case (no cluster
    // structure, concentrated distances): measured 0.285 pure-ADC and
    // 0.840 with the shortlist=10 exact re-rank at m=8, k=16. The
    // floors pin codebook training + ADC routing — an assignment or
    // table-lookup bug craters both long before normal variance does.
    val emb = Tables.embeddings(spark, sf).cache()
    val q = emb.filter(col("vec_id") < 20)
    val model = Similarity.pqTrain(emb, "vec_id", "embedding",
      m = 8, k = 16, refineIters = 2)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", model)
    val adc = Similarity.pqAdcTopK(q, codes, "vec_id", "embedding", model, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 10,
        scorer = (a, b) => -Similarity.intL2(a, b).cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = adc.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.20, f"pure-ADC recall@10 degraded: $recall%.3f")
    val rr = Similarity.pqAdcTopKReranked(q, codes, emb, "vec_id", "embedding",
        model, k = 10, shortlist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recallRr = rr.intersect(bf).size.toDouble / bf.size
    assert(recallRr >= 0.70, f"re-ranked recall@10 degraded: $recallRr%.3f")
    assert(recallRr > recall, "re-rank did not improve recall")
  }
}
