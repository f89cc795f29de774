package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The md5-derived portable samplers (q101/q102) and the exact-scaled
  * alpha kernel (q104): decisions must replay bit-for-bit in any
  * engine, so these pin the primitive's value and the operators'
  * invariants under repartitioning.
  */
class PortableSamplingSpec extends SparkSpec {

  test("md5Bits32 pins the documented cross-engine value") {
    import spark.implicits._
    // DuckDB: SELECT ('0x'||substr(md5('42|1|2'),1,8))::BIGINT → 1966208817
    val v = Seq((1L, 2L)).toDF("a", "b")
      .select(Sampling.md5Bits32(42L, col("a"), col("b")).as("v"))
      .head().getLong(0)
    assert(v == 1966208817L)
  }

  test("portable stratified sample: fraction honored, partition-invariant") {
    val li = Tables.lineitem(spark, sf)
    val total = li.count()
    val keep = Sampling.stratifiedSamplePortable(
      li, Seq("l_orderkey", "l_linenumber"), 0.1, 42)
    val n1 = keep.count()
    assert(n1 > total * 0.06 && n1 < total * 0.14,
      s"sampled $n1 of $total, expected ~10%")
    val n2 = Sampling.stratifiedSamplePortable(
      li.repartition(13), Seq("l_orderkey", "l_linenumber"), 0.1, 42).count()
    assert(n1 == n2)
    // different seed selects a different subset
    val n3 = Sampling.stratifiedSamplePortable(
      li, Seq("l_orderkey", "l_linenumber"), 0.1, 7).count()
    assert(n3 > total * 0.06 && n3 < total * 0.14)
  }

  test("portable fragment: length law, containment, determinism") {
    val docs = Tables.documents(spark, sf).limit(50).cache()
    val frag = docs.select(col("doc_id"), col("text"),
      Sampling.randomFragmentPortable(col("text"), col("doc_id"), 0.5, 42)
        .as("fragment"))
    frag.collect().foreach { r =>
      val text = r.getString(1); val f = r.getString(2)
      assert(f.length == math.max(text.length / 2, 1))
      assert(text.contains(f))
    }
    val again = docs.select(
      Sampling.randomFragmentPortable(col("text"), col("doc_id"), 0.5, 42)
        .as("fragment"))
    assert(frag.select("fragment").except(again).count() == 0)
  }

  test("alphaExactScaled matches hand-unrolled integer recurrence on a path") {
    import spark.implicits._
    // path 1-2-3, alpha 0.1: v0 = 1e6 everywhere;
    // step: v(n) = floor(0.1 * sum_neighbors + 0.5) + 1e6
    val edges = Seq(("g", 1L, 2L), ("g", 2L, 3L)).toDF("group", "src", "dst")
    val out = graft.graph.GraphAnalytics.alphaExactScaled(edges, 0.1, iters = 2)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    def step(v: Map[Long, Long]): Map[Long, Long] = {
      val nb = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L))
      nb.map { case (n, ns) =>
        n -> (math.floor(0.1 * ns.map(v).sum + 0.5).toLong + 1000000L)
      }
    }
    val expect = step(step(Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L)))
    assert(out == expect)
  }

  test("fixed-size sample: exactly k per stratum, partition-invariant") {
    val docs = Tables.documents(spark, sf)
    val k = 3
    val out = Sampling.fixedSizeSamplePortable(docs, "source", Seq("doc_id"), k, 42)
    val sizes = out.groupBy("source").count().collect().map(_.getLong(1))
    assert(sizes.nonEmpty && sizes.forall(_ == k))
    val ids1 = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Sampling.fixedSizeSamplePortable(docs.repartition(13), "source",
      Seq("doc_id"), k, 42).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
  }

  test("powerExactScaled matches hand-unrolled Neumann recurrence on a path") {
    import spark.implicits._
    // path 1-2-3, beta 0.1: v0 = deg·1e6; step: v(n) = deg·1e6 + floor(0.1·Σ_nb v + 0.5)
    val edges = Seq(("g", 1L, 2L), ("g", 2L, 3L)).toDF("group", "src", "dst")
    val out = graft.graph.GraphAnalytics.powerExactScaled(edges, 0.1, iters = 2)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val nb = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L))
    val deg = nb.view.mapValues(_.size.toLong).toMap
    def step(v: Map[Long, Long]): Map[Long, Long] =
      nb.map { case (n, ns) =>
        n -> (deg(n) * 1000000L + math.floor(0.1 * ns.map(v).sum + 0.5).toLong)
      }
    val v0 = deg.view.mapValues(_ * 1000000L).toMap
    assert(out == step(step(v0)))
  }

  test("proportional rarefaction: exact depth per group, partition-invariant") {
    val ab = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag").as("group"), col("l_partkey").as("item"))
      .agg(sum(col("l_quantity").cast("long")).as("count"))
    val out = Sampling.rarefyProportional(ab, depth = 500)
    val totals = out.groupBy("group").agg(sum("count").as("t"))
      .collect().map(_.getLong(1))
    assert(totals.nonEmpty && totals.forall(_ == 500L),
      s"every surviving group must hold exactly depth units, got ${totals.toSeq}")
    val again = Sampling.rarefyProportional(ab.repartition(13), depth = 500)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
  }

  test("ssspExactScaled: min-plus distances on a weighted path with a shortcut") {
    import spark.implicits._
    // 1 -2- 2 -3- 3, shortcut 1 -4- 3: dist(3) = min(2+3, 4) = 4; root = min node = 1
    val edges = Seq(("g", 1L, 2L, 2L), ("g", 2L, 3L, 3L), ("g", 1L, 3L, 4L))
      .toDF("group", "src", "dst", "weight")
    val out = graft.graph.GraphAnalytics.ssspExactScaled(edges, iters = 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 0L, 2L -> 2L, 3L -> 4L))
  }

  test("kcore: peeling removes the tail, keeps the triangle") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant path 3-4-5: 2-core = the triangle
    val edges = Seq(("g", 1L, 2L), ("g", 2L, 3L), ("g", 1L, 3L),
        ("g", 3L, 4L), ("g", 4L, 5L))
      .toDF("group", "src", "dst")
    val out = graft.graph.GraphAnalytics.kcore(edges, k = 2, iters = 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kfoldPortable: per-stratum balance <=1, exhaustive, partition-invariant") {
    import spark.implicits._
    // stratum sizes 7 and 12 over k=5: folds must split 2/1/... and 3/3/2/2/2
    val rows = ((1L to 7L).map(i => (i, "a")) ++ (101L to 112L).map(i => (i, "b")))
      .toDF("id", "stratum")
    val folds = Sampling.kfoldPortable(rows, "stratum", Seq("id"), k = 5, seed = 3)
    val census = folds.groupBy("stratum", "fold").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (s <- Seq("a", "b")) {
      val sizes = (0 until 5).map(f => census.getOrElse((s, f), 0L))
      assert(sizes.sum == (if (s == "a") 7 else 12))
      assert(sizes.max - sizes.min <= 1, s"stratum $s folds unbalanced: $sizes")
    }
    // every row gets exactly one fold, stable under repartitioning
    assert(folds.count() == 19)
    val again = Sampling.kfoldPortable(rows.repartition(7), "stratum",
        Seq("id"), k = 5, seed = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    val first = folds.collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(again == first)
    // a different seed reassigns (sanity that the hash drives the order)
    val other = Sampling.kfoldPortable(rows, "stratum", Seq("id"), k = 5, seed = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(other != first)
  }

  test("clusterDuplicates over exact-Jaccard pairs: min-id reps") {
    import spark.implicits._
    val docs = Seq((1L, "a b c", "s"), (2L, "a b c", "s"), (3L, "x y", "s"))
      .toDF("doc_id", "text", "source")
    val tok = docs.select(col("doc_id"), col("source").as("blk"),
      explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
    val pairs = Dedup.jaccardPairsTokens(tok, 0.8).select("d1", "d2")
    val cc = Dedup.clusterDuplicates(pairs, docs.select("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }
}
