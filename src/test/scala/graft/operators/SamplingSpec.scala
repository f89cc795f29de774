package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def counts = Seq(
    ("s1", "a", 500L), ("s1", "b", 300L), ("s1", "c", 200L),
    ("s2", "a", 50L), ("s2", "d", 10L),
    ("s3", "a", 5L) // total 5 < depth → dropped
  ).toDF("group", "item", "count")

  test("rarefy draws exactly depth per group and drops shallow groups") {
    val out = Sampling.rarefy(counts, depth = 40, seed = 42).cache()
    val totals = out.groupBy("group").agg(sum("count").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals("s1") == 40 && totals("s2") == 40)
    assert(!totals.contains("s3"))
  }

  test("rarefy never draws more than available per item and keeps zero rows out") {
    val out = Sampling.rarefy(counts, depth = 55, seed = 7)
      .withColumnRenamed("count", "drawn")
      .join(counts, Seq("group", "item"))
    assert(out.filter(col("drawn") > col("count")).count() == 0)
    assert(out.filter(col("drawn") <= 0).count() == 0)
  }

  test("rarefy is deterministic under repartitioning and seed-sensitive") {
    def run(df: org.apache.spark.sql.DataFrame, seed: Long) =
      Sampling.rarefy(df, 100, seed).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val a = run(counts, 42)
    val b = run(counts.repartition(11), 42)
    assert(a == b)
    val c = run(counts, 43)
    assert(a != c, "different seed should give a different draw (overwhelmingly)")
  }

  test("rarefy approximately preserves proportions at large depth") {
    val big = Seq(("g", "x", 70000L), ("g", "y", 30000L)).toDF("group", "item", "count")
    val out = Sampling.rarefy(big, 10000, 42)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(math.abs(out("x") - 7000.0) < 300)
    assert(out("x") + out("y") == 10000)
  }

  test("hypergeometric sampler: exact edges and support bounds") {
    val rng = new scala.util.Random(1)
    assert(Sampling.hypergeometric(rng, 10, 5, 10) == 5)   // draw all
    assert(Sampling.hypergeometric(rng, 10, 0, 4) == 0)
    assert(Sampling.hypergeometric(rng, 10, 10, 4) == 4)   // all successes
    // forced minimum: N=10, K=8, n=9 → X ≥ 7
    (1 to 50).foreach { i =>
      val x = Sampling.hypergeometric(new scala.util.Random(i), 10, 8, 9)
      assert(x >= 7 && x <= 8)
    }
  }

  test("stratifiedSample is deterministic and fraction-accurate") {
    val li = graft.Tables.lineitem(spark, sf)
    val s1 = Sampling.stratifiedSample(li, Seq("l_orderkey", "l_linenumber"), 0.25, 42)
    val s2 = Sampling.stratifiedSample(li.repartition(9), Seq("l_orderkey", "l_linenumber"), 0.25, 42)
    assert(s1.count() == s2.count())
    val frac = s1.count().toDouble / li.count()
    assert(math.abs(frac - 0.25) < 0.03)
  }

  test("randomFragment returns in-bounds substring of requested fraction") {
    val df = Seq((1L, "ACGTACGTACGTACGTACGT")).toDF("id", "seq")
    val frag = df.select(Sampling.randomFragment(col("seq"), col("id"), 0.5, 42).as("f"))
      .head.getString(0)
    assert(frag.length == 10)
    assert("ACGTACGTACGTACGTACGT".contains(frag))
  }

  test("sampleColumns is deterministic for a given seed") {
    val cols = (1 to 20).map(i => s"c$i")
    assert(Sampling.sampleColumns(cols, 0.25, 7) == Sampling.sampleColumns(cols, 0.25, 7))
    assert(Sampling.sampleColumns(cols, 0.25, 7).size == 5)
  }

  test("RarefyAggregator matches the flatMapGroups rarefy exactly") {
    val agg = new RarefyAggregator(depth = 40, seed = 42).toColumn
    val viaAgg = counts.as[(String, String, Long)]
      .groupByKey(_._1)
      .agg(agg.name("drawn"))
      .collect()
      .flatMap { case (g, m) => m.map { case (item, c) => (g, item) -> c } }
      .toMap
    val viaGroups = Sampling.rarefy(counts, 40, 42).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(viaAgg == viaGroups)
    // partial-merge path: many partitions must not change the draw
    val viaAggPart = counts.repartition(13).as[(String, String, Long)]
      .groupByKey(_._1)
      .agg(agg.name("drawn"))
      .collect()
      .flatMap { case (g, m) => m.map { case (item, c) => (g, item) -> c } }
      .toMap
    assert(viaAggPart == viaGroups)
  }
}
