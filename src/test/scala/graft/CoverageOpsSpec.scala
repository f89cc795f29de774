package graft

import graft.graph.{GraphBuild, LocalGraph, PropertyGraph}
import graft.ml.KmerBinning
import graft.operators.Sampling
import graft.sources.Tabular
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Specs for the long-tail SURVEY §2 rows: power centrality (G11),
  * robustness (G19), introspection (G20), graph persistence (S9/S12),
  * TSV source/sink (S1/S11), rarefaction curve (M12), k-mer binning
  * (M13). */
class CoverageOpsSpec extends SparkSpec {
  import spark.implicits._

  test("HLL++ estimates are partition-independent (register max is commutative)") {
    // the q140 pin is only sound if the sketch result cannot depend on
    // how rows are distributed or ordered across tasks
    val keys = (0 until 20000).map(i => (i % 3).toString -> (i.toLong * 2654435761L % 1000000))
    val base = keys.toDF("grp", "key")
    val a = base.repartition(3).groupBy("grp")
      .agg(approx_count_distinct(col("key"), 0.02).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = base.repartition(29, col("key")).groupBy("grp")
      .agg(approx_count_distinct(col("key"), 0.02).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, s"HLL estimate depends on partitioning: $a vs $b")
  }

  test("power centrality: star center dominates; beta=0 reduces to degree") {
    val star = LocalGraph.fromEdges(Seq((0L, 1L, 1.0), (0L, 2L, 1.0), (0L, 3L, 1.0)))
    val p = star.powerCentrality(beta = 0.0)
    // beta=0 → x = A·1 scaled: proportional to degree (3,1,1,1)
    assert(p(0) / p(1) > 2.9 && p(0) / p(1) < 3.1)
    val p2 = star.powerCentrality(beta = 0.2)
    assert(p2(0) > p2(1))
  }

  test("robustness curve: removing the star center shatters the graph") {
    val star = LocalGraph.fromEdges(Seq((0L, 1L, 1.0), (0L, 2L, 1.0), (0L, 3L, 1.0)))
    val r = star.robustnessCurve(1)
    assert(r(0) == 1.0)
    assert(r(1) == 0.25) // isolated leaves: largest component = 1 of 4
  }

  test("describe: architecture triples with counts") {
    val nodes = Seq((1L, "p", "Phage"), (2L, "b", "Bacterial_Host"), (3L, "s", "SampleID"))
      .toDF("id", "name", "kind")
    val edges = Seq((1L, 2L, "Infects"), (3L, 1L, "Sampled"), (3L, 2L, "Sampled"))
      .toDF("src", "dst", "relType")
    val d = PropertyGraph(nodes, edges).describe.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(d(("Phage", "Infects", "Bacterial_Host")) == 1)
    assert(d(("SampleID", "Sampled", "Phage")) == 1)
    assert(d(("SampleID", "Sampled", "Bacterial_Host")) == 1)
  }

  test("graph save/load roundtrip with relType partition pruning") {
    val g = GraphBuild.tpchGraph(spark, sf)
    val base = Files.tempDir("graphsave")
    g.save(base)
    val loaded = PropertyGraph.load(spark, base)
    assert(loaded.nodes.count() == g.nodes.count())
    assert(loaded.edges.count() == g.edges.count())
    // partition pruning: relType filter reads only one partition dir
    val plan = loaded.edges.filter(col("relType") === "supplies")
      .queryExecution.executedPlan.toString
    assert(new java.io.File(s"$base/edges/relType=supplies").exists())
    assert(loaded.edges.filter(col("relType") === "supplies").count() > 0)
  }

  test("tsv source with declared schema + sink roundtrip") {
    val schema = new StructType()
      .add("bacteria", StringType).add("phage", StringType).add("score", DoubleType)
    val dir = Files.tempDir("tsv")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/e.tsv"),
      "Host A\tPhage X\t99.5\nHost B\tPhage Y\t10\n")
    val df = Tabular.tsv(spark, s"$dir/e.tsv", schema)
    assert(df.schema == schema)
    assert(df.count() == 2)
    Tabular.writeTsv(df, s"$dir/out")
    val back = spark.read.option("sep", "\t").option("header", "true")
      .schema(schema).csv(s"$dir/out")
    assert(back.collect().map(_.getDouble(2)).sorted.toSeq == Seq(10.0, 99.5))
  }

  test("rarefaction curve: richness non-decreasing with depth") {
    val ab = Seq(("g1", "a", 100L), ("g1", "b", 50L), ("g1", "c", 5L), ("g1", "d", 1L))
      .toDF("group", "item", "count")
    val curve = Sampling.rarefactionCurve(ab, Seq(10L, 50L, 150L), seed = 42)
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
    assert(curve(10L) <= curve(50L) && curve(50L) <= curve(150L))
    assert(curve(150L) == 4) // full depth sees every item
  }

  test("kmer binning separates AT-rich from GC-rich sequences") {
    val seqs = ((1 to 10).map(i => (i.toLong, "ATAT" * 20)) ++
      (11 to 20).map(i => (i.toLong, "GCGC" * 20))).toDF("id", "seq")
    val binned = KmerBinning.bin(seqs, "seq", k = 2, maxClusters = 2)
    val byBin = binned.select("id", "bin").collect()
      .groupBy(_.getInt(1)).map { case (b, rows) => b -> rows.map(_.getLong(0)).toSet }
    assert(byBin.size == 2)
    assert(byBin.values.toSet == Set((1L to 10L).toSet, (11L to 20L).toSet))
  }
  test("BPE-ish piece count: contractions, digit runs, punctuation runs") {
    val rows = Seq(
      (1L, "don't stop"),        // don | 't | _stop -> 3
      (2L, "hello world 123"),   // hello | _world | _123 -> 3
      (3L, "a,b!!c"),            // a | , | b | !! | c -> 5
      (4L, "x2026 tokens"))      // x | 2026 | _tokens -> 3
      .toDF("id", "t")
    val got = rows.select(col("id"),
        graft.operators.TextOps.bpePieceCount(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 5L, 4L -> 3L), s"got $got")
  }
}

object Files {
  def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
