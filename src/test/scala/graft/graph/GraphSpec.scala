package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reference-shaped graph build + motif semantics on tiny fixtures
  * mirroring FIXTURES.md §1 (evidence triples with messy names). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // (bacteria, phage, score) evidence rows — names pre-sanitization
  private def crispr = Seq(
    ("Pseudomonas aeruginosa strain-X", "Pseudomonas phage PA1", 100.0),
    ("Escherichia coli K12", "Phage T4!", 95.5)
  ).toDF("b", "p", "s")
  private def prophage = Seq(
    ("Pseudomonas aeruginosa strain-X", "Pseudomonas phage PA1", 824.0),
    ("Pseudomonas aeruginosa strain-X", "Pseudomonas phage PA1", 500.0), // dup pair → min
    ("Staphylococcus aureus TW20", "Mycobacterium phage SWU1", 333.0)
  ).toDF("b", "p", "s")
  private def blastx = Seq(
    ("Escherichia coli K12", "Phage T4!", 90.0),
    ("Escherichia coli K12", "Phage T4!", 100.0) // gene-level rows → mean
  ).toDF("b", "p", "s")
  private def pfam = Seq(("Staphylococcus aureus TW20", "Mycobacterium phage SWU1", 100.2))
    .toDF("b", "p", "s")
  // flipped (phage, bacteria, flag) per the validation-set layout
  private def interactions = Seq(
    ("Pseudomonas phage PA1", "Pseudomonas aeruginosa strain-X", 1.0),
    ("Phage T4!", "Escherichia coli K12", 0.0)
  ).toDF("p", "b", "s")

  private lazy val g =
    GraphBuild.fromEvidence(crispr, prophage, blastx, pfam, interactions)

  test("sanitizer matches the reference's canonical form") {
    val got = Seq("Pseudomonas phage PA1", "a b-c_d!e").toDF("n")
      .select(GraphBuild.sanitizeName(col("n"))).collect().map(_.getString(0))
    assert(got(0) == "Pseudomonas_phage_PA1")
    assert(got(1) == "a_b_c_d_e")
  }

  test("evidence merge upsert: one edge per pair, properties merged, missing→0") {
    val edges = g.edges.collect()
    assert(edges.length == 3) // three distinct (phage,bacteria) pairs
    val byPair = g.edges.join(g.nodes.select(col("id").as("src"), col("name").as("pname")), "src")
      .collect().map(r => r.getAs[String]("pname") -> r).toMap
    val pa1 = byPair("Pseudomonas_phage_PA1")
    assert(pa1.getAs[Double]("crispr") == 100.0)
    assert(pa1.getAs[Double]("blast") == 500.0)  // min of duplicate bit scores
    assert(pa1.getAs[Boolean]("interaction"))
    val t4 = byPair("Phage_T4_")
    assert(t4.getAs[Double]("blastx") == 95.0)   // mean of gene scores
    assert(t4.getAs[Double]("pfam") == 0.0)      // absent evidence → 0
    assert(!t4.getAs[Boolean]("interaction"))    // validated negative
  }

  test("node ids are deterministic and kinds are correct") {
    val nodes = g.nodes.collect()
    assert(nodes.length == 6)
    assert(g.nodes.filter(col("kind") === "Phage").count() == 3)
    // same name → same id under repartitioning
    val again = GraphBuild.fromEvidence(
      crispr.repartition(5), prophage, blastx, pfam, interactions)
    assert(again.nodes.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      nodes.map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("motif find compiles a 1-hop pattern with kind predicates") {
    val rows = g.find("(p:Phage)-[e:Infects]->(b:Bacterial_Host)")
      .select("p_name", "b_name", "e_interaction").collect()
    assert(rows.length == 3)
    assert(rows.count(_.getBoolean(2)) == 1)
  }

  test("motif find unifies shared vars across chains (co-infection)") {
    // two phages infecting the same bacterium — none in this fixture
    val co = g.find("(p1:Phage)-[e1:Infects]->(b); (p2:Phage)-[e2:Infects]->(b)")
      .where(col("p1_name") < col("p2_name"))
    assert(co.count() == 0)
    // add a second phage on the same host via evidence and recheck
    val crispr2 = crispr.union(Seq(
      ("Pseudomonas aeruginosa strain-X", "Phage T4!", 88.0)).toDF("b", "p", "s"))
    val g2 = GraphBuild.fromEvidence(crispr2, prophage, blastx, pfam, interactions)
    val co2 = g2.find("(p1:Phage)-[e1:Infects]->(b); (p2:Phage)-[e2:Infects]->(b)")
      .where(col("p1_name") < col("p2_name"))
      .select("p1_name", "p2_name", "b_name").collect()
    assert(co2.length == 1)
    assert(co2.head.getString(2) == "Pseudomonas_aeruginosa_strain_X")
  }

  test("motif rejects malformed patterns") {
    intercept[IllegalArgumentException] { g.find("(a)-[r]->") }
  }

  test("motif refuses disconnected chains (accidental cartesian) unless allowCross") {
    val err = intercept[IllegalArgumentException] {
      g.find("(p:Phage)-[e:Infects]->(b); (x)-[e2:Infects]->(y)")
    }
    // the error names the variables on each side of the missing link
    assert(err.getMessage.contains("disconnected motif chains"))
    assert(err.getMessage.contains("x") && err.getMessage.contains("y"))
    assert(err.getMessage.contains("allowCross"))
    // explicit opt-in compiles to the cartesian: 3 edges × 3 edges
    val n = g.find("(p:Phage)-[e:Infects]->(b); (x)-[e2:Infects]->(y)",
      allowCross = true).count()
    assert(n == 9)
  }

  test("degrees and simplify") {
    val deg = g.degrees.collect().map(r => r.getLong(0) -> r).toMap
    assert(deg.values.map(_.getAs[Long]("deg")).sum == 6) // 3 edges × 2 endpoints
    assert(g.simplifiedUndirected.count() == 3)
  }

  test("sampleGraph aggregates duplicate (sample,contig) abundance rows") {
    val ab = Seq(("contig_1", 5L, "SRR1"), ("contig-1", 4L, "SRR1"), ("c2", 7L, "SRR2"))
      .toDF("contig", "count", "sampleId") // contig_1 ≡ contig-1 after sanitize
    val (sampled, _) = GraphBuild.sampleGraph(ab, Seq(("SRR1", "p1")).toDF("sampleId", "patient"))
    val rows = sampled.collect().map(r => (r.getString(0), r.getLong(2)))
    assert(rows.toSet == Set(("SRR1", 9L), ("SRR2", 7L)))
  }
}
