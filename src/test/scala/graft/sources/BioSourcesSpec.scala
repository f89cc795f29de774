package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class BioSourcesSpec extends SparkSpec {

  private def tmp(name: String, content: String): String = {
    val dir = Files.createTempDirectory("biosrc")
    val f = dir.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  test("fasta: unblocked and block-wrapped records, ids, lengths") {
    val p = tmp("a.fna",
      """>contig-1 flag=0 len=8
        |ACGTACGT
        |>contig-2
        |ACGT
        |ACGTAC
        |""".stripMargin)
    val rows = BioSources.fasta(spark, p).collect()
      .map(r => r.getString(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(rows("contig-1") == ("ACGTACGT", 8L))
    assert(rows("contig-2") == ("ACGTACGTAC", 10L)) // block format joined
    val desc = BioSources.fasta(spark, p).collect()
      .find(_.getString(0) == "contig-1").get.getString(1)
    assert(desc == "contig-1 flag=0 len=8") // full header preserved
  }

  test("fastq: 4-line records parsed; pair intersection keeps common ids") {
    val r1 = tmp("r1.fq",
      """@read1/1
        |ACGT
        |+
        |IIII
        |@read2/1
        |GGGG
        |+
        |JJJJ
        |""".stripMargin)
    val r2 = tmp("r2.fq",
      """@read2/2
        |CCCC
        |+
        |KKKK
        |""".stripMargin)
    val f1 = BioSources.fastq(spark, r1)
    assert(f1.count() == 2)
    assert(f1.collect().map(_.getString(0)).toSet == Set("read1/1", "read2/1"))
    val paired = BioSources.pairedReads(spark, r1, r2).collect()
    assert(paired.length == 1) // only read2 present in both files
    assert(paired.head.getString(0) == "read2")
  }

  test("sam: header skipped, abundance counts col3, '*' dropped") {
    val p = tmp("x.sam",
      """@HD	VN:1.0
        |@SQ	SN:contig1	LN:1000
        |r1	0	contig1	10	60	4M	*	0	0	ACGT	IIII
        |r2	0	contig1	20	60	4M	*	0	0	ACGT	IIII
        |r3	4	*	0	0	*	*	0	0	ACGT	IIII
        |r4	0	contig2	5	60	4M	*	0	0	ACGT	IIII
        |""".stripMargin)
    val ab = BioSources.samAbundance(spark, p).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ab == Map("contig1" -> 2L, "contig2" -> 1L))
  }

  test("genbank: phage records yield (accession, organism, host)") {
    val p = tmp("g.gbk",
      """LOCUS       NC_001416 48502 bp
        |  ORGANISM  Enterobacteria phage lambda
        |FEATURES
        |     source   1..48502
        |                     /host="Escherichia coli"
        |//
        |LOCUS       NC_000913 4641652 bp
        |  ORGANISM  Escherichia coli K-12
        |     source   1..4641652
        |                     /host="irrelevant"
        |//
        |""".stripMargin)
    val rows = BioSources.genbankPhageHosts(spark, p).collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "NC_001416")
    assert(rows.head.getString(2) == "Escherichia coli")
  }

  test("pilercr: spacers extracted per array with length filter") {
    val p = tmp("r.txt",
      """Array 1
        |=====
        |  100  32  ACGTACGTACGTACGTACGTACGTA
        |  200  32  TTTTACGTACGTACGTACGTACGTT
        |=====
        |SUMMARY
        |""".stripMargin)
    val sp = BioSources.pilerCrSpacers(spark, p)
    assert(sp.count() == 2)
    assert(BioSources.lengthFilter(sp, "spacer", 20, 65).count() == 2)
    assert(BioSources.lengthFilter(sp, "spacer", 30, 65).count() == 0)
  }
}
