package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The DSv2 FASTA provider must be value-identical to the RDD reader
  * on every split geometry — including adversarial splitBytes that
  * cut records mid-header, mid-sequence and exactly on boundaries —
  * and must prune columns at the scan. */
class FastaSourceSpec extends SparkSpec {

  private def writeFixture(): (String, Int) = {
    val rng = new scala.util.Random(7)
    val recs = (0 until 211).map { i =>
      val lines = (0 to rng.nextInt(4)).map(_ =>
        (0 until (1 + rng.nextInt(70))).map(_ => "ACGT" (rng.nextInt(4))).mkString)
      s">rec_$i sample=${i % 7}\n${lines.mkString("\n")}"
    }
    val dir = java.nio.file.Files.createTempDirectory("fasta-spec")
    val f = dir.resolve("t.fasta")
    java.nio.file.Files.write(f, (recs.mkString("\n") + "\n").getBytes)
    (f.toString, recs.length)
  }

  test("DSv2 reader == RDD reader across adversarial split sizes") {
    val (path, n) = writeFixture()
    val want = BioSources.fasta(spark, path)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(want.size == n)
    for (split <- Seq(64L, 997L, 4096L)) {
      val df = spark.read.format("graft-fasta")
        .option("splitBytes", split.toString).load(path)
      // if the option ever stops reaching the planner (e.g. a casing
      // regression), this fails loudly instead of testing one split
      assert(df.rdd.getNumPartitions > 1,
        s"splitBytes=$split produced a single partition — option ignored?")
      val got = df
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSet
      assert(got == want, s"splitBytes=$split: ${got.size} vs ${want.size}; " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
    // single-split geometry still agrees
    val one = spark.read.format("graft-fasta")
      .option("splitBytes", (1L << 20).toString).load(path)
    assert(one.rdd.getNumPartitions == 1)
    assert(one.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getLong(3))).toSet == want)
  }

  test("record starting exactly on a split boundary is not dropped") {
    // '>b' lands precisely at byte 64 — with splitBytes=64 the '\n' at
    // byte 63 is in split 0 and the '>' in split 1; the reader must
    // back off one byte so exactly one split claims record b
    val dir = java.nio.file.Files.createTempDirectory("fasta-bnd")
    val f = dir.resolve("b.fasta")
    val bytes = (">a\n" + "A" * 60 + "\n>b\nCC\n>c\nGG\n").getBytes
    assert(bytes(64) == '>' && bytes(63) == '\n')
    java.nio.file.Files.write(f, bytes)
    val got = spark.read.format("graft-fasta")
      .option("splitBytes", "64").load(f.toString)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(got.map(_._1) == Set("a", "b", "c"), got.mkString("; "))
    assert(got.contains(("b", "CC")) && got.contains(("c", "GG")))
  }

  test("non-ASCII UTF-8 headers decode identically to the RDD reader") {
    val dir = java.nio.file.Files.createTempDirectory("fasta-utf8")
    val f = dir.resolve("u.fasta")
    val text = ">α strain=φX174 ünïcode\nACGT\n>plain\nGG\n"
    java.nio.file.Files.write(f,
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val want = BioSources.fasta(spark, f.toString)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    val got = spark.read.format("graft-fasta").load(f.toString)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(got.exists(_._1 == "α"))
  }

  test("column pruning reaches the scan: seq is never materialized for id+length") {
    val (path, _) = writeFixture()
    val df = spark.read.format("graft-fasta").load(path).select("id", "length")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, "no BatchScanExec in plan")
    val cols = scans.head.scan.readSchema().fieldNames.toSet
    assert(cols == Set("id", "length"), s"scan reads $cols")
    // and the values still come out right
    val total = df.agg(sum("length")).head().getLong(0)
    val want = BioSources.fasta(spark, path).agg(sum("length")).head().getLong(0)
    assert(total == want)
  }

  test("DSv2 write path: read(write(df)) round-trips; overwrite truncates") {
    val (path, n) = writeFixture()
    val df = spark.read.format("graft-fasta").load(path)
    val out = java.nio.file.Files.createTempDirectory("fasta-w").toString + "/o"
    df.write.format("graft-fasta").mode("overwrite").save(out)
    val back = spark.read.format("graft-fasta").load(out)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    val want = df.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getLong(3))).toSet
    assert(back == want && back.size == n)
    // overwrite clears prior content (write a SUBSET, expect only it)
    df.limit(7).write.format("graft-fasta").mode("overwrite").save(out)
    assert(spark.read.format("graft-fasta").load(out).count() == 7)
    // no in-progress leftovers
    val leftovers = new java.io.File(out).listFiles()
      .filter(_.getName.contains("inprogress"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }

  test("short name registration and empty/degenerate records") {
    val dir = java.nio.file.Files.createTempDirectory("fasta-spec2")
    val f = dir.resolve("d.fasta")
    java.nio.file.Files.write(f,
      ">a desc here\nACGT\nAC\n>\n>b\n\n>c x\nGG\n".getBytes)
    val rows = spark.read.format("graft-fasta").load(f.toString)
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(3)))
    // a bare ">" record has no content at all and is dropped — the
    // same contract as the RDD reader's nonEmpty filter
    assert(rows.toSeq == Seq(("a", "ACGTAC", 6L),
      ("b", "", 0L), ("c", "GG", 2L)), rows.mkString("; "))
  }
}
