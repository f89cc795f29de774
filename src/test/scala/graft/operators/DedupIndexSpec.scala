package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for the persisted incremental dedup index: each regime must
  * reproduce the in-memory dispatcher's exact answer across builds,
  * appends and dictionary growth, and the probe must read ONLY the
  * index — never an earlier batch's documents. */
class DedupIndexSpec extends SparkSpec {

  /** Synthetic (doc_id, tok) batches: docs draw `len` tokens from a
    * vocabulary of `vocabSize`; near-dup structure comes from
    * overlapping draws at these sizes. */
  private def batch(seed: Int, ids: Range, vocabSize: Int, len: Int): DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    ids.flatMap { id =>
      (0 until len).map(_ => s"t${rng.nextInt(vocabSize)}").distinct
        .map(t => (id.toLong, t))
    }.toDF("doc_id", "tok")
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet

  private def newDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"dedup-idx-$tag").toString + "/idx"

  test("dense regime: build+append+probe == in-memory dispatcher") {
    val b1 = batch(1, 0 until 60, vocabSize = 40, len = 12)
    val b2 = batch(2, 100 until 140, vocabSize = 40, len = 12)
    val probeB = batch(3, 200 until 230, vocabSize = 40, len = 12)
    val dir = newDir("dense")
    assert(DedupIndex.build(b1, dir, minJaccard = 0.3) == "dense")
    DedupIndex.append(b2, dir)
    val got = pairsOf(DedupIndex.probe(probeB, dir, 0.3))
    val want = pairsOf(
      Dedup.jaccardPairsAcross(probeB, b1.unionByName(b2), 0.3))
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(got.nonEmpty, "vacuous law: no qualifying pairs at this size")
  }

  test("dense regime: appends that GROW the dictionary keep old masks exact") {
    // batch 2 introduces a disjoint token range → new dictionary ids;
    // batch-1 masks stay short and must pad, and a probe doc bridging
    // both vocabularies must score exactly
    import spark.implicits._
    val b1 = batch(10, 0 until 30, vocabSize = 30, len = 10)
    val b2 = batch(11, 100 until 130, vocabSize = 30, len = 10)
      .withColumn("tok", concat(lit("x"), col("tok")))
    val probeB = batch(12, 200 until 220, vocabSize = 30, len = 10)
      .unionByName(batch(13, 200 until 220, vocabSize = 30, len = 10)
        .withColumn("tok", concat(lit("x"), col("tok"))))
      .distinct()
    val dir = newDir("grow")
    assert(DedupIndex.build(b1, dir, minJaccard = 0.2) == "dense")
    DedupIndex.append(b2, dir)
    val got = pairsOf(DedupIndex.probe(probeB, dir, 0.2))
    val want = pairsOf(
      Dedup.jaccardPairsAcross(probeB, b1.unionByName(b2), 0.2))
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(got.nonEmpty)
  }

  test("sparse regime: build+append+probe == in-memory prefix path") {
    // vocabulary far past the dense cap forces the posting index
    val b1 = batch(20, 0 until 80, vocabSize = 20000, len = 30)
    val b2 = batch(21, 100 until 160, vocabSize = 20000, len = 30)
    // near-dups planted: probe docs copy an indexed doc's tokens with
    // a small perturbation (pure random draws at this vocab never meet
    // the threshold — the law would be vacuous)
    import spark.implicits._
    val donor = b1.where(col("doc_id") < 10)
    val planted = donor.withColumn("doc_id", col("doc_id") + 1000)
      .where(xxhash64(col("tok")) % 10 =!= 0) // drop ~10% of tokens
    val probeB = batch(22, 2000 until 2030, vocabSize = 20000, len = 30)
      .unionByName(planted)
    val dir = newDir("sparse")
    assert(DedupIndex.build(b1, dir, minJaccard = 0.5, bitmapMaxVocab = 256) == "sparse")
    DedupIndex.append(b2, dir)
    val got = pairsOf(DedupIndex.probe(probeB, dir, 0.5))
    val want = pairsOf(Dedup.jaccardPairsAcrossTokens(
      probeB, b1.unionByName(b2), 0.5))
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(got.nonEmpty, "vacuous law: planted near-dups did not qualify")
  }

  test("sparse regime: probing at a HIGHER threshold than build stays exact") {
    val b1 = batch(30, 0 until 50, vocabSize = 20000, len = 25)
    import spark.implicits._
    val planted = b1.where(col("doc_id") < 8)
      .withColumn("doc_id", col("doc_id") + 500)
      .where(xxhash64(col("tok")) % 20 =!= 0)
    val dir = newDir("thresh")
    assert(DedupIndex.build(b1, dir, minJaccard = 0.4, bitmapMaxVocab = 256) == "sparse")
    val got = pairsOf(DedupIndex.probe(planted, dir, 0.7))
    val want = pairsOf(Dedup.jaccardPairsAcrossTokens(planted, b1, 0.7))
    assert(got == want)
    assert(got.nonEmpty)
    // below-build thresholds are refused (indexed prefixes don't cover them)
    intercept[IllegalArgumentException] {
      DedupIndex.probe(planted, dir, 0.2)
    }
  }

  /** Every parquet location the plan scans, descending through the
    * AQE wrapper (the top-level executedPlan is AdaptiveSparkPlanExec,
    * whose inner plan is not part of the `children` traversal). */
  private def fileScans(plan: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
    val direct = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    val nested = plan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        fileScans(a.initialPlan)
    }.flatten
    direct ++ nested
  }

  test("probe plan reads ONLY the index — no earlier batch is re-scanned") {
    // batch 1 lives as its own parquet table (the \"documents\" of a
    // prior ingest); after indexing, the probe plan's file scans must
    // all point inside the index dir and never at batch-1's parquet
    val b1 = batch(40, 0 until 60, vocabSize = 40, len = 12)
    val b1Path = java.nio.file.Files.createTempDirectory("dedup-idx-b1").toString + "/docs"
    b1.write.parquet(b1Path)
    val b1FromDisk = spark.read.parquet(b1Path)
    val dir = newDir("audit")
    DedupIndex.build(b1FromDisk, dir, minJaccard = 0.3)
    val probeB = batch(41, 200 until 230, vocabSize = 40, len = 12)
    val scanned = fileScans(
      DedupIndex.probe(probeB, dir, 0.3).queryExecution.executedPlan)
    assert(scanned.nonEmpty, "expected file scans over the index")
    assert(scanned.forall(_.contains("/idx")),
      s"probe scans non-index files: ${scanned.filterNot(_.contains("/idx"))}")
    assert(!scanned.exists(_.contains(b1Path)),
      "probe re-scans batch-1 documents")
    // the same holds in the sparse regime
    val s1 = batch(42, 0 until 50, vocabSize = 20000, len = 25)
    val s1Path = java.nio.file.Files.createTempDirectory("dedup-idx-s1").toString + "/docs"
    s1.write.parquet(s1Path)
    val sDir = newDir("audit-sparse")
    assert(DedupIndex.build(spark.read.parquet(s1Path), sDir, 0.5, bitmapMaxVocab = 256) == "sparse")
    val sScanned = fileScans(
      DedupIndex.probe(batch(43, 300 until 320, 20000, 25), sDir, 0.5)
        .queryExecution.executedPlan)
    assert(sScanned.nonEmpty && !sScanned.exists(_.contains(s1Path)),
      s"sparse probe re-scans batch-1: $sScanned")
  }

  test("probeAndAppend: result excludes the batch itself; next probe sees it") {
    val b1 = batch(50, 0 until 40, vocabSize = 40, len = 12)
    val b2 = batch(51, 100 until 130, vocabSize = 40, len = 12)
    val dir = newDir("paa")
    DedupIndex.build(b1, dir, minJaccard = 0.3)
    val r2 = DedupIndex.probeAndAppend(b2, dir, 0.3)
    // no self-matches: every d2 is a batch-1 doc
    assert(r2.where(col("d2") >= 100).count() == 0,
      "probe saw its own batch after append")
    // a third batch now matches against batch 2 members too: seed 51
    // over 30 ids replays b2's token draws, so doc 200+i is
    // token-identical to b2's doc 100+i
    val b3 = batch(51, 200 until 230, vocabSize = 40, len = 12)
    val r3 = DedupIndex.probe(b3, dir, 0.3)
    assert(r3.where(col("d2") >= 100 && col("d2") < 200).count() > 0,
      "appended batch invisible to later probes")
  }
}
