package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** runDedupIngestStream: the streaming composition over the persisted
  * DedupIndex must (1) equal the sequential batch probeAndAppend
  * pipeline pair-for-pair, (2) be exactly-once across a restart — a
  * re-run over the same checkpoint and index replays nothing: no new
  * quarantine rows, no duplicate index signatures, no extra markers —
  * and (3) pick up NEW files incrementally, probing them against
  * everything landed before without re-reading it. */
class StreamDedupIngestSpec extends SparkSpec {

  private def writeBatch(base: String, src: java.io.File, b: Int,
      tok: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = s"$base/tmp$b"
    tok.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(src, f"b$b%02d.parquet")
    java.nio.file.Files.move(part.toPath, dst.toPath)
    dst.setLastModified(1700000000000L + b * 60000L)
  }

  private def toks = {
    import spark.implicits._
    graft.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(array_distinct(
        graft.operators.TextOps.tokens(col("text")))).as("tok"))
  }

  test("stream == sequential batch probeAndAppend; restart replays nothing; appends stay incremental") {
    val base = java.nio.file.Files.createTempDirectory("graft-sdi").toString
    val src = new java.io.File(base, "src"); src.mkdirs()
    val tok = toks.cache()
    try {
      for (b <- 0 to 1)
        writeBatch(base, src, b, tok.where(pmod(col("doc_id"), lit(3)) === b))

      val idx = s"$base/idx"; val ckpt = s"$base/ckpt"
      def quarantine() = StreamOps.runDedupIngestStream(spark, src.toString,
        idx, ckpt, minJaccard = 0.5)
      def pairSet() = quarantine().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val afterTwo = pairSet()

      // parity: sequential batch pipeline over the same splits
      val idx2 = s"$base/idx2"
      graft.operators.DedupIndex.build(
        tok.where(pmod(col("doc_id"), lit(3)) === 0), idx2, 0.5)
      val wantTwo = graft.operators.DedupIndex.probeAndAppend(
          tok.where(pmod(col("doc_id"), lit(3)) === 1), idx2, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterTwo == wantTwo, "stream quarantine != batch pipeline")

      // exactly-once: a restart over the same checkpoint replays NOTHING
      def markerCount() = spark.read.parquet(s"$idx/ingested").count()
      def quarantineCount() = spark.read.parquet(s"$idx/quarantine").count()
      val (m1, q1) = (markerCount(), quarantineCount())
      val again = pairSet()
      assert(again == afterTwo && markerCount() == m1 && quarantineCount() == q1,
        "re-run over the same checkpoint mutated state — not exactly-once")

      // incremental pickup: a THIRD file lands; only it is processed,
      // probed against both earlier batches
      writeBatch(base, src, 2, tok.where(pmod(col("doc_id"), lit(3)) === 2))
      val afterThree = pairSet()
      assert(markerCount() == m1 + 1, "new file should add exactly one batch")
      val wantThree = graft.operators.DedupIndex.probeAndAppend(
          tok.where(pmod(col("doc_id"), lit(3)) === 2), idx2, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterThree == afterTwo ++ wantThree,
        "incremental batch's quarantine != batch-pipeline probe")
      assert(afterThree.nonEmpty, "vacuous: no near-duplicates at all")
    } finally tok.unpersist()
  }

  /** The non-atomic-effects hazard (round-9 ADVICE): a crash AFTER the
    * index append and quarantine write but BEFORE the marker used to
    * replay the whole batch on restart, duplicating index signatures
    * and quarantine rows. The undo log must roll the partial attempt
    * back so the replayed run converges to the exact uninterrupted
    * state — same quarantine pairs, same index table row counts as a
    * never-crashed sequential pipeline. */
  test("mid-batch crash (index + quarantine appended, no marker) rolls back and replays clean") {
    val base = java.nio.file.Files.createTempDirectory("graft-sdi2").toString
    val src = new java.io.File(base, "src"); src.mkdirs()
    val tok = toks.cache()
    try {
      for (b <- 0 to 1)
        writeBatch(base, src, b, tok.where(pmod(col("doc_id"), lit(3)) === b))
      val idx = s"$base/idx"; val ckpt = s"$base/ckpt"
      def pairSet() = StreamOps.runDedupIngestStream(spark, src.toString,
          idx, ckpt, minJaccard = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairSet() // batches 0 and 1 complete cleanly

      // simulate the crashed attempt of batch 2: undo log written,
      // BOTH effect writes land (index absorbs the batch's signatures,
      // quarantine absorbs its pairs), marker never written
      val tok2 = tok.where(pmod(col("doc_id"), lit(3)) === 2)
      StreamOps.beginIngestBatch(spark, idx, 2L)
      graft.operators.DedupIndex.probeAndAppend(tok2, idx, 0.5)
        .write.mode("append").parquet(s"$idx/quarantine")
      // ... crash: restart the stream with the batch-2 file landed
      writeBatch(base, src, 2, tok2)
      val after = pairSet()

      // clean twin: the same three batches, never interrupted
      val idx2 = s"$base/idx2"
      graft.operators.DedupIndex.build(
        tok.where(pmod(col("doc_id"), lit(3)) === 0), idx2, 0.5)
      val want = (1 to 2).flatMap { b =>
        graft.operators.DedupIndex.probeAndAppend(
            tok.where(pmod(col("doc_id"), lit(3)) === b), idx2, 0.5)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      }.toSet
      assert(after == want,
        "replay after mid-batch crash diverged from the uninterrupted pipeline")
      assert(spark.read.parquet(s"$idx/quarantine").count() == want.size,
        "quarantine double-counted the crashed attempt's pairs")
      assert(spark.read.parquet(s"$idx/ingested").count() == 3)
      // no duplicate signatures: every index table matches the clean
      // twin row-for-row (regime-agnostic — compare whatever exists)
      for (t <- Seq("dict", "masks", "dfreq", "postings", "docs")
           if new java.io.File(s"$idx2/$t").exists) {
        assert(spark.read.parquet(s"$idx/$t").count() ==
          spark.read.parquet(s"$idx2/$t").count(),
          s"index table $t row count diverged — duplicated signatures")
      }
      assert(after.nonEmpty, "vacuous: no near-duplicates at all")
    } finally tok.unpersist()
  }
}
