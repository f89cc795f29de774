package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** runAnnProbeStream (gate q281): streaming serving against the
  * persisted cosine index must (1) answer every query batch exactly
  * as the one-shot batch probe does, (2) replay nothing across a
  * restart with the same checkpoint (the out dirs stay byte-stable),
  * and (3) pick up NEW query files incrementally while earlier
  * answers are untouched — the stateless-sink exactly-once story
  * (per-batch deterministic overwrite, no undo log needed because a
  * probe never writes the index). */
class StreamAnnProbeSpec extends SparkSpec {

  private def writeBatch(base: String, src: java.io.File, b: Int,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = s"$base/tmp$b"
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(src, f"b$b%02d.parquet")
    java.nio.file.Files.move(part.toPath, dst.toPath)
    dst.setLastModified(1700000000000L + b * 60000L)
  }

  private def answers(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("query_id", "rank", "neighbor_id", "l2_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("stream probe == batch probe; restart replays nothing; new query files serve incrementally") {
    val emb = graft.Tables.embeddings(spark, sf).cache()
    try {
      val base = java.nio.file.Files.createTempDirectory("graft-sap").toString
      val src = new java.io.File(base, "src"); src.mkdirs()
      val idx = s"$base/idx"
      graft.operators.AnnIndex.buildCosine(emb, "vec_id", "embedding", idx,
        nCentroids = 8, m = 8, k = 16)
      writeBatch(base, src, 0, emb.where(col("vec_id") < 4))
      writeBatch(base, src, 1, emb.where(col("vec_id") >= 4 && col("vec_id") < 8))

      val ckpt = s"$base/ckpt"; val out = s"$base/out"
      def serve() = StreamOps.runAnnProbeStream(spark, src.toString, emb,
        idx, ckpt, out, "vec_id", "embedding", nProbe = 8, k = 3,
        shortlist = 50)
      val streamed = answers(serve())

      // parity with the one-shot batch probe over the union of queries
      val batchTwin = answers(graft.operators.AnnIndex.probeCosineReranked(
        emb.where(col("vec_id") < 8), emb, "vec_id", "embedding", idx,
        nProbe = 8, k = 3, shortlist = 50))
      assert(streamed == batchTwin)

      // restart with the same checkpoint: nothing replays, the
      // per-batch output dirs are byte-stable
      def outSig(): Seq[(String, Long)] = {
        val d = new java.io.File(out)
        d.listFiles().filter(_.isDirectory).sorted.flatMap(b =>
          b.listFiles().filter(_.getName.endsWith(".parquet")).sorted
            .map(f => (b.getName + "/" + f.getName, f.length()))).toSeq
      }
      val sig0 = outSig()
      assert(answers(serve()) == streamed)
      assert(outSig() == sig0, "a restart with no new input must not rewrite answers")

      // a THIRD query file arrives: only it is processed; earlier
      // batch dirs remain byte-identical
      writeBatch(base, src, 2, emb.where(col("vec_id") >= 8 && col("vec_id") < 10))
      val grown = answers(serve())
      assert(outSig().take(sig0.size) == sig0,
        "existing answer dirs must be untouched by an incremental batch")
      val fullTwin = answers(graft.operators.AnnIndex.probeCosineReranked(
        emb.where(col("vec_id") < 10), emb, "vec_id", "embedding", idx,
        nProbe = 8, k = 3, shortlist = 50))
      assert(grown == fullTwin)
    } finally emb.unpersist()
  }
}
