package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** runAnnIngestStream: the streaming composition over the persisted
  * [[graft.operators.AnnIndex]] must (1) build an index BIT-IDENTICAL
  * to the batch build + append pipeline over the same splits (probe
  * answers AND code-table content), (2) replay nothing across a
  * restart — no duplicate codes, no extra markers, (3) pick up new
  * files incrementally under the frozen model, and (4) roll back a
  * crash-mid-batch attempt (codes appended, no marker) so the replay
  * converges to the uninterrupted state — the round-10 verdict's
  * streaming-ANN ask, with the same undo-log bracket q260 pinned for
  * the dedup index. */
class StreamAnnIngestSpec extends SparkSpec {

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

  private def codesSet(dir: String): Set[(Long, Seq[Int], Int)] =
    spark.read.parquet(s"$dir/codes").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2))).toSet

  private def probeSet(q: org.apache.spark.sql.DataFrame,
      dir: String): Set[(Long, Long, Long, Long)] =
    graft.operators.AnnIndex.probe(q, "vec_id", "embedding", dir,
        nProbe = 4, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

  test("stream-built index == batch build+append; restart replays nothing; incremental append; crash rolls back") {
    val emb = graft.Tables.embeddings(spark, sf).cache()
    try {
      val base = java.nio.file.Files.createTempDirectory("graft-sai").toString
      val src = new java.io.File(base, "src"); src.mkdirs()
      val m3 = pmod(col("vec_id"), lit(3))
      def split(b: Int) = emb.where(m3 === b)
      for (b <- 0 to 1) writeBatch(base, src, b, split(b))

      val idx = s"$base/idx"; val ckpt = s"$base/ckpt"
      def ingest() = StreamOps.runAnnIngestStream(spark, src.toString,
        idx, ckpt, "vec_id", "embedding", nCentroids = 8, m = 8, k = 16)
      ingest()

      // parity: batch pipeline over the same splits — code table AND
      // probe answers bit-identical (training deterministic in batch-0
      // content; appends encode under the frozen model)
      val twin = s"$base/twin"
      graft.operators.AnnIndex.build(split(0), "vec_id", "embedding",
        twin, nCentroids = 8, m = 8, k = 16)
      graft.operators.AnnIndex.append(split(1), "vec_id", "embedding", twin)
      val q = emb.where(col("vec_id") < 10)
      assert(codesSet(idx) == codesSet(twin),
        "stream-built code table != batch build+append")
      assert(probeSet(q, idx) == probeSet(q, twin) && probeSet(q, idx).nonEmpty,
        "stream-built probe answers != batch twin")

      // exactly-once: restart over the same checkpoint replays nothing
      val nCodes = spark.read.parquet(s"$idx/codes").count()
      ingest()
      assert(spark.read.parquet(s"$idx/codes").count() == nCodes,
        "restart duplicated code rows — not exactly-once")
      assert(spark.read.parquet(s"$idx/ingested").count() == 2)

      // incremental: a third file lands; only it is appended
      writeBatch(base, src, 2, split(2))
      ingest()
      graft.operators.AnnIndex.append(split(2), "vec_id", "embedding", twin)
      assert(codesSet(idx) == codesSet(twin),
        "incremental stream append != batch append")
      assert(spark.read.parquet(s"$idx/ingested").count() == 3)

      // crash-mid-batch: simulate an attempt of batch 3 that wrote its
      // undo log and appended its codes but never reached the marker —
      // the replay must roll the partial attempt back first
      val b3 = emb.where(col("vec_id") < 30 && m3 === 0)
        .withColumn("vec_id", col("vec_id") + 500000L)
      StreamOps.beginIngestBatch(spark, idx, 3L)
      graft.operators.AnnIndex.append(b3, "vec_id", "embedding", idx)
      // ... crash; the file lands and the stream restarts
      writeBatch(base, src, 3, b3)
      ingest()
      graft.operators.AnnIndex.append(b3, "vec_id", "embedding", twin)
      assert(codesSet(idx) == codesSet(twin),
        "replay after mid-batch crash diverged from the uninterrupted twin")
      assert(spark.read.parquet(s"$idx/ingested").count() == 4)
    } finally emb.unpersist()
  }
}
