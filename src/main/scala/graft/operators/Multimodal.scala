package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * as opaque `binary` columns plus a typed metadata struct, processed
  * partition-wise in batches (the JVM analog of `mapInPandas`: one
  * buffer of rows at a time, vectorizable inner loop, constant memory
  * per task).
  *
  * DECODE IS STUBBED: this container has no image/audio codecs, so
  * `decodeStub` derives deterministic pseudo-features from the raw
  * bytes (documented ???-equivalent). The Spark-side plumbing —
  * schema, batching, explode of frame samples, feature schema — is
  * real and tested; swapping `decodeStub` for a JNI/codec call is a
  * one-function change.
  *
  * Scale: all ops are narrow (mapPartitions, no shuffle); bytes stay
  * off the driver; per-batch allocation is bounded by `batchSize`.
  */
object Multimodal {

  final case class Media(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int, duration_ms: Int)

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      mean_byte: Double, byte_entropy: Double, features: Array[Float])

  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Adapter: derive a deterministic media table from the documents
    * fixture (text bytes as payload; metadata from doc stats). */
  def fromDocuments(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (col("n_chars") * 10).cast("int").as("duration_ms"))
      .as[Media]
  }

  /** STUB decode: deterministic 16-dim feature vector from the byte
    * histogram — stands in for a real image/audio decoder. */
  private[operators] def decodeStub(bytes: Array[Byte]): MediaFeatures = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { hist(bytes(i) & 0xFF) += 1; i += 1 }
    val n = math.max(1, bytes.length)
    var sum = 0.0; var ent = 0.0
    (0 until 256).foreach { b =>
      sum += b.toDouble * hist(b)
      val p = hist(b).toDouble / n
      if (p > 0) ent -= p * math.log(p)
    }
    val feats = new Array[Float](16)
    (0 until 256).foreach(b => feats(b % 16) += hist(b).toFloat / n)
    MediaFeatures(0L, "", bytes.length.toLong, sum / n, ent / math.log(2), feats)
  }

  /** Feature extraction, batched per partition (mapInPandas-shaped:
    * iterator of row-buffers, not row-at-a-time). */
  def extractFeatures(media: Dataset[Media], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          decodeStub(m.bytes).copy(media_id = m.media_id, kind = m.kind)
        }
      }
    }
  }

  /** Video frame sampling: fixed-size frame windows over the payload,
    * keep every `everyN`th frame (explode, narrow). */
  def sampleFrames(media: Dataset[Media], frameBytes: Int, everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.bytes.grouped(frameBytes).zipWithIndex.collect {
        case (frame, idx) if idx % everyN == 0 => Frame(m.media_id, idx, frame)
      }
    }
  }

  /** STUB resize: deterministic byte-decimation to `targetBytes` —
    * stands in for a real resampler, keeps the pipeline shape. */
  def resizeStub(media: Dataset[Media], targetBytes: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.bytes.length <= targetBytes) m
      else {
        val step = m.bytes.length.toDouble / targetBytes
        val out = Array.tabulate(targetBytes)(i => m.bytes((i * step).toInt))
        m.copy(bytes = out)
      }
    }
  }
}
