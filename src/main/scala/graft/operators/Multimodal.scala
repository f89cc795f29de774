package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * as opaque `binary` columns plus a typed metadata struct, processed
  * partition-wise in batches (the JVM analog of `mapInPandas`: one
  * buffer of rows at a time, vectorizable inner loop, constant memory
  * per task).
  *
  * IMAGE DECODE IS REAL: `decodeImage` uses `javax.imageio` (in the
  * JDK — no external codec needed) and emits true width/height/
  * channel-count plus pixel-derived features. Audio/video decode
  * remains stubbed (`decodeStub`, a deterministic byte-histogram
  * featurizer — this container has no audio/video codecs); swapping
  * it for a codec call is a one-function change. The Spark-side
  * plumbing — schema, batching, explode of frame samples, feature
  * schema — is real and tested for all three kinds.
  *
  * Scale: all ops are narrow (mapPartitions, no shuffle); bytes stay
  * off the driver; per-batch allocation is bounded by `batchSize`.
  */
object Multimodal {

  final case class Media(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int, duration_ms: Int)

  /** decoded_* are the values read back out of the payload by the real
    * decoder: -1 when the payload isn't decodable (audio/video stub
    * path, or corrupt image bytes). */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      mean_byte: Double, byte_entropy: Double,
      decoded_width: Int, decoded_height: Int, n_channels: Int,
      features: Array[Float])

  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Adapter: derive a deterministic media table from the documents
    * fixture. Image-kind rows carry a REAL PNG payload (generated
    * pixel-deterministically from the id + declared dimensions, so the
    * decode path is exercised end-to-end without external fixtures);
    * audio/video rows carry the text bytes as an opaque payload. */
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
      .map(m => if (m.kind == "image") m.copy(bytes = syntheticPng(m)) else m)
  }

  /** Deterministic RGB PNG: pixel (x,y) is pure arithmetic on
    * (media_id, x, y). javax.imageio's PNG writer is in-JDK and
    * headless-safe. */
  private[operators] def syntheticPng(m: Media): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      m.width, m.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < m.height) {
      var x = 0
      while (x < m.width) {
        val r = ((m.media_id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((m.media_id * 17 + x * 3 + y * 5) % 256).toInt
        val b = ((x * y + m.media_id) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL image decode via javax.imageio: true dimensions + channel
    * count, features = [meanR, meanG, meanB, meanA] ++ 12-bin
    * luminance histogram (fractions). None when the bytes are not a
    * decodable image. */
  private[operators] def decodeImage(bytes: Array[Byte]): Option[MediaFeatures] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }
    img.map { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      val nCh = im.getColorModel.getNumComponents
      val chSum = new Array[Double](4)
      val lumHist = new Array[Long](12)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val argb = im.getRGB(x, y)
          val a = (argb >>> 24) & 0xFF
          val r = (argb >>> 16) & 0xFF
          val g = (argb >>> 8) & 0xFF
          val b = argb & 0xFF
          chSum(0) += r; chSum(1) += g; chSum(2) += b; chSum(3) += a
          val lum = (r * 299 + g * 587 + b * 114) / 1000
          lumHist(math.min(11, lum * 12 / 256)) += 1
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      val feats = new Array[Float](16)
      (0 until 4).foreach(c => feats(c) = (chSum(c) / n / 255.0).toFloat)
      (0 until 12).foreach(i => feats(4 + i) = (lumHist(i) / n).toFloat)
      MediaFeatures(0L, "", bytes.length.toLong,
        mean_byte = chSum.take(3).sum / (3 * n),
        byte_entropy = shannonEntropy(bytes),
        decoded_width = w, decoded_height = h, n_channels = nCh,
        features = feats)
    }
  }

  private def shannonEntropy(bytes: Array[Byte]): Double = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { hist(bytes(i) & 0xFF) += 1; i += 1 }
    val n = math.max(1, bytes.length)
    var ent = 0.0
    (0 until 256).foreach { b =>
      val p = hist(b).toDouble / n
      if (p > 0) ent -= p * math.log(p)
    }
    ent / math.log(2)
  }

  /** STUB decode for audio/video: deterministic 16-dim feature vector
    * from the byte histogram — stands in for a real codec. */
  private[operators] def decodeStub(bytes: Array[Byte]): MediaFeatures = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { hist(bytes(i) & 0xFF) += 1; i += 1 }
    val n = math.max(1, bytes.length)
    var sum = 0.0
    (0 until 256).foreach(b => sum += b.toDouble * hist(b))
    val feats = new Array[Float](16)
    (0 until 256).foreach(b => feats(b % 16) += hist(b).toFloat / n)
    MediaFeatures(0L, "", bytes.length.toLong, sum / n, shannonEntropy(bytes),
      decoded_width = -1, decoded_height = -1, n_channels = -1, feats)
  }

  /** Feature extraction, batched per partition (mapInPandas-shaped:
    * iterator of row-buffers, not row-at-a-time). Image rows go
    * through the real javax.imageio decoder (falling back to the byte
    * featurizer for undecodable payloads); audio/video use the stub. */
  def extractFeatures(media: Dataset[Media], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val f =
            if (m.kind == "image") decodeImage(m.bytes).getOrElse(decodeStub(m.bytes))
            else decodeStub(m.bytes)
          f.copy(media_id = m.media_id, kind = m.kind)
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
