package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * as opaque `binary` columns plus a typed metadata struct, processed
  * partition-wise in batches (the JVM analog of `mapInPandas`: one
  * buffer of rows at a time, vectorizable inner loop, constant memory
  * per task).
  *
  * ALL THREE DECODE PATHS ARE REAL: `decodeImage` uses `javax.imageio`,
  * `decodeAudio` uses `javax.sound.sampled`, and `decodeVideo` reads
  * multi-frame streams — animated GIF AND multi-page TIFF — through
  * `javax.imageio`'s sequence reader (all in the JDK — no external
  * codec needed), emitting true dimensions / sample-rate / frame
  * counts / channel counts plus payload-derived features. The decoder
  * is keyed purely on `ImageIO.getImageReaders`, which is how both
  * containers ride one code path and how an MP4 `ImageReader` plugin
  * would slot in unchanged; undecodable payloads fall back to
  * `decodeStub`, a deterministic byte-histogram featurizer.
  *
  * Scale: all ops are narrow (mapPartitions, no shuffle); bytes stay
  * off the driver; per-batch allocation is bounded by `batchSize`.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache: every encode/decode
  // creates and deletes a temp file, which serializes the 32-thread
  // codec path behind the filesystem. Memory-cached streams are pure
  // CPU. Runs once per JVM (driver and each executor) on first use.
  javax.imageio.ImageIO.setUseCache(false)

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
    * fixture. Image-kind rows carry a REAL PNG payload, audio-kind
    * rows a REAL RIFF/WAVE payload, and video-kind rows a REAL
    * multi-frame animated GIF (all generated deterministically from
    * the id, so every decode path is exercised end-to-end without
    * external fixtures). */
  def fromDocuments(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    // the fixture corpus is one small parquet file = one input split;
    // spread the (CPU-bound) codec work across the executor cores the
    // way a real multi-file media lake would arrive already split
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (col("n_chars") * 10).cast("int").as("duration_ms"))
      .as[Media]
      .map { m =>
        m.kind match {
          case "image" => m.copy(bytes = syntheticPng(m))
          case "audio" => m.copy(bytes = syntheticWav(m))
          // video alternates CONTAINERS (animated GIF / multi-page
          // TIFF) over the same frames: the decoder must route both
          // through the one ImageIO seam with no per-format code
          case _ if m.media_id % 2 == 0 => m.copy(bytes = syntheticGif(m))
          case _ => m.copy(bytes = syntheticTiff(m))
        }
      }
  }

  /** Frame count of the synthetic video for `media_id` (pure). */
  private[operators] def syntheticGifFrames(mediaId: Long): Int =
    3 + (mediaId % 4).toInt

  /** Frame f of the synthetic video: pixel (x,y) is pure arithmetic on
    * (media_id, f, x, y) — identical regardless of which container it
    * is packed into. */
  private def syntheticFrame(m: Media, f: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      m.width, m.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](m.width * m.height)
    var y = 0
    while (y < m.height) {
      var x = 0
      while (x < m.width) {
        val r = ((m.media_id * 31 + f * 41 + x * 7 + y * 13) % 256).toInt
        val g = ((m.media_id * 17 + f * 29 + x * 3 + y * 5) % 256).toInt
        val b = ((x * y + m.media_id + f * 11) % 256).toInt
        px(y * m.width + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, m.width, m.height, px, 0, m.width)
    img
  }

  /** Multi-frame container write through the generic `ImageIO` sequence
    * seam — `formatName` picks the registered writer ("gif", "tiff", or
    * any plugin a production cluster registers); the frames and the
    * write path are identical for every container. */
  private def syntheticSequence(m: Media, formatName: String): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO}
    val nFrames = syntheticGifFrames(m.media_id)
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName(formatName).next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      writer.writeToSequence(new IIOImage(syntheticFrame(m, f), null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  /** Deterministic multi-frame animated GIF (genuine animated
    * container; the sequence reader sees N images). */
  private[operators] def syntheticGif(m: Media): Array[Byte] =
    syntheticSequence(m, "gif")

  /** Deterministic multi-page TIFF — the SECOND in-JDK multi-image
    * container, same frames, same write seam: proof that the decode
    * path is container-agnostic (a production MP4 ImageReader plugin
    * would slot in the same way). */
  private[operators] def syntheticTiff(m: Media): Array[Byte] =
    syntheticSequence(m, "tiff")

  /** Container sniff from magic bytes — the format-routing step of a
    * media lake (decoders are picked per payload, not per column
    * type). */
  def containerOf(bytes: Array[Byte]): String =
    if (bytes.length < 4) "unknown"
    else if ((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N') "png"
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') "gif"
    else if (bytes(0) == 'I' && bytes(1) == 'I' && (bytes(2) & 0xFF) == 0x2A) "tiff"
    else if (bytes(0) == 'M' && bytes(1) == 'M' && (bytes(3) & 0xFF) == 0x2A) "tiff"
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') "wav"
    else "unknown"

  /** Deterministic RGB PNG: pixel (x,y) is pure arithmetic on
    * (media_id, x, y). javax.imageio's PNG writer is in-JDK and
    * headless-safe. */
  private[operators] def syntheticPng(m: Media): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      m.width, m.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](m.width * m.height)
    var y = 0
    while (y < m.height) {
      var x = 0
      while (x < m.width) {
        val r = ((m.media_id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((m.media_id * 17 + x * 3 + y * 5) % 256).toInt
        val b = ((x * y + m.media_id) % 256).toInt
        px(y * m.width + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, m.width, m.height, px, 0, m.width)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic 16-bit PCM mono WAV: sample i is pure arithmetic on
    * (media_id, i). javax.sound.sampled's RIFF/WAVE writer is in-JDK. */
  private[operators] def syntheticWav(m: Media): Array[Byte] = {
    import javax.sound.sampled._
    val nSamples = 320 + (m.media_id % 640).toInt
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (((m.media_id * 31 + i.toLong * 7919) % 65536L) - 32768L).toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(m.sample_rate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL audio decode via javax.sound.sampled: for WAV/AIFF/AU
    * payloads emits the container's true sample rate (as
    * `decoded_width`), frame count (as `decoded_height`) and channel
    * count, features = mean |amplitude| ++ 15-window RMS profile
    * (normalized to [0,1]). None when the bytes are not a decodable
    * audio stream. */
  private[operators] def decodeAudio(bytes: Array[Byte]): Option[MediaFeatures] = {
    import javax.sound.sampled._
    val ais =
      try Some(AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes)))
      catch {
        case _: UnsupportedAudioFileException | _: java.io.IOException => None
      }
    ais.map { in =>
      val fmt = in.getFormat
      val pcm = in.readAllBytes()
      val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
      val nSamples = pcm.length / bytesPerSample
      val amp = new Array[Double](math.max(1, nSamples))
      var i = 0
      while (i < nSamples) {
        val v =
          if (bytesPerSample == 2) {
            val lo = pcm(2 * i) & 0xFF
            val hi = pcm(2 * i + 1)
            ((hi << 8) | lo).toShort.toDouble / 32768.0
          } else (pcm(i) & 0xFF).toDouble / 255.0
        amp(i) = v
        i += 1
      }
      val feats = new Array[Float](16)
      feats(0) = (amp.map(math.abs).sum / amp.length).toFloat
      val win = math.max(1, amp.length / 15)
      (0 until 15).foreach { w =>
        val slice = amp.slice(w * win, math.min(amp.length, (w + 1) * win))
        if (slice.nonEmpty)
          feats(1 + w) = math.sqrt(slice.map(x => x * x).sum / slice.length).toFloat
      }
      val frames =
        if (in.getFrameLength >= 0) in.getFrameLength.toInt
        else nSamples / math.max(1, fmt.getChannels)
      MediaFeatures(0L, "", bytes.length.toLong,
        mean_byte = feats(0).toDouble, byte_entropy = shannonEntropy(bytes),
        decoded_width = fmt.getSampleRate.toInt, decoded_height = frames,
        n_channels = fmt.getChannels, features = feats)
    }
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
      // one bulk ARGB fetch: per-pixel getRGB pays a color-model
      // conversion call per pixel and dominated the decode profile
      val px = im.getRGB(0, 0, w, h, null, 0, w)
      var i = 0
      while (i < px.length) {
        val argb = px(i)
        val a = (argb >>> 24) & 0xFF
        val r = (argb >>> 16) & 0xFF
        val g = (argb >>> 8) & 0xFF
        val b = argb & 0xFF
        chSum(0) += r; chSum(1) += g; chSum(2) += b; chSum(3) += a
        val lum = (r * 299 + g * 587 + b * 114) / 1000
        lumHist(math.min(11, lum * 12 / 256)) += 1
        i += 1
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

  /** REAL video decode via javax.imageio's multi-frame sequence reader
    * (GIF in this container; any registered `ImageReader` with
    * `getNumImages > 1` works the same way): true frame dimensions
    * (decoded_width/height), frame count (features(0)), color channel
    * count, features(1..15) = per-frame mean luminance in [0,1] for up
    * to 15 sampled frames. None when the bytes are not a decodable
    * multi-frame stream. */
  private[operators] def decodeVideo(bytes: Array[Byte]): Option[MediaFeatures] = {
    import javax.imageio.ImageIO
    val iis = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    val readers = ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); return None }
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      if (n < 1) return None
      val first = reader.read(0)
      val feats = new Array[Float](16)
      feats(0) = n.toFloat
      // sample up to 15 frames evenly across the stream
      val take = math.min(15, n)
      (0 until take).foreach { i =>
        val idx = if (take == 1) 0 else i * (n - 1) / (take - 1)
        val im = reader.read(idx)
        val px = im.getRGB(0, 0, im.getWidth, im.getHeight, null, 0, im.getWidth)
        var lum = 0.0
        var j = 0
        while (j < px.length) {
          val argb = px(j)
          lum += (((argb >>> 16) & 0xFF) * 299 + ((argb >>> 8) & 0xFF) * 587 +
            (argb & 0xFF) * 114) / 1000.0
          j += 1
        }
        feats(1 + i) = (lum / (im.getWidth.toLong * im.getHeight) / 255.0).toFloat
      }
      Some(MediaFeatures(0L, "", bytes.length.toLong,
        mean_byte = feats.slice(1, 1 + take).map(_.toDouble).sum / take,
        byte_entropy = shannonEntropy(bytes),
        decoded_width = first.getWidth, decoded_height = first.getHeight,
        n_channels = first.getColorModel.getNumComponents, features = feats))
    } catch {
      case _: java.io.IOException | _: IndexOutOfBoundsException => None
    } finally {
      reader.dispose()
      iis.close()
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

  /** Fallback decode for undecodable payloads: deterministic 16-dim
    * feature vector from the byte histogram. */
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
    * through the real javax.imageio decoder, audio rows through the
    * real javax.sound.sampled decoder, and video rows through the real
    * multi-frame sequence decoder — each falling back to the byte
    * featurizer for undecodable payloads. */
  def extractFeatures(media: Dataset[Media], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val f = m.kind match {
            case "image" => decodeImage(m.bytes).getOrElse(decodeStub(m.bytes))
            case "audio" => decodeAudio(m.bytes).getOrElse(decodeStub(m.bytes))
            case "video" => decodeVideo(m.bytes).getOrElse(decodeStub(m.bytes))
            case _ => decodeStub(m.bytes)
          }
          f.copy(media_id = m.media_id, kind = m.kind)
        }
      }
    }
  }

  /** Raw frame sampling: fixed-size byte windows over the payload,
    * keep every `everyN`th window (explode, narrow). The codec-free
    * path for opaque container formats. */
  def sampleFrames(media: Dataset[Media], frameBytes: Int, everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.bytes.grouped(frameBytes).zipWithIndex.collect {
        case (frame, idx) if idx % everyN == 0 => Frame(m.media_id, idx, frame)
      }
    }
  }

  /** REAL frame sampling: decode the video stream, keep every
    * `everyN`th decoded frame re-encoded as PNG bytes. Narrow
    * (mapPartitions-shaped flatMap, no shuffle); rows whose payload is
    * not a decodable multi-frame stream are dropped. */
  def sampleDecodedFrames(media: Dataset[Media], everyN: Int): Dataset[Frame] = {
    import javax.imageio.ImageIO
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val iis = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(m.bytes))
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); Seq.empty[Frame] }
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          (0 until n by math.max(1, everyN)).map { idx =>
            val out = new java.io.ByteArrayOutputStream()
            ImageIO.write(reader.read(idx), "png", out)
            Frame(m.media_id, idx, out.toByteArray)
          }
        } catch {
          case _: java.io.IOException => Seq.empty[Frame]
        } finally {
          reader.dispose()
          iis.close()
        }
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

  /** 64-bit average-hash (aHash) of an encoded image: decode, bucket
    * pixels into an 8×8 luminance grid (integer sums, integer
    * division — no floats, so the hash is platform-deterministic),
    * bit = cell above the global cell mean. The perceptual-dedup
    * primitive for image lakes: byte-level dedup misses re-encoded /
    * resized copies, aHash survives them. None for undecodable
    * payloads. */
  def aHash64(bytes: Array[Byte]): Option[Long] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }
    img.filter(im => im.getWidth > 0 && im.getHeight > 0).map { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      val px = im.getRGB(0, 0, w, h, null, 0, w)
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var y = 0
      while (y < h) {
        val cy = y * 8 / h
        var x = 0
        while (x < w) {
          val argb = px(y * w + x)
          val lum = (((argb >>> 16) & 0xFF) * 299 + ((argb >>> 8) & 0xFF) * 587 +
            (argb & 0xFF) * 114) / 1000
          val c = cy * 8 + x * 8 / w
          sums(c) += lum; cnts(c) += 1
          x += 1
        }
        y += 1
      }
      val cells = Array.tabulate(64)(i => if (cnts(i) == 0) 0L else sums(i) / cnts(i))
      val mean = cells.sum / 64
      cells.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
        if (v > mean) acc | (1L << i) else acc
      }
    }
  }

  /** (media_id, ahash) for every decodable image in the lake. */
  def imageAHashes(media: Dataset[Media]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image")
      .flatMap(m => aHash64(m.bytes).map(h => (m.media_id, h)))
      .toDF("media_id", "ahash")
  }

  /** Perceptual near-duplicate image pairs at hamming ≤ `maxHamming`
    * over aHash, blocked by the pigeonhole scheme shared with the
    * text SimHash operator (4 × 16-bit blocks, exact for ≤ 3; 8 ×
    * 8-bit for ≤ 7 — equality with brute force law-tested in
    * MultimodalSpec). Candidates are a block equi-join; the corpus
    * of image bytes never shuffles — only (id, 64-bit hash). */
  def imageNearDupPairs(media: Dataset[Media], maxHamming: Int): DataFrame = {
    require(maxHamming <= 7,
      s"pigeonhole blocking is exact only for hamming <= 7, got $maxHamming")
    val hashes = imageAHashes(media)
    val blockCols =
      if (maxHamming <= 3)
        (0 until 4).map(g => shiftright(col("ahash"), g * 16).bitwiseAND(lit(65535L)))
      else
        (0 until 8).map(g => shiftright(col("ahash"), g * 8).bitwiseAND(lit(255L)))
    val blk = hashes.select(col("media_id"), col("ahash"),
      posexplode(array(blockCols: _*)).as(Seq("blk_id", "blk_val")))
    val a = blk.select(col("blk_id"), col("blk_val"),
      col("media_id").as("m1"), col("ahash").as("h1"))
    val b = blk.select(col("blk_id"), col("blk_val"),
      col("media_id").as("m2"), col("ahash").as("h2"))
    val ham = bit_count(col("h1").bitwiseXOR(col("h2")))
    a.join(b, Seq("blk_id", "blk_val")).where(col("m1") < col("m2"))
      .where(ham <= maxHamming)
      .select(col("m1"), col("m2"), ham.cast("long").as("hamming"))
      .distinct()
  }
}
