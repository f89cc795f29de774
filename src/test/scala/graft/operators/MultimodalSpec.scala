package graft.operators

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.fromDocuments(Tables.documents(spark, sf))

  test("media table carries binary payload + typed metadata") {
    val m = media.head()
    assert(m.bytes.nonEmpty)
    assert(Set("image", "audio", "video").contains(m.kind))
    assert(m.width >= 16 && m.height >= 16)
  }

  test("feature extraction is deterministic, batched, and schema-stable") {
    val f1 = Multimodal.extractFeatures(media, batchSize = 7).collect()
      .map(f => f.media_id -> f).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(5), batchSize = 64).collect()
      .map(f => f.media_id -> f).toMap
    assert(f1.keySet == f2.keySet)
    f1.foreach { case (id, f) =>
      assert(f.features.length == 16)
      assert(f.features.toSeq == f2(id).features.toSeq) // batch/partition invariant
      assert(f.byte_entropy > 0 && f.byte_entropy <= 8.0)
      assert(f.n_bytes > 0)
    }
  }

  test("image rows decode through javax.imageio with true dimensions and channels") {
    val imgs = media.filter(_.kind == "image").collect()
    assert(imgs.nonEmpty)
    // payload is a real PNG (magic bytes), not the raw text
    assert(imgs.forall(m => (m.bytes(0) & 0xFF) == 0x89 && m.bytes(1) == 'P'))
    val feats = Multimodal.extractFeatures(Multimodal.fromDocuments(
        graft.Tables.documents(spark, sf)))
      .collect().map(f => f.media_id -> f).toMap
    imgs.foreach { m =>
      val f = feats(m.media_id)
      assert(f.decoded_width == m.width, s"decoded width ${f.decoded_width} != ${m.width}")
      assert(f.decoded_height == m.height)
      assert(f.n_channels == 3)
      // channel means are real pixel statistics, inside (0,1)
      assert(f.features.take(3).forall(v => v > 0f && v < 1f))
    }
  }

  test("video rows decode through the imageio sequence reader with true frame counts") {
    val vids = media.filter(_.kind == "video").collect()
    assert(vids.nonEmpty)
    // payloads alternate REAL containers by id parity — animated GIF
    // and multi-page TIFF — and both must be present in the fixture
    val byContainer = vids.groupBy(m => Multimodal.containerOf(m.bytes))
    assert(byContainer.keySet == Set("gif", "tiff"))
    vids.foreach { m =>
      val expect = if (m.media_id % 2 == 0) "gif" else "tiff"
      assert(Multimodal.containerOf(m.bytes) == expect)
    }
    val feats = Multimodal.extractFeatures(media)
      .collect().map(f => f.media_id -> f).toMap
    vids.foreach { m =>
      val f = feats(m.media_id)
      assert(f.decoded_width == m.width, s"decoded width ${f.decoded_width} != ${m.width}")
      assert(f.decoded_height == m.height)
      assert(f.n_channels > 0)
      val expectedFrames = Multimodal.syntheticGifFrames(m.media_id)
      assert(f.features(0) == expectedFrames.toFloat,
        s"frame count ${f.features(0)} != $expectedFrames")
      // per-frame mean luminance of a dense pseudo-random frame is interior
      assert(f.features(1) > 0f && f.features(1) < 1f)
    }
  }

  test("audio rows decode through javax.sound.sampled with true format metadata") {
    val wavs = media.filter(_.kind == "audio").collect()
    assert(wavs.nonEmpty)
    // payload is a real RIFF/WAVE container, not the raw text
    assert(wavs.forall(m => new String(m.bytes.take(4), "US-ASCII") == "RIFF"))
    val feats = Multimodal.extractFeatures(media)
      .collect().map(f => f.media_id -> f).toMap
    wavs.foreach { m =>
      val f = feats(m.media_id)
      assert(f.decoded_width == 16000, s"sample rate ${f.decoded_width} != 16000")
      assert(f.n_channels == 1)
      val expectedFrames = 320 + (m.media_id % 640).toInt
      assert(f.decoded_height == expectedFrames,
        s"frame count ${f.decoded_height} != $expectedFrames")
      // RMS profile of a full-range pseudo-random signal is strictly positive
      assert(f.features.drop(1).take(15).forall(_ > 0f))
    }
  }

  test("undecodable image, audio, or video bytes fall back to the byte featurizer") {
    assert(Multimodal.decodeImage("not a png at all".getBytes).isEmpty)
    assert(Multimodal.decodeAudio("not a wav either".getBytes).isEmpty)
    assert(Multimodal.decodeVideo("and certainly not a gif".getBytes).isEmpty)
  }

  test("raw frame sampling keeps every Nth fixed-size byte window of video rows") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, everyN = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    assert(frames.filter(_.frame_idx > 0).forall(_.frame_bytes.length <= 32))
    val vids = media.filter(_.kind == "video").count()
    assert(frames.map(_.media_id).distinct.length.toLong == vids)
  }

  test("decoded frame sampling emits every Nth true frame as PNG from both containers") {
    val byId = Multimodal.sampleDecodedFrames(media, everyN = 2).collect()
      .groupBy(_.media_id)
    val vids = media.filter(_.kind == "video").collect()
    assert(byId.keySet == vids.map(_.media_id).toSet)
    vids.foreach { m =>
      val frames = byId(m.media_id).sortBy(_.frame_idx)
      val n = Multimodal.syntheticGifFrames(m.media_id)
      assert(frames.map(_.frame_idx).toSeq == (0 until n by 2).toSeq)
      // each sampled frame round-trips as a real PNG with the source dims
      frames.foreach { fr =>
        val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fr.frame_bytes))
        assert(im.getWidth == m.width && im.getHeight == m.height)
      }
    }
  }

  test("aHash near-dup: blocked == brute force; identical bytes hash identically") {
    import org.apache.spark.sql.functions._
    val hashes = Multimodal.imageAHashes(media)
    // every decodable image hashes deterministically (re-run equality)
    val h1 = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h2 = Multimodal.imageAHashes(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1 == h2 && h1.nonEmpty)
    for (t <- Seq(0, 3, 7)) {
      val blocked = Multimodal.imageNearDupPairs(media, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val a = hashes.select(col("media_id").as("m1"), col("ahash").as("h1"))
      val b = hashes.select(col("media_id").as("m2"), col("ahash").as("h2"))
      val ham = bit_count(col("h1").bitwiseXOR(col("h2")))
      val brute = a.crossJoin(b).where(col("m1") < col("m2") && ham <= t)
        .select(col("m1"), col("m2"), ham.cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(blocked == brute, s"t=$t: ${blocked.size} vs ${brute.size}")
    }
    val ex = intercept[IllegalArgumentException] {
      Multimodal.imageNearDupPairs(media, 9)
    }
    assert(ex.getMessage.contains("pigeonhole"))
  }

  test("resize stub bounds payload size and is a no-op when small") {
    val resized = Multimodal.resizeStub(media, targetBytes = 50).collect()
    assert(resized.forall(_.bytes.length <= 50))
    val tiny = Multimodal.resizeStub(media, targetBytes = 100000).collect()
      .map(m => m.media_id -> m.bytes.length).toMap
    val orig = media.collect().map(m => m.media_id -> m.bytes.length).toMap
    assert(tiny == orig)
  }
}
