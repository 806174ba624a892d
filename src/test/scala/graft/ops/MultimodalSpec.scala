package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{LocalSpark, Tables => T}

/** C12: multimodal binary-column plumbing with the stubbed decode. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  test("media wrap + feature extraction: schema, counts, determinism") {
    val docs = T.documents(spark, LocalSpark.sf)
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    assert(media.schema.fieldNames.toSeq ===
      Seq("media_id", "media_type", "bytes", "width", "height"))

    val feats = Multimodal.extractFeatures(media, dim = 8)
    assert(feats.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq ===
      Multimodal.featureSchema.fields.map(f => (f.name, f.dataType.sql)).toSeq)
    assert(feats.count() === docs.count())

    // deterministic across runs
    val a = feats.orderBy("media_id").limit(5).collect().map(_.toSeq).toSeq
    val b = Multimodal.extractFeatures(media, dim = 8)
      .orderBy("media_id").limit(5).collect().map(_.toSeq).toSeq
    assert(a === b)

    // features bounded in [0,1); n_bytes equals payload length
    val bad = feats.select(explode(col("features")).as("f"))
      .filter(col("f") < 0 || col("f") >= 1).count()
    assert(bad === 0L)
  }

  test("decodeStub matches a hand computation") {
    val f = Multimodal.decodeStub(Array[Byte](0, 64, -128, 64), 2)
    // dim 0: bytes 0,128 → mean 64 → .25 ; dim 1: bytes 64,64 → 64 → .25
    assert(f.toSeq === Seq(0.25f, 0.25f))
  }

  private def pngBytes(fillStrips: Seq[Int], w: Int = 64, h: Int = 16): Array[Byte] = {
    // Vertical strips of the given gray levels, encoded as a real PNG.
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = fillStrips(math.min(fillStrips.size - 1, x * fillStrips.size / w))
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("PNG decode extracts real pixel-derived features") {
    // Half-black / half-white image: strip means 0 and 255/256.
    val f = Multimodal.decodeImage(pngBytes(Seq(0, 255)), 2)
    assert(math.abs(f(0) - 0f) < 1e-6 && math.abs(f(1) - 255f / 256f) < 1e-6,
      s"got ${f.toSeq}")
    // Solid gray 128 → every strip 0.5 (luma weights sum to 1).
    val g = Multimodal.decodeImage(pngBytes(Seq(128)), 4)
    assert(g.forall(v => math.abs(v - 0.5f) < 1e-3), s"got ${g.toSeq}")
    // Garbage bytes → null (caller falls back to the stub).
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3), 2) == null)
  }

  test("JPEG/GIF/BMP decode for real through the same ImageIO path") {
    def encoded(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 64) img.setRGB(x, y, 0x808080)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
      out.toByteArray
    }
    for (fmt <- Seq("jpg", "gif", "bmp")) {
      val f = Multimodal.decodeImage(encoded(fmt), 4)
      assert(f != null, s"$fmt must decode")
      // solid gray 128 → ~0.5 everywhere (JPEG is lossy: loose bound)
      assert(f.forall(v => math.abs(v - 0.5f) < 0.02f), s"$fmt gave ${f.toSeq}")
      // dispatch: any image/* type routes to the real decoder
      val viaDispatch = Multimodal.decode(s"image/$fmt", encoded(fmt), 4)
      assert(viaDispatch.toSeq === f.toSeq)
    }
  }

  test("end-to-end: PNG media rows decode through extractFeatures") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = Seq(
      Row(1L, "image/png", pngBytes(Seq(0, 255)), 64, 16),
      Row(2L, "image/png", pngBytes(Seq(128)), 64, 16),
      Row(3L, "application/octet-stream", Array[Byte](0, 64, -128, 64), 4, 1))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val feats = Multimodal.extractFeatures(media, dim = 2)
      .orderBy("media_id").collect()
    val f1 = feats(0).getSeq[Float](2)
    assert(math.abs(f1(0)) < 1e-6 && math.abs(f1(1) - 255f / 256f) < 1e-6)
    val f2 = feats(1).getSeq[Float](2)
    assert(f2.forall(v => math.abs(v - 0.5f) < 1e-3))
    // Non-PNG rows take the deterministic stub path.
    assert(feats(2).getSeq[Float](2).toSeq === Seq(0.25f, 0.25f))
  }

  test("synthPng/imageInfo/extractDims: render → header-probe roundtrip") {
    // imageInfo reads the container header, not the declared type
    val png = Multimodal.synthPng(13, 5, 77)
    assert(Multimodal.imageInfo(png) === Some((13, 5, "png")))
    // garbage bytes are quarantined, not thrown
    assert(Multimodal.imageInfo(Array[Byte](1, 2, 3, 4)) === None)
    // the distributed dims probe keeps decodable blobs only
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row(1L, "image/png", Multimodal.synthPng(8, 4, 0), 8, 4),
      Row(2L, "image/png", Array[Byte](9, 9, 9), 0, 0), // undecodable
      Row(3L, "application/octet-stream", Multimodal.synthPng(31, 2, 255), 31, 2))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val dims = Multimodal.extractDims(media)
      .orderBy("media_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(dims.toSeq === Seq((1L, 8, 4, "png"), (3L, 31, 2, "png")))
    // full pixel decode of a synth image recovers the gray level
    val f = Multimodal.decodeImage(Multimodal.synthPng(16, 4, 200), 4)
    assert(f.forall(v => math.abs(v - 200f / 256f) < 1e-4))
  }

  test("synthWav/audioInfo/extractAudioInfo: WAV render → header-probe roundtrip") {
    val wav = Multimodal.synthWav(16000, 2, 123)
    assert(Multimodal.audioInfo(wav) === Some((16000, 2, 123L, "pcm_signed")))
    // image bytes are not audio; garbage is quarantined, not thrown
    assert(Multimodal.audioInfo(Multimodal.synthPng(4, 4, 0)) === None)
    assert(Multimodal.audioInfo(Array[Byte](1, 2, 3)) === None)
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row(1L, "audio/wav", Multimodal.synthWav(8000, 1, 100), 0, 0),
      Row(2L, "audio/wav", Array[Byte](9, 9), 0, 0)) // undecodable
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val got = Multimodal.extractAudioInfo(media).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq === Seq((1L, 8000, 1, 100L, "pcm_signed")))
  }

  test("pcmSamples/extractPcmStats: real sample decode, both endiannesses, stats law") {
    // LE WAV: decoded samples equal the fixture's closed-form ramp
    val wav = Multimodal.synthWav(8000, 2, 50) // 100 interleaved samples
    val vs = Multimodal.pcmSamples(wav).get
    assert(vs.length === 100)
    assert(vs.toSeq === (0 until 100).map(i => (i * 257) % 32768))

    // BE AIFF through the JDK's own writer: same samples must decode
    // identically — proves the endianness branch against a real BE
    // container, not a hand-flipped buffer
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, true)
    val data = new Array[Byte](200)
    (0 until 100).foreach { i =>
      val v = ((i * 257) % 32768).toShort
      data(2 * i) = ((v >> 8) & 0xff).toByte
      data(2 * i + 1) = (v & 0xff).toByte
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, 50L),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, baos)
    assert(Multimodal.pcmSamples(baos.toByteArray).get.toSeq === vs.toSeq)

    // quarantine: garbage, other modalities, and non-16-bit PCM
    assert(Multimodal.pcmSamples(Array[Byte](1, 2, 3)) === None)
    assert(Multimodal.pcmSamples(Multimodal.synthPng(4, 4, 0)) === None)
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, true, false)
    val b8 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](16)), fmt8, 16L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, b8)
    assert(Multimodal.pcmSamples(b8.toByteArray) === None)

    // stats law vs a direct fold over the decoded samples (clip at
    // the query's 30000), undecodable row quarantined
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row(1L, "audio/wav", wav, 0, 0),
      Row(2L, "audio/wav", Array[Byte](9, 9), 0, 0))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val got = Multimodal.extractPcmStats(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val exp = (1L, 100L, vs.max, vs.map(v => v.toLong * v).sum,
      Math.floorDiv(vs.map(_.toLong).sum * 1000000L, 100L),
      vs.count(_ >= 30000).toLong)
    assert(got.toSeq === Seq(exp))
  }

  test("synthMp4/videoInfo/extractVideoInfo: BMFF box walk roundtrip") {
    val mp4 = Multimodal.synthMp4(640, 360, 5000L)
    assert(Multimodal.videoInfo(mp4) === Some((640, 360, 5000L, "isom")))
    // non-BMFF bytes quarantine, never throw — including truncated
    // boxes and payloads from the OTHER modalities
    assert(Multimodal.videoInfo(Multimodal.synthPng(4, 4, 0)) === None)
    assert(Multimodal.videoInfo(Multimodal.synthWav(8000, 1, 10)) === None)
    assert(Multimodal.videoInfo(Array[Byte](0, 0, 0, 9, 'f', 't', 'y', 'p')) === None)
    assert(Multimodal.videoInfo(mp4.take(20)) === None)
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row(1L, "video/mp4", Multimodal.synthMp4(1920, 1080, 60000L), 0, 0),
      Row(2L, "video/mp4", Array[Byte](9, 9, 9, 9), 0, 0)) // undecodable
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val got = Multimodal.extractVideoInfo(media).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq === Seq((1L, 1920, 1080, 60000L, "isom")))
  }

  test("dHash64: container-invariant on identical pixels, distinct across patterns, quarantines junk") {
    // the perceptual-dedup LAW: same pixels → same hash regardless of
    // the (lossless) container; the 8 fixture pattern classes → 8
    // distinct hashes (a collision here would merge dedup groups)
    val seeds = 0 until 8
    val png = seeds.map(p => Multimodal.dHash64(
      Multimodal.synthPatternImage(24, 16, p, "png")).get)
    val bmp = seeds.map(p => Multimodal.dHash64(
      Multimodal.synthPatternImage(24, 16, p, "bmp")).get)
    assert(png === bmp, "same pixels must hash identically across containers")
    assert(png.distinct.size === 8, s"pattern classes must not collide: $png")
    // resolution invariance direction: a TRUE 2× upscale (pixel
    // doubling) box-averages onto nearly the same 9×8 grid —
    // Hamming-near, the property that makes dHash a PERCEPTUAL hash
    // (banding on it via simhashPairs' machinery would group
    // rescales); not exactly equal because 9 ∤ 24 makes the grid
    // boxes land on slightly different pixel boundaries
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.synthPatternImage(24, 16, 3, "png")))
    val up = new java.awt.image.BufferedImage(48, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 48)
      up.setRGB(x, y, src.getRGB(x / 2, y / 2))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(up, "png", baos)
    val big = Multimodal.dHash64(baos.toByteArray).get
    assert(java.lang.Long.bitCount(big ^ png(3)) <= 8,
      s"2x upscale must stay Hamming-near: ${java.lang.Long.bitCount(big ^ png(3))}")
    // undecodable bytes quarantine, never throw
    assert(Multimodal.dHash64(Array[Byte](1, 2, 3)) === None)
    assert(Multimodal.dHash64(Multimodal.synthWav(8000, 1, 10)) === None)
  }
}
