package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2 C12): media as opaque
  * `binary` columns + typed metadata, batch-shaped per-partition
  * feature extraction.
  *
  * Image decode is REAL (pure-JVM javax.imageio — no native libs
  * needed; PNG/JPEG/GIF/BMP/WBMP): features are per-strip mean
  * luminance over the actual pixels. Other media types fall back to
  * `decodeStub` (this container has no audio/video codecs): a
  * deterministic fake
  * vector from the bytes, clearly marked. Everything around the
  * decode is real either way — the schema contract, the
  * mapPartitions batch boundary (where ffmpeg-via-JNI or an Arrow
  * hand-off to a Python worker would sit), and the partition
  * sizing: media blobs make rows huge, so the operator repartitions
  * by a size budget, not a row count, before the decode pass — at
  * 100 TB that's the difference between balanced decode tasks and
  * one task OOMing on a partition of 4K videos.
  */
object Multimodal {

  final case class MediaFeatures(media_id: Long, n_bytes: Long, features: Seq[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Wrap any table into the media shape: `bytes` = UTF-8 of a text
    * column (a deterministic stand-in for real image/audio payloads).
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image/stub").as("media_type"),
      col(payloadCol).cast("binary").as("bytes"),
      length(col(payloadCol)).as("width"),
      lit(1).as("height"))

  /** Real image decode, pure JVM: ImageIO parses the bytes (PNG,
    * JPEG, GIF, BMP, WBMP — every format the JDK ships a reader for;
    * ImageIO sniffs the actual container, so a mislabeled media_type
    * still decodes) and the feature vector is the mean luminance
    * (Rec. 601 weights) of `dim` equal-width vertical strips, scaled
    * to [0,1) — an actual pixel-derived signature usable for near-dup
    * blocking. Returns null for bytes no installed reader can parse
    * (caller falls back to the stub, mirroring SAFE-decode pipelines
    * that quarantine bad blobs).
    */
  def decodeImage(bytes: Array[Byte], dim: Int): Array[Float] = {
    val img = try {
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    } catch {
      // ImageIO decoders throw RuntimeExceptions (IllegalArgument,
      // ArrayIndexOutOfBounds, ...) on some corrupt inputs, not just
      // IOException — any decode failure must quarantine the blob,
      // never fail the task (ADVICE r2).
      case scala.util.control.NonFatal(_) => null
    }
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Double](dim)
    val counts = new Array[Long](dim)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        val strip = math.min(dim - 1, x * dim / w)
        sums(strip) += luma
        counts(strip) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(dim)(j => if (counts(j) == 0) 0f else (sums(j) / counts(j) / 256.0).toFloat)
  }

  /** Decode dispatch by declared media type: images decode for real
    * through ImageIO; everything else (and bytes no reader accepts)
    * takes the stub.
    */
  def decode(mediaType: String, bytes: Array[Byte], dim: Int): Array[Float] =
    if (mediaType.startsWith("image/") && mediaType != "image/stub") {
      val f = decodeImage(bytes, dim)
      if (f != null) f else decodeStub(bytes, dim)
    } else decodeStub(bytes, dim)

  /** STUB decode for media types without a JVM codec in this
    * container (audio/video): a real deployment routes these to
    * codec libraries via JNI or an Arrow hand-off to a Python worker.
    * Deterministic fake: feature j = mean of bytes with index ≡ j
    * (mod dim), scaled to [0,1).
    */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      val j = i % dim
      sums(j) += bytes(i) & 0xff
      counts(j) += 1
      i += 1
    }
    Array.tabulate(dim)(j => if (counts(j) == 0) 0f else (sums(j).toFloat / counts(j)) / 256f)
  }

  final case class MediaDims(media_id: Long, width: Int, height: Int, format: String)

  /** Container dims + format sniffed from the ACTUAL bytes (the
    * ImageIO reader's header parse — no full pixel decode), not the
    * declared media_type. None when no installed reader accepts the
    * bytes (caller quarantines, as in decode()).
    */
  def imageInfo(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          Some((r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase))
        } finally r.dispose()
      }
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally iis.close()
  }

  /** (media_id, width, height, format) per decodable blob — the
    * metadata-probe operator (header parse only, cheap even for huge
    * blobs); undecodable blobs drop out, mirroring quarantine
    * pipelines. Same typed-mapPartitions shape as extractFeatures.
    */
  def extractDims(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        imageInfo(bytes).map { case (w, h, f) => MediaDims(id, w, h, f) }
      }).toDF()
  }

  /** Deterministic single-gray PNG — the fixture generator for
    * decode gates and specs: render → decode → every output stat is
    * predictable arithmetic (dims as given; Rec. 601 luma of
    * (g,g,g) is exactly g, so strip means land on g/256).
    */
  def synthPng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Deterministic PATTERNED image fixture (r9, the perceptual-dedup
    * twin of [[synthPng]]'s single gray): pixel (x, y) carries gray
    * `(seed·37 + x·11 + y·23) mod 256`, so two images with the same
    * seed have IDENTICAL pixels regardless of the container they are
    * encoded into (`png` and `bmp` are both lossless for
    * TYPE_INT_RGB) and different seeds differ in most pixels. That
    * is exactly the fixture perceptual dedup needs: same-seed
    * images must collide on any pixel-derived hash, cross-seed
    * images must not.
    */
  def synthPatternImage(width: Int, height: Int, seed: Int,
      format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = (seed * 37 + x * 11 + y * 23) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, baos)
    baos.toByteArray
  }

  /** 64-bit difference hash (dHash) of an image — the standard cheap
    * perceptual fingerprint (Krawetz's aHash/dHash family; what image
    * dedup pipelines compute before grouping): decode, box-average
    * the luma plane onto a 9×8 grid (integer-bounded boxes — fully
    * deterministic, no AWT rescaler involved), then bit (y·8 + x) is
    * set iff cell (x+1, y) is brighter than cell (x, y). Identical
    * pixels → identical hash no matter the container; small edits
    * flip few bits (Hamming-near hashes — [[graft.ops.Dedup.simhashPairs]]'
    * banding applies unchanged if near-dup grouping is wanted). None
    * when no installed reader decodes the bytes (quarantine, as
    * imageInfo).
    */
  def dHash64(bytes: Array[Byte]): Option[Long] = {
    val img = try {
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    } catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val (gw, gh) = (9, 8)
    val w = img.getWidth; val h = img.getHeight
    if (w == 0 || h == 0) return None
    val grid = Array.ofDim[Double](gh, gw)
    var gy = 0
    while (gy < gh) {
      val y0 = gy * h / gh; val y1 = math.max(y0 + 1, (gy + 1) * h / gh)
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw; val x1 = math.max(x0 + 1, (gx + 1) * w / gw)
        var sum = 0.0; var n = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            n += 1; x += 1
          }
          y += 1
        }
        grid(gy)(gx) = if (n == 0) 0.0 else sum / n
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      val y = i / 8; val x = i % 8
      if (grid(y)(x + 1) > grid(y)(x)) hash |= (1L << i)
      i += 1
    }
    Some(hash)
  }

  final case class MediaHash(media_id: Long, dhash: Long)

  /** (media_id, dhash) per decodable blob — the perceptual-dedup key
    * pass: one size-budgeted decode per blob (same partitioning
    * discipline as [[extractFeatures]]), then grouping duplicates is
    * a plain hash aggregation on the 8-byte key — shuffle ∝ blobs,
    * never bytes. Undecodable rows quarantine (flatMap drop).
    */
  def extractDHash(media: DataFrame,
      targetPartitionBytes: Long = 64L * 1024 * 1024): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val totalBytes = media.agg(sum(length(col("bytes")))).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetPartitionBytes).toInt)
    media.select(col("media_id"), col("bytes"))
      .repartition(parts)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        dHash64(bytes).map(MediaHash(id, _))
      })
      .toDF()
  }

  final case class AudioInfo(media_id: Long, sample_rate: Int, channels: Int,
    frames: Long, encoding: String)

  /** Audio container metadata from the ACTUAL bytes — pure-JVM
    * javax.sound.sampled header parse (WAV/AIFF/AU ship with the
    * JDK; no codec needed because only the header is read). None for
    * bytes no installed provider accepts (quarantine, as imageInfo).
    */
  def audioInfo(bytes: Array[Byte]): Option[(Int, Int, Long, String)] =
    try {
      val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ff.getFormat
      Some((fmt.getSampleRate.toInt, fmt.getChannels, ff.getFrameLength.toLong,
        fmt.getEncoding.toString.toLowerCase))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case scala.util.control.NonFatal(_) => None
    }

  /** (media_id, sample_rate, channels, frames, encoding) per
    * decodable audio blob — the audio twin of [[extractDims]]: header
    * parse only, cheap at any blob size, undecodable rows quarantined.
    */
  def extractAudioInfo(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        audioInfo(bytes).map { case (sr, ch, fr, enc) =>
          AudioInfo(id, sr, ch, fr, enc)
        }
      }).toDF()
  }

  /** Deterministic PCM-16 WAV fixture: `frames` frames of a simple
    * per-frame ramp at the given rate/channel count — rendered
    * through the JDK's own writer so the gate exercises a real
    * container roundtrip, like [[synthPng]].
    */
  def synthWav(sampleRate: Int, channels: Int, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, channels,
      true, false)
    val data = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < frames * channels) {
      val v = ((i * 257) % 32768).toShort // deterministic ramp
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  final case class PcmStats(media_id: Long, n_samples: Long, peak: Int,
    sum_sq: Long, dc_ppm: Long, clip_n: Long)

  /** Signed 16-bit PCM samples decoded from the ACTUAL container
    * bytes through the JDK audio stack
    * (`AudioSystem.getAudioInputStream` — the same provider chain a
    * real WAV/AIFF/AU reader uses, honoring the container's declared
    * endianness), interleaved frames flattened to one Int per sample.
    * This is the step past [[audioInfo]]'s header parse: the sample
    * payload itself is read and decoded. None for bytes no provider
    * accepts or for non-PCM-16 encodings (quarantine, as imageInfo /
    * audioInfo — a float or compressed stream routes to a codec
    * worker out of container).
    */
  def pcmSamples(bytes: Array[Byte]): Option[Array[Int]] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        None
      else {
        val data = ais.readAllBytes()
        val n = data.length / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) =
            if (fmt.isBigEndian) (data(2 * i).toInt << 8) | (data(2 * i + 1) & 0xff)
            else (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)
          i += 1
        }
        Some(out)
      }
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case scala.util.control.NonFatal(_) => None
    }

  /** Per-blob PCM sample statistics (n_samples, peak |amplitude|,
    * Σ sample², DC offset in ppm of full scale via floor-division,
    * clipped-sample count at |v| ≥ clipAbs) — the loudness/clipping
    * screen an audio curation pipeline runs before feature
    * extraction. The samples NEVER leave the decode task: each blob
    * reduces to one metadata-sized row inside `mapPartitions`, so
    * shuffle volume is rows × 6 longs regardless of clip length
    * (Σ v² stays Long-safe to ~2³³ samples per blob ≈ 27 h of 44.1 kHz
    * stereo). Quarantined (dropped from the output, like imageInfo /
    * audioInfo): undecodable bytes, non-PCM-16 encodings, AND
    * decodable-but-empty clips (zero samples) — the empty clip has no
    * defined peak/DC statistic (dc_ppm would divide by zero), so it
    * routes to the same quarantine rather than fabricating an
    * n_samples=0 row; a pipeline that must distinguish "empty" from
    * "undecodable" diffs this output against [[extractAudioInfo]],
    * whose header parse still reports the empty clip's frame count.
    */
  def extractPcmStats(media: DataFrame, clipAbs: Int = 30000): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        pcmSamples(bytes).filter(_.nonEmpty).map { vs =>
          var peak = 0
          var sumSq = 0L
          var sum = 0L
          var clip = 0L
          var i = 0
          while (i < vs.length) {
            val v = vs(i)
            val a = math.abs(v)
            if (a > peak) peak = a
            sumSq += v.toLong * v
            sum += v
            if (a >= clipAbs) clip += 1
            i += 1
          }
          // floorDiv, not /: Spark's `div` and DuckDB's `//` both
          // floor, and a DC offset can be negative
          PcmStats(id, vs.length.toLong, peak, sumSq,
            Math.floorDiv(sum * 1000000L, vs.length.toLong), clip)
        }
      }).toDF()
  }

  final case class VideoInfo(media_id: Long, width: Int, height: Int,
    duration_ms: Long, brand: String)

  /** Video container metadata from the ACTUAL bytes — a pure-JVM ISO
    * BMFF (MP4/MOV/M4V) box-structure walk, no codec (only the box
    * tree is read, never sample data — cheap at any blob size):
    * `ftyp` major brand, `moov/mvhd` duration over timescale, and the
    * first `moov/trak/tkhd` with a non-zero 16.16 fixed-point
    * width/height (the video track; audio tracks carry 0×0). None for
    * bytes that don't parse as BMFF (quarantine, as imageInfo /
    * audioInfo). Box layout per ISO/IEC 14496-12.
    */
  def videoInfo(bytes: Array[Byte]): Option[(Int, Int, Long, String)] =
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
      def str4(off: Int): String =
        new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      // walk the box sequence in [lo, hi); returns (type, payloadFrom,
      // payloadTo) triples
      def boxes(lo: Int, hi: Int): Iterator[(String, Int, Int)] =
        new Iterator[(String, Int, Int)] {
          private var off = lo
          def hasNext: Boolean = off + 8 <= hi
          def next(): (String, Int, Int) = {
            val size32 = bb.getInt(off).toLong & 0xffffffffL
            val tpe = str4(off + 4)
            val (payload, end) =
              if (size32 == 1) (off + 16, off + bb.getLong(off + 8)) // largesize
              else if (size32 == 0) (off + 8, hi.toLong) // box extends to EOF
              else (off + 8, off + size32)
            require(end > off && end <= hi, s"box $tpe overruns")
            val r = (tpe, payload, end.toInt)
            off = end.toInt
            r
          }
        }
      def find(lo: Int, hi: Int, tpe: String): Option[(Int, Int)] =
        boxes(lo, hi).collectFirst { case (`tpe`, p, e) => (p, e) }
      val brand = find(0, bytes.length, "ftyp")
        .map { case (p, _) => str4(p) }.getOrElse(return None)
      val (moovP, moovE) = find(0, bytes.length, "moov").getOrElse(return None)
      val durationMs = find(moovP, moovE, "mvhd").flatMap { case (p, _) =>
        bb.get(p) match { // version byte
          case 0 => Some((bb.getInt(p + 12).toLong & 0xffffffffL,
            bb.getInt(p + 16).toLong & 0xffffffffL))
          case 1 => Some((bb.getInt(p + 20).toLong & 0xffffffffL, bb.getLong(p + 24)))
          case _ => None
        }
      }.collect { case (scale, dur) if scale > 0 => dur * 1000L / scale }
        .getOrElse(return None)
      // first trak whose tkhd has non-zero dimensions = the video track
      val dims = boxes(moovP, moovE).collect { case ("trak", tp, te) =>
        find(tp, te, "tkhd").flatMap { case (p, _) =>
          val fixedOff = bb.get(p) match {
            case 0 => p + 76 // v0: 4+4+4+4+4 + 8 + 2+2+2+2 + 36
            case 1 => p + 88 // v1: 64-bit times
            case _ => return None
          }
          val w = bb.getInt(fixedOff) >>> 16 // 16.16 fixed → integer part
          val h = bb.getInt(fixedOff + 4) >>> 16
          if (w > 0 && h > 0) Some((w, h)) else None
        }
      }.flatten.nextOption().getOrElse(return None)
      Some((dims._1, dims._2, durationMs, brand))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  /** (media_id, width, height, duration_ms, brand) per parseable
    * video blob — the video twin of [[extractDims]]/[[extractAudioInfo]]:
    * box-tree parse only, undecodable rows quarantined.
    */
  def extractVideoInfo(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        videoInfo(bytes).map { case (w, h, d, b) => VideoInfo(id, w, h, d, b) }
      }).toDF()
  }

  /** Deterministic minimal ISO BMFF fixture: `ftyp` +
    * `moov(mvhd + trak(tkhd))`, no media data — every byte hand-built
    * per 14496-12 (there is no JDK MP4 writer to round-trip through),
    * so the gate proves the box walk against the real container
    * layout: sizes, versions, the 16.16 fixed-point dims, the
    * duration/timescale division.
    */
  def synthMp4(width: Int, height: Int, durationMs: Long): Array[Byte] = {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length)
        .put(tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        .put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", {
      val bb = java.nio.ByteBuffer.allocate(12)
      bb.put("isom".getBytes).putInt(512).put("mp41".getBytes)
      bb.array()
    })
    val mvhd = box("mvhd", {
      val bb = java.nio.ByteBuffer.allocate(100) // version 0 payload
      bb.putInt(0) // version+flags
        .putInt(0).putInt(0) // creation, modification
        .putInt(1000) // timescale: ms
        .putInt(durationMs.toInt)
        .putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, reserved
        .putInt(0).putInt(0) // reserved
      // identity matrix
      bb.putInt(0x00010000).putInt(0).putInt(0)
        .putInt(0).putInt(0x00010000).putInt(0)
        .putInt(0).putInt(0).putInt(0x40000000)
      (1 to 6).foreach(_ => bb.putInt(0)) // pre_defined
      bb.putInt(2) // next_track_ID
      bb.array()
    })
    val tkhd = box("tkhd", {
      val bb = java.nio.ByteBuffer.allocate(84) // version 0 payload
      bb.putInt(0x000007) // version 0, flags: enabled|in_movie|in_preview
        .putInt(0).putInt(0) // creation, modification
        .putInt(1) // track_ID
        .putInt(0) // reserved
        .putInt(durationMs.toInt)
        .putLong(0L) // reserved
        .putShort(0).putShort(0).putShort(0).putShort(0) // layer, alt, volume, reserved
      bb.putInt(0x00010000).putInt(0).putInt(0)
        .putInt(0).putInt(0x00010000).putInt(0)
        .putInt(0).putInt(0).putInt(0x40000000)
      bb.putInt(width << 16).putInt(height << 16) // 16.16 fixed
      bb.array()
    })
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    ftyp ++ moov
  }

  /** Per-partition batched feature extraction. `targetPartitionBytes`
    * re-splits by payload volume first so decode tasks are balanced
    * regardless of blob-size skew. Typed Dataset mapPartitions (not
    * RDD + createDataFrame): rows stay in Tungsten binary format and
    * the surrounding plan keeps its optimizations; the iterator is
    * the batch boundary an Arrow hand-off would use.
    */
  def extractFeatures(media: DataFrame, dim: Int = 8,
      targetPartitionBytes: Long = 64L * 1024 * 1024): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val totalBytes = media.agg(sum(length(col("bytes")))).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetPartitionBytes).toInt)
    media.select(col("media_id"), col("media_type"), col("bytes"))
      .repartition(parts)
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, mediaType, bytes) =>
          MediaFeatures(id, bytes.length.toLong, decode(mediaType, bytes, dim).toSeq)
        }
      }
      .toDF()
  }
}
