package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing (SURVEY §7.1 step 9): image/audio/video as
 * opaque BINARY columns beside a typed metadata struct. The Spark-side
 * contract — schema, partition-friendly batch shape, operator signatures —
 * is real and tested. Codec status: IMAGE decode/resize is REAL
 * (javax.imageio, pure JVM), AUDIO decode is REAL for PCM containers
 * (javax.sound.sampled: WAV/AIFF/AU), and VIDEO decode is REAL for the
 * uncompressed Y4M/YUV4MPEG2 container ([[parseY4m]], pure JVM) — all
 * driving the same partition-scoped seam; compressed codecs (H.264,
 * MP3, …) would need codec libraries this container doesn't have, so
 * those paths are deterministic STUBs, each marked `STUB:` and isolated
 * behind one function so a real codec slots in without touching the
 * pipeline.
 *
 * Scale notes: binary payloads ride along untouched (Parquet stores them
 * column-separate, so metadata-only queries never read the bytes);
 * per-item transforms are narrow (no shuffle); frame sampling explodes
 * rows but keys stay with the parent item, so downstream groupBy(item_id)
 * needs one exchange.
 */
object Multimodal {

  /** Typed metadata carried beside the opaque payload. */
  val mediaMeta: StructType = StructType(Seq(
    StructField("kind", StringType),        // image | audio | video
    StructField("format", StringType),      // jpeg | png | wav | mp4 ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("item_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", mediaMeta)))

  /** Build a media table from any source DataFrame: payload bytes + typed
   *  metadata derived deterministically (so tests are stable). Here the
   *  "payload" is the utf-8 bytes of a text column — the plumbing target,
   *  not the codec. */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("item_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        lit("image").as("kind"),
        lit("fake").as("format"),
        (pmod(xxhash64(col(textCol)), lit(1920L)).cast("int") + 1).as("width"),
        (pmod(xxhash64(col(textCol), lit(1)), lit(1080L)).cast("int") + 1).as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** STUB: "decode" an image — in production this is a codec call inside
   *  mapPartitions (one decoder instance per partition, reused across
   *  rows). The deterministic fake derives pixel stats from the bytes so
   *  the schema/laziness/partitioning of the real operator is exercised. */
  def decodeImageStats(media: DataFrame): DataFrame =
    media.select(
      col("item_id"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      octet_length(col("content")).as("n_bytes"),
      // STUB: stand-in for decoded-pixel statistics
      (pmod(xxhash64(col("content").cast("string")), lit(256L))).cast("double").as("mean_pixel"))

  /** Resize: pure metadata transform (real resize would rewrite `content`
   *  in the same mapPartitions pass — STUB keeps bytes as-is). */
  def resize(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(
      lit(maxDim).cast("double") / col("meta.width").cast("double"),
      lit(maxDim).cast("double") / col("meta.height").cast("double"),
      lit(1.0))
    media.withColumn("meta", struct(
      col("meta.kind"), col("meta.format"),
      // round, not ceil: must agree with resizeWithCodec's math.round so
      // the metadata geometry matches the actually re-encoded image
      greatest(round(col("meta.width") * scale).cast("int"), lit(1)).as("width"),
      greatest(round(col("meta.height") * scale).cast("int"), lit(1)).as("height"),
      col("meta.sample_rate"), col("meta.duration_ms")))
  }

  /** Frame sampling: one output row per sampled frame (explode). Frame
   *  payload extraction is a STUB slice of the parent bytes. */
  def sampleFrames(media: DataFrame, everyNth: Int, maxFrames: Int): DataFrame = {
    val nFrames = least(
      greatest(floor(octet_length(col("content")) / lit(everyNth)).cast("int"), lit(1)),
      lit(maxFrames))
    media.select(col("item_id"), col("content"),
      posexplode(sequence(lit(0), nFrames - 1)).as(Seq("frame_idx", "frame_no")))
      .select(col("item_id"), col("frame_idx"),
        // STUB: a real implementation decodes the frame at this offset
        substring(base64(col("content")), col("frame_idx") * everyNth + 1, lit(everyNth)).as("frame_token"))
  }

  /** Feature extraction: fixed-width float vector per item. STUB derives a
   *  deterministic pseudo-embedding from the bytes; a real extractor runs a
   *  model in mapPartitions with batched inference. */
  def extractFeatures(media: DataFrame, dims: Int = 16): DataFrame =
    media.select(col("item_id"),
      transform(sequence(lit(0), lit(dims - 1)), i =>
        (pmod(xxhash64(col("content").cast("string"), i), lit(2000L)).cast("double") / 1000.0) - 1.0
      ).as("features"))

  /** Decoded per-item stats produced by a partition-scoped codec. */
  final case class DecodedStats(item_id: Long, n_bytes: Int, checksum: Long)

  /**
   * The real-codec integration point: `mapPartitions` with ONE codec
   * instance per partition reused across rows (how a JNI/image library is
   * amortized — the Spark-side batch shape the container's missing codec
   * libraries would slot into). The default codec is a deterministic STUB
   * (byte count + additive checksum); swap `mkCodec` for e.g. a TwelveMonkeys
   * ImageReader or an FFmpeg wrapper without touching the pipeline.
   */
  def decodeWithCodec(media: DataFrame,
                      mkCodec: () => Array[Byte] => (Int, Long) = () => stubCodec)
  : Dataset[DecodedStats] = {
    import media.sparkSession.implicits._
    media.select(col("item_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = mkCodec() // one instance per partition, reused per row
        rows.map { case (id, bytes) =>
          val (n, sum) = codec(Option(bytes).getOrElse(Array.emptyByteArray))
          DecodedStats(id, n, sum)
        }
      }
  }

  /** STUB: stands in for a real decoder; deterministic over the bytes. */
  private def stubCodec: Array[Byte] => (Int, Long) =
    bytes => (bytes.length, bytes.foldLeft(0L)((a, b) => a + (b & 0xff)))

  /**
   * REAL codec through the same seam: pure-JVM `javax.imageio` (PNG, JPEG,
   * GIF, BMP — present in every JRE, no container dependency). Returns
   * (pixel count, sum of 24-bit RGB values); undecodable bytes yield
   * (-1, 0) — data, not a crashed partition. MultimodalSpec drives real
   * PNG bytes through `decodeWithCodec(media, imageIoCodec)` end-to-end,
   * so the mapPartitions batch shape is proven with a non-stub decoder.
   */
  /** One resized image: re-encoded bytes + the actual output geometry.
   *  Null content / -1 dims for undecodable inputs. */
  final case class ResizedImage(item_id: Long, content: Array[Byte],
                                width: Int, height: Int)

  /**
   * REAL resize through the same partition-scoped seam: decode with
   * `javax.imageio`, scale to fit `maxDim` (aspect preserved, never
   * upscaled) with a Graphics2D bilinear draw, re-encode PNG. All
   * pure-JVM — no container dependency. Undecodable bytes become a
   * (null, -1, -1) row — data, not a crashed partition. Narrow
   * per-partition transform: no shuffle, bytes stream through one
   * decoder/encoder pair per partition.
   */
  def resizeWithCodec(media: DataFrame, maxDim: Int): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.select(col("item_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(Option(bytes).getOrElse(Array.emptyByteArray)))
            // NonFatal, not just IOException: ImageIO plugins throw
            // RuntimeExceptions on corrupt data, and one bad object must
            // be data, not a crashed partition
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) ResizedImage(id, null, -1, -1)
          else {
            val scale = math.min(1.0,
              maxDim.toDouble / math.max(img.getWidth, img.getHeight))
            val w = math.max(1, math.round(img.getWidth * scale).toInt)
            val h = math.max(1, math.round(img.getHeight * scale).toInt)
            val scaled = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = scaled.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
            } finally g.dispose()
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(scaled, "png", out)
            ResizedImage(id, out.toByteArray, w, h)
          }
        }
      }
  }

  /** Deterministic 8-bit grayscale PNG via the real encoder — the
   *  independent writer for image fixtures (same role as [[y4mBytes]]
   *  for video): PNG is lossless, so decoded samples equal `gray(x, y)`
   *  exactly. */
  def grayPng(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, gray(x, y) & 0xff); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic 8-bit grayscale JPEG via the real encoder (explicit
   *  compression quality) — the LOSSY counterpart of [[grayPng]]. JPEG
   *  is the codec every real image corpus actually ships, so the dedup
   *  family must survive its quantization: decoded samples are only
   *  approximately `gray(x, y)`, which is exactly why the JPEG-backed
   *  query builds high-contrast block images (cell means 0 or 255, a
   *  127-gray margin to the aHash threshold no sane quality level's
   *  DCT error can cross) — the lossy codec stays value-level
   *  oracle-able without modelling the quantizer. */
  def grayJpeg(width: Int, height: Int, quality: Float,
               gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, gray(x, y) & 0xff); x += 1 }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream()
    // explicit MemoryCache stream: ImageIO.createImageOutputStream
    // defaults to a FILE-cache stream (a temp file per encode), which
    // would turn the per-row encode loop into disk I/O
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** One image's perceptual hash: 64-char '0'/'1' aHash string, null for
   *  undecodable bytes. */
  final case class ImageHash(item_id: Long, ahash: String)

  /**
   * Perceptual-hash (average-hash) image deduplication — the multimodal
   * counterpart of text near-dup: REAL `javax.imageio` decode, luminance
   * average-pooled onto an 8×8 grid, bit i (row-major) set iff its cell
   * mean is strictly above the grid mean. Identical-looking images share
   * the hash; grouping is then plain Column algebra on the hash key.
   * Block pooling uses exact integer sums divided by the block pixel
   * count (and the grid mean divides by 64), so for block-aligned inputs
   * the hash is exactly predictable — the registered query's oracle
   * recomputes it in pure SQL from the synthetic pixel formula. For
   * dimensions not divisible by 8 the right/bottom remainder pixels are
   * cropped (⌊w/8⌋×⌊h/8⌋ blocks) — a deliberate exactness-over-resample
   * choice: a bilinear resize would tie the hash to interpolation
   * rounding no oracle can replay. Images smaller than 8×8 hash to null.
   *
   * The hash travels as a 64-char bit string rather than a packed long:
   * it is a GROUPING key, not a probed structure (contrast the Bloom
   * bitset lesson in PLANS.md), and a signed-64 pack would overflow both
   * engines' SUM on bit 63. Undecodable bytes hash to null — data, not a
   * crashed partition. Narrow decode; one hash-keyed exchange to group.
   */
  def perceptualHash(media: DataFrame): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.select(col("item_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          // the whole decode+hash is guarded: exotic rasters (e.g. a
          // 2-band gray+alpha PNG whose band-2 read would throw) must be
          // a null-hash ROW, not a crashed partition — same contract as
          // ImageIO.read itself failing
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(Option(bytes).getOrElse(Array.emptyByteArray)))
            if (img == null || img.getWidth < 8 || img.getHeight < 8)
              ImageHash(id, null)
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              val (bw, bh) = (w / 8, h / 8)
              val cells = new Array[Double](64)
              val raster = img.getRaster
              // luminance bands: 1 (gray) or the first 3 (RGB); a 2-band
              // gray+alpha raster uses band 0 only
              val rgb = raster.getNumBands >= 3
              var cy = 0
              while (cy < 8) {
                var cx = 0
                while (cx < 8) {
                  var sum = 0L
                  var y = cy * bh
                  while (y < (cy + 1) * bh) {
                    var x = cx * bw
                    while (x < (cx + 1) * bw) {
                      // integer luminance — exactly replayable
                      sum += (if (rgb)
                        (raster.getSample(x, y, 0) + raster.getSample(x, y, 1) +
                          raster.getSample(x, y, 2)) / 3
                      else raster.getSample(x, y, 0))
                      x += 1
                    }
                    y += 1
                  }
                  cells(cy * 8 + cx) = sum.toDouble / (bw * bh)
                  cx += 1
                }
                cy += 1
              }
              val mean = cells.sum / 64.0
              val sb = new java.lang.StringBuilder(64)
              var i = 0
              while (i < 64) { sb.append(if (cells(i) > mean) '1' else '0'); i += 1 }
              ImageHash(id, sb.toString)
            }
          } catch { case scala.util.control.NonFatal(_) => ImageHash(id, null) }
        }
      }
  }

  /** Perceptual-hash dedup groups: (item_id, ahash, canonical_id) with
   *  canonical = min item id sharing the hash; undecodable items are
   *  their own singleton groups (null hashes must NOT cluster). */
  def perceptualHashGroups(media: DataFrame): DataFrame = {
    val hashed = perceptualHash(media).toDF()
    val key = coalesce(col("ahash"),
      concat(lit("undecodable:"), col("item_id").cast("string")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(key)
    hashed.select(col("item_id"), col("ahash"),
      min(col("item_id")).over(w).as("canonical_id"))
  }

  /** Video-signature dedup groups: md5 of the per-frame mean-luma
   *  sequence (int-cast — exact for constant-fill synthetic frames),
   *  grouped with canonical = min item id. Undecodable items surface
   *  from [[sampleVideoFrames]] as a sentinel frame (frame_idx −1) and
   *  hash to null — SINGLETON groups, never clustered with each other
   *  or with a genuinely black one-frame video. */
  def videoSignatureGroups(media: DataFrame, maxFrames: Int = 8): DataFrame = {
    val frames = sampleVideoFrames(media, everyNth = 1, maxFrames = maxFrames).toDF()
    val sig = frames.groupBy(col("item_id"))
      .agg(when(min(col("frame_idx")) < 0, lit(null).cast("string"))
        .otherwise(md5(array_join(transform(
          array_sort(collect_list(struct(col("frame_idx"), col("mean_luma")))),
          s => s.getField("mean_luma").cast("int").cast("string")), "|"))).as("vsig"))
    val key = coalesce(col("vsig"),
      concat(lit("undecodable:"), col("item_id").cast("string")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(key)
    sig.select(col("item_id"), col("vsig"),
      min(col("item_id")).over(w).as("canonical_id"))
  }

  /** Deterministic mono 16-bit PCM WAV via the JRE's own encoder — the
   *  independent writer for audio fixtures (PCM-in-WAV is lossless, so
   *  decoded samples equal `samples` exactly). */
  def pcmWav(rate: Float, samples: Array[Short]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** One audio fingerprint: sign-flip count + integer-rounded RMS
   *  amplitude of the raw 16-bit samples; (-1, -1) for undecodable. */
  final case class AudioFingerprint(item_id: Long, n_sign_flips: Long, amp: Long)

  /**
   * Audio fingerprint dedup — the audio leg of the dedup trio (text
   * shingles, image aHash, and here): REAL `javax.sound.sampled` decode,
   * fingerprint = (zero-crossing count, integer-rounded RMS of the raw
   * 16-bit samples). Zero crossings track dominant frequency and RMS
   * tracks loudness — both EXACT integer/closed-form arithmetic, so the
   * registered query's oracle predicts them from the synthesis formula
   * (contrast a spectral fingerprint, whose FFT float sums would put
   * argmax ties at the mercy of accumulation order). Re-encoded or
   * container-shuffled copies of the same PCM fingerprint identically.
   * Undecodable bytes → (-1, -1), a singleton group. Narrow decode; one
   * fingerprint-keyed exchange to group.
   */
  def audioFingerprint(media: DataFrame): Dataset[AudioFingerprint] = {
    import media.sparkSession.implicits._
    media.select(col("item_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(Option(bytes).getOrElse(Array.emptyByteArray)))
            try {
              val fmt = in.getFormat
              require(fmt.getSampleSizeInBits == 16, "16-bit PCM only")
              val data = in.readAllBytes()
              val big = fmt.isBigEndian
              var flips = 0L
              var sumSq = 0.0
              var prev = 0
              var first = true
              var i = 0
              while (i + 1 < data.length) {
                val s =
                  if (big) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
                  else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
                if (!first && ((s < 0) != (prev < 0)) && s != 0 && prev != 0) flips += 1
                sumSq += s.toDouble * s
                prev = s
                first = false
                i += 2
              }
              val n = math.max(1, data.length / 2)
              AudioFingerprint(id, flips, math.round(math.sqrt(sumSq / n)))
            } finally in.close()
          } catch {
            case scala.util.control.NonFatal(_) => AudioFingerprint(id, -1L, -1L)
          }
        }
      }
  }

  /** Audio dedup groups: (item_id, n_sign_flips, amp, canonical_id) with
   *  canonical = min item id sharing the fingerprint; undecodable items
   *  ((-1, -1)) group by item id — singletons, never with each other. */
  def audioDedupGroups(media: DataFrame): DataFrame = {
    val fp = audioFingerprint(media).toDF()
    val key = when(col("n_sign_flips") === -1L, -col("item_id") - 1L)
      .otherwise(lit(0L)) // 0 for decodable: group purely by fingerprint
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_sign_flips"), col("amp"), key)
    fp.select(col("item_id"), col("n_sign_flips"), col("amp"),
      min(col("item_id")).over(w).as("canonical_id"))
  }

  /** Decoded per-item audio stats (REAL decode path). */
  final case class AudioStats(item_id: Long, n_frames: Long, sample_rate: Int,
                              channels: Int, duration_ms: Long, rms: Double)

  /**
   * REAL audio decode through the same partition-scoped seam: pure-JVM
   * `javax.sound.sampled` (WAV / AIFF / AU PCM — present in every JRE,
   * no container dependency; compressed formats like MP3/OGG would need
   * an SPI jar and stay out of scope). Per item: frame count, sample
   * rate, channels, duration, and RMS amplitude normalized to [0, 1]
   * over the 16-bit (or 8-bit) PCM samples — the standard loudness
   * signal an audio-curation gate filters on. Undecodable bytes become
   * a (-1, …) row: data, not a crashed partition. Narrow per-partition
   * transform, no shuffle — the same batch shape as the image codecs.
   */
  def decodeAudioStats(media: DataFrame): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.select(col("item_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(Option(bytes).getOrElse(Array.emptyByteArray)))
            try {
              val fmt = in.getFormat
              val data = in.readAllBytes()
              val bits = fmt.getSampleSizeInBits
              val frames = data.length.toLong / math.max(1, fmt.getFrameSize)
              val rate = math.round(fmt.getSampleRate)
              val durationMs = math.round(frames * 1000.0 / fmt.getSampleRate)
              val rms: Double =
                if (bits == 16) {
                  val big = fmt.isBigEndian
                  var sumSq = 0.0
                  var i = 0
                  while (i + 1 < data.length) {
                    val s =
                      if (big) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
                      else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
                    val x = s / 32768.0
                    sumSq += x * x
                    i += 2
                  }
                  math.sqrt(sumSq / math.max(1, data.length / 2))
                } else if (bits == 8) {
                  val signed = fmt.getEncoding ==
                    javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
                  var sumSq = 0.0
                  var i = 0
                  while (i < data.length) {
                    val x = (if (signed) data(i).toDouble
                             else (data(i) & 0xff) - 128.0) / 128.0
                    sumSq += x * x
                    i += 1
                  }
                  math.sqrt(sumSq / math.max(1, data.length))
                } else 0.0
              AudioStats(id, frames, rate, fmt.getChannels, durationMs, rms)
            } finally in.close()
          } catch {
            // UnsupportedAudioFileException and friends: bad object = data
            case scala.util.control.NonFatal(_) =>
              AudioStats(id, -1L, -1, -1, -1L, 0.0)
          }
        }
      }
  }

  /** Decoded per-item video stats (REAL decode path for Y4M). */
  final case class VideoStats(item_id: Long, width: Int, height: Int,
                              fps_num: Int, fps_den: Int, n_frames: Int,
                              duration_ms: Long, mean_luma: Double)

  /** One sampled video frame: luma-plane statistics (REAL extraction). */
  final case class VideoFrame(item_id: Long, frame_idx: Int, width: Int,
                              height: Int, mean_luma: Double)

  /** Parsed Y4M container: geometry, frame rate, raw luma plane per frame. */
  private[graft] final case class Y4m(width: Int, height: Int,
                                      fpsNum: Int, fpsDen: Int,
                                      lumaFrames: Vector[Array[Byte]])

  /**
   * REAL video container parse — YUV4MPEG2 (Y4M), the uncompressed
   * interchange format every video toolchain (ffmpeg, x264, VLC) reads
   * and writes. Pure JVM: a textual stream header (`YUV4MPEG2 W.. H..
   * F<num>:<den> .. C<colorspace>`), then per frame a `FRAME` marker line
   * followed by raw planar YUV bytes. This replaces the video STUB with
   * an actual decoder for the one video format that needs no codec
   * library; compressed codecs (H.264 …) still need a JNI decoder and
   * would slot into the same [[decodeWithCodec]] partition seam.
   *
   * Supported chroma subsamplings: C420* (default), C422, C444, Cmono.
   * Returns None for anything that is not a well-formed Y4M stream —
   * callers turn that into a (-1, …) row: data, not a crashed partition.
   */
  private[graft] def parseY4m(bytes: Array[Byte]): Option[Y4m] = {
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != '\n') i += 1
      i
    }
    val magic = "YUV4MPEG2"
    if (bytes == null || bytes.length < magic.length ||
        new String(bytes, 0, magic.length, "US-ASCII") != magic) return None
    val hEnd = lineEnd(0)
    if (hEnd >= bytes.length) return None
    val header = new String(bytes, 0, hEnd, "US-ASCII")
    var w = -1; var h = -1; var fn = 25; var fd = 1; var cs = "420"
    header.split(' ').drop(1).foreach { p =>
      if (p.nonEmpty) p.charAt(0) match {
        case 'W' => w = p.drop(1).toIntOption.getOrElse(-1)
        case 'H' => h = p.drop(1).toIntOption.getOrElse(-1)
        case 'F' => p.drop(1).split(':') match {
          case Array(a, b) =>
            fn = a.toIntOption.getOrElse(25); fd = b.toIntOption.getOrElse(1)
          case _ =>
        }
        case 'C' => cs = p.drop(1)
        case _ => // I (interlace), A (aspect), X (extension): ignored
      }
    }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
    // plane sizes in Long: a crafted W46341 H46341 (or W65536 H65536 C420)
    // header overflows Int to a zero/negative size and turns copyOfRange
    // into a crashed partition — exactly what this parser promises not to
    // do. Any frame bigger than the payload itself is malformed by
    // construction, so bounding by bytes.length also keeps the Int casts
    // below exact.
    val ySizeL = w.toLong * h
    val chromaSizeL =
      if (cs.startsWith("420")) 2L * ((w / 2).toLong * (h / 2))
      else if (cs.startsWith("422")) 2L * ((w / 2).toLong * h)
      else if (cs.startsWith("444")) 2L * ySizeL
      else if (cs.startsWith("mono")) 0L
      else return None
    val frames = Vector.newBuilder[Array[Byte]]
    var pos = hEnd + 1
    while (pos < bytes.length) {
      val fEnd = lineEnd(pos)
      val marker = new String(bytes, pos, math.min(5, fEnd - pos), "US-ASCII")
      if (marker != "FRAME" || fEnd >= bytes.length) return None
      val dataStart = fEnd + 1
      // Long-domain bound: once it passes, dataStart + ySizeL fits in Int
      // (bytes.length is an Int), so the copyOfRange casts are exact
      if (dataStart + ySizeL + chromaSizeL > bytes.length) return None
      frames += java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + ySizeL.toInt)
      pos = dataStart + ySizeL.toInt + chromaSizeL.toInt
    }
    Some(Y4m(w, h, fn, fd, frames.result()))
  }

  /** REAL Y4M writer (the test/fixture counterpart of [[parseY4m]]):
   *  C420 planar frames, chroma planes neutral (128). An independent
   *  implementation of the container spec, so round-tripping through
   *  parseY4m actually exercises the format. */
  private[graft] def y4mBytes(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                              lumaFrames: Seq[Array[Byte]]): Array[Byte] = {
    require(width % 2 == 0 && height % 2 == 0, "C420 needs even dimensions")
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C420\n"
      .getBytes("US-ASCII"))
    val chroma = Array.fill((width / 2) * (height / 2))(128.toByte)
    lumaFrames.foreach { y =>
      require(y.length == width * height, "luma plane size mismatch")
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(y); out.write(chroma); out.write(chroma)
    }
    out.toByteArray
  }

  private def meanLuma(frames: Seq[Array[Byte]]): Double = {
    var sum = 0.0; var n = 0L
    frames.foreach { f => var i = 0; while (i < f.length) { sum += (f(i) & 0xff); i += 1 }; n += f.length }
    if (n == 0) 0.0 else sum / n
  }

  /**
   * Per-item video stats through the partition-scoped codec seam: REAL
   * Y4M parse (geometry, frame rate, frame count, duration, mean luma).
   * Undecodable bytes become a (-1, …) row. Narrow transform, no shuffle.
   */
  def decodeVideoStats(media: DataFrame): Dataset[VideoStats] = {
    import media.sparkSession.implicits._
    media.select(col("item_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseY4m(Option(bytes).getOrElse(Array.emptyByteArray)) match {
          case Some(v) =>
            VideoStats(id, v.width, v.height, v.fpsNum, v.fpsDen,
              v.lumaFrames.length,
              math.round(v.lumaFrames.length * 1000.0 * v.fpsDen / v.fpsNum),
              meanLuma(v.lumaFrames))
          case None => VideoStats(id, -1, -1, -1, -1, -1, -1L, 0.0)
        }
      })
  }

  /**
   * REAL frame sampling: decode the Y4M stream and keep every `everyNth`
   * frame (frame 0 first) up to `maxFrames`, emitting the luma-plane mean
   * per sampled frame — one output row per frame, keys staying with the
   * parent item (downstream groupBy(item_id) needs one exchange, same
   * shape as the stub [[sampleFrames]] this supersedes for Y4M inputs).
   */
  def sampleVideoFrames(media: DataFrame, everyNth: Int, maxFrames: Int)
  : Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.select(col("item_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseY4m(Option(bytes).getOrElse(Array.emptyByteArray)) match {
          case Some(v) =>
            v.lumaFrames.indices
              .filter(_ % everyNth == 0).take(maxFrames)
              .map(i => VideoFrame(id, i, v.width, v.height,
                meanLuma(Seq(v.lumaFrames(i)))))
          case None => Seq(VideoFrame(id, -1, -1, -1, 0.0))
        }
      })
  }

  // ------------------------------------------------------------------
  // Compressed-stream STRUCTURE parsers (MP3 frame walk, H.264 NAL scan)
  // ------------------------------------------------------------------
  // The container has no codec libraries, so SAMPLE decode for MP3/H.264
  // stays stubbed — but the bitstream STRUCTURE is plain public-spec
  // byte-walking, and it is the tier a corpus pipeline actually computes
  // at scale: duration, bitrate, frame/keyframe counts come from frame
  // headers and NAL types without ever running a DCT. Both parsers are
  // deterministic over the bytes, tolerate trailing garbage (stop at the
  // first invalid header — a header walk, not a resync demuxer), and map
  // undecodable input to a sentinel row, same contract as the decoders.

  /** MPEG-1 Layer III bitrate table (kbps), index 1-14; 0 is "free", 15
   *  is forbidden — both treated as end-of-walk. */
  private val mp3BitrateKbps =
    Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
  /** MPEG-1 sample rates by the 2-bit header index; 3 is reserved. */
  private val mp3SampleRates = Array(44100, 48000, 32000, -1)

  /** One MP3 stream's header-walk stats; sentinel (-1, …) when no valid
   *  frame header is found. 1152 samples per MPEG-1 Layer III frame. */
  final case class Mp3Stats(item_id: Long, n_frames: Int, sample_rate: Int,
                            avg_bitrate_kbps: Double, duration_ms: Long)

  /** Walk MPEG-1 Layer III frame headers: sync (11 set bits), version 11
   *  (MPEG-1), layer 01 (III), bitrate/sample-rate indices, padding bit;
   *  frame length = 144·bitrate/sampleRate + padding. Returns
   *  (frameCount, sampleRate, bitrateSumKbps). */
  private[graft] def walkMp3(bytes: Array[Byte]): (Int, Int, Long) = {
    var i = 0
    var frames = 0
    var sr = -1
    var bitrateSum = 0L
    var done = false
    while (!done && i + 4 <= bytes.length) {
      val b0 = bytes(i) & 0xff; val b1 = bytes(i + 1) & 0xff
      val b2 = bytes(i + 2) & 0xff
      val sync = b0 == 0xff && (b1 & 0xe0) == 0xe0
      val version = (b1 >> 3) & 3   // 3 = MPEG-1
      val layer = (b1 >> 1) & 3     // 1 = Layer III
      val brIdx = (b2 >> 4) & 0xf
      val srIdx = (b2 >> 2) & 3
      val padding = (b2 >> 1) & 1
      if (!sync || version != 3 || layer != 1 ||
          brIdx == 0 || brIdx == 15 || srIdx == 3 ||
          (frames > 0 && mp3SampleRates(srIdx) != sr)) {
        done = true // not an MP3 at byte 0, or trailing garbage: stop
      } else {
        sr = mp3SampleRates(srIdx)
        val bitrate = mp3BitrateKbps(brIdx)
        bitrateSum += bitrate
        frames += 1
        i += 144 * bitrate * 1000 / sr + padding
      }
    }
    (frames, sr, bitrateSum)
  }

  /** Per-item MP3 structure stats (frame count, sample rate, mean
   *  bitrate, duration) from the header walk — narrow mapPartitions, no
   *  shuffle, no sample decode. */
  def mp3Structure(media: DataFrame): Dataset[Mp3Stats] = {
    import media.sparkSession.implicits._
    media.select(col("item_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (frames, sr, brSum) = walkMp3(Option(bytes).getOrElse(Array.emptyByteArray))
        if (frames == 0) Mp3Stats(id, -1, -1, 0.0, -1L)
        else Mp3Stats(id, frames, sr,
          BigDecimal(brSum.toDouble / frames)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          math.round(frames * 1152.0 * 1000.0 / sr))
      })
  }

  /** Structurally-valid MPEG-1 Layer III stream from (bitrateIdx,
   *  padding) per frame — the independent fixture writer: headers are
   *  real, payload bytes are 0xAA fill (a header walk cannot tell fill
   *  from a real bit reservoir, which is the point). */
  def mp3Bytes(srIdx: Int, frames: Seq[(Int, Int)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    frames.foreach { case (brIdx, pad) =>
      val len = 144 * mp3BitrateKbps(brIdx) * 1000 / mp3SampleRates(srIdx) + pad
      out.write(0xff); out.write(0xfa)            // sync + MPEG-1 Layer III
      out.write((brIdx << 4) | (srIdx << 2) | (pad << 1))
      out.write(0x00)                              // stereo, no emphasis
      var i = 4
      while (i < len) { out.write(0xaa); i += 1 }
    }
    out.toByteArray
  }

  /** One H.264 Annex-B stream's NAL census; sentinel (-1, …) when no
   *  start code exists. Keyframe ratio = IDR slices / all slices. */
  final case class H264Stats(item_id: Long, n_nals: Int, n_sps: Int,
                             n_pps: Int, n_idr: Int, n_slices: Int,
                             keyframe_ratio: Double)

  /** Scan Annex-B start codes (00 00 01, with an optional extra leading
   *  zero) and read each NAL header's nal_unit_type (low 5 bits).
   *  Returns the type sequence in stream order. */
  private[graft] def scanNalTypes(bytes: Array[Byte]): Seq[Int] = {
    val types = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i + 3 < bytes.length) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) {
        types += (bytes(i + 3) & 0x1f)
        i += 4
      } else i += 1
    }
    types.toSeq
  }

  /** Per-item H.264 structure stats from the NAL scan: SPS/PPS counts,
   *  IDR vs non-IDR slices, keyframe ratio — the GOP-shape signal a
   *  video curation pass filters on (no-keyframe clips are untrimmable;
   *  all-IDR clips are screen recordings / slideshows). */
  def h264Structure(media: DataFrame): Dataset[H264Stats] = {
    import media.sparkSession.implicits._
    media.select(col("item_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val ts = scanNalTypes(Option(bytes).getOrElse(Array.emptyByteArray))
        if (ts.isEmpty) H264Stats(id, -1, -1, -1, -1, -1, 0.0)
        else {
          val idr = ts.count(_ == 5)
          val non = ts.count(_ == 1)
          val slices = idr + non
          H264Stats(id, ts.length, ts.count(_ == 7), ts.count(_ == 8),
            idr, slices,
            if (slices == 0) 0.0
            else BigDecimal(idr.toDouble / slices)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      })
  }

  /** Annex-B stream from a NAL-type sequence — the independent fixture
   *  writer: 4-byte start codes, real NAL headers (nal_ref_idc = 3),
   *  0xAA RBSP fill (never forms a start code). */
  def h264Bytes(nalTypes: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    nalTypes.foreach { t =>
      out.write(0); out.write(0); out.write(0); out.write(1)
      out.write(0x60 | (t & 0x1f))
      out.write(0xaa); out.write(0xaa); out.write(0xaa)
    }
    out.toByteArray
  }

  /** One GIF's block census; sentinel (-1, …) on a bad signature.
    * `n_frames` > 1 is the animated-GIF curation signal. */
  final case class GifStats(item_id: Long, width: Int, height: Int,
                            gct_colors: Int, n_frames: Int,
                            n_extensions: Int, data_bytes: Long)

  /** Walk the GIF89a block structure (no LZW decode — the r8
    * no-decode tier, same posture as [[walkMp3]]/[[scanNalTypes]]):
    * header + logical screen descriptor, global color table skip, then
    * the block stream — 0x21 extensions (label + sub-blocks), 0x2C
    * image descriptors (LZW min-code byte + data sub-blocks, counted
    * into `data_bytes`), 0x3B trailer. Malformed tails stop the walk
    * with what was read so far (the permissive posture real corpus
    * GIFs need). */
  private[graft] def walkGif(bytes: Array[Byte]): (Int, Int, Int, Int, Int, Long) = {
    // accept BOTH signatures: GIF87a (legacy static, identical block
    // structure) and GIF89a — a census that drops 87a would misread
    // every legacy static GIF as malformed
    if (bytes.length < 13 || {
        val sig = new String(bytes, 0, 6, "US-ASCII")
        sig != "GIF89a" && sig != "GIF87a"
      })
      return (-1, -1, -1, -1, -1, -1L)
    def u16(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    val w = u16(6); val h = u16(8)
    val packed = bytes(10) & 0xff
    val gctColors = if ((packed & 0x80) != 0) 2 << (packed & 7) else 0
    var i = 13 + (if ((packed & 0x80) != 0) 3 * gctColors else 0)
    var frames = 0; var exts = 0; var dataBytes = 0L
    def skipSubBlocks(start: Int, countData: Boolean): Int = {
      var j = start
      while (j < bytes.length && bytes(j) != 0) {
        val n = bytes(j) & 0xff
        // count only bytes physically PRESENT: a stream truncated
        // mid-sub-block must not report more payload than the file holds
        if (countData) dataBytes += math.min(n, math.max(0, bytes.length - j - 1))
        j += 1 + n
      }
      j + 1 // past the 0x00 terminator
    }
    var done = false
    while (!done && i < bytes.length) {
      (bytes(i) & 0xff) match {
        case 0x21 => // extension: label byte then sub-blocks
          exts += 1
          i = skipSubBlocks(i + 2, countData = false)
        case 0x2c => // image descriptor: 9 more bytes (the packed byte
          // may flag a LOCAL color table — common in animated GIFs —
          // whose 3·2^(N+1) palette bytes sit before the LZW size byte),
          // then LZW min-code byte + data sub-blocks
          frames += 1
          val lctSkip =
            if (i + 9 < bytes.length && (bytes(i + 9) & 0x80) != 0)
              3 * (2 << (bytes(i + 9) & 7))
            else 0
          i = skipSubBlocks(i + 10 + lctSkip + 1, countData = true)
        case 0x3b => done = true
        case _ => done = true // unknown block: stop, keep what we have
      }
    }
    (w, h, gctColors, frames, exts, dataBytes)
  }

  /** Per-item GIF structure stats from the block walk — narrow
    * mapPartitions, no shuffle, no pixel decode. */
  def gifStructure(media: DataFrame): Dataset[GifStats] = {
    import media.sparkSession.implicits._
    media.select(col("item_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w, h, gct, frames, exts, data) =
          walkGif(Option(bytes).getOrElse(Array.emptyByteArray))
        GifStats(id, w, h, gct, frames, exts, data)
      })
  }

  /** Structurally-valid GIF89a from screen size, GCT bits, and per-frame
    * data sizes — the independent fixture writer: real header, LSD, GCT
    * (0x55 fill), one graphic-control extension per frame, image
    * descriptors at (0,0) full size, 0xAA LZW fill sub-blocks. */
  def gifBytes(w: Int, h: Int, gctBits: Int,
               frameDataSizes: Seq[Int], lctBits: Int = -1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    out.write(0x80 | (gctBits & 7)) // GCT present, 2^(bits+1) colors
    out.write(0); out.write(0)      // background idx, aspect
    (0 until 3 * (2 << (gctBits & 7))).foreach(_ => out.write(0x55))
    frameDataSizes.foreach { n =>
      out.write(0x21); out.write(0xf9)              // GCE
      out.write(4); out.write(0); le16(10); out.write(0); out.write(0)
      out.write(0x2c)                               // image descriptor
      le16(0); le16(0); le16(w); le16(h)
      if (lctBits >= 0) {                           // per-frame local table
        out.write(0x80 | (lctBits & 7))
        (0 until 3 * (2 << (lctBits & 7))).foreach(_ => out.write(0x33))
      } else out.write(0)
      out.write(7)                                  // LZW min code size
      out.write(n & 0xff)                           // one data sub-block
      (0 until n).foreach(_ => out.write(0xaa))
      out.write(0)                                  // terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  def imageIoCodec: () => Array[Byte] => (Int, Long) = () => {
    // javax.imageio caches plugin lookups process-wide; the per-partition
    // closure is where a heavier decoder (JNI, model) would hold state
    bytes => {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        // NonFatal: corrupt data throws RuntimeExceptions from plugins
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) (-1, 0L)
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += (img.getRGB(x, y) & 0xFFFFFF).toLong; x += 1 }
          y += 1
        }
        (w * h, sum)
      }
    }
  }
}
