package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal

/** Multimodal plumbing: binary columns + the mapPartitions codec seam. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decodeWithCodec runs one codec per partition over real bytes") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, ""), (3L, "École")).toDF("id", "text")
    val media = Multimodal.fromText(df, "id", "text")
    val out = Multimodal.decodeWithCodec(media).collect().map(d =>
      d.item_id -> (d.n_bytes, d.checksum)).toMap
    // utf-8 byte counts + additive byte checksums, deterministic
    assert(out(1L)._1 == 3 && out(1L)._2 == ('a' + 'b' + 'c').toLong)
    assert(out(2L)._1 == 0 && out(2L)._2 == 0L)
    assert(out(3L)._1 == "École".getBytes("UTF-8").length)
  }

  test("imageIoCodec decodes real PNG pixels through the same seam") {
    import spark.implicits._
    // 3×2 PNG with known pixels, written by the JRE's own encoder
    def png(rgbs: Array[Int], w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbs(y * w + x))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val pixels = Array(0xFF0000, 0x00FF00, 0x0000FF, 0x102030, 0x000000, 0xFFFFFF)
    val media = Seq(
      (1L, png(pixels, 3, 2)),
      (2L, "not an image".getBytes("UTF-8"))).toDF("item_id", "content")
    val out = Multimodal.decodeWithCodec(media, Multimodal.imageIoCodec)
      .collect().map(d => d.item_id -> (d.n_bytes, d.checksum)).toMap
    assert(out(1L)._1 == 6) // pixel count from a REAL decode
    assert(out(1L)._2 == pixels.map(_.toLong).sum) // lossless roundtrip
    assert(out(2L) == ((-1, 0L))) // undecodable -> data, not a crash
  }

  test("resizeWithCodec really rescales pixels (decode -> scale -> re-encode)") {
    import spark.implicits._
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      (1L, png(40, 20, 0x336699)), // downscale 2:1 -> 10x5 at maxDim 10
      (2L, png(4, 2, 0xABCDEF)),   // already under maxDim: untouched size
      (3L, "junk".getBytes("UTF-8"))).toDF("item_id", "content")
    val out = Multimodal.resizeWithCodec(media, maxDim = 10)
      .collect().map(r => r.item_id -> r).toMap
    assert(out(1L).width == 10 && out(1L).height == 5)
    // output is a real decodable image with the solid color preserved
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).content))
    assert(back.getWidth == 10 && back.getHeight == 5)
    assert((back.getRGB(5, 2) & 0xFFFFFF) == 0x336699)
    assert(out(2L).width == 4 && out(2L).height == 2) // no upscale
    assert(out(3L).content == null && out(3L).width == -1)
  }

  test("resize caps dimensions at maxDim preserving aspect") {
    import spark.implicits._
    val media = Multimodal.fromText(Seq((1L, "xyz")).toDF("id", "text"), "id", "text")
    val r = Multimodal.resize(media, 100).select(col("meta.width"), col("meta.height")).head()
    assert(r.getInt(0) <= 100 && r.getInt(1) <= 100)
    assert(r.getInt(0) > 0 && r.getInt(1) > 0)
  }

  test("decodeAudioStats decodes a real WAV (frames, rate, duration, RMS) through the seam") {
    import spark.implicits._
    // 0.25 s of a 440 Hz sine at amplitude 0.5, 8 kHz mono 16-bit PCM,
    // written by the JRE's own WAV encoder — RMS of a sine is A/√2
    val rate = 8000f
    val nFrames = 2000
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s = math.round(0.5 * math.sin(2 * math.Pi * 440.0 * i / rate) * 32767).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val wav = {
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val media = Seq(
      (1L, wav, "audio"),
      (2L, "definitely not audio".getBytes("UTF-8"), "audio"))
      .toDF("item_id", "content", "kind")
    val stats = Multimodal.decodeAudioStats(media)
      .collect().map(s => s.item_id -> s).toMap
    val ok = stats(1L)
    assert(ok.n_frames == nFrames && ok.sample_rate == 8000 && ok.channels == 1)
    assert(ok.duration_ms == 250L)
    assert(math.abs(ok.rms - 0.5 / math.sqrt(2.0)) < 0.01, s"rms ${ok.rms}")
    // corrupt bytes are DATA (sentinel row), not a crashed partition
    val bad = stats(2L)
    assert(bad.n_frames == -1L && bad.sample_rate == -1)
  }

  test("decodeVideoStats parses a real Y4M stream (geometry, fps, frames, luma) through the seam") {
    import spark.implicits._
    // two 4x2 frames with known luma planes, written by the independent
    // y4mBytes writer — parseY4m must recover them exactly
    val f0 = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80)
    val f1 = Array.fill(8)(200.toByte) // unsigned 200 via & 0xff
    val vid = Multimodal.y4mBytes(4, 2, 30, 1, Seq(f0, f1))
    val media = Seq(
      (1L, vid),
      (2L, "not a video".getBytes("UTF-8"))).toDF("item_id", "content")
    val out = Multimodal.decodeVideoStats(media).collect()
      .map(v => v.item_id -> v).toMap
    val ok = out(1L)
    assert(ok.width == 4 && ok.height == 2 && ok.fps_num == 30 && ok.fps_den == 1)
    assert(ok.n_frames == 2)
    assert(ok.duration_ms == 67L) // round(2 * 1000 / 30)
    val expected = (f0.map(_ & 0xff).sum + 8 * 200) / 16.0
    assert(math.abs(ok.mean_luma - expected) < 1e-12)
    assert(out(2L).n_frames == -1) // undecodable -> data, not a crash
  }

  test("parseY4m handles 422/444/mono chroma and rejects truncated frames") {
    // hand-built containers (NOT via y4mBytes, which only writes C420)
    def vid(cs: String, chromaLen: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"YUV4MPEG2 W4 H2 F25:1 $cs\nFRAME\n".getBytes("US-ASCII"))
      out.write(Array.fill[Byte](8)(100.toByte)) // luma 4x2
      out.write(Array.fill[Byte](chromaLen)(128.toByte))
      out.toByteArray
    }
    for ((cs, clen) <- Seq(("C422", 8), ("C444", 16), ("Cmono", 0))) {
      val p = Multimodal.parseY4m(vid(cs, clen))
      assert(p.exists(_.lumaFrames.length == 1), s"$cs failed")
      assert(p.get.lumaFrames.head.forall(_ == 100.toByte), cs)
    }
    // truncated chroma: one byte short -> None, not a crash or bad frame
    assert(Multimodal.parseY4m(vid("C444", 15)).isEmpty)
    // unknown colorspace -> None
    assert(Multimodal.parseY4m(vid("C410", 4)).isEmpty)
    // crafted overflow geometry: W*H wraps Int (46341^2 and 65536^2 C420)
    // -> None, never a copyOfRange/AIOOBE crash
    for (dims <- Seq("W46341 H46341", "W65536 H65536")) {
      val b = s"YUV4MPEG2 $dims F25:1 C420\nFRAME\n".getBytes("US-ASCII") ++
        Array.fill[Byte](64)(1.toByte)
      assert(Multimodal.parseY4m(b).isEmpty, dims)
    }
  }

  test("sampleVideoFrames keeps every Nth frame up to the cap, with real per-frame luma") {
    import spark.implicits._
    // 5 frames, frame i solid luma 10*i; everyNth=2, maxFrames=2 -> 0, 2
    val frames = (0 until 5).map(i => Array.fill(8)((10 * i).toByte))
    val media = Seq((7L, Multimodal.y4mBytes(4, 2, 25, 1, frames)))
      .toDF("item_id", "content")
    val out = Multimodal.sampleVideoFrames(media, everyNth = 2, maxFrames = 2)
      .collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(out.map(_.mean_luma).toSeq == Seq(0.0, 20.0))
    assert(out.forall(f => f.width == 4 && f.height == 2))
  }

  test("perceptual hash: pooling invariance, duplicate grouping, undecodable singletons") {
    import spark.implicits._
    def gray(p: Int)(x: Int, y: Int): Int = (p * 17 + x * 3 + y * 5) % 256
    // the same visual pattern at 8x8 and block-doubled 16x16 must hash
    // identically (each 2x2 block is constant -> pooling is exact)
    val small = Multimodal.grayPng(8, 8, gray(3))
    val big = Multimodal.grayPng(16, 16, (x, y) => gray(3)(x / 2, y / 2))
    // a DESCENDING gradient — structurally different. (gray(7) would hash
    // the same as gray(3): it is a pure brightness shift, and aHash's
    // threshold-against-the-mean is deliberately shift-invariant.)
    val other = Multimodal.grayPng(8, 8, (x, y) => (250 - x * 3 - y * 5) % 256)
    val media = Seq(
      (1L, small), (2L, big), (3L, other), (4L, small),
      (5L, Array[Byte](1, 2, 3)), (6L, Array[Byte](9, 9))  // undecodable
    ).toDF("item_id", "content")
    val got = Multimodal.perceptualHashGroups(media).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getLong(2))).toMap
    assert(got(1L)._1.isDefined && got(1L)._1.get.length == 64)
    assert(got(1L)._1 == got(2L)._1, "block-doubled image hashes identically")
    assert(got(1L)._1 == got(4L)._1 && got(4L)._2 == 1L, "duplicates share the canonical id")
    assert(got(3L)._1 != got(1L)._1 && got(3L)._2 == 3L, "different structure, own group")
    // and the invariance itself: a +68 brightness shift of the same
    // gradient (no mod wrap inside the grid) hashes identically
    val shifted = Multimodal.grayPng(8, 8, gray(7))
    val inv = Multimodal.perceptualHashGroups(
      Seq((1L, small), (2L, shifted)).toDF("item_id", "content")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(inv(1L) == inv(2L), "aHash is brightness-shift invariant")
    assert(got(5L)._1.isEmpty && got(5L)._2 == 5L, "undecodable is its own singleton")
    assert(got(6L)._1.isEmpty && got(6L)._2 == 6L, "null hashes must not cluster")
  }

  test("real JPEG bytes ride the same decode seam: lossy round-trip, stable aHash") {
    import spark.implicits._
    // high-contrast block mask: bit i of pattern p = (7p + 13i) % 64 < 32
    def mask(p: Int)(x: Int, y: Int): Int =
      if ((p * 7 + ((y / 8) * 8 + x / 8) * 13) % 64 < 32) 255 else 0
    val jpeg3 = Multimodal.grayJpeg(64, 64, 0.85f, mask(3))
    // really JPEG: SOI marker FF D8, EOI FF D9 — not a re-labelled PNG
    assert((jpeg3(0) & 0xff) == 0xff && (jpeg3(1) & 0xff) == 0xd8)
    assert((jpeg3(jpeg3.length - 2) & 0xff) == 0xff &&
      (jpeg3(jpeg3.length - 1) & 0xff) == 0xd9)
    // the codec IS lossy: a non-block-aligned gradient picks up DCT
    // quantization error. (The mask images themselves round-trip clean —
    // constant 8×8 blocks have zero AC coefficients — which is precisely
    // why they make the lossy codec oracle-able.)
    val gradSrc: (Int, Int) => Int = (x, y) => (x * 3 + y * 5) % 256
    val gradImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.grayJpeg(64, 64, 0.85f, gradSrc)))
    assert(gradImg != null && gradImg.getWidth == 64)
    val anyDiff = (0 until 64).exists(y => (0 until 64).exists(x =>
      gradImg.getRaster.getSample(x, y, 0) != gradSrc(x, y)))
    assert(anyDiff, "JPEG q0.85 on a wrapping gradient should not be bit-exact")
    // …but the aHash margin (127 gray levels) absorbs the quantization:
    // same-pattern JPEG and PNG group together, different patterns apart
    val media = Seq(
      (1L, jpeg3),
      (2L, Multimodal.grayPng(64, 64, mask(3))),
      (3L, Multimodal.grayJpeg(64, 64, 0.85f, mask(4))),
      (4L, Multimodal.grayJpeg(64, 64, 0.6f, mask(3)))) // harsher quality, same mask
      .toDF("item_id", "content")
    val got = Multimodal.perceptualHashGroups(media).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val expected3 = (0 until 64).map(i =>
      if ((3 * 7 + i * 13) % 64 < 32) '1' else '0').mkString
    assert(got(1L)._1 == expected3, "JPEG aHash equals the mask exactly")
    assert(got(2L)._1 == expected3 && got(2L)._2 == 1L, "lossless twin groups with the JPEG")
    assert(got(4L)._1 == expected3 && got(4L)._2 == 1L, "q0.6 re-encode still groups")
    assert(got(3L)._1 != expected3 && got(3L)._2 == 3L, "different mask, own group")
  }

  test("audio fingerprint: closed-form flips/amp, duplicate grouping, undecodable singletons") {
    import spark.implicits._
    def square(half: Int, amp: Short): Array[Byte] =
      Multimodal.pcmWav(8000f, Array.tabulate(2000)(i =>
        if ((i / half) % 2 == 0) amp else (-amp).toShort))
    val media = Seq(
      (1L, square(5, 8192)), (2L, square(5, 8192)),   // duplicates
      (3L, square(7, 8192)),                          // different frequency
      (4L, square(5, 12288)),                         // different loudness
      (5L, Array[Byte](1, 2, 3)), (6L, Array[Byte](7))  // undecodable
    ).toDF("item_id", "content")
    val got = Multimodal.audioDedupGroups(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((1999L / 5, 8192L, 1L)), s"closed form: ${got(1L)}")
    assert(got(2L) == ((1999L / 5, 8192L, 1L)), "identical PCM joins the canonical group")
    assert(got(3L)._1 == 1999L / 7 && got(3L)._3 == 3L, "different period, own group")
    assert(got(4L) == ((1999L / 5, 12288L, 4L)), "same period, different loudness, own group")
    assert(got(5L) == ((-1L, -1L, 5L)) && got(6L) == ((-1L, -1L, 6L)),
      "undecodables are singletons, never clustered together")
  }

  test("video signature: duplicates group, undecodables and black frames stay apart") {
    import spark.implicits._
    def y4m(lumas: Seq[Int]): Array[Byte] =
      Multimodal.y4mBytes(16, 8, 25, 1, lumas.map(l => Array.fill(16 * 8)(l.toByte)))
    val media = Seq(
      (1L, y4m(Seq(10, 20))), (2L, y4m(Seq(10, 20))),  // duplicates
      (3L, y4m(Seq(0))),                               // genuinely black 1-frame
      (4L, Array[Byte](1, 2, 3)), (5L, Array[Byte](9)) // undecodable
    ).toDF("item_id", "content")
    val got = Multimodal.videoSignatureGroups(media).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getLong(2))).toMap
    assert(got(1L)._1.isDefined && got(1L)._1 == got(2L)._1, "identical frames, same signature")
    assert(got(1L)._2 == 1L && got(2L)._2 == 1L, "identical frames share the canonical id")
    assert(got(3L)._1.isDefined && got(3L)._2 == 3L, "black video is its own real group")
    assert(got(4L)._1.isEmpty && got(4L)._2 == 4L, "undecodable singleton")
    assert(got(5L)._1.isEmpty && got(5L)._2 == 5L, "undecodables never cluster together")
    assert(got(3L)._1 != got(4L)._1 || got(3L)._2 != got(4L)._2,
      "black video must not merge with the sentinel")
  }

  test("MP3 header walk: frame counts, bitrate, duration; garbage and truncation stop cleanly") {
    import spark.implicits._
    // 3 frames at 128 kbps (idx 9), 44.1 kHz (idx 0), no padding
    val clean = Multimodal.mp3Bytes(0, Seq.fill(3)((9, 0)))
    val (f1, sr1, br1) = Multimodal.walkMp3(clean)
    assert((f1, sr1, br1) == ((3, 44100, 384L)))
    // header really is MPEG-1 Layer III sync
    assert((clean(0) & 0xff) == 0xff && (clean(1) & 0xff) == 0xfa)
    // mixed bitrates average; padding shifts the walk by one byte/frame
    val mixed = Multimodal.mp3Bytes(1, Seq((1, 1), (14, 1)))
    assert(Multimodal.walkMp3(mixed) == ((2, 48000, 32L + 320L)))
    // trailing garbage after valid frames: frames kept, walk stops
    val garbage = clean ++ Array.fill(64)(0x12.toByte)
    assert(Multimodal.walkMp3(garbage)._1 == 3)
    // truncated mid-frame: the partial last frame still counted (header
    // was valid), next read falls off the end
    assert(Multimodal.walkMp3(clean.take(clean.length - 10))._1 == 3)
    // not MP3 at all -> sentinel row through the Dataset face
    val media = Seq((1L, clean), (2L, Array[Byte](1, 2, 3))).toDF("item_id", "content")
    val got = Multimodal.mp3Structure(media).collect().map(s => s.item_id -> s).toMap
    assert(got(1L).n_frames == 3 && got(1L).duration_ms == 78L) // 3*1152000/44100 = 78.37
    assert(got(1L).avg_bitrate_kbps == 128.0)
    assert(got(2L).n_frames == -1 && got(2L).duration_ms == -1L)
  }

  test("H.264 NAL scan: census and keyframe ratio; no start code -> sentinel") {
    import spark.implicits._
    val gop = Multimodal.h264Bytes(Seq(7, 8, 5, 1, 1, 1))
    assert(Multimodal.scanNalTypes(gop) == Seq(7, 8, 5, 1, 1, 1))
    // 3-byte start codes are accepted too (strip the extra leading zero)
    val threeByte = gop.drop(1)
    assert(Multimodal.scanNalTypes(threeByte).head == 7)
    val media = Seq(
      (1L, gop),
      (2L, Multimodal.h264Bytes(Seq(7, 8, 5))),   // all-IDR
      (3L, Array.fill(32)(0xaa.toByte)))          // no start code
      .toDF("item_id", "content")
    val got = Multimodal.h264Structure(media).collect().map(s => s.item_id -> s).toMap
    assert(got(1L).n_nals == 6 && got(1L).n_sps == 1 && got(1L).n_pps == 1)
    assert(got(1L).n_idr == 1 && got(1L).n_slices == 4 && got(1L).keyframe_ratio == 0.25)
    assert(got(2L).n_slices == 1 && got(2L).keyframe_ratio == 1.0)
    assert(got(3L).n_nals == -1)
  }

  test("gifStructure: block walk round-trips the writer, rejects bad magic") {
    import spark.implicits._
    val g = Multimodal.gifBytes(20, 10, 2, Seq(5, 3))
    assert(Multimodal.walkGif(g) == ((20, 10, 8, 2, 2, 8L)))
    // per-frame LOCAL color tables (the common animated-GIF layout)
    // must be skipped, not read as sub-block lengths
    val lct = Multimodal.gifBytes(8, 8, 1, Seq(4, 4), lctBits = 1)
    assert(Multimodal.walkGif(lct) == ((8, 8, 4, 2, 2, 8L)))
    // legacy GIF87a: identical structure, different signature
    val g87 = g.clone(); g87(4) = '7'.toByte
    assert(Multimodal.walkGif(g87) == ((20, 10, 8, 2, 2, 8L)))
    // truncated mid-frame: keep what was fully read, no crash, and
    // data_bytes never exceeds the bytes physically present
    val cut = g.take(g.length - 2)
    val (w, _, _, frames, _, db) = Multimodal.walkGif(cut)
    assert(w == 20 && frames >= 1 && db <= cut.length)
    val midBlock = Multimodal.gifBytes(4, 4, 0, Seq(200)).dropRight(150)
    val (_, _, _, _, _, db2) = Multimodal.walkGif(midBlock)
    assert(db2 <= midBlock.length,
      s"declared-but-absent payload counted: $db2 > ${midBlock.length}")
    val media = Seq(
      (1L, g),
      (2L, Multimodal.gifBytes(4, 4, 0, Seq(1))),
      (3L, "NOTAGIF89a".getBytes("US-ASCII")))
      .toDF("item_id", "content")
    val got = Multimodal.gifStructure(media).collect().map(s => s.item_id -> s).toMap
    assert(got(1L).n_frames == 2 && got(1L).gct_colors == 8 && got(1L).data_bytes == 8L)
    assert(got(2L).width == 4 && got(2L).n_frames == 1 && got(2L).gct_colors == 2)
    assert(got(3L).width == -1)
  }

  test("extractFeatures yields fixed-width deterministic vectors") {
    import spark.implicits._
    val media = Multimodal.fromText(Seq((1L, "same"), (2L, "same")).toDF("id", "text"), "id", "text")
    val vecs = Multimodal.extractFeatures(media, 8).collect()
      .map(_.getSeq[Double](1))
    assert(vecs.forall(_.size == 8))
    assert(vecs(0) == vecs(1))
  }
}
