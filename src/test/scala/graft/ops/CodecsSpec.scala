package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real pure-JVM codecs: synthesized WAV/BMP bytes decode to exactly
  * the planted properties, through both the scalar API and the
  * partition-local DataFrame ops. */
class CodecsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** Mono PCM16 WAV: square wave of ±amp, `period` frames per half. */
  private def makeWav(sampleRate: Int, nFrames: Int, amp: Short,
                      period: Int): Array[Byte] = {
    val dataLen = nFrames * 2
    val out = new Array[Byte](44 + dataLen)
    def put16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    def put32(o: Int, v: Int): Unit = {
      put16(o, v & 0xffff); put16(o + 2, (v >> 16) & 0xffff)
    }
    def tag(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) =>
        out(o + i) = b
      }
    tag(0, "RIFF"); put32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, 1)
    put32(24, sampleRate); put32(28, sampleRate * 2); put16(32, 2)
    put16(34, 16)
    tag(36, "data"); put32(40, dataLen)
    (0 until nFrames).foreach { i =>
      val v = if ((i / period) % 2 == 0) amp.toInt else -amp.toInt
      put16(44 + 2 * i, v & 0xffff)
    }
    out
  }

  /** Mono PCM16 WAV around explicit samples. */
  private def pcm16Wav(samples: Array[Short], sampleRate: Int)
      : Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def put16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    def put32(o: Int, v: Int): Unit = {
      put16(o, v & 0xffff); put16(o + 2, (v >> 16) & 0xffff)
    }
    def tag(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) =>
        out(o + i) = b
      }
    tag(0, "RIFF"); put32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, 1)
    put32(24, sampleRate); put32(28, sampleRate * 2); put16(32, 2)
    put16(34, 16)
    tag(36, "data"); put32(40, dataLen)
    samples.zipWithIndex.foreach { case (s, i) =>
      put16(44 + 2 * i, s & 0xffff)
    }
    out
  }

  /** w×h RGB gradient: R = x, G = y, B = 7 (top-down row-major). */
  private def makeRgb(w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      rgb(3 * (y * w + x)) = x.toByte
      rgb(3 * (y * w + x) + 1) = y.toByte
      rgb(3 * (y * w + x) + 2) = 7.toByte
    }
    rgb
  }

  test("ImageIO decode: PNG roundtrip is pixel-exact (equals the BMP " +
    "decoder on the same pixels), JPEG recovers a uniform image " +
    "within lossy tolerance, garbage decodes to None") {
    val (w, h) = (20, 12)
    val rgb = makeRgb(w, h)
    val png = Codecs.encodeImage(w, h, rgb, "png")
    val viaPng = Codecs.decodeImage(png).get
    val viaBmp = Codecs.decodeBmp(Codecs.encodeBmp(w, h, rgb)).get
    assert(viaPng == viaBmp, s"PNG must be lossless: $viaPng vs $viaBmp")
    // uniform mid-gray JPEG: dims exact, means within codec tolerance
    val uni = Array.fill[Byte](3 * w * h)(100.toByte)
    val jpg = Codecs.encodeImage(w, h, uni, "jpg")
    val viaJpg = Codecs.decodeImage(jpg).get
    assert(viaJpg.width == w && viaJpg.height == h)
    Seq(viaJpg.meanR, viaJpg.meanG, viaJpg.meanB).foreach(m =>
      assert(math.abs(m - 100.0) < 3.0, s"JPEG mean drifted: $viaJpg"))
    assert(Codecs.decodeImage("not an image".getBytes).isEmpty)
    // the JPEG bytes are REAL JPEG (FFD8 SOI marker), not a
    // re-labeled bitmap
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
  }

  test("aHash64: scale- and brightness-invariant for a structured " +
    "image, far from an unrelated image's hash, None for garbage") {
    val (w, h) = (64, 64)
    // half-dark / half-bright vertical split
    def split(bright: Int, dark: Int): Array[Byte] = {
      val rgb = new Array[Byte](3 * w * h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        rgb(3 * (y * w + x) + c) =
          (if (x < w / 2) dark else bright).toByte
      rgb
    }
    def hashOf(rgb: Array[Byte], w2: Int = w, h2: Int = h): Long =
      Codecs.aHash64(Codecs.encodeImage(w2, h2, rgb, "png")).get
    val base = hashOf(split(200, 40))
    // uniform brightness shift: same hash
    assert(hashOf(split(230, 70)) == base, "brightness shift must not move aHash")
    // scale invariance: the same pattern at half resolution
    val smallRgb = new Array[Byte](3 * 32 * 32)
    for (y <- 0 until 32; x <- 0 until 32; c <- 0 until 3)
      smallRgb(3 * (y * 32 + x) + c) = (if (x < 16) 40 else 200).toByte
    val smallHash = Codecs.aHash64(
      Codecs.encodeImage(32, 32, smallRgb, "png")).get
    assert(java.lang.Long.bitCount(smallHash ^ base) <= 8,
      "scaled image must hash within a small hamming ball")
    // an unrelated pattern (horizontal split) is far away
    val horiz = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      horiz(3 * (y * w + x) + c) = (if (y < h / 2) 40 else 200).toByte
    assert(java.lang.Long.bitCount(hashOf(horiz) ^ base) >= 24,
      "unrelated structure must be distant")
    assert(Codecs.aHash64("junk".getBytes).isEmpty)
  }

  test("pHash64: stable under scale, brightness shift, and JPEG " +
    "recompression; far for unrelated structure; None for garbage") {
    val (w, h) = (64, 64)
    // diagonal gradient + bright disc: structured, non-separable
    def scene(size: Int, shift: Int): Array[Byte] = {
      val rgb = new Array[Byte](3 * size * size)
      for (y <- 0 until size; x <- 0 until size) {
        val dx = x - size * 3 / 10
        val dy = y - size * 2 / 5
        val base = (x + y) * 200 / (2 * size - 2) +
          (if (dx * dx + dy * dy < size * size / 25) 55 else 0)
        val v = (base + shift).min(255).max(0).toByte
        for (c <- 0 until 3) rgb(3 * (y * size + x) + c) = v
      }
      rgb
    }
    def hashOf(bytes: Array[Byte]): Long = Codecs.pHash64(bytes).get
    val base = hashOf(Codecs.encodeImage(w, h, scene(w, 0), "png"))
    // uniform brightness shift touches mostly the DC coefficient
    val bright = hashOf(Codecs.encodeImage(w, h, scene(w, 20), "png"))
    assert(java.lang.Long.bitCount(bright ^ base) <= 8,
      "brightness shift must stay within a small hamming ball")
    // same scene at half resolution
    val small = hashOf(Codecs.encodeImage(32, 32, scene(32, 0), "png"))
    assert(java.lang.Long.bitCount(small ^ base) <= 10,
      s"scale must stay near: ${java.lang.Long.bitCount(small ^ base)}")
    // lossy JPEG of the same pixels
    val jpg = hashOf(Codecs.encodeImage(w, h, scene(w, 0), "jpg"))
    assert(java.lang.Long.bitCount(jpg ^ base) <= 10,
      s"JPEG recompression: ${java.lang.Long.bitCount(jpg ^ base)}")
    // unrelated structure (the transpose-mirrored gradient with the
    // disc moved) must be far
    val other = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (255 - (x + y) * 200 / (2 * w - 2)).toByte
      for (c <- 0 until 3) other(3 * (y * w + x) + c) = v
    }
    val far = hashOf(Codecs.encodeImage(w, h, other, "png"))
    assert(java.lang.Long.bitCount(far ^ base) >= 20,
      s"unrelated structure too close: ${java.lang.Long.bitCount(far ^ base)}")
    assert(Codecs.pHash64("junk".getBytes).isEmpty)
  }

  test("resizeImage: PNG-in → nearest-neighbor sample matches the BMP " +
    "resizer pixel for pixel (same index math, lossless carriers)") {
    val (w, h) = (16, 10)
    val rgb = makeRgb(w, h)
    val viaImg = Codecs.resizeImage(
      Codecs.encodeImage(w, h, rgb, "png"), 5, 4).get
    val viaBmp = Codecs.resizeBmp(Codecs.encodeBmp(w, h, rgb), 5, 4).get
    assert(Codecs.decodeImage(viaImg).get == Codecs.decodeBmp(viaBmp).get,
      "both resize paths must sample the same source pixels")
    assert(Codecs.resizeImage("junk".getBytes, 2, 2).isEmpty)
  }

  test("decodeImageColumn decodes JPEG/PNG rows and nulls undecodable " +
    "bytes, partition-locally") {
    import spark.implicits._
    val (w, h) = (8, 6)
    val rows = Seq(
      (1L, Codecs.encodeImage(w, h, makeRgb(w, h), "png")),
      (2L, Codecs.encodeImage(w, h, makeRgb(w, h), "jpg")),
      (3L, Array[Byte](1, 2, 3)))
    val df = rows.toDF("id", "media").repartition(2)
    val got = Multimodal.decodeImageColumn(df, "media")
      .select(col("id"), col("img"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getStruct(1)).map(s => (s.getInt(0), s.getInt(1)))).toMap
    assert(got(1L).contains((w, h)))
    assert(got(2L).contains((w, h)))
    assert(got(3L).isEmpty)
  }

  test("imageHashColumn: both perceptual hashes per row, equal to the " +
    "scalar functions, null for undecodable bytes") {
    import spark.implicits._
    val (w, h) = (16, 16)
    val png = Codecs.encodeImage(w, h, makeRgb(w, h), "png")
    val df = Seq((1L, png), (2L, Array[Byte](9, 9)))
      .toDF("id", "media").repartition(2)
    val got = Multimodal.imageHashColumn(df, "media")
      .select(col("id"), col("ahash64"), col("phash64"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got(1L) == ((Codecs.aHash64(png), Codecs.pHash64(png))))
    assert(got(2L) == ((None, None)))
  }

  test("fft: Parseval holds, bin power matches the Goertzel filter at " +
    "its exact frequency, and the filterbank localizes planted sines") {
    val sr = 8192
    val n = 4096
    val samples = Array.tabulate(n)(i =>
      (0.5 * math.sin(2 * math.Pi * 440.0 * i / sr) +
        0.25 * math.sin(2 * math.Pi * 3000.0 * i / sr)))
    // Parseval: sum |x|^2 == sum |X|^2 / N
    val re = samples.clone()
    val im = new Array[Double](n)
    Codecs.fft(re, im)
    val tdEnergy = samples.map(x => x * x).sum
    val fdEnergy = (0 until n).map(k => re(k) * re(k) + im(k) * im(k))
      .sum / n
    assert(math.abs(tdEnergy - fdEnergy) < 1e-6 * tdEnergy,
      s"Parseval: $tdEnergy vs $fdEnergy")
    // against Goertzel: bin k power |X_k|^2 / n equals the Goertzel
    // power at f = k*sr/n (same rectangular window, same signal)
    def goertzelPower(f: Double): Double = {
      val w = 2.0 * math.Pi * f / sr
      val coeff = 2.0 * math.cos(w)
      var s1 = 0.0; var s2 = 0.0
      samples.foreach { x =>
        val s0 = x + coeff * s1 - s2
        s2 = s1; s1 = s0
      }
      (s1 * s1 + s2 * s2 - coeff * s1 * s2) / n
    }
    Seq(220, 1500).foreach { k =>
      val fftP = (re(k) * re(k) + im(k) * im(k)) / n
      val gP = goertzelPower(k.toDouble * sr / n)
      assert(math.abs(fftP - gP) < 1e-6 * math.max(1.0, gP),
        s"bin $k: fft $fftP vs goertzel $gP")
    }
    // filterbank over a WAV of the same signal: the two sine bands
    // (440 Hz -> band 0, 3000 Hz -> band 5 of 8 over [0, 4096)) carry
    // the most energy
    val pcm = samples.map(x => (x * 32767).toInt.toShort)
    val wav = pcm16Wav(pcm, sr)
    val frames = Codecs.filterbank(wav, nFft = 512, hop = 256,
      nBands = 8).get
    assert(frames.length == (n - 512) / 256 + 1)
    val mean = (0 until 8).map(b => frames.map(_(b)).sum / frames.length)
    val top2 = mean.zipWithIndex.sortBy(-_._1).take(2).map(_._2).toSet
    assert(top2 == Set(0, 5), s"expected bands {0,5}, got $top2 ($mean)")
    assert(Codecs.filterbank("nope".getBytes).isEmpty)
    // audio shorter than one frame: zero frames, not a crash
    assert(Codecs.filterbank(pcm16Wav(pcm.take(100), sr)).get.isEmpty)
  }

  test("audioFeatureColumn: per-row clip features equal the scalar " +
    "filterbank means; null for non-audio bytes") {
    import spark.implicits._
    val sr = 8192
    val pcm = Array.tabulate(2048)(i =>
      (0.5 * math.sin(2 * math.Pi * 440.0 * i / sr) * 32767).toInt.toShort)
    val wav = pcm16Wav(pcm, sr)
    val df = Seq((1L, wav), (2L, Array[Byte](1, 2)))
      .toDF("id", "media").repartition(2)
    val got = Multimodal.audioFeatureColumn(df, "media")
      .select(col("id"), col("afeat"), col("n_frames"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[Double](1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val frames = Codecs.filterbank(wav).get
    val want = (0 until 8).map(b => frames.map(_(b)).sum / frames.length)
    assert(got(1L)._2.contains(frames.length.toLong))
    got(1L)._1.get.zip(want).foreach { case (g, w) =>
      assert(g == w, s"feature mismatch: $g vs $w")
    }
    assert(got(2L) == ((None, None)))
  }

  test("toneFeatures: a planted sine concentrates Goertzel power on " +
    "the matching probe and the dominant frequency is recovered") {
    val sr = 8000
    val n = 4000
    def sineWav(freq: Double): Array[Byte] = {
      val samples = Array.tabulate(n)(i =>
        (0.6 * math.sin(2 * math.Pi * freq * i / sr) * 32767).toInt.toShort)
      val dataLen = n * 2
      val out = new Array[Byte](44 + dataLen)
      def put16(o: Int, v: Int): Unit = {
        out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      }
      def put32(o: Int, v: Int): Unit = {
        put16(o, v & 0xffff); put16(o + 2, (v >> 16) & 0xffff)
      }
      def tag(o: Int, s: String): Unit =
        s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) =>
          out(o + i) = b
        }
      tag(0, "RIFF"); put32(4, 36 + dataLen); tag(8, "WAVE")
      tag(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, 1)
      put32(24, sr); put32(28, sr * 2); put16(32, 2); put16(34, 16)
      tag(36, "data"); put32(40, dataLen)
      samples.zipWithIndex.foreach { case (s, i) =>
        put16(44 + 2 * i, s & 0xffff)
      }
      out
    }
    val probes = Seq(250.0, 440.0, 1000.0)
    probes.foreach { f =>
      val (powers, dom) = Codecs.toneFeatures(sineWav(f), probes).get
      assert(dom == f, s"dominant probe for a $f Hz tone")
      val sorted = powers.sorted.reverse
      assert(sorted.head > 10 * math.max(sorted(1), 1e-12),
        s"power must concentrate at $f Hz: $powers")
    }
    assert(Codecs.toneFeatures("junk".getBytes, probes).isEmpty)
  }

  test("WAV decode recovers planted format and signal statistics") {
    val wav = makeWav(8000, 256, 8192, 4)
    val info = Codecs.decodeWav(wav).get
    assert(info.sampleRate == 8000)
    assert(info.channels == 1)
    assert(info.nFrames == 256L)
    assert(math.abs(info.rms - 8192.0 / 32768.0) < 1e-12)
    // square wave flips sign every `period`=4 frames: 63 crossings in
    // 255 transitions
    assert(math.abs(info.zeroCrossRate - 63.0 / 255.0) < 1e-12)
    assert(Codecs.decodeWav("not audio".getBytes).isEmpty)
  }

  test("BMP decode recovers planted dimensions and channel means; " +
    "odd width exercises row padding") {
    val (w, h) = (7, 5)
    val bmp = Codecs.encodeBmp(w, h, makeRgb(w, h))
    val info = Codecs.decodeBmp(bmp).get
    assert(info.width == w && info.height == h)
    assert(math.abs(info.meanR - 3.0) < 1e-12) // mean of 0..6
    assert(math.abs(info.meanG - 2.0) < 1e-12) // mean of 0..4
    assert(math.abs(info.meanB - 7.0) < 1e-12)
    assert(Codecs.decodeBmp(makeWav(8000, 8, 100, 2)).isEmpty)
  }

  test("BMP resize is exact nearest-neighbor and round-trips through " +
    "the encoder") {
    val (w, h) = (8, 4)
    val bmp = Codecs.encodeBmp(w, h, makeRgb(w, h))
    val small = Codecs.resizeBmp(bmp, 4, 2).get
    val info = Codecs.decodeBmp(small).get
    assert(info.width == 4 && info.height == 2)
    // nearest-neighbor picks x ∈ {0,2,4,6}, y ∈ {0,2}
    assert(math.abs(info.meanR - 3.0) < 1e-12)
    assert(math.abs(info.meanG - 1.0) < 1e-12)
  }

  test("DataFrame decode/resize columns: real codecs through the " +
    "batched mapPartitions contract, partition-invariant, null for " +
    "undecodable media") {
    import spark.implicits._
    val wav = makeWav(16000, 64, 4096, 8)
    val bmp = Codecs.encodeBmp(6, 6, makeRgb(6, 6))
    val junk = "plain text bytes".getBytes
    val df = Seq((1L, wav), (2L, bmp), (3L, junk)).toDF("id", "media")

    def runWav(d: org.apache.spark.sql.DataFrame) =
      Multimodal.decodeWavColumn(d, "media")
        .select(col("id"), col("wav.sample_rate"), col("wav.rms"))
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getDouble(2)))))
        .toMap
    val got = runWav(df)
    assert(got(1L).exists(v => v._1 == 16000 &&
      math.abs(v._2 - 4096.0 / 32768.0) < 1e-12))
    assert(got(2L).isEmpty && got(3L).isEmpty)
    assert(runWav(df.repartition(3)) == got, "partition-dependent decode")

    val gotBmp = Multimodal.decodeBmpColumn(df, "media")
      .select(col("id"), col("bmp.width"), col("bmp.mean_b"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getDouble(2)))))
      .toMap
    assert(gotBmp(2L).contains((6, 7.0)))
    assert(gotBmp(1L).isEmpty && gotBmp(3L).isEmpty)

    val resized = Multimodal.resizeBmpColumn(df, "media", 3, 3)
      .select(col("id"), col("media_small"), col("media_small_meta.n_bytes"))
      .collect()
      .map(r => r.getLong(0) ->
        Option(r.getAs[Array[Byte]](1)).map(b => (b, r.getLong(2))))
      .toMap
    val small = resized(2L).get
    assert(small._2 == small._1.length.toLong)
    val si = Codecs.decodeBmp(small._1).get
    assert(si.width == 3 && si.height == 3)
    assert(resized(1L).isEmpty && resized(3L).isEmpty)
    // undecodable rows carry a NULL meta struct (same convention as
    // the decode columns), not a fabricated empty one
    val metaNull = Multimodal.resizeBmpColumn(df, "media", 3, 3)
      .select(col("id"), col("media_small_meta").isNull.as("mn"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(metaNull(1L) && metaNull(3L) && !metaNull(2L))
  }

  test("encodeWavMono roundtrips through decodeWav; audioFingerprint " +
    "sets exactly the above-mean-energy frame bits and is 0 on " +
    "constant amplitude (strict threshold)") {
    // roundtrip: header fields and frame count survive the real parser
    val samples = Array.tabulate[Short](320)(t => (t * 100 - 16000).toShort)
    val wav = Codecs.encodeWavMono(8000, samples)
    val info = Codecs.decodeWav(wav).get
    assert(info.sampleRate == 8000 && info.channels == 1 &&
      info.nFrames == 320L)
    // constant |amplitude|: every framesum equals the mean -> no bit
    // may pass the STRICT > threshold
    val flat = Codecs.encodeWavMono(8000,
      Array.fill[Short](160)(1000))
    assert(Codecs.audioFingerprint(flat).contains(0))
    // one loud frame among 16 quiet ones: exactly that bit set.
    // 160 samples -> 10 per frame; frame 5 loud
    val oneLoud = Array.tabulate[Short](160)(t =>
      if (t / 10 == 5) 20000 else 10)
    assert(Codecs.audioFingerprint(Codecs.encodeWavMono(8000, oneLoud))
      .contains(1 << 5))
    // trailing remainder samples (n not divisible by 16) are ignored:
    // a loud REMAINDER tail must not flip any frame bit
    val tailLoud = Array.tabulate[Short](165)(t =>
      if (t >= 160) 30000 else if (t / 10 == 3) 20000 else 10)
    assert(Codecs.audioFingerprint(Codecs.encodeWavMono(8000, tailLoud))
      .contains(1 << 3))
    // non-WAV bytes: None, clip shorter than 16 frames: defined 0
    assert(Codecs.audioFingerprint("not audio".getBytes).isEmpty)
    assert(Codecs.audioFingerprint(
      Codecs.encodeWavMono(8000, Array.fill[Short](8)(5000))).contains(0))
    // Int.MinValue-magnitude sample (-32768) must not overflow the
    // abs fold
    val extreme = Array.fill[Short](160)(-32768)
    assert(Codecs.audioFingerprint(Codecs.encodeWavMono(8000, extreme))
      .contains(0))
  }

  test("audioQualityStats counts silence (|s| <= 16 inclusive), " +
    "clipping (|s| >= 32767, full-scale negative included), peak and " +
    "sum-abs exactly") {
    val samples = Array[Short](0, 16, 17, -16, -17, 32766, 32767,
      -32767, -32768, 100)
    val (n, sil, clip, peak, sa) = Codecs.audioQualityStats(
      Codecs.encodeWavMono(8000, samples)).get
    assert(n == 10L)
    assert(sil == 3L, s"0, 16, -16 are silent; got $sil")   // boundary IN
    assert(clip == 3L, s"32767, -32767, -32768 clip; got $clip")
    assert(peak == 32768L)                                  // abs(-32768)
    assert(sa == 0L + 16 + 17 + 16 + 17 + 32766 + 32767 + 32767 +
      32768 + 100)
    assert(Codecs.audioQualityStats("junk".getBytes).isEmpty)
  }

  // ------------------------------------------------------------ MFCC

  /** The q_multimodal_audiosim fixture formula, replayed
    * independently: tone set from group g, per-doc amp/phase. */
  private def toneClip(id: Long): (Array[Int], Array[Int]) = {
    val melMax = Codecs.hzToMel(4000.0)
    val g = ((id / 20) % 32).toInt
    val bands = Array(g % 4, 4 + (g / 4) % 4, 8 + (g / 16) % 2)
    val freqs = bands.map(b => Codecs.melToHz(melMax * (b + 1) / 15.0))
    val amps = Array.tabulate(3)(j => 3000.0 + 250.0 * ((id + j) % 4))
    val phis = Array.tabulate(3)(j =>
      2.0 * math.Pi * ((7 * id + 3 * j) % 8) / 8.0)
    val n = if (id % 2 == 0) 1024 else 1040
    (bands, Array.tabulate(n) { t =>
      var v = 0.0
      var j = 0
      while (j < 3) {
        v += amps(j) * math.sin(
          2.0 * math.Pi * freqs(j) * t / 8000.0 + phis(j))
        j += 1
      }
      math.max(-32768, math.min(32767, math.round(v).toInt))
    })
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    d / math.sqrt(na * nb)
  }

  test("mfccClip drops c0: a uniform gain change leaves the " +
    "coefficient vector (nearly) unchanged") {
    val (_, s) = toneClip(40L)
    val half = s.map(v => v / 2)
    val (t1, m1) = Codecs.mfccClip(s, 8000).get
    val (t2, m2) = Codecs.mfccClip(half, 8000).get
    assert(t1.toSeq == t2.toSeq, "top bands survive gain change")
    assert(cos(m1, m2) > 0.999, s"gain invariance: ${cos(m1, m2)}")
  }

  test("audiosim margins hold through REAL FLAC and ADPCM round " +
    "trips: top-3 key == planted tone set for every clip, " +
    "within-group MFCC cosine >= 0.85") {
    // every group g (0..31) x its COMPLETE feature-class space: the
    // fixture's features depend on doc_id only through (group,
    // doc_id mod 8) — amp class (mod 4), phase class (mod 8), codec
    // (mod 2) — so 8 members per group cover every distinct vector
    val feats = (0 until 32).flatMap { g =>
      (0 until 8).map { k =>
        val id = 20L * g + k
        val (bands, s) = toneClip(id)
        val decoded =
          if (id % 2 == 0) Flac.decode(Flac.encode(8000, s)).get.samples
          else Adpcm.decode(Adpcm.encode(8000, s)).get.samples
        val (top, mfcc) = Codecs.mfccClip(decoded, 8000).get
        assert(top.toSeq == bands.toSeq.sorted,
          s"id=$id g=$g: top ${top.toSeq} != planted ${bands.toSeq}")
        (g, mfcc)
      }
    }
    val byG = feats.groupBy(_._1)
    var minWithin = 1.0
    byG.values.foreach { ms =>
      for (i <- ms.indices; j <- i + 1 until ms.size)
        minWithin = math.min(minWithin, cos(ms(i)._2, ms(j)._2))
    }
    assert(minWithin >= 0.85, s"min within-group cosine $minWithin")
  }
}
