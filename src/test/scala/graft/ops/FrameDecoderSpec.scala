package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The pluggable frame-decoder seam: stub arithmetic is stable,
  * registration routes by codec id without touching the column
  * contract, batches respect blockSize, and undecodable payloads
  * surface as nulls instead of killing the task. */
class FrameDecoderSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def media(n: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => (i.toLong,
      Array.tabulate[Byte](16 + i)(j => ((i * 7 + j) % 251).toByte)))
      .toDF("id", "media")
  }

  /** The documented stub arithmetic, computed independently. */
  private def stubFeats(bytes: Array[Byte], featDim: Int): Seq[Double] =
    (0 until featDim).map { f =>
      var acc = (f + 1).toLong
      var i = f
      while (i < bytes.length) {
        acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L
        i += featDim
      }
      acc.toDouble / 1000000007.0
    }

  test("decodeStub == documented rolling-hash arithmetic (the seam " +
    "refactor must not move any pinned feature value)") {
    val df = media(10)
    val got = Multimodal.decodeStub(df, "media", featDim = 4)
      .select("id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val raw = df.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    raw.foreach { case (id, bytes) =>
      assert(got(id) == stubFeats(bytes, 4), s"id=$id")
    }
  }

  import FrameDecoderSpec.{ConstDecoder, FragileDecoder}

  test("registration routes by codec id; unregistered codecs fall " +
    "back to the stub; blockSize bounds each decoder batch") {
    FrameDecoder.register(new ConstDecoder(Set("fake264"), 100.0))
    try {
      val df = media(8)
      val real = Multimodal.decodeColumn(df, "media", "fake264",
          featDim = 2, blockSize = 3)
        .select("id", "features").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      // 16+id bytes per row -> the fake decoder saw the payload
      assert(real(0L) == Seq(116.0, 116.0), s"${real(0L)}")
      assert(real(7L) == Seq(123.0, 123.0), s"${real(7L)}")
      // a codec nobody registered still runs — stub features
      val stub = Multimodal.decodeColumn(df, "media", "mp3", featDim = 2)
        .select("id", "features").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val raw = df.collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
      assert(stub(3L) == stubFeats(raw(3L), 2))
    } finally FrameDecoder.unregister("fake264")
  }

  test("MJPEG is a BUILT-IN real decoder: codec 'jpeg' routes to it " +
    "out of the box, frames decode to pattern-predicted aHashes, and " +
    "unregistering falls back to the stub (the round-9 seam promise)") {
    val s = spark
    import s.implicits._
    // frame f of row r: first k blocks white -> aHash = 2^k - 1
    val ks = Seq((1L, 9, 20, 33), (2L, 39, 8, 12))
    val df = Multimodal.mjpegPatternColumn(
      ks.toDF("id", "k0", "k1", "k2"), Seq("k0", "k1", "k2"))
    val got = Multimodal.decodeColumn(df, "media", "jpeg", featDim = 4)
      .select("id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    ks.foreach { case (id, k0, k1, k2) =>
      val want = Seq(k0, k1, k2).map(k => ((1L << k) - 1).toDouble) :+
        -1.0 // featDim 4 > 3 frames: sentinel slot
      assert(got(id) == want, s"id=$id got=${got(id)}")
    }
    // the seam still routes: unregister -> stub arithmetic on the
    // SAME bytes; re-register -> real frames again
    val raw = df.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("media")).toMap
    FrameDecoder.unregister("jpeg")
    try {
      val stubbed = Multimodal.decodeColumn(df, "media", "jpeg",
          featDim = 4)
        .select("id", "features").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(stubbed(1L) == stubFeats(raw(1L), 4))
    } finally FrameDecoder.register(FrameDecoder.Mjpeg)
    val back = Multimodal.decodeColumn(df, "media", "jpeg", featDim = 1)
      .select("id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(back(2L) == Seq(((1L << 39) - 1).toDouble))
  }

  test("GIF is a BUILT-IN real decoder: codec 'gif' routes to it out " +
    "of the box, animated frames decode to pattern-predicted aHashes " +
    "through the JDK LZW path, and the registry is now 3 codecs deep") {
    val s = spark
    import s.implicits._
    val ks = Seq((1L, 9, 20, 33), (2L, 39, 8, 12))
    val df = Multimodal.gifPatternColumn(
      ks.toDF("id", "k0", "k1", "k2"), Seq("k0", "k1", "k2"))
    val got = Multimodal.decodeColumn(df, "media", "gif", featDim = 4)
      .select("id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    ks.foreach { case (id, k0, k1, k2) =>
      val want = Seq(k0, k1, k2).map(k => ((1L << k) - 1).toDouble) :+
        -1.0 // featDim 4 > 3 frames: sentinel slot
      assert(got(id) == want, s"id=$id got=${got(id)}")
    }
    // all three built-ins resolve to distinct real decoders
    assert(FrameDecoder.forCodec("gif") eq FrameDecoder.GifFrames)
    assert(FrameDecoder.forCodec("jpeg") eq FrameDecoder.Mjpeg)
    assert(FrameDecoder.forCodec("avi") eq FrameDecoder.AviFrames)
    // non-GIF bytes and a mid-stream truncation both land null
    val raw = df.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("media")).toMap
    val truncated = java.util.Arrays.copyOf(raw(1L), raw(1L).length / 2)
    val out = FrameDecoder.GifFrames.decodeBatch(
      Array(Array[Byte](1, 2, 3), truncated), 3)
    assert(out(0) == null)
    assert(out(1) == null, "truncated GIF must be all-or-nothing null")
    // out-of-range frames are never decoded: featDim 2 reads only
    // the first 2 of 3 frames, hashes still formula-exact
    val two = FrameDecoder.GifFrames.decodeBatch(Array(raw(2L)), 2)
    assert(two(0).toSeq ==
      Seq(((1L << 39) - 1).toDouble, ((1L << 8) - 1).toDouble))
  }

  test("a corrupt MID-CLIP frame nulls the whole payload instead of " +
    "leaving the -1.0 absent-frame sentinel in its slot (distinct " +
    "corrupt clips must not hash-equal in clip signatures)") {
    def jpeg(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(shade, shade, shade))
      g.fillRect(0, 0, 8, 8); g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    val garbage = Array.tabulate[Byte](64)(i => (i * 13 + 7).toByte)
    val good = Mp4.buildMjpeg(90000L, 3000L, 8, 8,
      Seq(jpeg(255), jpeg(0)))
    val corrupt = Mp4.buildMjpeg(90000L, 3000L, 8, 8,
      Seq(jpeg(255), garbage, jpeg(0)))
    val out = FrameDecoder.Mjpeg.decodeBatch(Array(good, corrupt), 4)
    // control: decodes, with the absent-frame sentinel past frame 2
    assert(out(0) != null && out(0)(3) == -1.0)
    // corrupt mid-frame: whole payload null, never a -1.0 slot
    assert(out(1) == null)
  }

  test("Mp4.samples expands stsz/stsc/stco exactly (round-trips the " +
    "MJPEG writer) and is None on metadata-only or non-MP4 bytes") {
    val frames = Seq(Array.tabulate[Byte](100)(_.toByte),
      Array.tabulate[Byte](57)(i => (i * 3).toByte),
      Array.tabulate[Byte](212)(i => (i * 7).toByte))
    val b = Mp4.buildMjpeg(90000L, 3000L, 64, 64, frames)
    val ss = Mp4.samples(b).get
    assert(ss.map(_._2) == Vector(100L, 57L, 212L))
    ss.zip(frames).foreach { case ((off, len), f) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(b, off.toInt, (off + len).toInt), f))
    }
    // offsets are contiguous within the single chunk
    assert(ss(1)._1 == ss(0)._1 + 100 && ss(2)._1 == ss(1)._1 + 57)
    // the metadata parser agrees the track is a 'jpeg' video track
    val meta = Mp4.parseMeta(b).get
    assert(meta.tracks.exists(t => t.codec == "jpeg"))
    // no sample table -> None; garbage -> None
    assert(Mp4.samples(Mp4.buildMinimal(1000, 5000, 64, 48, "avc1",
      "vide", 100)).isEmpty)
    assert(Mp4.samples(Array.tabulate[Byte](64)(_.toByte)).isEmpty)
    assert(Mp4.samples(null).isEmpty)
  }

  test("undecodable payload (decoder returns null) lands as a null " +
    "features entry, not a task failure") {
    val s = spark
    import s.implicits._
    FrameDecoder.register(new FragileDecoder)
    try {
      val df = Seq((1L, Array[Byte](1, 2)), (2L, Array[Byte](1, 2, 3)))
        .toDF("id", "media")
      val got = Multimodal.decodeColumn(df, "media", "fragile",
          featDim = 1, blockSize = 2)
        .select("id", "features").collect()
        .map(r => r.getLong(0) -> Option(r.getSeq[Double](1))).toMap
      assert(got(1L).isEmpty, s"${got(1L)}")
      assert(got(2L).contains(Seq(1.0)), s"${got(2L)}")
    } finally FrameDecoder.unregister("fragile")
  }
}

/** Top-level fakes: a decoder instance is closed over by executor
  * code, so it must not capture the (non-serializable) suite. */
object FrameDecoderSpec {
  class ConstDecoder(ids: Set[String], v: Double) extends FrameDecoder {
    override def codecs: Set[String] = ids
    override def decodeBatch(payloads: Array[Array[Byte]],
                             featDim: Int): Array[Array[Double]] = {
      assert(payloads.length <= 3, s"batch ${payloads.length} > blockSize")
      payloads.map(p => if (p == null) null
        else Array.fill(featDim)(v + p.length))
    }
  }

  class FragileDecoder extends FrameDecoder {
    override def codecs: Set[String] = Set("fragile")
    override def decodeBatch(p: Array[Array[Byte]],
                             d: Int): Array[Array[Double]] =
      p.map(b => if (b.length % 2 == 0) null else Array.fill(d)(1.0))
  }
}
