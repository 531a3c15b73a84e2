package graft.ops

/** Pure-JVM ISO BMFF (MP4) CONTAINER metadata: a big-endian box walk
  * extracting movie duration, per-track handler/codec/dimensions, and
  * the mdat payload size — no frame decode (the JDK ships no H.264/
  * AAC codec; see [[Multimodal.decodeStub]] for where a real codec
  * call would batch). This upgrades video media from "opaque bytes +
  * sha" to metadata-real: duration, dimensions, codec 4cc, and
  * container-level bitrate are exactly the fields a corpus curation
  * pass filters and stratifies on.
  *
  * Box grammar (ISO/IEC 14496-12 §4.2): [u32 size][4cc type], size
  * includes the 8-byte header; size == 1 → u64 largesize follows;
  * size == 0 → box extends to end of file. Containers walked:
  * moov, trak, mdia, minf, stbl. Version-aware mvhd/mdhd/tkhd
  * (v0 u32 / v1 u64 times). Unknown boxes are skipped by size — the
  * walk is total on arbitrary bytes and returns None only when no
  * valid moov/mvhd is found. */
object Mp4 {

  final case class TrackInfo(handler: String, codec: String,
                             width: Int, height: Int,
                             sps: Option[Avc.SpsInfo] = None)

  final case class Mp4Info(timescale: Long, durationTicks: Long,
                           mdatBytes: Long, tracks: List[TrackInfo]) {
    def durationMs: Long =
      if (timescale <= 0) 0L else durationTicks * 1000L / timescale
    /** Container-level bitrate, bits/sec of mdat payload. */
    def bitrateBps: Long =
      if (durationMs <= 0) 0L else mdatBytes * 8L * 1000L / durationMs
  }

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)),
      java.nio.charset.StandardCharsets.ISO_8859_1)

  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** Walk [from, to) emitting (type, payloadFrom, payloadTo); malformed
    * sizes end the walk (never throw, never loop). */
  private def boxes(b: Array[Byte], lo: Long, hi: Long)
      : Iterator[(String, Long, Long)] = new Iterator[(String, Long, Long)] {
    private var o = lo
    def hasNext: Boolean = o + 8 <= hi
    def next(): (String, Long, Long) = {
      val size0 = be32(b, o.toInt)
      val typ = fourcc(b, o.toInt + 4)
      var payload = o + 8
      val end = size0 match {
        case 0 => hi // box extends to end of enclosing scope
        case 1 =>
          if (payload + 8 > hi) hi
          else { val ls = be64(b, payload.toInt); payload += 8; o + ls }
        case s => o + s
      }
      val clipped = math.min(math.max(end, payload), hi)
      val r = (typ, payload, clipped)
      // guarantee forward progress even on a corrupt size field
      o = math.max(clipped, o + 8)
      r
    }
  }

  /** Parse container metadata; None when the bytes hold no moov/mvhd
    * (not an MP4). Tracks appear in file order. */
  def parseMeta(b: Array[Byte]): Option[Mp4Info] = {
    if (b == null || b.length < 16) return None
    var timescale = -1L
    var duration = -1L
    var mdat = 0L
    val tracks = scala.collection.mutable.ListBuffer.empty[TrackInfo]
    // per-trak accumulation
    var tHandler = ""; var tCodec = ""; var tW = 0; var tH = 0
    var tSps: Option[Avc.SpsInfo] = None

    def walk(from: Long, to: Long, depth: Int): Unit = {
      if (depth > 8) return
      boxes(b, from, to).foreach { case (typ, p0, p1) =>
        val p = p0.toInt
        typ match {
          case "mvhd" if p1 - p0 >= 20 =>
            val v = b(p) & 0xff
            // v1 reads end at p+32 (be64 duration), so the guard must
            // be >= 32, not 28 — a truncated v1 payload at the buffer
            // end would AIOOBE out of the walk; 20..31-byte v1
            // payloads are malformed and fall to the v0 read, which
            // is in-bounds at >= 20
            if (v == 1 && p1 - p0 >= 32) {
              timescale = be32(b, p + 20); duration = be64(b, p + 24)
            } else {
              timescale = be32(b, p + 12); duration = be32(b, p + 16)
            }
          case "tkhd" if p1 - p0 >= 84 =>
            val v = b(p) & 0xff
            // width/height are the LAST 8 bytes (16.16 fixed point)
            // after the 36-byte matrix: v0 payload is 84 bytes total
            // → width at +76; v1's 64-bit times add 12 → +88
            val wOff = if (v == 1) p + 88 else p + 76
            if (wOff + 8 <= p1) {
              tW = (be32(b, wOff) >> 16).toInt
              tH = (be32(b, wOff + 4) >> 16).toInt
            }
          case "hdlr" if p1 - p0 >= 12 =>
            tHandler = fourcc(b, p + 8)
          case "stsd" if p1 - p0 >= 16 =>
            // entry_count at +4; first sample entry: u32 size + 4cc
            tCodec = fourcc(b, p + 12)
            // VisualSampleEntry is 8 + 78 bytes (§12.1.3); child boxes
            // (avcC, pasp, …) follow inside the entry — walk them and
            // parse the SPS out of an AVCDecoderConfigurationRecord
            val entryEnd = math.min(p0 + 8 + be32(b, p + 8), p1)
            val kids = p0 + 8 + 8 + 78
            if (kids + 8 <= entryEnd)
              boxes(b, kids, entryEnd).foreach {
                case ("avcC", a0, a1) =>
                  val payload =
                    java.util.Arrays.copyOfRange(b, a0.toInt, a1.toInt)
                  tSps = Avc.spsFromAvcC(payload).flatMap(Avc.parseSps)
                case _ => ()
              }
          case "mdat" =>
            mdat += (p1 - p0)
          case "trak" =>
            tHandler = ""; tCodec = ""; tW = 0; tH = 0; tSps = None
            walk(p0, p1, depth + 1)
            tracks += TrackInfo(tHandler, tCodec, tW, tH, tSps)
          case t if Containers(t) =>
            walk(p0, p1, depth + 1)
          case _ => () // skip by size: ftyp, free, udta, unknown …
        }
      }
    }
    walk(0L, b.length.toLong, 0)
    if (timescale <= 0 || duration < 0) None
    else Some(Mp4Info(timescale, duration, mdat, tracks.toList))
  }

  // ------------------------------------------------------------------
  // Minimal writer — test/oracle fixture synthesis (a real pipeline
  // ingests externally-produced files; the writer exists so specs and
  // the cross-engine oracle can pin the parser against known values).
  // ------------------------------------------------------------------

  private final class Buf {
    private val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Buf = { out.write(v & 0xff); this }
    def u16(v: Int): Buf = { u8(v >> 8); u8(v) }
    def u32(v: Long): Buf = { u16((v >> 16).toInt); u16(v.toInt) }
    def u64(v: Long): Buf = { u32(v >>> 32); u32(v & 0xffffffffL) }
    def cc(s: String): Buf = {
      require(s.length == 4); s.foreach(c => u8(c.toInt)); this
    }
    def raw(b: Array[Byte]): Buf = { out.write(b); this }
    def bytes: Array[Byte] = out.toByteArray
  }

  private def box(typ: String, payload: Array[Byte],
                  largesize: Boolean = false): Array[Byte] = {
    val b = new Buf
    if (largesize) b.u32(1L).cc(typ).u64(16L + payload.length)
    else b.u32(8L + payload.length).cc(typ)
    b.raw(payload).bytes
  }

  /** Minimal valid single-video-track MP4: ftyp + moov(mvhd,
    * trak(tkhd, mdia(mdhd, hdlr, minf(stbl(stsd(codec)))))) + mdat of
    * `mdatBytes` zeros. `largeMdat` writes mdat with a 64-bit
    * largesize header (the >4 GiB form) to exercise that path. */
  def buildMinimal(timescale: Long, durationTicks: Long, width: Int,
                   height: Int, codec: String, handler: String,
                   mdatBytes: Int, largeMdat: Boolean = false,
                   avcC: Option[Array[Byte]] = None): Array[Byte] = {
    val ftyp = box("ftyp", new Buf().cc("isom").u32(512L)
      .cc("isom").cc("iso2").bytes)
    val mvhd = box("mvhd", {
      val b = new Buf().u32(0L) // version 0 + flags
        .u32(0L).u32(0L) // ctime mtime
        .u32(timescale).u32(durationTicks)
        .u32(0x00010000L).u16(0x0100).u16(0) // rate, volume, reserved
      b.u32(0L); b.u32(0L) // reserved
      Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L)
        .foreach(b.u32) // identity matrix
      (1 to 6).foreach(_ => b.u32(0L)) // pre_defined
      b.u32(2L) // next_track_ID
      b.bytes
    })
    val tkhd = box("tkhd", {
      val b = new Buf().u32(7L) // v0, flags: enabled|in-movie|in-preview
        .u32(0L).u32(0L).u32(1L).u32(0L) // times, track_ID, reserved
        .u32(durationTicks)
      b.u32(0L); b.u32(0L) // reserved
      b.u16(0).u16(0).u16(0).u16(0) // layer, altgroup, volume, reserved
      Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L)
        .foreach(b.u32)
      b.u32(width.toLong << 16).u32(height.toLong << 16) // 16.16 fixed
      b.bytes
    })
    val mdhd = box("mdhd", new Buf().u32(0L).u32(0L).u32(0L)
      .u32(timescale).u32(durationTicks)
      .u16(0x55c4).u16(0).bytes) // language 'und', pre_defined
    val hdlr = box("hdlr", new Buf().u32(0L).u32(0L).cc(handler)
      .u32(0L).u32(0L).u32(0L).u8(0).bytes)
    // minimal VisualSampleEntry: 4cc + 78 bytes (§12.1.3), plus an
    // optional avcC child box carrying a real SPS
    val entry = {
      val avccBox = avcC.map(p => box("avcC", p)).getOrElse(Array.emptyByteArray)
      val b = new Buf().u32(86L + avccBox.length).cc(codec)
      (1 to 6).foreach(_ => b.u8(0)); b.u16(1) // reserved, data_ref_idx
      b.u16(0).u16(0); (1 to 3).foreach(_ => b.u32(0L)) // pre/reserved
      b.u16(width).u16(height)
      b.u32(0x00480000L).u32(0x00480000L) // 72 dpi
      b.u32(0L).u16(1) // reserved, frame_count
      (1 to 32).foreach(_ => b.u8(0)) // compressorname
      b.u16(0x0018).u16(0xffff) // depth, pre_defined
      b.raw(avccBox).bytes
    }
    val stsd = box("stsd", new Buf().u32(0L).u32(1L).raw(entry).bytes)
    val stbl = box("stbl", stsd)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    val mdat = box("mdat", new Array[Byte](mdatBytes),
      largesize = largeMdat)
    ftyp ++ moov ++ mdat
  }

  // ------------------------------------------------------------------
  // Sample table (round 10): the piece that turns "container
  // metadata" into "frame access" — stsz/stsc/stco expansion per
  // ISO/IEC 14496-12 §8.7, the input to real frame decode through
  // the [[FrameDecoder]] seam (MJPEG rides this + ImageIO).
  // ------------------------------------------------------------------

  /** Per-sample (absoluteOffset, size) of the FIRST track carrying a
    * complete stsz+stsc+stco/co64 sample table; None when the bytes
    * hold none (metadata-only fixtures, non-MP4). Chunk c (1-based)
    * takes samples-per-chunk from the last stsc entry with
    * first_chunk <= c; samples pack back-to-back inside a chunk.
    * Total on arbitrary bytes — malformed tables yield None, never a
    * throw. */
  def samples(b: Array[Byte]): Option[Vector[(Long, Long)]] = {
    if (b == null || b.length < 16) return None
    var sizes: Array[Long] = null
    var chunkOffs: Array[Long] = null
    var stsc: Array[(Long, Long)] = null // (first_chunk, samples/chunk)
    def walk(from: Long, to: Long, depth: Int): Unit = {
      if (depth > 8) return
      boxes(b, from, to).foreach { case (typ, lo, hi) =>
        typ match {
          case t if Containers(t) => walk(lo, hi, depth + 1)
          case "stsz" if hi - lo >= 12 && sizes == null =>
            val fixed = be32(b, lo.toInt + 4)
            val n = be32(b, lo.toInt + 8).toInt
            if (fixed != 0) sizes = Array.fill(n)(fixed)
            else if (lo + 12 + 4L * n <= hi)
              sizes = Array.tabulate(n)(i => be32(b, lo.toInt + 12 + 4 * i))
          case "stco" if hi - lo >= 8 && chunkOffs == null =>
            val n = be32(b, lo.toInt + 4).toInt
            if (lo + 8 + 4L * n <= hi)
              chunkOffs = Array.tabulate(n)(i => be32(b, lo.toInt + 8 + 4 * i))
          case "co64" if hi - lo >= 8 && chunkOffs == null =>
            val n = be32(b, lo.toInt + 4).toInt
            if (lo + 8 + 8L * n <= hi)
              chunkOffs = Array.tabulate(n)(i => be64(b, lo.toInt + 8 + 8 * i))
          case "stsc" if hi - lo >= 8 && stsc == null =>
            val n = be32(b, lo.toInt + 4).toInt
            if (lo + 8 + 12L * n <= hi)
              stsc = Array.tabulate(n)(i => (be32(b, lo.toInt + 8 + 12 * i),
                be32(b, lo.toInt + 12 + 12 * i)))
          case _ => ()
        }
      }
    }
    try {
      walk(0L, b.length.toLong, 0)
      if (sizes == null || chunkOffs == null || stsc == null ||
          sizes.isEmpty || chunkOffs.isEmpty || stsc.isEmpty) return None
      val out = Vector.newBuilder[(Long, Long)]
      var s = 0
      var sci = 0
      var c = 0
      while (c < chunkOffs.length && s < sizes.length) {
        while (sci + 1 < stsc.length && stsc(sci + 1)._1 <= c + 1) sci += 1
        var off = chunkOffs(c)
        var k = 0L
        while (k < stsc(sci)._2 && s < sizes.length) {
          if (off < 0 || off + sizes(s) > b.length) return None
          out += ((off, sizes(s)))
          off += sizes(s)
          s += 1; k += 1
        }
        c += 1
      }
      val v = out.result()
      if (v.isEmpty) None else Some(v)
    } catch { case _: Exception => None }
  }

  /** Minimal MJPEG MP4: a single video track whose samples are the
    * given JPEG payloads, with a REAL sample table (stts/stsc/stsz/
    * stco) so [[samples]] can address every frame — the honest-codec
    * upgrade path through the [[FrameDecoder]] seam (JPEG is the one
    * video codec the JDK decodes natively). Sample-entry 4cc `jpeg`
    * (12.1.3 visual sample entry), all samples in one chunk,
    * `deltaTicks` per frame. */
  def buildMjpeg(timescale: Long, deltaTicks: Long, width: Int,
                 height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty)
    val durationTicks = deltaTicks * frames.length
    val ftyp = box("ftyp", new Buf().cc("isom").u32(512L)
      .cc("isom").cc("iso2").bytes)
    def moovOf(mdatPayloadOff: Long): Array[Byte] = {
      val mvhd = box("mvhd", {
        val bb = new Buf().u32(0L).u32(0L).u32(0L)
          .u32(timescale).u32(durationTicks)
          .u32(0x00010000L).u16(0x0100).u16(0)
        bb.u32(0L); bb.u32(0L)
        Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L)
          .foreach(bb.u32)
        (1 to 6).foreach(_ => bb.u32(0L))
        bb.u32(2L)
        bb.bytes
      })
      val tkhd = box("tkhd", {
        val bb = new Buf().u32(7L).u32(0L).u32(0L).u32(1L).u32(0L)
          .u32(durationTicks)
        bb.u32(0L); bb.u32(0L)
        bb.u16(0).u16(0).u16(0).u16(0)
        Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L)
          .foreach(bb.u32)
        bb.u32(width.toLong << 16).u32(height.toLong << 16)
        bb.bytes
      })
      val mdhd = box("mdhd", new Buf().u32(0L).u32(0L).u32(0L)
        .u32(timescale).u32(durationTicks).u16(0x55c4).u16(0).bytes)
      val hdlr = box("hdlr", new Buf().u32(0L).u32(0L).cc("vide")
        .u32(0L).u32(0L).u32(0L).u8(0).bytes)
      val entry = {
        val bb = new Buf().u32(86L).cc("jpeg")
        (1 to 6).foreach(_ => bb.u8(0)); bb.u16(1)
        bb.u16(0).u16(0); (1 to 3).foreach(_ => bb.u32(0L))
        bb.u16(width).u16(height)
        bb.u32(0x00480000L).u32(0x00480000L)
        bb.u32(0L).u16(1)
        (1 to 32).foreach(_ => bb.u8(0))
        bb.u16(0x0018).u16(0xffff)
        bb.bytes
      }
      val stsd = box("stsd", new Buf().u32(0L).u32(1L).raw(entry).bytes)
      val stts = box("stts", new Buf().u32(0L).u32(1L)
        .u32(frames.length.toLong).u32(deltaTicks).bytes)
      val stsc = box("stsc", new Buf().u32(0L).u32(1L)
        .u32(1L).u32(frames.length.toLong).u32(1L).bytes)
      val stsz = box("stsz", {
        val bb = new Buf().u32(0L).u32(0L).u32(frames.length.toLong)
        frames.foreach(f => bb.u32(f.length.toLong))
        bb.bytes
      })
      val stco = box("stco",
        new Buf().u32(0L).u32(1L).u32(mdatPayloadOff).bytes)
      val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      val trak = box("trak", tkhd ++ mdia)
      box("moov", mvhd ++ trak)
    }
    // stco needs the absolute mdat payload offset, which depends on
    // moov's size but not its contents — two passes converge exactly
    // (the offset field is fixed-width u32)
    val moovLen = moovOf(0L).length
    val moov = moovOf(ftyp.length.toLong + moovLen + 8L)
    val mdat = box("mdat", frames.toArray.flatten)
    ftyp ++ moov ++ mdat
  }
}
