package graft.ops

/** Pluggable frame/sample decoder seam for the compressed-codec gap.
  *
  * The environment ships no MPEG-audio or H.264 codec, so MP3/AVC
  * FRAME decode is honestly stubbed ([[Multimodal.decodeStub]]) while
  * container metadata is real ([[Mp3]]/[[Mp4]]/[[Avc]]/[[Flac]]).
  * This trait is the seam that upgrade slots into WITHOUT touching
  * the column contract: a JNI/FFmpeg-backed implementation registers
  * for its codec ids and [[Multimodal.decodeColumn]] routes to it;
  * everything else about the pipeline — schema, partition-local
  * batching, feature dimensionality, null contract — is fixed here,
  * so swapping the decoder cannot change the plan shape.
  *
  * Implementations MUST be Serializable (the instance resolved at
  * plan-build time on the driver is closed over by the executor-side
  * batch map) and deterministic per byte payload (results feed
  * checksum-pinned queries). */
trait FrameDecoder extends Serializable {

  /** Lower-case codec ids this decoder claims (e.g. "mp3", "avc"). */
  def codecs: Set[String]

  /** Decode one partition-local batch: one feature vector of length
    * `featDim` per payload, positionally aligned; null entry for an
    * undecodable payload (never throw — a corrupt row must not kill
    * the task). Called once per `blockSize` batch on the executor —
    * the amortization point for a native/JNI call. */
  def decodeBatch(payloads: Array[Array[Byte]],
                  featDim: Int): Array[Array[Double]]
}

object FrameDecoder {

  /** The honest default: deterministic length-salted rolling-hash
    * features from the bytes themselves — the SAME arithmetic
    * [[Multimodal.decodeStub]] has always produced, so registering a
    * real decoder (and only that) changes feature VALUES while
    * keeping every query's shape and determinism contract. */
  object Stub extends FrameDecoder {
    override def codecs: Set[String] = Set.empty
    override def decodeBatch(payloads: Array[Array[Byte]],
                             featDim: Int): Array[Array[Double]] =
      payloads.map { bytes =>
        if (bytes == null) null
        else {
          val feats = new Array[Double](featDim)
          var f = 0
          while (f < featDim) {
            var acc = (f + 1).toLong
            var i = f
            while (i < bytes.length) {
              acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L
              i += featDim
            }
            feats(f) = acc.toDouble / 1000000007.0
            f += 1
          }
          feats
        }
      }
  }

  /** REAL frame decode for the one video codec the JDK carries a
    * native decoder for: MJPEG in MP4 (sample-entry 4cc `jpeg` —
    * JPEG-per-frame). [[Mp4.samples]] expands the stsz/stsc/stco
    * sample table, each sample decodes through the same ImageIO path
    * the still-image ops use, and frame j's feature slot carries its
    * perceptual [[Codecs.aHash64]] folded to the repo's 40-bit digest
    * convention (exactly representable in the Double slot; downstream
    * dedup compares by equality, where 40 bits keep collision odds
    * negligible). Slots past the last frame read -1.0 — that sentinel
    * means exactly "clip shorter than featDim frames". A payload with
    * no sample table, no decodable frame, or ANY in-range frame that
    * fails JPEG decode is null per the [[FrameDecoder]] contract
    * (all-frames-or-nothing): leaving -1.0 in a failed mid-clip slot
    * would make distinct corrupt clips hash-equal in downstream clip
    * signatures (q_multimodal_videodedup folds every slot) instead of
    * surfacing the decode failure. MP3/H.264 stay stubbed — this is
    * the honest-codec upgrade, not a fake one. */
  object Mjpeg extends FrameDecoder {
    private val Fold = (1L << 40) - 1
    override def codecs: Set[String] = Set("jpeg", "mjpeg")
    override def decodeBatch(payloads: Array[Array[Byte]],
                             featDim: Int): Array[Array[Double]] =
      payloads.map { bytes =>
        try {
          Mp4.samples(bytes) match {
            case None => null
            case Some(ss) =>
              val feats = Array.fill(featDim)(-1.0)
              var any = false
              var failed = false
              var j = 0
              while (j < featDim && j < ss.length && !failed) {
                val (off, len) = ss(j)
                val frame = java.util.Arrays.copyOfRange(bytes,
                  off.toInt, (off + len).toInt)
                Codecs.aHash64(frame) match {
                  case Some(h) => feats(j) = (h & Fold).toDouble; any = true
                  case None    => failed = true
                }
                j += 1
              }
              if (any && !failed) feats else null
          }
        } catch { case _: Exception => null }
      }
  }

  /** REAL frame decode for the AVI container's JVM-decodable codecs:
    * uncompressed DIB ('00db', BI_RGB) and Microsoft RLE8 ('00dc',
    * BI_RLE8 — [[Avi]] header). Each movi frame chunk re-wraps as a
    * standalone BMP ([[Avi.frameToBmp]]) so ImageIO's BMP reader
    * performs the pixel decode — including the RLE8 run/escape state
    * machine — and frame j's slot carries its [[Codecs.aHash64]]
    * folded to the 40-bit digest convention, exactly the [[Mjpeg]]
    * contract: -1.0 only for "clip shorter than featDim frames",
    * null for no-parse / no-frames / ANY in-range frame that fails
    * decode (all-frames-or-nothing). */
  object AviFrames extends FrameDecoder {
    private val Fold = (1L << 40) - 1
    override def codecs: Set[String] = Set("avi", "dib", "mrle")
    override def decodeBatch(payloads: Array[Array[Byte]],
                             featDim: Int): Array[Array[Double]] =
      payloads.map { bytes =>
        try {
          (Avi.parseMeta(bytes), Avi.frames(bytes)) match {
            case (Some(info), Some(fs)) =>
              val feats = Array.fill(featDim)(-1.0)
              var any = false
              var failed = false
              var j = 0
              while (j < featDim && j < fs.length && !failed) {
                val (off, len) = fs(j)
                val frame = java.util.Arrays.copyOfRange(bytes,
                  off, off + len)
                // strict per-codec frame validation BEFORE the pixel
                // decode: ImageIO's BMP reader is lenient (a truncated
                // RLE8 stream silently fills the rest with palette 0),
                // which would let a corrupt frame masquerade as black —
                // the contract is null for the whole clip instead
                val valid = info.compression match {
                  case 0L => frame.length ==
                    Avi.dibRasterSize(info.width, info.height, info.bpp)
                  case 1L => Avi.rle8Valid(frame, info.width, info.height)
                  case _  => true // unknown codec: let ImageIO judge
                }
                if (!valid) failed = true
                else Codecs.aHash64(Avi.frameToBmp(info, frame)) match {
                  case Some(h) => feats(j) = (h & Fold).toDouble; any = true
                  case None    => failed = true
                }
                j += 1
              }
              if (any && !failed) feats else null
            case _ => null
          }
        } catch { case _: Exception => null }
      }
  }

  /** REAL frame decode for animated GIF — the JDK's ImageIO carries
    * a native GIF (LZW) decoder, and [[Gif.readFrames]] walks the
    * image descriptors in storage order. Frame j's slot carries its
    * [[Codecs.aHash64Of]] folded to the 40-bit digest convention,
    * exactly the [[Mjpeg]]/[[AviFrames]] contract: -1.0 only for
    * "clip shorter than featDim frames", null for not-a-GIF /
    * zero frames / ANY in-range frame that fails decode
    * (all-frames-or-nothing; [[Gif.readFrames]] throws on an
    * in-range decode failure and never touches out-of-range
    * frames). */
  object GifFrames extends FrameDecoder {
    private val Fold = (1L << 40) - 1
    override def codecs: Set[String] = Set("gif")
    override def decodeBatch(payloads: Array[Array[Byte]],
                             featDim: Int): Array[Array[Double]] =
      payloads.map { bytes =>
        try {
          Gif.readFrames(bytes, featDim) match {
            case Some((n, fs)) if n > 0 && fs.nonEmpty =>
              val feats = Array.fill(featDim)(-1.0)
              var j = 0
              while (j < featDim && j < fs.length) {
                feats(j) = (Codecs.aHash64Of(fs(j)) & Fold).toDouble
                j += 1
              }
              feats
            case _ => null
          }
        } catch { case _: Exception => null }
      }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, FrameDecoder]()

  /** Register `d` for every codec it claims (last registration wins —
    * the upgrade path is "register the FFmpeg decoder at session
    * startup"). Driver-side: resolution happens at plan build. */
  def register(d: FrameDecoder): Unit =
    d.codecs.foreach(c => registry.put(c.toLowerCase, d))

  /** Remove a registration (test isolation / decoder unload). */
  def unregister(codec: String): Unit = registry.remove(codec.toLowerCase)

  /** The decoder for `codec`, falling back to [[Stub]] — total, so a
    * pipeline over a codec nobody registered still runs end to end
    * with deterministic fake features. */
  def forCodec(codec: String): FrameDecoder =
    registry.getOrDefault(codec.toLowerCase, Stub)

  // built-in registrations: JDK-only decoders ship enabled (the seam
  // stays open — a later registration for the same codec wins)
  register(Mjpeg)
  register(AviFrames)
  register(GifFrames)
}
