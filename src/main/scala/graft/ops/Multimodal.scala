package graft.ops

import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` media + typed metadata,
  * with decode/feature-extraction as partition-local batch transforms.
  *
  * Codec-less containers decode FOR REAL in pure JVM ([[Codecs]]:
  * RIFF/WAVE PCM16 audio and uncompressed 24-bpp BMP images —
  * [[decodeWavColumn]] / [[decodeBmpColumn]] / [[resizeBmpColumn]]).
  * Compressed IMAGES also decode for real, through the JDK's own
  * ImageIO readers (JPEG/PNG/GIF — `java.desktop` ships those codecs;
  * [[decodeImageColumn]]). Only compressed AUDIO/VIDEO (MP3/H.264)
  * remains STUBBED behind [[decodeStub]] (the JDK genuinely carries
  * no such codec), clearly marked, producing deterministic fake
  * features so those pipelines stay end-to-end testable. At 100 TB the shape is the
  * right one either way: media bytes never leave their partition,
  * decode is a batched mapPartitions (exactly where a JNI/FFmpeg
  * batch call would sit), and metadata-only queries never touch the
  * bytes column thanks to Parquet column pruning.
  */
object Multimodal {

  /** Partition-local batched Row transform that stays INSIDE the
    * Dataset plan: `Dataset.mapPartitions` with an explicit Row
    * encoder, NOT `df.rdd` — so every codec column below works on a
    * STREAMING DataFrame too (stateless map, watermark-preserving;
    * `df.rdd` would throw on a stream). The `grouped(blockSize)`
    * batching marks exactly where a JNI/FFmpeg batch call would sit. */
  private def mapBatched(df: DataFrame, outSchema: StructType)(
      f: Iterator[Row] => Iterator[Row]): DataFrame =
    df.mapPartitions(f)(org.apache.spark.sql.Encoders.row(outSchema))

  /** Shared scaffold for every bytes -> nullable-struct metadata
    * column: appends `outCol` of type `tpe` computed by `parse` over
    * the media bytes, in the batched partition-local shape. One home
    * for the batching/encoder/null conventions — six decoders ride
    * it, so a change to the shape cannot drift per copy. */
  private def parsedColumn(df: DataFrame, mediaCol: String,
                           outCol: String, tpe: StructType,
                           blockSize: Int)(
      parse: Array[Byte] => Row): DataFrame = {
    val schema = df.schema.add(outCol, tpe)
    val idx = df.schema.fieldIndex(mediaCol)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        rows.iterator.map(row =>
          Row.fromSeq(row.toSeq :+ parse(row.getAs[Array[Byte]](idx))))
      }
    }
  }

  val WavInfoType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("zcr", DoubleType, nullable = false)))

  val BmpInfoType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  /** REAL audio decode (PCM16 WAV): appends a [[WavInfoType]] struct
    * (null for non-WAV bytes). Partition-local batched mapPartitions;
    * bytes never shuffle. */
  def decodeWavColumn(df: DataFrame, mediaCol: String,
                      outCol: String = "wav",
                      blockSize: Int = 1024): DataFrame =
    parsedColumn(df, mediaCol, outCol, WavInfoType, blockSize)(b =>
      Codecs.decodeWav(b).map(info =>
        Row(info.sampleRate, info.channels, info.nFrames,
          info.rms, info.zeroCrossRate)).orNull)

  /** REAL image decode (24-bpp BMP): appends a [[BmpInfoType]] struct
    * (null for non-BMP bytes). */
  def decodeBmpColumn(df: DataFrame, mediaCol: String,
                      outCol: String = "bmp",
                      blockSize: Int = 1024): DataFrame =
    parsedColumn(df, mediaCol, outCol, BmpInfoType, blockSize)(b =>
      Codecs.decodeBmp(b).map(info =>
        Row(info.width, info.height, info.meanR, info.meanG,
          info.meanB)).orNull)

  /** REAL compressed-image decode (JPEG/PNG/GIF via the JDK's own
    * ImageIO readers): appends a [[BmpInfoType]] struct (null for
    * bytes no installed reader accepts). Same partition-local batched
    * shape as [[decodeBmpColumn]]. */
  def decodeImageColumn(df: DataFrame, mediaCol: String,
                        outCol: String = "img",
                        blockSize: Int = 1024): DataFrame =
    parsedColumn(df, mediaCol, outCol, BmpInfoType, blockSize)(b =>
      Codecs.decodeImage(b).map(info =>
        Row(info.width, info.height, info.meanR, info.meanG,
          info.meanB)).orNull)

  /** Deterministic 24-bpp BMP test-pattern builder — the in-plan image
    * synthesizer for oracle queries (the q_multimodal_mp4 discipline:
    * bytes are BUILT from row parameters, decoded by the REAL parser,
    * and the oracle recomputes the aggregate from the same formulas).
    * Pixel (x, y) of a (w, h, seed) pattern:
    *   r = (seed·31 + x·7 + y·13) mod 256
    *   g = (seed·17 + x·11 + y·5) mod 256
    *   b = (seed·23 + x·3 + y·19) mod 256
    * Batched partition-local map; bytes never shuffle. */
  def bmpPatternColumn(df: DataFrame, wCol: String, hCol: String,
                       seedCol: String,
                       outCol: String = "media"): DataFrame = {
    val schema = df.schema
      .add(outCol, org.apache.spark.sql.types.BinaryType)
    val wi = df.schema.fieldIndex(wCol)
    val hi = df.schema.fieldIndex(hCol)
    val si = df.schema.fieldIndex(seedCol)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val w = row.getInt(wi)
        val h = row.getInt(hi)
        val seed = row.getInt(si)
        val rgb = new Array[Byte](3 * w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val i = 3 * (y * w + x)
            rgb(i) = ((seed * 31 + x * 7 + y * 13) % 256).toByte
            rgb(i + 1) = ((seed * 17 + x * 11 + y * 5) % 256).toByte
            rgb(i + 2) = ((seed * 23 + x * 3 + y * 19) % 256).toByte
            x += 1
          }
          y += 1
        }
        Row.fromSeq(row.toSeq :+ Codecs.encodeBmp(w, h, rgb))
      }
    }
  }

  /** Deterministic MJPEG MP4 test-clip builder — the VIDEO member of
    * the pattern-builder family ([[bmpPatternColumn]] discipline:
    * bytes BUILT from row parameters, decoded by the REAL codec
    * path, oracle recomputes from the formulas). Frame f of a row is
    * a 64×64 block pattern: the first k_f of the 64 8×8 blocks
    * (row-major) are white, the rest black — encoded as a REAL JPEG
    * ([[Codecs.encodeJpeg]], quality 1.0) and wrapped in a REAL MP4
    * sample table ([[Mp4.buildMjpeg]]). Because the 8×8 pattern
    * blocks align with JPEG's DCT blocks and the image is grayscale,
    * each block round-trips within a few code values, leaving the
    * per-frame aHash bit pattern (bits 0..k−1 set, i.e. 2^k − 1)
    * predictable from k alone with ~95-gray-level margins — that
    * formula is what the cross-engine oracle pins against the real
    * decode. Requires 0 < k < 64. Batched partition-local map; bytes
    * never shuffle. */
  def mjpegPatternColumn(df: DataFrame, kCols: Seq[String],
                         outCol: String = "media"): DataFrame = {
    val schema = df.schema
      .add(outCol, org.apache.spark.sql.types.BinaryType)
    val kIdx = kCols.map(df.schema.fieldIndex)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val frames = kIdx.map { ki =>
          val k = row.getInt(ki)
          val rgb = new Array[Byte](3 * 64 * 64)
          var y = 0
          while (y < 64) {
            var x = 0
            while (x < 64) {
              val block = (y / 8) * 8 + (x / 8)
              val v: Byte = if (block < k) -1 /* 0xff */ else 0
              val i = 3 * (y * 64 + x)
              rgb(i) = v; rgb(i + 1) = v; rgb(i + 2) = v
              x += 1
            }
            y += 1
          }
          Codecs.encodeJpeg(64, 64, rgb)
        }
        Row.fromSeq(row.toSeq :+
          Mp4.buildMjpeg(90000L, 3000L, 64, 64, frames))
      }
    }
  }

  val AviMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("us_per_frame", LongType),
    StructField("n_frames", LongType),
    StructField("codec", StringType),
    StructField("bpp", IntegerType),
    StructField("duration_ms", LongType)))

  /** AVI container metadata ([[Avi.parseMeta]]) as a typed struct
    * column; null for non-AVI bytes. */
  def aviMetaColumn(df: DataFrame, mediaCol: String,
                    outCol: String = "avi",
                    blockSize: Int = 1024): DataFrame =
    parsedColumn(df, mediaCol, outCol, AviMetaType, blockSize)(b =>
      Avi.parseMeta(b).map { m =>
        Row(m.width, m.height, m.usPerFrame, m.nFrames, m.codec,
          m.bpp, m.durationMs)
      }.orNull)

  /** Synthesize a minimal AVI per row from parameter columns (frame
    * payloads are tiny opaque stubs — this is the fixture side of
    * [[aviMetaColumn]]'s container round-trip; REAL frames come from
    * [[aviPatternColumn]]). rleCol ≠ 0 selects BI_RLE8/'mrle'. */
  def aviBuildColumn(df: DataFrame, wCol: String, hCol: String,
                     usCol: String, nFramesCol: String, rleCol: String,
                     outCol: String = "media"): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val is = Seq(wCol, hCol, usCol, nFramesCol, rleCol)
      .map(df.schema.fieldIndex)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val n = row.getInt(is(3))
        val frames = (0 until n).map(j => Array[Byte](j.toByte, 0, 0, 1))
        Row.fromSeq(row.toSeq :+ Avi.buildAvi(row.getInt(is(0)),
          row.getInt(is(1)), row.getLong(is(2)), frames,
          if (row.getInt(is(4)) != 0) 1 else 0))
      }
    }
  }

  /** Deterministic AVI test-clip builder — [[mjpegPatternColumn]]'s
    * RIFF sibling for the round-11 honest-codec widening. Frame f of
    * a row is a 32×32 block pattern (first k_f of the 64 4×4-px
    * blocks white, rest black) carried as EITHER a raw 24-bpp DIB
    * frame (rle = 0, [[Avi.encodeDib24]]) or a Microsoft RLE8 frame
    * (rle = 1, [[Avi.encodeRle8]] + gray palette) inside a REAL AVI
    * container ([[Avi.buildAvi]]). Both encodings decode to the SAME
    * pixels, so per-frame aHash = 2^k − 1 independent of codec — the
    * formula the cross-engine oracle pins, with the codec axis
    * proving the RLE8 state machine against the raw path. Requires
    * 0 < k < 64. Batched partition-local map; bytes never shuffle. */
  def aviPatternColumn(df: DataFrame, kCols: Seq[String], rleCol: String,
                       outCol: String = "media"): DataFrame = {
    val schema = df.schema
      .add(outCol, org.apache.spark.sql.types.BinaryType)
    val kIdx = kCols.map(df.schema.fieldIndex)
    val rleIdx = df.schema.fieldIndex(rleCol)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val rle = row.getInt(rleIdx) != 0
        val frames = kIdx.map { ki =>
          val k = row.getInt(ki)
          val gray = new Array[Byte](32 * 32)
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              val block = (y / 4) * 8 + (x / 4)
              gray(y * 32 + x) = if (block < k) -1 /* 0xff */ else 0
              x += 1
            }
            y += 1
          }
          if (rle) Avi.encodeRle8(32, 32, gray)
          else Avi.encodeDib24(32, 32, gray)
        }
        Row.fromSeq(row.toSeq :+
          Avi.buildAvi(32, 32, 40000L, frames, if (rle) 1 else 0))
      }
    }
  }

  /** Deterministic animated-GIF test-clip builder —
    * [[mjpegPatternColumn]]'s GIF89a sibling for the round-12
    * honest-codec widening. Frame f of a row is the same 32×32
    * block pattern as [[aviPatternColumn]] (first k_f of the 64
    * 4×4-px blocks white, rest black), encoded through the JDK GIF
    * writer's REAL LZW path ([[Gif.encodeAnimated]]). Black/white
    * survives palettization exactly, so per-frame aHash = 2^k − 1 —
    * the formula the cross-engine oracle pins against the real
    * decode. Requires 0 < k < 64. Batched partition-local map;
    * bytes never shuffle. */
  def gifPatternColumn(df: DataFrame, kCols: Seq[String],
                       outCol: String = "media"): DataFrame = {
    val schema = df.schema
      .add(outCol, org.apache.spark.sql.types.BinaryType)
    val kIdx = kCols.map(df.schema.fieldIndex)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val frames = kIdx.map { ki =>
          val k = row.getInt(ki)
          val gray = new Array[Byte](32 * 32)
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              val block = (y / 4) * 8 + (x / 4)
              gray(y * 32 + x) = if (block < k) -1 /* 0xff */ else 0
              x += 1
            }
            y += 1
          }
          gray
        }
        Row.fromSeq(row.toSeq :+ Gif.encodeAnimated(32, 32, frames))
      }
    }
  }

  /** Spread a NARROW parameter frame across the session's shuffle
    * parallelism before per-row codec work IF the scan arrived
    * under-partitioned — a single small parquet split otherwise
    * serializes an entire pattern-build + decode chain onto one
    * core (measured 3.3× on the GIF metadata fixture at sf0.1).
    * When the input already carries ≥ the session parallelism this
    * is the IDENTITY — no shuffle is added at corpus scale, where
    * scans arrive many-partitioned. Only the parameter columns ride
    * the exchange; media bytes are built AFTER it, so the
    * bytes-never-shuffle invariant is untouched. Use it only where
    * the per-row codec work dominates the exchange (the ≥1s
    * fixtures: pattern JPEG/BMP/GIF build + decode chains) —
    * sub-second byte-assembler fixtures (mp3/mp4/avi headers, WAV
    * tones) measured ~0.1s SLOWER with the added exchange and keep
    * the direct path. */
  def spreadParams(df: DataFrame, keyCol: String): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, col(keyCol))
  }

  val GifMetaType: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("n_gce", IntegerType),
    StructField("duration_ms", LongType),
    StructField("loop", IntegerType)))

  /** GIF container metadata ([[Gif.parseMeta]]) as a typed struct
    * column; null for non-GIF bytes. */
  def gifMetaColumn(df: DataFrame, mediaCol: String,
                    outCol: String = "gif",
                    blockSize: Int = 1024): DataFrame =
    parsedColumn(df, mediaCol, outCol, GifMetaType, blockSize)(b =>
      Gif.parseMeta(b).map { m =>
        Row(m.version, m.width, m.height, m.nFrames, m.nGce,
          m.durationMs, m.loop)
      }.orNull)

  /** Synthesize an animated GIF per row from parameter columns
    * (solid-gray frames whose shade walks the frame index — the
    * fixture side of [[gifMetaColumn]]'s container round-trip; REAL
    * pattern frames come from [[gifPatternColumn]]). */
  def gifBuildColumn(df: DataFrame, wCol: String, hCol: String,
                     nFramesCol: String, delayCsCol: String,
                     loopCol: String,
                     outCol: String = "media"): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val is = Seq(wCol, hCol, nFramesCol, delayCsCol, loopCol)
      .map(df.schema.fieldIndex)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val w = row.getInt(is(0))
        val h = row.getInt(is(1))
        val n = row.getInt(is(2))
        val frames = (0 until n).map { f =>
          Array.fill[Byte](w * h)((40 * (f + 1) % 256).toByte)
        }
        Row.fromSeq(row.toSeq :+ Gif.encodeAnimated(w, h, frames,
          delayCs = row.getInt(is(3)), loop = row.getInt(is(4))))
      }
    }
  }

  /** Deterministic PCM16 mono WAV test-tone builder — the audio twin
    * of [[bmpPatternColumn]] (bytes BUILT from row parameters, decoded
    * by the REAL RIFF parser, oracle recomputes from the formulas).
    * Sample t of an (n, seed) pattern, at 8 kHz:
    *   s(t) = ((seed·131 + t·t·7 + t·13) mod 65536) − 32768
    * Batched partition-local map; bytes never shuffle. */
  def wavPatternColumn(df: DataFrame, nCol: String, seedCol: String,
                       outCol: String = "media"): DataFrame = {
    val schema = df.schema
      .add(outCol, org.apache.spark.sql.types.BinaryType)
    val ni = df.schema.fieldIndex(nCol)
    val si = df.schema.fieldIndex(seedCol)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val n = row.getInt(ni)
        val seed = row.getInt(si)
        val samples = new Array[Short](n)
        var t = 0
        while (t < n) {
          samples(t) = (((seed * 131 + t * t * 7 + t * 13) % 65536)
            - 32768).toShort
          t += 1
        }
        Row.fromSeq(row.toSeq :+ Codecs.encodeWavMono(8000, samples))
      }
    }
  }

  /** Deterministic PCM16 mono WAV QUALITY-pattern builder — the
    * [[wavPatternColumn]] twin with planted defects for gate testing.
    * Sample t of an (n, seed) clip (n ≡ 0 mod 16, per = n/16):
    *   frame(t) = t / per
    *   s(t) = 0                      if frame(t) < seed mod 6 (silence)
    *        = 32767                  else if (t·7 + seed) mod
    *                                   (89 + 100·(seed mod 3)) = 0 (clip)
    *        = ((seed·131 + t²·7 + t·13) mod 32001) − 16000 otherwise
    * so silence ratio (0..5)/16 straddles a 0.2 gate and clip rate
    * ~{1/89, 1/189, 1/289} straddles a 0.005 gate. Batched
    * partition-local map; bytes never shuffle. */
  def wavQualityPatternColumn(df: DataFrame, nCol: String,
                              seedCol: String,
                              outCol: String = "media"): DataFrame = {
    val schema = df.schema
      .add(outCol, org.apache.spark.sql.types.BinaryType)
    val ni = df.schema.fieldIndex(nCol)
    val si = df.schema.fieldIndex(seedCol)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val n = row.getInt(ni)
        val seed = row.getInt(si)
        require(n >= 16 && n % 16 == 0,
          s"quality pattern needs n divisible by 16, got $n")
        val per = n / 16
        val clipMod = 89 + 100 * (seed % 3)
        val silFrames = seed % 6
        val samples = new Array[Short](n)
        var t = 0
        while (t < n) {
          samples(t) =
            if (t / per < silFrames) 0
            else if ((t * 7 + seed) % clipMod == 0) 32767
            else (((seed * 131 + t * t * 7 + t * 13) % 32001) - 16000)
              .toShort
          t += 1
        }
        Row.fromSeq(row.toSeq :+ Codecs.encodeWavMono(8000, samples))
      }
    }
  }

  /** Audio-quality registers per row through the REAL WAV parser
    * ([[Codecs.audioQualityStats]]) as flat integer columns
    * (aq_n, aq_silent, aq_clipped, aq_peak, aq_sumabs), null for
    * undecodable bytes. Batched map, bytes never shuffle. */
  def audioQualityColumn(df: DataFrame, mediaCol: String,
                         blockSize: Int = 1024): DataFrame = {
    import org.apache.spark.sql.types._
    // aq_peak is LongType on purpose: Seq(n, sil, clip, peak, sa)
    // unifies Int into Long via weak conformance, so the boxed value
    // arriving at the encoder IS a Long
    val schema = df.schema
      .add("aq_n", LongType).add("aq_silent", LongType)
      .add("aq_clipped", LongType).add("aq_peak", LongType)
      .add("aq_sumabs", LongType)
    val idx = df.schema.fieldIndex(mediaCol)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        rows.iterator.map { row =>
          Codecs.audioQualityStats(row.getAs[Array[Byte]](idx)) match {
            case Some((n, sil, clip, peak, sa)) =>
              Row.fromSeq(row.toSeq ++ Seq(n, sil, clip, peak, sa))
            case None =>
              Row.fromSeq(row.toSeq ++ Seq(null, null, null, null, null))
          }
        }
      }
    }
  }

  /** Frame-energy audio fingerprint per row through the REAL WAV
    * parser ([[Codecs.audioFingerprint]]): 16-bit integer signature,
    * null for undecodable bytes — the dedup key for audio corpora.
    * Batched map, bytes never shuffle, stream-safe. */
  def audioFingerprintColumn(df: DataFrame, mediaCol: String,
                             frames: Int = 16,
                             blockSize: Int = 1024): DataFrame = {
    val schema = df.schema
      .add("afp", org.apache.spark.sql.types.IntegerType)
    val idx = df.schema.fieldIndex(mediaCol)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        rows.iterator.map { row =>
          val fp = Codecs.audioFingerprint(
            row.getAs[Array[Byte]](idx), frames)
          Row.fromSeq(row.toSeq :+ fp.map(Int.box).orNull)
        }
      }
    }
  }

  /** Perceptual image hashes for near-dup detection: aHash64 (spatial
    * brightness pattern) and pHash64 (DCT spectral structure) per row,
    * null for undecodable bytes. The two-tier fingerprint feeds the
    * same group-by / hamming-ball dedup machinery as text signatures —
    * a pure batched map over the binary column (bytes never shuffle),
    * stream-safe like every codec column. */
  def imageHashColumn(df: DataFrame, mediaCol: String,
                      blockSize: Int = 1024): DataFrame = {
    val schema = df.schema
      .add("ahash64", org.apache.spark.sql.types.LongType)
      .add("phash64", org.apache.spark.sql.types.LongType)
    val idx = df.schema.fieldIndex(mediaCol)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        rows.iterator.map { row =>
          // ONE decode feeds both hash tiers — ImageIO.read dominates
          // the cost, and the per-tier byte-array entry points would
          // each run it
          val img = Codecs.readImage(row.getAs[Array[Byte]](idx))
          Row.fromSeq(row.toSeq :+
            img.map(i => Long.box(Codecs.aHash64Of(i))).orNull :+
            img.map(i => Long.box(Codecs.pHash64Of(i))).orNull)
        }
      }
    }
  }

  /** Clip-level audio features: the per-band MEAN of the [[Codecs
    * .filterbank]] log-energy spectrogram (one fixed-size vector per
    * clip) plus the frame count — the embedding-ready form for
    * similarity/dedup over audio corpora. Null feature for non-WAV
    * bytes or clips shorter than one frame. Batched map, bytes never
    * shuffle, stream-safe. */
  def audioFeatureColumn(df: DataFrame, mediaCol: String,
                         nFft: Int = 512, hop: Int = 256, nBands: Int = 8,
                         blockSize: Int = 1024): DataFrame = {
    val schema = df.schema
      .add("afeat", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, containsNull = false))
      .add("n_frames", org.apache.spark.sql.types.LongType)
    val idx = df.schema.fieldIndex(mediaCol)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        rows.iterator.map { row =>
          val fb = Codecs.filterbank(row.getAs[Array[Byte]](idx),
            nFft, hop, nBands)
          val (feat, nf) = fb match {
            case Some(frames) if frames.nonEmpty =>
              val mean = new Array[Double](nBands)
              frames.foreach { fr =>
                var i = 0
                while (i < nBands) { mean(i) += fr(i); i += 1 }
              }
              (mean.map(_ / frames.length).toSeq, Long.box(frames.length))
            case Some(_) => (null, Long.box(0L))
            case None => (null, null)
          }
          Row.fromSeq(row.toSeq :+ feat :+ nf)
        }
      }
    }
  }

  /** REAL image resize: nearest-neighbor BMP downsample to w×h,
    * re-encoded as BMP with recomputed metadata (null for non-BMP
    * bytes). */
  def resizeBmpColumn(df: DataFrame, mediaCol: String, w: Int, h: Int,
                      outCol: String = "media_small",
                      blockSize: Int = 1024): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val idx = df.schema.fieldIndex(mediaCol)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        rows.iterator.map { row =>
          val out = Codecs.resizeBmp(row.getAs[Array[Byte]](idx), w, h).orNull
          Row.fromSeq(row.toSeq :+ out)
        }
      }
    }
      // null meta for undecodable rows, matching the decode columns'
      // null-struct convention (a fabricated zero-byte meta would be
      // indistinguishable from a real empty resize downstream)
      .withColumn(outCol + "_meta", when(col(outCol).isNotNull, struct(
        lit("bmp-resized").as("kind"),
        length(col(outCol)).cast("long").as("n_bytes"),
        sha2(col(outCol), 256).as("sha"))))
  }

  val MetaType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("sha", StringType, nullable = false)))

  /** Wrap a source column as a media column with typed metadata. */
  /** Synthesize a minimal single-video-track MP4 per row from typed
    * parameter columns (timescale 1000 ⇒ durationTicks == ms) — the
    * fixture side of the [[mp4MetaColumn]] round-trip; a real corpus
    * reads externally-produced files into the same binary column.
    * Batched partition-local map, bytes never shuffle. */
  def mp4BuildColumn(df: DataFrame, durMsCol: String, wCol: String,
                     hCol: String, codecCol: String, mdatCol: String,
                     outCol: String = "media",
                     blockSize: Int = 1024): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val is = Seq(durMsCol, wCol, hCol, codecCol, mdatCol)
      .map(df.schema.fieldIndex)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        rows.iterator.map { row =>
          val bytes = Mp4.buildMinimal(1000L, row.getLong(is(0)),
            row.getInt(is(1)), row.getInt(is(2)),
            row.getString(is(3)), "vide", row.getInt(is(4)))
          Row.fromSeq(row.toSeq :+ bytes)
        }
      }
    }
  }

  private val Mp4MetaType = StructType(Seq(
    StructField("duration_ms", LongType),
    StructField("mdat_bytes", LongType),
    StructField("bitrate_bps", LongType),
    StructField("n_tracks", IntegerType),
    StructField("handler", StringType),
    StructField("codec", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    // from the avcC SPS when present (the BITSTREAM truth — container
    // tkhd/stsd dimensions are display hints); null otherwise
    StructField("sps_profile", IntegerType),
    StructField("sps_level", IntegerType),
    StructField("sps_width", IntegerType),
    StructField("sps_height", IntegerType)))

  /** ISO BMFF container metadata per row ([[Mp4.parseMeta]] box
    * walk — duration, mdat size, container bitrate, first-track
    * handler/codec/dimensions), null for bytes that hold no valid
    * moov. No frame decode; pure-JVM byte arithmetic, batched
    * partition-local, stream-safe. */
  def mp4MetaColumn(df: DataFrame, mediaCol: String,
                    outCol: String = "mp4",
                    blockSize: Int = 1024): DataFrame =
    parsedColumn(df, mediaCol, outCol, Mp4MetaType, blockSize)(b =>
      Mp4.parseMeta(b).map { m =>
        val t = m.tracks.headOption
          .getOrElse(Mp4.TrackInfo("", "", 0, 0))
        val s = t.sps
        Row(m.durationMs, m.mdatBytes, m.bitrateBps,
          m.tracks.length, t.handler, t.codec, t.width, t.height,
          s.map(x => Integer.valueOf(x.profileIdc)).orNull,
          s.map(x => Integer.valueOf(x.levelIdc)).orNull,
          s.map(x => Integer.valueOf(x.width)).orNull,
          s.map(x => Integer.valueOf(x.height)).orNull)
      }.orNull)

  /** Synthesize a minimal single-video-track MP4 whose avc1 sample
    * entry carries a REAL avcC/SPS for (w, h, profile, level) — the
    * container tkhd/stsd dimensions are deliberately the mb-rounded
    * coded size, so only the SPS knows the true (cropped) display
    * dimensions. Fixture side of the [[mp4MetaColumn]] SPS fields. */
  def avcMp4BuildColumn(df: DataFrame, durMsCol: String, wCol: String,
                        hCol: String, profileCol: String, levelCol: String,
                        mdatCol: String, outCol: String = "media",
                        blockSize: Int = 1024): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val is = Seq(durMsCol, wCol, hCol, profileCol, levelCol, mdatCol)
      .map(df.schema.fieldIndex)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        rows.iterator.map { row =>
          val w = row.getInt(is(1)); val h = row.getInt(is(2))
          val sps = Avc.buildSps(w, h, row.getInt(is(3)), row.getInt(is(4)))
          val bytes = Mp4.buildMinimal(1000L, row.getLong(is(0)),
            (w + 15) / 16 * 16, (h + 15) / 16 * 16, "avc1", "vide",
            row.getInt(is(5)), avcC = Some(Avc.buildAvcC(sps)))
          Row.fromSeq(row.toSeq :+ bytes)
        }
      }
    }
  }

  val Mp3MetaType: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("sample_rate", IntegerType),
    StructField("bitrate_kbps", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_ms", LongType),
    StructField("is_vbr", BooleanType)))

  /** Synthesize a Layer-III MPEG audio stream per row from typed
    * parameter columns ([[Mp3.buildFrames]]) — fixture side of the
    * [[mp3MetaColumn]] round-trip. */
  def mp3BuildColumn(df: DataFrame, mpeg1Col: String, brIdxCol: String,
                     srIdxCol: String, nFramesCol: String, monoCol: String,
                     vbrStepCol: String, outCol: String = "media",
                     blockSize: Int = 1024): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val is = Seq(mpeg1Col, brIdxCol, srIdxCol, nFramesCol, monoCol,
      vbrStepCol).map(df.schema.fieldIndex)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        rows.iterator.map { row =>
          val bytes = Mp3.buildFrames(row.getBoolean(is(0)),
            row.getInt(is(1)), row.getInt(is(2)), row.getInt(is(3)),
            mono = row.getBoolean(is(4)), vbrStep = row.getInt(is(5)))
          Row.fromSeq(row.toSeq :+ bytes)
        }
      }
    }
  }

  val Id3InfoType: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("artist", StringType),
    StructField("album", StringType),
    StructField("year", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("n_utf16", IntegerType, nullable = false),
    StructField("tag_bytes", IntegerType, nullable = false)))

  /** Prepend a REAL ID3v2.3 tag ([[Id3.buildTag]] — TIT2/TPE1/TALB/
    * TYER, `utf16Col` selecting the UTF-16 title encoding) to a valid
    * Layer-III frame run ([[Mp3.buildFrames]]), so one media column
    * carries both the provenance tag and the audio stream the
    * existing [[mp3MetaColumn]] walk must still find past it. */
  def id3BuildColumn(df: DataFrame, titleCol: String, artistCol: String,
                     albumCol: String, yearCol: String, utf16Col: String,
                     mpeg1Col: String, nFramesCol: String,
                     outCol: String = "media"): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val is = Seq(titleCol, artistCol, albumCol, yearCol, utf16Col,
      mpeg1Col, nFramesCol).map(df.schema.fieldIndex)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val tag = Id3.buildTag(row.getString(is(0)), row.getString(is(1)),
          row.getString(is(2)), row.getInt(is(3)), row.getBoolean(is(4)))
        val audio = Mp3.buildFrames(row.getBoolean(is(5)), brIdx = 5,
          srIdx = 0, nFrames = row.getInt(is(6)))
        Row.fromSeq(row.toSeq :+ (tag ++ audio))
      }
    }
  }

  /** ID3v2.3 tag metadata per row ([[Id3.parse]]; null when no tag).
    * Batched partition-local, stream-safe; bytes never shuffle. */
  def id3MetaColumn(df: DataFrame, mediaCol: String,
                    outCol: String = "id3",
                    blockSize: Int = 1024): DataFrame =
    parsedColumn(df, mediaCol, outCol, Id3InfoType, blockSize)(b =>
      Id3.parse(b).map { t =>
        Row(t.title, t.artist, t.album, t.year, t.nFrames, t.nUtf16,
          t.tagBytes)
      }.orNull)

  /** MPEG audio frame-header metadata per row ([[Mp3.parseMeta]] —
    * version, sample rate, nominal bitrate, channel count, exact
    * frame count and integer-exact duration, VBR flag), null for
    * bytes with no Layer-III sync. No sample decode; pure-JVM byte
    * arithmetic, batched partition-local, stream-safe. */
  def mp3MetaColumn(df: DataFrame, mediaCol: String,
                    outCol: String = "mp3",
                    blockSize: Int = 1024): DataFrame =
    parsedColumn(df, mediaCol, outCol, Mp3MetaType, blockSize)(b =>
      Mp3.parseMeta(b).map(m =>
        Row(m.version, m.sampleRateHz, m.bitrateKbps,
          m.channels, m.nFrames, m.durationMs, m.isVbr)).orNull)

  val FlacMetaType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("total_samples", LongType),
    StructField("duration_ms", LongType)))

  /** Synthesize a metadata-only FLAC header per row from typed
    * parameter columns ([[Flac.buildStreamInfo]]). */
  def flacBuildColumn(df: DataFrame, rateCol: String, chanCol: String,
                      bpsCol: String, samplesCol: String,
                      outCol: String = "media",
                      blockSize: Int = 1024): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val is = Seq(rateCol, chanCol, bpsCol, samplesCol)
      .map(df.schema.fieldIndex)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        rows.iterator.map { row =>
          val bytes = Flac.buildStreamInfo(row.getInt(is(0)),
            row.getInt(is(1)), row.getInt(is(2)), row.getLong(is(3)))
          Row.fromSeq(row.toSeq :+ bytes)
        }
      }
    }
  }

  /** FLAC STREAMINFO metadata per row ([[Flac.parseMeta]]), null for
    * non-FLAC bytes. Pure-JVM bitfield arithmetic, batched
    * partition-local, stream-safe. */
  def flacMetaColumn(df: DataFrame, mediaCol: String,
                     outCol: String = "flac",
                     blockSize: Int = 1024): DataFrame =
    parsedColumn(df, mediaCol, outCol, FlacMetaType, blockSize)(b =>
      Flac.parseMeta(b).map(m =>
        Row(m.sampleRateHz, m.channels,
          m.bitsPerSample, m.totalSamples, m.durationMs)).orNull)

  /** Deterministic mono 16-bit FLAC clip builder — the lossless twin
    * of [[wavPatternColumn]] (bytes BUILT from row parameters through
    * the REAL encoder, [[Flac.encode]], so the stream carries real
    * frame headers, CRC-8/CRC-16, and CONSTANT/VERBATIM/FIXED+Rice
    * subframes). Block b = t / 64 of an (n, seed) clip at 8 kHz:
    *   s(t) = (seed·977 mod 4096) − 2048        if b > 0 ∧ b ≡ 3 (mod 4)
    *        = ((seed·97 + t·31) mod 4096) − 2048 otherwise (sawtooth)
    * — the sawtooth's order-2 residuals are 0 away from wraps, so
    * every non-constant block past the first encodes FIXED+Rice
    * (block 0 is VERBATIM by the encoder's plan), and the oracle can
    * count frame kinds from block roles alone. */
  def flacPatternColumn(df: DataFrame, nCol: String, seedCol: String,
                        outCol: String = "media"): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val ni = df.schema.fieldIndex(nCol)
    val si = df.schema.fieldIndex(seedCol)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val n = row.getInt(ni)
        val seed = row.getInt(si)
        val cval = (seed * 977) % 4096 - 2048
        val samples = new Array[Int](n)
        var t = 0
        while (t < n) {
          val b = t / 64
          samples(t) =
            if (b > 0 && b % 4 == 3) cval
            else (seed * 97 + t * 31) % 4096 - 2048
          t += 1
        }
        Row.fromSeq(row.toSeq :+ Flac.encode(8000, samples))
      }
    }
  }

  /** Deterministic STEREO FLAC clip builder ([[Flac.encodeStereo]]
    * with LPC analysis on): two phase-independent sawtooth channels
    *   l(t) = ((seed·97 + t·31) mod 4096) − 2048
    *   r(t) = ((seed·61 + t·29) mod 4096) − 2048
    * at 8 kHz, 64-sample blocks cycling all four channel assignments
    * (independent / left-side / side-right / mid-side), so every
    * decorrelation path and the 17-bit side width are on the wire.
    * `n` (per-channel) must be a multiple of 64. */
  def flacStereoPatternColumn(df: DataFrame, nCol: String, seedCol: String,
                              outCol: String = "media"): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val ni = df.schema.fieldIndex(nCol)
    val si = df.schema.fieldIndex(seedCol)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val n = row.getInt(ni)
        val seed = row.getInt(si)
        val l = Array.tabulate(n)(t => (seed * 97 + t * 31) % 4096 - 2048)
        val r = Array.tabulate(n)(t => (seed * 61 + t * 29) % 4096 - 2048)
        Row.fromSeq(row.toSeq :+
          Flac.encodeStereo(8000, l, r, useLpc = true))
      }
    }
  }

  /** Deterministic bps-grid FLAC clip builder — [[flacPatternColumn]]
    * widened to the full 8/12/16/20/24-bit subset with wasted-bit
    * extraction on the wire. Per (n, seed, bps, w) row the samples
    * are s(t) = (((seed·97 + t·31) mod A) − A/2) · 2^w with
    * A = 2^(bps−1−w) — every sample carries exactly w trailing zero
    * bits (t ≡ seed (mod A) positions may carry more; the encoder's
    * per-block OR-fold finds the true common width, which the
    * decoder undoes bit-exactly either way). Even seeds encode
    * through the LPC planner, odd through the FIXED one — both paths
    * on the wire at every width. */
  def flacBpsPatternColumn(df: DataFrame, nCol: String, seedCol: String,
                           bpsCol: String, wCol: String,
                           outCol: String = "media"): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val is = Seq(nCol, seedCol, bpsCol, wCol).map(df.schema.fieldIndex)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val n = row.getInt(is(0))
        val seed = row.getInt(is(1))
        val bps = row.getInt(is(2))
        val w = row.getInt(is(3))
        val amp = 1 << (bps - 1 - w)
        val samples = new Array[Int](n)
        var t = 0
        while (t < n) {
          samples(t) = ((seed * 97 + t * 31) % amp - amp / 2) << w
          t += 1
        }
        Row.fromSeq(row.toSeq :+ (if (seed % 2 == 0)
          Flac.encodeLpc(8000, samples, 64, 4, bps)
        else Flac.encode(8000, samples, 64, bps)))
      }
    }
  }

  /** Deterministic SURROUND FLAC clip builder ([[Flac.encodeMulti]] —
    * N independent channels, the spec's only >2-channel assignment):
    * channel c of an (n, seed, nch) clip is
    * s_c(t) = ((seed·97 + c·41 + t·31) mod 4096) − 2048, even seeds
    * through the LPC planner. */
  def flacMultiPatternColumn(df: DataFrame, nCol: String, seedCol: String,
                             nchCol: String,
                             outCol: String = "media"): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val is = Seq(nCol, seedCol, nchCol).map(df.schema.fieldIndex)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val n = row.getInt(is(0))
        val seed = row.getInt(is(1))
        val nch = row.getInt(is(2))
        val chans = Seq.tabulate(nch)(c => Array.tabulate(n)(t =>
          (seed * 97 + c * 41 + t * 31) % 4096 - 2048))
        Row.fromSeq(row.toSeq :+
          Flac.encodeMulti(8000, chans, 64, useLpc = seed % 2 == 0))
      }
    }
  }

  val FlacAudioType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("bps", IntegerType),
    StructField("n_ch", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("n_const", IntegerType),
    StructField("n_verbatim", IntegerType),
    StructField("n_fixed", IntegerType),
    StructField("n_lpc", IntegerType),
    StructField("sum_s", LongType),
    StructField("min_s", IntegerType),
    StructField("max_s", IntegerType),
    StructField("dg", LongType)))

  /** REAL FLAC frame decode ([[Flac.decode]] — CRC-verified constant/
    * verbatim/fixed+Rice walk): appends a [[FlacAudioType]] register
    * struct, null for undecodable bytes (all-frames-or-nothing). The
    * decoded samples never leave the kernel — sum, min, max, and the
    * position-weighted digest Σ (t+1)·(s(t)+32768) mod `digestMod`
    * are folded per clip, so only model-sized registers shuffle. */
  def flacAudioColumn(df: DataFrame, mediaCol: String, digestMod: Long,
                      outCol: String = "fa",
                      blockSize: Int = 1024): DataFrame =
    parsedColumn(df, mediaCol, outCol, FlacAudioType, blockSize)(b =>
      Flac.decode(b).map { a =>
        var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
        var dg = 0L
        var t = 0
        while (t < a.samples.length) {
          val s = a.samples(t)
          sum += s; if (s < mn) mn = s; if (s > mx) mx = s
          dg = (dg + (t + 1).toLong * (s + 32768L)) % digestMod
          t += 1
        }
        Row(a.info.sampleRateHz, a.info.bitsPerSample, a.info.channels,
          a.samples.length,
          a.nFrames, a.nConstant, a.nVerbatim, a.nFixed, a.nLpc,
          sum, mn, mx, dg)
      }.orNull)

  /** Deterministic IMA-ADPCM clip builder — the LOSSY twin of
    * [[flacPatternColumn]]: samples from the standard audio formula
    * s(t) = ((seed·131 + t²·7 + t·13) mod 65536) − 32768, encoded
    * through the REAL 4-bit codec ([[Adpcm.encode]] — WAV fmt 0x11,
    * per-block headers, nibble stream). `n` must be a multiple of
    * [[Adpcm.SamplesPerBlock]]. */
  def adpcmPatternColumn(df: DataFrame, nCol: String, seedCol: String,
                         outCol: String = "media"): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val ni = df.schema.fieldIndex(nCol)
    val si = df.schema.fieldIndex(seedCol)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val n = row.getInt(ni)
        val seed = row.getInt(si)
        val samples = new Array[Int](n)
        var t = 0
        while (t < n) {
          samples(t) = (seed * 131 + t * t * 7 + t * 13) % 65536 - 32768
          t += 1
        }
        Row.fromSeq(row.toSeq :+ Adpcm.encode(8000, samples))
      }
    }
  }

  val AdpcmAudioType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("n_blocks", IntegerType),
    StructField("sum_d", LongType),
    StructField("min_d", IntegerType),
    StructField("max_d", IntegerType),
    StructField("dg", LongType)))

  /** REAL IMA-ADPCM decode ([[Adpcm.decode]] — RIFF walk + the 4-bit
    * state machine): appends an [[AdpcmAudioType]] register struct,
    * null for undecodable bytes. Decoded samples never leave the
    * kernel — sum/min/max and the position-weighted digest
    * Σ (t+1)·(d(t)+32768) mod `digestMod` fold per clip. */
  def adpcmAudioColumn(df: DataFrame, mediaCol: String, digestMod: Long,
                       outCol: String = "ad",
                       blockSize: Int = 1024): DataFrame =
    parsedColumn(df, mediaCol, outCol, AdpcmAudioType, blockSize)(b =>
      Adpcm.decode(b).map { a =>
        var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
        var dg = 0L
        var t = 0
        while (t < a.samples.length) {
          val s = a.samples(t)
          sum += s; if (s < mn) mn = s; if (s > mx) mx = s
          dg = (dg + (t + 1).toLong * (s + 32768L)) % digestMod
          t += 1
        }
        Row(a.sampleRateHz, a.samples.length, a.nBlocks, sum, mn, mx, dg)
      }.orNull)

  /** Deterministic tone-set audio clips for the cross-codec near-dup
    * family: group g = (doc_id / 20) mod 32 selects an INJECTIVE
    * 3-band tone set over 14 mel bands — t1 = g mod 4,
    * t2 = 4 + (g/4) mod 4, t3 = 8 + (g/16) mod 2 — and the clip is
    * the sum of three sines at those bands' mel-center frequencies,
    * with per-doc amplitudes (3000 + 250·((doc_id + j) mod 4), a ±2 dB per-tone mix spread) and
    * phases (2π·((7·doc_id + 3j) mod 8)/8) so clips within a group
    * share CONTENT but not bytes. Even doc_ids encode FLAC (1024
    * samples), odd IMA-ADPCM (1040 = 16×65) — the cross-codec twin
    * pair the MFCC features must see through. */
  def audioSimPatternColumn(df: DataFrame, idCol: String,
                            outCol: String = "media"): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val ii = df.schema.fieldIndex(idCol)
    val melMax = Codecs.hzToMel(4000.0)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val id = row.getLong(ii)
        val g = ((id / 20) % 32).toInt
        val bands = Array(g % 4, 4 + (g / 4) % 4, 8 + (g / 16) % 2)
        val freqs = bands.map(b => Codecs.melToHz(melMax * (b + 1) / 15.0))
        val amps = Array.tabulate(3)(j => 3000.0 + 250.0 * ((id + j) % 4))
        val phis = Array.tabulate(3)(j =>
          2.0 * math.Pi * ((7 * id + 3 * j) % 8) / 8.0)
        val n = if (id % 2 == 0) 1024 else 1040
        val s = Array.tabulate(n) { t =>
          var v = 0.0
          var j = 0
          while (j < 3) {
            v += amps(j) * math.sin(
              2.0 * math.Pi * freqs(j) * t / 8000.0 + phis(j))
            j += 1
          }
          math.max(-32768, math.min(32767, math.round(v).toInt))
        }
        val bytes =
          if (id % 2 == 0) Flac.encode(8000, s)
          else Adpcm.encode(8000, s)
        Row.fromSeq(row.toSeq :+ bytes)
      }
    }
  }

  val AudioMfccType: StructType = StructType(Seq(
    StructField("codec", StringType),
    StructField("top_key", LongType),
    StructField("mfcc", ArrayType(DoubleType, containsNull = false))))

  /** MFCC clip features over REAL decode ([[Codecs.mfccClip]]): the
    * bytes are sniffed (fLaC → [[Flac.decode]], RIFF → [[Adpcm
    * .decode]]), the decoded samples stay in the kernel, and only
    * the model-sized feature struct leaves: codec tag, the packed
    * top-3 mel band key (the deterministic blocking key recovered
    * from the audio itself), and the amplitude-invariant MFCC
    * vector (coefficients 1..8 over 14 mel bands). Null for
    * undecodable or too-short clips. */
  def audioMfccColumn(df: DataFrame, mediaCol: String,
                      outCol: String = "am",
                      blockSize: Int = 1024): DataFrame =
    parsedColumn(df, mediaCol, outCol, AudioMfccType, blockSize) { b =>
      val decoded: Option[(String, Int, Array[Int])] =
        if (b == null || b.length < 4) None
        else if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' &&
          b(3) == 'C')
          Flac.decode(b).filter(_.info.channels == 1)
            .map(a => ("flac", a.info.sampleRateHz, a.samples))
        else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' &&
          b(2) == 'F' && b(3) == 'F')
          Adpcm.decode(b).map(a => ("adpcm", a.sampleRateHz, a.samples))
        else None
      decoded.flatMap { case (codec, sr, samples) =>
        Codecs.mfccClip(samples, sr).map { case (top, mfcc) =>
          Row(codec, top.foldLeft(0L)((k, b2) => k * 16 + b2),
            mfcc.toSeq)
        }
      }.orNull
    }

  /** Assemble per-group .warc.gz FILES (fixture side): one row per
    * group with the member-per-record gzip bytes ([[Warc.buildFile]]).
    * The group's docs are collected into ONE file — the shard grain
    * is the caller's (bounded: a shard is a file, and real WARC files
    * are ~1 GB); docs are ordered by id inside the file so the bytes
    * are deterministic under any partitioning. */
  def warcBuildFiles(df: DataFrame, groupCols: Seq[String], uriCol: String,
                     idCol: String, textCol: String,
                     outCol: String = "media"): DataFrame = {
    val grouped = df.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col(idCol).as("id"),
        col(uriCol).as("uri"), col(textCol).as("text")))).as("_docs"))
    val schema = StructType(grouped.schema.fields.filterNot(_.name == "_docs"))
      .add(outCol, BinaryType)
    val di = grouped.schema.fieldIndex("_docs")
    mapBatched(grouped, schema) { it =>
      it.map { row =>
        val docs = row.getSeq[Row](di).map(r =>
          (r.getString(1), r.get(0).toString, r.getString(2)))
        val bytes = Warc.buildFile(docs)
        Row.fromSeq(row.toSeq.patch(di, Nil, 1) :+ bytes)
      }
    }
  }

  val WarcRecordType: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("uri", StringType),
    StructField("record_id", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("http_status", IntegerType),
    StructField("n_body_bytes", LongType),
    StructField("body_text", StringType),
    StructField("refers_to", StringType),
    StructField("payload_digest", StringType)))

  /** Flatten WARC files into one row per record ([[Warc.parseAll]]):
    * the parent row's columns minus the bytes, plus the record
    * fields — for response records the HTTP envelope is stripped and
    * the entity body surfaces as text. Partition-local flatMap; a
    * file's records never leave its partition, nothing file-sized
    * touches the driver. This is the Common Crawl ingestion shape:
    * `spark.read.format("binaryFile")` → this → a documents table. */
  def warcRecordsColumn(df: DataFrame, mediaCol: String): DataFrame = {
    val mi = df.schema.fieldIndex(mediaCol)
    val keep = df.schema.fields.indices.filterNot(_ == mi)
    val schema = StructType(keep.map(df.schema.fields) ++ WarcRecordType.fields)
    mapBatched(df, schema) { it =>
      it.flatMap { row =>
        val parent = keep.map(row.get)
        Warc.parseAll(row.getAs[Array[Byte]](mi)).iterator.map { r =>
          Row.fromSeq(parent ++ Seq(r.warcType, r.targetUri, r.recordId,
            r.contentType, r.contentLength, r.httpStatus,
            r.body.length.toLong, r.bodyText, r.refersTo,
            r.payloadDigest))
        }
      }
    }
  }

  /** [[warcBuildFiles]] with crawl-time dedup: rows whose
    * `revisitOfCol` is non-null write as REVISIT records (digest +
    * reference, empty payload — the Common Crawl storage-dedup
    * layout); the rest as digest-carrying responses. */
  def warcBuildFilesRevisit(df: DataFrame, groupCols: Seq[String],
                            uriCol: String, idCol: String,
                            textCol: String, revisitOfCol: String,
                            outCol: String = "media"): DataFrame = {
    val grouped = df.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col(idCol).as("id"),
        col(uriCol).as("uri"), col(textCol).as("text"),
        col(revisitOfCol).as("ref")))).as("_docs"))
    val schema = StructType(grouped.schema.fields.filterNot(_.name == "_docs"))
      .add(outCol, BinaryType)
    val di = grouped.schema.fieldIndex("_docs")
    mapBatched(grouped, schema) { it =>
      it.map { row =>
        val docs = row.getSeq[Row](di).map(r =>
          (r.getString(1), r.get(0).toString, r.getString(2),
            Option(r.get(3)).map(_.toString)))
        Row.fromSeq(row.toSeq.patch(di, Nil, 1) :+
          Warc.buildFileRevisit(docs))
      }
    }
  }

  /** Resolve REVISIT records against the responses' payload digests:
    * responses pass through; each revisit gets the body text (and
    * byte count) of a response carrying the same digest, or stays
    * null when no capture matches (a dangling reference surfaces,
    * never silently drops). One hash join on the digest — the
    * resolution a WARC reader runs to materialize a deduped crawl. */
  def warcResolveRevisits(recs: DataFrame): DataFrame = {
    val resp = recs.where(col("warc_type") === "response")
    val lookup = resp
      .where(col("payload_digest") =!= lit(""))
      .select(col("payload_digest"), col("body_text"),
        col("n_body_bytes"))
      .dropDuplicates("payload_digest")
    val rev = recs.where(col("warc_type") === "revisit")
      .drop("body_text", "n_body_bytes")
      .join(lookup, Seq("payload_digest"), "left")
    rev.select(resp.columns.map(col): _*).unionByName(resp)
  }

  /** Group docs into per-group ZIP archives ([[Archive.buildZip]]) —
    * the fixture side of the repo-export ingestion round-trip. Member
    * i is `d<id>.txt` with the doc text as UTF-8 bytes; members with
    * even ids ride method 8 (real Deflater), odd ids method 0
    * (store). Same grouped-build shape as [[warcBuildFiles]]: only
    * group keys shuffle, archive bytes are assembled after the agg. */
  def zipBuildFiles(df: DataFrame, groupCols: Seq[String], idCol: String,
                    textCol: String, outCol: String = "media"): DataFrame =
    archiveBuildFiles(df, groupCols, idCol, textCol, outCol) { docs =>
      Archive.buildZip(docs.map { case (id, text) =>
        (s"d$id.txt", text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }, i => docs(i)._1 % 2 == 0)
    }

  /** Group docs into per-group .tar.gz archives
    * ([[Archive.buildTarGz]]); member i is `d<id>.txt` with a planted
    * mtime of 1700000000 + id % 1000 the parser reads back. */
  def tarBuildFiles(df: DataFrame, groupCols: Seq[String], idCol: String,
                    textCol: String, outCol: String = "media"): DataFrame =
    archiveBuildFiles(df, groupCols, idCol, textCol, outCol) { docs =>
      Archive.buildTarGz(docs.map { case (id, text) =>
        (s"d$id.txt", text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }, i => 1700000000L + docs(i)._1 % 1000)
    }

  /** Group docs into per-group MediaWiki-style XML dumps
    * ([[Xml.buildDump]]); page fields derive from (id, text) by the
    * formulas the q_source_xml oracle replays: title `P&<id>`
    * (entity escaping exercised on every page), ns id%3→{0,1,10},
    * revision id·7+3, timestamp day id%28+1 / hour id%24,
    * contributor `user_<id%50>`, redirect on id%11 = 0. */
  def xmlBuildFiles(df: DataFrame, groupCols: Seq[String], idCol: String,
                    textCol: String, outCol: String = "media"): DataFrame =
    archiveBuildFiles(df, groupCols, idCol, textCol, outCol) { docs =>
      Xml.buildDump(docs.map { case (id, text) =>
        Xml.Page(id, (id % 3) match { case 2 => 10 case m => m.toInt },
          s"P&$id", id * 7 + 3,
          f"2024-01-${id % 28 + 1}%02dT${id % 24}%02d:00:00Z",
          s"user_${id % 50}", text, redirect = id % 11 == 0, ok = true)
      })
    }

  val XmlPageType: StructType = StructType(Seq(
    StructField("page_id", LongType, nullable = false),
    StructField("page_ns", IntegerType, nullable = false),
    StructField("page_title", StringType),
    StructField("rev_id", LongType, nullable = false),
    StructField("rev_ts", StringType),
    StructField("contributor", StringType),
    StructField("page_text", StringType),
    StructField("is_redirect", BooleanType, nullable = false),
    StructField("page_ok", BooleanType, nullable = false)))

  /** XML dump → page rows ([[Xml.parseDump]] streaming StAX walk):
    * the per-page twin of [[archiveMembersColumn]] — partition-local
    * flatMap, dump bytes never shuffle. */
  def xmlPagesColumn(df: DataFrame, mediaCol: String): DataFrame = {
    val mi = df.schema.fieldIndex(mediaCol)
    val keep = df.schema.fields.indices.filterNot(_ == mi)
    val schema = StructType(keep.map(df.schema.fields) ++ XmlPageType.fields)
    mapBatched(df, schema) { it =>
      it.flatMap { row =>
        val parent = keep.map(row.get)
        Xml.parseDump(row.getAs[Array[Byte]](mi)).iterator.map { p =>
          Row.fromSeq(parent ++ Seq(p.id, p.ns, p.title, p.revId,
            p.timestamp, p.contributor, p.text, p.redirect, p.ok))
        }
      }
    }
  }

  /** Group docs into per-group mboxrd mail archives ([[Mbox.build]]);
    * message fields derive from (id, text) by the formulas the
    * q_source_mbox oracle replays: from `user<id%50>@example<id%20>
    * .com`, a FOLDED two-address To list, subject `Re: doc <id>` —
    * or, when id%3 = 0, `Résumé <id>` as two adjacent RFC 2047
    * B-encoded words across a fold (they must rejoin without a
    * space), date day id%28+1 / hour id%24, transfer encoding id%3
    * → {7bit (From-stuffed), quoted-printable, base64}, and for
    * id%4 = 0 a multipart/mixed attachment of id%100+10 bytes
    * 0,1,2,.. (unsigned sum = L(L−1)/2, the closed form the oracle
    * uses). The body is the doc text verbatim whatever the coding. */
  def mboxBuildFiles(df: DataFrame, groupCols: Seq[String], idCol: String,
                     textCol: String, outCol: String = "media"): DataFrame =
    archiveBuildFiles(df, groupCols, idCol, textCol, outCol) { docs =>
      Mbox.build(docs.map { case (id, text) =>
        Mbox.MsgSpec(s"user${id % 50}@example${id % 20}.com",
          Vector("list@example.org", s"cc${id % 9}@example.net"),
          if (id % 3 == 0) s"Résumé $id" else s"Re: doc $id",
          encodeSubject = id % 3 == 0,
          s"Thu, ${id % 28 + 1} Feb 2024 " + f"${id % 24}%02d:00:00 +0000",
          s"<m$id@x>", (id % 3).toInt, text,
          if (id % 4 == 0)
            Some(Array.tabulate((id % 100 + 10).toInt)(i => i.toByte))
          else None,
          // reply structure: ids form threads of 5 — id%5 = 0 is the
          // root, every reply carries In-Reply-To (its predecessor)
          // and the full folded References chain back to the root
          replyTo = if (id % 5 > 0) Some(s"<m${id - 1}@x>") else None,
          references = if (id % 5 > 0)
            (id - id % 5 until id).map(k => s"<m$k@x>").toVector
          else Vector.empty)
      })
    }

  val MboxMsgType: StructType = StructType(Seq(
    StructField("msg_from", StringType),
    StructField("n_to", IntegerType, nullable = false),
    StructField("subject", StringType),
    StructField("msg_date", StringType),
    StructField("msg_id", StringType),
    StructField("cte", StringType),
    StructField("body", StringType),
    StructField("n_parts", IntegerType, nullable = false),
    StructField("att_bytes", IntegerType, nullable = false),
    StructField("att_digest", LongType, nullable = false),
    StructField("in_reply_to", StringType),
    StructField("n_refs", IntegerType, nullable = false),
    StructField("thread_root", StringType),
    StructField("msg_ok", BooleanType, nullable = false)))

  /** mbox archive → message rows ([[Mbox.parse]]: separator split,
    * header unfold, encoded-word decode, MIME walk, transfer decode).
    * Partition-local flatMap; archive bytes never shuffle.
    * `att_digest` is the unsigned byte sum of the decoded attachment
    * — pins the base64 attachment path, not just its length. */
  def mboxMessagesColumn(df: DataFrame, mediaCol: String): DataFrame = {
    val mi = df.schema.fieldIndex(mediaCol)
    val keep = df.schema.fields.indices.filterNot(_ == mi)
    val schema = StructType(keep.map(df.schema.fields) ++ MboxMsgType.fields)
    mapBatched(df, schema) { it =>
      it.flatMap { row =>
        val parent = keep.map(row.get)
        Mbox.parse(row.getAs[Array[Byte]](mi)).iterator.map { m =>
          var dig = 0L
          m.attachment.foreach(b => dig += (b & 0xff))
          Row.fromSeq(parent ++ Seq(m.from, m.to.length, m.subject,
            m.date, m.msgId, m.cte, m.body, m.nParts,
            m.attachment.length, dig, m.inReplyTo, m.references.length,
            m.references.headOption.getOrElse(m.msgId), m.ok))
        }
      }
    }
  }

  /** Per-doc EPUB ([[Epub.build]]): id%3+2 chapters of two formula
    * lines each (the second carries raw `&`/`<`/`>` so the XHTML
    * escape → entity-decode round-trip is exercised in every
    * chapter), dc:title `Book <id>`, and — for odd ids — a spine
    * listed in REVERSE of archive order, so a reader that walks zip
    * order instead of the spine reverses half the corpus. */
  def epubBuildColumn(df: DataFrame, idCol: String,
                      outCol: String = "media"): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val ii = df.schema.fieldIndex(idCol)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val id = row.getLong(ii)
        val n = (id % 3 + 2).toInt
        val chapters = (1 to n).map(i => Seq(
          s"Chapter $i of book $id", s"a & b < c #$id v$i"))
        val order = if (id % 2 == 1) (n - 1) to 0 by -1 else 0 until n
        Row.fromSeq(row.toSeq :+
          Epub.build(s"Book $id", chapters, order))
      }
    }
  }

  val EpubBookType: StructType = StructType(Seq(
    StructField("book_title", StringType),
    StructField("n_chapters", IntegerType, nullable = false),
    StructField("book_text", StringType),
    StructField("book_ok", BooleanType, nullable = false)))

  /** EPUB → one book row ([[Epub.parse]]: OCF zip walk → container →
    * OPF → spine-ordered chapter extraction): `book_text` is the
    * chapters joined with newlines IN SPINE ORDER. Partition-local;
    * container bytes never shuffle. */
  def epubBookColumn(df: DataFrame, mediaCol: String): DataFrame = {
    val mi = df.schema.fieldIndex(mediaCol)
    val keep = df.schema.fields.indices.filterNot(_ == mi)
    val schema = StructType(keep.map(df.schema.fields) ++
      EpubBookType.fields)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val parent = keep.map(row.get)
        val bk = Epub.parse(row.getAs[Array[Byte]](mi))
        Row.fromSeq(parent ++ Seq(bk.title, bk.chapters.length,
          bk.chapters.mkString("\n"), bk.ok))
      }
    }
  }

  /** Per-doc subtitle track ([[Subtitles.buildSrt]]/[[Subtitles
    * .buildVtt]]): id%4+2 cues whose times and text derive from the
    * doc id by the formulas the q_source_subtitles oracle replays —
    * cue i starts at (id·97)%100000 + i·4000 ms and runs 1500 +
    * (id+i)%2000 ms with two-line text `Cue <id> n <i+1>` /
    * `w <(id+i)%7>`. Odd ids ship WebVTT (NOTE blocks when id%3 = 0,
    * `<i>` markup on cues with (id+i)%3 = 0 — stripped on parse, so
    * the text checksum is format-invariant), even ids SubRip. */
  def subtitleBuildColumn(df: DataFrame, idCol: String,
                          outCol: String = "media"): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val ii = df.schema.fieldIndex(idCol)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val id = row.getLong(ii)
        val cues = Vector.tabulate((id % 4 + 2).toInt) { i =>
          val start = id * 97 % 100000 + i * 4000
          Subtitles.Cue(start, start + 1500 + (id + i) % 2000,
            s"Cue $id n ${i + 1}\nw ${(id + i) % 7}")
        }
        val bytes =
          if (id % 2 == 1)
            Subtitles.buildVtt(cues, notes = id % 3 == 0,
              i => (id + i) % 3 == 0)
          else Subtitles.buildSrt(cues)
        Row.fromSeq(row.toSeq :+ bytes)
      }
    }
  }

  val SubtitleCueType: StructType = StructType(Seq(
    StructField("cue_idx", IntegerType, nullable = false),
    StructField("start_ms", LongType, nullable = false),
    StructField("end_ms", LongType, nullable = false),
    StructField("cue_text", StringType),
    StructField("sub_vtt", BooleanType, nullable = false)))

  /** Subtitle track → cue rows ([[Subtitles.parse]], either format
    * by magic). Partition-local flatMap; track bytes never shuffle. */
  def subtitleCuesColumn(df: DataFrame, mediaCol: String): DataFrame = {
    val mi = df.schema.fieldIndex(mediaCol)
    val keep = df.schema.fields.indices.filterNot(_ == mi)
    val schema = StructType(keep.map(df.schema.fields) ++
      SubtitleCueType.fields)
    mapBatched(df, schema) { it =>
      it.flatMap { row =>
        val parent = keep.map(row.get)
        val b = row.getAs[Array[Byte]](mi)
        val vtt = b != null && b.length >= 6 &&
          new String(b, 0, 6, java.nio.charset.StandardCharsets.UTF_8)
            .startsWith("WEBVTT")
        Subtitles.parse(b).iterator.zipWithIndex.map { case (c, i) =>
          Row.fromSeq(parent ++ Seq(i, c.startMs, c.endMs, c.text, vtt))
        }
      }
    }
  }

  /** Per-doc PDF build ([[Pdf.build]] / [[Pdf.appendUpdate]]): page 1
    * carries the doc text verbatim (one text block — round-trips the
    * literal-string escaping exactly); each of `extraCol` additional
    * pages j = 2.. carries the two formula blocks
    * `Doc <id> page <j>` / `k(v)=\<id>` (parens + backslash exercise
    * the escape path on every extra page; the q_source_pdf oracle
    * rebuilds the extracted text from these formulas). `flateCol`
    * selects FlateDecode vs raw content streams, `indirectCol` an
    * indirect integer /Length object, and `incrementalCol` writes the
    * extra pages as a REAL incremental update (second xref section +
    * /Prev chain, pages root rewritten newest-wins) instead of a
    * single generation. `xstreamCol` selects the PDF 1.5 form
    * ([[Pdf.buildXrefStream]]: cross-reference stream under the PNG
    * Up predictor + object stream) and takes precedence over the
    * incremental flag. */
  def pdfBuildColumn(df: DataFrame, idCol: String, textCol: String,
                     extraCol: String, flateCol: String,
                     indirectCol: String, incrementalCol: String,
                     xstreamCol: String,
                     outCol: String = "media"): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val is = Seq(idCol, textCol, extraCol, flateCol, indirectCol,
      incrementalCol, xstreamCol).map(df.schema.fieldIndex)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val id = row.getLong(is(0))
        val flate = row.getBoolean(is(3))
        val ind = row.getBoolean(is(4))
        val pages = Pdf.PageSpec(Vector(row.getString(is(1))), flate, ind) +:
          (2 to row.getInt(is(2)) + 1).toVector.map(j =>
            Pdf.PageSpec(Vector(s"Doc $id page $j", s"k(v)=\\$id"),
              flate, ind))
        val bytes =
          if (row.getBoolean(is(6))) Pdf.buildXrefStream(pages)
          else if (row.getBoolean(is(5)) && pages.length > 1)
            Pdf.appendUpdate(Pdf.build(pages.take(1)), pages.drop(1))
          else Pdf.build(pages)
        Row.fromSeq(row.toSeq :+ bytes)
      }
    }
  }

  val PdfPageType: StructType = StructType(Seq(
    StructField("page_idx", IntegerType, nullable = false),
    StructField("page_text", StringType),
    StructField("page_flate", BooleanType, nullable = false),
    StructField("pdf_pages", IntegerType, nullable = false),
    StructField("pdf_size", IntegerType, nullable = false),
    StructField("pdf_updated", BooleanType, nullable = false),
    StructField("pdf_xstream", BooleanType, nullable = false),
    StructField("pdf_ok", BooleanType, nullable = false)))

  /** PDF → page rows ([[Pdf.parse]]: startxref → xref chain → page
    * tree → content decode → text-operator scan). Partition-local
    * flatMap; document bytes never shuffle; a damaged doc contributes
    * the pages recovered before the damage (possibly none). Doc-level
    * fields (`pdf_pages`/`pdf_size`/`pdf_updated`/`pdf_ok`) repeat on
    * every page row — aggregate them gated on `page_idx = 0`. */
  def pdfPagesColumn(df: DataFrame, mediaCol: String): DataFrame = {
    val mi = df.schema.fieldIndex(mediaCol)
    val keep = df.schema.fields.indices.filterNot(_ == mi)
    val schema = StructType(keep.map(df.schema.fields) ++ PdfPageType.fields)
    mapBatched(df, schema) { it =>
      it.flatMap { row =>
        val parent = keep.map(row.get)
        val doc = Pdf.parse(row.getAs[Array[Byte]](mi))
        doc.pages.iterator.zipWithIndex.map { case (p, i) =>
          Row.fromSeq(parent ++ Seq(i, p.text, p.flate, doc.pages.length,
            doc.size, doc.updated, doc.xrefStream, doc.ok))
        }
      }
    }
  }

  /** Two deliberately-messy spellings of each doc's page URL — the
    * frontier-dedup fixture. Variant 1 piles on every normalization
    * the canonicalizer claims: uppercase scheme/host, explicit
    * default port (or one with a leading zero), '..' and
    * percent-encoded '.' dot-segments, lowercase reserved and
    * decodable unreserved escapes, a fragment. Variant 2 is a
    * DIFFERENT spelling (trailing host dot, other dot-segment mix)
    * of the SAME canonical URL, so distinct-canonical halves the
    * listed count. Both reduce to
    * `http(s)://example{id%20}.com[:8080]/a/c{id%5}/foo/page{id}%2Fx[?q={id}&x=A]`
    * — the formula the DuckDB oracle rebuilds directly. */
  def messyUrl1(id: Long): String = {
    val https = id % 2 == 1
    val scheme = if (https) "hTtPs" else "HTTP"
    val port = (id % 3) match {
      case 0 => if (https) ":443" else ":80"
      case 1 => ":08080"
      case _ => ""
    }
    val q = if (id % 4 == 0) s"?q=$id&x=%41" else ""
    s"$scheme://ExAmple${id % 20}.CoM$port/a/b${id % 7}/../c${id % 5}" +
      s"/%2E/f%6fo/page$id%2fx$q#s$id"
  }

  def messyUrl2(id: Long): String = {
    val scheme = if (id % 2 == 1) "https" else "http"
    val port = if (id % 3 == 1) ":8080" else ""
    val q = if (id % 4 == 0) s"?q=$id&x=A" else ""
    s"$scheme://example${id % 20}.COM.$port/a/x/../c${id % 5}/foo/./page$id%2Fx$q"
  }

  /** Both messy spellings as rows — 2 rows per input, `(…, outCol)`.
    * Partition-local flatMap, stream-safe. */
  def messyUrlsColumn(df: DataFrame, idCol: String,
                      outCol: String = "url"): DataFrame = {
    val ii = df.schema.fieldIndex(idCol)
    val schema = df.schema.add(outCol, StringType)
    mapBatched(df, schema) { it =>
      it.flatMap { row =>
        val id = row.getLong(ii)
        Iterator(Row.fromSeq(row.toSeq :+ messyUrl1(id)),
          Row.fromSeq(row.toSeq :+ messyUrl2(id)))
      }
    }
  }

  /** Per-group sitemaps.org `<urlset>` blobs ([[Sitemaps.buildUrlset]]):
    * each doc lists BOTH messy spellings of its URL with
    * lastmod/changefreq/priority derived from the id (the oracle's
    * formulas). The '&' in every id%4==0 query string exercises XML
    * entity escaping through the round-trip. */
  def sitemapBuildFiles(df: DataFrame, groupCols: Seq[String], idCol: String,
                        textCol: String, outCol: String = "media"): DataFrame =
    archiveBuildFiles(df, groupCols, idCol, textCol, outCol) { docs =>
      Sitemaps.buildUrlset(docs.flatMap { case (id, _) =>
        val lastmod = f"2024-01-${id % 28 + 1}%02d"
        val freq = (id % 3) match {
          case 0 => "daily" case 1 => "weekly" case _ => "monthly"
        }
        Seq(Sitemaps.Entry(messyUrl1(id), lastmod, freq, (id % 10).toInt,
            ok = true),
          Sitemaps.Entry(messyUrl2(id), lastmod, freq, (id % 10).toInt,
            ok = true))
      })
    }

  val SitemapEntryType: StructType = StructType(Seq(
    StructField("loc", StringType),
    StructField("lastmod", StringType),
    StructField("changefreq", StringType),
    StructField("priority10", IntegerType, nullable = false),
    StructField("entry_ok", BooleanType, nullable = false)))

  /** Sitemap blob → `<url>` entry rows ([[Sitemaps.parseUrlset]]
    * streaming StAX walk) — partition-local flatMap, bytes never
    * shuffle. */
  def sitemapEntriesColumn(df: DataFrame, mediaCol: String): DataFrame = {
    val mi = df.schema.fieldIndex(mediaCol)
    val keep = df.schema.fields.indices.filterNot(_ == mi)
    val schema = StructType(keep.map(df.schema.fields) ++
      SitemapEntryType.fields)
    mapBatched(df, schema) { it =>
      it.flatMap { row =>
        val parent = keep.map(row.get)
        Sitemaps.parseUrlset(row.getAs[Array[Byte]](mi)).iterator.map { e =>
          Row.fromSeq(parent ++ Seq(e.loc, e.lastmod, e.changefreq,
            e.priority10, e.ok))
        }
      }
    }
  }

  private def archiveBuildFiles(df: DataFrame, groupCols: Seq[String],
                                idCol: String, textCol: String,
                                outCol: String)(
      build: Vector[(Long, String)] => Array[Byte]): DataFrame = {
    val grouped = df.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col(idCol).as("id"),
        col(textCol).as("text")))).as("_docs"))
    val schema = StructType(grouped.schema.fields.filterNot(_.name == "_docs"))
      .add(outCol, BinaryType)
    val di = grouped.schema.fieldIndex("_docs")
    mapBatched(grouped, schema) { it =>
      it.map { row =>
        val docs = row.getSeq[Row](di)
          .map(r => (r.getLong(0), r.getString(1))).toVector
        Row.fromSeq(row.toSeq.patch(di, Nil, 1) :+ build(docs))
      }
    }
  }

  val ExifInfoType: StructType = StructType(Seq(
    StructField("big_endian", BooleanType, nullable = false),
    StructField("make", StringType),
    StructField("model", StringType),
    StructField("orientation", IntegerType, nullable = false),
    StructField("year", IntegerType, nullable = false),
    StructField("year_original", IntegerType, nullable = false),
    StructField("has_gps", BooleanType, nullable = false),
    StructField("lat_milli", LongType),
    StructField("lon_milli", LongType)))

  /** Build a tiny real JPEG (one shared 8×8 base per partition — the
    * pixels don't vary, the metadata does) carrying a canonical EXIF
    * APP1 from parameter columns ([[Exif.tiffBytes]]/[[Exif.withExif]]).
    * `latCol`/`lonCol` are signed millidegrees; gps is omitted when
    * `hasGpsCol` is false. `bigEndianCol` selects MM vs II TIFF
    * order, so the parse path proves both. */
  def exifBuildColumn(df: DataFrame, makeCol: String, modelCol: String,
                      orientCol: String, yearCol: String, latCol: String,
                      lonCol: String, hasGpsCol: String,
                      bigEndianCol: String,
                      outCol: String = "media"): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val is = Seq(makeCol, modelCol, orientCol, yearCol, latCol, lonCol,
      hasGpsCol, bigEndianCol).map(df.schema.fieldIndex)
    mapBatched(df, schema) { it =>
      lazy val base = Codecs.encodeJpeg(8, 8, Array.fill(8 * 8 * 3)(96.toByte))
      it.map { row =>
        val year = row.getInt(is(3))
        val gps = if (row.getBoolean(is(6)))
          Some((row.getLong(is(4)), row.getLong(is(5)))) else None
        val tiff = Exif.tiffBytes(row.getBoolean(is(7)),
          row.getString(is(0)), row.getString(is(1)), row.getInt(is(2)),
          f"$year%04d:01:01 00:00:00", f"${year + 1}%04d:06:15 12:00:00",
          gps)
        Row.fromSeq(row.toSeq :+ Exif.withExif(base, tiff))
      }
    }
  }

  /** Parse the EXIF APP1 ([[Exif.parse]]) into an [[ExifInfoType]]
    * struct (null when absent); years are parsed from the DateTime /
    * DateTimeOriginal prefixes so the agg side stays integer. */
  def exifMetaColumn(df: DataFrame, mediaCol: String,
                     outCol: String = "exif",
                     blockSize: Int = 1024): DataFrame =
    parsedColumn(df, mediaCol, outCol, ExifInfoType, blockSize)(b =>
      Exif.parse(b).map { e =>
        def yr(s: String): Int =
          if (s.length >= 4 && s.take(4).forall(_.isDigit)) s.take(4).toInt
          else 0
        Row(e.bigEndian, e.make, e.model, e.orientation, yr(e.dateTime),
          yr(e.dateTimeOriginal), e.hasGps, e.gpsLatMilli.orNull,
          e.gpsLonMilli.orNull)
      }.orNull)

  /** GPS strip ([[Exif.stripGps]]): replaces the media bytes with the
    * location-scrubbed form and appends `removed` (bytes dropped; 0
    * when no GPS) and `scan_same` (the non-APP1 bytes — scan data,
    * quant tables, everything image-affecting — are byte-identical
    * before/after, the "pixels untouched" guarantee as a column). */
  def exifStripColumn(df: DataFrame, mediaCol: String,
                      removedCol: String = "removed",
                      scanSameCol: String = "scan_same"): DataFrame = {
    val schema = StructType(df.schema.fields.map(f =>
      if (f.name == mediaCol) f.copy(dataType = BinaryType) else f))
      .add(removedCol, IntegerType, nullable = false)
      .add(scanSameCol, BooleanType, nullable = false)
    val mi = df.schema.fieldIndex(mediaCol)
    mapBatched(df, schema) { it =>
      it.map { row =>
        val b = row.getAs[Array[Byte]](mi)
        val (cleaned, removed) = Exif.stripGps(b)
        val same = java.util.Arrays.equals(Exif.dropApp1(b),
          Exif.dropApp1(cleaned))
        Row.fromSeq(row.toSeq.updated(mi, cleaned) ++ Seq(removed, same))
      }
    }
  }

  /** Mixed-format media fixture for the sniffing round-trip: per row
    * build REAL bytes of the format selected by `selCol` (0..19 →
    * jpeg png gif bmp wav adpcm-wav flac mp3 mp4 zip gzip tar text
    * binary xml pdf mbox vtt srt epub), each through the repo's own
    * encoder for that format. Text-carrying formats embed the doc
    * text so sizes vary. */
  def sniffBuildColumn(df: DataFrame, selCol: String, textCol: String,
                       outCol: String = "media"): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val si = df.schema.fieldIndex(selCol)
    val ti = df.schema.fieldIndex(textCol)
    mapBatched(df, schema) { it =>
      lazy val gray = Array.tabulate[Byte](8 * 8)(i => (i * 4 - 128).toByte)
      lazy val rgb = Array.tabulate[Byte](8 * 8 * 3)(i => (i - 96).toByte)
      lazy val pcm = Array.tabulate(130)(t => (t * 211) % 8192 - 4096)
      lazy val pcmS = pcm.map(_.toShort)
      it.map { row =>
        val text = row.getString(ti)
        val tb = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val media = (row.getInt(si): @unchecked) match {
          case 0 => Codecs.encodeJpeg(8, 8, rgb)
          case 1 => Codecs.encodeImage(8, 8, rgb, "png")
          case 2 => Gif.encodeAnimated(8, 8, Seq(gray))
          case 3 => Codecs.encodeBmp(8, 8, rgb)
          case 4 => Codecs.encodeWavMono(8000, pcmS)
          case 5 => Adpcm.encode(8000, pcm)
          case 6 => Flac.encode(8000, pcm)
          case 7 => Mp3.buildFrames(mpeg1 = true, brIdx = 5, srIdx = 0,
            nFrames = 2)
          case 8 => Mp4.buildMinimal(1000L, 2000L, 16, 16, "avc1",
            "vide", 32)
          case 9 => Archive.buildZip(Seq(("d.txt", tb)), _ => true)
          case 10 =>
            val bos = new java.io.ByteArrayOutputStream(tb.length / 2 + 32)
            val g = new java.util.zip.GZIPOutputStream(bos)
            g.write(tb); g.close()
            bos.toByteArray
          case 11 => Warc.gunzipAll(
            Archive.buildTarGz(Seq(("d.txt", tb)), _ => 7L))
          case 12 => tb
          case 13 => Array.tabulate[Byte](24)(i => (i % 7).toByte)
          case 14 => Xml.buildDump(Seq(Xml.Page(1L, 0, "P&1", 10L,
            "2024-01-01T00:00:00Z", "u", text, redirect = false,
            ok = true)))
          case 15 => Pdf.build(Seq(Pdf.PageSpec(Vector(text),
            flate = true, indirectLength = false)))
          case 16 => Mbox.build(Seq(Mbox.MsgSpec("a@example.com",
            Vector("l@example.org"), "s", encodeSubject = false,
            "Thu, 1 Feb 2024 00:00:00 +0000", "<m@x>", 0, text, None)))
          case 17 => Subtitles.buildVtt(Seq(
            Subtitles.Cue(0L, 1500L, text)), notes = false, _ => false)
          case 18 => Subtitles.buildSrt(Seq(
            Subtitles.Cue(0L, 1500L, text)))
          case 19 => Epub.build("B", Seq(Seq(text)), Seq(0))
        }
        Row.fromSeq(row.toSeq :+ media)
      }
    }
  }

  /** Route each blob to ITS sniffed format's text extractor — the
    * stage after [[Sniff.detect]] in a real mixed-corpus ingest:
    * text/gzip decode in place, zip/tar members extract, XML dumps
    * walk to page text, PDFs to page text, mbox to bodies, subtitle
    * tracks to cue text, EPUBs to spine-ordered chapters; media and
    * binary blobs yield null (they go to the codec pipelines, not
    * the text one). Per-row partition-local switch; bytes never
    * shuffle. */
  def routeExtractColumn(df: DataFrame, fmtCol: String, mediaCol: String,
                         outCol: String = "extracted"): DataFrame = {
    val schema = df.schema.add(outCol, StringType)
    val fi = df.schema.fieldIndex(fmtCol)
    val mi = df.schema.fieldIndex(mediaCol)
    mapBatched(df, schema) { it =>
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      it.map { row =>
        val b = row.getAs[Array[Byte]](mi)
        val t: String = row.getString(fi) match {
          case "text" => new String(b, utf8)
          case "xml" => Xml.parseDump(b).map(_.text).mkString("\n")
          case "pdf" => Pdf.parse(b).pages.map(_.text).mkString("\n")
          case "mbox" => Mbox.parse(b).map(_.body).mkString("\n")
          case "vtt" | "srt" =>
            Subtitles.parse(b).map(_.text).mkString("\n")
          case "epub" => Epub.parse(b).chapters.mkString("\n")
          case "zip" =>
            Archive.parseZip(b).filter(_.ok).map(_.text).mkString("\n")
          case "gzip" => new String(Warc.gunzipAll(b), utf8)
          case "tar" =>
            Archive.parseTar(b).filter(_.ok).map(_.text).mkString("\n")
          case _ => null
        }
        Row.fromSeq(row.toSeq :+ t)
      }
    }
  }

  /** Format label per row ([[Sniff.detect]]): the magic-byte router a
    * blob pipeline runs before choosing a decoder. Batched
    * partition-local; bytes never shuffle. */
  def sniffColumn(df: DataFrame, mediaCol: String,
                  outCol: String = "fmt"): DataFrame = {
    val schema = df.schema.add(outCol, StringType)
    val mi = df.schema.fieldIndex(mediaCol)
    mapBatched(df, schema) { it =>
      it.map(row =>
        Row.fromSeq(row.toSeq :+ Sniff.detect(row.getAs[Array[Byte]](mi))))
    }
  }

  val ArchiveMemberType: StructType = StructType(Seq(
    StructField("member_name", StringType),
    StructField("n_member_bytes", LongType),
    StructField("member_deflated", BooleanType),
    StructField("member_mtime", LongType),
    StructField("member_ok", BooleanType),
    StructField("member_text", StringType)))

  /** Flatten ZIP (`format = "zip"`) or tar/tar.gz (`"tar"`) archives
    * into one row per member ([[Archive.parseZip]]/[[Archive.parseTar]]):
    * parent columns minus the bytes, plus name/size/method/mtime/
    * checksum-ok/text. Partition-local flatMap — an archive's members
    * never leave its partition, nothing archive-sized touches the
    * driver. This is the repo-corpus ingestion shape:
    * `spark.read.format("binaryFile")` → this → a documents table. */
  def archiveMembersColumn(df: DataFrame, mediaCol: String,
                           format: String): DataFrame = {
    val mi = df.schema.fieldIndex(mediaCol)
    val keep = df.schema.fields.indices.filterNot(_ == mi)
    val schema = StructType(keep.map(df.schema.fields) ++ ArchiveMemberType.fields)
    val isZip = format == "zip"
    mapBatched(df, schema) { it =>
      it.flatMap { row =>
        val parent = keep.map(row.get)
        val b = row.getAs[Array[Byte]](mi)
        val ms = if (isZip) Archive.parseZip(b) else Archive.parseTar(b)
        ms.iterator.map { m =>
          Row.fromSeq(parent ++ Seq(m.name, m.body.length.toLong,
            m.deflated, m.mtime, m.ok, m.text))
        }
      }
    }
  }

  /** Render a template HTML page per row (fixture side of the
    * extraction round-trip): title + fixed nav boilerplate + the body
    * as one escaped paragraph + script/style/comment noise. */
  def htmlBuildColumn(df: DataFrame, titleCol: String, bodyCol: String,
                      navItems: Seq[String], outCol: String = "html",
                      blockSize: Int = 1024): DataFrame = {
    val schema = df.schema.add(outCol, StringType)
    val is = Seq(titleCol, bodyCol).map(df.schema.fieldIndex)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        rows.iterator.map { row =>
          val page = Html.buildPage(row.getString(is(0)),
            Seq(row.getString(is(1)).replace('\n', ' ')), navItems)
          Row.fromSeq(row.toSeq :+ page)
        }
      }
    }
  }

  /** HTML → readable text ([[Html.extractText]] single-scan strip:
    * script/style/comments dropped, block tags break lines, character
    * references decoded, whitespace normalized). Partition-local
    * batched map — the step between WARC response bodies and a
    * `documents` table; no UDF registration, stream-safe like every
    * codec column here. */
  def htmlTextColumn(df: DataFrame, htmlCol: String,
                     outCol: String = "extracted",
                     blockSize: Int = 1024): DataFrame = {
    val schema = df.schema.add(outCol, StringType)
    val idx = df.schema.fieldIndex(htmlCol)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        rows.iterator.map { row =>
          Row.fromSeq(row.toSeq :+ Html.extractText(row.getString(idx)))
        }
      }
    }
  }

  def asMedia(df: DataFrame, srcCol: String, kind: String,
              mediaCol: String = "media",
              metaCol: String = "meta"): DataFrame = {
    val bin = col(srcCol).cast("binary")
    df.withColumn(mediaCol, bin)
      .withColumn(metaCol, struct(
        lit(kind).as("kind"),
        length(bin).cast("long").as("n_bytes"),
        sha2(bin, 256).as("sha")))
  }

  /** Deterministic frame/sample positions: 1, 1+stride, … ≤ maxLen.
    * The character code at each position (0 past end-of-media) is
    * summed — the cheap "frame sample checksum" used to verify
    * sampling plumbing without a codec. Takes the column NAME so the
    * identical formula can be emitted for the SQL oracle. */
  def frameSampleChecksum(textColName: String, stride: Int,
                          maxLen: Int): Column =
    expr(s"aggregate(transform(sequence(1, $maxLen, $stride), " +
      s"p -> CASE WHEN length($textColName) >= p " +
      s"THEN ascii(substring($textColName, p, 1)) ELSE 0 END), " +
      "CAST(0 AS BIGINT), (acc, v) -> acc + v)")

  /** STUB resize for COMPRESSED codecs (JPEG downscale, audio
    * resample — no codec libraries here; uncompressed BMP resizes for
    * real via [[resizeBmpColumn]]): keeps every `factor`-th byte — a
    * deterministic stand-in with the real contract: a new media column
    * whose metadata (n_bytes, sha) is recomputed, bytes never leaving
    * the partition. */
  def resizeStub(df: DataFrame, mediaCol: String, factor: Int,
                 outCol: String = "media_small",
                 blockSize: Int = 1024): DataFrame = {
    require(factor >= 1)
    val schema = df.schema.add(outCol, BinaryType)
    val idx = df.schema.fieldIndex(mediaCol)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        // >>> real batched re-encode would go here — STUBBED as a
        // byte subsample <<<
        rows.iterator.map { row =>
          val bytes = row.getAs[Array[Byte]](idx)
          val out = new Array[Byte]((bytes.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
          Row.fromSeq(row.toSeq :+ out)
        }
      }
    }.withColumn(outCol + "_meta", struct(
      lit("resized").as("kind"),
      length(col(outCol)).cast("long").as("n_bytes"),
      sha2(col(outCol), 256).as("sha")))
  }

  /** Frame decode through the pluggable [[FrameDecoder]] seam: the
    * decoder registered for `codec` (fallback: the deterministic
    * [[FrameDecoder.Stub]]) maps each media payload to a `featDim`
    * feature vector, batched `blockSize` rows per call inside ONE
    * partition-local map — the exact point a JNI/FFmpeg batch call
    * amortizes. Resolution happens HERE at plan-build time (driver);
    * the resolved instance is closed over, so a registry change
    * never re-routes a running query. Null features (undecodable
    * payloads) surface as null array entries. Everything a swap
    * cannot change — schema, batching, null contract, bytes staying
    * in their partition — lives in this method, not the decoder. */
  def decodeColumn(df: DataFrame, mediaCol: String, codec: String,
                   featDim: Int = 4, outCol: String = "features",
                   blockSize: Int = 1024): DataFrame = {
    require(featDim >= 1 && blockSize >= 1)
    val decoder = FrameDecoder.forCodec(codec)
    val schema = df.schema.add(outCol, ArrayType(DoubleType, false))
    val idx = df.schema.fieldIndex(mediaCol)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        val payloads = rows.iterator
          .map(_.getAs[Array[Byte]](idx)).toArray
        // the trait doc says implementations never throw, but the
        // null contract is enforced HERE so a misbehaving third-party
        // decoder degrades its batch to null features instead of
        // killing the task (and a decoder returning the wrong arity
        // degrades the same way rather than misaligning rows)
        val feats = try {
          val f = decoder.decodeBatch(payloads, featDim)
          if (f == null || f.length != payloads.length) null else f
        } catch { case _: Exception => null }
        rows.iterator.zipWithIndex.map { case (row, i) =>
          val f = if (feats == null) null else feats(i)
          Row.fromSeq(row.toSeq :+
            (if (f == null) null else (f.toSeq: Seq[Double])))
        }
      }
    }
  }

  /** STUB decode for COMPRESSED codecs (MP3/H.264 need native
    * libraries this environment doesn't ship; PCM WAV and 24-bpp BMP
    * decode for real via [[decodeWavColumn]]/[[decodeBmpColumn]],
    * JPEG/PNG/GIF via [[decodeImageColumn]]): [[decodeColumn]]
    * against a codec id nothing registers, i.e. the deterministic
    * [[FrameDecoder.Stub]] features. Signature, batching, and schema
    * are the real contract — register a [[FrameDecoder]] and call
    * [[decodeColumn]] with its codec id to upgrade in place. */
  def decodeStub(df: DataFrame, mediaCol: String, featDim: Int = 4,
                 outCol: String = "features",
                 blockSize: Int = 1024): DataFrame =
    decodeColumn(df, mediaCol, codec = "__stub__", featDim, outCol,
      blockSize)
}
