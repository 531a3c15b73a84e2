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
                      blockSize: Int = 1024): DataFrame = {
    val schema = df.schema.add(outCol, WavInfoType)
    val idx = df.schema.fieldIndex(mediaCol)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        rows.iterator.map { row =>
          val info = Codecs.decodeWav(row.getAs[Array[Byte]](idx)).orNull
          val struct = if (info == null) null
          else Row(info.sampleRate, info.channels, info.nFrames,
            info.rms, info.zeroCrossRate)
          Row.fromSeq(row.toSeq :+ struct)
        }
      }
    }
  }

  /** REAL image decode (24-bpp BMP): appends a [[BmpInfoType]] struct
    * (null for non-BMP bytes). */
  def decodeBmpColumn(df: DataFrame, mediaCol: String,
                      outCol: String = "bmp",
                      blockSize: Int = 1024): DataFrame = {
    val schema = df.schema.add(outCol, BmpInfoType)
    val idx = df.schema.fieldIndex(mediaCol)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        rows.iterator.map { row =>
          val info = Codecs.decodeBmp(row.getAs[Array[Byte]](idx)).orNull
          val struct = if (info == null) null
          else Row(info.width, info.height, info.meanR, info.meanG,
            info.meanB)
          Row.fromSeq(row.toSeq :+ struct)
        }
      }
    }
  }

  /** REAL compressed-image decode (JPEG/PNG/GIF via the JDK's own
    * ImageIO readers): appends a [[BmpInfoType]] struct (null for
    * bytes no installed reader accepts). Same partition-local batched
    * shape as [[decodeBmpColumn]]. */
  def decodeImageColumn(df: DataFrame, mediaCol: String,
                        outCol: String = "img",
                        blockSize: Int = 1024): DataFrame = {
    val schema = df.schema.add(outCol, BmpInfoType)
    val idx = df.schema.fieldIndex(mediaCol)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        rows.iterator.map { row =>
          val info = Codecs.decodeImage(row.getAs[Array[Byte]](idx)).orNull
          val struct = if (info == null) null
          else Row(info.width, info.height, info.meanR, info.meanG,
            info.meanB)
          Row.fromSeq(row.toSeq :+ struct)
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
          val b = row.getAs[Array[Byte]](idx)
          Row.fromSeq(row.toSeq :+
            Codecs.aHash64(b).map(Long.box).orNull :+
            Codecs.pHash64(b).map(Long.box).orNull)
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
    StructField("height", IntegerType)))

  /** ISO BMFF container metadata per row ([[Mp4.parseMeta]] box
    * walk — duration, mdat size, container bitrate, first-track
    * handler/codec/dimensions), null for bytes that hold no valid
    * moov. No frame decode; pure-JVM byte arithmetic, batched
    * partition-local, stream-safe. */
  def mp4MetaColumn(df: DataFrame, mediaCol: String,
                    outCol: String = "mp4",
                    blockSize: Int = 1024): DataFrame = {
    val schema = df.schema.add(outCol, Mp4MetaType)
    val idx = df.schema.fieldIndex(mediaCol)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        rows.iterator.map { row =>
          val meta = Mp4.parseMeta(row.getAs[Array[Byte]](idx)) match {
            case Some(m) =>
              val t = m.tracks.headOption
                .getOrElse(Mp4.TrackInfo("", "", 0, 0))
              Row(m.durationMs, m.mdatBytes, m.bitrateBps,
                m.tracks.length, t.handler, t.codec, t.width, t.height)
            case None => null
          }
          Row.fromSeq(row.toSeq :+ meta)
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

  /** STUB decode for COMPRESSED codecs (JPEG/PNG/MP3 need native
    * libraries this environment doesn't ship; PCM WAV and 24-bpp BMP
    * decode for real via [[decodeWavColumn]]/[[decodeBmpColumn]]):
    * produces a deterministic fake feature vector from the bytes
    * themselves (length-salted rolling hash per feature). Signature,
    * batching, and schema are the real contract. */
  def decodeStub(df: DataFrame, mediaCol: String, featDim: Int = 4,
                 outCol: String = "features",
                 blockSize: Int = 1024): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(DoubleType, false))
    val idx = df.schema.fieldIndex(mediaCol)
    mapBatched(df, schema) { it =>
      it.grouped(blockSize).flatMap { rows =>
        // >>> real codec batch call would go here (e.g. JNI decode of
        // rows(i).getAs[Array[Byte]](idx)) — STUBBED deterministically <<<
        rows.iterator.map { row =>
          val bytes = row.getAs[Array[Byte]](idx)
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
          Row.fromSeq(row.toSeq :+ (feats.toSeq: Seq[Double]))
        }
      }
    }
  }
}
