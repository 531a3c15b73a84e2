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
