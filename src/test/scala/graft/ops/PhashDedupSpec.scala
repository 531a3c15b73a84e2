package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Image near-dup detection end-to-end: real BMP/PNG bytes → decoded
  * pixels → 64-bit pHash → [[Dedup.hammingPairs64]] band-blocked
  * candidate join → hamming verification. Pins that the hamming
  * machinery the text path oracles (q_dedup_hamming) does the image
  * job on real codec output, and that the banding is
  * pigeonhole-complete at tau = 3. */
class PhashDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic structured (blocky-texture) image — pHash's
    * domain. A SMOOTH gradient is the documented pathological case
    * (most AC coefficients ~0, the median threshold sits in that sea,
    * tiny noise flips half the bits), so the fixture must carry real
    * spatial structure, like photographs do. */
  private def blocky(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val i = 3 * (y * w + x)
      var v = (x / 8) * 73856093 + (y / 8) * 19349663 + seed
      v = (v ^ (v >>> 13)) * 1274126177
      rgb(i) = ((v >>> 8) & 0xff).toByte
      rgb(i + 1) = ((v >>> 16) & 0xff).toByte
      rgb(i + 2) = ((v >>> 24) & 0xff).toByte
    }
    rgb
  }

  test("pHash + hammingPairs64 finds recompressed/perturbed copies " +
    "and separates structurally different images") {
    val w = 64
    val h = 64
    val base = blocky(w, h, seed = 1)
    // visible local edit: +30 on one channel of a 4x4 patch
    val pert = base.clone()
    for (y <- 10 until 14; x <- 10 until 14) {
      val i = 3 * (y * w + x)
      pert(i) = (((pert(i) & 0xff) + 30) min 255).toByte
    }
    val other = blocky(w, h, seed = 2)
    val imgs = Seq(
      (1L, Codecs.encodeImage(w, h, base, "bmp")),
      (2L, Codecs.encodeImage(w, h, pert, "bmp")),
      (3L, Codecs.encodeImage(w, h, base, "jpg")), // JPEG recompress
      (4L, Codecs.encodeImage(w, h, other, "bmp")))
    val hashes = imgs.map { case (id, bytes) =>
      (id, Codecs.pHash64(bytes).get)
    }
    // JPEG recompression of the same pixels stays in the ball
    assert(java.lang.Long.bitCount(hashes(0)._2 ^ hashes(2)._2) <= 3)
    val df = hashes.toDF("img_id", "phash")
    val pairs = Dedup.hammingPairs64(df, "phash", "img_id", tau = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)), "identical pixels not paired")
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)),
      "mild perturbation broke the perceptual match")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "structurally different image leaked into the near-dup set")
  }

  test("hammingPairs64 banding is pigeonhole-complete at tau=3 and " +
    "rejects tau=4; bucket cap diverts a planted mega-band") {
    // adversarial signatures: 3 flipped bits spread over 3 DIFFERENT
    // bands — only the 4th band matches
    val a = 0x0123456789ABCDL
    val b3 = a ^ (1L << 0) ^ (1L << 16) ^ (1L << 32)
    val pairs = Dedup.hammingPairs64(
      Seq((1L, a), (2L, b3)).toDF("id", "h"), "h", "id", tau = 3)
      .collect()
    assert(pairs.length === 1 && pairs.head.getLong(2) === 3L)
    intercept[IllegalArgumentException] {
      Dedup.hammingPairs64(Seq((1L, a)).toDF("id", "h"), "h", "id",
        tau = 4)
    }
    // cap: 100 identical signatures -> all four bands oversize -> no
    // pairs from the capped path (the template family diverts)
    val many = (1L to 100L).map(i => (i, a)).toDF("id", "h")
    assert(Dedup.hammingPairs64(many, "h", "id", tau = 3,
      maxBucket = 50).count() === 0L)
    assert(Dedup.hammingPairs64(many, "h", "id", tau = 3,
      maxBucket = 0).count() === 100L * 99L / 2L)
  }

  test("simhash60 kernel: near-identical token sets land within the " +
    "hamming ball, disjoint vocabularies far outside it") {
    val t1 = (1 to 40).map(i => s"tok$i").mkString(" ")
    val t2 = (1 to 39).map(i => s"tok$i").mkString(" ") + " tokX"
    val t3 = (100 to 140).map(i => s"zz$i").mkString(" ")
    val Seq(h1, h2, h3) = Seq(t1, t2, t3).map(s =>
      TextHashFns.simhash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 6,
      s"one-token swap moved ${java.lang.Long.bitCount(h1 ^ h2)} bits")
    assert(java.lang.Long.bitCount(h1 ^ h3) > 12,
      "disjoint vocab landed near the base signature")
    assert(h1 >= 0 && h1 < (1L << 60))
  }
}
