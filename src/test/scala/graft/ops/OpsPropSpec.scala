package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property laws for the driver-side kernels that back the pipeline
  * operators — no Spark needed, so these run wide and fast. */
class OpsPropSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("TopKBuffer == sort-then-take for any input sequence and k, " +
    "under any insert/merge split") {
    val gen = for {
      k <- Gen.choose(1, 8)
      xs <- Gen.listOf(Gen.zip(Gen.choose(-100, 100).map(_ / 10.0),
        Gen.choose(0L, 50L)))
      split <- Gen.choose(0, math.max(0, xs.length))
    } yield (k, xs, split)
    check(Prop.forAll(gen) { case (k, xs, split) =>
      val direct = new TopKBuffer(k)
      xs.foreach { case (s, id) => direct.insert(s, id) }
      val (l, r) = xs.splitAt(split)
      val b1 = new TopKBuffer(k)
      l.foreach { case (s, id) => b1.insert(s, id) }
      val b2 = new TopKBuffer(k)
      r.foreach { case (s, id) => b2.insert(s, id) }
      b1.mergeFrom(b2)
      // strict (score desc, id asc) order: the buffer's exact (score,
      // id) sequence — not just the score multiset — must equal
      // sort-take, under ANY insert order or merge split
      val want = xs.sortBy { case (s, id) => (-s, id) }.take(k)
      def asList(b: TopKBuffer) =
        (0 until b.n).map(i => (b.scores(i), b.ids(i))).toList
      asList(direct) == want && asList(b1) == want
    })
  }

  test("TopKBuffer rejects NaN scores: result equals sort-take of the " +
    "non-NaN inputs regardless of where NaNs arrive") {
    val gen = for {
      k <- Gen.choose(1, 6)
      xs <- Gen.listOf(Gen.zip(
        Gen.frequency(
          4 -> Gen.choose(-100, 100).map(_ / 10.0),
          1 -> Gen.const(Double.NaN)),
        Gen.choose(0L, 50L)))
    } yield (k, xs)
    check(Prop.forAll(gen) { case (k, xs) =>
      val b = new TopKBuffer(k)
      xs.foreach { case (s, id) => b.insert(s, id) }
      val want = xs.map(_._1).filterNot(_.isNaN)
        .sorted(Ordering[Double].reverse).take(k)
      b.scores.take(b.n).toSeq == want
    })
  }

  test("BMP encode→resize-to-same-size is the identity; decode means " +
    "match a direct pixel computation") {
    val gen = for {
      w <- Gen.choose(1, 12)
      h <- Gen.choose(1, 12)
      px <- Gen.listOfN(3 * w * h, Gen.choose(0, 255))
    } yield (w, h, px.map(_.toByte).toArray)
    check(Prop.forAll(gen) { case (w, h, rgb) =>
      val bmp = Codecs.encodeBmp(w, h, rgb)
      val info = Codecs.decodeBmp(bmp).get
      def mean(c: Int) =
        rgb.indices.filter(_ % 3 == c).map(i => rgb(i) & 0xff).sum /
          (w * h).toDouble
      // nearest-neighbor resize to the SAME dims picks every source
      // pixel exactly once → byte-identical re-encode
      Codecs.resizeBmp(bmp, w, h).get.sameElements(bmp) &&
        info.width == w && info.height == h &&
        math.abs(info.meanR - mean(0)) < 1e-9 &&
        math.abs(info.meanG - mean(1)) < 1e-9 &&
        math.abs(info.meanB - mean(2)) < 1e-9
    }, n = 100)
  }

  test("WAV decode statistics match a direct sample computation for " +
    "arbitrary PCM signals and channel counts") {
    val gen = for {
      ch <- Gen.choose(1, 3)
      frames <- Gen.choose(1, 64)
      samples <- Gen.listOfN(ch * frames,
        Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
    } yield (ch, frames, samples.map(_.toShort).toArray)
    check(Prop.forAll(gen) { case (ch, frames, samples) =>
      val dataLen = samples.length * 2
      val b = new Array[Byte](44 + dataLen)
      def put16(o: Int, v: Int): Unit = {
        b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      }
      def put32(o: Int, v: Int): Unit = {
        put16(o, v & 0xffff); put16(o + 2, (v >> 16) & 0xffff)
      }
      def tag(o: Int, s: String): Unit =
        s.getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) =>
          b(o + i) = c
        }
      tag(0, "RIFF"); put32(4, 36 + dataLen); tag(8, "WAVE")
      tag(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, ch)
      put32(24, 44100); put32(28, 44100 * 2 * ch); put16(32, 2 * ch)
      put16(34, 16); tag(36, "data"); put32(40, dataLen)
      samples.zipWithIndex.foreach { case (s, i) =>
        put16(44 + 2 * i, s & 0xffff)
      }
      val info = Codecs.decodeWav(b).get
      val rms = math.sqrt(samples.map(s =>
        math.pow(s / 32768.0, 2)).sum / samples.length)
      val zcrOk = frames == 1 || {
        val mono = (0 until frames).map(f => samples(f * ch))
        val crossings = mono.sliding(2).count(p =>
          (p(1) >= 0) != (p(0) >= 0))
        math.abs(info.zeroCrossRate -
          crossings.toDouble / (frames - 1)) < 1e-12
      }
      info.channels == ch && info.nFrames == frames.toLong &&
        math.abs(info.rms - rms) < 1e-12 && zcrOk
    }, n = 100)
  }

  test("codec parsers never throw on arbitrary bytes — including " +
    "RIFF/BMP/PNG/JPEG-prefixed garbage — they return None") {
    val prefixes = Seq(Array.empty[Byte], "RIFF".getBytes,
      "RIFFxxxxWAVE".getBytes, "BM".getBytes,
      Array[Byte](0x89.toByte, 'P', 'N', 'G'),
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte))
    val gen = for {
      p <- Gen.oneOf(prefixes)
      body <- Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield p ++ body.toArray
    check(Prop.forAll(gen) { bytes =>
      // a crafted header must yield None (or a well-formed decode for
      // the rare accidentally-valid input) — never an exception
      Codecs.decodeWav(bytes).forall(_.nFrames >= 0)
      Codecs.decodeBmp(bytes).forall(i => i.width > 0 && i.height > 0)
      Codecs.decodeImage(bytes).forall(i => i.width > 0 && i.height > 0)
      Codecs.aHash64(bytes)
      Codecs.resizeBmp(bytes, 2, 2)
      Codecs.resizeImage(bytes, 2, 2)
      Codecs.toneFeatures(bytes, Seq(440.0))
      true
    }, n = 300)
  }

  test("scriptProfile laws on arbitrary unicode text: bucket counts " +
    "partition the codepoints, dominant is consistent with the counts") {
    import org.apache.spark.unsafe.types.UTF8String
    // valid codepoints across scripts and planes, surrogates excluded
    val cpGen = Gen.oneOf(
      Gen.choose(0x20, 0x7E), Gen.choose(0x400, 0x4FF),
      Gen.choose(0x370, 0x3FF), Gen.choose(0x4E00, 0x4E80),
      Gen.choose(0xAC00, 0xAC60), Gen.choose(0x600, 0x6FF),
      Gen.choose(0x900, 0x97F), Gen.choose(0x1F600, 0x1F640),
      Gen.choose(0xA0, 0x24F))
    val sGen = Gen.listOf(cpGen).map(cps =>
      cps.map(cp => new String(Character.toChars(cp))).mkString)
    check(Prop.forAll(sGen) { s =>
      val r = TextHashFns.scriptProfile(UTF8String.fromString(s))
      val counts = (0 until 10).map(r.getLong)
      val dom = r.getUTF8String(10).toString
      val total = s.codePointCount(0, s.length)
      val scriptMax = counts.take(7).max
      counts.sum == total &&
        counts.forall(_ >= 0) &&
        (if (scriptMax == 0) dom == "none"
         else counts(TextHashFns.ScriptNames.indexOf(dom)) == scriptMax)
    }, n = 300)
  }

  test("RFF feature map is bounded by sqrt(2/D) for any input and any " +
    "spectral law") {
    import breeze.linalg.{DenseMatrix, DenseVector}
    val gen = for {
      d <- Gen.choose(1, 4)
      nf <- Gen.choose(1, 16)
      matern <- Gen.oneOf(true, false)
      seed <- Gen.choose(0L, 1000L)
      rows <- Gen.listOfN(3, Gen.listOfN(d,
        Gen.choose(-1000, 1000).map(_ / 10.0)))
    } yield (d, nf, matern, seed, rows)
    check(Prop.forAll(gen) { case (d, nf, matern, seed, rows) =>
      val (w, b) =
        if (matern) graft.gp.Rff.frequenciesMatern32(d, nf, seed = seed)
        else graft.gp.Rff.frequencies(d, nf, seed = seed)
      val x = DenseMatrix.tabulate(rows.length, d)((i, j) => rows(i)(j))
      val phi = graft.gp.Rff.featureMap(x, w, b)
      val bound = math.sqrt(2.0 / nf) + 1e-12
      var ok = true
      phi.foreachValue(v => ok &= math.abs(v) <= bound && !v.isNaN)
      ok
    }, n = 200)
  }
}
