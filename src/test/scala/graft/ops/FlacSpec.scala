package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** FLAC STREAMINFO bitfield parser vs the minimal writer. */
class FlacSpec extends AnyFunSuite {

  test("parseMeta round-trips buildStreamInfo across field boundaries " +
    "(20-bit rate, 3-bit channels, 5-bit bps, 36-bit samples)") {
    for {
      rate <- Seq(8000, 44100, 48000, 96000, 192000, (1 << 20) - 1)
      chan <- Seq(1, 2, 8)
      bps <- Seq(4, 16, 24, 32)
      samples <- Seq(0L, 1L, 44100L, (1L << 36) - 1)
    } {
      val m = Flac.parseMeta(Flac.buildStreamInfo(rate, chan, bps, samples)).get
      assert(m == Flac.FlacInfo(rate, chan, bps, samples, 4096, 4096),
        s"($rate,$chan,$bps,$samples)")
      assert(m.durationMs == samples * 1000L / rate)
    }
  }

  test("non-STREAMINFO leading blocks are skipped; garbage returns None") {
    val core = Flac.buildStreamInfo(44100, 2, 16, 88200L)
    // splice a padding block (type 1) before STREAMINFO
    val padded = core.take(4) ++
      Array[Byte](1, 0, 0, 3, 0, 0, 0) ++ core.drop(4)
    assert(Flac.parseMeta(padded) == Flac.parseMeta(core))
    assert(Flac.parseMeta("fLaCxx".getBytes).isEmpty)
    assert(Flac.parseMeta("not flac at all".getBytes).isEmpty)
    assert(Flac.parseMeta(core.take(20)).isEmpty)
    assert(Flac.parseMeta(null).isEmpty)
  }

  test("frame decode is lossless across all three subframe kinds " +
    "(constant / verbatim / fixed+Rice), including a short last frame") {
    // block 0: noisy (verbatim — encoder forces block 0 verbatim);
    // block 1: sawtooth (fixed order 2, Rice); block 2: constant;
    // block 3 (short, 8 samples): sawtooth (fixed)
    val rnd = new scala.util.Random(3)
    val s = new Array[Int](64 * 3 + 8)
    (0 until 64).foreach(t => s(t) = rnd.nextInt(65536) - 32768)
    (64 until 128).foreach(t => s(t) = (t * 31) % 4096 - 2048)
    (128 until 192).foreach(t => s(t) = -1234)
    (192 until 200).foreach(t => s(t) = (t * 31) % 4096 - 2048)
    val bytes = Flac.encode(8000, s)
    val a = Flac.decode(bytes).get
    assert(a.samples.toSeq == s.toSeq, "lossless round-trip")
    assert(a.nFrames == 4 && a.nConstant == 1 && a.nVerbatim >= 1,
      s"frames=${a.nFrames} const=${a.nConstant} verb=${a.nVerbatim} " +
        s"fixed=${a.nFixed}")
    assert(a.nVerbatim + a.nConstant + a.nFixed == 4)
    assert(a.info.sampleRateHz == 8000 && a.info.totalSamples == 200)
  }

  test("Rice path really runs: a smooth signal with occasional jumps " +
    "encodes FIXED and survives, and big quotients work") {
    val s = Array.tabulate(256)(t => (t * 31) % 4096 - 2048)
    val a = Flac.decode(Flac.encode(8000, s)).get
    assert(a.samples.toSeq == s.toSeq)
    assert(a.nFixed >= 2, s"fixed=${a.nFixed} of ${a.nFrames}")
    // encoded smaller than raw 16-bit PCM (the point of the codec)
    assert(Flac.encode(8000, s).length < 42 + 256 * 2 + 4 * 16,
      "fixed+Rice should beat raw")
  }

  test("corruption anywhere -> None (CRC-8, CRC-16, sync, truncation " +
    "— the all-frames-or-nothing contract)") {
    val s = Array.tabulate(200)(t => (t * 31) % 4096 - 2048)
    val good = Flac.encode(8000, s)
    assert(Flac.decode(good).isDefined)
    // flip one byte in every region: header, mid-frame, trailer
    for (ix <- Seq(45, good.length / 2, good.length - 1)) {
      val bad = good.clone(); bad(ix) = (bad(ix) ^ 0x5a).toByte
      assert(Flac.decode(bad).isEmpty, s"corrupt @$ix must fail")
    }
    assert(Flac.decode(good.take(good.length - 3)).isEmpty, "truncated")
    assert(Flac.decode("fLaC".getBytes).isEmpty)
    // a STREAMINFO that promises samples but carries no frames is
    // truncation; 12-bit is outside the declared bps boundary
    assert(Flac.decode(Flac.buildStreamInfo(8000, 2, 16, 100L)).isEmpty)
    assert(Flac.decode(Flac.buildStreamInfo(8000, 1, 12, 100L)).isEmpty)
  }

  test("LPC round-trip: Levinson-Durbin analysis encodes real LPC " +
    "subframes and decode is bit-lossless") {
    // correlated AR-ish integer signal: LPC should model it well
    val s = new Array[Int](256)
    s(0) = 1000; s(1) = 980
    (2 until 256).foreach(t =>
      s(t) = ((s(t - 1) * 15 - s(t - 2) * 7) / 8 + (t * 37) % 64 - 32)
        .max(-32768).min(32767))
    val bytes = Flac.encodeLpc(8000, s)
    val a = Flac.decode(bytes).get
    assert(a.samples.toSeq == s.toSeq, "LPC lossless round-trip")
    assert(a.nLpc >= 1, s"expected LPC subframes, got const=" +
      s"${a.nConstant} verb=${a.nVerbatim} fixed=${a.nFixed} lpc=${a.nLpc}")
    // and the LPC stream should beat raw PCM (the point of LPC)
    assert(bytes.length < 42 + 256 * 2, "LPC should compress")
  }

  test("stereo round-trip: all four channel assignments (independent, " +
    "left/side, side/right, mid/side) decode losslessly, side at 17 bit") {
    val n = 64 * 8 // 8 blocks -> each assignment twice
    val l = Array.tabulate(n)(t => (t * 31) % 4096 - 2048)
    // right far from left so the side channel really exercises
    // 17-bit values (l - r spans beyond 16-bit when they oppose)
    val r = Array.tabulate(n)(t => -((t * 53) % 60000 - 30000))
    for (useLpc <- Seq(false, true)) {
      val bytes = Flac.encodeStereo(8000, l, r, useLpc = useLpc)
      val a = Flac.decode(bytes).get
      assert(a.info.channels == 2 && a.nFrames == 8)
      val gotL = (0 until n).map(t => a.samples(2 * t))
      val gotR = (0 until n).map(t => a.samples(2 * t + 1))
      assert(gotL == l.toSeq, s"left (useLpc=$useLpc)")
      assert(gotR == r.toSeq, s"right (useLpc=$useLpc)")
    }
  }

  test("stereo corruption -> None (CRC still gates every frame)") {
    val n = 64 * 4
    val l = Array.tabulate(n)(t => (t * 31) % 4096 - 2048)
    val r = Array.tabulate(n)(t => (t * 17) % 4096 - 2048)
    val good = Flac.encodeStereo(8000, l, r)
    assert(Flac.decode(good).isDefined)
    for (ix <- Seq(45, good.length / 2, good.length - 1)) {
      val bad = good.clone(); bad(ix) = (bad(ix) ^ 0x5a).toByte
      assert(Flac.decode(bad).isEmpty, s"corrupt @$ix must fail")
    }
    assert(Flac.decode(good ++ Array[Byte](7)).isEmpty, "trailing")
  }

  test("trailing bytes after the final frame -> None (appended " +
    "garbage violates all-frames-or-nothing)") {
    val s = Array.tabulate(200)(t => (t * 31) % 4096 - 2048)
    val good = Flac.encode(8000, s)
    assert(Flac.decode(good).isDefined)
    assert(Flac.decode(good ++ Array[Byte](0)).isEmpty)
    assert(Flac.decode(good ++ "junk".getBytes).isEmpty)
  }

  test("blocksize code 1 (fixed 192-sample blocks) decodes") {
    // encode one 192-sample frame (explicit 8-bit blocksize, code 6),
    // then rewrite the header to the spec's code-1 shorthand: drop
    // the explicit blocksize byte, recompute CRC-8 and CRC-16
    val s = Array.tabulate(192)(t => (t * 31) % 4096 - 2048)
    val enc = Flac.encode(8000, s, blockSize = 192)
    val meta = enc.take(42) // magic + STREAMINFO block
    val frame = enc.drop(42)
    assert((frame(2) & 0xf0) == 0x60 && (frame(5) & 0xff) == 191)
    val head = Array[Byte](0xff.toByte, 0xf8.toByte, 0x10.toByte,
      0x08.toByte, 0x00, 0)
    head(5) = Flac.crc8(head, 0, 5).toByte
    val body = frame.slice(7, frame.length - 2)
    val nf = head ++ body
    val c16 = Flac.crc16(nf, 0, nf.length)
    val out = meta ++ nf ++
      Array[Byte]((c16 >> 8).toByte, (c16 & 0xff).toByte)
    val a = Flac.decode(out).get
    assert(a.samples.toSeq == s.toSeq, "code-1 blocksize lossless")
    assert(a.nFrames == 1)
  }

  test("bps grid round-trip: 8/12/16/20/24-bit mono (plain + LPC) and " +
    "stereo streams decode losslessly, STREAMINFO bps pinned") {
    val rnd = new scala.util.Random(14)
    for (bps <- Seq(8, 12, 16, 20, 24)) {
      val amp = (1 << (bps - 1)) - 1
      val n = 200
      val mono = Array.tabulate(n)(t =>
        (math.sin(t / 7.0) * (amp / 2)).toInt + rnd.nextInt(17) - 8)
      val a = Flac.decode(Flac.encode(8000, mono, 64, bps)).get
      assert(a.info.bitsPerSample == bps && a.samples.toSeq == mono.toSeq,
        s"mono bps=$bps")
      val b = Flac.decode(Flac.encodeLpc(8000, mono, 64, 4, bps)).get
      assert(b.samples.toSeq == mono.toSeq, s"lpc bps=$bps")
      assert(b.nLpc > 0, s"lpc subframes present at bps=$bps")
      val left = mono
      val right = Array.tabulate(n)(t => -mono(t) / 2 + rnd.nextInt(9) - 4)
      val st = Flac.decode(
        Flac.encodeStereo(8000, left, right, 64, useLpc = true, bps)).get
      assert(st.info.channels == 2 && st.info.bitsPerSample == bps)
      assert(st.samples.grouped(2).map(_(0)).toSeq == left.toSeq &&
        st.samples.grouped(2).map(_(1)).toSeq == right.toSeq,
        s"stereo bps=$bps")
    }
  }

  test("wasted bits: upscaled sources ride the wire at reduced width, " +
    "decode losslessly, and the stream is genuinely smaller") {
    val rnd = new scala.util.Random(9)
    val n = 192
    val base = Array.tabulate(n)(t =>
      (math.sin(t / 5.0) * 900).toInt + rnd.nextInt(33) - 16)
    // 16-bit samples that are all multiples of 16 (4 wasted bits):
    // a 12-bit ADC shipped as 16-bit — the canonical wasted case
    val up = base.map(_ * 16)
    val enc = Flac.encode(8000, up, 64)
    val a = Flac.decode(enc).get
    assert(a.samples.toSeq == up.toSeq, "wasted-bit mono lossless")
    // the same signal WITHOUT common trailing zeros costs more bits
    val noisy = up.zipWithIndex.map { case (v, i) => v + (i % 2) }
    assert(enc.length < Flac.encode(8000, noisy, 64).length)
    // stereo + LPC with per-channel wasted bits (right channel only)
    val left = base
    val right = base.map(_ * 8)
    val st = Flac.decode(
      Flac.encodeStereo(8000, left, right, 64, useLpc = true)).get
    assert(st.samples.grouped(2).map(_(0)).toSeq == left.toSeq &&
      st.samples.grouped(2).map(_(1)).toSeq == right.toSeq,
      "per-channel wasted stereo lossless")
    // 24-bit + wasted combined
    val up24 = base.map(_ * 1024)
    val c = Flac.decode(Flac.encode(8000, up24, 64, 24)).get
    assert(c.samples.toSeq == up24.toSeq, "24-bit wasted lossless")
  }

  test("multi-channel (3..8) independent subframes round-trip " +
    "losslessly, interleaved c0..cN-1, across bps") {
    val rnd = new scala.util.Random(21)
    for (nch <- Seq(3, 4, 6, 8); bps <- Seq(16, 24)) {
      val amp = (1 << (bps - 1)) - 1
      val n = 192
      val chans = Seq.tabulate(nch)(c => Array.tabulate(n)(t =>
        (math.sin((t + c * 13) / 6.0) * (amp / 3)).toInt +
          rnd.nextInt(21) - 10))
      val a = Flac.decode(Flac.encodeMulti(8000, chans, 64,
        useLpc = nch % 2 == 0, bps = bps)).get
      assert(a.info.channels == nch && a.info.bitsPerSample == bps)
      assert(a.samples.length == n * nch)
      for (c <- 0 until nch)
        assert((0 until n).forall(t => a.samples(t * nch + c) ==
          chans(c)(t)), s"channel $c nch=$nch bps=$bps")
    }
  }

  test("Rice escape partitions: quotient-blowup blocks ride the wire " +
    "as raw-width residuals and decode losslessly") {
    val rnd = new scala.util.Random(33)
    // one huge outlier per block makes the mean-k quotient blow up:
    // the planner must take the ESCAPE path, not whole-block verbatim
    val n = 256
    val s0 = Array.tabulate(n)(t =>
      if (t % 64 == 37) 30000 * (if (t % 128 == 37) 1 else -1)
      else (t % 7) - 3 + rnd.nextInt(3))
    val enc = Flac.encode(8000, s0, 64)
    val a = Flac.decode(enc).get
    assert(a.samples.toSeq == s0.toSeq, "escape lossless")
    // block 0 is verbatim by rule; later blocks with the outlier must
    // be FIXED (escape is a fixed-subframe residual coding), not
    // verbatim — the counts pin that the escape path actually fired
    assert(a.nVerbatim == 1 && a.nFixed >= 3,
      s"verbatim=${a.nVerbatim} fixed=${a.nFixed}")
    // escape + multichannel + wasted combined
    val chans = Seq.tabulate(3)(c => s0.map(v => (v / 4) * 4 + c * 0))
    val b = Flac.decode(Flac.encodeMulti(8000, chans, 64)).get
    for (c <- 0 until 3)
      assert((0 until n).forall(t => b.samples(t * 3 + c) ==
        chans(c)(t)))
  }

  test("bit I/O parity: the byte-batched BitWriter/BitReader match a " +
    "bit-by-bit reference on seeded random field sequences, and " +
    "truncation mid-field/mid-unary sets fail without throwing") {
    // reference writer: the pre-r14 1-bit-per-iteration semantics
    final class RefWriter {
      val buf = new java.io.ByteArrayOutputStream()
      var acc = 0; var n = 0
      def write(v: Long, bits: Int): Unit = {
        var b = bits - 1
        while (b >= 0) {
          acc = (acc << 1) | ((v >> b) & 1L).toInt; n += 1
          if (n == 8) { buf.write(acc & 0xff); acc = 0; n = 0 }
          b -= 1
        }
      }
      def bytes: Array[Byte] = { if (n != 0) write(0L, 8 - n); buf.toByteArray }
    }
    val rnd = new scala.util.Random(0xF1ac)
    // ops: Left((value, width)) = fixed field, Right(q) = unary run
    val ops = Vector.tabulate(4000) { _ =>
      if (rnd.nextInt(4) == 0) Right(rnd.nextInt(40))
      else {
        val w = 1 + rnd.nextInt(33)
        Left((rnd.nextLong() >>> (64 - w), w))
      }
    }
    val bw = new Flac.BitWriter
    val rw = new RefWriter
    ops.foreach {
      case Left((v, w)) => bw.write(v, w); rw.write(v, w)
      case Right(q)     => bw.writeUnary(q); rw.write(0L, q); rw.write(1L, 1)
    }
    val bytes = bw.bytes
    assert(bytes.toSeq == rw.bytes.toSeq, "writer streams diverge")
    // read back: every field and quotient round-trips, pos advances
    // exactly field-width (or q+1) bits
    val br = new Flac.BitReader(bytes, 0L)
    ops.foreach {
      case Left((v, w)) =>
        val p0 = br.pos
        assert(br.read(w) == v && br.pos == p0 + w && !br.fail)
      case Right(q) =>
        val p0 = br.pos
        assert(br.readUnary() == q && br.pos == p0 + q + 1 && !br.fail)
    }
    // truncation totality: reading past the end fails cleanly from
    // any bit offset, with pos parked at the end of the whole bytes
    for (off <- 0 to 7) {
      val short = bytes.take(3)
      val r1 = new Flac.BitReader(short, off.toLong)
      r1.read(64); assert(r1.fail && r1.pos <= 24L)
      val zeros = Array[Byte](0, 0)  // unary run that never terminates
      val r2 = new Flac.BitReader(zeros, off.toLong)
      assert(r2.readUnary() == 0 && r2.fail)
    }
  }
}
