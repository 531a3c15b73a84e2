package graft.ops

import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM archive ingestion: ZIP (PKWARE APPNOTE 4.5 subset) and
  * POSIX ustar tar (+gzip via [[Warc.gunzipAll]]) — the container
  * formats of code-corpus curation (GitHub repo exports ship as ZIP;
  * software-heritage / registry dumps as .tar.gz). Both parsers are
  * REAL: the ZIP walk starts from the end-of-central-directory
  * record and verifies each member's CRC-32 after inflate
  * (store + deflate methods; the JDK ships `Inflater`, so deflate is
  * an honest decode, not a stub), and the tar walk verifies each
  * 512-byte header's octal checksum. Both are total on garbage —
  * parse stops at the first malformed structure and returns the
  * members recovered so far.
  *
  * Scale shape: archives arrive via Spark's `binaryFile` source (or
  * any binary column); member extraction is a per-partition flatMap
  * — one archive's members never leave their partition and nothing
  * archive-sized lands on the driver. The unit of parallelism is the
  * archive file, exactly how a 1000-executor cluster wants repo
  * corpora split.
  */
object Archive {

  /** One extracted member. `ok` = structure + checksum verified
    * (ZIP: CRC-32 and declared sizes match; tar: header checksum
    * matches). */
  final case class Member(name: String, body: Array[Byte],
                          deflated: Boolean, mtime: Long, ok: Boolean) {
    def text: String = new String(body, UTF_8)
  }

  // ---------------------------------------------------------------- ZIP

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (le16(b, o) & 0xffffL) | ((le16(b, o + 2) & 0xffffL) << 16)

  /** Build a ZIP with the given members; `deflate(i)` selects method
    * 8 (Deflater level 6, nowrap — the raw-deflate form ZIP framing
    * requires) vs method 0 (store). DOS time fields are pinned to 0
    * so archive bytes are deterministic. */
  def buildZip(members: Seq[(String, Array[Byte])],
               deflate: Int => Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4096)
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = { u16((v & 0xffff).toInt); u16(((v >> 16) & 0xffff).toInt) }
    val central = new java.io.ByteArrayOutputStream(1024)
    def c16(v: Int): Unit = { central.write(v & 0xff); central.write((v >> 8) & 0xff) }
    def c32(v: Long): Unit = { c16((v & 0xffff).toInt); c16(((v >> 16) & 0xffff).toInt) }
    var n = 0
    members.zipWithIndex.foreach { case ((name, body), i) =>
      val nameB = name.getBytes(UTF_8)
      val crc = new CRC32(); crc.update(body)
      val method = if (deflate(i)) 8 else 0
      val data =
        if (method == 0) body
        else {
          val d = new Deflater(6, true)
          d.setInput(body); d.finish()
          val buf = new Array[Byte](body.length + 64)
          val bos = new java.io.ByteArrayOutputStream(body.length / 2 + 64)
          while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
          d.end()
          bos.toByteArray
        }
      val off = out.size()
      u32(0x04034b50L); u16(20); u16(0); u16(method)
      u16(0); u16(0) // DOS time/date pinned
      u32(crc.getValue); u32(data.length.toLong); u32(body.length.toLong)
      u16(nameB.length); u16(0)
      out.write(nameB); out.write(data)
      c32(0x02014b50L); c16(20); c16(20); c16(0); c16(method)
      c16(0); c16(0)
      c32(crc.getValue); c32(data.length.toLong); c32(body.length.toLong)
      c16(nameB.length); c16(0); c16(0); c16(0); c16(0)
      c32(0L); c32(off.toLong)
      central.write(nameB)
      n += 1
    }
    val cdOff = out.size()
    val cd = central.toByteArray
    out.write(cd)
    u32(0x06054b50L); u16(0); u16(0); u16(n); u16(n)
    u32(cd.length.toLong); u32(cdOff.toLong); u16(0)
    out.toByteArray
  }

  /** Parse a ZIP from its central directory (the authoritative walk —
    * local headers alone can't see the archive's true membership).
    * Each member is inflated (method 8) or copied (method 0) and its
    * CRC-32 + declared sizes verified into [[Member.ok]]. Unknown
    * methods yield an empty-body `ok=false` member (name still
    * surfaces — curation wants to COUNT what it can't read). */
  def parseZip(b: Array[Byte]): Vector[Member] = {
    if (b == null || b.length < 22) return Vector.empty
    // EOCD: scan back for PK\x05\x06 (comment ≤ 64 KiB bounds the scan)
    var e = b.length - 22
    val lo = math.max(0, b.length - 22 - 65535)
    while (e >= lo && !(b(e) == 0x50 && b(e + 1) == 0x4b &&
      b(e + 2) == 0x05 && b(e + 3) == 0x06)) e -= 1
    if (e < lo) return Vector.empty
    val nEntries = le16(b, e + 10)
    // All archive offsets walk as Longs: a crafted 32-bit EOCD/central
    // directory/local-header offset must fail a bounds check, never wrap
    // negative and index — the members recovered so far are returned
    // instead of throwing (totality contract on garbage archives).
    var o = le32(b, e + 16)
    val out = Vector.newBuilder[Member]
    var i = 0
    while (i < nEntries && o + 46 <= b.length && le32(b, o.toInt) == 0x02014b50L) {
      val oi = o.toInt
      val method = le16(b, oi + 10)
      val crc = le32(b, oi + 16)
      val compSizeL = le32(b, oi + 20)
      val uncompSize = le32(b, oi + 24).toInt
      val nameLen = le16(b, oi + 28)
      val extraLen = le16(b, oi + 30)
      val commentLen = le16(b, oi + 32)
      val lhOffL = le32(b, oi + 42)
      if (o + 46 + nameLen > b.length) return out.result()
      val name = new String(b, oi + 46, nameLen, UTF_8)
      // local header: its OWN name/extra lengths govern the data offset
      val member =
        if (lhOffL + 30 > b.length || le32(b, lhOffL.toInt) != 0x04034b50L)
          Member(name, Array.emptyByteArray, deflated = false, 0L, ok = false)
        else {
          val lhOff = lhOffL.toInt
          val dataOffL = lhOff.toLong + 30 +
            le16(b, lhOff + 26) + le16(b, lhOff + 28)
          // 1032:1 is DEFLATE's theoretical max expansion — a declared
          // uncompressed size beyond it cannot verify, so reject BEFORE
          // the inflate buffer allocation (zip-bomb / crafted-CD guard)
          if (dataOffL + compSizeL > b.length || uncompSize < 0 ||
            uncompSize > compSizeL * 1032L + 64)
            Member(name, Array.emptyByteArray, deflated = false, 0L, ok = false)
          else {
            val dataOff = dataOffL.toInt
            val compSize = compSizeL.toInt
            method match {
            case 0 =>
              val body = java.util.Arrays.copyOfRange(b, dataOff, dataOff + compSize)
              val c = new CRC32(); c.update(body)
              Member(name, body, deflated = false, 0L,
                ok = c.getValue == crc && body.length == uncompSize)
            case 8 =>
              try {
                val inf = new Inflater(true)
                inf.setInput(b, dataOff, compSize)
                val body = new Array[Byte](uncompSize)
                var filled = 0
                var stalled = false
                var extra = false
                val probe = new Array[Byte](1)
                while (!inf.finished() && !stalled && !extra) {
                  if (filled < uncompSize) {
                    val k = inf.inflate(body, filled, uncompSize - filled)
                    if (k > 0) filled += k
                    else if (inf.needsInput() || inf.needsDictionary())
                      stalled = true // truncated/underdeclared input
                  } else {
                    // declared size reached; a probe byte distinguishes
                    // a clean end-of-stream from an overlong stream
                    if (inf.inflate(probe, 0, 1) > 0) extra = true
                    else if (!inf.finished()) stalled = true
                  }
                }
                val done = inf.finished() && filled == uncompSize &&
                  !extra && !stalled
                inf.end()
                val c = new CRC32(); c.update(body)
                Member(name, body, deflated = true, 0L,
                  ok = done && c.getValue == crc)
              } catch {
                case _: java.util.zip.DataFormatException =>
                  Member(name, Array.emptyByteArray, deflated = true, 0L, ok = false)
              }
            case _ =>
              Member(name, Array.emptyByteArray, deflated = false, 0L, ok = false)
            }
          }
        }
      out += member
      o += 46L + nameLen + extraLen + commentLen
      i += 1
    }
    out.result()
  }

  // ---------------------------------------------------------------- tar

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits + NUL (the POSIX "leading zeros" form)
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + " ").getBytes(UTF_8)
  }

  /** Build a POSIX ustar tar (one 512-byte header + padded data per
    * member, two zero blocks at the end), gzipped. `mtime(i)` plants
    * the per-member modification time the parser reads back. */
  def buildTarGz(members: Seq[(String, Array[Byte])],
                 mtime: Int => Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4096)
    members.zipWithIndex.foreach { case ((name, body), i) =>
      val h = new Array[Byte](512)
      val nameB = name.getBytes(UTF_8)
      System.arraycopy(nameB, 0, h, 0, math.min(nameB.length, 100))
      System.arraycopy(octal(420L, 8), 0, h, 100, 8)      // mode 0644
      System.arraycopy(octal(0L, 8), 0, h, 108, 8)        // uid
      System.arraycopy(octal(0L, 8), 0, h, 116, 8)        // gid
      System.arraycopy(octal(body.length.toLong, 12), 0, h, 124, 12)
      System.arraycopy(octal(mtime(i), 12), 0, h, 136, 12)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)      // chksum field
      h(156) = '0'                                        // typeflag: file
      System.arraycopy("ustar 00".getBytes(UTF_8), 0, h, 257, 8)
      var sum = 0L
      var j = 0
      while (j < 512) { sum += h(j) & 0xff; j += 1 }
      val ck = (java.lang.Long.toOctalString(sum).reverse.padTo(6, '0')
        .reverse + "  ").getBytes(UTF_8)
      System.arraycopy(ck, 0, h, 148, 8)
      out.write(h)
      out.write(body)
      val pad = (512 - body.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024))
    val gz = new java.io.ByteArrayOutputStream(out.size() / 2 + 64)
    val g = new java.util.zip.GZIPOutputStream(gz)
    g.write(out.toByteArray); g.finish(); g.close()
    gz.toByteArray
  }

  /** Walk a (possibly gzipped) ustar stream: verify each header's
    * octal checksum (the field itself counted as spaces), read the
    * octal size/mtime, extract the member, step the 512-padded
    * distance. Stops at the first zero block or malformed header.
    * Non-file typeflags (directories, symlinks) surface with empty
    * bodies and `ok=true` — membership is real even when content
    * isn't extractable. */
  def parseTar(gzOrTar: Array[Byte]): Vector[Member] = {
    val b = Warc.gunzipAll(gzOrTar)
    if (b == null) return Vector.empty
    val out = Vector.newBuilder[Member]
    var o = 0
    var done = false
    while (!done && o + 512 <= b.length) {
      var allZero = true
      var j = 0
      while (allZero && j < 512) { if (b(o + j) != 0) allZero = false; j += 1 }
      if (allZero) done = true
      else {
        var sum = 0L
        j = 0
        while (j < 512) {
          sum += (if (j >= 148 && j < 156) ' '.toInt else b(o + j) & 0xff)
          j += 1
        }
        def field(off: Int, len: Int): String = {
          var hi = off
          val max = off + len
          while (hi < max && b(o + hi) != 0 && b(o + hi) != ' ') hi += 1
          new String(b, o + off, hi - off, UTF_8)
        }
        def oct(off: Int, len: Int): Long = {
          val s = field(off, len)
          if (s.isEmpty) 0L
          else try java.lang.Long.parseLong(s, 8) catch { case _: NumberFormatException => -1L }
        }
        val declared = oct(148, 8)
        val size = oct(124, 12)
        if (declared != sum || size < 0 || o + 512 + size > b.length) done = true
        else {
          val name = field(0, 100)
          val mtime = oct(136, 12)
          val isFile = b(o + 156) == '0' || b(o + 156) == 0
          val body =
            if (isFile)
              java.util.Arrays.copyOfRange(b, o + 512, o + 512 + size.toInt)
            else Array.emptyByteArray
          out += Member(name, body, deflated = false, mtime, ok = true)
          o += 512 + ((size + 511) / 512 * 512).toInt
        }
      }
    }
    out.result()
  }
}
