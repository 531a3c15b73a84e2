package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Archive ingestion ([[Archive]]): ZIP central-directory walk +
  * inflate + CRC verify, ustar header walk + checksum verify, and the
  * total-on-garbage contracts both parsers promise. */
class ArchiveSpec extends AnyFunSuite {

  private val docs = Vector(
    ("a.txt", "hello archive world"),
    ("dir/b.txt", "second member, longer text " * 40),
    ("empty.txt", ""),
    ("c.bin", "binary-ish \u0000\u0001ÿ content"))

  test("ZIP round-trips store and deflate members with verified CRCs") {
    val zip = Archive.buildZip(
      docs.map { case (n, t) => (n, t.getBytes(UTF_8)) },
      i => i % 2 == 0)
    val ms = Archive.parseZip(zip)
    assert(ms.map(_.name) == docs.map(_._1))
    assert(ms.forall(_.ok))
    assert(ms.map(_.text) == docs.map(_._2))
    assert(ms.map(_.deflated) == Vector(true, false, true, false))
    // deflate genuinely compresses: the all-deflate form of the same
    // archive is smaller than the all-store form
    val allDef = Archive.buildZip(
      docs.map { case (n, t) => (n, t.getBytes(UTF_8)) }, _ => true)
    val allStore = Archive.buildZip(
      docs.map { case (n, t) => (n, t.getBytes(UTF_8)) }, _ => false)
    assert(allDef.length < allStore.length)
    assert(Archive.parseZip(allDef).forall(_.ok))
  }

  test("ZIP flips ok=false on a corrupted byte but still lists the " +
    "member; other members stay verified") {
    val zip = Archive.buildZip(
      docs.map { case (n, t) => (n, t.getBytes(UTF_8)) }, _ => false)
    // corrupt one payload byte of member 0 (offset 30 + name + 1)
    val dataOff = 30 + "a.txt".length + 1
    zip(dataOff) = (zip(dataOff) ^ 0x55).toByte
    val ms = Archive.parseZip(zip)
    assert(ms.map(_.name) == docs.map(_._1))
    assert(!ms(0).ok && ms.drop(1).forall(_.ok))
  }

  test("ZIP is total on garbage and on truncation") {
    assert(Archive.parseZip(Array.fill[Byte](64)(0x41)) == Vector.empty)
    assert(Archive.parseZip(Array.emptyByteArray) == Vector.empty)
    assert(Archive.parseZip(null) == Vector.empty)
    val zip = Archive.buildZip(Seq(("x", "y".getBytes(UTF_8))), _ => true)
    // chop the EOCD off: no central directory, no members
    assert(Archive.parseZip(zip.dropRight(22)) == Vector.empty)
  }

  test("tar.gz round-trips members with planted mtimes and verified " +
    "header checksums") {
    val tgz = Archive.buildTarGz(
      docs.map { case (n, t) => (n, t.getBytes(UTF_8)) },
      i => 1700000000L + i * 7)
    val ms = Archive.parseTar(tgz)
    assert(ms.map(_.name) == docs.map(_._1))
    assert(ms.map(_.text) == docs.map(_._2))
    assert(ms.map(_.mtime) == Vector.tabulate(4)(1700000000L + _ * 7))
    assert(ms.forall(_.ok))
  }

  test("tar stops at a corrupted header checksum, keeping earlier " +
    "members") {
    val tar = Warc.gunzipAll(Archive.buildTarGz(
      docs.map { case (n, t) => (n, t.getBytes(UTF_8)) }, _ => 0L))
    // member 0 spans 512 + 512 (19 bytes padded); header 2 sits past
    // member 1's header + padded data — corrupt its name byte
    val h2 = 1024 + 512 +
      512 * ((docs(1)._2.getBytes(UTF_8).length + 511) / 512)
    tar(h2) = (tar(h2) ^ 0x7f).toByte
    val ms = Archive.parseTar(tar)
    assert(ms.map(_.name) == Vector("a.txt", "dir/b.txt"))
  }

  test("tar is total on garbage and handles the uncompressed form") {
    assert(Archive.parseTar(Array.fill[Byte](700)(0x41)) == Vector.empty)
    assert(Archive.parseTar(null) == Vector.empty)
    val plain = Warc.gunzipAll(Archive.buildTarGz(
      Seq(("p.txt", "plain".getBytes(UTF_8))), _ => 5L))
    val ms = Archive.parseTar(plain) // already-gunzipped bytes pass through
    assert(ms.map(_.text) == Vector("plain") && ms(0).mtime == 5L)
  }
}
