package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** mbox + MIME source ([[Mbox]]): separator/stuffing round-trip,
  * header unfolding, RFC 2047 encoded-word subjects (adjacent words
  * join without a space), quoted-printable and base64 transfer
  * decode, multipart boundary walk with attachment recovery, and
  * totality on truncation/garbage. */
class MboxSpec extends AnyFunSuite {

  private def mk(id: Long, body: String, enc: Int = 0,
                 encSubj: Boolean = false,
                 att: Option[Array[Byte]] = None) =
    Mbox.MsgSpec(s"user$id@example.com",
      Vector("list@example.org", s"cc$id@example.net"),
      if (encSubj) s"Résumé $id" else s"Re: doc $id",
      encSubj, s"Thu, 1 Feb 2024 0$id:00:00 +0000", s"<m$id@x>", enc,
      body, att)

  test("round-trips every transfer encoding, subject form, and the " +
    "folded To list") {
    val msgs = Seq(
      mk(1, "plain ascii body\nsecond line"),
      mk(2, "qp body: café = tricky✓\ntrailing space \nend",
        enc = 1),
      mk(3, "base64 body 中文\nlines", enc = 2),
      mk(4, "encoded subject body", encSubj = true))
    val got = Mbox.parse(Mbox.build(msgs))
    assert(got.size == 4 && got.forall(_.ok))
    got.zip(msgs).foreach { case (g, m) =>
      assert(g.from == m.from && g.to == m.to)
      assert(g.subject == m.subject, s"subject for ${m.msgId}")
      assert(g.date == m.date && g.msgId == m.msgId)
      assert(g.body == m.body, s"body for ${m.msgId}")
      assert(g.nParts == 1 && g.attachment.isEmpty)
    }
    assert(got(1).cte == "quoted-printable" && got(2).cte == "base64")
    // the raw bytes really carry the encodings
    val s = new String(Mbox.build(msgs), UTF_8)
    assert(s.contains("=E2=9C=93")) // ✓ in QP
    assert(s.contains("=?UTF-8?B?")) // encoded word
    assert(s.contains(",\n cc1@example.net")) // folded To
  }

  test("From-stuffing: a body line starting 'From ' (or an already-" +
    "quoted one) survives the separator split exactly") {
    val body = "first\nFrom the start this line threatens\n" +
      ">From quoted too\n>>From deeper\nlast"
    val got = Mbox.parse(Mbox.build(Seq(mk(1, "before"), mk(2, body))))
    assert(got.size == 2)
    assert(got(1).body == body)
    val raw = new String(Mbox.build(Seq(mk(2, body))), UTF_8)
    assert(raw.contains("\n>From the start") &&
      raw.contains("\n>>From quoted") && raw.contains("\n>>>From deeper"))
  }

  test("byte-exact framing: empty bodies, trailing-newline bodies, " +
    "and QP bodies with line-initial 'From ' all round-trip") {
    val bodies = Seq("", "\n", "xyz", "xyz\n", "xyz\n\n", "a\n\nb",
      "From the top\nmiddle\nFrom again ")
    for (enc <- 0 to 2; last <- Seq(false, true)) {
      val specs = bodies.zipWithIndex.map { case (b, i) =>
        mk(i.toLong, b, enc)
      } ++ (if (last) Nil else Seq(mk(99, "tail", 0)))
      val got = Mbox.parse(Mbox.build(specs))
      assert(got.size == specs.size, s"enc=$enc last=$last")
      bodies.zipWithIndex.foreach { case (b, i) =>
        assert(got(i).body == b,
          s"enc=$enc last=$last body=[${b.replace("\n", "\\n")}] " +
            s"got=[${got(i).body.replace("\n", "\\n")}]")
      }
    }
  }

  test("adjacent encoded words rejoin WITHOUT a space; a lone " +
    "encoded word among plain text keeps its separation") {
    assert(Mbox.decodeWords("=?UTF-8?B?YWI=?= \n =?UTF-8?B?Y2Q=?=")
      == "abcd")
    assert(Mbox.decodeWords("plain =?UTF-8?B?Y2Fm w6k=?=") ==
      "plain =?UTF-8?B?Y2Fm w6k=?=") // space inside word: not a match
    assert(Mbox.decodeWords("hello =?UTF-8?Q?caf=C3=A9_x?= world") ==
      "hello café x world")
  }

  test("multipart/mixed: text part + base64 attachment recovered, " +
    "part count and closing boundary pinned") {
    val att = Array.tabulate[Byte](137)(i => (i * 7 - 80).toByte)
    val got = Mbox.parse(Mbox.build(Seq(
      mk(5, "multipart text body é", enc = 1, att = Some(att)),
      mk(6, "after"))))
    assert(got.size == 2 && got.forall(_.ok))
    assert(got.head.nParts == 2)
    assert(got.head.body == "multipart text body é")
    assert(java.util.Arrays.equals(got.head.attachment, att))
    assert(got(1).body == "after" && got(1).nParts == 1)
  }

  test("In-Reply-To and the folded References chain round-trip; " +
    "roots carry neither header") {
    val root = mk(10, "root body")
    val reply = mk(12, "reply body").copy(
      replyTo = Some("<m11@x>"),
      references = Vector("<m10@x>", "<m11@x>"))
    val got = Mbox.parse(Mbox.build(Seq(root, reply)))
    assert(got.size == 2)
    assert(got(0).inReplyTo.isEmpty && got(0).references.isEmpty)
    assert(got(1).inReplyTo == "<m11@x>")
    assert(got(1).references == Vector("<m10@x>", "<m11@x>"))
    // the raw bytes really fold the chain one id per line
    val raw = new String(Mbox.build(Seq(reply)), UTF_8)
    assert(raw.contains("References: <m10@x>\n <m11@x>"))
  }

  test("quoted-printable encoder discipline: lines stay under 76 " +
    "chars, trailing whitespace encoded, decode is inverse") {
    val s = ("x" * 200) + " \n" + ("café " * 40).trim + " "
    val enc = Mbox.qpEncode(s)
    assert(enc.split("\n", -1).forall(_.length <= 76))
    assert(!enc.split("\n", -1).exists(l =>
      l.endsWith(" ") || l.endsWith("\t")))
    assert(Mbox.qpDecode(enc) == s)
  }

  test("total on damage: truncation is a cut, garbage and empty " +
    "yield no messages, missing Message-ID surfaces ok=false") {
    val good = Mbox.build(Seq(mk(1, "aaa"), mk(2, "bbb", enc = 2),
      mk(3, "ccc", enc = 1, att = Some(Array[Byte](1, 2, 3)))))
    for (k <- 0 until good.length by math.max(1, good.length / 37)) {
      val got = Mbox.parse(java.util.Arrays.copyOf(good, k))
      assert(got.size <= 3) // never throws, never invents
    }
    assert(Mbox.parse(null).isEmpty)
    assert(Mbox.parse(Array.emptyByteArray).isEmpty)
    assert(Mbox.parse("no separator here".getBytes(UTF_8)).isEmpty)
    val noId = "From a@b Thu Jan  1 00:00:00 2024\nFrom: a@b\n\nbody\n"
    val got = Mbox.parse(noId.getBytes(UTF_8))
    assert(got.size == 1 && !got.head.ok && got.head.body == "body")
  }
}
