package graft.ops

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/** mbox + MIME email source — the mailing-list-archive container
  * (public corpora ship decades of list traffic this way). Builder/
  * parser pair on the [[Archive]]/[[Xml]]/[[Pdf]] discipline: the
  * writer emits REAL mboxrd (RFC 4155 `From ` separator lines,
  * `>From ` body stuffing), RFC 5322 headers with folding
  * (continuation lines), RFC 2047 encoded-word subjects — including
  * the adjacent-encoded-words-join-without-space rule — and MIME
  * bodies in 7bit, quoted-printable, and base64, plus
  * multipart/mixed with a base64 attachment. The parser is what a
  * list-archive consumer runs: separator split (strict mboxrd —
  * every line-initial `From ` delimits, which is exactly why the
  * writer must stuff), header unfold, encoded-word decode, boundary
  * walk, transfer decode.
  *
  * Totality: damage is a cut, not a crash. A message whose MIME
  * structure is broken surfaces `ok = false` with whatever decoded;
  * garbage yields no messages.
  *
  * Scale shape: per-group mbox files are assembled after the group
  * agg and parsed partition-locally; file bytes never shuffle
  * ([[Multimodal.mboxBuildFiles]]/[[Multimodal.mboxMessagesColumn]]).
  */
object Mbox {

  /** One message to write. `enc`: 0 = 7bit (From-stuffed), 1 =
    * quoted-printable, 2 = base64. `encodeSubject` forces the RFC
    * 2047 path: the subject is split into TWO adjacent B-encoded
    * words across a fold, which MUST rejoin without a space. */
  final case class MsgSpec(from: String, to: Vector[String],
                           subject: String, encodeSubject: Boolean,
                           date: String, msgId: String, enc: Int,
                           body: String,
                           attachment: Option[Array[Byte]],
                           replyTo: Option[String] = None,
                           references: Vector[String] = Vector.empty)

  /** One parsed message. `cte` is the body part's transfer encoding;
    * `nParts` is 1 for single-part, attachment bytes are decoded. */
  final case class Msg(from: String, to: Vector[String], subject: String,
                       date: String, msgId: String, cte: String,
                       body: String, nParts: Int,
                       attachment: Array[Byte], ok: Boolean,
                       inReplyTo: String = "",
                       references: Vector[String] = Vector.empty)

  // ------------------------------------------------------------ write

  private[ops] def qpEncode(s: String): String = {
    val raw = s.getBytes(UTF_8)
    val out = new StringBuilder(raw.length + 16)
    var lineLen = 0
    def emit(tok: String): Unit = {
      // soft break before the token would overflow a 76-char line
      if (lineLen + tok.length > 72) { out.append("=\n"); lineLen = 0 }
      out.append(tok); lineLen += tok.length
    }
    def lineStartsFrom(at: Int): Boolean =
      at + 5 <= raw.length && raw(at) == 'F' && raw(at + 1) == 'r' &&
        raw(at + 2) == 'o' && raw(at + 3) == 'm' && raw(at + 4) == ' '
    var atLineStart = true
    var i = 0
    while (i < raw.length) {
      val c = raw(i) & 0xff
      if (c == '\n') { out.append('\n'); lineLen = 0; atLineStart = true }
      else {
        if (c == '=' || c < 32 || c > 126) emit(f"=$c%02X")
        else if ((c == ' ' || c == '\t') &&
          (i + 1 == raw.length || raw(i + 1) == '\n'))
          emit(f"=$c%02X") // trailing whitespace must be encoded
        else if (atLineStart && c == 'F' && lineStartsFrom(i))
          emit("=46") // line-initial "From " would read as a separator
        else emit(c.toChar.toString)
        atLineStart = false
      }
      i += 1
    }
    out.toString
  }

  private[ops] def qpDecode(s: String): String = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    def hex(c: Char): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else -1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=' && i + 1 < s.length && s.charAt(i + 1) == '\n')
        i += 2 // soft break
      else if (c == '=' && i + 2 < s.length &&
        hex(s.charAt(i + 1)) >= 0 && hex(s.charAt(i + 2)) >= 0) {
        out.write(hex(s.charAt(i + 1)) * 16 + hex(s.charAt(i + 2)))
        i += 3
      } else { out.write(c.toInt & 0xff); i += 1 }
    }
    new String(out.toByteArray, UTF_8)
  }

  private def b64Lines(b: Array[Byte]): String =
    Base64.getEncoder.encodeToString(b).grouped(76).mkString("\n")

  /** RFC 2047 B-encoded word. */
  private def encWord(s: String): String =
    "=?UTF-8?B?" + Base64.getEncoder.encodeToString(s.getBytes(UTF_8)) + "?="

  /** mboxrd stuffing: any body line matching `^>*From ` gains a '>'. */
  private[ops] def stuff(body: String): String =
    body.split("\n", -1).map { line =>
      if (line.dropWhile(_ == '>').startsWith("From ")) ">" + line else line
    }.mkString("\n")

  private[ops] def unstuff(body: String): String =
    body.split("\n", -1).map { line =>
      if (line.startsWith(">") &&
        line.dropWhile(_ == '>').startsWith("From ")) line.drop(1) else line
    }.mkString("\n")

  /** A complete mboxrd file. Every message carries From/To (the To
    * list FOLDED across continuation lines when it has >1 address —
    * the unfold exercise), Subject (RFC 2047 split-word form when
    * `encodeSubject`), Date, Message-ID, MIME-Version and either a
    * single text/plain part or multipart/mixed with a base64
    * application/octet-stream attachment. */
  def build(msgs: Seq[MsgSpec]): Array[Byte] = {
    val sb = new StringBuilder(msgs.length * 256)
    msgs.foreach { m =>
      sb.append("From ").append(m.from)
        .append(" Thu Jan  1 00:00:00 2024\n")
      sb.append("From: ").append(m.from).append('\n')
      // fold: first address on the header line, rest on continuations
      sb.append("To: ").append(m.to.headOption.getOrElse(""))
      m.to.drop(1).foreach(a => sb.append(",\n ").append(a))
      sb.append('\n')
      val subj =
        if (m.encodeSubject) {
          // two adjacent encoded words across a fold; they must
          // rejoin WITHOUT a space (RFC 2047 §6.2)
          val cut = m.subject.length / 2
          encWord(m.subject.take(cut)) + "\n " + encWord(m.subject.drop(cut))
        } else m.subject
      sb.append("Subject: ").append(subj).append('\n')
      sb.append("Date: ").append(m.date).append('\n')
      sb.append("Message-ID: ").append(m.msgId).append('\n')
      m.replyTo.foreach(r =>
        sb.append("In-Reply-To: ").append(r).append('\n'))
      if (m.references.nonEmpty) {
        // the References chain folds one id per continuation line —
        // the RFC 5322 layout threading clients emit
        sb.append("References: ").append(m.references.head)
        m.references.drop(1).foreach(r => sb.append("\n ").append(r))
        sb.append('\n')
      }
      sb.append("MIME-Version: 1.0\n")
      val cte = m.enc match {
        case 1 => "quoted-printable"
        case 2 => "base64"
        case _ => "7bit"
      }
      def bodyLines: String = m.enc match {
        case 1 => qpEncode(m.body)
        case 2 => b64Lines(m.body.getBytes(UTF_8))
        case _ => stuff(m.body)
      }
      m.attachment match {
        case None =>
          sb.append("Content-Type: text/plain; charset=utf-8\n")
          sb.append("Content-Transfer-Encoding: ").append(cte)
            .append("\n\n")
          sb.append(bodyLines).append('\n')
        case Some(att) =>
          val bnd = "b_" + m.msgId.replaceAll("[^A-Za-z0-9]", "")
          sb.append("Content-Type: multipart/mixed; boundary=\"")
            .append(bnd).append("\"\n\n")
          sb.append("--").append(bnd).append('\n')
          sb.append("Content-Type: text/plain; charset=utf-8\n")
          sb.append("Content-Transfer-Encoding: ").append(cte)
            .append("\n\n")
          sb.append(bodyLines).append('\n')
          sb.append("--").append(bnd).append('\n')
          sb.append("Content-Type: application/octet-stream\n")
          sb.append("Content-Transfer-Encoding: base64\n\n")
          sb.append(b64Lines(att)).append('\n')
          sb.append("--").append(bnd).append("--\n")
      }
      sb.append('\n') // blank line between messages
    }
    sb.toString.getBytes(UTF_8)
  }

  // ------------------------------------------------------------ parse

  /** Unfold RFC 5322 headers: a line starting with WSP continues the
    * previous header; the fold collapses to a single space (and to
    * NOTHING between two adjacent encoded words). */
  private def headers(lines: Seq[String]): Vector[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    var name: String = null
    var value: String = null
    def flush(): Unit = if (name != null) out += ((name, value))
    lines.foreach { line =>
      if (line.nonEmpty && (line.charAt(0) == ' ' ||
        line.charAt(0) == '\t')) {
        if (value != null) value = value + " " + line.trim
      } else {
        flush()
        val i = line.indexOf(':')
        if (i > 0) { name = line.take(i).toLowerCase
          value = line.drop(i + 1).trim
        } else { name = null; value = null }
      }
    }
    flush()
    out.result()
  }

  private val EncWord =
    """=\?[Uu][Tt][Ff]-8\?([BbQq])\?([^?]*)\?=""".r

  /** RFC 2047 decode: B and Q encoded words; whitespace BETWEEN two
    * adjacent encoded words is dropped, ordinary text kept. */
  private[ops] def decodeWords(s: String): String = {
    val ms = EncWord.findAllMatchIn(s).toVector
    if (ms.isEmpty) return s
    val sb = new StringBuilder(s.length)
    var pos = 0
    var prevWasWord = false
    ms.foreach { m =>
      val between = s.substring(pos, m.start)
      // linear-white-space-only separation (folds included) between
      // two adjacent encoded words is dropped; other text is kept
      if (!(prevWasWord && between.nonEmpty && between.forall(c =>
        c == ' ' || c == '\t' || c == '\n' || c == '\r')))
        sb.append(between)
      val decoded = try {
        if (m.group(1).equalsIgnoreCase("B"))
          new String(Base64.getDecoder.decode(m.group(2)), UTF_8)
        else qpDecode(m.group(2).replace('_', ' '))
      } catch { case _: IllegalArgumentException => m.matched }
      sb.append(decoded)
      pos = m.end
      prevWasWord = true
    }
    sb.append(s.substring(pos))
    sb.toString
  }

  private def decodeBody(cte: String, raw: String): String = cte match {
    case "quoted-printable" => qpDecode(raw)
    case "base64" =>
      try new String(Base64.getMimeDecoder.decode(raw), UTF_8)
      catch { case _: IllegalArgumentException => "" }
    case _ => unstuff(raw)
  }

  private def parseOne(text: String): Option[Msg] = {
    val lines = text.split("\n", -1).toVector
    if (lines.isEmpty || !lines.head.startsWith("From ")) return None
    val from0 = lines.head.drop(5).takeWhile(_ != ' ')
    val blank = lines.indexWhere(_.isEmpty, 1)
    if (blank < 0) return Some(Msg(from0, Vector.empty, "", "", "",
      "", "", 0, Array.emptyByteArray, ok = false))
    val hs = headers(lines.slice(1, blank))
    def h(n: String): String =
      hs.find(_._1 == n).map(_._2).getOrElse("")
    val body0 = lines.drop(blank + 1).mkString("\n")
    val to = h("to").split(",").map(_.trim).filter(_.nonEmpty).toVector
    val subject = decodeWords(h("subject"))
    val irt = h("in-reply-to")
    val refs = h("references").split("\\s+")
      .filter(_.nonEmpty).toVector
    val ct = h("content-type")
    val cteTop = h("content-transfer-encoding").toLowerCase match {
      case "" => "7bit"
      case x => x
    }
    if (ct.startsWith("multipart/")) {
      val bm = """boundary="?([^";]+)"?""".r.findFirstMatchIn(ct)
      bm match {
        case None => Some(Msg(from0, to, subject, h("date"),
          h("message-id"), "", "", 0, Array.emptyByteArray, ok = false,
          irt, refs))
        case Some(b) =>
          val bnd = b.group(1)
          val segs = body0.split(
            java.util.regex.Pattern.quote("--" + bnd), -1).toVector
          // segs: preamble, part..., "--\n" closer
          val closed = segs.lastOption.exists(_.startsWith("--"))
          val parts = segs.drop(1).dropRight(1).map { seg =>
            val s = seg.stripPrefix("\n")
            val pb = s.indexOf("\n\n")
            if (pb < 0) ("", "7bit", "")
            else {
              val ph = headers(s.take(pb).split("\n", -1).toSeq)
              val pct = ph.find(_._1 == "content-type").map(_._2)
                .getOrElse("text/plain")
              val pcte = ph.find(_._1 == "content-transfer-encoding")
                .map(_._2.toLowerCase).getOrElse("7bit")
              (pct, pcte, s.drop(pb + 2).stripSuffix("\n"))
            }
          }
          val textPart = parts.find(_._1.startsWith("text/plain"))
          val attPart = parts.find(!_._1.startsWith("text/plain"))
          val att = attPart.map { case (_, _, raw) =>
            try Base64.getMimeDecoder.decode(raw)
            catch { case _: IllegalArgumentException =>
              Array.emptyByteArray }
          }.getOrElse(Array.emptyByteArray)
          Some(Msg(from0, to, subject, h("date"), h("message-id"),
            textPart.map(_._2).getOrElse(""),
            textPart.map(p => decodeBody(p._2, p._3)).getOrElse(""),
            parts.length, att,
            ok = closed && textPart.nonEmpty, irt, refs))
      }
    } else {
      Some(Msg(from0, to, subject, h("date"), h("message-id"), cteTop,
        decodeBody(cteTop, body0), 1, Array.emptyByteArray,
        ok = h("message-id").nonEmpty, irt, refs))
    }
  }

  /** Total parse: messages in file order. Every line-initial `From `
    * outside a message body's stuffed form delimits (strict mboxrd). */
  def parse(b: Array[Byte]): Vector[Msg] = {
    if (b == null || b.length == 0) return Vector.empty
    val text = new String(b, UTF_8)
    if (!text.startsWith("From ")) return Vector.empty
    // split at line-initial "From " — bodies are stuffed, so every
    // such line is a real separator
    val starts = Vector.newBuilder[Int]
    starts += 0
    var i = text.indexOf("\nFrom ")
    while (i >= 0) { starts += i + 1; i = text.indexOf("\nFrom ", i + 1) }
    val ss = starts.result()
    ss.indices.flatMap { k =>
      val end = if (k + 1 < ss.length) ss(k + 1) else text.length
      // framing, byte-exactly: the writer terminates every message
      // with '\n' + a blank separator line, and a segment runs up to
      // AND INCLUDING the newline the "\nFrom " match sat on — so
      // every segment (last included) carries exactly TWO framing
      // newlines. Strip exactly those two; a body's own trailing
      // newline survives.
      val seg = text.substring(ss(k), end)
        .stripSuffix("\n").stripSuffix("\n")
      try parseOne(seg)
      catch { case _: RuntimeException => None }
    }.toVector
  }
}
