package graft.doc

import java.nio.charset.{Charset, StandardCharsets}
import scala.collection.mutable.ArrayBuffer

/** Native RFC 5322 / MIME email extraction behind the [[Node]] seam — the
  * `.eml` leg of the reference's Tika any-mime normalisation (reference
  * doc/Content.scala:50-60): mail archives are a first-class corpus source
  * and their container format is publicly specified (RFC 5322 message
  * syntax, RFC 2045/2046 MIME multipart + transfer encodings, RFC 2047
  * encoded-word headers).
  *
  * Handled:
  *   - header block parse with folding (continuation lines) unfolded
  *   - RFC 2047 encoded-words in Subject (`=?charset?B|Q?...?=`, adjacent
  *     words concatenated, `_` = space in Q)
  *   - `Content-Type: multipart` subtypes with `boundary` (quoted or token) part
  *     splitting, including the closing `--boundary--` delimiter
  *   - per-part `Content-Transfer-Encoding`: quoted-printable (hard/soft
  *     breaks, lowercase hex accepted) and base64 (whitespace-tolerant),
  *     7bit/8bit passthrough; per-part charset (default UTF-8)
  *   - non-MIME messages: the body after the first blank line is one block
  *
  * Result shape mirrors [[RtfNode]]: [[BlockRoot]] whose blocks are the
  * decoded Subject followed by each part's text; `text` joins with
  * newlines. Input without a parseable header block is
  * [[Node.Unrecognisable]] (the dispatch falls back to plain text).
  */
object EmlNode {

  private val CRLF = "\r\n"

  // ------------------------------------------------------------- writer

  /** Fixture/export writer: a deterministic multipart/mixed message whose
    * [[parse]] round-trips subject, body, and attachment losslessly —
    * subject through RFC 2047 B-words (split at code-point boundaries so
    * any Unicode incl. astral survives), body through quoted-printable,
    * attachment through base64. The Date header is a fixed literal
    * (fixtures must be byte-deterministic).
    */
  def write(subject: String, body: String, attachment: String): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("From: fixtures@example.invalid").append(CRLF)
    sb.append("To: corpus@example.invalid").append(CRLF)
    sb.append("Date: Thu, 01 Jan 2026 00:00:00 +0000").append(CRLF)
    sb.append("Subject: ").append(encodeSubject(subject)).append(CRLF)
    sb.append("MIME-Version: 1.0").append(CRLF)
    sb.append("Content-Type: multipart/mixed; boundary=\"b42graft\"").append(CRLF)
    sb.append(CRLF)
    sb.append("--b42graft").append(CRLF)
    sb.append("Content-Type: text/plain; charset=utf-8").append(CRLF)
    sb.append("Content-Transfer-Encoding: quoted-printable").append(CRLF)
    sb.append(CRLF)
    sb.append(quotedPrintable(body)).append(CRLF)
    sb.append("--b42graft").append(CRLF)
    sb.append("Content-Type: text/plain; charset=utf-8; name=\"notes.txt\"").append(CRLF)
    sb.append("Content-Transfer-Encoding: base64").append(CRLF)
    sb.append("Content-Disposition: attachment; filename=\"notes.txt\"").append(CRLF)
    sb.append(CRLF)
    sb.append(base64Lines(attachment.getBytes(StandardCharsets.UTF_8))).append(CRLF)
    sb.append("--b42graft--").append(CRLF)
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** ASCII subjects pass through; anything else becomes B-encoded-words of
    * ≤30 UTF-8 bytes each (encoded-word ≤ 52 chars < RFC 2047's 75),
    * chunked at code-point boundaries, folded with CRLF+space.
    */
  private def encodeSubject(s: String): String = {
    if (s.forall(c => c >= 0x20 && c < 0x7f)) return s
    val words = ArrayBuffer.empty[String]
    val chunk = new StringBuilder
    var bytes = 0
    def flush(): Unit = if (chunk.nonEmpty) {
      val b = java.util.Base64.getEncoder.encodeToString(
        chunk.toString.getBytes(StandardCharsets.UTF_8))
      words += s"=?UTF-8?B?$b?="
      chunk.clear(); bytes = 0
    }
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val w = new String(Character.toChars(cp)).getBytes(StandardCharsets.UTF_8).length
      if (bytes + w > 30) flush()
      chunk.appendAll(Character.toChars(cp)); bytes += w
      i += Character.charCount(cp)
    }
    flush()
    words.mkString(CRLF + " ")
  }

  private def quotedPrintable(s: String): String = {
    val out = new StringBuilder
    var col = 0
    def emit(tok: String): Unit = {
      if (col + tok.length > 74) { out.append("=").append(CRLF); col = 0 }
      out.append(tok); col += tok.length
    }
    s.getBytes(StandardCharsets.UTF_8).foreach { b =>
      val u = b & 0xff
      if (u == '\n') { out.append(CRLF); col = 0 } // hard break
      else if (u == '=' || u < 0x20 || u > 0x7e) emit(f"=$u%02X")
      else emit(u.toChar.toString)
    }
    out.toString
  }

  private def base64Lines(bytes: Array[Byte]): String =
    java.util.Base64.getMimeEncoder(76, CRLF.getBytes).encodeToString(bytes)

  // ------------------------------------------------------------- parser

  def parse(content: Array[Byte]): Node = {
    val raw = new String(content, StandardCharsets.ISO_8859_1) // byte-faithful
    val (headers, body) = splitHeaders(raw) match {
      case Some(hb) => hb
      case None => return Node.Unrecognisable
    }
    if (!headers.contains("subject") && !headers.contains("from") &&
      !headers.contains("received")) return Node.Unrecognisable

    val subject = headers.get("subject").map(decodeWords).getOrElse("")
    val ctype = headers.getOrElse("content-type", "text/plain")
    val blocks = ArrayBuffer.empty[String]
    if (subject.trim.nonEmpty) blocks += subject.trim

    def partText(partHeaders: Map[String, String], partBody: String): Option[String] = {
      val pct = partHeaders.getOrElse("content-type", "text/plain")
      if (!pct.toLowerCase.startsWith("text/") && !pct.toLowerCase.startsWith("message/"))
        return None // binary attachments don't contribute text blocks
      val cte = partHeaders.getOrElse("content-transfer-encoding", "7bit")
        .trim.toLowerCase
      val csName = paramOf(pct, "charset").getOrElse("UTF-8")
      val cs = try Charset.forName(csName) catch { case _: Exception => StandardCharsets.UTF_8 }
      val bytes: Array[Byte] = cte match {
        case "quoted-printable" => decodeQp(partBody)
        case "base64" =>
          try java.util.Base64.getMimeDecoder.decode(
            partBody.filter(c => !c.isWhitespace))
          catch { case _: IllegalArgumentException => partBody.getBytes(StandardCharsets.ISO_8859_1) }
        case _ => partBody.getBytes(StandardCharsets.ISO_8859_1)
      }
      val t = new String(bytes, cs).trim
      if (t.nonEmpty) Some(t) else None
    }

    // recursive part walk: real mail nests (multipart/alternative inside
    // multipart/mixed); depth-capped against malicious nesting
    def collect(hs: Map[String, String], bd: String, depth: Int): Unit = {
      val ct = hs.getOrElse("content-type", "text/plain")
      if (ct.toLowerCase.startsWith("multipart/") && depth < 8) {
        paramOf(ct, "boundary") match {
          case Some(b) =>
            splitParts(bd, b).foreach { part =>
              splitHeaders(part) match {
                case Some((ph, pb)) => collect(ph, pb, depth + 1)
                case None =>
                  val t = part.trim
                  if (t.nonEmpty) blocks += t
              }
            }
          case None =>
            val t = bd.trim
            if (t.nonEmpty) blocks += t // declared multipart, no boundary: salvage
        }
      } else partText(hs, bd).foreach(blocks += _)
    }
    collect(headers, body, 0)

    val bs = blocks.toVector
    if (bs.isEmpty) Node.Unrecognisable else new BlockRoot(bs)
  }

  /** Header block / body split at the first blank line; None when the
    * leading lines don't look like headers. Folded lines unfold.
    */
  private def splitHeaders(raw: String): Option[(Map[String, String], String)] = {
    val norm = raw.replace("\r\n", "\n")
    val sep = norm.indexOf("\n\n")
    val (head, body) = if (sep >= 0) (norm.substring(0, sep), norm.substring(sep + 2))
    else (norm, "")
    val unfolded = head.replaceAll("\n[ \t]+", " ")
    val hs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var ok = true
    unfolded.split('\n').foreach { line =>
      if (line.nonEmpty && ok) {
        val c = line.indexOf(':')
        if (c <= 0 || !line.substring(0, c).forall(ch => ch.isLetterOrDigit || ch == '-'))
          ok = false
        else hs.put(line.substring(0, c).trim.toLowerCase, line.substring(c + 1).trim)
      }
    }
    if (!ok || hs.isEmpty) None else Some((hs.toMap, body))
  }

  /** MIME parameter of a structured header value (quoted or token). */
  private def paramOf(value: String, name: String): Option[String] = {
    val lower = value.toLowerCase
    val i = lower.indexOf(name.toLowerCase + "=")
    if (i < 0) return None
    val rest = value.substring(i + name.length + 1)
    if (rest.startsWith("\"")) {
      val e = rest.indexOf('"', 1)
      if (e < 0) None else Some(rest.substring(1, e))
    } else Some(rest.takeWhile(c => c != ';' && !c.isWhitespace))
  }

  /** RFC 2047: decode every encoded-word; whitespace BETWEEN two adjacent
    * encoded-words is transparent, other text passes through.
    */
  private[doc] def decodeWords(s: String): String = {
    val re = "=\\?([^?]+)\\?([bBqQ])\\?([^?]*)\\?=".r
    val parts = ArrayBuffer.empty[(Boolean, String)] // (isWord, text)
    var last = 0
    re.findAllMatchIn(s).foreach { m =>
      if (m.start > last) parts += ((false, s.substring(last, m.start)))
      val cs = try Charset.forName(m.group(1)) catch { case _: Exception => StandardCharsets.UTF_8 }
      val payload = m.group(3)
      val bytes = m.group(2).toLowerCase match {
        case "b" =>
          try java.util.Base64.getDecoder.decode(payload)
          catch { case _: IllegalArgumentException => payload.getBytes(StandardCharsets.ISO_8859_1) }
        case _ => decodeQp(payload.replace('_', ' '))
      }
      parts += ((true, new String(bytes, cs)))
      last = m.end
    }
    if (last < s.length) parts += ((false, s.substring(last)))
    // drop pure-whitespace gaps between adjacent encoded-words
    val sb = new StringBuilder
    parts.indices.foreach { i =>
      val (isWord, t) = parts(i)
      val skip = !isWord && t.forall(_.isWhitespace) &&
        i > 0 && i < parts.length - 1 && parts(i - 1)._1 && parts(i + 1)._1
      if (!skip) sb.append(t)
    }
    sb.toString
  }

  /** Quoted-printable decode: `=XX` (case-insensitive), `=\n` soft breaks,
    * bare newlines are hard breaks (LF; the caller normalized CRLF).
    */
  private[doc] def decodeQp(s: String): Array[Byte] = {
    val norm = s.replace("\r\n", "\n")
    val out = new java.io.ByteArrayOutputStream
    var i = 0
    while (i < norm.length) {
      val c = norm.charAt(i)
      if (c == '=' && i + 1 < norm.length && norm.charAt(i + 1) == '\n') i += 2 // soft break
      else if (c == '=' && i + 2 < norm.length &&
        isHex(norm.charAt(i + 1)) && isHex(norm.charAt(i + 2))) {
        out.write(Integer.parseInt(norm.substring(i + 1, i + 3), 16))
        i += 3
      } else { out.write(c.toInt & 0xff); i += 1 }
    }
    out.toByteArray
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Split a multipart body on its boundary delimiters (RFC 2046): parts
    * lie between `--boundary` lines; `--boundary--` closes; the preamble
    * (before the first delimiter) and epilogue are discarded.
    */
  private def splitParts(body: String, boundary: String): Seq[String] = {
    val lines = body.split('\n')
    val parts = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var in = false
    lines.foreach { line =>
      val t = line.stripSuffix("\r")
      if (t == s"--$boundary" || t == s"--$boundary--") {
        if (in && cur.nonEmpty) parts += cur.toString
        cur.clear()
        in = t == s"--$boundary"
      } else if (in) cur.append(line).append('\n')
    }
    parts.toSeq
  }
}
