package graft.doc

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

/** Native PostScript text extraction behind the [[Node]] seam — the PS leg
  * of the Tika-normalisation surface ([[PdfNode]]'s sibling; public format:
  * PostScript Language Reference, Adobe). Real-world PS text rides literal
  * strings fed to the `show` operator family, exactly like PDF's `Tj`:
  *
  *   - literal `(…)` strings with the full escape set (\n \r \t \b \f
  *     \( \) \\, \ddd octal, backslash-newline continuation) and BALANCED
  *     nested parentheses (the spec's unescaped-paren rule)
  *   - a string counts as text when the next token is a show-class
  *     operator (`show`, `ashow`, `widthshow`, `awidthshow`, `kshow` — the
  *     suffix match), so procedure names and dict keys don't leak in
  *   - `%` comments skipped outside strings; DSC headers are comments
  *
  * String bytes decode UTF-8 (the writer's encoding; latin-1 PS from other
  * producers decodes byte-per-char for the ASCII range, which is what text
  * search needs). One block per shown string; `text` joins blocks with
  * newlines — the [[PdfNode]] result shape.
  */
object PsNode {

  def parse(content: Array[Byte]): Node = {
    val s = new String(content, StandardCharsets.ISO_8859_1)
    if (!s.startsWith("%!")) return Node.Unrecognisable
    try {
      val blocks = ArrayBuffer.empty[String]
      var i = 0
      val n = s.length
      while (i < n) {
        val c = s.charAt(i)
        if (c == '%') { // comment to end-of-line
          while (i < n && s.charAt(i) != '\n') i += 1
        } else if (c == '(') {
          val bytes = new ByteArrayOutputStream()
          var depth = 1
          i += 1
          while (i < n && depth > 0) {
            s.charAt(i) match {
              case '\\' if i + 1 < n =>
                s.charAt(i + 1) match {
                  case 'n' => bytes.write('\n'); i += 2
                  case 'r' => bytes.write('\r'); i += 2
                  case 't' => bytes.write('\t'); i += 2
                  case 'b' => bytes.write('\b'); i += 2
                  case 'f' => bytes.write('\f'); i += 2
                  case '\n' => i += 2 // line continuation
                  case d if d >= '0' && d <= '7' =>
                    var v = 0; var k = 0; i += 1
                    while (k < 3 && i < n && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                      v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1
                    }
                    bytes.write(v & 0xff)
                  case other => bytes.write(other.toInt & 0xff); i += 2
                }
              case '(' => depth += 1; bytes.write('('); i += 1
              case ')' =>
                depth -= 1
                if (depth > 0) bytes.write(')')
                i += 1
              case ch => bytes.write(ch.toInt & 0xff); i += 1
            }
          }
          // the operator after the string decides whether it's text
          var j = i
          while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
          val t0 = j
          while (j < n && !Character.isWhitespace(s.charAt(j)) &&
            "()<>[]{}/%".indexOf(s.charAt(j)) < 0) j += 1
          if (s.substring(t0, j).endsWith("show"))
            blocks += new String(bytes.toByteArray, StandardCharsets.UTF_8)
        } else i += 1
      }
      // keep EMPTY shown strings (`() show` is a blank line — dropping it
      // would break exact multi-line round-trips); unrecognisable only
      // when nothing textual was shown at all
      val bs = blocks.toVector
      if (bs.isEmpty || bs.forall(_.isEmpty)) Node.Unrecognisable
      else new PsRoot(bs)
    } catch { case scala.util.control.NonFatal(_) => Node.Unrecognisable }
  }

  /** Fixture/export writer: minimal DSC-conformant single-page PS, one
    * `moveto … show` per input line. Escapes parens/backslash and encodes
    * everything non-printable (and all non-ASCII, as UTF-8 bytes) in octal
    * — [[parse]] round-trips any Unicode text exactly.
    */
  def write(text: String): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("%!PS-Adobe-3.0\n%%Pages: 1\n%%Page: 1 1\n")
    sb.append("/Helvetica findfont 11 scalefont setfont\n")
    var y = 720
    text.split("\n", -1).foreach { line =>
      sb.append("72 ").append(y).append(" moveto\n(")
      line.getBytes(StandardCharsets.UTF_8).foreach { b =>
        val v = b & 0xff
        if (v == '(' || v == ')' || v == '\\') sb.append('\\').append(v.toChar)
        else if (v < 0x20 || v > 0x7e) sb.append(f"\\$v%03o")
        else sb.append(v.toChar)
      }
      sb.append(") show\n")
      y -= 13
    }
    sb.append("showpage\n%%EOF\n")
    sb.result().getBytes(StandardCharsets.ISO_8859_1)
  }

  private final class PsRoot(blocks: Vector[String]) extends Node {
    override def findAll(selector: String): Seq[Node] =
      if (selector == "block" || selector == "*") childNodes else Seq.empty
    override def children(selector: String): Seq[Node] = findAll(selector)
    override def childNodes: Seq[Node] = blocks.map(PlainNode(_))
    override def text: String = blocks.mkString("\n")
    override def code: String = text
    override def boilerPipe: String = text
  }
}
