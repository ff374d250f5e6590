package graft.doc

import scala.collection.mutable.ArrayBuffer

/** Native RTF text extraction behind the [[Node]] seam — the RTF leg of the
  * reference's Tika any-mime normalisation (reference doc/Content.scala:50-60):
  * a control-word interpreter sufficient to recover document text, not a
  * full renderer.
  *
  * Handled per the RTF 1.9 spec (public Word processing format):
  *   - control words `\word[N]` with their optional space terminator;
  *     `\par`/`\line` emit newline, `\tab` a TAB, `\emdash` etc. their chars
  *   - control symbols `\{`, `\}`, `\\`, `\~` (nbsp), `\-`/`\_` (hyphens)
  *   - hex escapes `\'hh` (decoded as latin-1 — the common cp1252 range's
  *     printable subset)
  *   - unicode escapes `\uN` with the `\ucN` fallback-skip protocol
  *     (group-scoped, inherited, default 1)
  *   - group destinations that must NOT contribute text: `{\*\...}` and the
  *     standard non-content tables (fonttbl/colortbl/stylesheet/info/
  *     pict/header/footer/themedata/...)
  *
  * Result shape mirrors [[OfficeNode]]: one block per paragraph, `text`
  * joins with newlines, `findAll("block")` / "*" yields blocks. Input that
  * does not start with `{\rtf` is [[Node.Unrecognisable]].
  */
object RtfNode {

  private val SkipDestinations = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "themedata", "colorschememapping",
    "latentstyles", "datastore", "xmlnstbl", "filetbl", "revtbl",
    "generator", "wgrffmtfilter", "listtable", "listoverridetable")

  /** Fixture/export writer: minimal RTF whose [[parse]] round-trips `text`
    * losslessly for content without leading/trailing whitespace per
    * paragraph (parse trims blocks; `\n` becomes a `\par` paragraph break
    * and blocks re-join with `\n`). Escaping: the three control chars,
    * 7-bit printable passthrough, and `\uN?` (with `\uc1`) for every other
    * UTF-16 code unit — surrogate halves emit as two `\uN`, which [[parse]]
    * reassembles, so any Unicode round-trips.
    */
  def write(text: String): String = {
    val sb = new StringBuilder("{\\rtf1\\ansi\\uc1 ")
    text.foreach {
      case '\\' => sb.append("\\\\")
      case '{'  => sb.append("\\{")
      case '}'  => sb.append("\\}")
      case '\n' => sb.append("\\par ")
      case '\t' => sb.append("\\tab ")
      case c if c >= 0x20 && c < 0x7f => sb.append(c)
      case c =>
        val n = c.toInt
        sb.append("\\u").append(if (n > 32767) n - 65536 else n).append('?')
    }
    sb.append('}').toString
  }

  def parse(content: String): Node = {
    if (!content.startsWith("{\\rtf")) return Node.Unrecognisable
    val blocks = ArrayBuffer.empty[String]
    val sb = new StringBuilder

    def endParagraph(): Unit = {
      val t = sb.toString.trim
      if (t.nonEmpty) blocks += t
      sb.clear()
    }

    // group state: (skipDepth>0 means inside a skipped destination), uc is
    // group-scoped and inherited on push
    var skipDepth = 0
    var uc = 1
    val ucStack = scala.collection.mutable.Stack.empty[Int]
    var pendingUcSkip = 0 // fallback chars to swallow after \uN

    var i = 0
    val n = content.length
    while (i < n) {
      val c = content(i)
      c match {
        case '{' =>
          ucStack.push(uc)
          if (skipDepth > 0) skipDepth += 1
          else {
            // peek for a destination to skip: {\* or {\knownword
            var j = i + 1
            if (j < n && content(j) == '\\') {
              j += 1
              if (j < n && content(j) == '*') skipDepth = 1
              else {
                val start = j
                while (j < n && content(j).isLetter) j += 1
                if (SkipDestinations.contains(content.substring(start, j))) skipDepth = 1
              }
            }
          }
          i += 1
        case '}' =>
          if (ucStack.nonEmpty) uc = ucStack.pop()
          if (skipDepth > 0) skipDepth -= 1
          i += 1
        case '\\' if i + 1 < n =>
          val next = content(i + 1)
          if (next.isLetter) {
            var j = i + 1
            while (j < n && content(j).isLetter) j += 1
            val word = content.substring(i + 1, j)
            var k = j
            var neg = false
            if (k < n && content(k) == '-') { neg = true; k += 1 }
            val numStart = k
            while (k < n && content(k).isDigit) k += 1
            val param: Option[Int] =
              if (k > numStart)
                try Some({ val v = content.substring(numStart, k).toInt; if (neg) -v else v })
                catch { case _: NumberFormatException => None }
              else None
            if (k < n && content(k) == ' ') k += 1 // the word's space terminator
            if (word == "bin") {
              // \binN: the next N BYTES are raw binary (picture data) — they
              // may contain '{' '}' '\' that must not be interpreted; skip
              // them wholesale regardless of group state
              i = math.min(n.toLong, k.toLong + math.max(0, param.getOrElse(0))).toInt
            } else {
              if (skipDepth == 0) word match {
                case "par" | "sect" | "page" => endParagraph()
                case "line" => sb.append('\n')
                case "tab" => sb.append('\t')
                case "emdash" => sb.append('—')
                case "endash" => sb.append('–')
                case "lquote" => sb.append('‘')
                case "rquote" => sb.append('’')
                case "ldblquote" => sb.append('“')
                case "rdblquote" => sb.append('”')
                case "bullet" => sb.append('•')
                case "uc" => uc = param.getOrElse(1)
                case "u" =>
                  val cp = param.getOrElse(0)
                  val ch = if (cp < 0) cp + 65536 else cp
                  if (ch > 0) sb.appendAll(Character.toChars(ch))
                  pendingUcSkip = uc
                case _ => // formatting word: no text
              }
              i = k
            }
          } else if (next == '\'') {
            // \'hh hex escape — ONE fallback unit for a pending \uN skip
            if (i + 3 < n) {
              if (skipDepth == 0) {
                if (pendingUcSkip > 0) pendingUcSkip -= 1
                else try sb.append(Integer.parseInt(content.substring(i + 2, i + 4), 16).toChar)
                catch { case _: NumberFormatException => }
              }
              i += 4
            } else i = n
          } else {
            if (skipDepth == 0) next match {
              case '{' | '}' | '\\' =>
                if (pendingUcSkip > 0) pendingUcSkip -= 1 else sb.append(next)
              case '~' => sb.append(' ')
              case '-' | '_' => sb.append('-')
              case '\r' | '\n' => endParagraph() // \<newline> acts as \par
              case _ => // unknown control symbol: ignore
            }
            i += 2
          }
        case '\r' | '\n' =>
          i += 1 // raw newlines are insignificant in RTF
        case _ =>
          if (skipDepth == 0) {
            if (pendingUcSkip > 0) pendingUcSkip -= 1
            else sb.append(c)
          }
          i += 1
      }
    }
    endParagraph()
    val bs = blocks.toVector
    if (bs.isEmpty) Node.Unrecognisable else new BlockRoot(bs)
  }
}

/** Shared "list of text blocks" root for extractors without real tree
  * structure (RTF paragraphs, EPUB chapters, legacy-binary salvage):
  * `findAll("block")`/"*" yields the blocks, `text` joins with newlines —
  * the same contract as OfficeNode's root.
  */
private[doc] final class BlockRoot(blocks: Vector[String]) extends Node {
  override def findAll(selector: String): Seq[Node] =
    if (selector == "block" || selector == "*") childNodes else Seq.empty
  override def children(selector: String): Seq[Node] = findAll(selector)
  override def childNodes: Seq[Node] = blocks.map(PlainNode(_))
  override def text: String = blocks.mkString("\n")
  override def code: String = text
  override def boilerPipe: String = text
}
