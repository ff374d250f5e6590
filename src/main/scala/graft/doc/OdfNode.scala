package graft.doc

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

/** Native OpenDocument (odt/ods/odp) text extraction — the ODF leg of the
  * reference's Tika any-mime normalisation, next to [[OfficeNode]]'s OOXML.
  * An ODF file is a zip whose `content.xml` carries all body text; unlike
  * OOXML's `<w:t>` runs, ODF text is MIXED CONTENT directly inside
  * `<text:p>` / `<text:h>` elements (possibly nested in `<text:span>`),
  * with `<text:tab/>`, `<text:line-break/>` and `<text:s/>` as whitespace
  * elements. One block per paragraph/heading, [[RtfNode.BlockRoot]] shape
  * (`text` joins with newlines, `findAll("block")` yields them).
  *
  * Bounds: same cap discipline as OfficeNode — content.xml inflates
  * through a streaming ZipInputStream up to 64 MiB; absent content.xml →
  * `Unrecognisable` (this parser never guesses at arbitrary archives).
  */
object OdfNode {

  private val EntryCap = 64 << 20

  def parse(content: Array[Byte]): Node = {
    var xml: String = null
    val zin = new ZipInputStream(new ByteArrayInputStream(content))
    try {
      var e = zin.getNextEntry
      while (e != null && xml == null) {
        if (e.getName == "content.xml") {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = zin.read(chunk)
          while (n >= 0 && buf.size + n <= EntryCap) {
            buf.write(chunk, 0, n)
            n = zin.read(chunk)
          }
          xml = new String(buf.toByteArray, StandardCharsets.UTF_8)
        }
        e = zin.getNextEntry
      }
    } catch {
      case scala.util.control.NonFatal(_) => // corrupt zip: fall through
    } finally zin.close()

    if (xml == null) Node.Unrecognisable
    else {
      val blocks = xml.split("</text:p>|</text:h>").toVector
        .flatMap(blockText)
        .filter(_.nonEmpty)
      if (blocks.isEmpty) Node.Unrecognisable else new BlockRoot(blocks)
    }
  }

  /** Extract one paragraph's text from the chunk ending where `</text:p>`
    * (or `:h>`) was: take from the LAST `<text:p`/`<text:h` opening (the
    * split leaves preceding markup in the chunk), turn the ODF whitespace
    * elements into characters, strip every remaining tag, decode entities.
    *
    * The opening is anchored to a REAL tag boundary (name followed by
    * whitespace or `>`), mirroring the exact closing tags the split uses —
    * a bare prefix search would also match `<text:page-number>` /
    * `<text:page-count>` inside headers and attribute the wrong opening,
    * truncating or polluting the block.
    */
  private val OpenTag = "<text:(?:p|h)(?=[\\s>])".r

  private def blockText(chunk: String): Option[String] = {
    var open = -1
    OpenTag.findAllMatchIn(chunk).foreach(m => open = m.start)
    if (open < 0) None
    else {
      val gt = chunk.indexOf('>', open)
      if (gt < 0) None
      else {
        val inner = chunk.substring(gt + 1)
          .replaceAll("<text:tab\\s*/?>", "\t")
          .replaceAll("<text:line-break\\s*/?>", "\n")
          .replaceAll("<text:s\\s*/?>", " ")
          .replaceAll("<[^>]*>", "")
        val t = Entities.decode(inner)
        if (t.trim.isEmpty) None else Some(t)
      }
    }
  }
}
