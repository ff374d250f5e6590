package graft.doc

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** JPEG metadata extraction behind the [[Node]] seam — the most common
  * EXIF carrier in the wild (public formats: JFIF/ISO 10918 marker
  * structure + the EXIF APP1 convention, whose payload is a TIFF file):
  *
  *   - marker-segment walk (standalone markers skipped, lengths
  *     bounds-checked, stops at SOS — entropy-coded data follows)
  *   - frame dimensions from the first SOF marker
  *   - APP1 `Exif\u0000\u0000` payload delegated to [[TiffNode]]'s IFD
  *     walk, so every text tag and the EXIF UserComment surface exactly
  *     as they do for bare TIFFs — one parser, two containers
  *
  * Result: `{"jpeg":{width,height},"tiff":{…}}` — `findAll("jpeg")` for
  * the frame, `findAll("tiff")` for the EXIF block (absent when the file
  * carries none).
  */
object JpegNode {

  def parse(content: Array[Byte]): Node = {
    try {
      if (content.length < 4 ||
        (content(0) & 0xff) != 0xff || (content(1) & 0xff) != 0xd8)
        return Node.Unrecognisable
      def u16(off: Int): Int =
        if (off + 1 >= content.length) -1
        else ((content(off) & 0xff) << 8) | (content(off + 1) & 0xff)
      var width = -1
      var height = -1
      var exif: Option[String] = None
      var i = 2
      var done = false
      while (!done && i + 3 < content.length) {
        if ((content(i) & 0xff) != 0xff) { i += 1 } // padding / resync
        else {
          val marker = content(i + 1) & 0xff
          if (marker == 0xff) i += 1 // fill byte
          else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
          else {
            val len = u16(i + 2)
            if (len < 2 || i + 2 + len > content.length) done = true
            else {
              val p = i + 4 // payload start
              val pl = len - 2
              if (marker == 0xe1 && pl > 6 &&
                content(p) == 'E' && content(p + 1) == 'x' && content(p + 2) == 'i' &&
                content(p + 3) == 'f' && content(p + 4) == 0 && content(p + 5) == 0) {
                val tiff = java.util.Arrays.copyOfRange(content, p + 6, p + pl)
                if (exif.isEmpty) exif = TiffNode.metaJson(tiff)
              } else if ((marker >= 0xc0 && marker <= 0xcf) &&
                marker != 0xc4 && marker != 0xc8 && marker != 0xcc && pl >= 5) {
                // SOF: precision(1) height(2) width(2)
                if (height < 0) { height = u16(p + 1); width = u16(p + 3) }
              } else if (marker == 0xda) done = true // SOS: scan data follows
              i += 2 + len
            }
          }
        }
      }
      if (width < 0 && exif.isEmpty) return Node.Unrecognisable
      val sb = new StringBuilder
      sb.append('{')
      // A file whose SOF was never reached (truncated before the frame
      // header) must not leak -1 sentinels to attr("width") consumers:
      // the jpeg object is emitted only when real dimensions were read.
      if (width >= 0)
        sb.append("\"jpeg\":{\"width\":").append(width)
          .append(",\"height\":").append(height).append('}')
      exif.foreach { t =>
        // splice the {"tiff":{…}} object's single field alongside
        if (width >= 0) sb.append(',')
        sb.append(t.substring(1, t.length - 1))
      }
      sb.append('}')
      JsonNode.parse(sb.result())
    } catch { case scala.util.control.NonFatal(_) => Node.Unrecognisable }
  }

  /** Fixture/export writer: a REAL decodable grayscale JPEG (JDK ImageIO
    * encoder) with an EXIF APP1 spliced in right after SOI — the payload
    * is a [[TiffNode.write]] file, so the round-trip exercises the same
    * IFD walk the bare-TIFF gate does. APP1 caps at 64 KiB per the marker
    * length field; callers keep tag text under that (enforced).
    */
  def write(width: Int, height: Int, description: String, artist: String,
            userComment: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.getRaster.setSample(x, y, 0, (x * 31 + y * 17) & 0xff); x += 1
      }
      y += 1
    }
    val base = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", base)
    val jpeg = base.toByteArray
    require(jpeg.length > 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "ImageIO did not produce a JPEG")
    val exifTiff = TiffNode.write(1, 1, description, artist, userComment)
    val payload = Array[Byte]('E', 'x', 'i', 'f', 0, 0) ++ exifTiff
    require(payload.length + 2 <= 0xffff, "EXIF APP1 payload exceeds the 64 KiB marker cap")
    val out = new ByteArrayOutputStream()
    out.write(jpeg, 0, 2) // SOI
    out.write(0xff); out.write(0xe1)
    val len = payload.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(payload)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }
}
