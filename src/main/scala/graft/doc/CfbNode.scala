package graft.doc

import java.nio.charset.{Charset, StandardCharsets}
import scala.collection.mutable.ArrayBuffer

/** Compound File Binary (CFB / OLE2, magic D0CF11E0) with REAL structure
  * walking — the container of legacy Office files (.doc/.xls/.ppt; the
  * reference delegates these to Tika, doc/Content.scala:50-60). Replaces
  * the printable-run salvage ([[CfbSalvage]]) for the two formats whose
  * text layout is publicly specified:
  *
  *  - '''Word (.doc, MS-DOC)''': the `WordDocument` stream's FIB points
  *    (fcClx/lcbClx) into the `0Table`/`1Table` stream, whose piece table
  *    (Clx → PlcPcd) maps character positions to file offsets with a
  *    per-piece compressed (cp1252) vs UTF-16LE flag. Text is recovered
  *    piece by piece — faithful order, faithful bytes, no guessing.
  *  - '''Excel (.xls, BIFF8)''': the `Workbook`/`Book` stream's record
  *    chain; strings come from the SST (shared string table, id 0x00FC,
  *    including `Continue` spans whose char data re-declares its own
  *    high-byte flag) and sheet names from BoundSheet8 records.
  *
  * Anything else inside a CFB (PowerPoint, MSG, …) falls back to the
  * documented salvage path, as does any structural parse failure — bulk
  * ingestion must degrade, never throw.
  *
  * The reader walks header → DIFAT → FAT → directory → stream chains
  * (regular sectors ≥ the mini cutoff, the root entry's mini stream +
  * miniFAT below it), with cycle guards on every chain.
  */
object CfbNode {

  private val Cp1252: Charset = Charset.forName("windows-1252")
  private val EndOfChain = 0xFFFFFFFE
  private val MaxSectors = 1 << 20 // chain-walk guard: 512 MB of sectors

  // ---------------------------------------------------------------------
  // little-endian helpers
  // ---------------------------------------------------------------------
  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private[doc] final case class Entry(name: String, entryType: Int,
                                      start: Int, size: Long)

  /** Parsed container: named streams, lazily materialized. */
  private final class Container(content: Array[Byte]) {
    require(content.length >= 512, "truncated CFB header")
    private val sectorShift = u16(content, 0x1E)
    require(sectorShift >= 7 && sectorShift <= 12, s"bad sector shift $sectorShift")
    private val sectorSize = 1 << sectorShift
    private val miniShift = u16(content, 0x20)
    private val miniSize = 1 << math.max(miniShift, 1)
    private val numFat = u32(content, 0x2C)
    private val firstDir = u32(content, 0x30)
    private val miniCutoff = u32(content, 0x38)
    private val firstMiniFat = u32(content, 0x3C)
    private val firstDifat = u32(content, 0x44)
    private val numDifat = u32(content, 0x48)

    private def sector(n: Int): Array[Byte] = {
      val off = (n.toLong + 1) * sectorSize
      require(off >= 0 && off + sectorSize <= content.length, s"sector $n out of range")
      java.util.Arrays.copyOfRange(content, off.toInt, off.toInt + sectorSize)
    }

    // FAT sector list: 109 header DIFAT slots + chained DIFAT sectors
    private val fatSectors: Vector[Int] = {
      val ids = Vector.newBuilder[Int]
      var taken = 0
      var i = 0
      while (i < 109 && taken < numFat) {
        val v = u32(content, 0x4C + 4 * i)
        if (v >= 0) { ids += v; taken += 1 }
        i += 1
      }
      var difat = firstDifat
      var guard = 0
      while (taken < numFat && difat != EndOfChain && difat >= 0 && guard <= numDifat + 1) {
        val s = sector(difat)
        var j = 0
        while (j < sectorSize / 4 - 1 && taken < numFat) {
          val v = u32(s, 4 * j)
          if (v >= 0) { ids += v; taken += 1 }
          j += 1
        }
        difat = u32(s, sectorSize - 4)
        guard += 1
      }
      ids.result()
    }

    private val fat: Array[Int] = {
      val entriesPerSector = sectorSize / 4
      val arr = new Array[Int](fatSectors.size * entriesPerSector)
      fatSectors.zipWithIndex.foreach { case (fs, i) =>
        val s = sector(fs)
        var j = 0
        while (j < entriesPerSector) { arr(i * entriesPerSector + j) = u32(s, 4 * j); j += 1 }
      }
      arr
    }

    private def chain(start: Int, table: Array[Int]): Vector[Int] = {
      val out = Vector.newBuilder[Int]
      var cur = start
      var n = 0
      while (cur != EndOfChain && cur >= 0 && n < MaxSectors) {
        out += cur
        require(cur < table.length, s"chain runs off the FAT ($cur)")
        cur = table(cur)
        n += 1
      }
      require(n < MaxSectors, "FAT chain cycle")
      out.result()
    }

    private def readChain(start: Int, size: Long): Array[Byte] = {
      val secs = chain(start, fat)
      val out = new Array[Byte](math.min(size, secs.size.toLong * sectorSize).toInt)
      var off = 0
      secs.foreach { s =>
        val b = sector(s)
        val n = math.min(sectorSize, out.length - off)
        if (n > 0) { System.arraycopy(b, 0, out, off, n); off += n }
      }
      out
    }

    val entries: Vector[Entry] = {
      val dirBytes = readChain(firstDir, Long.MaxValue >> 16)
      val out = Vector.newBuilder[Entry]
      var off = 0
      while (off + 128 <= dirBytes.length) {
        val nameLen = u16(dirBytes, off + 64) // bytes incl. terminator
        val tpe = dirBytes(off + 66) & 0xff
        if (tpe != 0 && nameLen >= 2 && nameLen <= 64) {
          val name = new String(dirBytes, off, nameLen - 2, StandardCharsets.UTF_16LE)
          val start = u32(dirBytes, off + 116)
          val size = u32(dirBytes, off + 120).toLong & 0xFFFFFFFFL
          out += Entry(name, tpe, start, size)
        }
        off += 128
      }
      out.result()
    }

    private lazy val miniFat: Array[Int] = {
      if (firstMiniFat == EndOfChain || firstMiniFat < 0) Array.empty
      else {
        val bytes = readChain(firstMiniFat, Long.MaxValue >> 16)
        val arr = new Array[Int](bytes.length / 4)
        var i = 0
        while (i < arr.length) { arr(i) = u32(bytes, 4 * i); i += 1 }
        arr
      }
    }

    private lazy val miniStream: Array[Byte] =
      entries.find(_.entryType == 5)
        .map(r => readChain(r.start, r.size))
        .getOrElse(Array.empty)

    def stream(name: String): Option[Array[Byte]] =
      entries.find(e => e.entryType == 2 && e.name == name).map { e =>
        if (e.size >= miniCutoff) readChain(e.start, e.size)
        else {
          val secs = chain(e.start, miniFat)
          val out = new Array[Byte](e.size.toInt)
          var off = 0
          secs.foreach { s =>
            val from = s * miniSize
            val n = math.min(miniSize, out.length - off)
            if (n > 0) {
              // a mini sector past the mini stream means a malformed miniFAT
              // chain — fail loudly so parse()'s NonFatal catch degrades to
              // CfbSalvage instead of silently misaligning the stream bytes
              require(from + n <= miniStream.length,
                s"mini sector $s out of range (miniStream ${miniStream.length} bytes)")
              System.arraycopy(miniStream, from, out, off, n); off += n
            }
          }
          out
        }
      }
  }

  // ---------------------------------------------------------------------
  // parse (reader)
  // ---------------------------------------------------------------------

  private def isCfb(content: Array[Byte]): Boolean =
    content.length >= 8 &&
      (content(0) & 0xff) == 0xd0 && (content(1) & 0xff) == 0xcf &&
      (content(2) & 0xff) == 0x11 && (content(3) & 0xff) == 0xe0

  def parse(content: Array[Byte]): Node = {
    if (!isCfb(content)) return Node.Unrecognisable
    val blocks: Option[Vector[String]] =
      try {
        val c = new Container(content)
        c.stream("WordDocument").flatMap(wd => wordBlocks(wd, c))
          .orElse(c.stream("Workbook").orElse(c.stream("Book")).flatMap(xlsBlocks))
          .orElse(c.stream("PowerPoint Document").flatMap(pptBlocks))
          .orElse(msgBlocks(c))
      } catch { case scala.util.control.NonFatal(_) => None }
    blocks.filter(_.nonEmpty).map(bs => new BlockRoot(bs): Node)
      .getOrElse(CfbSalvage.parse(content))
  }

  /** MS-DOC text: FIB → Clx in the table stream → PlcPcd pieces. */
  private def wordBlocks(wd: Array[Byte], c: Container): Option[Vector[String]] = {
    if (wd.length < 0x01AA || u16(wd, 0) != 0xA5EC) return None
    val whichTbl = (u16(wd, 0x0A) & 0x0200) != 0
    val table = c.stream(if (whichTbl) "1Table" else "0Table")
      .orElse(c.stream("1Table")).orElse(c.stream("0Table")).getOrElse(return None)
    val fcClx = u32(wd, 0x01A2)
    val lcbClx = u32(wd, 0x01A6)
    if (fcClx < 0 || lcbClx <= 0 || fcClx.toLong + lcbClx > table.length) return None
    var p = fcClx
    val end = fcClx + lcbClx
    // skip Prc (grpprl) entries: 0x01 marker + cb(u16) + cb bytes
    while (p < end && table(p) == 0x01) p += 3 + u16(table, p + 1)
    if (p >= end || table(p) != 0x02) return None
    val lcb = u32(table, p + 1)
    val plc = p + 5
    if (lcb < 4 + 12 || plc + lcb > end) return None
    val n = (lcb - 4) / 12
    val sb = new java.lang.StringBuilder
    var k = 0
    while (k < n) {
      val cpStart = u32(table, plc + 4 * k)
      val cpEnd = u32(table, plc + 4 * (k + 1))
      val pcd = plc + 4 * (n + 1) + 8 * k
      val fcRaw = u32(table, pcd + 2)
      val len = cpEnd - cpStart
      if (len < 0) return None
      if ((fcRaw & 0x40000000) != 0) {
        val fc = (fcRaw & 0x3FFFFFFF) / 2
        if (fc + len > wd.length) return None
        sb.append(new String(wd, fc, len, Cp1252))
      } else {
        val fc = fcRaw & 0x3FFFFFFF
        if (fc + 2L * len > wd.length) return None
        sb.append(new String(wd, fc, 2 * len, StandardCharsets.UTF_16LE))
      }
      k += 1
    }
    // paragraph marks (\r) and cell marks (0x07) delimit blocks; 0x0B is
    // an in-paragraph line break. Everything else passes VERBATIM — the
    // extraction must round-trip text losslessly (the q38 discipline).
    val text = sb.toString.replace(11.toChar, '\n') // 0x0B line break
    Some(text.split(Array('\r', 7.toChar)).toVector.filter(_.nonEmpty))
  }

  /** BIFF8 record walk: SST strings (Continue-spanning aware) + sheet names. */
  private def xlsBlocks(wb: Array[Byte]): Option[Vector[String]] = {
    val out = Vector.newBuilder[String]
    var sawAny = false
    var pos = 0
    while (pos + 4 <= wb.length) {
      val id = u16(wb, pos)
      val sz = u16(wb, pos + 2)
      val bodyStart = pos + 4
      if (bodyStart + sz > wb.length) return if (sawAny) Some(out.result()) else None
      id match {
        case 0x0085 => // BoundSheet8: name as ShortXLUnicodeString at +6
          if (sz >= 8) {
            val cch = wb(bodyStart + 6) & 0xff
            val high = (wb(bodyStart + 7) & 0x01) != 0
            val nameLen = if (high) 2 * cch else cch
            if (8 + nameLen <= sz) {
              out += (if (high) new String(wb, bodyStart + 8, nameLen, StandardCharsets.UTF_16LE)
                      else new String(wb, bodyStart + 8, nameLen, Cp1252))
              sawAny = true
            }
          }
        case 0x00FC => // SST + any directly-following Continue records
          val segs = ArrayBuffer[(Int, Int)]((bodyStart, sz))
          var p2 = bodyStart + sz
          while (p2 + 4 <= wb.length && u16(wb, p2) == 0x003C) {
            val csz = u16(wb, p2 + 2)
            segs += ((p2 + 4, csz))
            p2 += 4 + csz
          }
          sstStrings(wb, segs.toSeq).foreach { ss => out ++= ss; sawAny = true }
        case _ => ()
      }
      pos = bodyStart + sz
    }
    if (sawAny) Some(out.result().filter(_.nonEmpty)) else None
  }

  /** Strings of an SST spread over (start, len) segments. Character data
    * crossing into a Continue record re-declares its OWN high-byte flag as
    * the continuation's first byte (the BIFF8 rule); rich-run and ext-rst
    * payloads skip as plain bytes.
    */
  private def sstStrings(wb: Array[Byte], segs: Seq[(Int, Int)]): Option[Vector[String]] = {
    var seg = 0
    var off = 0
    def remaining = segs(seg)._2 - off
    def atEnd = seg >= segs.size || (seg == segs.size - 1 && remaining <= 0)
    def advance(): Boolean = { // move to next segment when exhausted
      while (seg < segs.size && remaining <= 0) { seg += 1; off = 0 }
      seg < segs.size
    }
    def byte(): Int = {
      if (!advance()) throw new IllegalStateException("SST truncated")
      val b = wb(segs(seg)._1 + off) & 0xff
      off += 1
      b
    }
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) {
        if (!advance()) throw new IllegalStateException("SST truncated")
        val take = math.min(left, remaining)
        off += take; left -= take
      }
    }
    try {
      skip(4) // cstTotal
      val cstUnique = byte() | (byte() << 8) | (byte() << 16) | (byte() << 24)
      if (cstUnique < 0 || cstUnique > 4_000_000) return None
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < cstUnique && !atEnd) {
        val cch = byte() | (byte() << 8)
        var flags = byte()
        val fRich = (flags & 0x08) != 0
        val fExt = (flags & 0x04) != 0
        val cRun = if (fRich) byte() | (byte() << 8) else 0
        val cbExt = if (fExt) byte() | (byte() << 8) | (byte() << 16) | (byte() << 24) else 0
        val sb = new java.lang.StringBuilder(cch)
        var read = 0
        while (read < cch) {
          if (remaining <= 0) { // char data continues: fresh grbit byte
            if (!advance()) throw new IllegalStateException("SST truncated")
            flags = byte()
          }
          if ((flags & 0x01) != 0) { val lo = byte(); val hi = byte(); sb.append(((hi << 8) | lo).toChar) }
          else sb.append(Cp1252.decode(java.nio.ByteBuffer.wrap(Array(byte().toByte))).charAt(0))
          read += 1
        }
        skip(4 * cRun)
        skip(cbExt)
        out += sb.toString
        i += 1
      }
      Some(out.result())
    } catch { case _: IllegalStateException | _: IndexOutOfBoundsException => None }
  }

  /** MS-PPT text: a PowerPoint Document stream is a tree of 8-byte-header
    * records (verAndInstance u16 / recType u16 / recLen u32, little-endian;
    * recVer 0xF marks a container whose body is child records — [MS-PPT]
    * §2.3, the public record grammar). Text lives in leaf atoms:
    * TextCharsAtom (0x0FA0, UTF-16LE), TextBytesAtom (0x0FA8, one byte per
    * char, high byte implied 0 — decoded cp1252 like BIFF compressed
    * strings), and CString (0x0FBA, UTF-16LE — titles/names). The walk
    * visits every record in stream order, so text in superseded edits of an
    * incrementally-saved deck also surfaces (the Tika-parity behavior for a
    * text extractor; slide structure is not reconstructed). PowerPoint's
    * paragraph separator is '\r' and its line break 0x0B — blocks split on
    * the former, the latter maps to '\n' (the [[wordBlocks]] convention).
    * A record whose declared length overruns its parent is malformed:
    * the level stops there; if nothing was extracted the caller degrades
    * to [[CfbSalvage]].
    */
  private def pptBlocks(pp: Array[Byte]): Option[Vector[String]] = {
    val out = Vector.newBuilder[String]
    var sawAny = false
    def emit(s: String): Unit = {
      sawAny = true
      out ++= s.replace(11.toChar, '\n').split('\r').toVector.filter(_.nonEmpty)
    }
    def walk(start: Int, end: Int, depth: Int): Unit = {
      var pos = start
      var ok = true
      while (ok && pos + 8 <= end) {
        val verInst = u16(pp, pos)
        val recType = u16(pp, pos + 2)
        val len = u32(pp, pos + 4)
        val body = pos + 8
        if (len < 0 || body + len > end) ok = false // malformed: stop this level
        else {
          if ((verInst & 0xF) == 0xF) {
            // container: recurse (depth cap guards pathological nesting)
            if (depth < 16) walk(body, body + len, depth + 1)
          } else recType match {
            case 0x0FA0 | 0x0FBA => // TextCharsAtom / CString: UTF-16LE
              emit(new String(pp, body, len & ~1, StandardCharsets.UTF_16LE))
            case 0x0FA8 => // TextBytesAtom: compressed 8-bit chars
              emit(new String(pp, body, len, Cp1252))
            case _ => ()
          }
          pos = body + len
        }
      }
    }
    walk(0, pp.length, 0)
    if (sawAny) Some(out.result()) else None
  }

  /** MS-OXMSG text: an Outlook .msg stores each string property as its own
    * stream named `__substg1.0_PPPPTTTT` (PPPP = property id, TTTT = type:
    * 001F = PT_UNICODE → UTF-16LE, 001E = PT_STRING8 → cp1252 — [MS-OXMSG]
    * §2.1.3, the public property-stream grammar). The text-bearing
    * properties surface in reading order: subject (0037), sender name
    * (0C1A), displayed recipients (0E04), body (1000). Body paragraphs
    * (CRLF per [MS-OXBODY]) split into blocks; other properties are single
    * blocks. Attachment/recipient storages nest their own property streams
    * (`__attach_…`/`__recip_…` prefixes on the STORAGE, stream names
    * unchanged) — the flat entry walk picks those up too, which for a text
    * extractor is the Tika-parity behavior. No known text property → None
    * (caller salvages).
    */
  private def msgBlocks(c: Container): Option[Vector[String]] = {
    val props = Seq("0037", "0C1A", "0E04", "1000")
    val found = props.flatMap { pid =>
      c.stream(s"__substg1.0_${pid}001F")
        .map(b => new String(b, 0, b.length & ~1, StandardCharsets.UTF_16LE))
        .orElse(c.stream(s"__substg1.0_${pid}001E")
          .map(b => new String(b, Cp1252)))
    }
    val blocks = found.iterator
      .flatMap(_.split("\r\n").iterator)
      .map(_.replace('\r', '\n'))
      .filter(_.nonEmpty)
      .toVector
    if (blocks.nonEmpty) Some(blocks) else None
  }

  // ---------------------------------------------------------------------
  // writer (fixture synthesis + archive-sink parity with Warc's writers)
  // ---------------------------------------------------------------------

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putU32(b: Array[Byte], off: Int, v: Int): Unit = {
    putU16(b, off, v & 0xffff); putU16(b, off + 2, (v >>> 16) & 0xffff)
  }

  /** Minimal CFB v3 container (512-byte sectors) holding flat named
    * streams: ≥ 4096-byte streams chain in the FAT, smaller ones in the
    * root's mini stream (64-byte mini sectors + miniFAT) — both reader
    * paths get exercised by real fixtures. Directory tree is the
    * degenerate right-leaning chain over name-sorted entries (valid BST
    * under the CFB length-then-uppercase order; [[parse]] walks entries
    * linearly anyway).
    */
  def write(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    val S = 512
    val sorted = streams.sortBy { case (n, _) => (n.length, n.toUpperCase) }
    val big = sorted.filter(_._2.length >= 4096)
    val mini = sorted.filter(_._2.length < 4096)
    def secsOf(n: Int) = (n + S - 1) / S

    // mini stream container: minis padded to 64-byte mini sectors
    val miniOffsets = ArrayBuffer.empty[Int] // first mini sector id per stream
    val miniBuf = new java.io.ByteArrayOutputStream()
    mini.foreach { case (_, bytes) =>
      miniOffsets += miniBuf.size() / 64
      miniBuf.write(bytes)
      val pad = (64 - bytes.length % 64) % 64
      miniBuf.write(new Array[Byte](pad))
    }
    val miniContainer = miniBuf.toByteArray
    val nMiniSectors = miniContainer.length / 64
    val miniFatSecs = if (nMiniSectors == 0) 0 else secsOf(4 * nMiniSectors)

    val nEntries = 1 + sorted.size
    val dirSecs = secsOf(128 * nEntries)
    val bigSecs = big.map(b => secsOf(b._2.length))
    val miniContSecs = secsOf(miniContainer.length)
    val dataSecs = dirSecs + miniFatSecs + bigSecs.sum + miniContSecs
    var fatSecs = 1
    while (fatSecs * (S / 4) < fatSecs + dataSecs) fatSecs += 1
    // the header's 109 DIFAT slots are the only ones this writer fills —
    // past them (streams totaling ~7 MB+) a reader would see a silently
    // truncated FAT and salvage garbled text; fail fixture synthesis loudly
    require(fatSecs <= 109,
      s"CfbNode.write does not emit DIFAT sectors (need $fatSecs FAT sectors > 109)")

    // sector layout: [FAT][dir][miniFAT][big...][mini container]
    val firstDirSec = fatSecs
    val firstMiniFatSec = firstDirSec + dirSecs
    val bigStarts = bigSecs.scanLeft(firstMiniFatSec + miniFatSecs)(_ + _)
    val miniContStart = bigStarts.last
    val totalSecs = fatSecs + dataSecs

    val fat = Array.fill(fatSecs * (S / 4))(0xFFFFFFFF)
    def markChain(start: Int, count: Int): Unit = {
      var i = 0
      while (i < count) {
        fat(start + i) = if (i == count - 1) EndOfChain else start + i + 1
        i += 1
      }
    }
    (0 until fatSecs).foreach(i => fat(i) = 0xFFFFFFFD) // FATSECT
    markChain(firstDirSec, dirSecs)
    if (miniFatSecs > 0) markChain(firstMiniFatSec, miniFatSecs)
    big.indices.foreach(i => markChain(bigStarts(i), bigSecs(i)))
    if (miniContSecs > 0) markChain(miniContStart, miniContSecs)

    val miniFat = Array.fill(math.max(miniFatSecs, 0) * (S / 4))(0xFFFFFFFF)
    mini.indices.foreach { i =>
      val start = miniOffsets(i)
      val count = (mini(i)._2.length + 63) / 64
      var j = 0
      while (j < count) {
        miniFat(start + j) = if (j == count - 1) EndOfChain else start + j + 1
        j += 1
      }
    }

    // directory entries
    val dir = new Array[Byte](dirSecs * S)
    def putEntry(idx: Int, name: String, tpe: Int, left: Int, right: Int,
                 child: Int, start: Int, size: Long): Unit = {
      val off = idx * 128
      val nm = name.getBytes(StandardCharsets.UTF_16LE)
      System.arraycopy(nm, 0, dir, off, math.min(nm.length, 62))
      putU16(dir, off + 64, math.min(nm.length, 62) + 2)
      dir(off + 66) = tpe.toByte
      dir(off + 67) = 1 // black
      putU32(dir, off + 68, left); putU32(dir, off + 72, right)
      putU32(dir, off + 76, child)
      putU32(dir, off + 116, start)
      putU32(dir, off + 120, (size & 0xFFFFFFFFL).toInt)
    }
    val NoStream = 0xFFFFFFFF
    putEntry(0, "Root Entry", 5, NoStream, NoStream,
      if (sorted.nonEmpty) 1 else NoStream,
      if (miniContSecs > 0) miniContStart else EndOfChain, miniContainer.length.toLong)
    var bigIdx = 0
    var miniIdx = 0
    sorted.zipWithIndex.foreach { case ((name, bytes), i) =>
      val (start, _) =
        if (bytes.length >= 4096) { val s = bigStarts(bigIdx); bigIdx += 1; (s, ()) }
        else { val s = miniOffsets(miniIdx); miniIdx += 1; (s, ()) }
      val right = if (i + 1 < sorted.size) i + 2 else NoStream
      putEntry(i + 1, name, 2, NoStream, right, NoStream, start, bytes.length.toLong)
    }

    // assemble
    val out = new Array[Byte]((totalSecs + 1) * S)
    // header
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
    System.arraycopy(magic, 0, out, 0, 8)
    putU16(out, 0x18, 0x003E); putU16(out, 0x1A, 0x0003) // minor/major
    putU16(out, 0x1C, 0xFFFE) // little-endian
    putU16(out, 0x1E, 9); putU16(out, 0x20, 6) // sector/mini shifts
    putU32(out, 0x2C, fatSecs)
    putU32(out, 0x30, firstDirSec)
    putU32(out, 0x38, 4096)
    putU32(out, 0x3C, if (miniFatSecs > 0) firstMiniFatSec else EndOfChain)
    putU32(out, 0x40, miniFatSecs)
    putU32(out, 0x44, EndOfChain); putU32(out, 0x48, 0)
    var i = 0
    while (i < 109) {
      putU32(out, 0x4C + 4 * i, if (i < fatSecs) i else NoStream)
      i += 1
    }
    def writeSectors(firstSec: Int, bytes: Array[Byte]): Unit =
      System.arraycopy(bytes, 0, out, (firstSec + 1) * S, bytes.length)
    val fatBytes = new Array[Byte](fatSecs * S)
    fat.indices.foreach(j => putU32(fatBytes, 4 * j, fat(j)))
    writeSectors(0, fatBytes)
    writeSectors(firstDirSec, dir)
    if (miniFatSecs > 0) {
      val mfBytes = new Array[Byte](miniFatSecs * S)
      miniFat.indices.foreach(j => putU32(mfBytes, 4 * j, miniFat(j)))
      writeSectors(firstMiniFatSec, mfBytes)
    }
    big.indices.foreach(j => writeSectors(bigStarts(j), big(j)._2))
    if (miniContSecs > 0) writeSectors(miniContStart, miniContainer)
    out
  }

  /** Minimal .xls: a BIFF8 Workbook stream — BOF, BoundSheet8 (the sheet
    * name), an SST carrying `strings` as UTF-16 entries (lossless for any
    * Unicode; each must stay under the 32k-char BIFF string cap), EOF.
    * An SST body over the 8224-byte record cap spills into Continue
    * (0x003C) records: splits happen only between characters, and character
    * data crossing a record boundary re-declares its high-byte flag as the
    * continuation's first byte — the BIFF8 rule [[sstStrings]] decodes.
    */
  def writeXls(sheetName: String, strings: Seq[String]): Array[Byte] = {
    require(strings.forall(_.length < 32000), "BIFF8 string cap")
    val Cap = 8224
    val bout = new java.io.ByteArrayOutputStream()
    def rec(id: Int, body: Array[Byte]): Unit = {
      require(body.length <= Cap, "record over BIFF8 cap needs Continue")
      bout.write(id & 0xff); bout.write((id >> 8) & 0xff)
      bout.write(body.length & 0xff); bout.write((body.length >> 8) & 0xff)
      bout.write(body)
    }
    rec(0x0809, new Array[Byte](16)) // BOF (workbook globals)
    val nm = sheetName.getBytes(StandardCharsets.UTF_16LE)
    rec(0x0085, Array[Byte](0, 0, 0, 0, 0, 0, (sheetName.length & 0xff).toByte, 1) ++ nm)

    // SST split over [SST, Continue*]: `cur` is the record being filled
    var recId = 0x00FC
    val cur = new java.io.ByteArrayOutputStream()
    def flush(): Unit = { rec(recId, cur.toByteArray); recId = 0x003C; cur.reset() }
    def w16(v: Int): Unit = { cur.write(v & 0xff); cur.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16(v >>> 16) }
    w32(strings.size); w32(strings.size)
    strings.foreach { s =>
      if (cur.size() + 3 > Cap) flush() // never split the cch+grbit header
      w16(s.length); cur.write(0x01)    // fHighByte: UTF-16LE
      val bytes = s.getBytes(StandardCharsets.UTF_16LE)
      var off = 0
      while (off < bytes.length) {
        if (cur.size() >= Cap - 1) { // no room for even one UTF-16 unit
          flush()
          cur.write(0x01) // continuation re-declares the high-byte flag
        }
        val take = math.min(bytes.length - off, (Cap - cur.size()) & ~1)
        cur.write(bytes, off, take)
        off += take
      }
    }
    flush()
    rec(0x000A, Array.empty[Byte]) // EOF
    write(Seq("Workbook" -> bout.toByteArray))
  }

  /** Minimal .doc: a 1536-byte FIB + the text as ONE UTF-16LE piece, with
    * the piece table in `1Table` — lossless for arbitrary Unicode (the
    * q38-fixture posture, legacy-Word edition).
    */
  def writeDoc(text: String): Array[Byte] = {
    val fibLen = 1536
    val textBytes = text.getBytes(StandardCharsets.UTF_16LE)
    val wd = new Array[Byte](fibLen + textBytes.length)
    putU16(wd, 0, 0xA5EC)       // wIdent
    putU16(wd, 2, 0x00C1)       // nFib (Word 97+)
    putU16(wd, 0x0A, 0x0200)    // fWhichTblStm -> 1Table
    putU32(wd, 0x01A2, 0)       // fcClx (offset in table stream)
    System.arraycopy(textBytes, 0, wd, fibLen, textBytes.length)
    val n = text.length
    val plcLen = 4 * 2 + 8      // 2 CPs + 1 PCD
    val clx = new Array[Byte](1 + 4 + plcLen)
    clx(0) = 0x02
    putU32(clx, 1, plcLen)
    putU32(clx, 5, 0); putU32(clx, 9, n) // cp0, cp1
    putU16(clx, 13, 0)                    // PCD flags
    putU32(clx, 15, fibLen)               // fc (uncompressed: byte offset)
    putU16(clx, 19, 0)                    // prm
    putU32(wd, 0x01A6, clx.length)        // lcbClx
    write(Seq("WordDocument" -> wd, "1Table" -> clx))
  }

  /** Minimal .ppt: a PowerPoint Document stream holding one Document
    * container → one SlideListWithText container → one text atom per
    * entry: ASCII text packs as TextBytesAtom (the compressed byte form),
    * anything else as TextCharsAtom (UTF-16LE — lossless for arbitrary
    * Unicode). The q65/q67 fixture posture, slideshow edition.
    */
  def writePpt(texts: Seq[String]): Array[Byte] = {
    def rec(verInst: Int, typ: Int, body: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + body.length)
      putU16(out, 0, verInst); putU16(out, 2, typ); putU32(out, 4, body.length)
      System.arraycopy(body, 0, out, 8, body.length)
      out
    }
    val atoms = texts.flatMap { t =>
      if (t.nonEmpty && t.forall(_ < 0x80))
        rec(0x0, 0x0FA8, t.getBytes(StandardCharsets.US_ASCII)) // TextBytesAtom
      else
        rec(0x0, 0x0FA0, t.getBytes(StandardCharsets.UTF_16LE)) // TextCharsAtom
    }.toArray
    val slwt = rec(0xF, 0x0FF0, atoms)      // SlideListWithText container
    val doc = rec(0xF, 0x03E8, slwt)        // Document container
    write(Seq("PowerPoint Document" -> doc))
  }

  /** Minimal .msg: subject + body as PT_UNICODE property streams — lossless
    * for arbitrary Unicode (the q65/q67/q68 fixture posture, mail edition).
    */
  def writeMsg(subject: String, body: String): Array[Byte] =
    write(Seq(
      "__substg1.0_0037001F" -> subject.getBytes(StandardCharsets.UTF_16LE),
      "__substg1.0_1000001F" -> body.getBytes(StandardCharsets.UTF_16LE)))
}
