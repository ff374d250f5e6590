package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.doc.{Doc, DocUID}

/** WARC (ISO 28500) segment reader/writer — the interchange format of bulk
  * web crawls (Common Crawl ships ~90k one-gigabyte `.warc.gz` segments per
  * snapshot; a 100 TB corpus IS a pile of these). The reference engine has
  * no WARC support (its Wget path fetches live, web/actions/Export.scala);
  * this source lets the same downstream pipeline (Doc → Node extraction →
  * dedup/quality/LID) run over archived crawls without refetching.
  *
  * Scale shape: Spark's `binaryFile` source never splits a file, so one
  * segment = one task — exactly the parallelism unit Common Crawl intends
  * (segments are sized for it). Records stream through a constant-memory
  * iterator ([[records]] works over any InputStream, DFS streams included);
  * payload bytes stay inside the scanning task — nothing is shuffled unless
  * the caller keeps the body column past a shuffle boundary (then Doc's
  * blob offload applies). Per-record gzip members (the Common Crawl layout)
  * and whole-file gzip both decode transparently: `GZIPInputStream` walks
  * concatenated members, which is also what [[graft.doc.Codecs.inflate]]
  * relies on for `.gz` Doc bodies.
  */
object Warc {

  /** One raw WARC record: lower-cased header map + the exact block bytes. */
  final case class WarcRecord(headers: Map[String, String], block: Array[Byte]) {
    def header(name: String): Option[String] = headers.get(name.toLowerCase)
    def warcType: String = header("warc-type").getOrElse("")
    def targetUri: Option[String] =
      // WARC/1.0 grammar wraps the uri in <...>; 1.1 dropped the brackets.
      header("warc-target-uri").map(u => u.stripPrefix("<").stripSuffix(">"))
    def date: String = header("warc-date").getOrElse("")
    def contentType: String = header("content-type").getOrElse("")
    def isHttpResponse: Boolean =
      warcType == "response" && contentType.startsWith("application/http")
  }

  /** Parsed `application/http` block: status + headers + body bytes. */
  final case class HttpPayload(status: Int, headers: Map[String, String], body: Array[Byte]) {
    def mime: String =
      headers.getOrElse("content-type", "application/octet-stream")
  }

  /** Flattened response row as the Dataset API exposes it. */
  final case class WarcResponse(
      segment: String,
      url: String,
      warc_date: String,
      http_status: Int,
      mime: String,
      body: Array[Byte])

  /** Refuse single records past this (corrupt Content-Length guard —
    * refusal ends the segment scan, it never truncates a record).
    */
  val MaxRecord: Long = 256L << 20

  // ---------------------------------------------------------------------
  // streaming record iterator
  // ---------------------------------------------------------------------

  /** Constant-memory record iterator over a `.warc` or `.warc.gz` stream
    * (gzip auto-detected; concatenated per-record members decode as one
    * stream). Fail-soft: a malformed header, bad Content-Length, or
    * truncated block ENDS the iterator after the last good record — bulk
    * crawl processing must survive a corrupt segment tail, not throw.
    */
  def records(raw: InputStream): Iterator[WarcRecord] = {
    val buffered = new BufferedInputStream(raw, 1 << 16)
    buffered.mark(2)
    val b0 = buffered.read(); val b1 = buffered.read()
    buffered.reset()
    val in: InputStream =
      if (b0 == 0x1f && b1 == 0x8b) new GZIPInputStream(buffered, 1 << 16)
      else buffered

    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = fetch()
      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec; nextRec = fetch(); r
      }

      private def fetch(): WarcRecord =
        try {
          // skip the inter-record CRLF CRLF (tolerate any blank run)
          var line = readLine(in)
          while (line != null && line.isEmpty) line = readLine(in)
          if (line == null || !line.startsWith("WARC/")) null
          else {
            val hdrs = Map.newBuilder[String, String]
            var h = readLine(in)
            var ok = true
            while (ok && h != null && h.nonEmpty) {
              val colon = h.indexOf(':')
              if (colon <= 0) ok = false
              else {
                hdrs += h.substring(0, colon).trim.toLowerCase ->
                  h.substring(colon + 1).trim
                h = readLine(in)
              }
            }
            if (!ok || h == null) null
            else {
              val rec = WarcRecord(hdrs.result(), Array.empty)
              val len = rec.header("content-length").flatMap(_.toLongOption).getOrElse(-1L)
              if (len < 0 || len > MaxRecord) null
              else {
                val block = readFully(in, len.toInt)
                if (block == null) null else rec.copy(block = block)
              }
            }
          }
        } catch { case _: java.io.IOException => null }
    }
  }

  /** Responses only, HTTP block parsed — the common consumption shape. */
  def responses(raw: InputStream): Iterator[(WarcRecord, HttpPayload)] =
    records(raw).flatMap { r =>
      if (r.isHttpResponse) parseHttp(r.block).map(r -> _) else None
    }

  /** One line up to LF, CR stripped; null at EOF. Header charset is
    * ISO-8859-1 per the WARC grammar (octets, not UTF-8 sequences).
    */
  private def readLine(in: InputStream): String = {
    val out = new ByteArrayOutputStream(96)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') { out.write(c); c = in.read() }
    val b = out.toByteArray
    val n = if (b.nonEmpty && b(b.length - 1) == '\r') b.length - 1 else b.length
    new String(b, 0, n, StandardCharsets.ISO_8859_1)
  }

  /** Exactly n bytes or null (truncated tail → fail-soft). */
  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val k = in.read(buf, off, n - off)
      if (k < 0) return null
      off += k
    }
    buf
  }

  /** Parse an `application/http; msgtype=response` block. Body is clamped
    * to the HTTP Content-Length when one is declared (trailing padding in
    * sloppy archives), else runs to the end of the block.
    */
  def parseHttp(block: Array[Byte]): Option[HttpPayload] = {
    val in = new ByteArrayInputStream(block)
    val status = readLine(in) match {
      case s if s != null && s.startsWith("HTTP/") =>
        s.split(" ", 3) match {
          case parts if parts.length >= 2 => parts(1).toIntOption.getOrElse(-1)
          case _                          => -1
        }
      case _ => -1
    }
    if (status < 0) None
    else {
      val hdrs = Map.newBuilder[String, String]
      var h = readLine(in)
      while (h != null && h.nonEmpty) {
        val colon = h.indexOf(':')
        if (colon > 0)
          hdrs += h.substring(0, colon).trim.toLowerCase -> h.substring(colon + 1).trim
        h = readLine(in)
      }
      val headers = hdrs.result()
      val rest = new Array[Byte](in.available())
      in.read(rest)
      val body = headers.get("content-length").flatMap(_.toIntOption) match {
        case Some(cl) if cl >= 0 && cl < rest.length => java.util.Arrays.copyOf(rest, cl)
        case _                                       => rest
      }
      Some(HttpPayload(status, headers, body))
    }
  }

  // ---------------------------------------------------------------------
  // Dataset API
  // ---------------------------------------------------------------------

  /** Distributed WARC ingest: every segment under `path` (glob ok), one
    * task per segment, response records flattened. The body column is raw
    * payload bytes — hand rows to [[toDoc]] for the extraction seam.
    * Filters on url/status/mime are cheap post-flatten (the scan itself is
    * the cost; records never leave their task here).
    *
    * `binaryFile` serves as the non-splitting FILE LISTING only — selecting
    * just `path` prunes the content column, so the scan reads file
    * metadata; each task then OPENS its segment as a DFS stream and feeds
    * [[records]] directly. A ~1 GB Common Crawl `.warc.gz` therefore never
    * materializes as a single executor byte array: peak memory per task is
    * one record block (≤ [[MaxRecord]]), whatever the segment size — the
    * constant-memory claim holds for the Dataset API, not just the raw
    * iterator. Streams close on iterator exhaustion AND on task completion
    * (the listener covers early termination, e.g. a `limit`).
    */
  def read(spark: SparkSession, path: String): Dataset[WarcResponse] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"))
      .as[String]
      .mapPartitions { segs =>
        segs.flatMap { seg =>
          val p = new org.apache.hadoop.fs.Path(seg)
          val fs = p.getFileSystem(graft.agent.DocIO.hadoopConf)
          val in = fs.open(p)
          var closed = false
          def closeOnce(): Unit = if (!closed) { closed = true; in.close() }
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
          val rows = responses(in).map { case (r, h) =>
            WarcResponse(seg, r.targetUri.getOrElse(""), r.date, h.status, h.mime, h.body)
          }
          new Iterator[WarcResponse] {
            override def hasNext: Boolean = {
              val h = rows.hasNext
              if (!h) closeOnce()
              h
            }
            override def next(): WarcResponse = rows.next()
          }
        }
      }
  }

  /** Lift a response row into the Doc/Node extraction seam: declared mime
    * from the HTTP header (charset parameter included — Doc's charset
    * detection reads it), uri for link absolutization + uri-based sniffs.
    */
  def toDoc(row: WarcResponse): Doc =
    Doc(DocUID(row.url), row.url, row.body,
      declaredMime = Some(row.mime).filter(_.nonEmpty),
      status = row.http_status)

  /** Offline crawl replay: seed the doc caches from archived segments.
    * Every response row becomes the cached observation of `Wget(url)`'s
    * CANONICAL trace key (timeouts/aliases never affect it), so a
    * subsequent fetch/explore over those urls — with caching on — runs
    * with zero network: the probe hits before any request or politeness
    * wait. `WARC-Date` supplies the observation timestamp, which is what
    * makes wayback pins select among multiple archived snapshots of one
    * url. Distributed: each task imports its own segments; executor-side
    * writes go to the conf's DFS tier (plus that executor's memory tier).
    * Returns the number of responses imported.
    */
  def importToCache(spark: SparkSession, path: String,
                    conf: graft.conf.GraftConf): Long = {
    import spark.implicits._
    read(spark, path).mapPartitions { rows =>
      var n = 0L
      rows.foreach { r =>
        val key = graft.actions.Trace.of(graft.actions.Wget(r.url)).cacheKey
        val ts =
          try java.time.Instant.parse(r.warc_date).toEpochMilli
          catch { case scala.util.control.NonFatal(_) => 0L }
        val doc = Doc(DocUID(key), r.url, r.body,
          declaredMime = Some(r.mime).filter(_.nonEmpty),
          status = r.http_status, metadata = Map("via" -> "warc"),
          timestampMillis = ts)
        graft.cache.DocCaches.write(key, Seq(doc), conf, ts)
        n += 1
      }
      Iterator.single(n)
    }.collect().sum
  }

  // ---------------------------------------------------------------------
  // writer (fixture synthesis + archive sink)
  // ---------------------------------------------------------------------

  private val Crlf = "\r\n"

  /** Serialize one record (header charset ISO-8859-1, CRLF grammar). */
  def writeRecord(warcType: String, headers: Seq[(String, String)], block: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0").append(Crlf)
    sb.append("WARC-Type: ").append(warcType).append(Crlf)
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append(Crlf) }
    sb.append("Content-Length: ").append(block.length).append(Crlf).append(Crlf)
    val head = sb.result().getBytes(StandardCharsets.ISO_8859_1)
    val out = new ByteArrayOutputStream(head.length + block.length + 4)
    out.write(head); out.write(block)
    out.write(Crlf.getBytes(StandardCharsets.ISO_8859_1))
    out.write(Crlf.getBytes(StandardCharsets.ISO_8859_1))
    out.toByteArray
  }

  /** An HTTP/1.1 response block wrapping `body`. */
  def httpResponse(status: Int, mime: String, body: Array[Byte]): Array[Byte] = {
    val head = (s"HTTP/1.1 $status OK" + Crlf +
      s"Content-Type: $mime" + Crlf +
      s"Content-Length: ${body.length}" + Crlf + Crlf)
      .getBytes(StandardCharsets.ISO_8859_1)
    val out = new ByteArrayOutputStream(head.length + body.length)
    out.write(head); out.write(body)
    out.toByteArray
  }

  /** One gzip member (the Common Crawl per-record layout). */
  def gzMember(record: Array[Byte]): Array[Byte] = {
    val bout = new ByteArrayOutputStream(record.length / 2 + 64)
    val g = new GZIPOutputStream(bout)
    g.write(record); g.close()
    bout.toByteArray
  }
}
