package graft.doc

import java.nio.charset.StandardCharsets

/** Identity of one observation: the canonical backtrace that produced it plus
  * its position in the export's output block (reference
  * doc/Observation.scala:12-87 `DocUID(backtrace, blockIndex, blockSize)`).
  */
final case class DocUID(
    backtraceKey: String,
    blockIndex: Int = 0,
    blockTotal: Int = 1,
    name: Option[String] = None
) extends Serializable

/** Result of executing one Export action (reference doc/Observation.scala):
  * a fetched [[Doc]], an empty [[NoDoc]], or a failed [[DocError]].
  * Pure serializable data — safe to carry in Dataset rows and doc caches.
  */
sealed trait Observation extends Serializable {
  def uid: DocUID
  def uri: String
  def timestampMillis: Long

  def withUID(u: DocUID): Observation
  def isSuccess: Boolean

  def docOpt: Option[Doc] = this match {
    case d: Doc => Some(d)
    case _      => None
  }

  def isLaterThan(millis: Long): Boolean = timestampMillis > millis
}

object Observation {
  def laterOf(a: Observation, b: Observation): Observation =
    if (a.timestampMillis >= b.timestampMillis) a else b
}

/** A fetched document: uri, content-type (declared, else sniffed), raw bytes,
  * HTTP-ish status, metadata (reference doc/Doc.scala:38-199). The parsed
  * [[Node]] tree is a transient lazy view — bytes are the persistent form,
  * trees are rebuilt per partition (reference flags Jsoup trees
  * NOTSerializable; same design).
  *
  * Two-level body storage (reference doc/Content.scala InMemoryBlob /
  * DFSSavedBlob): `content` holds the bytes inline, OR `contentPtr` points
  * at a DFS blob and `content` is empty — large payloads then never ride
  * through shuffles; `bytes` loads lazily on access. See [[Doc.offload]].
  */
final case class Doc(
    uid: DocUID,
    uri: String,
    content: Array[Byte],
    declaredMime: Option[String] = None,
    status: Int = 200,
    metadata: Map[String, String] = Map.empty,
    timestampMillis: Long = 0L,
    contentPtr: Option[String] = None
) extends Observation {

  override def withUID(u: DocUID): Observation = copy(uid = u)
  override def isSuccess: Boolean = status >= 200 && status < 300

  /** The body — inline, or lazily loaded from the DFS pointer. */
  def bytes: Array[Byte] =
    if (contentPtr.isEmpty || content.nonEmpty) content else loaded

  @transient private lazy val loaded: Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(contentPtr.get)
    val in = p.getFileSystem(new org.apache.hadoop.conf.Configuration()).open(p)
    try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
    finally in.close()
  }

  /** Move the body to `<dir>/<uid>.blob`, keeping only the pointer in the
    * row (no-op when already offloaded or empty).
    */
  def offload(dir: String): Doc =
    if (content.isEmpty) this
    else {
      val name = s"${uid.backtraceKey}-${uid.blockIndex}.blob"
      val path = graft.agent.DocIO.writeBytes(dir, name, content)
      copy(content = Array.empty, contentPtr = Some(path))
    }

  /** Effective mime: declared (parameters stripped) else sniffed from the uri
    * extension else from the content head (reference Doc.scala:70-144, minus
    * the Tika dependency — detection here is extension+magic heuristics).
    */
  lazy val mime: String =
    declaredMime.map(_.takeWhile(_ != ';').trim.toLowerCase)
      .filter(_.nonEmpty).filter(_ != "application/octet-stream")
      .getOrElse(Mime.sniff(uri, bytes))

  def charset: String = "UTF-8"

  lazy val contentStr: String = new String(bytes, StandardCharsets.UTF_8)

  def isImage: Boolean = mime.startsWith("image/")

  /** Root of the selector-queryable tree; [[Node.Unrecognisable]] for binary
    * content (reference Node.scala:8-26 null-object).
    */
  @transient lazy val root: Node = Node.parse(bytes, mime, uri)

  // content is an Array — default case-class equality would be reference
  // equality; identity here is uid + bytes.
  override def equals(o: Any): Boolean = o match {
    case d: Doc =>
      uid == d.uid && uri == d.uri && java.util.Arrays.equals(content, d.content) &&
        status == d.status && timestampMillis == d.timestampMillis
    case _ => false
  }
  override def hashCode(): Int =
    (uid, uri, java.util.Arrays.hashCode(content), status).hashCode()

  override def toString: String =
    s"Doc($uri, $mime, ${content.length}B, sha=${graft.actions.Trace.digest(contentStr).take(12)})"
}

/** Export executed but produced nothing (e.g. POST upload). */
final case class NoDoc(
    uid: DocUID,
    uri: String,
    timestampMillis: Long = 0L
) extends Observation {
  override def withUID(u: DocUID): Observation = copy(uid = u)
  override def isSuccess: Boolean = true
}

/** Export failed; carries the human-readable cause (reference error path,
  * Action.scala:30-75).
  */
final case class DocError(
    uid: DocUID,
    uri: String,
    message: String,
    timestampMillis: Long = 0L
) extends Observation {
  override def withUID(u: DocUID): Observation = copy(uid = u)
  override def isSuccess: Boolean = false
}

/** Extension + magic-byte mime sniffing (stands in for the reference's
  * Tika/universalchardet detection, which is not on our classpath).
  */
object Mime {
  private val byExt = Map(
    "html" -> "text/html", "htm" -> "text/html", "xhtml" -> "text/html",
    "json" -> "application/json", "xml" -> "text/xml", "csv" -> "text/csv",
    "txt" -> "text/plain", "md" -> "text/plain",
    "png" -> "image/png", "jpg" -> "image/jpeg", "jpeg" -> "image/jpeg",
    "gif" -> "image/gif", "pdf" -> "application/pdf"
  )

  def sniff(uri: String, content: Array[Byte]): String = {
    val path = uri.takeWhile(c => c != '?' && c != '#')
    val ext = path.substring(path.lastIndexOf('.') + 1).toLowerCase
    byExt.get(ext).getOrElse {
      val head = new String(content.take(256), StandardCharsets.UTF_8).trim
      if (content.startsWith(Array[Byte](0x89.toByte, 'P', 'N', 'G'))) "image/png"
      else if (head.startsWith("<!DOCTYPE") || head.toLowerCase.startsWith("<html")) "text/html"
      else if (head.startsWith("<?xml")) "text/xml"
      else if (head.startsWith("{") || head.startsWith("[")) "application/json"
      else if (head.startsWith("<")) "text/html"
      else "text/plain"
    }
  }
}
