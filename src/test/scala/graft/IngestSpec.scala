package graft

import graft.api.GraftContext
import graft.conf.GraftConf

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Bulk file ingestion ([[GraftContext.readFiles]]): a mixed directory goes
  * through the binaryFile source into the SAME Node seam a Wget would use —
  * html gets the selector engine, json the node tree, txt the plain
  * fallback — and pathGlobFilter prunes at listing time.
  */
class IngestSpec extends AnyFunSuite {

  import SparkFixture._

  private lazy val dir = {
    val d = Files.createTempDirectory("graft-ingest").toAbsolutePath
    Files.writeString(d.resolve("a.html"),
      "<html><head><title>T-a</title></head><body><p>body a</p></body></html>")
    Files.writeString(d.resolve("b.json"), """{"k":{"name":"vee"}}""")
    Files.writeString(d.resolve("c.txt"), "plain body c")
    val sub = Files.createDirectory(d.resolve("sub"))
    Files.writeString(sub.resolve("d.html"),
      "<html><head><title>T-d</title></head><body>deep</body></html>")
    d.toString
  }

  private def ctx = new GraftContext(spark, GraftConf())

  test("mixed directory: every file lands in the right parser via mime sniff") {
    val s = spark
    import s.implicits._
    val out = ctx.readFiles(dir)
      .select { r =>
        val doc = r.trajectory.doc.get
        val name = r.data.split('/').last
        val probe = name match {
          case "a.html" => doc.root.findAll("title").headOption.map(_.text).getOrElse("")
          case "b.json" => doc.root.findAll("name").headOption.map(_.text).getOrElse("")
          case _        => doc.root.text.trim
        }
        (name, probe)
      }
      .asDataset.collect().toMap
    assert(out == Map("a.html" -> "T-a", "b.json" -> "vee", "c.txt" -> "plain body c"))
  }

  test("office-family formats flow through the same ingestion seam (rtf/epub/doc)") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("graft-ingest-office").toAbsolutePath
    Files.write(d.resolve("letter.rtf"),
      "{\\rtf1 Rtf letter body\\par}".getBytes(StandardCharsets.ISO_8859_1))
    // minimal epub: one xhtml chapter
    val epub = NodeSpec.rawZip(Seq(
      "mimetype" -> "application/epub+zip",
      "OEBPS/c1.xhtml" -> "<html><body><p>Epub chapter body</p></body></html>"))
    Files.write(d.resolve("book.epub"), epub)
    // CFB-magic .doc with a recoverable ASCII run
    val doc = new java.io.ByteArrayOutputStream()
    doc.write(Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte))
    doc.write(Array.fill(12)(0x01.toByte))
    doc.write("Legacy doc body text".getBytes(StandardCharsets.US_ASCII))
    doc.write(Array.fill(6)(0x02.toByte))
    Files.write(d.resolve("old.doc"), doc.toByteArray)

    val out = ctx.readFiles(d.toString)
      .select(r => (r.data.split('/').last, r.trajectory.doc.get.root.text))
      .asDataset.collect().toMap
    assert(out("letter.rtf") == "Rtf letter body")
    assert(out("book.epub").contains("Epub chapter body"))
    assert(out("old.doc").contains("Legacy doc body text"))
  }

  test("glob prunes at listing time; recursive descends") {
    val s = spark
    import s.implicits._
    val htmlOnly = ctx.readFiles(dir, glob = Some("*.html"))
      .select(_.data.split('/').last).asDataset.collect().toSet
    assert(htmlOnly == Set("a.html"))

    val rec = ctx.readFiles(dir, glob = Some("*.html"), recursive = true)
      .select(_.data.split('/').last).asDataset.collect().toSet
    assert(rec == Set("a.html", "d.html"))
  }

  test("docs carry bytes + file mtime; uris are absolute") {
    val rows = ctx.readFiles(dir, glob = Some("c.txt")).dataset.collect()
    assert(rows.length == 1)
    val doc = rows.head.trajectory.doc.get
    assert(new String(doc.bytes, StandardCharsets.UTF_8) == "plain body c")
    assert(doc.uri.endsWith("c.txt") && doc.uri.startsWith("file:"))
    val fsMtime = Files.getLastModifiedTime(Paths.get(dir, "c.txt")).toMillis
    assert(math.abs(doc.timestampMillis - fsMtime) <= 1000L) // second-resolution cast
  }
}
