package graft.sources

import graft.doc.{Doc, DocUID}

/** RSS 2.0 / Atom feed parsing — the third leg of crawl discovery next to
  * [[graft.agent.Robots]] and [[Sitemap]] (feeds are how freshness-driven
  * crawls find NEW urls between sitemap regenerations). Rides the Doc seam
  * (gzip bodies inflate, charsets honored) and the XML-mode node tree —
  * RSS carries urls as `<link>` TEXT, which only parses correctly because
  * XML mode has no void elements.
  *
  * Both dialects normalize to one entry shape: RSS `<item>` (link text,
  * `pubDate`) and Atom `<entry>` (`<link href=..>` attr with the
  * `rel="alternate"`-or-unmarked preference, `updated`/`published`).
  */
object Feed {

  final case class Entry(title: String, link: String, published: Option[String])
  final case class Parsed(title: String, entries: Seq[Entry])

  def parse(doc: Doc): Parsed = {
    val root = doc.root
    val items = root.findAll("item")
    if (items.nonEmpty) { // RSS 2.0
      val title = root.findAll("channel").headOption
        .flatMap(_.children("title").headOption).map(_.text).getOrElse("")
      Parsed(title, items.flatMap { it =>
        it.children("link").headOption.map(_.text.trim).filter(_.nonEmpty).map { l =>
          Entry(it.children("title").headOption.map(_.text).getOrElse(""),
            l, it.children("pubDate").headOption.map(_.text.trim))
        }
      })
    } else {
      val entries = root.findAll("entry") // Atom
      val title = root.children("feed").headOption.orElse(Some(root))
        .flatMap(_.children("title").headOption).map(_.text).getOrElse("")
      Parsed(title, entries.flatMap { e =>
        val links = e.children("link")
        val best = links.find(l => l.attr("rel").forall(_ == "alternate"))
          .orElse(links.headOption)
        best.flatMap(_.attr("href")).map { h =>
          Entry(e.children("title").headOption.map(_.text).getOrElse(""), h,
            e.children("updated").headOption.orElse(e.children("published").headOption)
              .map(_.text.trim))
        }
      })
    }
  }

  def parse(bytes: Array[Byte], uri: String = "http://site/feed.xml"): Parsed =
    parse(Doc(DocUID("feed"), uri, bytes, declaredMime = Some("text/xml")))
}
