package graft.sources

import graft.doc.{Doc, DocUID}

/** sitemaps.org XML parsing — the discovery half of crawl compliance
  * ([[graft.agent.Robots]] collects `Sitemap:` urls; this turns the fetched
  * documents into frontier entries). Both layouts: `<urlset>` leaves yield
  * url entries (loc + optional lastmod), `<sitemapindex>` nodes yield child
  * sitemap urls — which are just more uris to fetch, so index recursion is
  * the engine's existing explore loop, not bespoke machinery (feed
  * `sitemaps` back into `recursively(...)` / a fetch stage). Parsing rides
  * the Doc seam, so `.xml.gz` sitemaps (the common large form) inflate
  * transparently and charset declarations are honored.
  */
object Sitemap {

  final case class Entry(loc: String, lastmod: Option[String])
  final case class Parsed(urls: Seq[Entry], sitemaps: Seq[String])

  def parse(doc: Doc): Parsed = {
    val root = doc.root
    val urls = root.findAll("url").flatMap { u =>
      u.findAll("loc").headOption.map { l =>
        Entry(l.text.trim, u.findAll("lastmod").headOption.map(_.text.trim))
      }
    }
    val subs = root.findAll("sitemap")
      .flatMap(_.findAll("loc").headOption).map(_.text.trim)
    Parsed(urls, subs)
  }

  def parse(bytes: Array[Byte], uri: String = "http://site/sitemap.xml"): Parsed =
    parse(Doc(DocUID("sitemap"), uri, bytes, declaredMime = Some("text/xml")))
}
