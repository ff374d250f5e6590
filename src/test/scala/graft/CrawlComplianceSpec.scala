package graft

import graft.agent.Robots

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crawl compliance: robots.txt (RFC 9309) parse/match semantics, URL
  * canonicalization rules, and both native expressions under codegen.
  */
class CrawlComplianceSpec extends AnyFunSuite {

  import SparkFixture.spark

  // ---- robots.txt parser -------------------------------------------------

  private val classic = Robots.parse(
    """# global rules
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok$
      |Disallow: /tmp*
      |Crawl-delay: 1.5
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /deep
      |Crawl-delay: 2
      |
      |Sitemap: https://h/sitemap.xml
      |Unknown-field: ignored
      |""".stripMargin)

  test("robots: groups, comments, sitemaps, multi-agent heads, crawl-delay") {
    assert(classic.groups.size == 2)
    assert(classic.groups(1).agents == Seq("graftbot", "otherbot"))
    assert(classic.sitemaps == Seq("https://h/sitemap.xml"))
    assert(classic.crawlDelay("SomeBot/9") == Some(1.5)) // * group
    assert(classic.crawlDelay("graftbot/1.0") == Some(2.0))
  }

  test("robots: specific group REPLACES *, never merges; longest agent token wins") {
    // graftbot's group has no /private rule — specific group hides *'s rules
    assert(classic.allowed("graftbot/1.0", "/private"))
    assert(!classic.allowed("graftbot/1.0", "/deep/x"))
    assert(!classic.allowed("randombot", "/private"))
    assert(classic.allowed("randombot", "/deep/x"))
    // longest matching agent token chooses between two named groups (both
    // prefix the client's product token "botzilla-news")
    val two = Robots.parse(
      "User-agent: bot\nDisallow: /a\nUser-agent: botzilla\nDisallow: /b\n")
    assert(!two.allowed("botzilla-news/3", "/b")) // botzilla (8) beats bot (3)
    assert(two.allowed("botzilla-news/3", "/a"))
  }

  test("robots: group tokens match product tokens, not substrings — 'bot' cannot capture 'graftbot'") {
    val r = Robots.parse(
      "User-agent: bot\nDisallow: /a\nUser-agent: *\nDisallow: /b\n")
    // 'bot' is a substring of 'graftbot' but neither equals nor prefixes
    // the product token => graftbot falls through to the * group
    assert(r.allowed("graftbot/1.0", "/a"))
    assert(!r.allowed("graftbot/1.0", "/b"))
    // a bare 'bot' client DOES match the named group
    assert(!r.allowed("bot/2.0", "/a"))
    assert(r.allowed("bot/2.0", "/b"))
    // versioned group tokens normalize: 'graftbot/1.2' names graftbot
    val v = Robots.parse("User-agent: GraftBot/1.2\nDisallow: /x\n")
    assert(!v.allowed("Mozilla/5.0 (compatible; graftbot/2)", "/x"))
  }

  test("robots: ALL groups naming the winning token merge (RFC 9309 2.2.1); crawl-delay takes the max") {
    val r = Robots.parse(
      """User-agent: graftbot
        |Disallow: /a
        |Crawl-delay: 1
        |
        |User-agent: *
        |Disallow: /c
        |
        |User-agent: graftbot
        |User-agent: other
        |Disallow: /b
        |Crawl-delay: 3
        |""".stripMargin)
    // both graftbot groups apply; the * group does not
    assert(!r.allowed("graftbot/1.0", "/a/x"))
    assert(!r.allowed("graftbot/1.0", "/b/x"))
    assert(r.allowed("graftbot/1.0", "/c/x"))
    assert(r.crawlDelay("graftbot/1.0") == Some(3.0)) // most conservative
    // repeated * groups merge the same way
    val stars = Robots.parse(
      "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n")
    assert(!stars.allowed("x", "/a") && !stars.allowed("x", "/b"))
  }

  test("robots: longest-match precedence, allow wins ties, $ anchor, * wildcard") {
    assert(!classic.allowed("x", "/private/no"))
    assert(classic.allowed("x", "/private/ok"))  // $-anchored allow, longer
    assert(!classic.allowed("x", "/private/ok2")) // anchor fails past the end
    assert(!classic.allowed("x", "/tmp123/f"))   // * wildcard
    assert(classic.allowed("x", "/"))            // unmatched → allowed
    // equal-length tie → allow
    val tie = Robots.parse("User-agent: *\nDisallow: /dir\nAllow: /dir\n")
    assert(tie.allowed("x", "/dir/a"))
  }

  test("robots: lenient grammar — rules before any group ignored, empty Disallow allows all, empty path is /") {
    val r = Robots.parse("Disallow: /orphan\nUser-agent: *\nDisallow:\n")
    assert(r.allowed("x", "/orphan"))
    assert(r.allowed("x", "/anything"))
    assert(Robots.parse("User-agent: *\nDisallow: /\n").allowed("x", "") == false)
    assert(Robots.Empty.allowed("x", "/a"))
  }

  // ---- url_normalize -----------------------------------------------------

  // the Scala-land overload explore lambdas use (same code path)
  private def norm(u: String): String = graft.sql.UrlFunctions.normalize(u)

  test("url_normalize: case, default ports, dot segments, percent form, query policy, fragment") {
    assert(norm("HTTP://WWW.Ex.COM:80/a/./b/../c#f") == "http://www.ex.com/a/c")
    assert(norm("https://ex.com:443/") == "https://ex.com/")
    assert(norm("https://ex.com:8443/x") == "https://ex.com:8443/x") // non-default kept
    assert(norm("http://ex.com") == "http://ex.com/")                // empty path → /
    assert(norm("http://ex.com/%7Euser/%41%2f") == "http://ex.com/~user/A%2F") // decode unreserved, uppercase rest
    assert(norm("http://ex.com/a%ZZ") == "http://ex.com/a%ZZ")       // malformed triplet literal
    assert(norm("http://ex.com/p?b=2&utm_source=x&a=1&fbclid=z&&") == "http://ex.com/p?a=1&b=2")
    assert(norm("http://ex.com/p?utm_only=1") == "http://ex.com/p")  // all-tracking query drops
    assert(norm("http://User@Ex.com/x") == "http://User@ex.com/x")   // userinfo case preserved
    assert(norm("http://ex.com/a/b/../../../c") == "http://ex.com/c") // .. never escapes root
    assert(norm("http://ex.com/a/b/..") == "http://ex.com/a/")       // trailing dot-seg keeps slash
    assert(norm("mailto:x@y") == "mailto:x@y")                       // non-absolute passthrough
    assert(norm("/rel/path#frag") == "/rel/path")                    // fragment still drops
  }

  test("url_normalize is idempotent on its own output") {
    val samples = Seq(
      "HTTP://WWW.Ex.COM:80/a/./b/../c?z=2&utm_x=1&a=%41#f",
      "https://ex.com", "http://ex.com/%7E/%2f?b=&a=1")
    samples.foreach { s => assert(norm(norm(s)) == norm(s)) }
  }

  // ---- sitemaps ----------------------------------------------------------

  test("sitemap: urlset entries with lastmod, sitemapindex children, gzipped body via the Doc seam") {
    import graft.sources.Sitemap
    val urlset =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>https://s.test/a</loc><lastmod>2026-01-01</lastmod></url>
        |  <url><loc>https://s.test/b</loc></url>
        |</urlset>""".stripMargin
    val p = Sitemap.parse(urlset.getBytes("UTF-8"))
    assert(p.urls == Seq(
      Sitemap.Entry("https://s.test/a", Some("2026-01-01")),
      Sitemap.Entry("https://s.test/b", None)))
    assert(p.sitemaps.isEmpty)

    val index =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>https://s.test/sm1.xml.gz</loc></sitemap>
        |  <sitemap><loc>https://s.test/sm2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val pi = Sitemap.parse(index.getBytes("UTF-8"))
    assert(pi.urls.isEmpty)
    assert(pi.sitemaps == Seq("https://s.test/sm1.xml.gz", "https://s.test/sm2.xml"))

    // .xml.gz inflates transparently through Doc's gzip unwrap
    val bout = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bout)
    g.write(urlset.getBytes("UTF-8")); g.close()
    val pz = Sitemap.parse(bout.toByteArray, "http://s.test/sitemap.xml.gz")
    assert(pz.urls.map(_.loc) == Seq("https://s.test/a", "https://s.test/b"))
  }

  // ---- feeds ---------------------------------------------------------------

  test("feeds: RSS link text and Atom href links normalize to one entry shape; XML mode makes it possible") {
    import graft.sources.Feed
    // RSS carries the url as <link> TEXT — void-element HTML rules would
    // orphan it; XML mode nests it (regression pinned directly too)
    val xmlRoot = graft.doc.HtmlNode.parseXml("<a><link>inside</link><script><b>nested</b></script></a>")
    assert(xmlRoot.findOnly("link").text == "inside")
    assert(xmlRoot.findAll("script b").nonEmpty)

    val rss =
      """<?xml version="1.0"?><rss version="2.0"><channel>
        |<title>News &amp; Views</title><link>https://n.test/</link>
        |<item><title>First</title><link>https://n.test/1</link>
        |  <pubDate>Mon, 01 Jan 2026 00:00:00 GMT</pubDate></item>
        |<item><title>Second</title><link>https://n.test/2</link></item>
        |</channel></rss>""".stripMargin
    val r = Feed.parse(rss.getBytes("UTF-8"))
    assert(r.title == "News & Views")
    assert(r.entries == Seq(
      Feed.Entry("First", "https://n.test/1", Some("Mon, 01 Jan 2026 00:00:00 GMT")),
      Feed.Entry("Second", "https://n.test/2", None)))

    val atom =
      """<feed xmlns="http://www.w3.org/2005/Atom"><title>Blog</title>
        |<entry><title>Post</title>
        |  <link rel="self" href="https://b.test/api/1"/>
        |  <link rel="alternate" href="https://b.test/post/1"/>
        |  <updated>2026-02-01T00:00:00Z</updated></entry>
        |</feed>""".stripMargin
    val a = Feed.parse(atom.getBytes("UTF-8"))
    assert(a.title == "Blog")
    assert(a.entries == Seq(
      Feed.Entry("Post", "https://b.test/post/1", Some("2026-02-01T00:00:00Z"))))

    // gzipped feed bodies inflate through the Doc seam
    val bout = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bout)
    g.write(rss.getBytes("UTF-8")); g.close()
    assert(Feed.parse(bout.toByteArray, "http://n.test/feed.xml.gz")
      .entries.map(_.link) == Seq("https://n.test/1", "https://n.test/2"))
  }

  // ---- native expressions under codegen ----------------------------------

  test("url_normalize + robots_allowed run inside WholeStageCodegen and from SQL") {
    import graft.functions._
    val robots = "User-agent: *\nDisallow: /odd\n"
    val df = spark.range(4).select(
      concat(lit("HTTP://Ex.COM:80/"),
        when(col("id") % 2 === 1, "odd/").otherwise(lit("even/")),
        col("id").cast("string"), lit("?utm_s=1&k=v#z")).as("u"))
      .select(url_normalize(col("u")).as("url"),
        robots_allowed(lit(robots), lit("bot"), col("u")).as("ok"))
    val plan = df.queryExecution.executedPlan
    assert(plan.find(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]).isDefined)
    assert(!plan.toString.contains("ScalaUDF"))
    val rows = df.collect().sortBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq == Seq(
      "http://ex.com/even/0?k=v", "http://ex.com/even/2?k=v",
      "http://ex.com/odd/1?k=v", "http://ex.com/odd/3?k=v"))
    assert(rows.map(_.getBoolean(1)).toSeq == Seq(true, true, false, false))

    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT url_normalize('HTTP://A.B:80/x/./y#f') AS u, " +
        "robots_allowed('User-agent: *\nDisallow: /x\n', 'bot', 'http://a.b/x/y') AS ok")
      .collect().head
    assert(viaSql.getString(0) == "http://a.b/x/y")
    assert(!viaSql.getBoolean(1))
  }
}
