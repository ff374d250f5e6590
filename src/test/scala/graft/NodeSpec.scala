package graft

import graft.doc._

import org.scalatest.funsuite.AnyFunSuite

/** Node-tree parse/select goldens (reference DocSpec/NodeSpec over
  * FileDocsFixture; selectors from the reference's own tests).
  */
class NodeSpec extends AnyFunSuite {

  private val html =
    """<!DOCTYPE html>
      |<html>
      |<head><title>Test Page</title></head>
      |<body>
      |  <div id="main" class="content box">
      |    <h1>Heading &amp; More</h1>
      |    <p class="intro">First paragraph with <a href="link1.html">a link</a>.</p>
      |    <p>Second paragraph, long enough to look like body text for boilerpipe.</p>
      |    <ul>
      |      <li><a href="/abs/one.html" class="nav">One</a></li>
      |      <li><a href="two.html" class="nav">Two</a></li>
      |      <li><span>no link</span></li>
      |    </ul>
      |    <img src="logo.png" alt="">
      |  </div>
      |  <div class="sidebar">
      |    <h2>S1</h2><p>after s1</p>
      |    <h2>S2</h2><p>after s2</p>
      |  </div>
      |</body>
      |</html>""".stripMargin

  private val root = HtmlNode.parse(html, "file:/fix/page.html")

  test("findAll by tag, class, id, attribute") {
    assert(root.findAll("p").size == 4)
    assert(root.findAll(".intro").size == 1)
    assert(root.findAll("#main").size == 1)
    assert(root.findAll("a[href]").size == 3)
    assert(root.findAll("a[href^=/abs]").size == 1)
    assert(root.findAll("li a.nav").size == 2)
    assert(root.findAll("div > h1").size == 1)
    assert(root.findAll("ul > a").isEmpty) // child combinator is strict
    assert(root.findAll("h1, h2").size == 3)
  }

  test("findOnly / findFirst / children") {
    assert(root.findOnly("title").text == "Test Page")
    assert(root.findFirst("p").map(_.text).exists(_.startsWith("First paragraph")))
    intercept[IllegalArgumentException](root.findOnly("p"))
    val main = root.findOnly("#main").asInstanceOf[HtmlNode]
    assert(main.children("p").size == 2)
    assert(main.children("li").isEmpty) // li are not DIRECT children
  }

  test("text, ownText, entities, code") {
    assert(root.findOnly("h1").text == "Heading & More")
    val intro = root.findOnly(".intro")
    assert(intro.text == "First paragraph with a link .")
    assert(intro.ownText == "First paragraph with .")
    assert(root.findOnly("title").code.contains("<title>"))
  }

  test("attr, allAttr, href/src absolutization") {
    val img = root.findOnly("img")
    assert(img.attr("alt").isEmpty)               // noEmpty trims empty
    assert(img.attr("alt", noEmpty = false).contains(""))
    assert(img.src.contains("file:/fix/logo.png"))
    val links = root.findAll("a").flatMap(_.href)
    assert(links == Seq("file:/fix/link1.html", "file:/abs/one.html", "file:/fix/two.html"))
  }

  test("breadcrumb") {
    assert(root.findOnly("h1").breadcrumb == Seq("html", "body", "div", "h1"))
  }

  test("findAllWithSiblings clips at neighboring matches") {
    val sidebar = root.findOnly(".sidebar")
    val groups = sidebar.findAllWithSiblings("h2", 0 to 2)
    assert(groups.size == 2)
    // first h2's window must stop before the second h2
    assert(groups(0).map(_.text) == Seq("S1", "after s1"))
    assert(groups(1).map(_.text) == Seq("S2", "after s2"))
  }

  test("boilerPipe extracts paragraph-ish text") {
    val bp = root.boilerPipe
    assert(bp.contains("Second paragraph"))
    assert(!bp.contains("Test Page")) // title is not article text
  }

  test("unclosed tags and raw-text elements are tolerated") {
    val messy = HtmlNode.parse("<div><p>one<p>two<script>if (a<b) {x}</script></div>")
    assert(messy.findAll("p").nonEmpty)
    assert(messy.findAll("script").head.code.contains("if (a<b)"))
  }

  test("JSON node tree: recursive select, arrays exploded, attr, paths") {
    val json =
      """{"name":"root","items":[{"name":"a","v":1},{"name":"b","v":2}],
        |"nested":{"deep":{"name":"c","url":"http://x"}}}""".stripMargin
    val n = JsonNode.parse(json)
    assert(n.findAll("name").map(_.text) == Seq("root", "a", "b", "c"))
    assert(n.findAll("v").map(_.text) == Seq("1", "2"))
    assert(n.findAll("items").size == 2) // array exploded
    assert(n.findAll("nested.name").map(_.text) == Seq("c"))
    assert(n.findAll("deep").head.attr("name").contains("c"))
    assert(n.findAll("deep").head.href.contains("http://x"))
    assert(n.children("name").map(_.text) == Seq("root"))
  }

  test("CSV cells by header name") {
    val csv = CsvNode.parse("a,b,c\n1,\"x,y\",3\n4,z,6")
    assert(csv.findAll("b").map(_.text) == Seq("x,y", "z"))
    assert(csv.childNodes.size == 2)
  }

  test("mime dispatch: binary is Unrecognisable, text is Plain") {
    val png = Doc(DocUID("k"), "file:/x/logo11w.png",
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 1))
    assert(png.mime == "image/png")
    assert(png.isImage)
    assert(png.root == Node.Unrecognisable)
    assert(png.root.findAll("anything").isEmpty)

    val txt = Doc(DocUID("k"), "file:/x/readme.txt", "hello world".getBytes("UTF-8"))
    assert(txt.root.text == "hello world")

    val sniffed = Doc(DocUID("k"), "file:/noext", "<html><p>x</p></html>".getBytes("UTF-8"))
    assert(sniffed.mime == "text/html")
    assert(sniffed.root.findAll("p").size == 1)
  }

  test("charset: header param, BOM and meta-tag detection; non-UTF-8 round-trips") {
    // Content-Type parameter wins
    val sjis = "こんにちは" // こんにちは
    val d1 = Doc(DocUID("cs1"), "file:/a.txt", sjis.getBytes("Shift_JIS"),
      Some("text/plain; charset=Shift_JIS"))
    assert(d1.charset == "Shift_JIS")
    assert(d1.contentStr == sjis)
    assert(d1.root.text == sjis)
    // meta tag sniff on a Latin-1 page with no header charset
    val latin = "<html><head><meta charset=\"ISO-8859-1\"></head>" +
      "<body><p>café</p></body></html>"
    val d2 = Doc(DocUID("cs2"), "file:/b.html", latin.getBytes("ISO-8859-1"),
      Some("text/html"))
    assert(d2.charset.equalsIgnoreCase("ISO-8859-1"))
    assert(d2.root.findOnly("p").text == "café")
    // a UTF-8 read of those bytes would have mangled the é
    assert(new String(latin.getBytes("ISO-8859-1"), "UTF-8") != latin)
    // XML declaration
    val xml = """<?xml version="1.0" encoding="ISO-8859-1"?><r>olé</r>"""
    val d3 = Doc(DocUID("cs3"), "file:/c.xml", xml.getBytes("ISO-8859-1"), Some("text/xml"))
    assert(d3.charset.equalsIgnoreCase("ISO-8859-1"))
    // UTF-16 BOM
    val d4 = Doc(DocUID("cs4"), "file:/d.txt", ("\uFEFF" + "hi").getBytes("UTF-16BE"),
      Some("text/plain"))
    assert(d4.charset == "UTF-16BE")
    assert(d4.contentStr.endsWith("hi"))
    // default stays UTF-8
    val d5 = Doc(DocUID("cs5"), "file:/e.txt", "plain".getBytes("UTF-8"), Some("text/plain"))
    assert(d5.charset == "UTF-8")
  }

  test("doc validations") {
    val ok = Doc(DocUID("k"), "u", "<html><head><title>t</title></head></html>".getBytes("UTF-8"),
      Some("text/html"))
    val noTitle = Doc(DocUID("k"), "u", "<html><body>x</body></html>".getBytes("UTF-8"),
      Some("text/html"))
    val err = Doc(DocUID("k"), "u", Array.empty[Byte], Some("text/html"), status = 404)
    assert(DocValidation.StatusCode2XX.accept(ok) && !DocValidation.StatusCode2XX.accept(err))
    assert(DocValidation.HasTitle.accept(ok) && !DocValidation.HasTitle.accept(noTitle))
    assert(DocValidation.HasHead.accept(ok) && !DocValidation.HasHead.accept(noTitle))
    assert(DocValidation.Bypass.accept(err))
  }
}
