package graft

import graft.actions._
import graft.agent.{RemoteWebDriverFactory, W3CStubServer}
import graft.api.GraftContext
import graft.cache.InMemoryDocCache
import graft.conf.GraftConf
import graft.exec.FetchedRow

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** End-to-end e-commerce crawl with FETCH BUDGETS (reference integration
  * explore/simple/ExploreIT.scala:70-71 `numPages`/`pageFetchedCap` and its
  * category-site golden): a multi-category site with paginated product
  * pages, served BOTH over real localhost HTTP (for Wget/explore) and as a
  * W3C WebDriver remote end (for the browser pagination), crawled by ONE
  * pipeline combining explore + chained Visit/Loop(ClickNext+Snapshot) +
  * fork + extraction — then re-run warm asserting ZERO fetches.
  */
class EcommerceIT extends AnyFunSuite with BeforeAndAfterAll {

  import SparkFixture._

  // --- the site: home -> {computers, phones} -> 3 leaf categories, each a
  // --- 2-page product list chained by a.next; mid pages link back home
  // --- (dedup pressure, like the reference allinone sidebar)
  private def sidebar(links: (String, String)*): String =
    links.map { case (h, t) => s"""<a class="cat" href="$h">$t</a>""" }.mkString("\n")

  private def productPage(h1: String, names: Seq[String], next: Option[String]): String = {
    val items = names.map(n => s"""<span class="name">$n</span>""").mkString("\n")
    val nav = next.map(n => s"""<a class="next" href="$n">next</a>""").getOrElse("")
    s"""<html><head><title>$h1</title></head><body><h1>$h1</h1>
       |<div class="products">$items</div>$nav</body></html>""".stripMargin
  }

  private val relPages: Map[String, String] = Map(
    "/shop" ->
      s"""<html><head><title>Shop</title></head><body><h1>E-commerce training site</h1>
         |${sidebar("/shop/computers" -> "Computers", "/shop/phones" -> "Phones")}
         |</body></html>""".stripMargin,
    "/shop/computers" ->
      s"""<html><head><title>Computers</title></head><body><h1>Computers category</h1>
         |${sidebar("/shop/computers/laptops" -> "Laptops",
            "/shop/computers/tablets" -> "Tablets", "/shop" -> "Home")}
         |</body></html>""".stripMargin,
    "/shop/phones" ->
      s"""<html><head><title>Phones</title></head><body><h1>Phones category</h1>
         |${sidebar("/shop/phones/touch" -> "Touch", "/shop" -> "Home")}
         |</body></html>""".stripMargin,
    "/shop/computers/laptops" ->
      productPage("Laptops", Seq("Aspire E1", "ThinkPad X1"),
        Some("/shop/computers/laptops?page=2")),
    "/shop/computers/laptops?page=2" ->
      productPage("Laptops", Seq("MacBook Air"), None),
    "/shop/computers/tablets" ->
      productPage("Tablets", Seq("Galaxy Tab"), Some("/shop/computers/tablets?page=2")),
    "/shop/computers/tablets?page=2" ->
      productPage("Tablets", Seq("iPad Mini"), None),
    "/shop/phones/touch" ->
      productPage("Touch", Seq("Nokia 123"), Some("/shop/phones/touch?page=2")),
    "/shop/phones/touch?page=2" ->
      productPage("Touch", Seq("Pixel 9"), None)
  )

  private var http: HttpServer = _
  private var stub: W3CStubServer = _
  private var base: String = _
  // ONE cache dir shared by the cold and warm tests (scratchDir is per-call fresh)
  private lazy val cacheDir: String = scratchDir("ecommerce-cache")

  override def beforeAll(): Unit = {
    graft.agent.HttpTuning()
    http = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    http.createContext("/", (ex: HttpExchange) => {
      val key = ex.getRequestURI.getPath +
        Option(ex.getRequestURI.getQuery).map("?" + _).getOrElse("")
      relPages.get(key) match {
        case Some(html) =>
          val bytes = html.getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.add("Content-Type", "text/html; charset=utf-8")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
        case None => ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    http.start()
    base = s"http://127.0.0.1:${http.getAddress.getPort}"
    // the same site as a W3C remote end, keyed by absolute url
    stub = new W3CStubServer(relPages.map { case (k, v) => (base + k) -> v }).start()
  }

  override def afterAll(): Unit = { http.stop(0); stub.stop() }

  private def pipeline(ctx: GraftContext): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Encoders
    implicit val pairEnc = Encoders.kryo[(FetchedRow[String], Option[(String, String)])]
    val spark0 = spark
    import spark0.implicits._

    // 1. explore the category tree over real HTTP (Wget), depth-bounded
    val explored = ctx.create(Seq(s"$base/shop"))
      .explore(u => Trace.of(Wget(u)))(EcommerceIT.sidebarExpand _)
    // 2. chained browser pagination on PRODUCT pages only: Visit + Loop
    //    (Snapshot before ClickNext so the last page survives the abort)
    val paged = explored.fetched.fetch { (r: FetchedRow[String]) =>
      if (r.trajectory.findFirst("div.products").isDefined)
        TraceSet(Seq(Trace.of(Visit(r.data), Snapshot(),
          Loop(Trace.of(ClickNext("a.next"), Snapshot()), limit = 10))))
      else TraceSet(Seq.empty)
    }
    // 3. fork product nodes out of ALL paginated snapshots + extract fields
    val products = paged.fork("div.products span.name") { n =>
      (n.breadcrumb.mkString("/"), n.text) // (node path, product name) via the Node DSL
    }
    // 4. export to DataFrame: category slug from the parent payload url + product
    products.asDataset
      .map { (row: (FetchedRow[String], Option[(String, String)])) =>
        (row._1.data.split('/').last, row._2.map(_._2).getOrElse(""))
      }(Encoders.tuple(Encoders.STRING, Encoders.STRING))
      .toDF("category", "product")
  }

  test("cold crawl: budgets, golden schema, golden rows") {
    InMemoryDocCache.clear()
    val ctx = new GraftContext(spark, GraftConf(dfsCacheDir = Some(cacheDir)))
      .withDrivers(RemoteWebDriverFactory(stub.endpoint))
    val df = pipeline(ctx)
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq

    // golden schema (reference ExploreIT schema.treeString golden)
    assert(df.schema.treeString.trim ==
      """root
        | |-- category: string (nullable = true)
        | |-- product: string (nullable = true)""".stripMargin.trim)

    // golden rows: every product under its category, across pagination
    assert(rows == Seq(
      "laptops" -> "Aspire E1", "laptops" -> "MacBook Air", "laptops" -> "ThinkPad X1",
      "tablets" -> "Galaxy Tab", "tablets" -> "iPad Mini",
      "touch" -> "Nokia 123", "touch" -> "Pixel 9"))

    // fetch budgets (reference numPages / pageFetchedCap, ExploreIT.scala:70-71):
    // pagesFetched counts page OBSERVATIONS — 6 explore Wgets (home, 2 mid,
    // 3 leaf; back-links deduped) + 2 pagination Snapshots per product
    // category (initial page + the page ClickNext lands on) × 3 = 12
    assert(ctx.metrics.pagesFetched.value == 12,
      s"budget: expected exactly 12 page observations, got ${ctx.metrics.pagesFetched.value}")
    assert(ctx.metrics.pagesFetched.value <= 18, "pageFetchedCap")
    assert(stub.openSessions == 0, "browser session leaked")
  }

  test("warm re-crawl over the DFS cache: same rows, ZERO fetches") {
    InMemoryDocCache.clear() // cold JVM tier; DFS tier survives
    val ctx = new GraftContext(spark, GraftConf(dfsCacheDir = Some(cacheDir)))
      .withDrivers(RemoteWebDriverFactory(stub.endpoint))
    val df = pipeline(ctx)
    assert(df.count() == 7)
    assert(ctx.metrics.pagesFetched.value == 0,
      s"warm run fetched ${ctx.metrics.pagesFetched.value} pages")
  }
}

object EcommerceIT {
  def sidebarExpand(r: FetchedRow[String]): Seq[(Trace, String)] =
    r.trajectory.findAll("a.cat").flatMap(_.href).map(h => (Trace.of(Wget(h)), h))
}
