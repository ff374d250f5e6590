package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.actions.{Trace, Wget}
import graft.api.GraftContext
import graft.conf.GraftConf
import graft.exec.FetchLayout

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Host-skewed crawl datapoint for the host-keyed frontier layout
  * ([[graft.exec.FetchLayout.ByHost]]): a wildcard-bound local server is
  * reachable through loopback aliases 127.0.0.x — distinct logical hosts —
  * and the frontier is deliberately skewed (one dominant host owning
  * `GRAFT_SKEW_FRAC` of all urls, default 60%).
  *
  * What the numbers mean: with a per-host min interval, the THEORETICAL
  * FLOOR for any polite crawl is dominantCount x interval (the dominant
  * host serializes; everything else hides behind it). In local mode the
  * per-JVM limiter is already global, so the datapoint is (a) every layout
  * respects the floor, and (b) ByHost placement costs ~nothing over ByKey
  * while making the same guarantee hold on a REAL cluster, where ByKey
  * scatters a host over every executor and per-JVM limiting under-spaces
  * by the executor count. Salt k admits k slots for the dominant host —
  * the documented k x rate trade a cluster buys throughput with.
  *
  * `GRAFT_HOST_N=2000 sbt "runMain graft.HostLayoutBench"`
  */
object HostLayoutBench {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_HOST_N", "1500").toInt
    val frac = sys.env.getOrElse("GRAFT_SKEW_FRAC", "0.6").toDouble
    val intervalMs = sys.env.getOrElse("GRAFT_HOST_INTERVAL_MS", "4").toLong
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // TCP_NODELAY on accepted sockets — see EngineQ.stubServer: without it
    // the header/body write pair can stall behind delayed ACKs (~40 ms per
    // response on kernels that don't fast-ACK loopback), which would
    // measure the stub, not the layout
    graft.agent.HttpTuning()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    val body = "<html><body><p>ok</p></body></html>".getBytes(StandardCharsets.UTF_8)
    server.createContext("/", (ex: HttpExchange) => {
      ex.getResponseHeaders.set("Content-Type", "text/html")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    val pool = java.util.concurrent.Executors.newFixedThreadPool(64)
    server.setExecutor(pool)
    server.start()
    val port = server.getAddress.getPort

    val nDominant = (n * frac).toInt
    val minors = 14
    val urls: Seq[String] =
      (0 until nDominant).map(i => s"http://127.0.0.2:$port/dom/$i") ++
        (0 until (n - nDominant)).map(i =>
          s"http://127.0.0.${3 + i % minors}:$port/minor/$i")
    val floorSec = nDominant * intervalMs / 1000.0

    def crawl(layout: FetchLayout): Double = {
      graft.agent.HostPoliteness.clear()
      graft.cache.InMemoryDocCache.clear()
      val ctx = new GraftContext(spark,
        GraftConf(hostMinIntervalMillis = intervalMs, cacheEnabled = false))
      val t0 = System.nanoTime()
      val c = ctx.create(urls, numSlices = 32)
        .fetchOne(u => Trace.of(Wget(u)), layout = layout).count()
      require(c == n, s"expected $n rows, got $c")
      require(ctx.metrics.pagesFetched.value == n)
      (System.nanoTime() - t0) / 1e9
    }

    // the explore path (r11 verdict #1): same skewed url population, but
    // reached as a crawl — one seed per host expanding to that host's urls
    // at depth 1 — so the frontier placement under test is ExploreExec's,
    // not FetchExec's
    val byHostUrls: Map[String, Seq[String]] =
      urls.groupBy(u => java.net.URI.create(u).getHost)
    def crawlExplore(layout: FetchLayout): Double = {
      graft.agent.HostPoliteness.clear()
      graft.cache.InMemoryDocCache.clear()
      val ctx = new GraftContext(spark,
        GraftConf(hostMinIntervalMillis = intervalMs, cacheEnabled = false))
      import spark.implicits._
      val expand = byHostUrls // local val: closure must not capture the bench object
      val t0 = System.nanoTime()
      val c = ctx.create(byHostUrls.keys.toSeq, numSlices = 32)
        .explore(h => Trace.of(Wget(s"http://$h:$port/seed")))(
          next = r =>
            if (r.data.startsWith("#")) Nil
            else expand(r.data).map(u => (Trace.of(Wget(u)), "#" + u)),
          maxDepth = 2, layout = layout)
        .count()
      require(c == n + byHostUrls.size, s"expected ${n + byHostUrls.size} rows, got $c")
      (System.nanoTime() - t0) / 1e9
    }

    crawl(FetchLayout.ByKey) // warm-up (JIT, pools)
    val byKey = crawl(FetchLayout.ByKey)
    val byHost1 = crawl(FetchLayout.ByHost(1))
    val byHost4 = crawl(FetchLayout.ByHost(4))
    val exByKey = crawlExplore(FetchLayout.ByKey)
    val exByHost1 = crawlExplore(FetchLayout.ByHost(1))
    println(f"""{"bench":"host_layout","n":$n,"dominant":$nDominant,""" +
      f""""interval_ms":$intervalMs,"floor_sec":$floorSec%.2f,""" +
      f""""by_key_sec":$byKey%.2f,"by_host1_sec":$byHost1%.2f,""" +
      f""""by_host4_sec":$byHost4%.2f,""" +
      f""""explore_by_key_sec":$exByKey%.2f,"explore_by_host1_sec":$exByHost1%.2f}""")
    server.stop(0)
    pool.shutdown() // non-daemon worker threads would keep the JVM alive
    spark.stop()
  }
}
