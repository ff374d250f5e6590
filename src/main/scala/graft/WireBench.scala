package graft

import graft.agent.{W3CStubServer, WebDriverHttpBrowser}

/** Per-request latency datapoint for the W3C WebDriver WIRE CLIENT
  * ([[graft.agent.WebDriverHttpBrowser]]) against the in-JVM stub remote
  * end — no Spark, no fixture: the q150-shaped rollout pattern (session
  * create → visit → a handful of element/script commands → session
  * delete), repeated from `GRAFT_WIRE_THREADS` concurrent threads, in
  * BOTH connection modes interleaved inside ONE JVM so the comparison
  * cannot be poisoned by cross-process JIT or ambient drift (the
  * sandbox's wall clock flaps ±40% between minutes; r21/r22 discipline).
  *
  * Modes: `reuse` = the r22 keep-alive client (drain + close the response
  * stream, socket returns to the JDK pool); `churn` = the pre-r22
  * disconnect-per-request behavior (via the GRAFT_WIRE_DISCONNECT seam —
  * exported to the child threads through a system property the seam does
  * NOT read; instead churn mode simply runs with the seam env unset and
  * an explicit per-rollout browser whose requests disconnect — see the
  * client's scaladoc). Prints per-mode total seconds plus a latency
  * histogram (sub-ms / 1-10ms / 10-35ms / 35-45ms / >45ms buckets — the
  * 35-45ms bucket isolates delayed-ACK-shaped stalls).
  *
  * `GRAFT_WIRE_ROLLOUTS=500 GRAFT_WIRE_THREADS=32 sbt "runMain graft.WireBench"`
  */
object WireBench {

  private final class Hist {
    val b = new java.util.concurrent.atomic.AtomicLongArray(5)
    val totalNs = new java.util.concurrent.atomic.AtomicLong()
    val n = new java.util.concurrent.atomic.AtomicLong()
    def add(ns: Long): Unit = {
      val ms = ns / 1e6
      val i = if (ms < 1) 0 else if (ms < 10) 1 else if (ms < 35) 2 else if (ms < 45) 3 else 4
      b.incrementAndGet(i); totalNs.addAndGet(ns); n.incrementAndGet()
    }
    override def toString: String = {
      val avgUs = if (n.get() == 0) 0.0 else totalNs.get() / 1e3 / n.get()
      f"n=${n.get()}%6d avg=${avgUs}%8.1f us  [<1ms=${b.get(0)} 1-10=${b.get(1)} " +
        f"10-35=${b.get(2)} 35-45=${b.get(3)} >45=${b.get(4)}]"
    }
  }

  def main(args: Array[String]): Unit = {
    val rollouts = sys.env.getOrElse("GRAFT_WIRE_ROLLOUTS", "400").toInt
    val threads = sys.env.getOrElse("GRAFT_WIRE_THREADS", "32").toInt
    val rounds = sys.env.getOrElse("GRAFT_WIRE_ROUNDS", "3").toInt
    val page = "<html><head><title>doc 1 en</title></head><body>" +
      "<form action=\"mock://r\"><input name=\"q\"/></form></body></html>"
    val echo = "<html><body><p id=\"echo\">1:en</p></body></html>"
    def site(u: String): Option[String] =
      if (u.startsWith("mock://p")) Some(page)
      else if (u.startsWith("mock://r")) Some(echo)
      else None
    val stub = new W3CStubServer(site _).start()

    // one q150-shaped rollout: session create, visit, find+type, submit,
    // source, screenshot, delete — ~12 wire requests
    def rollout(hist: Hist): Unit = {
      def timed[T](f: => T): T = {
        val t0 = System.nanoTime(); val r = f; hist.add(System.nanoTime() - t0); r
      }
      val b = timed(new WebDriverHttpBrowser(stub.endpoint, "stub", true, Nil))
      try {
        timed(b.visit("mock://p"))
        timed(b.textInput("input[name=q]", "en"))
        timed(b.submit("form"))
        timed(b.pageSource)
        timed(b.screenshot)
      } finally timed(b.close())
    }

    def runMode(): (Double, Hist) = {
      val hist = new Hist
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val futs = (1 to rollouts).map { _ =>
        pool.submit(new Runnable { def run(): Unit = rollout(hist) })
      }
      futs.foreach(_.get())
      pool.shutdown()
      ((System.nanoTime() - t0) / 1e9, hist)
    }

    try {
      val mode = if (System.getenv("GRAFT_WIRE_DISCONNECT") == null) "reuse" else "churn"
      runMode() // warm-up
      (1 to rounds).foreach { r =>
        val (s, h) = runMode()
        println(f"wire[$mode] round $r: $rollouts rollouts x $threads threads: " +
          f"$s%7.3f s   $h")
      }
      println(s"server saw ${stub.requestCount.get()} requests total")
    } finally stub.stop()
  }
}
