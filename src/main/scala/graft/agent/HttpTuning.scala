package graft.agent

/** JVM-wide HTTP knobs that must be set BEFORE the JDK classes that read
  * them class-load — gathered in one idempotent call so every entry point
  * (Fetcher wgets, the WebDriver wire client, every in-JVM stub server)
  * applies them regardless of which runs first in the JVM:
  *
  *  - `http.maxConnections`: the JDK keep-alive pool is 5 PER DESTINATION
  *    by default; with 32 task threads hammering one host, 27 of them pay
  *    a fresh TCP handshake per request. Read once when `KeepAliveCache`
  *    class-loads (first kept-alive response). An explicit
  *    -Dhttp.maxConnections wins.
  *  - `sun.net.httpserver.nodelay`: TCP_NODELAY on the stub servers'
  *    accepted sockets — without it the single-byte status/body writes can
  *    stall ~40 ms behind the client's delayed ACK on kernels that don't
  *    fast-ACK loopback. Read once when the server's `ServerConfig`
  *    class-loads (first HttpServer.create in the JVM).
  */
object HttpTuning {
  def apply(): Unit = {
    if (System.getProperty("http.maxConnections") == null) {
      System.setProperty("http.maxConnections", "64")
    }
    // same override semantics as http.maxConnections above (r21, ADVICE):
    // an explicit -Dsun.net.httpserver.nodelay=false wins instead of being
    // silently clobbered
    if (System.getProperty("sun.net.httpserver.nodelay") == null) {
      System.setProperty("sun.net.httpserver.nodelay", "true")
    }
  }
  // applying at object init too means ANY reference to HttpTuning tunes
  apply()
}
