package graft.agent

import graft.doc.{Doc, DocError, DocUID, Observation}

/** Per-host robots.txt gate for the live fetch path (opt-in via
  * `GraftConf.respectRobots`). One robots fetch per site per executor JVM,
  * LRU-cached like [[HostPoliteness]]'s host clocks; `Crawl-delay` (when
  * the site declares one for our agent) widens the politeness interval.
  *
  * Availability semantics follow RFC 9309 §2.3.1: 4xx (including 404) means
  * unrestricted, 5xx/unreachable means assume full disallow. A robots fetch
  * is infrastructure, not page acquisition — it does not count toward
  * `pagesFetched` (fetch-dedup oracles stay exact) and it bypasses the
  * politeness limiter (it IS the first contact that configures it).
  */
object RobotsCache {

  private val cache: com.google.common.cache.Cache[String, Robots.RobotsFile] =
    com.google.common.cache.CacheBuilder.newBuilder().maximumSize(4096).build()

  val DenyAll: Robots.RobotsFile = Robots.RobotsFile(
    Seq(Robots.Group(Seq("*"), Seq(Robots.Rule("/", allow = false)), None)), Nil)

  /** `scheme://authority` key; None for non-http(s) uris (no robots there). */
  private[graft] def siteOf(uri: String): Option[String] =
    scala.util.Try {
      val u = new java.net.URI(uri)
      (Option(u.getScheme), Option(u.getAuthority)) match {
        case (Some(s), Some(a)) if s.equalsIgnoreCase("http") || s.equalsIgnoreCase("https") =>
          Some(s.toLowerCase + "://" + a.toLowerCase)
        case _ => None
      }
    }.toOption.flatten

  def forSite(site: String, timeoutMillis: Long, now: Long): Robots.RobotsFile =
    cache.get(site, () => fetchRules(site, timeoutMillis, now))

  private def fetchRules(site: String, timeoutMillis: Long, now: Long): Robots.RobotsFile =
    try Fetcher.httpGet(s"$site/robots.txt", timeoutMillis, DocUID(s"robots@$site"), now) match {
      case d: Doc if d.status >= 200 && d.status < 300 => Robots.parse(d.contentStr)
      case d: Doc if d.status >= 400 && d.status < 500 => Robots.Empty
      case _                                           => DenyAll
    } catch { case scala.util.control.NonFatal(_) => DenyAll }

  /** The gate: Some(blocked-error observation) when `uri` must not be
    * fetched for this conf; None = proceed. Also returns the effective
    * politeness interval (robots Crawl-delay can only widen the configured
    * one — a site asking for LESS politeness is not honored downward).
    */
  def check(uri: String, conf: graft.conf.GraftConf, uid: DocUID, now: Long):
      (Option[Observation], Long) =
    if (!conf.respectRobots) (None, conf.hostMinIntervalMillis)
    else siteOf(uri) match {
      case None => (None, conf.hostMinIntervalMillis)
      case Some(site) =>
        val rules = forSite(site, conf.robotsTimeoutMillis, now)
        val path = {
          val rest = uri.substring(uri.indexOf("://") + 3)
          val slash = rest.indexOf('/')
          if (slash < 0) "/" else rest.substring(slash)
        }
        val interval = rules.crawlDelay(conf.robotsUserAgent)
          .map(d => math.max((d * 1000).toLong, conf.hostMinIntervalMillis))
          .getOrElse(conf.hostMinIntervalMillis)
        if (rules.allowed(conf.robotsUserAgent, path)) (None, interval)
        else (Some(DocError(uid, uri, s"blocked by robots.txt ($site)", now)), interval)
    }

  /** Test seam: forget all cached robots files. */
  def clear(): Unit = cache.invalidateAll()
}
