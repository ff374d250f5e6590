package graft.agent

import java.util.regex.Pattern

/** robots.txt (RFC 9309) parser + matcher — crawl compliance for the fetch
  * path. The reference engine fetches unconditionally (web/actions, no REP
  * support anywhere); a 100 TB crawl cannot. Pure functions here; the agent
  * wiring (per-host fetch + cache + consult) lives in [[Fetcher]], and the
  * column form ([[graft.functions.robots_allowed]]) reuses the same matcher
  * for bulk filtering of frontier tables against archived robots corpora.
  *
  * Semantics implemented (RFC 9309 + the documented Google extensions):
  * groups of consecutive `User-agent` lines share their rules; a group
  * token (lower-cased, any `/version` suffix stripped) matches when it
  * equals or prefixes one of the client's PRODUCT tokens (maximal runs of
  * `[a-z0-9_-]` in the agent string) — so `bot` never captures `graftbot`,
  * but `graft` does; the crawler obeys the MOST SPECIFIC matching token
  * (longest), with `*` as the fallback, and per RFC 9309 §2.2.1 ALL groups
  * naming that winning token merge into one rule set (a robots file that
  * repeats `User-agent: graftbot` twice applies both halves); the merged
  * crawl-delay is the most conservative (max) of those groups'. Within the
  * merged group the LONGEST matching pattern wins and an allow/disallow
  * tie at equal length resolves to allow; patterns support `*` wildcards
  * and the `$` end anchor; an empty `Disallow:` allows everything;
  * unmatched paths are allowed. Non-group fields (`Sitemap`, unknown) are
  * collected, `Crawl-delay` is parsed per-group (widely honored, feeds
  * [[HostPoliteness]]).
  */
object Robots {

  /** One path rule: raw pattern, allow/disallow, compiled matcher. */
  final case class Rule(pattern: String, allow: Boolean) {
    private[Robots] val regex: Pattern = compile(pattern)
    def matches(path: String): Boolean = regex.matcher(path).lookingAt()
  }

  /** One user-agent group (agent tokens lower-cased). */
  final case class Group(agents: Seq[String], rules: Seq[Rule], crawlDelay: Option[Double])

  final case class RobotsFile(groups: Seq[Group], sitemaps: Seq[String]) {

    /** The effective group this agent obeys: the winning token is the
      * longest group token equal to / prefixing one of the client's
      * product tokens (ties broken lexicographically for determinism),
      * `*` the fallback — and per RFC 9309 §2.2.1 EVERY group naming the
      * winning token merges (rules concatenated in file order, max
      * crawl-delay). None → no group matches, everything allowed.
      */
    def groupFor(userAgent: String): Option[Group] = {
      val prods = Robots.productTokens(userAgent)
      def norm(a: String) = a.takeWhile(_ != '/').trim
      val named = groups.flatMap(g => g.agents.map(norm).collect {
        case t if t.nonEmpty && t != "*" &&
          prods.exists(p => p.startsWith(t)) => t
      })
      val winner: Option[String] =
        if (named.nonEmpty) Some(named.maxBy(t => (t.length, t)))
        else if (groups.exists(_.agents.contains("*"))) Some("*")
        else None
      winner.map { w =>
        val matched = groups.filter(_.agents.map(norm).contains(w))
        if (matched.size == 1) matched.head
        else Group(Seq(w), matched.flatMap(_.rules),
          matched.flatMap(_.crawlDelay).reduceOption((a, b) => math.max(a, b)))
      }
    }

    /** RFC 9309 §2.2.2: longest pattern wins; equal-length tie → allow. */
    def allowed(userAgent: String, path: String): Boolean =
      groupFor(userAgent) match {
        case None => true
        case Some(g) =>
          val p = if (path.isEmpty) "/" else path
          val hits = g.rules.filter(_.matches(p))
          if (hits.isEmpty) true
          else {
            val maxLen = hits.map(_.pattern.length).max
            hits.exists(r => r.pattern.length == maxLen && r.allow)
          }
      }

    def crawlDelay(userAgent: String): Option[Double] =
      groupFor(userAgent).flatMap(_.crawlDelay)
  }

  val Empty: RobotsFile = RobotsFile(Nil, Nil)

  /** The client agent string's product tokens: maximal lower-cased runs of
    * `[a-z0-9_-]` — "Mozilla/5.0 (compatible; GraftBot/1.0)" yields
    * mozilla, 5, 0, compatible, graftbot, 1, 0. Group tokens match against
    * THESE (equality or prefix), never against raw substrings, so a group
    * named `bot` cannot capture `graftbot`.
    */
  private[agent] def productTokens(userAgent: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val s = userAgent.toLowerCase
    var i = 0
    val sb = new StringBuilder
    while (i <= s.length) {
      val c = if (i < s.length) s.charAt(i) else ' '
      if (c.isLetterOrDigit || c == '_' || c == '-') sb.append(c)
      else if (sb.nonEmpty) { out += sb.result(); sb.clear() }
      i += 1
    }
    out.result()
  }

  /** Parse leniently: unknown fields skipped, `#` comments stripped, BOM
    * tolerated, rules before any User-agent line ignored (RFC 9309 §2.2.1).
    */
  def parse(text: String): RobotsFile = {
    val groups = Vector.newBuilder[Group]
    val sitemaps = Vector.newBuilder[String]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var delay: Option[Double] = None
    var inRules = false // false while accumulating consecutive User-agent lines

    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None
    }

    text.linesIterator.foreach { raw =>
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }
        .stripPrefix("﻿").trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (inRules) { flush(); inRules = false }
            agents :+= value.toLowerCase
          case "allow" | "disallow" if agents.nonEmpty =>
            inRules = true
            // empty Disallow: = allow all — representable as no rule at all
            if (value.nonEmpty) rules :+= Rule(value, allow = field == "allow")
          case "crawl-delay" if agents.nonEmpty =>
            inRules = true
            delay = value.toDoubleOption.filter(d => d >= 0 && d.isFinite).orElse(delay)
          case "sitemap" if value.nonEmpty => sitemaps += value
          case _ => () // unknown field: skip (lenient)
        }
      }
    }
    flush()
    RobotsFile(groups.result(), sitemaps.result())
  }

  /** `*` → any run, `$` at end → anchor, everything else literal. Matching
    * is from the path START (lookingAt), per the RFC's prefix semantics.
    */
  private def compile(pattern: String): Pattern = {
    val (body, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true) else (pattern, false)
    val sb = new StringBuilder
    var lit = new StringBuilder
    def flushLit(): Unit = if (lit.nonEmpty) { sb.append(Pattern.quote(lit.result())); lit = new StringBuilder }
    body.foreach {
      case '*' => flushLit(); sb.append(".*")
      case c   => lit.append(c)
    }
    flushLit()
    if (anchored) sb.append("$")
    Pattern.compile(sb.result())
  }
}
