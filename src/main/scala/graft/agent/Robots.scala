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
  * groups of consecutive `User-agent` lines share their rules; a crawler
  * obeys the MOST SPECIFIC matching group only (longest agent token that
  * occurs in the client's agent string, case-insensitive; `*` is the
  * fallback — groups never merge); within the group the LONGEST matching
  * pattern wins and an allow/disallow tie at equal length resolves to
  * allow; patterns support `*` wildcards and the `$` end anchor; an empty
  * `Disallow:` allows everything; unmatched paths are allowed. Non-group
  * fields (`Sitemap`, unknown) are collected, `Crawl-delay` is parsed
  * per-group (widely honored, feeds [[HostPoliteness]]).
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

    /** The single group this agent obeys: longest matching token, `*`
      * fallback, none → None (everything allowed).
      */
    def groupFor(userAgent: String): Option[Group] = {
      val ua = userAgent.toLowerCase
      val scored = groups.flatMap { g =>
        val best = g.agents.collect {
          case a if a == "*"        => -1
          case a if ua.contains(a)  => a.length
        }
        if (best.isEmpty) None else Some(best.max -> g)
      }
      if (scored.isEmpty) None else Some(scored.maxBy(_._1)._2)
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
