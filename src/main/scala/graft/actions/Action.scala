package graft.actions

import graft.doc.Observation

/** The Action ADT — one step an agent performs (reference:
  * module/core/.../actions/Action.scala:21-174, Interaction.scala:9,
  * Export.scala:14). Pure serializable data; all side effects live in the
  * executor-side interpreter ([[graft.agent.Agent]]).
  *
  * Category traits mirror the reference taxonomy:
  *   - [[Interaction]] — changes agent state, produces no output.
  *   - [[Export]]      — produces [[graft.doc.Observation]]s.
  *   - [[Driverless]]  — needs no browser session.
  *   - [[StateChange]] — interactions that affect subsequent exports; only
  *     these survive into the canonical backtrace / cache key
  *     (reference Trace.scala:275-305 `stateChangeOnly`).
  *
  * `skeleton` is the action's canonical form for cache keys: non-semantic
  * knobs (timeouts, retry counts, delays, aliases) are normalized out, so two
  * traces that fetch the same thing share one key (reference
  * Trace.scala:150-153 — "not encoded in [cache key]: name, timeout").
  */
sealed trait Action extends Serializable with Product {

  /** Canonical form used for cache keys / fetch dedup. */
  def skeleton: Action = this

  /** Optional alias for looking up this action's observations by name. */
  def alias: Option[String] = None
}

/** State-changing step (browser navigation/input); no output. */
sealed trait Interaction extends Action

/** Marker: this interaction changes what subsequent exports observe. */
sealed trait StateChange extends Interaction

/** Produces observations. */
sealed trait Export extends Action

/** Runs without a browser session. */
sealed trait Driverless extends Action

/** Bounded per-action timeout (reference MayTimeout.scala:6-31). */
sealed trait MayTimeout extends Action {
  def timeoutMillis: Long
}

// ---------------------------------------------------------------------------
// Driverless exports (HTTP / file / DFS scans)
// ---------------------------------------------------------------------------

/** HTTP(S)/file/DFS GET (reference actions/Wget.scala:20-78). `file:` and
  * bare paths read bytes (directories yield a JSON listing doc, the explore
  * fixture of ExplorePlanSpec); `http(s):` uses a plain JDK client.
  *
  * `wayback` pins this action's cache reads to entries at-or-before the
  * given epoch millis (reference actions/Wayback.scala:7-33 — per-action
  * time travel, overriding the conf-level pin). Not part of the cache key:
  * it selects WHICH cached version to read, not what the action is.
  */
final case class Wget(
    uri: String,
    override val timeoutMillis: Long = 30000L,
    as: Option[String] = None,
    wayback: Option[Long] = None
) extends Export with Driverless with MayTimeout {
  override def skeleton: Action = copy(timeoutMillis = 0L, as = None, wayback = None)
  override def alias: Option[String] = as
}

/** HTTP POST (reference actions/Wpost.scala:16-103). */
final case class Wpost(
    uri: String,
    entity: String = "",
    contentType: String = "application/x-www-form-urlencoded",
    override val timeoutMillis: Long = 30000L,
    as: Option[String] = None
) extends Export with Driverless with MayTimeout {
  override def skeleton: Action = copy(timeoutMillis = 0L, as = None)
  override def alias: Option[String] = as
}

/** OAuth1-signed Wget (reference actions/OAuthV2.scala:7): decorates the
  * request with an Authorization header computed by the interpreter.
  */
final case class OAuthV2(
    delegate: Wget,
    consumerKey: String,
    consumerSecret: String,
    token: String,
    tokenSecret: String
) extends Export with Driverless {
  override def skeleton: Action = copy(delegate = delegate.skeleton.asInstanceOf[Wget])
  override def alias: Option[String] = delegate.alias
}

/** Canned observations — the offline test seam (reference actions/Mock.scala:7-15). */
final case class Mock(obs: Seq[Observation], as: Option[String] = None)
    extends Export with Driverless {
  override def skeleton: Action = copy(as = None)
  override def alias: Option[String] = as
}

/** No-op placeholder trace head (reference BuildRow NoOp rows). */
case object NoOp extends Action with Driverless

// ---------------------------------------------------------------------------
// Politeness / control flow (not part of the cache key)
// ---------------------------------------------------------------------------

/** Fixed sleep (reference actions/Delay.scala:16-30). Not a state change —
  * normalized out of cache keys.
  */
final case class Delay(millis: Long) extends Interaction {
  override def skeleton: Action = Delay(0L)
}

/** Uniform random sleep in [minMillis, maxMillis] (reference Delay.scala:32-46). */
final case class RandomDelay(minMillis: Long, maxMillis: Long) extends Interaction {
  override def skeleton: Action = Delay(0L)
}

/** Repeat `body` until failure or `limit` iterations; observations are
  * concatenated and re-indexed (reference ControlBlock.scala:133-163).
  */
final case class Loop(body: Trace, limit: Int = 100) extends Export {
  override def skeleton: Action = Loop(body.skeleton, limit)
}

/** Retry `body` locally on failure (reference ControlBlock.scala:74-120);
  * retry count is an execution knob, not identity.
  */
final case class LocalRetry(body: Trace, retries: Int = 3) extends Export {
  override def skeleton: Action = LocalRetry(body.skeleton, 0)
}

// ---------------------------------------------------------------------------
// Browser actions (interpreted against a pluggable BrowserDriver;
// reference module/web/.../actions/Foundation.scala:25-301)
// ---------------------------------------------------------------------------

final case class Visit(uri: String, override val timeoutMillis: Long = 30000L)
    extends StateChange with MayTimeout {
  override def skeleton: Action = copy(timeoutMillis = 0L)
}

final case class Click(selector: String) extends StateChange

/** Click-next pagination: click first match not in `exclude`. */
final case class ClickNext(selector: String, exclude: Seq[String] = Nil) extends StateChange

final case class TextInput(selector: String, text: String) extends StateChange

final case class Submit(selector: String) extends StateChange

final case class DropDownSelect(selector: String, value: String) extends StateChange

final case class ToFrame(selector: String) extends StateChange

final case class ExeScript(script: String) extends StateChange

final case class DragSlider(selector: String, percentage: Double) extends StateChange

/** Wait until selector present; pure wait — not a state change. */
final case class WaitFor(selector: String, override val timeoutMillis: Long = 30000L)
    extends Interaction with MayTimeout {
  override def skeleton: Action = NoOp
}

/** Export the current DOM as a UTF-8 HTML doc (reference Snapshot.scala:13-32). */
final case class Snapshot(as: Option[String] = None) extends Export {
  override def skeleton: Action = Snapshot(None)
  override def alias: Option[String] = as
}

/** Export a PNG screenshot (reference Screenshot.scala:11-30). */
final case class Screenshot(as: Option[String] = None) extends Export {
  override def skeleton: Action = Screenshot(None)
  override def alias: Option[String] = as
}
