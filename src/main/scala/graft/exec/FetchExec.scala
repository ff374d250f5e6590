package graft.exec

import graft.actions.Trace
import graft.agent.{Agent, Env}
import graft.doc.Trajectory

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** One logical row after fetch: payload + its trace + the observations the
  * trace produced (reference row/AgentRow.scala:54-59 — data, locality group,
  * trajectory). `traceKey` is the canonical dryRun hash — the dedup/cache/
  * co-location key (reference LocalityGroup).
  */
final case class FetchedRow[D](
    data: D,
    traceKey: String,
    trace: Trace,
    trajectory: Trajectory
) extends Serializable

/** Shuffle strategy for fetch dedup (reference dsl/DataLocality.scala:19-110). */
sealed trait Locality extends Serializable
object Locality {

  /** No dedup at all: every row executes its own trace. */
  case object Passthrough extends Locality

  /** Partition-local dedup — no shuffle; duplicates across partitions fetch
    * again (reference Narrow: per-partition groupBy).
    */
  case object Narrow extends Locality

  /** Global dedup: shuffle on traceKey, exactly one execution per distinct
    * canonical trace (reference Wide: reduceByKey partitioner). The default.
    */
  case object Wide extends Locality
}

/** The engine's one genuinely novel physical operator: common-subexpression
  * elimination on SIDE EFFECTS (reference execution/FetchPlan.scala:25-60,
  * SURVEY §4 #2). Rows are keyed by the canonical hash of their trace and
  * grouped so each distinct trace executes ONCE; results fan back to every
  * origin row.
  *
  * Scale shape: the shuffle key is a 64-char hash string; the shuffled
  * payload is (trace, D) — no fetched content moves (fetching happens after
  * the shuffle, inside the group). Co-location is free: all rows wanting one
  * trace land in one task, which also maximizes doc-cache locality on
  * repeated runs (reference DocCacheAware).
  */
object FetchExec {

  /** `keyed`: one input row per (trace, payload) pair — upstream fan-out
    * (CanFetch) already applied.
    *
    * @param keyBy override of the dedup/co-location key (reference
    *              `LocalityGroup.sameBy`): rows whose `keyBy(trace)` agree
    *              execute the FIRST row's trace once and share its result.
    *              Defaults to the canonical cache key.
    */
  def fetch[D](keyed: Dataset[(Trace, D)], env: Env,
               locality: Locality = Locality.Wide,
               keyBy: Trace => String = _.cacheKey): Dataset[FetchedRow[D]] = {
    implicit val rowEnc: Encoder[FetchedRow[D]] = Encoders.kryo[FetchedRow[D]]
    implicit val keyedEnc: Encoder[(String, (Trace, D))] =
      Encoders.tuple(Encoders.STRING, Encoders.kryo[(Trace, D)])

    locality match {
      case Locality.Passthrough =>
        keyed.mapPartitions { it =>
          it.map { case (t, d) =>
            FetchedRow(d, keyBy(t), t, Trajectory(Agent.execute(t, env)))
          }
        }

      case Locality.Narrow =>
        keyed.mapPartitions { it =>
          // Bounded access-order LRU: Narrow is best-effort per-partition
          // dedup, and trajectories hold fetched content — a partition
          // streaming millions of DISTINCT traces must not accumulate them
          // all on the heap. Eviction never changes results; it only costs
          // a re-execution if an evicted key recurs after `cap` distinct
          // others (sorted/clustered inputs — the Narrow use case — never
          // hit that). EXCEPT for non-idempotent traces (Wpost / browser
          // state-changes): re-executing those repeats the remote side
          // effect, so their entries are PINNED in a separate map that the
          // LRU never evicts — exactly-once per partition is restored at
          // the price of holding those (typically rare) trajectories; use
          // Wide for unbounded POST streams (global dedup, one execution
          // per key, period).
          val cap = 4096
          val local = new java.util.LinkedHashMap[String, Trajectory](64, 0.75f, true) {
            override def removeEldestEntry(e: java.util.Map.Entry[String, Trajectory]): Boolean =
              size() > cap
          }
          val pinned = new java.util.HashMap[String, Trajectory]()
          it.map { case (t, d) =>
            val k = keyBy(t)
            var traj = pinned.get(k)
            if (traj == null) traj = local.get(k)
            if (traj == null) {
              traj = Trajectory(Agent.execute(t, env))
              if (t.nonIdempotent) pinned.put(k, traj) else local.put(k, traj)
            }
            FetchedRow(d, k, t, traj)
          }
        }

      case Locality.Wide =>
        keyed
          .map { case (t, d) => (keyBy(t), (t, d)) }
          .groupByKey(_._1)(Encoders.STRING)
          .flatMapGroups { (key: String, it: Iterator[(String, (Trace, D))]) =>
            // ONE execution per distinct key (the whole point), streaming
            // over the group — a group may hold millions of origin rows and
            // must not be buffered
            val first = it.next()
            val traj = Trajectory(Agent.execute(first._2._1, env))
            (Iterator(first) ++ it).map { case (_, (t, d)) => FetchedRow(d, key, t, traj) }
          }
    }
  }
}
