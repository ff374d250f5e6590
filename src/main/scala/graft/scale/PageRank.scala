package graft.scale

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** General PageRank over an arbitrary edge list — the real operator behind
  * q62's closed-form gate (reference: the crawl-graph link-authority signal;
  * cf. tribbloid/spookystuff's explore lineage, which materializes exactly
  * the (parent uri, child uri) edges this consumes; Page et al. 1999).
  *
  * Semantics (the scaled convention, ranks sum to N):
  * `pr'(v) = (1 - d) + d * (Σ_{u→v} pr(u)/outdeg(u) + danglingMass / N)`
  * where `danglingMass = Σ pr(u)` over nodes with no out-edges — their rank
  * is redistributed uniformly instead of leaking (the standard fix; without
  * it total mass decays every iteration on any graph with sinks). Parallel
  * edges are kept as a multiset (a page linking twice contributes twice) —
  * the q62 convention.
  *
  * Scale shape: outdeg is joined onto the edge list ONCE before the loop
  * (edge-scale localCheckpoint, released on return); each iteration is one
  * shuffle-hash contribs join + groupBy(dst) + a left join back onto the
  * node set — ranks are node-cardinality so neither side ever broadcasts,
  * and every iterative join carries `hint("shuffle_hash")` because
  * checkpointed inputs have no stats (the q53/q62 discipline — the static
  * planner would silently fall back to sort-merge).
  *
  * Checkpointing: when the loop needs per-iteration scalars (dangling mass
  * or a convergence delta), ranks are eagerly materialized each iteration
  * through a typed-RDD localCheckpoint and the PREVIOUS iteration's blocks
  * are released immediately — O(1) executor storage across any number of
  * iterations (the ExploreExec epoch-hygiene discipline). When no scalars
  * are needed (no dangling nodes, tol = 0), iterations stay PURE LINEAGE
  * and only every `checkpointEvery`-th iteration truncates — so a short
  * fixed-iteration run like q62 remains fully declarative (Catalyst sees
  * the whole multi-iteration plan; PlanAuditSpec audits its joins).
  *
  * Driver-side state: one Double per iteration (dangling mass / delta) —
  * the bounded-aggregate pattern of PrefixSum/Bpe, never row data.
  *
  * @param nodes distinct node ids, column `id` (castable to long)
  * @param edges directed links, columns `src`, `dst`; dst ids outside
  *              `nodes` receive contributions but don't re-emit (they are
  *              dropped from the rank vector — nodes defines the universe)
  * @param tol   L1 convergence threshold on Σ|pr' - pr|; 0 = run exactly
  *              `maxIter` iterations
  */
object PageRank {

  /** @param ranks (id, pr) — materialized when the run checkpointed,
    *              otherwise pure lineage over the inputs
    * @param iterations iterations actually run
    * @param delta final Σ|pr' - pr| (NaN when tol = 0 — never computed)
    */
  final class Result private[PageRank] (
      val ranks: DataFrame, val iterations: Int, val delta: Double,
      handles: Seq[RDD[_]]) {
    /** Releases executor storage still held for `ranks` (the final
      * checkpoint blocks, if any). Call after consuming `ranks`; the
      * DataFrame must not be re-executed afterwards.
      */
    def release(): Unit = handles.foreach(_.unpersist(blocking = false))
  }

  def run(nodes: DataFrame, edges: DataFrame, damping: Double = 0.85,
          tol: Double = 0.0, maxIter: Int = 20,
          checkpointEvery: Int = 5): Result = {
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    require(maxIter >= 1, s"maxIter must be >= 1: $maxIter")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1: $checkpointEvery")
    val spark = nodes.sparkSession
    val ids = nodes.select(col("id").cast("long").as("id"))
    val n = ids.count()
    require(n > 0, "pagerank needs a non-empty node set")
    val base = 1.0 - damping

    val tupleEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)

    // out-degree rides the edge list once; the loop never recounts it.
    // Typed-RDD checkpoints (not DataFrame.localCheckpoint) so the blocks
    // can actually be RELEASED on return — Dataset.unpersist only knows
    // CacheManager entries, which localCheckpoint never registers.
    val deg = edges.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
    val edgeEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaDouble)
    val withDegRdd = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .join(deg.hint("shuffle_hash"), Seq("src"))
      .select(col("src"), col("dst"), col("outdeg"))
      .as[(Long, Long, Double)](edgeEnc).rdd
    withDegRdd.localCheckpoint() // edge-scale; released before return
    val withDeg = spark.createDataset(withDegRdd)(edgeEnc)
      .toDF("src", "dst", "outdeg")
    val danglingRdd = ids
      .join(withDeg.select(col("src").as("id")).distinct().hint("shuffle_hash"),
        Seq("id"), "left_anti")
      .as[Long](Encoders.scalaLong).rdd
    danglingRdd.localCheckpoint() // node-scale at worst
    val dangling = spark.createDataset(danglingRdd)(Encoders.scalaLong).toDF("id")
    val nDangling = dangling.count()
    // scalars force a materialized rank vector every iteration; without
    // them the loop stays declarative and only truncates on the cadence
    val needScalars = nDangling > 0 || tol > 0

    var ranks = ids.select(col("id"), lit(1.0).as("pr"))
    var prevCp: RDD[_] = null
    var iter = 0
    var delta = Double.NaN
    var converged = false
    var lastCheckpointed = false
    while (iter < maxIter && !converged) {
      iter += 1
      lastCheckpointed = false
      val dm =
        if (nDangling == 0) 0.0
        else ranks.join(dangling.hint("shuffle_hash"), Seq("id"))
          .agg(coalesce(sum(col("pr")), lit(0.0))).collect()(0).getDouble(0)
      val contribs = withDeg
        .join(ranks.hint("shuffle_hash"), withDeg("src") === ranks("id"))
        .select(col("dst").as("id"), (col("pr") / col("outdeg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("inflow"))
      val inflowTotal = coalesce(col("inflow"), lit(0.0)) +
        (if (nDangling == 0) lit(0.0) else lit(dm / n))
      var next = ids.join(contribs.hint("shuffle_hash"), Seq("id"), "left_outer")
        .select(col("id"), (lit(base) + lit(damping) * inflowTotal).as("pr"))
      if (needScalars || iter % checkpointEvery == 0) {
        // typed-RDD checkpoint: materializes + truncates lineage AND hands
        // us the RDD so the previous epoch's blocks release NOW
        val rdd = next.as[(Long, Double)](tupleEnc).rdd
        rdd.localCheckpoint()
        rdd.count()
        next = spark.createDataset(rdd)(tupleEnc).toDF("id", "pr")
        if (tol > 0) {
          delta = next.as("b")
            .join(ranks.as("a").hint("shuffle_hash"), col("a.id") === col("b.id"))
            .agg(coalesce(sum(abs(col("b.pr") - col("a.pr"))), lit(0.0)))
            .collect()(0).getDouble(0)
          converged = delta <= tol
        }
        if (prevCp != null) prevCp.unpersist(blocking = false)
        prevCp = rdd
        lastCheckpointed = true
      }
      ranks = next
    }
    // the edge index and dangling set die with the run — UNLESS the final
    // iterations are pure lineage (no trailing checkpoint), where the
    // returned frame still reads them; then they hand over to release()
    if (lastCheckpointed) {
      withDegRdd.unpersist(blocking = false)
      danglingRdd.unpersist(blocking = false)
      new Result(ranks, iter, delta, Seq(prevCp))
    } else new Result(ranks, iter, delta,
      Seq(withDegRdd, danglingRdd) ++ Option(prevCp).toSeq)
  }
}
