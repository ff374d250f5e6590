package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components for near-duplicate clustering.
  *
  * Near-dup detection (MinHash/LSH q26, SimHash q27, embedding cosine q36)
  * yields PAIRS; turning pairs into dedup decisions needs the transitive
  * closure — if A~B and B~C then {A,B,C} is ONE duplicate group with one
  * keeper — i.e. connected components over the similarity graph.
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce and
  * Beyond", ACM SoCC'14). Unlike naive min-label propagation (whose round
  * count is the graph DIAMETER — unbounded on chain-shaped near-dup
  * clusters, e.g. drifting boilerplate where doc i matches only doc i±1),
  * the star operators converge in O(log² n) rounds regardless of shape.
  *
  * 100 TB design: each round is two aggregate-shuffles keyed by node id over
  * the edge list; rows are two longs (~16 B each) — the documents themselves
  * never enter the loop. The edge set only shrinks (both operators map every
  * edge to one edge or drop it as a self-loop), every round cuts lineage via
  * `localCheckpoint` so the plan stays O(1) across iterations (same
  * discipline as [[graft.exec.ExploreExec]]'s level chain), and convergence
  * is detected from a count+hash signature computed in the SAME pass that
  * materializes the checkpoint — no extra scan, no driver-side data collect.
  *
  * Reference analog: none — the reference has no graph operator family. This
  * closes the pairs→groups gap of the training-data-pipeline extensions
  * (brief: "Deduplication … each as a `queries()` entry").
  */
object Dedup {

  /** Connected components of the undirected graph given by an edge list.
    *
    * @param edges DataFrame holding one edge per row; self-loops, duplicate
    *              and reversed duplicates are tolerated (canonicalized away)
    * @param src   source-node column (any integral type; cast to long)
    * @param dst   destination-node column
    * @param maxIter hard bound on star rounds; O(log² n) suffices, so the
    *                default 30 covers any physically storable graph
    * @return DataFrame("id","comp"): one row per node incident to >=1 edge;
    *         `comp` is the MINIMUM node id of the component (deterministic).
    *         Isolated nodes never appear in `edges`, hence not in the output
    *         — callers treat absence as "own singleton component".
    */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          maxIter: Int = 30): DataFrame =
    connectedComponentsWithStats(edges, src, dst, maxIter)._1

  /** [[connectedComponents]] plus the number of large-star/small-star rounds
    * actually run (spec hook: chains of length n must converge in O(log n)).
    */
  def connectedComponentsWithStats(edges: DataFrame, src: String, dst: String,
                                   maxIter: Int = 30): (DataFrame, Int) = {
    // canonical undirected edge list: u < v, nulls/self-loops dropped
    val canon0 = edges
      .select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()

    // (row count, order-independent xxhash64 XOR) — a fixpoint signature.
    // Computed on the freshly checkpointed frame, so it doubles as the
    // materializing action; XOR is commutative (partition-order independent)
    // and cannot overflow under ANSI mode, and the canonical edge set is
    // distinct so no hash self-cancels.
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.select(xxhash64(col("u"), col("v")).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    def canonicalize(e: DataFrame): DataFrame =
      e.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()

    // large-star: every node u attaches each STRICTLY LARGER neighbor to the
    // minimum of u's closed neighborhood. One shuffle (groupBy u over both
    // orientations), join back to the oriented edges.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u")
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      canonicalize(
        sym.join(mins, "u")
          .filter(col("v") > col("u"))
          .select(col("v").as("a"), col("m").as("b")))
    }

    // small-star: every node attaches its SMALLER neighbors (and itself) to
    // the minimum of those. On the canonical (u<v) frame the "big" endpoint
    // is v, so no symmetrization is needed — one shuffle.
    def smallStar(e: DataFrame): DataFrame = {
      val t = e.select(col("v").as("u"), col("u").as("v")) // u = big endpoint
      val mins = t.groupBy("u").agg(min(col("v")).as("m")) // m < u always
      canonicalize(
        t.join(mins, "u")
          .select(col("v").as("a"), col("m").as("b"))
          .union(mins.select(col("u").as("a"), col("m").as("b"))))
    }

    // lazy checkpoints: the signature aggregate is the materializing action,
    // so each round costs ONE Spark job (checkpoint-fill + convergence check
    // together), not two — the same fixed-driver-latency discipline as the
    // explore level chain.
    var cur = canon0.localCheckpoint(eager = false)
    var sig = signature(cur)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      val next = smallStar(largeStar(cur)).localCheckpoint(eager = false)
      val nextSig = signature(next)
      rounds += 1
      converged = nextSig == sig
      sig = nextSig
      cur = next // old checkpoint blocks are ContextCleaner-freed
    }

    // Fixpoint = disjoint stars rooted at each component's minimum: every
    // canonical edge is (root, member). Roots map to themselves.
    val comps = cur.select(col("v").as("id"), col("u").as("comp"))
      .union(cur.select(col("u").as("id"), col("u").as("comp")).distinct())
    (comps, rounds)
  }
}
