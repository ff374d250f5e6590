package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * Hybrid execution: at or below [[Dedup.SmallGraphEdges]] canonical edges
  * the components come from a bounded driver union-find (identical min-id
  * labeling, no per-round driver latency); above it, the distributed star
  * loop below. Execution shape of the loop, tuned like the explore level
  * chain (iterative loops pay fixed driver cost per materialization, so
  * both the shuffle count per round and the planning overhead are
  * engineered down):
  *   - each star phase is ONE hash-shuffle: the per-node neighborhood
  *     minimum rides a window aggregate over the node key (no groupBy+join
  *     round trip), and the Tungsten shuffle moves two-long rows (~16 B per
  *     similarity pair at 100 TB — documents never enter the loop);
  *   - one `distinct` per round bounds the edge set, which only SHRINKS as
  *     stars collapse;
  *   - the loop runs on a CLONED session with AQE off (clone shares the
  *     SparkContext and cache; concurrent queries on the caller's session
  *     keep their AQE) — the loop's plans are tiny and fixed, so AQE's
  *     per-stage materialization barriers are pure driver latency here;
  *   - every round cuts lineage with a LAZY `localCheckpoint` materialized
  *     by the same action that computes the convergence signature
  *     (count + XOR of edge hashes: commutative, overflow-free under ANSI,
  *     no second scan, no driver-side data collect).
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

  /** Edge-count threshold below which the component computation runs as a
    * BOUNDED driver-side union-find instead of the iterative star loop. The
    * loop pays 2 shuffles + a signature job PER ROUND in pure driver
    * latency; at <= 100k canonical edges (1.6 MB of two-long rows — far
    * under any broadcast threshold) a local union-find is faster by 10-50x
    * and produces the identical min-id labeling. This is the standard
    * hybrid (verified-pair graphs are tiny relative to their corpus even at
    * 100 TB; when they are not, the distributed loop takes over
    * automatically). The spec suite pins BOTH paths and their equality.
    */
  val SmallGraphEdges: Long = 100000L

  /** [[connectedComponents]] plus the number of large-star/small-star rounds
    * actually run (spec hook: chains of length n must converge in O(log n);
    * 0 rounds = the small-graph union-find path).
    *
    * @param smallGraphThreshold canonical-edge count at or below which the
    *        driver union-find path runs (pass 0 to force the distributed
    *        star loop regardless of size)
    */
  def connectedComponentsWithStats(edges: DataFrame, src: String, dst: String,
                                   maxIter: Int = 30,
                                   smallGraphThreshold: Long = SmallGraphEdges): (DataFrame, Int) = {
    val caller = edges.sparkSession

    // canonical undirected edge list: u < v, nulls/self-loops dropped.
    // Deliberately NOT distinct'd: duplicate input edges are harmless (the
    // first round's own distinct collapses them; min aggregates are
    // idempotent), and skipping it saves a full-width shuffle + job per
    // call. Worst case, a duplicate-bearing input that is ALREADY a star
    // forest pays one extra detection round.
    val canonCaller = edges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))

    // one cheap count decides the path (the loop re-derives it in its first
    // fixpoint signature; the small path needs it as its collect bound)
    val nCanon = canonCaller.count()
    if (nCanon <= smallGraphThreshold) return (smallGraphComponents(canonCaller), 0)

    val spark = cloneSession(caller)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // rebound onto the loop session (one narrow pass; schema is two longs)
    val canon0 = spark.createDataFrame(canonCaller.rdd, canonCaller.schema)

    // (row count, order-independent xxhash64 XOR) — the fixpoint signature,
    // and the action that materializes each round's lazy checkpoint. XOR is
    // commutative (partition-order independent), cannot overflow under ANSI
    // mode, and the canonical edge set is distinct so no hash self-cancels.
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    val byNode = Window.partitionBy("u")

    // large-star: every node u attaches each STRICTLY LARGER neighbor to the
    // minimum of u's closed neighborhood. Output (m, v) is canonical (m < v)
    // by construction — no re-canonicalization needed. One shuffle: the
    // window over u (the union symmetrization is narrow).
    def largeStar(e: DataFrame): DataFrame =
      e.union(e.select(col("v"), col("u")))
        .withColumn("m", least(min(col("v")).over(byNode), col("u")))
        .where(col("v") > col("u"))
        .select(col("m").as("u"), col("v"))

    // small-star: every node attaches its SMALLER neighbors (and itself) to
    // the minimum of those. Rows are oriented (big, small), so no
    // symmetrization; the member and self edges ride one explode so the
    // window subtree evaluates once. One shuffle + the round's distinct.
    def smallStar(e: DataFrame): DataFrame =
      e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .withColumn("m", min(col("v")).over(byNode)) // m < u always
        .select(col("m").as("u"), explode(array(col("v"), col("u"))).as("v"))
        .where(col("u") =!= col("v"))
        .distinct()

    var cur = canon0.localCheckpoint(eager = false)
    var sig = signature(cur)
    // Size the loop's shuffle exactly ONCE from the initial edge count (the
    // signature already computed it — no extra job): AQE would do this per
    // stage, but its materialization barriers are driver latency the loop
    // pays every round; a fixed size is safe because the edge set only
    // shrinks. ~50k two-long rows per partition, capped at 4x parallelism.
    val loopParts = math.max(1L, math.min(sig._1 / 50000L + 1L,
      spark.sparkContext.defaultParallelism.toLong * 4L)).toInt
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      val next = smallStar(largeStar(cur)).localCheckpoint(eager = false)
      val nextSig = signature(next)
      rounds += 1
      converged = nextSig == sig
      sig = nextSig
      val prev = cur
      cur = next
      prev.unpersist(blocking = false) // checkpoint blocks ContextCleaner-freed
    }
    // A truncated loop is NOT a labeling: the star operators only guarantee
    // "every edge is (root, member)" at the fixpoint, so returning the
    // maxIter-th edge set as components would be silently wrong. Convergence
    // needs ~log2(diameter) rounds, so hitting the default 30 means the graph
    // is pathological (or maxIter was lowered) — fail loudly, don't guess.
    require(converged,
      s"connectedComponents did not reach a fixpoint within $maxIter rounds; " +
        "raise maxIter (rounds needed ~ log2 of the largest component diameter)")

    // Fixpoint = disjoint stars rooted at each component's minimum: every
    // canonical edge is (root, member). Roots map to themselves. Handed back
    // on the CALLER's session, MATERIALIZED OFF the loop's checkpoint blocks
    // (eager localCheckpoint of the small (id, comp) result) so the final
    // round's edge-set blocks can be released here instead of pinning
    // executor storage for the application lifetime.
    val comps = cur.select(col("v").as("id"), col("u").as("comp"))
      .union(cur.select(col("u").as("id"), col("u").as("comp")).distinct())
    val out = caller.createDataFrame(comps.rdd, comps.schema).localCheckpoint(true)
    cur.unpersist(blocking = false)
    (out, rounds)
  }

  /** Incremental dedup-group maintenance: fold a batch of NEW similarity
    * edges into an existing component assignment without re-running
    * connected components over the full similarity graph.
    *
    * At 100 TB the assignment table is billions of rows while an ingest
    * batch contributes a few thousand edges; recomputing CC per batch would
    * re-shuffle the whole graph. Instead the classic contraction argument
    * applies: components of (oldGraph ∪ newEdges) equal components of the
    * graph where every old component is collapsed to its root and each new
    * edge is mapped endpoint→current root. That contracted graph has at most
    * 2·|newEdges| nodes, so the CC loop runs at batch scale, and the big
    * table is touched exactly twice — once to look up the roots of batch
    * endpoints, once to apply the root relabeling — BOTH as broadcast hash
    * joins against batch-sized sides (the assignment table itself never
    * shuffles).
    *
    * Label semantics match [[connectedComponents]] exactly: `comp` is the
    * minimum member id. That survives contraction because each old root is
    * already the minimum of its members, so min(merged roots ∪ new nodes) =
    * min(all members) — DedupSpec pins incremental == full recompute on
    * randomized edge sequences.
    *
    * @param assignments DataFrame("id","comp") from a previous
    *                    [[connectedComponents]] / [[mergeComponents]] run
    *                    (must include root self-rows, as both produce)
    * @param newEdges    the batch's similarity pairs
    * @return DataFrame("id","comp") covering all previously assigned ids
    *         plus any new-edge endpoints (absence = singleton, as before)
    */
  def mergeComponents(assignments: DataFrame, newEdges: DataFrame,
                      src: String = "src", dst: String = "dst",
                      maxIter: Int = 30): DataFrame = {
    val asg = assignments
      .select(col("id").cast("long").as("id"), col("comp").cast("long").as("comp"))
    val e = newEdges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
    // both batch-sized; eagerly checkpointed so the downstream consumers
    // (contraction, CC, anti-join, relabel keys) never re-derive them — in
    // particular the root lookup below really is the ONE pre-relabel scan
    // of the big table, not one per consumer
    val nodes = e.select(col("u").as("id")).union(e.select(col("v").as("id")))
      .distinct().localCheckpoint()

    // roots of the batch endpoints that already have an assignment, pruned
    // by a broadcast of the endpoint set
    val touched = asg.join(broadcast(nodes), Seq("id")).select(col("id"), col("comp"))
      .localCheckpoint()

    // contract: endpoint -> its current root, itself when previously unseen.
    // A new node can never collide with an existing root (roots appear in
    // `assignments` as self-rows), so contracted self-loops mean exactly
    // "edge inside one existing component" and drop out in CC.
    val ru = touched.select(col("id").as("u"), col("comp").as("ru"))
    val rv = touched.select(col("id").as("v"), col("comp").as("rv"))
    val contracted = e
      .join(broadcast(ru), Seq("u"), "left")
      .join(broadcast(rv), Seq("v"), "left")
      .select(coalesce(col("ru"), col("u")).as("cu"),
              coalesce(col("rv"), col("v")).as("cv"))

    // batch-scale CC over the contracted graph: (old roots ∪ new nodes) ->
    // new minimum label
    val ccOut = connectedComponents(contracted, "cu", "cv", maxIter)

    // previously unseen endpoints get their first assignment (both sides of
    // this join are batch-sized)
    val newNodes = nodes.join(broadcast(touched.select("id")), Seq("id"), "left_anti")
    val newAsg = ccOut.join(broadcast(newNodes), Seq("id")).select("id", "comp")

    // relabel the big table: old root -> merged label, via one broadcast
    // join on `comp` (rows of untouched components pass through unchanged;
    // ccOut rows keyed by new-node ids can't match any existing comp value)
    val rootRelabel = ccOut.select(col("id").as("comp"), col("comp").as("newComp"))
    val relabeled = asg.join(broadcast(rootRelabel), Seq("comp"), "left")
      .select(col("id"), coalesce(col("newComp"), col("comp")).as("comp"))

    relabeled.union(newAsg)
  }

  /** Driver union-find over a bounded canonical edge list (the
    * [[SmallGraphEdges]] fast path): union-by-minimum with path compression,
    * so the root of every set IS the minimum member id — the exact labeling
    * the star loop converges to. The collect is bounded by the threshold
    * check in the caller (<= threshold two-long rows).
    */
  private def smallGraphComponents(canon: DataFrame): DataFrame = {
    val caller = canon.sparkSession
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    canon.collect().foreach { row =>
      val u = row.getLong(0)
      val v = row.getLong(1)
      parent.getOrElseUpdate(u, u)
      parent.getOrElseUpdate(v, v)
      val ru = find(u)
      val rv = find(v)
      if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
    }
    val out = parent.keys.toSeq.map(n => (n, find(n)))
    val c2 = caller
    import c2.implicits._
    out.toDF("id", "comp")
  }

  /** A session sharing this one's SparkContext/caches but with an isolated
    * SQLConf — `SparkSession.cloneSession()` is `private[sql]` but compiles
    * to a public method, so call it reflectively (what Structured Streaming
    * uses internally for the same isolation). Fallback: `newSession()`.
    */
  private def cloneSession(spark: SparkSession): SparkSession =
    try spark.getClass.getMethod("cloneSession").invoke(spark).asInstanceOf[SparkSession]
    catch {
      case scala.util.control.NonFatal(_) => spark.newSession()
    }
}

/** Mutable warm-start handle for streaming / batch-periodic dedup-group
  * maintenance: the first batch of similarity edges runs full
  * [[Dedup.connectedComponents]], every later batch folds in via
  * [[Dedup.mergeComponents]] — the standard architecture where near-dup
  * PAIR detection rides ingest (e.g. `cleanIngest` + a pair stage) and
  * group compaction is a per-batch contraction instead of a full-graph CC
  * recompute. Wire it under Structured Streaming as
  * `edges.writeStream.foreachBatch((b, _) => handle.update(b))`.
  *
  * Each update eagerly localCheckpoints the (id, comp) result so
  * micro-batch lineage never chains batch-over-batch; the previous
  * assignment's blocks drop to the ContextCleaner when the reference is
  * replaced. In production the assignment would round-trip a storage table
  * (parquet/Delta) between batches instead of executor blocks — the merge
  * plan is identical either way.
  */
final class IncrementalComponents {
  @volatile private var current: Option[DataFrame] = None

  /** The latest (id, comp) assignment, None before the first batch. */
  def assignment: Option[DataFrame] = current

  def update(newEdges: DataFrame, src: String = "src", dst: String = "dst"): DataFrame =
    synchronized {
      val next = current match {
        case None      => Dedup.connectedComponents(newEdges, src, dst) // already checkpointed
        case Some(asg) => Dedup.mergeComponents(asg, newEdges, src, dst).localCheckpoint(true)
      }
      current = Some(next)
      next
    }
}

object IncrementalComponents {

  /** Warm-start from a persisted (id, comp) assignment — the production
    * restart path: write `assignment` to a table between runs, `resume`
    * it on startup, and the next batch merges instead of recomputing. The
    * table must be a [[Dedup.connectedComponents]]/[[Dedup.mergeComponents]]
    * result (root self-rows included — both produce them).
    */
  def resume(assignment: DataFrame): IncrementalComponents = {
    val h = new IncrementalComponents
    h.current = Some(assignment
      .select(col("id").cast("long").as("id"), col("comp").cast("long").as("comp")))
    h
  }
}
