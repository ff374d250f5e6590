package graft.exec

import graft.actions.Trace
import graft.agent.Env
import graft.conf.GraftConf

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** One visited row of a recursive traversal: the fetched row plus its BFS
  * depth (reference row/Data.scala:56-75 `Exploring[D]`).
  */
final case class ExploredRow[D](row: FetchedRow[D], depth: Int) extends Serializable

/** Depth-bounded recursion parameters (reference
  * `recursively(range, pathPlanning, epochInterval, checkpointInterval)`).
  * Depth semantics `[minDepth, maxDepth)`: traversal expands while
  * `depth < maxDepth`; output keeps `minDepth <= depth < maxDepth`
  * (reference ExploreRunner.scala:72-129, ExplorePlan.scala:170-185).
  */
final case class ExploreParams(
    minDepth: Int = 0,
    maxDepth: Int = Int.MaxValue
)

/** The flagship operator: bounded breadth-first traversal of the implicit
  * crawl graph (vertices = canonical traces, edges = "fetching A yields
  * trace B") — reference execution/ExplorePlan.scala:53-228 +
  * ExploreRunner.scala:20-319, re-expressed as the driver-side iterative
  * Dataset loop the reference's own comments wish for ("too complex, rewrite
  * as loop of FetchPlan" — ExplorePlan.scala:52).
  *
  * Differences we embrace (SURVEY §7.5): the visited set is EXACT and
  * distributed — frontier dedup is a `left_anti` join on traceKey against all
  * visited keys — instead of the reference's best-effort per-JVM
  * ExploreLocalCache. Because expansion is strictly level-by-level, the first
  * visit of a key is automatically its minimum depth (the reference needs a
  * per-lineage min-depth reducer for this — PathPlanning_Simple.scala:24-49).
  *
  * EXPLORE IS KEYED BY TRACE: one output row per visited canonical trace,
  * exactly like the reference's BreadthFirst reducer, which selects a SINGLE
  * winning lineage per key (`candidates.minBy(min depth, min ordinal)` —
  * PathPlanning_Simple.scala:36-46). Rows that reach the same trace with
  * different payloads collapse to one; the winner here is deterministic for
  * naturally-ordered payload types (minimum — mirroring the reference's
  * minBy), first-seen otherwise. Payloads should therefore be derivable from
  * the trace; if you need results fanned back to EVERY origin row, use
  * `fetch()`, which preserves all rows.
  *
  * Iterative-Spark discipline (the part that decides whether this survives
  * deep crawls): every epoch's `open` frontier and `visitedKeys` set are
  * EAGERLY checkpointed, so the logical plan seen by Catalyst is always one
  * epoch deep — without this, analysis/AQE cost grows exponentially with
  * depth (the reference cuts lineage the same way via its persist/checkpoint
  * cycle, TemporaryRefs.scala). Visited rows are kept as one checkpointed
  * dataset PER epoch and unioned once at the end (a flat k-leaf union, not a
  * k-deep chain). Per epoch the fetch shuffles only (key, trace, payloads);
  * the visited-keys anti-join side is a single string column. With
  * `GraftConf.checkpointDir` set, every k-th epoch cut is a RELIABLE
  * checkpoint (survives executor loss — the multi-hour-crawl mode);
  * localCheckpoint (fast, block-level) is used in between and by default.
  */
object ExploreExec {

  def explore[D](
      spark: SparkSession,
      seeds: Dataset[(Trace, D)],
      next: FetchedRow[D] => Seq[(Trace, D)],
      env: Env,
      params: ExploreParams = ExploreParams()
  ): Dataset[ExploredRow[D]] = {

    implicit val exploredEnc: Encoder[ExploredRow[D]] = Encoders.kryo[ExploredRow[D]]

    val conf: GraftConf = env.conf
    val maxDepth = math.min(params.maxDepth, conf.maxExploreDepth)

    if (maxDepth <= 0) return spark.emptyDataset[ExploredRow[D]]

    // AQE is a pessimization for the loop's internal queries: per-epoch
    // plans are small and exactly sized (the driver KNOWS the frontier
    // count), while AQE's query-stage materialization barriers add ~1s of
    // driver-side re-planning per job — measured 10x wall-clock on a
    // 63-page crawl. Disable it on a CLONED session so concurrent queries on
    // the caller's session keep their AQE (clone shares the SparkContext and
    // cached blocks but has its own SQLConf); epoch sizing (`sized`) replaces
    // AQE's partition coalescing here.
    val loopSession = cloneSession(spark)
    loopSession.conf.set("spark.sql.adaptive.enabled", "false")
    implicit val seedEnc: Encoder[(Trace, D)] = Encoders.kryo[(Trace, D)]
    val seedsRebound = loopSession.createDataset(seeds.rdd)

    val result = exploreLoop(loopSession, seedsRebound, next, env, maxDepth, params)

    // hand the result back on the CALLER's session; it is already
    // materialized (checkpointed), so this wrap is a zero-cost lineage leaf
    spark.createDataset(result.rdd)
  }

  /** A session sharing this one's SparkContext/caches but with an isolated
    * SQLConf. `SparkSession.cloneSession()` is exactly that but `private
    * [sql]` — which compiles to a public method, so call it reflectively
    * (cheap: one method call; it is what Structured Streaming uses
    * internally for the same isolation). Fallback: `newSession()` (default
    * conf from the launch-time SparkConf — fine for the loop, which sizes
    * its own partitions) plus the session timezone, the one semantic conf
    * the loop's queries read.
    */
  private def cloneSession(spark: SparkSession): SparkSession =
    try spark.getClass.getMethod("cloneSession").invoke(spark).asInstanceOf[SparkSession]
    catch {
      case scala.util.control.NonFatal(_) =>
        val s = spark.newSession()
        scala.util.Try(s.conf.set("spark.sql.session.timeZone",
          spark.conf.get("spark.sql.session.timeZone")))
        s
    }

  // (loop body split out so the cloned-session AQE guard wraps it cleanly)
  private def exploreLoop[D](
      spark: SparkSession,
      seeds: Dataset[(Trace, D)],
      next: FetchedRow[D] => Seq[(Trace, D)],
      env: Env,
      maxDepth: Int,
      params: ExploreParams
  ): Dataset[ExploredRow[D]] = {

    implicit val exploredEnc: Encoder[ExploredRow[D]] = Encoders.kryo[ExploredRow[D]]
    implicit val openEnc: Encoder[(String, (Trace, D, Int))] =
      Encoders.tuple(Encoders.STRING, Encoders.kryo[(Trace, D, Int)])
    implicit val strEnc: Encoder[String] = Encoders.STRING

    val conf = env.conf
    val down = conf.downSampling

    val debug = sys.env.get("GRAFT_EXPLORE_DEBUG").contains("true")
    var tEpoch = System.nanoTime()
    def mark(l: String): Unit = if (debug) {
      val t = System.nanoTime()
      System.err.println(f"[explore] $l ${(t - tEpoch) / 1e9}%.2f s")
      tEpoch = t
    }

    var epoch = 0
    conf.checkpointDir.foreach(spark.sparkContext.setCheckpointDir)

    // Truncate lineage + materialize — EVERY epoch. Default: localCheckpoint
    // (caches at the RDD/block level; Dataset.persist() would register every
    // epoch in the SQL CacheManager, whose per-query cache-lookup does plan
    // canonicalization against ALL registered entries — measured as a
    // LINEARLY GROWING per-job cost, 2x slowdown by epoch 12 on a 4k-page
    // crawl). With GraftConf.checkpointDir set, every k-th epoch writes a
    // RELIABLE checkpoint instead — executor loss then replays at most k-1
    // epochs instead of killing a multi-hour crawl.
    def cut[T](ds: Dataset[T]): Dataset[T] =
      if (conf.checkpointDir.isDefined &&
          epoch % math.max(1, conf.checkpointEveryEpochs) == 0)
        ds.checkpoint(eager = true)
      else ds.localCheckpoint(true)

    // Materialize the frontier AND count it in the same Spark job: the count
    // rides the cut's materialization via an accumulator (one fewer job per
    // epoch than a separate .count()). Task retries could overcount, but the
    // value only gates loop exit (>0) and partition sizing — both tolerant.
    def cutCounting(ds: Dataset[(String, (Trace, D, Int))])
        : (Dataset[(String, (Trace, D, Int))], Long) = {
      val acc = spark.sparkContext.longAccumulator("graft.explore.open")
      val counted = ds.map { x => acc.add(1); x }
      val cutDs = cut(counted)
      (cutDs, acc.value)
    }

    def sized(ds: Dataset[(String, (Trace, D, Int))],
              n: Long): Dataset[(String, (Trace, D, Int))] = {
      val parallelism = spark.sparkContext.defaultParallelism
      val parts = math.max(1L, math.min(parallelism.toLong, n / 8 + 1)).toInt
      if (parts < parallelism) ds.coalesce(parts) else ds
    }

    val visitedParts = scala.collection.mutable.Buffer.empty[Dataset[ExploredRow[D]]]
    val visitedKeyParts = scala.collection.mutable.Buffer.empty[org.apache.spark.sql.DataFrame]

    var (open, openCount) =
      cutCounting(dedupOpen(seeds.map { case (t, d) => (t.cacheKey, (t, d, 0)) }))
    mark(s"seed-cut (open=$openCount)")

    while (openCount > 0) {
      // 1. fetch the frontier — FetchExec dedup: one execution per key;
      //    eagerly checkpointed so the side effects run exactly once, here.
      val fetched: Dataset[ExploredRow[D]] = cut(FetchExec
        .fetch(sized(open, openCount)
          .map { case (_, (t, d, depth)) => (t, (d, depth)) }(
            Encoders.tuple(Encoders.kryo[Trace], Encoders.kryo[(D, Int)])), env)
        .map { r =>
          ExploredRow(FetchedRow(r.data._1, r.traceKey, r.trace, r.trajectory), r.data._2)
        })
      visitedParts += fetched
      mark("fetch-cut")

      // 2. visited keys: tiny keys-only datasets, one per epoch, FLAT-unioned.
      //    Epoch frontiers were anti-joined against all earlier keys, so the
      //    parts are disjoint across epochs (duplicates within an epoch — one
      //    per payload — are harmless on the anti-join's build side). Cached
      //    at the RDD level (block cache only — NOT Dataset.persist, see
      //    `cut`), lazily: the first materialization rides this epoch's
      //    action, later epochs scan the cached 64-char strings, never the
      //    doc payloads. Parts are disjoint — no distinct.
      val keysRdd = fetched.rdd.map(_.row.traceKey)
      keysRdd.cache()
      val keys = spark.createDataset(keysRdd)(Encoders.STRING).toDF("vk")
      visitedKeyParts += keys
      val vk = visitedKeyParts.reduce(_ union _)

      // 3. expand children (depth+1), drop out-of-range and already-visited
      val children = fetched.flatMap { r =>
        if (r.depth + 1 >= maxDepth) Nil
        else down(next(r.row)).map { case (t, d) => (t.cacheKey, (t, d, r.depth + 1)) }
      }
      val fresh = dedupOpen(children).toDF()
        .join(vk, org.apache.spark.sql.functions.col("_1") ===
          org.apache.spark.sql.functions.col("vk"), "left_anti")
        .as[(String, (Trace, D, Int))]

      epoch += 1
      val (o, c) = cutCounting(fresh)
      open = o
      openCount = c
      mark(s"fresh-cut (open=$openCount)")
    }

    // materialize the flat union once, inside the loop's AQE-off session, so
    // downstream queries see a single checkpointed leaf
    val all = visitedParts.reduceOption(_ union _)
      .getOrElse(spark.emptyDataset[ExploredRow[D]])
    all.filter(_.depth >= params.minDepth).localCheckpoint(true)
  }

  /** Per-epoch frontier dedup: one row per key (same epoch => equal depth),
    * matching the reference's single-winning-lineage reduce
    * (PathPlanning_Simple.scala:36-46 `candidates.minBy`). The surviving
    * payload is DETERMINISTIC for naturally-ordered payload types (the
    * minimum — the analog of the reference's minBy ordinal); first-seen for
    * types with no natural order (documented in the operator scaladoc:
    * explore is keyed by trace, payloads should be derivable from it).
    */
  private def dedupOpen[D](ds: Dataset[(String, (Trace, D, Int))])(
      implicit enc: Encoder[(String, (Trace, D, Int))]): Dataset[(String, (Trace, D, Int))] =
    ds.groupByKey(_._1)(Encoders.STRING)
      .reduceGroups { (a: (String, (Trace, D, Int)), b: (String, (Trace, D, Int))) =>
        (a._2._2, b._2._2) match {
          case (x: Comparable[_], y) if x.getClass == y.getClass &&
              x.asInstanceOf[Comparable[Any]].compareTo(y) > 0 => b
          case _ => a
        }
      }
      .map(_._2)
}
