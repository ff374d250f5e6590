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
  * Iterative-Spark discipline (the part that decides whether this survives
  * deep crawls): every epoch's `open` frontier and `visitedKeys` set are
  * EAGERLY checkpointed, so the logical plan seen by Catalyst is always one
  * epoch deep — without this, analysis/AQE cost grows exponentially with
  * depth (the reference cuts lineage the same way via its persist/checkpoint
  * cycle, TemporaryRefs.scala). Visited rows are kept as one checkpointed
  * dataset PER epoch and unioned once at the end (a flat k-leaf union, not a
  * k-deep chain). Per epoch the fetch shuffles only (key, trace, payload);
  * the visited-keys anti-join side is a single string column.
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
    val down = conf.downSampling

    val debug = sys.env.get("GRAFT_EXPLORE_DEBUG").contains("true")
    var tEpoch = System.nanoTime()
    def mark(l: String): Unit = if (debug) {
      val t = System.nanoTime()
      System.err.println(f"[explore] $l ${(t - tEpoch) / 1e9}%.2f s")
      tEpoch = t
    }

    if (maxDepth <= 0) return spark.emptyDataset[ExploredRow[D]]

    // AQE is a pessimization for the loop's internal queries: per-epoch
    // plans are small and exactly sized (the driver KNOWS the frontier
    // count), while AQE's query-stage materialization barriers add ~1s of
    // driver-side re-planning per job — measured 10x wall-clock on a
    // 63-page crawl. Disable within the loop, restore after; epoch sizing
    // (`sized`) replaces AQE's partition coalescing here.
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try exploreLoop(spark, seeds, next, env, maxDepth, params, down, mark _)
    finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  // (loop body split out so the AQE guard wraps it cleanly)
  private def exploreLoop[D](
      spark: SparkSession,
      seeds: Dataset[(Trace, D)],
      next: FetchedRow[D] => Seq[(Trace, D)],
      env: Env,
      maxDepth: Int,
      params: ExploreParams,
      down: graft.conf.DownSampling,
      mark: String => Unit
  ): Dataset[ExploredRow[D]] = {

    implicit val exploredEnc: Encoder[ExploredRow[D]] = Encoders.kryo[ExploredRow[D]]
    implicit val openEnc: Encoder[(String, (Trace, D, Int))] =
      Encoders.tuple(Encoders.STRING, Encoders.kryo[(Trace, D, Int)])
    implicit val strEnc: Encoder[String] = Encoders.STRING

    var epoch = 0

    // Truncate lineage + materialize — EVERY epoch, via localCheckpoint: it
    // caches at the RDD/block level. Dataset.persist() would register every
    // epoch in the SQL CacheManager, whose per-query cache-lookup does plan
    // canonicalization against ALL registered entries — measured as a
    // LINEARLY GROWING per-job cost (2x slowdown by epoch 12 on a 4k-page
    // crawl). A reliable-checkpoint cadence (spark.checkpoint.dir) is the
    // fault-tolerant variant for multi-hour crawls.
    def cut[T](ds: Dataset[T]): Dataset[T] = ds.localCheckpoint(true)

    def sized(ds: Dataset[(String, (Trace, D, Int))],
              n: Long): Dataset[(String, (Trace, D, Int))] = {
      val parallelism = spark.sparkContext.defaultParallelism
      val parts = math.max(1L, math.min(parallelism.toLong, n / 8 + 1)).toInt
      if (parts < parallelism) ds.coalesce(parts) else ds
    }

    val visitedParts = scala.collection.mutable.Buffer.empty[Dataset[ExploredRow[D]]]
    val visitedKeyParts = scala.collection.mutable.Buffer.empty[org.apache.spark.sql.DataFrame]

    var open: Dataset[(String, (Trace, D, Int))] =
      cut(dedupOpen(seeds.map { case (t, d) => (t.cacheKey, (t, d, 0)) }))
    var openCount = open.count()

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
      //    parts are disjoint — no distinct. Cached at the RDD level (block
      //    cache only — NOT Dataset.persist, see `cut`), lazily: the first
      //    materialization rides this epoch's action, later epochs scan the
      //    cached 64-char strings, never the doc payloads.
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
      open = cut(fresh)
      mark("fresh-cut")
      openCount = open.count()
      mark(s"count (open=$openCount)")
    }

    // materialize the flat union once, inside the loop's AQE guard, so
    // downstream queries see a single checkpointed leaf
    val all = visitedParts.reduceOption(_ union _)
      .getOrElse(spark.emptyDataset[ExploredRow[D]])
    all.filter(_.depth >= params.minDepth).localCheckpoint(true)
  }

  /** Per-epoch frontier dedup: one row per key (same epoch => equal depth). */
  private def dedupOpen[D](ds: Dataset[(String, (Trace, D, Int))])(
      implicit enc: Encoder[(String, (Trace, D, Int))]): Dataset[(String, (Trace, D, Int))] =
    ds.groupByKey(_._1)(Encoders.STRING).reduceGroups((a, _) => a).map(_._2)
}
