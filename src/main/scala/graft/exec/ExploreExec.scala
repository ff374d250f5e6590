package graft.exec

import graft.actions.Trace
import graft.agent.Env
import graft.conf.GraftConf

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.storage.StorageLevel

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
    maxDepth: Int = Int.MaxValue,
    checkpointInterval: Int = 5
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
  * Scale shape per epoch: fetch shuffles only (key, trace, payload); the
  * visited-keys side of the anti-join is a single string column (broadcast
  * when small); epoch results are persisted and checkpointed every
  * `checkpointInterval` epochs to truncate lineage (reference
  * TemporaryRefs.scala persist/unpersist/checkpoint cycle).
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
    implicit val openEnc: Encoder[(String, (Trace, D, Int))] =
      Encoders.tuple(Encoders.STRING, Encoders.kryo[(Trace, D, Int)])
    implicit val strEnc: Encoder[String] = Encoders.STRING

    val conf: GraftConf = env.conf
    val maxDepth = math.min(params.maxDepth, conf.maxExploreDepth)
    val down = conf.downSampling

    var visited: Dataset[ExploredRow[D]] = spark.emptyDataset[ExploredRow[D]]
    var visitedKeys: Dataset[String] = spark.emptyDataset[String]

    // frontier: deduped, not-yet-visited (key, trace, payload, depth)
    var open: Dataset[(String, (Trace, D, Int))] = dedupOpen(
      seeds.map { case (t, d) => (t.cacheKey, (t, d, 0)) })

    var epoch = 0
    val persisted = scala.collection.mutable.Buffer.empty[Dataset[_]]

    open = open.persist(StorageLevel.MEMORY_AND_DISK)
    persisted += open

    while (open.limit(1).count() > 0 && maxDepth > 0) {
      // 1. fetch the frontier — FetchExec dedup means one execution per key
      val fetched: Dataset[ExploredRow[D]] = FetchExec
        .fetch(open.map { case (_, (t, d, depth)) => (t, (d, depth)) }(
          Encoders.tuple(Encoders.kryo[Trace], Encoders.kryo[(D, Int)])), env)
        .map { r =>
          ExploredRow(FetchedRow(r.data._1, r.traceKey, r.trace, r.trajectory), r.data._2)
        }
        .persist(StorageLevel.MEMORY_AND_DISK)
      persisted += fetched

      // 2. commit to the visited set
      visited = visited.union(fetched)
      visitedKeys = visitedKeys.union(fetched.map(_.row.traceKey)).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      persisted += visitedKeys

      // 3. expand children (depth+1), drop out-of-range and already-visited
      val children = fetched.flatMap { r =>
        if (r.depth + 1 >= maxDepth) Nil
        else down(next(r.row)).map { case (t, d) => (t.cacheKey, (t, d, r.depth + 1)) }
      }
      val vk = visitedKeys.toDF("vk")
      val fresh = dedupOpen(children).toDF()
        .join(vk, org.apache.spark.sql.functions.col("_1") ===
          org.apache.spark.sql.functions.col("vk"), "left_anti")
        .as[(String, (Trace, D, Int))]

      open = fresh.persist(StorageLevel.MEMORY_AND_DISK)
      persisted += open

      // 4. lineage management: checkpoint every k epochs (reference
      //    ExplorePlan.scala:124-134)
      epoch += 1
      if (epoch % params.checkpointInterval == 0) {
        open = open.localCheckpoint(true)
        visited = visited.localCheckpoint(true)
      }
    }

    val out = visited.filter(_.depth >= params.minDepth)
    // materialize before unpersisting intermediates
    val result = out.persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    persisted.foreach(_.unpersist(false))
    result
  }

  /** Per-epoch frontier dedup: one row per key (min payload arbitrary-first —
    * all same-epoch, so equal depth).
    */
  private def dedupOpen[D](ds: Dataset[(String, (Trace, D, Int))])(
      implicit enc: Encoder[(String, (Trace, D, Int))]): Dataset[(String, (Trace, D, Int))] =
    ds.groupByKey(_._1)(Encoders.STRING).reduceGroups((a, _) => a).map(_._2)
}
