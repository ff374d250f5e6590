package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup — semantic (embedding-space) deduplication: cluster the corpus
  * with k-means, then within each cluster drop every point that has a more
  * central near-twin above a cosine threshold (Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", arXiv:2303.09540). The reference engine has no
  * embedding-space operators at all (its dedup surface is fetched-trace
  * keys, module/core doc/Observation.scala); this is part of the
  * training-data extension layer next to MinHash (q26) / SimHash (q27) /
  * IVF ANN (q34).
  *
  * Numeric contract — EXACT, engine-replicable arithmetic, the q72/q73
  * integer-quantization pattern: embedding components quantize to integer
  * hundred-thousandths once at entry; every distance, every centroid update
  * and every cosine-threshold decision after that is integer math (long on
  * the Spark side, HUGEINT in the DuckDB oracle), so the clustering and the
  * dedup verdicts hash-match across engines bit-for-bit — no float
  * accumulation order, no sqrt, no epsilon. Centroids carry an extra
  * [[CENTROID_SCALE]] precision factor and update by exact floor division;
  * the cosine test `cos(a,b) > tauNum/tauDen` runs cross-multiplied as
  * `tauDen² · dot² > tauNum² · |a|²·|b|²` (with `dot > 0`) in decimal(38,0)
  * — dot ≤ d·(maxComp·SCALE)² stays far below the 38-digit cap for
  * unit-scale embeddings.
  *
  * Shape at 100 TB: Lloyd iterations are map-side — the k×d centroid table
  * rides one broadcast row and assignment is a single `aggregate` fold per
  * vector (the [[Ann.assignCells]] plan); the update is ONE shuffle of
  * (cluster, pos) partial sums (map-side combine collapses each task to
  * ≤ k·d rows) and a k·d-long driver collect per iteration — bounded,
  * documented driver state, same class as Ann's centroid tables. The
  * pairwise stage joins only WITHIN clusters (shuffle-hash on cluster id);
  * cluster population is corpus/k, so k scales with the corpus (SemDeDup
  * runs ~100k clusters at web scale) to keep cells bounded — the same
  * sizing rule as IVF cells ([[Ann.autoCellCount]]), and [[Ann
  * .capCellSizes]] composes for hot cells. Vectors are the only payload
  * shuffled; documents/text never move.
  *
  * [[Ann.trainCentroids]] remains the MLlib path for production index
  * builds; this one exists so the CLUSTERING ITSELF can be oracle-gated
  * (an oracle must be engine-replicable — MLlib's float k-means is not).
  */
object SemDedup {

  /** Component quantization: integer hundred-thousandths. */
  val COMPONENT_SCALE = 100000L

  /** Extra centroid precision carried through floor-division updates. */
  val CENTROID_SCALE = 1000L

  /** Centroid id + components in COMPONENT_SCALE·CENTROID_SCALE units. */
  type Centroids = Seq[(Long, Array[Long])]

  /** Adds `qv: array<bigint>` — the quantized embedding. `round` is
    * ties-away-from-zero in both Spark and DuckDB and the float→double
    * widening is exact, so qv is engine-identical.
    */
  def quantize(vectors: DataFrame, vecCol: String): DataFrame =
    vectors.withColumn("qv", expr(
      s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * $COMPONENT_SCALE) AS BIGINT))"))

  /** Deterministic init: the k lowest-id vectors, scaled to centroid units.
    * A k-row bounded collect (the oracle replays it as `WHERE id < k` over
    * dense ids).
    */
  def initCentroids(q: DataFrame, idCol: String, k: Int): Centroids =
    q.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long"), col("qv"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Long](1).map(_ * CENTROID_SCALE).toArray))
      .sortBy(_._1)
      .zipWithIndex.map { case ((_, cv), i) => (i.toLong, cv) }

  /** Squared integer distance from `qv` (component units) to lambda-bound
    * centroid struct `c` (centroid units), via the exact expansion
    * Σ(qvᵢ·CQ − cvᵢ)² = CQ²·Σqvᵢ² + Σcvᵢ² − 2·CQ·Σ(qvᵢ·cvᵢ): the row term
    * `n2q` is computed once per row, `c.n2` once per centroid, and the
    * cross term is ONE native codegen dot ([[graft.sql.VecDotLong]]) —
    * identical int64 value to the naive fold (every term exact), k× less
    * work and no interpreted lambda. Fits long for |component| ≤ ~9·10⁴ at
    * d = 64.
    */
  private val DIST =
    s"n2q * CAST(${CENTROID_SCALE * CENTROID_SCALE} AS BIGINT) + c.n2" +
      s" - CAST(${2 * CENTROID_SCALE} AS BIGINT) * vec_dot_long(qv, c.cv)"

  /** The argmin fold over a `cells` column (sorted array of (cid, cv)
    * structs): strict `<` keeps the earliest best, so ties resolve to the
    * lowest centroid id. Shared by the batch [[assign]] (broadcast-packed
    * cells) and the streaming frozen-snapshot path
    * ([[graft.streaming.EventStreams.semClusterIngest]]'s literal cells)
    * so the two can never diverge.
    */
  private[graft] val bestCellFold: String =
    s"""aggregate(cells,
       |  struct(CAST(-1 AS BIGINT) AS id, CAST(${Long.MaxValue} AS BIGINT) AS d),
       |  (acc, c) -> CASE WHEN $DIST < acc.d
       |                   THEN struct(c.cid AS id, $DIST AS d)
       |                   ELSE acc END)""".stripMargin

  /** A frozen-centroid `cells` literal in the [[bestCellFold]] shape — the
    * streaming/broadcast-free alternative to [[assign]]'s packed row.
    * Bounded by construction (k·d longs in the plan); use [[assign]] when
    * k is index-build-sized. Each cell carries its precomputed Σcv² so the
    * fold's distance is one native dot.
    */
  def cellsLiteral(centroids: Centroids): Column =
    typedLit(centroids.sortBy(_._1).map { case (cid, cv) =>
      (cid, cv.toSeq, cv.map(x => x * x).sum)
    }).cast("array<struct<cid:bigint,cv:array<bigint>,n2:bigint>>")

  /** Tags every vector with `cluster` (argmin distance, ties to the lowest
    * centroid id) and `cdist` (the winning squared distance). Entirely
    * map-side: centroids pack into ONE broadcast row, the argmin is an
    * `aggregate` fold per vector — the corpus is never shuffled (the
    * [[Ann.assignCells]] contract).
    */
  def assign(q: DataFrame, centroids: Centroids): DataFrame = {
    val spark = q.sparkSession
    import spark.implicits._
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val packed = centroids.map { case (cid, cv) =>
      (cid, cv.toSeq, cv.map(x => x * x).sum)
    }.toDF("cid", "cv", "n2")
      .agg(sort_array(collect_list(struct(col("cid"), col("cv"), col("n2"))))
        .as("cells"))
    q.withColumn("n2q", graft.functions.vec_dot_long(col("qv"), col("qv")))
      .crossJoin(broadcast(packed))
      .withColumn("best", expr(bestCellFold))
      .withColumn("cluster", col("best.id"))
      .withColumn("cdist", col("best.d"))
      .drop("cells", "best", "n2q")
  }

  /** One Lloyd update: per-cluster exact component sums (one partial-agged
    * shuffle of (cluster, pos) rows) → floor-divided centroids on the
    * driver (k·d longs). Clusters that lost every member keep their
    * previous centroid.
    */
  def lloydUpdate(assigned: DataFrame, prev: Centroids): Centroids = {
    val sums = assigned
      .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (cid, rows) =>
        val d = rows.length
        val cv = new Array[Long](d)
        rows.foreach { r =>
          cv(r.getInt(1)) = Math.floorDiv(r.getLong(2) * CENTROID_SCALE, r.getLong(3))
        }
        cid -> cv
      }
    prev.map { case (cid, cv) => (cid, sums.getOrElse(cid, cv)) }
  }

  /** `iters` full Lloyd iterations (assign + update) from the deterministic
    * init. Returns the final centroids; callers [[assign]] once more for
    * the final clustering.
    */
  def fit(q: DataFrame, idCol: String, k: Int, iters: Int): Centroids = {
    var cen = initCentroids(q, idCol, k)
    var i = 0
    while (i < iters) { cen = lloydUpdate(assign(q, cen), cen); i += 1 }
    cen
  }

  /** Exact integer dot product of two quantized vectors (native codegen —
    * the pairwise stage's O(within-cluster pairs) loop).
    */
  private def qdot(a: String, b: String): Column =
    graft.functions.vec_dot_long(col(a), col(b))

  /** The full operator: quantize → k-means (`iters` Lloyd iterations) →
    * within-cluster domination dedup. A vector is a duplicate iff some
    * OTHER member of its cluster (a) has cosine similarity strictly above
    * `tauNum/tauDen` with it and (b) is closer to the centroid (ties to the
    * lower id) — so every dup group keeps exactly its most central member,
    * the decision is order-independent, and survivors = `NOT is_dup`.
    *
    * Output: (idCol, cluster, is_dup) — one row per vector.
    */
  def semDedup(vectors: DataFrame, idCol: String, vecCol: String,
               k: Int, iters: Int, tauNum: Long, tauDen: Long): DataFrame = {
    val q = quantize(vectors, vecCol).select(col(idCol), col("qv"))
    val cen = fit(q, idCol, k, iters)
    val m = assign(q, cen)
      .withColumn("n2", qdot("qv", "qv"))
      .select(col(idCol), col("qv"), col("cluster"), col("cdist"), col("n2"))
      .persist()
    val a = m.select(col(idCol).as("id_a"), col("qv").as("qa"),
      col("cluster"), col("cdist").as("da"), col("n2").as("n2a"))
    val b = m.select(col(idCol).as("id_b"), col("qv").as("qb"),
      col("cluster"), col("cdist").as("db"), col("n2").as("n2b"))
    val dec = "decimal(19,0)"
    val dups = a.hint("shuffle_hash").join(b, Seq("cluster"))
      .filter(col("id_a") =!= col("id_b"))
      .filter(col("db") < col("da") ||
        (col("db") === col("da") && col("id_b") < col("id_a")))
      .withColumn("dotv", qdot("qa", "qb"))
      .filter(col("dotv") > 0)
      .filter(
        lit(tauDen * tauDen).cast(dec) * col("dotv").cast(dec) * col("dotv").cast(dec) >
          lit(tauNum * tauNum).cast(dec) * col("n2a").cast(dec) * col("n2b").cast(dec))
      .select(col("id_a").as(idCol)).distinct()
    m.select(col(idCol), col("cluster"))
      .join(dups.withColumn("is_dup", lit(true)).hint("shuffle_hash"), Seq(idCol), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
  }
}
