package graft

import graft.llm.SemDedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup scale-stress — the empirical twin of LlmSpec's driver-replay
  * parity, in the SubstringBench mold. The doctrine under test is the
  * CLUSTER SIZING RULE the operator documents: k must scale with the
  * corpus (SemDeDup's ~100k clusters at web scale) so per-cluster
  * population — and with it the within-cluster pairwise stage — stays
  * bounded. Two legs:
  *
  *   - scaled-k (k = n/500): doubling n doubles the work linearly — the
  *     pairwise stage sees the SAME ~500-member cells, just twice as many.
  *   - fixed-k (k = 64, deliberately undersized, small n): doubling n
  *     quadruples the pairwise pair count — the quadratic cliff the sizing
  *     rule exists to avoid (reported, not asserted: wall-clock at small n
  *     is mostly fixed cost; the PAIR COUNT is the honest quadratic
  *     signal).
  *
  * Vectors are formula-generated (deterministic, no driver data): k planted
  * group centers (hash-mixed uniform components) + per-vector jitter wide
  * enough that ordinary same-group members stay well below the τ = 49/50
  * accept threshold, plus an EXACT twin planted every 100 ids — so the
  * expected dup count is known by construction (the twin, tying on
  * centroid distance, loses to its lower-id original).
  *
  * `GRAFT_SEMDEDUP_N=200000 sbt "runMain graft.SemDedupBench"`
  */
object SemDedupBench {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_SEMDEDUP_N", "50000").toLong
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val D = 64
    // center: uniform[-0.5, 0.5] per component from the group id; jitter:
    // uniform[-0.7, 0.7] from the vector id — E[cos] between same-group
    // members ≈ 0.34 with d = 64 concentration, so τ = 0.98 is a >7σ event; exact twins (every 100th id
    // copies its predecessor) are the only cos = 1 pairs.
    def vectorsJ(count: Long, k: Long, d: Int, jitter: Double): DataFrame =
      spark.range(count).select(col("id").as("vec_id"), expr(
        s"""transform(sequence(0, ${d - 1}), j ->
           |  (pmod(xxhash64((CASE WHEN id % 100 = 99 THEN id - 1 ELSE id END % $k) * 131 + j), 1000) / 1000.0 - 0.5)
           |  + (pmod(xxhash64((CASE WHEN id % 100 = 99 THEN id - 1 ELSE id END) * 31 + j), 1000) / 1000.0 - 0.5) * $jitter)"""
          .stripMargin).as("embedding"))
    def vectorsD(count: Long, k: Long, d: Int): DataFrame = vectorsJ(count, k, d, 1.4)
    def vectors(count: Long, k: Long): DataFrame = vectorsD(count, k, D)

    def run(count: Long, k: Int): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val out = SemDedup.semDedup(vectors(count, k), "vec_id", "embedding",
        k = k, iters = 1, tauNum = 49, tauDen = 50)
      val dups = out.filter(col("is_dup")).count()
      val maxCell = out.groupBy(col("cluster")).count()
        .agg(max(col("count"))).collect().head.getLong(0)
      ((System.nanoTime() - t0) / 1e9, dups, maxCell)
    }

    // candidate-pair volume of the pairwise stage — the quantity the sizing
    // rule bounds: Σ_cells m·(m−1)
    def pairCount(count: Long, k: Int): Long = {
      val q = SemDedup.quantize(vectors(count, k), "embedding")
        .select(col("vec_id"), col("qv"))
      SemDedup.assign(q, SemDedup.fit(q, "vec_id", k, 1))
        .groupBy(col("cluster")).count()
        .agg(sum(col("count") * (col("count") - 1))).collect().head.getLong(0)
    }

    run(n / 4, (n / 4 / 500).toInt.max(4)) // warm-up, untimed

    // scaled-k leg: cells stay ~500 members at both sizes
    val (tHalf, dupsHalf, cellHalf) = run(n / 2, (n / 2 / 500).toInt)
    val (tFull, dupsFull, cellFull) = run(n, (n / 500).toInt)

    // fixed-k contrast leg (small n): pair count must ~quadruple
    val pairsSmall = pairCount(8000, 64)
    val pairsDouble = pairCount(16000, 64)

    // ---- big-k leg: k·d PAST the packed-regime pin, so semDedup
    // auto-selects the distributed-centroid regime; the packed regime is
    // then FORCED on the same input for a same-answer contrast datapoint.
    // d = 512 crosses PACKED_MAX_KD at k > 1024 without needing a corpus
    // too big to double-run.
    val (bigD, bigK, bigN) = (512, 1536, 6000L)
    require(bigK.toLong * bigD > SemDedup.PACKED_MAX_KD, "leg must cross the pin")
    def runBig(pin: Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val dups = SemDedup.semDedup(vectorsD(bigN, bigK, bigD), "vec_id", "embedding",
          k = bigK, iters = 1, tauNum = 49, tauDen = 50, packedMaxKd = pin)
        .filter(col("is_dup")).count()
      ((System.nanoTime() - t0) / 1e9, dups)
    }
    val (tDist, dupsDist) = runBig(SemDedup.PACKED_MAX_KD) // auto → distributed
    val (tPacked, dupsPacked) = runBig(Long.MaxValue)      // forced packed

    // coarse-routed datapoint at the same big-k shape: assignment time +
    // routing recall vs the exact assign (the q102 regime, where even the
    // bucketed-literal k·d stops fitting). CLUSTERED geometry (jitter well
    // under the center spread) — the operator's domain; unstructured
    // vectors are the spec-pinned adversarial floor (LlmSpec measures it)
    val bigQ = SemDedup.quantize(vectorsJ(bigN, bigK, bigD, 0.2), "embedding")
      .select(col("vec_id"), col("qv")).localCheckpoint()
    val bigCen = SemDedup.initCentroidsDF(bigQ, "vec_id", bigK).localCheckpoint()
    val exactA = SemDedup.assignDF(bigQ, "vec_id", bigCen)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tC0 = System.nanoTime()
    val coarseA = SemDedup.assignCoarseDF(bigQ, "vec_id", bigCen,
        coarseEvery = 32, nProbe = 4)
      .select(col("vec_id"), col("cluster")).collect()
    val tCoarse = (System.nanoTime() - tC0) / 1e9
    val recall = coarseA.count(r => exactA(r.getLong(0)) == r.getLong(1))
      .toDouble / coarseA.length

    // ---- coarse-routed TRAINING leg: k·d past COARSE_MAX_KD, where even
    // the bucketed-broadcast assignment stops fitting the per-task budget
    // and fitDF auto-routes every Lloyd iteration through assignCoarseDF.
    // Exact fit is FORCED on the same input for the contrast datapoint
    // (same clustered geometry as the assignment leg — the operator's
    // domain). One iteration each; wall ratios reported, not asserted —
    // the coarse route's claim is MEMORY SHAPE (the loop runs with no
    // task ever holding more than one coarse cell's centroids), not wall
    // at a k·d where exact still fits: isolated runs measure the coarse
    // iteration ~2x faster fully materialized (12.2 vs 25.1 s assign,
    // 18.6 vs 37.7 s assign+update), but in-context numbers wobble with
    // the block-manager state earlier legs leave behind.
    spark.catalog.clearCache() // drop earlier legs' leaked persists
    val (fitD, fitK, fitN) = (512, 8704, 9000L)
    require(fitK.toLong * fitD > SemDedup.COARSE_MAX_KD,
      "training leg must cross the coarse pin")
    val fitQ = SemDedup.quantize(vectorsJ(fitN, 256, fitD, 0.2), "embedding")
      .select(col("vec_id"), col("qv"))
      .repartition(col("vec_id")).persist()
    fitQ.count()
    val cenF = SemDedup.initCentroidsDF(fitQ, "vec_id", fitK).localCheckpoint()
    val coarseEveryF = math.max(1, math.round(math.sqrt(fitK.toDouble)).toInt)
    // one ITERATION per regime — assign + Lloyd update, fully materialized
    // (localCheckpoint defeats the column pruning a bare count() invites),
    // checkpoint dropped right after so iterations don't pollute each
    // other's block-manager budget. One untimed round per regime first:
    // the coarse plan shapes (literal-fold probe, shuffle-hash routing
    // join) pay heavy codegen/JIT on their cold pass.
    def iterOnce(coarse: Boolean): (Double, Long) = {
      val t0 = System.nanoTime()
      val assigned =
        if (coarse) SemDedup.assignCoarseDF(fitQ, "vec_id", cenF, coarseEveryF, 2)
        else SemDedup.assignDF(fitQ, "vec_id", cenF)
      val r = SemDedup.lloydUpdateDF(assigned, cenF).localCheckpoint()
      val dt = (System.nanoTime() - t0) / 1e9
      val rows = r.count()
      r.unpersist(false)
      (dt, rows)
    }
    iterOnce(coarse = true); iterOnce(coarse = false)
    val (tFitCoarse, fitCoarseRows) = iterOnce(coarse = true)
    val (tFitExact, fitExactRows) = iterOnce(coarse = false)
    fitQ.unpersist(false)

    // ---- hot-cluster guard leg: HALF the corpus is one exact blob. The
    // unguarded pairwise stage is quadratic (measured analytically off
    // cluster sizes — the refusal, like SubstringBench's full-size mode);
    // guarded at cap = 500 the blob splits and the operator RUNS.
    val gN = 20000L
    val blobVecs = spark.range(gN).select(col("id").as("vec_id"), expr(
      s"""CASE WHEN id < ${gN / 2}
         |  THEN transform(sequence(0, ${D - 1}), j -> CASE WHEN j = 0 THEN 1.0D ELSE 0.0D END)
         |  ELSE transform(sequence(0, ${D - 1}), j ->
         |    (pmod(xxhash64((id % 20) * 131 + j), 1000) / 1000.0 - 0.5)
         |    + (pmod(xxhash64(id * 31 + j), 1000) / 1000.0 - 0.5) * 1.4)
         |END""".stripMargin).as("embedding"))
    val gQ = SemDedup.quantize(blobVecs, "embedding").select(col("vec_id"), col("qv"))
    val gM = SemDedup.assign(gQ, SemDedup.fit(gQ, "vec_id", 8, 1)).localCheckpoint()
    val unguardedPairs = gM.groupBy(col("cluster")).count()
      .agg(sum(col("count") * (col("count") - 1))).collect().head.getLong(0)
    val guardedPairs = SemDedup.hotSplit(gM, "vec_id", 500L)
      .groupBy(col("cluster"), col("sub")).count()
      .agg(sum(col("count") * (col("count") - 1))).collect().head.getLong(0)
    val tG0 = System.nanoTime()
    val gOut = SemDedup.semDedup(blobVecs, "vec_id", "embedding",
      k = 8, iters = 1, tauNum = 49, tauDen = 50, maxClusterSize = 500L)
    val blobSurvivors = gOut.filter(col("vec_id") < gN / 2 && !col("is_dup")).count()
    val tGuarded = (System.nanoTime() - tG0) / 1e9

    val ratio = tFull / tHalf
    val pairRatio = pairsDouble.toDouble / pairsSmall
    println(
      f"""{"bench":"semdedup","n":$n,"half_sec":$tHalf%.2f,"full_sec":$tFull%.2f,""" +
        f""""ratio":$ratio%.2f,"dups_half":$dupsHalf,"dups_full":$dupsFull,""" +
        f""""max_cell_half":$cellHalf,"max_cell_full":$cellFull,""" +
        f""""fixedk_pairs_8k":$pairsSmall,"fixedk_pairs_16k":$pairsDouble,""" +
        f""""fixedk_pair_ratio":$pairRatio%.2f,""" +
        f""""bigk_kd":${bigK.toLong * bigD},"bigk_dist_sec":$tDist%.2f,""" +
        f""""bigk_packed_sec":$tPacked%.2f,"bigk_dups":$dupsDist,""" +
        f""""coarse_assign_sec":$tCoarse%.2f,"coarse_recall":$recall%.3f,""" +
        f""""fit_kd":${fitK.toLong * fitD},"fit_coarse_iter_sec":$tFitCoarse%.2f,""" +
        f""""fit_exact_iter_sec":$tFitExact%.2f,""" +
        f""""guard_unguarded_pairs":$unguardedPairs,"guard_guarded_pairs":$guardedPairs,""" +
        f""""guard_sec":$tGuarded%.2f,"guard_blob_survivors":$blobSurvivors}""")
    // noise-free assertions: planted twins found (and only ~them); scaled-k
    // cells stay bounded as n doubles; fixed-k pair volume goes quadratic.
    // Wall-clock ratios are reported, not asserted.
    assert(dupsFull >= n / 100 * 9 / 10 && dupsFull <= n / 100 * 3 / 2,
      s"dup count off the planted ~${n / 100}: $dupsFull")
    assert(cellFull <= cellHalf * 2 && cellFull < 2000,
      s"scaled-k cells must stay bounded: $cellHalf -> $cellFull")
    assert(pairRatio > 3.0 && pairRatio < 5.0,
      s"fixed-k pair volume must ~quadruple: $pairRatio")
    assert(dupsDist == dupsPacked,
      s"regimes disagree past the pin: $dupsDist vs $dupsPacked")
    // jittered group members sit far from other groups' axes: 4-probe
    // routing over 48 coarse cells should recover the vast majority
    assert(recall > 0.8, s"coarse routing recall collapsed: $recall")
    assert(fitCoarseRows == fitK && fitExactRows == fitK,
      s"fit must return k centroid rows: $fitCoarseRows / $fitExactRows")
    assert(unguardedPairs >= (gN / 2) * (gN / 2 - 1),
      s"blob must be quadratic unguarded: $unguardedPairs")
    assert(guardedPairs * 10 < unguardedPairs,
      s"guard must bound pair volume: $guardedPairs vs $unguardedPairs")
    assert(blobSurvivors == 1L,
      s"guarded blob must keep exactly one member: $blobSurvivors")
    spark.stop()
  }
}
