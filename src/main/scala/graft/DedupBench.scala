package graft

import graft.llm.Dedup

import org.apache.spark.sql.SparkSession

/** Connected-components scale-stress: an N-edge similarity graph built from
  * the three shapes that matter at corpus scale —
  *   - mega-clusters (mirror-site dup farms): dense stars, the skew case
  *   - long chains (drifting boilerplate, doc i ~ doc i±1): the
  *     diameter-adversarial case where naive label propagation needs
  *     O(chain length) rounds but large-star/small-star stays logarithmic
  *   - random pairs (background near-dup noise)
  * Asserts component counts/labels against closed-form expectations (each
  * shape's min-id labeling is predictable), prints one JSON line with round
  * count and edges/sec.
  *
  * `GRAFT_DEDUP_EDGES=2000000 sbt "runMain graft.DedupBench"`
  */
object DedupBench {

  def main(args: Array[String]): Unit = {
    val nEdges = sys.env.getOrElse("GRAFT_DEDUP_EDGES", "1000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Thirds; node-id spaces are disjoint so expectations stay closed-form.
    val third = nEdges / 3
    val CHAIN_LEN = 100000L // each chain: 100k nodes strung end to end
    val STAR_SIZE = 10000L  // each cluster: one hub, 10k members

    val chains = spark.range(third).map { i =>
      val chain = i / (CHAIN_LEN - 1)                  // which chain
      val off = i % (CHAIN_LEN - 1)                    // position in chain
      val base = 1000000000L + chain * CHAIN_LEN
      (base + off, base + off + 1)
    }
    val stars = spark.range(third).map { i =>
      val cluster = i / (STAR_SIZE - 1)
      val off = i % (STAR_SIZE - 1)
      val base = 2000000000L + cluster * STAR_SIZE
      (base, base + 1 + off)
    }
    // xorshift-ish deterministic scatter over a 10M-node space
    def randEdge(i: Long): (Long, Long) = {
      val a = (i * 6364136223846793005L + 1442695040888963407L) >>> 41
      val b = (i * 2862933555777941757L + 3037000493L) >>> 41
      (3000000000L + (a % 10000000L), 3000000000L + (b % 10000000L))
    }
    val rand = spark.range(nEdges - 2 * third).map(i => randEdge(i))
    val edges = chains.union(stars).union(rand).toDF("src", "dst")

    // incremental-maintenance datapoint: hold out the last INC_PCT% of
    // edges, assign the base graph, then fold the increment in with
    // mergeComponents — the ops ratio (full CC vs batch-contracted merge)
    // is the 100 TB argument for warm-start dedup maintenance
    val incPct = sys.env.getOrElse("GRAFT_DEDUP_INC_PCT", "10").toInt

    val t0 = System.nanoTime()
    val (comps, rounds) = Dedup.connectedComponentsWithStats(edges, "src", "dst")
    // closed-form golden for the structured thirds: every chain/star node
    // must label to its chain/star minimum
    val bad = comps
      .filter($"id" < 3000000000L)
      .filter(
        ($"id" >= 2000000000L && $"comp" =!= ($"id" - (($"id" - 2000000000L) % STAR_SIZE))) ||
        ($"id" < 2000000000L && $"comp" =!= ($"id" - (($"id" - 1000000000L) % CHAIN_LEN))))
      .count()
    val nComps = comps.select("comp").distinct().count()
    val nNodes = comps.count()
    val sec = (System.nanoTime() - t0) / 1e9
    require(bad == 0L, s"$bad structured nodes mislabeled")

    // warm-start: base = first (100-incPct)% of the random third (chains and
    // stars kept whole in the base so the increment both bridges existing
    // components and adds new nodes), increment = the held-out tail
    val randCount = nEdges - 2 * third
    val holdout = randCount * incPct / 100
    val baseEdges = chains.union(stars)
      .union(spark.range(randCount - holdout).map(i => randEdge(i))).toDF("src", "dst")
    val incEdges = spark.range(randCount - holdout, randCount).map(i => randEdge(i))
      .toDF("src", "dst")
    val baseAsg = Dedup.connectedComponents(baseEdges, "src", "dst")
      .localCheckpoint() // materialize: time ONLY the merge below
    val tInc0 = System.nanoTime()
    val merged = Dedup.mergeComponents(baseAsg, incEdges)
    val mergedNodes = merged.count()
    val incSec = (System.nanoTime() - tInc0) / 1e9
    require(mergedNodes == nNodes, s"incremental lost nodes: $mergedNodes != $nNodes")

    val json =
      s"""{"metric":"dedup_cc","edges":$nEdges,"nodes":$nNodes,"components":$nComps,""" +
        s""""rounds":$rounds,"sec":${f"$sec%.2f"},"edges_per_sec":${(nEdges / sec).toLong},""" +
        s""""inc_pct":$incPct,"inc_edges":$holdout,"inc_merge_sec":${f"$incSec%.2f"}}"""
    spark.stop()
    println(json)
  }
}
