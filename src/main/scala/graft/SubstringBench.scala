package graft

import graft.queries.TextQ

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Substring-dedup scale-stress (r11 verdict #6) — the empirical twin of
  * TextOpsSpec's planted 1000-doc removal-list spec: a corpus with one
  * PLANTED MEGA-CLUSTER (every member shares one 20-token span — the
  * license-boilerplate / mirror-farm shape) stresses the two substring-dedup
  * modes against their complexity classes:
  *
  *   - '''removal lists''' ([[TextQ.substringRemovalIntervals]], Lee et al.
  *     ACL'22) are O(occurrences): the mega-cluster contributes ONE removal
  *     row per member occurrence, so runtime is flat in cluster size (the
  *     corpus-linear anchor pass dominates; the hot gram's reducer rows are
  *     linear) — doubling the cluster must NOT move runtime materially.
  *   - '''pair mode''' ([[TextQ.substringDedupPairs]]) is O(pairs) BY
  *     RESULT-SET IDENTITY: a c-member cluster emits c·(c−1)/2 rows, so
  *     doubling c quadruples work. The bench runs it at small cluster sizes
  *     only and logs the extrapolated pair count it refuses to materialize
  *     at the removal-list sizes (no silent caps) — that asymmetry IS the
  *     datapoint: at mega-cluster scale the pair table is the scale-killer
  *     and removal lists are the documented path.
  *
  * Corpus text is formula-generated (deterministic, no driver-side data):
  * ~30 unique soup tokens per doc from a 50k vocab, plus the planted span
  * for cluster members. One JSON line with all datapoints.
  *
  * `GRAFT_SUB_N=1000000 GRAFT_SUB_CLUSTER=10000 sbt "runMain graft.SubstringBench"`
  */
object SubstringBench {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_SUB_N", "1000000").toLong
    val cluster = sys.env.getOrElse("GRAFT_SUB_CLUSTER", "10000").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // doc i: 30 soup tokens t_j = v{xxhash64(i*30+j) mod 50017} — HASH-mixed,
    // not a linear congruence: a linear formula (i*a + j*b) makes doc i+b a
    // SHIFTED copy of doc i (their token sequences align after a constant
    // offset), turning the whole corpus into one duplicate family; mixing
    // kills the alignment so only the planted span duplicates. Cluster
    // members append the shared 20-token span — each loses exactly that
    // occurrence, the keeper (min (doc_id, pos)) survives.
    val span = (0 until 20).map(i => s"dup$i").mkString(" ")
    def docs(clusterSize: Long): DataFrame =
      spark.range(n).select(col("id").as("doc_id"),
        concat(
          array_join(expr("transform(sequence(1, 30), j -> concat('v', pmod(xxhash64(id * 30 + j), 50017)))"), " "),
          when(col("id") < clusterSize, lit(" " + span)).otherwise(lit(""))
        ).as("text"))

    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = body
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    // warm-up (JIT, codegen, shuffle pools): one untimed full-corpus pass
    // per mode, so the first timed run isn't charged compilation
    TextQ.substringRemovalIntervals(docs(cluster / 2L), k = 12, p = 4).count()
    TextQ.substringDedupPairs(docs(cluster / 4L), k = 12, p = 4).count()

    // removal lists: flat in cluster size (occurrence-linear, corpus-dominated)
    val (tRemHalf, remHalf) = time(
      TextQ.substringRemovalIntervals(docs(cluster / 2L), k = 12, p = 4).count())
    val (tRemFull, remFull) = time(
      TextQ.substringRemovalIntervals(docs(cluster.toLong), k = 12, p = 4).count())

    // pair mode at the SAME corpus, cluster/4 and cluster/2: doubling the
    // cluster quadruples the pair table; the full-size run is refused and
    // logged (not silently capped) — at cluster=10k it would be ~50M rows
    val c1 = cluster / 4
    val c2 = cluster / 2
    val (tPair1, pair1) = time(
      TextQ.substringDedupPairs(docs(c1.toLong), k = 12, p = 4).count())
    val (tPair2, pair2) = time(
      TextQ.substringDedupPairs(docs(c2.toLong), k = 12, p = 4).count())
    val fullPairs = cluster.toLong * (cluster - 1) / 2
    println(s"[substringbench] pair mode NOT run at cluster=$cluster: " +
      s"it would materialize >= $fullPairs pair rows (quadratic); " +
      s"removal-list mode is the scale path at that size")

    val remRatio = tRemFull / tRemHalf
    val pairRatio = tPair2 / tPair1
    println(
      f"""{"bench":"substring","n":$n,"cluster":$cluster,""" +
        f""""removal_half_sec":$tRemHalf%.2f,"removal_full_sec":$tRemFull%.2f,""" +
        f""""removal_rows_half":$remHalf,"removal_rows_full":$remFull,""" +
        f""""removal_ratio":$remRatio%.2f,""" +
        f""""pair_c1":$c1,"pair_c1_sec":$tPair1%.2f,"pair_c1_rows":$pair1,""" +
        f""""pair_c2":$c2,"pair_c2_sec":$tPair2%.2f,"pair_c2_rows":$pair2,""" +
        f""""pair_ratio":$pairRatio%.2f,""" +
        f""""pairs_refused_at_cluster":$fullPairs}""")
    // the complexity-class assertions: removal output is one row per
    // non-keeper cluster member (plus nothing else — the soup must not
    // duplicate); pair output quadruples when the cluster doubles. Row
    // counts are noise-free; wall-clock ratios are reported, not asserted.
    assert(remHalf == cluster / 2 - 1 && remFull == cluster - 1,
      s"removal rows must be exactly cluster-1: $remHalf/$remFull vs $cluster")
    assert(pair2 >= 4L * pair1 - 2L * c2,
      s"pair mode output not quadratic: $pair1 -> $pair2")
    spark.stop()
  }
}
