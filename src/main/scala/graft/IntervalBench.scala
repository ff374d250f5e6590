package graft

import graft.queries.CorpusQ

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval-join scale-stress (the SubstringBench mold for q84): a
  * formula-generated event stream with a HOT USER (one user owning a few
  * percent of all traffic — the load-balancer-logs shape) stresses the two
  * range-join plans against their complexity classes:
  *
  *   - '''bucketed''' ([[CorpusQ.intervalJoin]]): bin width == window
  *     width, windows exploded into 2 bins, shuffle-hash equi-join on
  *     (user_id, bin). Candidate pairs are confined to adjacent bins, so
  *     even the hot user contributes O(bin_errors × bin_clicks × bins) ≈
  *     O(true matches) — runtime tracks input + matches, linearly.
  *   - '''naive''' (equi-join on user_id + range FILTER — what the
  *     declarative inequality phrasing executes as once there's any equi
  *     key): every user's errors × clicks cross product materializes
  *     BEFORE the filter, so the hot user alone pays
  *     (hot·n/2)² pairs — quadratic in traffic share. The bench runs this
  *     leg at reduced sizes only and logs the extrapolated pair count it
  *     refuses to materialize at full size (no silent caps).
  *
  * Both legs produce identical results (asserted at the small size). One
  * JSON line with all datapoints.
  *
  * `GRAFT_IVL_N=2000000 sbt "runMain graft.IntervalBench"`
  */
object IntervalBench {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_IVL_N", "2000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val W = 21600000000L // 6 h in micros (the q84 window)
    val SPAN = 30L * 24 * 3600 * 1000000L // 30 days

    // hash-mixed fixture (the SubstringBench lesson: no linear congruence):
    // ~2% of events land on hot user 0, the rest spread over n/200 users;
    // half errors, half clicks; tus uniform over 30 days
    def events(count: Long): DataFrame =
      spark.range(count).select(
        when(pmod(xxhash64(col("id") * 7 + 1), lit(50)) === 0, lit(0L))
          .otherwise(pmod(xxhash64(col("id") * 11 + 3), lit(count / 200 + 1)) + 1)
          .as("user_id"),
        col("id").as("event_id"),
        when(pmod(xxhash64(col("id") * 13 + 5), lit(2)) === 0, lit("error"))
          .otherwise(lit("click")).as("event_type"),
        pmod(xxhash64(col("id") * 17 + 7), lit(SPAN)).as("tus"))

    def naive(ev: DataFrame): DataFrame = {
      val win = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("tus").as("w_start"))
      val clk = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("tus"))
      val hits = clk.join(win.hint("shuffle_hash"), Seq("user_id"))
        .filter(col("tus") >= col("w_start") && col("tus") < col("w_start") + W)
        .select(col("user_id"), col("event_id")).distinct()
      val nw = win.groupBy(col("user_id")).agg(count(lit(1)).as("n_windows"))
      val nh = hits.groupBy(col("user_id")).agg(count(lit(1)).as("n_hits"))
      nw.join(nh, Seq("user_id"), "left")
        .select(col("user_id"), col("n_windows"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"))
    }

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def run(df: DataFrame): (Long, Long) = {
      val r = df.agg(sum(col("n_hits")), count(lit(1))).collect().head
      (r.getLong(0), r.getLong(1))
    }

    // parity at a small size (result-identity of the two plans)
    val small = events(n / 20).cache(); small.count()
    val b0 = CorpusQ.intervalJoin(small).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val nv0 = naive(small).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    require(b0 == nv0, "bucketed and naive interval joins must agree")

    // naive leg: the hot user's cross product dominates — n/2 → n pays 4×
    // on that component; the direct same-size comparison vs bucketed is the
    // headline number
    val half = events(n / 2).cache(); half.count()
    val ((_, _), tNaiveH) = time(run(naive(half)))
    val full = events(n).cache(); full.count()
    val ((_, _), tNaiveF) = time(run(naive(full)))

    val ((hits1, users1), tBuck1) = time(run(CorpusQ.intervalJoin(full)))
    val double_ = events(2 * n).cache(); double_.count()
    val ((hits2, _), tBuck2) = time(run(CorpusQ.intervalJoin(double_)))
    val ((_, _), tNaive2) = time(run(naive(double_)))

    // the quadratic component: hot-user cross-product pairs at n
    val hotErr = full.filter(col("user_id") === 0 && col("event_type") === "error").count()
    val hotClk = full.filter(col("user_id") === 0 && col("event_type") === "click").count()

    println(
      s"""{"bench":"interval","n":$n,"window_us":$W,
         |"naive_half_sec":$tNaiveH,"naive_full_sec":$tNaiveF,"naive_2n_sec":$tNaive2,
         |"naive_ratio_half_to_full":${tNaiveF / tNaiveH},
         |"naive_ratio_full_to_2n":${tNaive2 / tNaiveF},
         |"bucketed_n_sec":$tBuck1,"bucketed_2n_sec":$tBuck2,
         |"bucketed_ratio":${tBuck2 / tBuck1},
         |"naive_vs_bucketed_2n":${tNaive2 / tBuck2},
         |"hits_n":$hits1,"hits_2n":$hits2,"users":$users1,
         |"hot_pairs_at_n":${hotErr * hotClk},
         |"parity_small":true}""".stripMargin.replaceAll("\n", ""))
    spark.stop()
  }
}
