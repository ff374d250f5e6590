package graft

import graft.queries.TextQ

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LM quality-scoring scale-stress — the empirical twin of TextOpsSpec's
  * hand-computed backoff spec, in the SubstringBench mold: q72's stupid
  * backoff ([[TextQ.lmQuality]]) is linear in corpus tokens end-to-end —
  * count-table builds are map-side-combined groupBys, scoring is five
  * shuffle-hash joins on n-gram keys — so doubling the corpus must roughly
  * double runtime, never worse. The bench also reports the count-table
  * cardinalities (the state a 100 TB run would shuffle): trigram tables
  * approach one row per token (near-unique contexts), which is exactly why
  * the implementation never broadcasts them.
  *
  * Corpus text is formula-generated (deterministic, no driver-side data):
  * 30 hash-mixed soup tokens per doc over a ~50k vocab, Zipf-ish skewed by
  * squaring a mixed draw (hot head tokens exist, so the bigram/trigram
  * tables have realistic hot keys, not a uniform toy).
  *
  * `GRAFT_LM_N=1000000 sbt "runMain graft.LmBench"`
  */
object LmBench {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_LM_N", "500000").toLong
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Zipf-ish token draw: square a [0,1) hash draw before scaling to the
    // vocab, so low ids are hot (the natural-language head) and the tail is
    // long — hash-mixed per (doc, position) so no doc aligns with another.
    def docs(count: Long): DataFrame =
      spark.range(count).select(col("id").as("doc_id"),
        array_join(expr(
          """transform(sequence(1, 30), j -> concat('w',
            |  cast(pow(pmod(xxhash64(id * 31 + j), 100003) / 100003.0, 2) * 50021 as long)))"""
            .stripMargin), " ").as("text"))

    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = body
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    // warm-up: JIT + codegen + shuffle pools, untimed
    TextQ.lmQuality(docs(n / 4)).count()

    val (tHalf, rowsHalf) = time(TextQ.lmQuality(docs(n / 2)).count())
    val (tFull, rowsFull) = time(TextQ.lmQuality(docs(n)).count())

    // count-table state at full size (what a cluster run shuffles): built
    // exactly the way lmQuality builds them
    val toks = docs(n)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .select(col("doc_id"), posexplode(col("ts")).as(Seq("pos", "tok")),
        when(col("pos") >= 1, col("ts")(col("pos") - 1)).as("p1"),
        when(col("pos") >= 2, col("ts")(col("pos") - 2)).as("p2"))
      .filter(col("doc_id") % 2 === 0)
    val nTrain = toks.count()
    val uniN = toks.select(col("tok")).distinct().count()
    val triN = toks.filter(col("p2").isNotNull)
      .select(col("p2"), col("p1"), col("tok")).distinct().count()

    val ratio = tFull / tHalf
    println(
      f"""{"bench":"lm_quality","n":$n,"half_sec":$tHalf%.2f,"full_sec":$tFull%.2f,""" +
        f""""ratio":$ratio%.2f,"rows_half":$rowsHalf,"rows_full":$rowsFull,""" +
        f""""train_tokens":$nTrain,"uni_distinct":$uniN,"tri_distinct":$triN}""")
    // noise-free assertions: one output row per doc at both scales; the
    // trigram table must be a large fraction of train tokens (near-unique
    // contexts — the reason it is never broadcast). Wall-clock ratios are
    // reported, not asserted.
    assert(rowsHalf == n / 2 && rowsFull == n, s"one row per doc: $rowsHalf/$rowsFull")
    assert(triN > nTrain / 4, s"trigram table unexpectedly collapsed: $triN of $nTrain")
    spark.stop()
  }
}
