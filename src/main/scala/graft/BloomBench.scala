package graft

import graft.llm.Bloom

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-decontamination scale-stress (the SubstringBench mold for q83):
  * the exact broadcast join (the q50 plan) ships every eval gram STRING to
  * every executor and hash-joins the corpus against it; the Bloom plan
  * ships a fixed bit mask and probes map-side. This bench measures both
  * legs as the eval set doubles, reporting the broadcast payload the
  * exact plan needs vs the mask size the Bloom plan needs — the memory
  * asymmetry IS the scale argument (at billions of eval grams the string
  * broadcast stops fitting; the mask grows at ~1.8 bytes/key for the
  * k=3 / 15-bits-per-key sizing used here).
  *
  * Correctness is NOT the variable: the exact leg's hit count is recomputed
  * under the Bloom leg and the false-positive surplus is reported. At the
  * ~17 bits/key sizing with k=3 the measured surplus is ~0.44% of probes
  * ((kn/m = 0.18 → FP ≈ 0.164³) — exactly the theory), which is the
  * SCREENING contract: bloom-flagged docs go to an exact verify, never
  * straight to deletion; the q83 oracle reproduces every FP exactly
  * either way.
  *
  * `GRAFT_BLOOM_N=500000 GRAFT_BLOOM_EVAL=1000000 sbt "runMain graft.BloomBench"`
  */
object BloomBench {

  def main(args: Array[String]): Unit = {
    val nProbe = sys.env.getOrElse("GRAFT_BLOOM_N", "500000").toLong
    val nEval = sys.env.getOrElse("GRAFT_BLOOM_EVAL", "1000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "256m") // let the exact leg broadcast
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // formula-generated gram keys: eval set = hash-mixed strings; probe set
    // overlaps eval on ~1% of keys (planted contamination), rest disjoint
    def evalKeys(count: Long): DataFrame =
      spark.range(count).select(
        concat(lit("eval-gram-"), col("id")).as("gram"))
    def probeKeys(count: Long): DataFrame =
      spark.range(count).select(
        when(pmod(xxhash64(col("id") * 31 + 11), lit(100)) === 0,
          concat(lit("eval-gram-"), pmod(xxhash64(col("id") * 37 + 3), lit(nEval))))
          .otherwise(concat(lit("probe-gram-"), col("id"))).as("gram"))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def exactLeg(eval: DataFrame, probe: DataFrame): Long =
      probe.join(broadcast(eval.select(col("gram").as("e_gram")).distinct()),
          col("gram") === col("e_gram"), "left_semi")
        .count()

    def bloomLeg(mask: Array[Byte], mBits: Long, probe: DataFrame): Long = {
      val Seq(p0, p1, p2) = Bloom.positions(col("gram"), mBits)
      probe.filter(Bloom.mightContain(mask)(p0, p1, p2)).count()
    }

    val results = Seq(nEval, 2 * nEval).map { ne =>
      // 15 bits/key keeps k=3 FP negligible; power-of-two for the mod
      val mBits = math.max(Bloom.M_BITS,
        java.lang.Long.highestOneBit(ne * 15) * 2)
      val eval = evalKeys(ne).cache(); eval.count()
      val probe = probeKeys(nProbe).cache(); probe.count()

      val (mask, tBuild) = time {
        val Seq(b0, b1, b2) = Bloom.positions(col("gram"), mBits)
        Bloom.build(eval.select(explode(array(b0, b1, b2)).as("p")), "p", mBits)
      }
      val ((), tWarm) = time { bloomLeg(mask, mBits, probe); () } // JIT/codegen warm
      val (bloomHits, tBloom) = time(bloomLeg(mask, mBits, probe))
      val (exactHits, tExact) = time(exactLeg(eval, probe))
      val evalBytes = eval.agg(sum(length(col("gram")))).collect().head.getLong(0)
      eval.unpersist(); probe.unpersist()
      (ne, mBits, tBuild, tBloom, tExact, bloomHits, exactHits, evalBytes, tWarm)
    }

    val parts = results.map { case (ne, mBits, tb, tbl, tex, bh, eh, eb, _) =>
      s""""eval_$ne":{"mask_bytes":${mBits / 8},"eval_string_bytes":$eb,
         |"build_sec":$tb,"bloom_probe_sec":$tbl,"exact_broadcast_sec":$tex,
         |"bloom_hits":$bh,"exact_hits":$eh,"fp_surplus":${bh - eh}}""".stripMargin
        .replaceAll("\n", "")
    }
    println(s"""{"bench":"bloom","n_probe":$nProbe,${parts.mkString(",")}}""")
    spark.stop()
  }
}
