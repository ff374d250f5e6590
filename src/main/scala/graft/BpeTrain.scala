package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: train BPE merges on a testdata dir and print the merge
  * table as Scala source — this is how [[graft.llm.Bpe.CanonicalMerges]]
  * (the frozen table the q55 oracle replays) was generated.
  * `runMain graft.BpeTrain /root/testdata/sf0.001 16`
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, n) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val merges = graft.llm.Bpe.train(Tables.documents(spark, sfDir), n.toInt)
    println("  val CanonicalMerges: Seq[(String, String)] = Seq(")
    println(merges.map { case (l, r) => s"""    ("$l", "$r")""" }.mkString(",\n"))
    println("  )")
    spark.stop()
  }
}
