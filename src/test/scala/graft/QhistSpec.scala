package graft

import graft.sql.QhistAggregate

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The mergeable ε-guaranteed quantile sketch ([[graft.sql.QhistSketch]] /
  * [[graft.sql.QhistMerge]] / [[graft.functions.qhist_value]]): grid math,
  * the ε bound, merge confluence (rollup == direct, bit-for-bit — the
  * canonical-grid contract q130 gates cross-engine), loud-failure paths,
  * and streaming state-store survival.
  */
class QhistSpec extends AnyFunSuite {

  import SparkFixture._

  private val M = 6
  private def lspark = spark

  /** Driver-side reference of the grid (the same arithmetic the DuckDB
    * oracle runs): bucket, midpoint representative.
    */
  private def bucketOf(v: Long): Int = {
    val b = 64 - java.lang.Long.numberOfLeadingZeros(v)
    val s = math.max(0, b - M)
    (s.toLong * 32 + (v >> s)).toInt
  }
  private def repOf(id: Int): Long =
    if (id < 64) id.toLong
    else {
      val s = (id >> 5) - 1
      val sub = id - s.toLong * 32
      (sub << s) + (1L << (s - 1)) - 1
    }
  private def refQuantile(vs: Seq[Long], permille: Int): Long = {
    val ids = vs.map(bucketOf).sorted
    repOf(ids((permille.toLong * (vs.size - 1) / 1000).toInt))
  }

  test("qhist: exact below 2^m, ε = 2^-m relative error above — for every bit range") {
    // one value per magnitude band plus boundary values: the representative
    // must be exact below 64 and within 2^-6 relative above
    val vs: Seq[Long] = (0L to 63L) ++
      (6 to 62).flatMap(b => Seq((1L << b) - 1, 1L << b, (1L << b) + (1L << (b - 2)))) ++
      Seq(Long.MaxValue)
    vs.foreach { v =>
      val rep = repOf(bucketOf(v))
      if (v < 64) assert(rep == v, s"exact range: $v -> $rep")
      else {
        val err = math.abs(rep.toDouble - v.toDouble) / v.toDouble
        assert(err <= 1.0 / 64, s"v=$v rep=$rep err=$err")
      }
    }
    // buckets are monotone and contiguous in v
    val sortedV = vs.sorted
    sortedV.zip(sortedV.tail).foreach { case (a, b) =>
      assert(bucketOf(a) <= bucketOf(b), s"monotone: $a/$b")
    }
  }

  test("qhist_sketch + qhist_value == driver-side integer replay; empty group is null") {
    val s = lspark
    import s.implicits._
    // skewed long-tailed values across two groups
    val rows = (0 until 5000).map { i =>
      val g = s"g${i % 2}"
      val v = ((i.toLong * 2654435761L) % 97) * ((i % 7) match {
        case 0 => 100000L; case 1 => 1000L; case _ => 1L
      })
      (g, v)
    }
    val got = rows.toDF("g", "v").groupBy("g")
      .agg(graft.functions.qhist_sketch(col("v"), M).as("sk"))
      .select(col("g"), graft.functions.qhist_n(col("sk")).as("n"),
        graft.functions.qhist_value(col("sk"), 500, M).as("p50"),
        graft.functions.qhist_value(col("sk"), 990, M).as("p99"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val vs = grp.map(_._2)
      assert(got(g) == ((vs.size.toLong, refQuantile(vs, 500), refQuantile(vs, 990))), s"group $g")
    }
    // empty sketch (all-null input) -> null quantile, n = 0
    val empty = Seq(("g", Option.empty[java.lang.Long])).toDF("g", "v")
      .groupBy("g").agg(graft.functions.qhist_sketch(col("v"), M).as("sk"))
      .select(graft.functions.qhist_n(col("sk")).as("n"),
        graft.functions.qhist_value(col("sk"), 500, M).as("p50"))
      .collect().head
    assert(empty.getLong(0) == 0L && empty.isNullAt(1))
  }

  test("qhist merge confluence: rollup of shard sketches is BIT-IDENTICAL to the direct sketch") {
    val s = lspark
    import s.implicits._
    val rows = (0 until 4000).map(i => (s"g${i % 3}", i % 16, (i.toLong * 31) % 100000))
    def sketchOf(r: Row): (Int, Seq[Int], Seq[Long]) = {
      val sk = r.getStruct(1)
      (sk.getInt(0), sk.getSeq[Int](1), sk.getSeq[Long](2))
    }
    val direct = rows.toDF("g", "shard", "v").groupBy("g")
      .agg(graft.functions.qhist_sketch(col("v"), M).as("sk"))
      .collect().map(r => r.getString(0) -> sketchOf(r)).toMap
    val rolled = rows.toDF("g", "shard", "v").groupBy("g", "shard")
      .agg(graft.functions.qhist_sketch(col("v"), M).as("sk"))
      .groupBy("g").agg(graft.functions.qhist_merge(col("sk"), M).as("sk"))
      .collect().map(r => r.getString(0) -> sketchOf(r)).toMap
    assert(rolled == direct, "canonical grid: merge order must not leave a trace")
    // and the wire shape is ascending, positive, m-stamped
    direct.values.foreach { case (m, ids, counts) =>
      assert(m == M && ids == ids.sorted && counts.forall(_ > 0))
    }
  }

  test("qhist loud failures: negative input, m-mismatch merge, m-mismatch dequantize, corrupt struct") {
    val s = lspark
    import s.implicits._
    def failsWith(msg: String)(body: => Unit): Unit = {
      val e = intercept[Exception](body)
      def all(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ all(t.getCause)
      assert(all(e).exists(_.contains(msg)), s"got: ${all(e).mkString(" | ")}")
    }
    // negative values are a domain error, not a silent clamp
    failsWith("negative") {
      Seq(-1L).toDF("v").agg(graft.functions.qhist_sketch(col("v"), M)).collect()
    }
    val sk = Seq(1L, 100L, 5000L).toDF("v")
      .agg(graft.functions.qhist_sketch(col("v"), M).as("sk"))
    // merging across grids is unsound
    failsWith("not mergeable") {
      sk.agg(graft.functions.qhist_merge(col("sk"), 8)).collect()
    }
    // dequantizing on the wrong grid is unsound
    failsWith("wrong grid") {
      sk.select(graft.functions.qhist_value(col("sk"), 500, 8)).collect()
    }
    // hand-built SQL structs: out-of-range bucket id and non-positive count
    failsWith("outside") {
      Seq(1).toDF("x")
        .select(expr("named_struct('m', 6, 'ids', array(999999), 'counts', array(1L))").as("sk"))
        .agg(graft.functions.qhist_merge(col("sk"), M)).collect()
    }
    failsWith("non-positive") {
      Seq(1).toDF("x")
        .select(expr("named_struct('m', 6, 'ids', array(3), 'counts', array(0L))").as("sk"))
        .agg(graft.functions.qhist_merge(col("sk"), M)).collect()
    }
  }

  test("streaming qhist (state store) == batch sketch") {
    val spark0 = lspark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the dense counter buffer must survive state-store serialize across
    // micro-batches and merge to the same canonical sketch the batch
    // path computes
    val rows = (0 until 3000).map(i => (s"g${i % 3}", (i.toLong * 137) % 50000))
    def skOf(rowSeq: Seq[Row]): Map[String, (Long, Long)] =
      rowSeq.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def sel(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
      .agg(graft.functions.qhist_sketch(col("v"), M).as("sk"))
      .select(col("g"), graft.functions.qhist_n(col("sk")).as("n"),
        graft.functions.qhist_value(col("sk"), 900, M).as("p90"))
    val batch = skOf(sel(rows.toDF("g", "v")).collect().toIndexedSeq)
    val input = MemoryStream[(String, Long)]
    val q = sel(input.toDF.toDF("g", "v"))
      .writeStream.format("memory").queryName("qhs").outputMode("complete").start()
    try {
      input.addData(rows.take(1000): _*); q.processAllAvailable()
      input.addData(rows.drop(1000): _*); q.processAllAvailable()
    } finally q.stop()
    assert(skOf(spark.table("qhs").collect().toIndexedSeq) == batch,
      "cross-micro-batch sketch state must equal the batch sketch exactly")
  }

  test("qhist weighted: == unweighted sketch of the row-exploded multiset; " +
    "zero weight is a no-op; negative weight fails loudly; merges unchanged") {
    val s = lspark
    import s.implicits._
    val rows = (0 until 800).map(i => (s"g${i % 2}", (i.toLong * 97) % 5000, i.toLong % 5))
    def sk(r: Row): (Int, Seq[Int], Seq[Long]) = {
      val st = r.getStruct(1); (st.getInt(0), st.getSeq[Int](1), st.getSeq[Long](2))
    }
    val weighted = rows.toDF("g", "v", "w").groupBy("g")
      .agg(graft.functions.qhist_sketch_weighted(col("v"), col("w"), M).as("sk"))
      .collect().map(r => r.getString(0) -> sk(r)).toMap
    // explode each row into w copies and sketch unweighted — must be
    // bit-identical (incl. rows with w = 0 vanishing)
    val exploded = rows.flatMap { case (g, v, w) => Seq.fill(w.toInt)((g, v)) }
    val unweighted = exploded.toDF("g", "v").groupBy("g")
      .agg(graft.functions.qhist_sketch(col("v"), M).as("sk"))
      .collect().map(r => r.getString(0) -> sk(r)).toMap
    assert(weighted == unweighted)
    // weighted shard sketches roll up through the SAME qhist_merge
    val rolled = rows.toDF("g", "v", "w").withColumn("shard", col("v") % 4)
      .groupBy("g", "shard")
      .agg(graft.functions.qhist_sketch_weighted(col("v"), col("w"), M).as("sk"))
      .groupBy("g").agg(graft.functions.qhist_merge(col("sk"), M).as("sk"))
      .collect().map(r => r.getString(0) -> sk(r)).toMap
    assert(rolled == weighted)
    val e = intercept[Exception] {
      Seq((1L, -2L)).toDF("v", "w")
        .agg(graft.functions.qhist_sketch_weighted(col("v"), col("w"), M)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("negative weight")))
  }

  test("qhist state bound: the dense buffer never exceeds the documented counter count") {
    // the scale contract: (63-m)*2^(m-1) + 2^m counters for the FULL long
    // domain — Long.MaxValue lands in the last bucket, nothing overflows
    val agg = graft.sql.QhistSketch(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), M)
    val buf = agg.createAggregationBuffer()
    assert(buf.length == (63 - M) * (1 << (M - 1)) + (1 << M))
    assert(bucketOf(Long.MaxValue) == buf.length - 1)
    assert(QhistAggregate.sketchType.fieldNames.toSeq == Seq("m", "ids", "counts"))
  }
}
