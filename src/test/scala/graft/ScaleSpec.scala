package graft

import graft.scale.{Layout, Skew}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout utilities: bucketed joins must be exchange-free; salted
  * joins must equal plain joins while spreading hot keys.
  */
class ScaleSpec extends AnyFunSuite {

  import SparkFixture._

  test("bucketed-bucketed equi-join runs with ZERO exchanges") {
    val spark0 = spark
    import spark0.implicits._
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    // the fixture tables are tiny — suppress auto-broadcast so the planner
    // exercises the bucketed path it would pick at real fact×fact scale
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = (1L to 1000L).map(i => (i, s"o$i")).toDF("k", "o")
      val items = (1L to 3000L).map(i => (i % 1000 + 1, s"i$i")).toDF("k", "item")
      Layout.bucketize(orders, "t_orders_b", 8, "k")
      Layout.bucketize(items, "t_items_b", 8, "k")
      val joined = Layout.bucketedJoin(spark, "t_orders_b", "t_items_b", Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan must be bucketed:\n$plan")
      assert(joined.count() == 3000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
  }

  test("salted join == plain join; hot key spreads over all salts") {
    val spark0 = spark
    import spark0.implicits._
    // pathological skew: 90% of fact rows share key 1
    val fact = ((1 to 9000).map(_ => 1L) ++ (1L to 1000L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("key", "payload")
    val dim = (1L to 1000L).map(i => (i, s"d$i")).toDF("key", "attr")
    val n = 8
    val salted = Skew.saltedJoin(fact, dim, "key", n)
    val plain = fact.join(dim, "key")
    assert(salted.count() == plain.count())
    assert(salted.agg(sum("payload")).collect().head.getLong(0) ==
      plain.agg(sum("payload")).collect().head.getLong(0))
    // the hot key's rows really use multiple salts
    val saltsUsed = fact.withColumn("_salt",
        pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(n)))
      .filter(col("key") === 1).select("_salt").distinct().count()
    assert(saltsUsed == n)
  }
}
