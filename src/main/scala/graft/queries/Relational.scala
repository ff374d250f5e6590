package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.3-§2.10) over the TPC-H-ish
  * testdata, expressed DataFrame-first so Catalyst handles pushdown/pruning/
  * join selection.
  *
  * Every query is paired with an ANSI-SQL oracle (DuckDB) in [[oracles]].
  * Conventions for oracle parity:
  *   - every float aggregate is `round(..., 2)` (or 4) on BOTH sides;
  *   - every result has a total ORDER BY (unique tiebreak columns);
  *   - column names are identical on both sides.
  *
  * Scale notes (100 TB design review): all joins below either broadcast a
  * dimension (region/nation/customer at TPC-H proportions) or shuffle on the
  * natural join key; aggregations are partial-agg friendly (no UDAFs); sorts
  * are only for output determinism and would be dropped or replaced by
  * `sortWithinPartitions` in production writes.
  */
object Relational {

  private def ts(s: String): Column = to_timestamp(lit(s))

  /** q01 — projection + predicate pushed to the parquet scan. */
  def q01ScanFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") < ts("1997-01-01") && col("l_quantity") < 5)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        round(col("l_extendedprice"), 2).as("price"))
      // (orderkey, linenumber) is NOT unique in lineitem (the generator
      // samples with replacement — 118k dup pairs at sf0.1); ordering by
      // every output column makes any remaining tie an identical row, so
      // engine-dependent sort tie-order can never flip the dump
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("price"))

  /** q02 — TPC-H Q1 style hash aggregate (map-side partial agg, 6 groups). */
  def q02AggSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= ts("2001-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** q03 — TPC-H Q3 style: broadcast dim join + shuffle join + top-k.
    * customer is broadcast (tiny vs lineitem); order by rounded revenue so
    * float ulps can't reorder the limit boundary.
    */
  def q03TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < ts("1998-01-01"))
    val l = Tables.lineitem(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** q04 — TPC-H Q5 style 6-way join; region/nation broadcast. */
  def q04RegionalRevenue(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1999-01-01"))
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("n_name"))
  }

  /** q05 — left-semi join (EXISTS). */
  def q05SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** q06 — left-anti join (NOT EXISTS). */
  def q06AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** q07 — window: top-3 orders per customer by totalprice. */
  def q07WindowTopN(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** q08 — window: per-supplier running quantity (explicit ROWS frame).
    * l_quantity rides the window ORDER BY: (shipdate, orderkey, linenumber)
    * is NOT unique (this table's keys repeat), and a ROWS-frame prefix sum
    * over tied rows with DIFFERENT quantities is tie-order dependent —
    * BOTH engines flipped such a pair between otherwise-identical runs.
    * With quantity in the key, any remaining tie has an equal increment, so
    * every prefix value is well-defined.
    */
  def q08RunningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .withColumn("running_qty", round(sum(col("l_quantity")).over(w), 2))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
      // running_qty tiebreak: (orderkey, linenumber) is NOT unique in this
      // table (dup rows differing only in shipdate exist at sf0.1), so
      // without it the two engines may emit such pairs in either order —
      // a latent flake that bit after five green rounds
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
  }

  /** q09 — global top-k with unique tiebreaks (TakeOrderedAndProject). */
  def q09TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("price"))
      .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(25)

  /** q10 — set ops: INTERSECT + EXCEPT of 1995 vs 1996 buyer key-sets. */
  def q10SetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def buyers(yr: Int) =
      o.filter(year(col("o_orderdate")) === yr).select(col("o_custkey")).distinct()
    val both = buyers(1995).intersect(buyers(1996)).withColumn("tag", lit("both"))
    val only95 = buyers(1995).except(buyers(1996)).withColumn("tag", lit("only95"))
    both.unionByName(only95)
      .select(col("tag"), col("o_custkey"))
      .orderBy(col("tag"), col("o_custkey"))
  }

  /** q11 — rollup aggregate over a dimension join. */
  def q11Rollup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(asc_nulls_first("n_name"))
  }

  /** q12 — exact distinct counts (expand + two-phase agg). */
  def q12DistinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** q13 — cartesian product of two tiny dims (crossJoin; 125 rows). */
  def q13CrossJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.region(spark, dir)
      .crossJoin(Tables.nation(spark, dir))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))

  /** q151 — the linq record-merge calculus (reference Foundation.scala:54-156
    * `++`/`+<+`/`+>+`/`+!+`) gated on data: two frames over `documents` share
    * the conflicting field `score` (left: char length; right: token count);
    * each policy must pick the documented side, and the conflict-free merge
    * must pass the `+!+` check. The oracle replays all three merges as joins
    * with the expected column picked explicitly. (The error PATHS — `+!+` on
    * a genuine conflict, withColumns duplicate fields — stay spec-pinned in
    * RecordsSpec: an exception is not a result set.)
    */
  def q151RecordMerge(spark: SparkSession, dir: String): DataFrame = {
    import graft.api.Records
    import graft.api.Records.MergePolicy._
    val docs = Tables.documents(spark, dir)
    val left = docs.select(
      col("doc_id"), col("lang"), length(col("text")).cast("long").as("score"))
    val right = docs.select(
      col("doc_id"), size(split(col("text"), " ")).cast("long").as("score"),
      concat(substring(col("lang"), 1, 1), lit("-r")).as("src"))
    def tagged(tag: String, df: DataFrame): DataFrame =
      df.select(lit(tag).as("policy"), col("doc_id"), col("lang"),
        col("score"), col("src"))
    tagged("left_wins", Records.mergeOn(left, right, "doc_id", LeftWins))
      .unionAll(tagged("right_wins", Records.mergeOn(left, right, "doc_id", RightWins)))
      .unionAll(tagged("no_conflict",
        Records.mergeOn(left, right.drop("score"), "doc_id", ErrorOnConflict)))
      .orderBy(col("policy"), col("doc_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter"      -> q01ScanFilter _,
    "q02_agg_summary"      -> q02AggSummary _,
    "q03_top_orders"       -> q03TopOrders _,
    "q04_regional_revenue" -> q04RegionalRevenue _,
    "q05_semi_join"        -> q05SemiJoin _,
    "q06_anti_join"        -> q06AntiJoin _,
    "q07_window_topn"      -> q07WindowTopN _,
    "q08_running_sum"      -> q08RunningSum _,
    "q09_topk"             -> q09TopK _,
    "q10_set_ops"          -> q10SetOps _,
    "q11_rollup"           -> q11Rollup _,
    "q12_distinct_counts"  -> q12DistinctCounts _,
    "q13_cross_join"       -> q13CrossJoin _,
    "q151_record_merge"    -> q151RecordMerge _,
  )

  val oracles: Map[String, String] = Map(
    // each policy's merge replayed as a join with the documented side's
    // `score` picked explicitly
    "q151_record_merge" ->
      """WITH l AS (
        |  SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS score
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS score,
        |    lang[1:1] || '-r' AS src
        |  FROM documents)
        |SELECT 'left_wins' AS policy, l.doc_id, l.lang, l.score, r.src
        |FROM l JOIN r ON l.doc_id = r.doc_id
        |UNION ALL
        |SELECT 'right_wins', l.doc_id, l.lang, r.score, r.src
        |FROM l JOIN r ON l.doc_id = r.doc_id
        |UNION ALL
        |SELECT 'no_conflict', l.doc_id, l.lang, l.score, r.src
        |FROM l JOIN r ON l.doc_id = r.doc_id
        |ORDER BY policy, doc_id""".stripMargin,
    "q01_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, round(l_extendedprice, 2) AS price
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity < 5
        |ORDER BY l_orderkey, l_linenumber, l_quantity, price""".stripMargin,
    "q02_agg_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_top_orders" ->
      """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q04_regional_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q05_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q07_window_topn" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q08_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(sum(l_quantity) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin,
    "q09_topk" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
        |FROM lineitem
        |ORDER BY price DESC, l_orderkey, l_linenumber
        |LIMIT 25""".stripMargin,
    "q10_set_ops" ->
      """WITH b95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
        |     b96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM b95 INTERSECT SELECT o_custkey FROM b96)
        |UNION ALL
        |SELECT 'only95' AS tag, o_custkey FROM (SELECT o_custkey FROM b95 EXCEPT SELECT o_custkey FROM b96)
        |ORDER BY tag, o_custkey""".stripMargin,
    "q11_rollup" ->
      """SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name)
        |ORDER BY n_name NULLS FIRST""".stripMargin,
    "q12_distinct_counts" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q13_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
  )
}
