package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table (batch form).
  *
  * The `events.ts` column arrives via [[graft.Tables.events]], which
  * normalizes whatever the parquet physical type is (nanosecond timestamps
  * under `spark.sql.legacy.parquet.nanosAsLong=true`, or `timestamp[us]`)
  * to a canonical epoch-nanos BIGINT. All time arithmetic below is exact
  * integer math on nanos so the DuckDB oracle (epoch_us) matches
  * bit-for-bit — no float time.
  *
  * Float sums: `value` is float32. A plain `round(sum(value), 2)` sums
  * doubles in engine-dependent order and diverges at `.xx5` boundaries, so
  * every money-ish sum below widens each addend to an exact decimal first
  * (float→double is exact; double→decimal(30,10) rounds identically — half
  * away from zero — on both engines), sums in decimal (exact, associative,
  * order-independent), rounds in decimal, then casts back to double.
  */
object EventsQ {

  private val HOUR_NS = 3600L * 1000 * 1000 * 1000
  private val GAP_US  = 1800L * 1000 * 1000 // 30 min session gap, microseconds

  /** DuckDB truncates ns→µs on parquet read; mirror with integer div so both
    * engines compute on identical µs longs.
    */
  private val TS_US = "ts div 1000"

  /** Order-independent 2-decimal sum of a float column (see class doc). */
  private def moneySum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(sum(c.cast("double").cast("decimal(30,10)")), 2).cast("double")

  /** DuckDB twin of [[moneySum]]. */
  private def moneySumSql(e: String): String =
    s"CAST(round(sum(CAST(CAST($e AS DOUBLE) AS DECIMAL(30,10))), 2) AS DOUBLE)"

  /** q14 — tumbling 1-hour window aggregate (streaming-window batch analog). */
  def q14Hourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("hour_start",
        timestamp_seconds(expr(s"ts div $HOUR_NS") * 3600))
      .groupBy(col("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** q15 — sessionization: 30-min-gap sessions via lag + running flag sum.
    * Streaming equivalent: `session_window(ts, "30 minutes")`.
    */
  def q15Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("tus", expr(TS_US))
      .withColumn("prev_ts", lag(col("tus"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull || (col("tus") - col("prev_ts")) > GAP_US, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** q97 — the STREAMING sessionize path oracle-gated end-to-end (every
    * other streaming surface is MemoryStream-parity spec'd; this one runs
    * Structured Streaming inside the correctness gate itself): the events
    * parquet feeds a FileStreamSource, flows through
    * [[graft.streaming.EventStreams.sessionWindowsExact]] (native
    * `session_window`, decimal-exact value sums) into a complete-mode
    * memory sink, and the materialized sink table is what the DuckDB
    * oracle must match — the oracle unrolls session_window's gap-≥
    * boundary with a lag test, so a stream that drops, double-counts, or
    * mis-windows any event hash-mismatches. The memory sink is the GATE
    * sink (bounded: sessions, not events); the production path swaps in
    * `writeStream.format("parquet")` with the same plan. Complete mode on
    * finite input emits the full final state — no watermark race.
    */
  def q97StreamSessionize(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val nm = "q97_sessions_sink"
    // re-runnable (bench warm-up + timed pass): stop a live run, drop the
    // stale sink view
    spark.streams.active.filter(q => Option(q.name).contains(nm)).foreach(_.stop())
    scala.util.Try(spark.catalog.dropTempView(nm))
    // the Tables.normalizeTs contract, kept as a TIMESTAMP for
    // session_window: nanos-long reads truncate to µs; timestamp physical
    // types cast directly (µs precision preserved, UTC session tz)
    val tsCol = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("timestamp_micros(ts div 1000)")
      case _                                   => expr("cast(ts as timestamp)")
    }
    val ev = spark.readStream.schema(schema)
      // FileStreamSource force-injects basePath = path for NON-glob paths,
      // which trips "must be a directory" when the table is one parquet
      // file — a brace glob keeps the injection off, the explicit basePath
      // (the table directory) then applies
      .option("basePath", dir)
      .parquet(s"$dir/{events.parquet}")
      .select(tsCol.as("ts"), col("user_id"), col("value"))
    // state partitions derived from input size (see StreamCkpt.statePartitions)
    val q = graft.streaming.StreamCkpt.withStateParts(spark, path) {
      graft.streaming.EventStreams.sessionWindowsExact(ev)
        .writeStream.format("memory").queryName(nm)
        .option("checkpointLocation", graft.streaming.StreamCkpt.ephemeral(nm))
        .outputMode("complete").start()
    }
    try q.processAllAvailable() finally q.stop()
    spark.table(nm).orderBy(col("user_id"), col("session_start_us"))
  }

  /** q16 — semi-structured extraction from the JSON `props` column (real
    * JSON-path extraction, not regex — whitespace/escaping-proof).
    */
  def q16JsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))

  /** q17 — as-of lookup: each purchase joined to the latest strictly-prior
    * signup of the same user (point-in-time-correct join), aggregated to
    * exact-integer nano lag sums per user.
    */
  def q17AsOfSignup(spark: SparkSession, dir: String): DataFrame = {
    val before = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .withColumn("tus", expr(TS_US))
      .withColumn("last_signup",
        max(when(col("event_type") === "signup", col("tus"))).over(before))
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_purchases"),
        count(col("last_signup")).as("n_matched"),
        sum(col("tus") - col("last_signup")).as("lag_us_total"))
      .orderBy(col("user_id"))
  }

  /** q18 — conditional pivot: per-user event-type counts + spend. */
  def q18UserPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_click"),
        sum(when(col("event_type") === "view", 1).otherwise(0)).as("n_view"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"),
        sum(when(col("event_type") === "signup", 1).otherwise(0)).as("n_signup"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_error"),
        moneySum(when(col("event_type") === "purchase", col("value")).otherwise(0.0))
          .as("purchase_value"))
      .orderBy(col("user_id"))

  /** q19 — ordered funnel: users whose first view precedes their first click
    * precedes their first purchase (event-sequence analysis; exact integer µs
    * comparisons only).
    */
  def q19Funnel(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("tus", expr(TS_US))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("tus"))).as("t_view"),
        min(when(col("event_type") === "click", col("tus"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("tus"))).as("t_purchase"))
      .agg(
        count(col("t_view")).as("n_view"),
        count(when(col("t_view") < col("t_click"), 1)).as("n_view_click"),
        count(when(col("t_view") < col("t_click") && col("t_click") < col("t_purchase"), 1))
          .as("n_view_click_purchase"))

  /** q118 — the KMV distinct-count sketch run THROUGH Structured
    * Streaming's state store ([[graft.sql.KmvSketch]] under a streaming
    * groupBy — the custom `TypedImperativeAggregate` exercising the
    * serialize/merge path the state store requires between micro-batches),
    * oracle-gated end-to-end like q97: the events parquet feeds a
    * FileStreamSource, per-event-type sketches of the user-id stream
    * accumulate in complete mode into a memory sink, and the materialized
    * sink must match the DuckDB ranked-hash replay bit-for-bit — sketch
    * content (size + k-th minimum) AND exact-decimal estimate. KMV makes
    * this gateable where most streaming aggregates are not: the k-minimum
    * set is ORDER-INDEPENDENT, so micro-batch boundaries and state-store
    * merge order cannot change the answer. This is the streaming cardinality
    * surface a 100 TB ingest needs (distinct users/URLs per slice, live,
    * in k longs of state per group) — the batch q105 semantics, unchanged
    * under `readStream`.
    */
  def q118StreamDistinct(spark: SparkSession, dir: String): DataFrame = {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val nm = "q118_kmv_sink"
    spark.streams.active.filter(q => Option(q.name).contains(nm)).foreach(_.stop())
    scala.util.Try(spark.catalog.dropTempView(nm))
    val k = 64
    // the q97 FileStreamSource idiom: brace glob keeps the basePath
    // injection off for a single-file table; complete mode on finite
    // input emits the full final state — no watermark race
    val ev = spark.readStream.schema(schema)
      .option("basePath", dir)
      .parquet(s"$dir/{events.parquet}")
      .select(col("event_type"), col("user_id").cast("string").as("uid"))
    // state partitions derived from input size (see StreamCkpt.statePartitions)
    val q = graft.streaming.StreamCkpt.withStateParts(spark, path) { ev.groupBy(col("event_type"))
      .agg(graft.functions.kmv_sketch(col("uid"), k).as("kmv"))
      .select(col("event_type"),
        size(col("kmv.hs")).cast("long").as("kmv_n"),
        expr("element_at(kmv.hs, -1)").as("kth"),
        expr(
          s"""CASE WHEN size(kmv.hs) < $k THEN CAST(size(kmv.hs) AS BIGINT) * 1000000
             |ELSE CAST(${k - 1} AS DECIMAL(38,0)) * CAST(${1L << 60} AS DECIMAL(38,0))
             |     * CAST(1000000 AS DECIMAL(38,0))
             |     div CAST(element_at(kmv.hs, -1) AS DECIMAL(38,0)) END""".stripMargin)
          .cast("long").as("est_millionths"))
      .writeStream.format("memory").queryName(nm)
      .option("checkpointLocation", graft.streaming.StreamCkpt.ephemeral(nm)).outputMode("complete").start()
    }
    try q.processAllAvailable() finally q.stop()
    spark.table(nm).orderBy(col("event_type"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_events_hourly"   -> q14Hourly _,
    "q15_sessionize"      -> q15Sessionize _,
    "q16_json_props"      -> q16JsonProps _,
    "q17_asof_signup"     -> q17AsOfSignup _,
    "q18_user_pivot"      -> q18UserPivot _,
    "q19_funnel"          -> q19Funnel _,
    "q97_stream_sessionize" -> q97StreamSessionize _,
    "q118_stream_distinct" -> q118StreamDistinct _,
  )

  val oracles: Map[String, String] = Map(
    // streaming KMV: the q105/q110 ranked-hash replay over distinct user
    // ids per event type — order-independence is what makes a STREAMING
    // aggregate exactly gateable
    "q118_stream_distinct" ->
      """WITH d AS (
        |  SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS uid FROM events),
        |h AS (
        |  SELECT DISTINCT event_type,
        |    list_reduce(list_transform(range(1, 16),
        |      i -> strpos('0123456789abcdef', substr(md5(uid), i, 1))::BIGINT - 1),
        |      (a, x) -> a * 16 + x) AS h
        |  FROM d),
        |r AS (SELECT event_type, h,
        |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
        |k AS (SELECT event_type, count(*) AS kmv_n, max(h) AS kth
        |      FROM r WHERE rn <= 64 GROUP BY event_type)
        |SELECT event_type, kmv_n, kth,
        |  CAST(CASE WHEN kmv_n < 64 THEN kmv_n * 1000000
        |       ELSE (63::HUGEINT * 1152921504606846976::HUGEINT * 1000000::HUGEINT) // kth
        |       END AS BIGINT) AS est_millionths
        |FROM k ORDER BY event_type""".stripMargin,
    "q14_events_hourly" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
        |  count(*) AS n, ${moneySumSql("value")} AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour_start, event_type""".stripMargin,
    "q15_sessionize" ->
      s"""WITH e AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS tus FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, value, tus,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |              OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
        |), sessions AS (
        |  SELECT user_id, value,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id, count(*) AS n_events, ${moneySumSql("value")} AS session_value
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    // streaming sessionize: session_window's gap-inclusive boundary (a new
    // session at gap >= 30 min — q15 uses strict >), bounds as epoch-µs
    "q97_stream_sessionize" ->
      s"""WITH e AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS tus FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, value, tus,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |              OR tus - lag(tus) OVER w >= $GAP_US THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
        |), sessions AS (
        |  SELECT user_id, value, tus,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS sid
        |  FROM flagged
        |)
        |SELECT user_id, min(tus) AS session_start_us,
        |  max(tus) + $GAP_US AS session_end_us,
        |  count(*) AS n_events, ${moneySumSql("value")} AS session_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,
    "q16_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q17_asof_signup" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events
        |), m AS (
        |  SELECT user_id, event_type, tus,
        |    max(CASE WHEN event_type = 'signup' THEN tus END) OVER (
        |      PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_signup
        |  FROM e
        |)
        |SELECT user_id, count(*) AS n_purchases, count(last_signup) AS n_matched,
        |  CAST(sum(tus - last_signup) AS BIGINT) AS lag_us_total
        |FROM m WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q19_funnel" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
        |  FROM events GROUP BY user_id
        |)
        |SELECT count(t_view) AS n_view,
        |  count(CASE WHEN t_view < t_click THEN 1 END) AS n_view_click,
        |  count(CASE WHEN t_view < t_click AND t_click < t_purchase THEN 1 END)
        |    AS n_view_click_purchase
        |FROM per_user""".stripMargin,
    "q18_user_pivot" ->
      s"""SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  ${moneySumSql("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END")} AS purchase_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
