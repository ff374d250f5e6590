package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming analogs of the batch event queries (q14/q15): the
  * same aggregations expressed over an unbounded source. The reference has no
  * streaming module (SURVEY §1.4) — this is the forward-looking surface a
  * 100 TB pipeline needs: `readStream` → these transforms → `writeStream`.
  *
  * Inputs must carry an event-time `ts` TIMESTAMP column (for the driver
  * testdata's nanosecond-long `ts`, convert via
  * `timestamp_micros(ts div 1000)` first). Watermarks bound state so the
  * hourly/session state stores don't grow unboundedly.
  */
object EventStreams {

  /** Tumbling 1-hour counts+value per event type — the streaming twin of
    * q14. Works identically on batch DataFrames (Spark's unified API), which
    * is how the spec cross-checks it against the batch result.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("total_value"))
  }

  /** 30-minute-gap sessions per user — the streaming twin of q15, via the
    * native `session_window` (which implements exactly the lag-gap semantics
    * of the batch query's window-function form).
    */
  def sessionValues(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("session_value"))
  }
}
