package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{window => timeWindow, _}

/** Structured Streaming events pipeline (SURVEY.md §2 #33): the
  * streaming twin of `q14_time_window_agg`.
  *
  * `readStream` → event-time watermark → tumbling-window aggregate.
  * The watermark bounds state: late events beyond it are dropped and
  * closed windows are evicted, so state size is O(active windows ×
  * event types) regardless of stream length — the property that keeps
  * this runnable forever on a cluster.
  */
object EventStream {

  /** Windowed counts/sums per event type. Works on both streaming and
    * batch DataFrames with schema (ts timestamp, event_type string,
    * value double) — the batch plan is exactly `q14_time_window_agg`. */
  def windowedAgg(events: DataFrame, watermark: String = "2 hours",
                  windowLen: String = "1 hour"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(timeWindow(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("w.start").as("hour_ts"), col("event_type"),
              col("n_events"), col("total_value"))
  }

  /** Per-user running conversion counts via arbitrary stateful
    * processing would use `mapGroupsWithState`; the windowed-agg path
    * above covers the reference's scheduled-batch semantics. */
}
