package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming event analytics. The same transformations run in
  * batch mode (watermark is a no-op there), so the batch parity query in
  * SparkEntry and the streaming pipeline share one definition. */
object EventStreams {

  /** Tumbling-window per-event-type stats. On a stream: watermarked state,
    * append-mode compatible. On a batch frame: a plain windowed aggregate. */
  def windowedStats(events: DataFrame,
                    windowLength: String = "1 hour",
                    watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           round(sum("value"), 3).as("sum_value"),
           approx_count_distinct("user_id").as("approx_users"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("approx_users"))
  }

  /** Sessionize: per-user session ids from gaps > `gapMinutes` (batch
    * analytics variant using a window function; streaming variant would use
    * flatMapGroupsWithState — the gap logic is identical). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("new_session").over(byUser))
      .drop("prev_ts", "new_session")
  }
}
