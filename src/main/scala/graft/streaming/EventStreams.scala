package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

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

  case class SessionEvent(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  /** True streaming sessionization: per-user custom state via
    * flatMapGroupsWithState with event-time timeout. A session closes (and
    * is emitted, append-mode) when the watermark passes its last event +
    * gap. State per user is 3 longs — bounded regardless of stream length. */
  def streamingSessionize(events: DataFrame, gapMinutes: Int = 30): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    events.selectExpr("user_id", "ts").as[SessionEvent]
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, events: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          def emit(s: SessionState): Session =
            Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
          if (state.hasTimedOut) {
            val out = state.getOption.map(emit).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = events.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= emit(s)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Sessionize: per-user session ids from gaps > `gapMinutes` (batch
    * analytics variant using a window function; the streaming variant above
    * uses identical gap logic). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 orderCols: Seq[String] = Seq("ts")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // secondary order columns (e.g. an event id) make lag() deterministic
    // when timestamps tie
    val byUser = Window.partitionBy("user_id").orderBy(orderCols.map(col): _*)
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
