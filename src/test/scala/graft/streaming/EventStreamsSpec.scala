package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class EventStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedStats over a real stream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long, Double)]
    val events = input.toDF().toDF("ts", "event_type", "user_id", "value")

    val query = EventStreams.windowedStats(events, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 00:10:00"), "click", 1L, 1.0),
        (ts("2024-01-01 00:20:00"), "click", 2L, 2.0),
        (ts("2024-01-01 01:10:00"), "view", 1L, 3.0))
      query.processAllAvailable()
      val out = spark.table("win_out").collect()
      assert(out.length == 2)
      val click = out.find(_.getAs[String]("event_type") == "click").get
      assert(click.getAs[Long]("n_events") == 2)
      assert(click.getAs[Double]("sum_value") == 3.0)
    } finally query.stop()
  }

  test("windowedStats batch parity: same code runs on a batch frame") {
    val batch = Seq(
      (ts("2024-01-01 00:10:00"), "click", 1L, 1.0),
      (ts("2024-01-01 00:50:00"), "click", 1L, 1.0))
      .toDF("ts", "event_type", "user_id", "value")
    val out = EventStreams.windowedStats(batch).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_events") == 2)
  }

  test("streamingSessionize emits closed sessions as the watermark advances") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    val query = EventStreams.streamingSessionize(events, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:10:00")))
      query.processAllAvailable()
      // push the watermark far past the session gap → session 1 closes
      input.addData((2L, ts("2024-01-01 06:00:00")))
      query.processAllAvailable()
      input.addData((2L, ts("2024-01-01 12:00:00")))
      query.processAllAvailable()
      val out = spark.table("sess_out").collect()
      val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
      assert(u1.length == 1)
      assert(u1.head.getAs[Long]("n_events") == 2)
      assert(u1.head.getAs[Timestamp]("session_end") == ts("2024-01-01 00:10:00"))
    } finally query.stop()
  }

  test("sessionize splits on gaps") {
    val batch = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:10:00")), // same session (10 min gap)
      (1L, ts("2024-01-01 01:00:00")), // new session (50 min gap)
      (2L, ts("2024-01-01 00:00:00")))
      .toDF("user_id", "ts")
    val out = EventStreams.sessionize(batch, gapMinutes = 30)
      .groupBy("user_id").agg(max("session_seq").as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }
}
