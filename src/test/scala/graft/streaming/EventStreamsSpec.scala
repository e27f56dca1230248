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

  test("streamingFunnel matches the batch funnel CTE, including late events") {
    implicit val sqlCtx = spark.sqlContext
    // u1: full funnel; u2: signup+click, purchase outside the 24h window;
    // u3: signup only; u4: click with no signup (never emitted);
    // u5: funnel whose LATE-arriving earlier signup changes t1 — the click
    //     at 01:00 is only in-window relative to the late 00:30 signup
    val batch1 = Seq(
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 05:00:00")),
      (1L, "purchase", ts("2024-01-01 06:00:00")),
      (2L, "signup", ts("2024-01-01 00:00:00")),
      (2L, "click", ts("2024-01-01 01:00:00")),
      (3L, "signup", ts("2024-01-01 02:00:00")),
      (4L, "click", ts("2024-01-01 02:00:00")),
      (5L, "click", ts("2024-01-01 01:00:00")),
      // sub-second boundaries: batch compares unix_timestamp (floored
      // seconds), so u6's click counts only via the next-second event and
      // u7's same-second click must NOT count at all
      (6L, "signup", ts("2024-01-01 00:00:00.2")),
      (6L, "click", ts("2024-01-01 00:00:00.7")),
      (6L, "click", ts("2024-01-01 00:00:01.1")),
      (7L, "signup", ts("2024-01-01 00:00:00.2")),
      (7L, "click", ts("2024-01-01 00:00:00.9")))
    val batch2 = Seq( // u5's signup arrives LATE but within the watermark delay
      (5L, "signup", ts("2024-01-01 00:30:00")),
      (2L, "purchase", ts("2024-01-03 09:00:00"))) // outside u2's 24h window
    val batch3 = Seq((99L, "signup", ts("2024-02-01 00:00:00")))
    val batch4 = Seq((99L, "noise", ts("2024-03-05 00:00:00")))
    val rows = batch1 ++ batch2 ++ batch3 ++ batch4

    val input = MemoryStream[(Long, String, Timestamp)]
    val events = input.toDF().toDF("user_id", "event_type", "ts")
    val query = EventStreams.streamingFunnel(events)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      for (b <- Seq(batch1, batch2, batch3, batch4)) {
        input.addData(b: _*)
        query.processAllAvailable() // each batch advances the watermark
      }

      val out = spark.table("funnel_out").collect()
        .map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Timestamp]("click_ts") != null), (r.getAs[Timestamp]("purchase_ts") != null)))
        .toMap
      // batch truth from the same rows via the q_funnel CTE shape
      val batch = rows.toDF("user_id", "event_type", "ts")
      batch.createOrReplaceTempView("funnel_events")
      val truth = spark.sql(
        """WITH s1 AS (SELECT user_id, min(unix_timestamp(ts)) AS t1 FROM funnel_events
          |            WHERE event_type = 'signup' GROUP BY user_id),
          |s2 AS (SELECT e.user_id, min(unix_timestamp(e.ts)) AS t2 FROM funnel_events e
          |       JOIN s1 ON e.user_id = s1.user_id
          |       WHERE e.event_type = 'click' AND unix_timestamp(e.ts) > s1.t1
          |         AND unix_timestamp(e.ts) <= s1.t1 + 86400 GROUP BY e.user_id),
          |s3 AS (SELECT e.user_id, min(unix_timestamp(e.ts)) AS t3 FROM funnel_events e
          |       JOIN s2 ON e.user_id = s2.user_id
          |       WHERE e.event_type = 'purchase' AND unix_timestamp(e.ts) > s2.t2
          |         AND unix_timestamp(e.ts) <= s2.t2 + 86400 GROUP BY e.user_id)
          |SELECT s1.user_id, s2.user_id IS NOT NULL AS clicked, s3.user_id IS NOT NULL AS purchased
          |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
          |        LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin)
        .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
      // streaming output covers exactly the batch signup users (99 included)
      assert(out.keySet == truth.keySet, s"out=${out.keySet} truth=${truth.keySet}")
      truth.foreach { case (uid, t) => assert(out(uid) == t, s"user $uid: ${out(uid)} vs $t") }
      assert(out(1L) == ((true, true)) && out(2L) == ((true, false)))
      assert(out(3L) == ((false, false)) && out(5L) == ((true, false)) && !out.contains(4L))
      assert(out(6L) == ((true, false)) && out(7L) == ((false, false)))
    } finally query.stop()
  }

  test("streamingSessionize: a late event before the session start lowers it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    val query = EventStreams.streamingSessionize(events, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_late_out")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 10:30:00")), (1L, ts("2024-01-01 10:45:00")))
      query.processAllAvailable() // watermark = 10:45 - 30m = 10:15
      // late but above the watermark, EARLIER than the session's start
      input.addData((1L, ts("2024-01-01 10:20:00")))
      query.processAllAvailable()
      input.addData((2L, ts("2024-01-01 18:00:00"))) // close user 1's session
      query.processAllAvailable()
      val u1 = spark.table("sess_late_out").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
      assert(u1.length == 1)
      // batch sessionize on the same three events: one session 10:20→10:45
      assert(u1.head.getAs[Timestamp]("session_start") == ts("2024-01-01 10:20:00"))
      assert(u1.head.getAs[Long]("n_events") == 3)
    } finally query.stop()
  }

  test("retentionCohorts: brute-force parity, index 0 equals cohort size, no window") {
    import spark.implicits._
    // user -> activity days (period = 1s so the fixture is readable)
    val rows = Seq(
      (1L, 10L), (1L, 10L), (1L, 12L),          // cohort 10, active 10 & 12
      (2L, 10L), (2L, 11L),                      // cohort 10, active 10 & 11
      (3L, 12L),                                 // cohort 12, only itself
      (4L, 11L), (4L, 13L), (4L, 13L))           // cohort 11, active 11 & 13
    val df = rows.map { case (u, t) =>
      (u, new java.sql.Timestamp(t * 1000L)) }.toDF("u", "ts").repartition(4)
    val got = EventStreams.retentionCohorts(df, "u", "ts", periodSeconds = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = Map(
      (10L, 0L) -> 2L, (10L, 1L) -> 1L, (10L, 2L) -> 1L,
      (11L, 0L) -> 1L, (11L, 2L) -> 1L,
      (12L, 0L) -> 1L)
    assert(got == want, got)
    // every cohort's index-0 count is its size (acquisition period)
    assert(got.filter(_._1._2 == 0L).values.sum == 4L)
    // nulls dropped
    val withNull = df.union(Seq((null.asInstanceOf[java.lang.Long], new java.sql.Timestamp(0L)))
      .toDF("u", "ts").select(col("u").cast("long"), col("ts")))
    assert(EventStreams.retentionCohorts(withNull, "u", "ts", 1L)
      .agg(org.apache.spark.sql.functions.sum("active_users")).head.getLong(0) == 7L)
    // no WindowExec — the first-event lookup is a groupBy + join
    val plan = EventStreams.retentionCohorts(df, "u", "ts", 1L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    intercept[IllegalArgumentException] {
      EventStreams.retentionCohorts(df, "u", "ts", 0L)
    }
  }

  test("streamingRetention emits the batch matrix as the watermark finalizes periods") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    // periods = minutes; 2-minute watermark so an out-of-order earlier
    // event can still correct a cohort across batches
    val query = EventStreams.streamingRetention(events,
        watermarkDelay = "2 minutes", periodSeconds = 60L)
      .writeStream.format("memory").queryName("ret_stream")
      .outputMode("append").start()
    def t(min: Long, s: Long = 0) = new Timestamp((min * 60 + s) * 1000L)
    try {
      input.addData((1L, t(0)), (2L, t(0, 30)), (1L, t(0, 45)))
      query.processAllAvailable()
      // u4 arrives OUT OF ORDER: period 3 first...
      input.addData((4L, t(3)))
      query.processAllAvailable()
      // ...then its true first event (period 1, still inside the 2-min
      // horizon) — the cohort must correct to 1 before anything emits
      input.addData((2L, t(1, 20)), (4L, t(1, 10)))
      query.processAllAvailable()
      input.addData((1L, t(2)), (3L, t(2, 5)))
      query.processAllAvailable()
      // sentinels push the watermark: finalize periods 0..3, then 10
      input.addData((99L, t(10)))
      query.processAllAvailable()
      input.addData((99L, t(20)))
      query.processAllAvailable()
      input.addData((99L, t(40)))
      query.processAllAvailable()
      val got = spark.table("ret_stream")
        .groupBy("cohort", "period_index").count()
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = Map(
        (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 1L, // u1, u2 cohort 0
        (1L, 0L) -> 1L, (1L, 2L) -> 1L,                 // u4: corrected cohort
        (2L, 0L) -> 1L,                                 // u3
        (10L, 0L) -> 1L, (10L, 10L) -> 1L)              // sentinel's periods
      assert(got == want, got)
      // exactly-once: no (user, period) emitted twice
      assert(spark.table("ret_stream").count() == want.values.sum)
      // one-definition parity: the batch matrix over the real users is
      // the same map (minus the sentinel rows the stream hasn't
      // finalized past period 10)
      val realEvents = Seq((1L, t(0)), (2L, t(0, 30)), (1L, t(0, 45)),
        (4L, t(3)), (2L, t(1, 20)), (4L, t(1, 10)), (1L, t(2)), (3L, t(2, 5)))
        .toDF("user_id", "ts")
      val batch = EventStreams.retentionCohorts(realEvents, "user_id", "ts", 60L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(batch == want - ((10L, 0L)) - ((10L, 10L)), batch)
    } finally query.stop()
  }

  test("streamingRetention drops late-beyond-watermark data, matching the batch matrix minus it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    val query = EventStreams.streamingRetention(events,
        watermarkDelay = "2 minutes", periodSeconds = 60L)
      .writeStream.format("memory").queryName("ret_late")
      .outputMode("append").start()
    def t(min: Long, s: Long = 0) = new Timestamp((min * 60 + s) * 1000L)
    try {
      // t(0, 5), not t(0): an event at exactly epoch 0 equals the
      // initial watermark and the late filter's boundary drops it
      input.addData((1L, t(0, 5)), (1L, t(1)), (2L, t(1, 30)))
      query.processAllAvailable()
      // push the watermark to min 8 (10 - 2 delay)
      input.addData((99L, t(10)))
      query.processAllAvailable()
      // LATE beyond the watermark: u1's period-2 return and a brand-new
      // user u7 whose only event is below the watermark — both must be
      // dropped before state (u7 must never appear in ANY cohort)
      input.addData((1L, t(2, 5)), (7L, t(3)))
      query.processAllAvailable()
      // finalize everything through the sentinel's period
      input.addData((99L, t(20)))
      query.processAllAvailable()
      input.addData((99L, t(40)))
      query.processAllAvailable()
      val got = spark.table("ret_late")
        .groupBy("cohort", "period_index").count()
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // batch parity over the events WITHOUT the dropped pair
      // (the final t(40) sentinel event is excluded too: its period is
      // still open when the query stops)
      val kept = Seq((1L, t(0, 5)), (1L, t(1)), (2L, t(1, 30)),
        (99L, t(10)), (99L, t(20)))
        .toDF("user_id", "ts")
      val batch = EventStreams.retentionCohorts(kept, "user_id", "ts", 60L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == batch, s"got $got batch $batch")
      assert(!got.keySet.exists(_._1 == 3L), "dropped user u7 leaked a cohort")
    } finally query.stop()
  }

  test("streamingRetention timeout-flushes several open periods across cohorts at once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    // 10-minute delay: the first batch's own max event time must not
    // advance the watermark past any open boundary
    val query = EventStreams.streamingRetention(events,
        watermarkDelay = "10 minutes", periodSeconds = 60L)
      .writeStream.format("memory").queryName("ret_flush")
      .outputMode("append").start()
    def t(min: Long, s: Long = 0) = new Timestamp((min * 60 + s) * 1000L)
    try {
      // u1: cohort 0 with FOUR open periods; u2: cohort 5 with two —
      // all buffered while the watermark sits at 0
      input.addData((1L, t(0, 5)), (1L, t(1)), (1L, t(2)), (1L, t(3)),
        (2L, t(5)), (2L, t(6)))
      query.processAllAvailable()
      assert(spark.table("ret_flush").count() == 0L) // nothing final yet
      // ONE watermark jump past every open boundary: the quiescent users
      // get no further events; the EventTimeTimeout must re-invoke their
      // groups and flush all six periods in this trigger
      input.addData((99L, t(30)))
      query.processAllAvailable()
      val got = spark.table("ret_flush")
        .groupBy("cohort", "period_index").count()
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = Map(
        (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 2L) -> 1L, (0L, 3L) -> 1L,
        (5L, 0L) -> 1L, (5L, 1L) -> 1L)
      assert(got == want, s"got $got")
      // exactly-once across the flush
      assert(spark.table("ret_flush").count() == want.values.sum)
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

  test("streamingAsofJoin: finalize on watermark, honor out-of-order rights") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, Timestamp, Long)]
    val rIn = MemoryStream[(Long, Timestamp, Double)]
    val joined = EventStreams.streamingAsofJoin(
      lIn.toDF().toDF("key", "ts", "left_id"),
      rIn.toDF().toDF("key", "ts", "value"),
      toleranceMs = Some(3600000L), watermarkDelay = "10 minutes")
    val query = joined.writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    def rows = spark.table("asof_out")
      .selectExpr("key", "left_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    try {
      rIn.addData((1L, ts("2024-01-01 09:00:00"), 2.0),
        (1L, ts("2024-01-01 09:10:00"), 1.0),
        (2L, ts("2024-01-01 08:00:00"), 5.0))
      lIn.addData((1L, ts("2024-01-01 10:00:00"), 100L),
        (2L, ts("2024-01-01 10:00:00"), 200L))
      query.processAllAvailable()
      // watermark is 09:50 — nothing finalized yet
      assert(rows.isEmpty)
      // a right BELOW the left's time arrives after the left (out of
      // order but above the watermark): it must win the match
      rIn.addData((1L, ts("2024-01-01 09:55:00"), 7.0))
      query.processAllAvailable()
      // advance the watermark on BOTH inputs: the query watermark is the
      // MIN across watermarked sources
      rIn.addData((99L, ts("2024-01-01 12:00:00"), 0.0))
      lIn.addData((99L, ts("2024-01-01 12:00:00"), 0L))
      query.processAllAvailable()
      assert(rows === Set(
        (1L, 100L, Some(7.0)),   // newest right ≤ 10:00 is 09:55
        (2L, 200L, None)))       // 08:00 right is outside the 1 h tolerance
    } finally query.stop()
  }

  test("streamingAsofJoin watermark boundary: same-batch exact-time right " +
      "matches, a same-time right in a LATER batch is late-dropped") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, Timestamp, Long)]
    val rIn = MemoryStream[(Long, Timestamp, Double)]
    val joined = EventStreams.streamingAsofJoin(
      lIn.toDF().toDF("key", "ts", "left_id"),
      rIn.toDF().toDF("key", "ts", "value"),
      watermarkDelay = "10 minutes")
    val query = joined.writeStream.format("memory").queryName("asof_edge")
      .outputMode("append").start()
    try {
      // batch 1: two lefts at 10:00; key 1's exact-time right arrives IN
      // THE SAME BATCH; heartbeats pin the watermark to exactly 10:00
      lIn.addData((1L, ts("2024-01-01 10:00:00"), 7L),
        (2L, ts("2024-01-01 10:00:00"), 8L),
        (99L, ts("2024-01-01 10:10:00"), 0L))
      rIn.addData((1L, ts("2024-01-01 10:00:00"), 8.0),
        (99L, ts("2024-01-01 10:10:00"), 0.0))
      query.processAllAvailable()
      // batch 2: key 2's same-time right NOW — with the watermark already
      // AT 10:00 Spark's late filter drops it (ms equality is late), so
      // the finalize-at-<= contract loses nothing by not waiting for it
      rIn.addData((2L, ts("2024-01-01 10:00:00"), 5.0),
        (99L, ts("2024-01-01 10:11:00"), 0.0))
      lIn.addData((99L, ts("2024-01-01 10:11:00"), 0L))
      query.processAllAvailable()
      val rows = spark.table("asof_edge").where("key IN (1, 2)")
        .selectExpr("left_id", "value").collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double])))
        .toSet
      assert(rows === Set((7L, Some(8.0)), (8L, None)))
    } finally query.stop()
  }

  test("streamingAsofJoin rejects mixed streaming/batch inputs") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, Timestamp, Long)]
    val batchRight = Seq((1L, ts("2024-01-01 10:00:00"), 1.0))
      .toDF("key", "ts", "value")
    val e = intercept[IllegalArgumentException] {
      EventStreams.streamingAsofJoin(
        lIn.toDF().toDF("key", "ts", "left_id"), batchRight)
    }
    assert(e.getMessage.contains("both inputs streaming"))
  }

  test("streamingAsofJoin matches the batch asofJoin on a randomized stream") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(23)
    def t(min: Int) = ts(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
    val lefts = (1 to 60).map(i =>
      (rnd.nextInt(5).toLong, t(rnd.nextInt(100)), i.toLong))
    val rights = (1 to 80).map(i =>
      (rnd.nextInt(5).toLong, t(rnd.nextInt(100)), rnd.nextInt(50).toDouble))
    val lIn = MemoryStream[(Long, Timestamp, Long)]
    val rIn = MemoryStream[(Long, Timestamp, Double)]
    val joined = EventStreams.streamingAsofJoin(
      lIn.toDF().toDF("key", "ts", "left_id"),
      rIn.toDF().toDF("key", "ts", "value"),
      toleranceMs = Some(1800000L), watermarkDelay = "5 minutes")
    val query = joined.writeStream.format("memory").queryName("asof_par")
      .outputMode("append").start()
    try {
      lIn.addData(lefts: _*); rIn.addData(rights: _*)
      query.processAllAvailable()
      // flush: both inputs must advance for the min-watermark to move
      lIn.addData((999L, ts("2024-01-02 00:00:00"), 0L))
      rIn.addData((999L, ts("2024-01-02 00:00:00"), 0.0))
      query.processAllAvailable()
      val got = spark.table("asof_par").where("key <> 999")
        .selectExpr("key", "left_id", "right_ts", "value").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
      val want = EventStreams.streamingAsofJoin(
        lefts.toDF("key", "ts", "left_id"), rights.toDF("key", "ts", "value"),
        toleranceMs = Some(1800000L))
        .collect().map(e => (e.key, e.left_id,
          e.right_ts.map(x => x: Any), e.value)).toSet
      assert(got === want)
    } finally query.stop()
  }

  test("streamingAsofJoin batch delegation matches hand-computed enrichment") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 08:00:00"), 101L)).toDF("key", "ts", "left_id")
    val r = Seq((1L, ts("2024-01-01 09:30:00"), 4.0),
      (1L, ts("2024-01-01 09:30:00"), 9.0)). // equal time: larger value wins
      toDF("key", "ts", "value")
    val out = EventStreams.streamingAsofJoin(l, r).collect()
      .map(e => e.left_id -> e.value).toMap
    assert(out === Map(100L -> Some(9.0), 101L -> None))
  }

  test("sketch aggregates run under streaming groupBy (update mode)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String)] // (group, item)
    val agg = in.toDF().toDF("g", "x").groupBy("g")
      .agg(call_function("kmv_distinct",
          call_function("word_window_hashes", array(col("x")), lit(1))(0), lit(64))
        .as("nd"),
        call_function("cms_sketch", col("x"), lit(2), lit(32)).as("sk"))
      .select(col("g"), col("nd"),
        expr("aggregate(sk, 0L, (a, b) -> a + b)").as("mass"))
    val query = agg.writeStream.format("memory").queryName("sketch_out")
      .outputMode("update").start()
    try {
      in.addData(("a", "x1"), ("a", "x2"), ("a", "x1"), ("b", "y1"))
      query.processAllAvailable()
      in.addData(("a", "x3")) // state must carry across micro-batches
      query.processAllAvailable()
      val out = spark.table("sketch_out")
        .groupBy("g").agg(max("nd").as("nd"), max("mass").as("mass"))
        .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
      // kmv: exact distinct below k; cms mass: depth 2 → 2 per non-null row
      assert(out === Map("a" -> ((3.0, 8L)), "b" -> ((1.0, 2L))))
    } finally query.stop()
  }

  test("hll_sketch runs under streaming groupBy and equals the batch registers") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val agg = in.toDF().toDF("g", "x").groupBy("g")
      .agg(call_function("hll_sketch",
        call_function("word_window_hashes", array(col("x")), lit(1))(0), lit(4))
        .as("regs"))
    val query = agg.writeStream.format("memory").queryName("hll_out")
      .outputMode("update").start()
    try {
      val rows = (1 to 40).map(i => ("a", s"w${i % 25}")) :+ (("b", "solo"))
      in.addData(rows.take(20): _*)
      query.processAllAvailable()
      in.addData(rows.drop(20): _*) // registers must merge across batches
      query.processAllAvailable()
      // latest update row per group equals the one-shot batch aggregation
      val want = rows.toDF("g", "x").groupBy("g")
        .agg(call_function("hll_sketch",
          call_function("word_window_hashes", array(col("x")), lit(1))(0), lit(4))
          .as("regs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
      val outRows = spark.table("hll_out").collect()
        .map(r => r.getString(0) -> r.getSeq[Int](1))
      // update mode re-emits per batch in no guaranteed order; registers
      // only grow (element-wise max merge), so the element-wise max of
      // the emitted rows IS the final state
      val got = outRows.groupBy(_._1).map { case (g, vs) =>
        g -> vs.map(_._2).reduce((p, q) => p.zip(q).map(t => t._1 max t._2))
      }
      assert(got.keySet === want.keySet)
      assert(got("a").toSeq === want("a").toSeq)
      assert(got("b").toSeq === want("b").toSeq)
    } finally query.stop()
  }

  private def intervalFixture = {
    val purchases = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")),
      (101L, 1L, ts("2024-01-01 12:00:00")),
      (102L, 2L, ts("2024-01-01 10:30:00")))
    val clicks = Seq(
      (1L, ts("2024-01-01 09:10:00"), 1.0), // within 1 h of p100
      (1L, ts("2024-01-01 09:00:00"), 2.0), // exactly -3600 s: inclusive
      (1L, ts("2024-01-01 08:59:59"), 4.0), // just outside
      (1L, ts("2024-01-01 10:00:00"), 8.0), // exact time match
      (2L, ts("2024-01-01 10:29:00"), 16.0),
      (3L, ts("2024-01-01 10:00:00"), 32.0)) // key with no purchases
    (purchases, clicks)
  }

  test("intervalJoin on streams matches the batch join as watermarks advance") {
    implicit val sqlCtx = spark.sqlContext
    val (purchases, clicks) = intervalFixture
    val pIn = MemoryStream[(Long, Long, Timestamp)]
    val cIn = MemoryStream[(Long, Timestamp, Double)]
    val joined = EventStreams.intervalJoin(
      pIn.toDF().toDF("pid", "pu", "pts"), "pts",
      cIn.toDF().toDF("cu", "cts", "cv"), "cts",
      Seq("pu" -> "cu"), beforeSec = 3600, afterSec = 0, watermark = "10 minutes")
    val query = joined.select("pid", "cv")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      pIn.addData(purchases: _*)
      cIn.addData(clicks: _*)
      query.processAllAvailable()
      // advance both watermarks far past every window so all pairs emit
      pIn.addData((999L, 99L, ts("2024-01-02 00:00:00")))
      cIn.addData((99L, ts("2024-01-02 00:00:00"), 0.0))
      query.processAllAvailable()
      val got = spark.table("ij_out").as[(Long, Double)].collect().toSet
      val want = Set((100L, 1.0), (100L, 2.0), (100L, 8.0), (102L, 16.0),
        (999L, 0.0))
      assert(got === want)
    } finally query.stop()
  }

  test("intervalJoin batch parity: one definition, same pairs") {
    val (purchases, clicks) = intervalFixture
    val got = EventStreams.intervalJoin(
      purchases.toDF("pid", "pu", "pts"), "pts",
      clicks.toDF("cu", "cts", "cv"), "cts",
      Seq("pu" -> "cu"), beforeSec = 3600, afterSec = 0)
      .select("pid", "cv").as[(Long, Double)].collect().toSet
    assert(got === Set((100L, 1.0), (100L, 2.0), (100L, 8.0), (102L, 16.0)))
    // forward window picks up later clicks instead
    val fwd = EventStreams.intervalJoin(
      purchases.toDF("pid", "pu", "pts"), "pts",
      clicks.toDF("cu", "cts", "cv"), "cts",
      Seq("pu" -> "cu"), beforeSec = 0, afterSec = 7200)
      .select("pid", "cv").as[(Long, Double)].collect().toSet
    assert(fwd === Set((100L, 8.0)))
    intercept[IllegalArgumentException] {
      EventStreams.intervalJoin(purchases.toDF("pid", "pu", "pts"), "pts",
        clicks.toDF("cu", "cts", "cv"), "cts", Nil, 1, 1)
    }
  }

  test("streamingGapFill emits the batch grid as the watermark finalizes bins") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val obs = input.toDF().toDF("k", "ts", "v")
    // 60 s bins, 2-minute watermark so an out-of-order earlier bin can
    // still land before its successors finalize
    val query = EventStreams.streamingGapFill(obs, stepSeconds = 60L,
        watermarkDelay = "2 minutes")
      .writeStream.format("memory").queryName("gap_stream")
      .outputMode("append").start()
    // base shifted off epoch 0: the initial watermark is 0 and the
    // stateful operator drops rows at-or-below it, so a ts of exactly
    // 1970-01-01T00:00:00 never reaches the state function
    val B = 60L
    def t(min: Long, s: Long = 0) = new Timestamp(((B + min) * 60 + s) * 1000L)
    try {
      // a's bin 3 arrives BEFORE its bin 1 (out of order, within horizon)
      input.addData(("a", t(0), 1.0), ("a", t(3), 2.0), ("b", t(2), 9.0))
      query.processAllAvailable()
      input.addData(("a", t(1, 30), 1.5))
      query.processAllAvailable()
      // duplicate observation in a's bin 1: max wins (1.5 > 0.5)
      input.addData(("a", t(1, 10), 0.5))
      query.processAllAvailable()
      // sentinel key pushes the global watermark past every real bin;
      // repeated triggers let the event-time timers flush quiescent keys
      input.addData(("z", t(30), 0.0))
      query.processAllAvailable()
      input.addData(("z", t(60), 0.0))
      query.processAllAvailable()
      input.addData(("z", t(90), 0.0))
      query.processAllAvailable()

      val got = spark.table("gap_stream")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val real = got.filterNot(_._1 == "z")
      val want = Set(
        ("a", B + 0, B + 0, 1.0), ("a", B + 1, B + 1, 1.5),
        ("a", B + 2, B + 1, 1.5), ("a", B + 3, B + 3, 2.0),
        ("b", B + 2, B + 2, 9.0))
      assert(real === want, real)
      // exactly-once: no (k, t) row twice
      val all = spark.table("gap_stream").count()
      assert(all == spark.table("gap_stream").select("k", "t").distinct().count())

      // one-definition parity: batch gapFill over the same finalized
      // observations (binned, duplicate combined by max) gives the same rows
      val batchObs = Seq(("a", B + 0, 1.0), ("a", B + 1, 1.5), ("a", B + 3, 2.0),
        ("b", B + 2, 9.0)).toDF("k", "t", "v")
      val batch = graft.operators.Temporal.gapFill(batchObs, Seq("k"), "t", 1L, Seq("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(batch === want, batch)
    } finally query.stop()
  }

  test("streamingGapFill: late-beyond-watermark bins never re-emit, fills stay monotone") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val query = EventStreams.streamingGapFill(
        input.toDF().toDF("k", "ts", "v"), stepSeconds = 60L,
        watermarkDelay = "1 minutes")
      .writeStream.format("memory").queryName("gap_late")
      .outputMode("append").start()
    val B = 60L // off epoch 0, same reason as above
    def t(min: Long, s: Long = 0) = new Timestamp(((B + min) * 60 + s) * 1000L)
    try {
      input.addData(("a", t(0), 1.0))
      query.processAllAvailable()
      input.addData(("a", t(5), 6.0)) // wm -> minute 4: bins 0..3 finalizable
      query.processAllAvailable()
      input.addData(("a", t(10), 11.0)) // wm -> 9: bin 5 finalizes, fills 6..8 open
      query.processAllAvailable()
      // a DEAD-LATE event for bin 2 (wm is far past): must not re-emit
      // or fork the already-emitted fill at bin 2
      input.addData(("a", t(2), 99.0))
      query.processAllAvailable()
      input.addData(("a", t(20), 0.0)) // finalize through bin 10
      query.processAllAvailable()
      input.addData(("a", t(40), 0.0))
      query.processAllAvailable()
      val got = spark.table("gap_late")
        .collect().map(r => (r.getLong(1) - B, r.getLong(2) - B, r.getDouble(3))).toSet
      val bins0to10 = Set(
        (0L, 0L, 1.0), (1L, 0L, 1.0), (2L, 0L, 1.0), (3L, 0L, 1.0), (4L, 0L, 1.0),
        (5L, 5L, 6.0), (6L, 5L, 6.0), (7L, 5L, 6.0), (8L, 5L, 6.0), (9L, 5L, 6.0),
        (10L, 10L, 11.0))
      assert(got.filter(_._1 <= 10L) === bins0to10, got)
      assert(spark.table("gap_late").select("t").distinct().count()
        == spark.table("gap_late").count())
    } finally query.stop()
  }
}
