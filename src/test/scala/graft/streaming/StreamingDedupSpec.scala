package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming dedup emits only first occurrence across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val query = StreamingDedup.firstOccurrences(docs, "doc_id", "text", "ts")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "alpha", ts("2024-01-01 00:00:00")),
        (2L, "beta", ts("2024-01-01 00:01:00")),
        (3L, "alpha", ts("2024-01-01 00:02:00")))
      query.processAllAvailable()
      input.addData(
        (4L, "alpha", ts("2024-01-01 00:03:00")), // dup from an earlier batch
        (5L, "gamma", ts("2024-01-01 00:04:00")))
      query.processAllAvailable()
      val out = spark.table("dedup_out").collect()
        .map(_.getAs[Long]("id")).sorted.toSeq
      assert(out == Seq(1L, 2L, 5L)) // 3 and 4 are duplicates of 1
    } finally query.stop()
  }

  test("null text/id rows are dropped, not fatal (and don't dedupe each other)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.lang.Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val query = StreamingDedup.firstOccurrences(docs, "doc_id", "text", "ts")
      .writeStream.format("memory").queryName("dedup_null_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "alpha", ts("2024-01-01 00:00:00")),
        (2L, null, ts("2024-01-01 00:01:00")),   // null text: dropped
        (null, "beta", ts("2024-01-01 00:02:00")), // null id: dropped
        (3L, null, ts("2024-01-01 00:03:00")),   // second null text
        (4L, "beta", ts("2024-01-01 00:04:00")))
      query.processAllAvailable() // would throw before the null guard
      val out = spark.table("dedup_null_out").collect()
        .map(_.getAs[Long]("id")).sorted.toSeq
      assert(out == Seq(1L, 4L))
    } finally query.stop()
  }

  test("streaming near-dup dedup collapses small-edit variants by fingerprint") {
    import org.apache.spark.unsafe.types.UTF8String
    val base = "the quick brown fox jumps over the lazy dog and keeps on running"
    val edited = base + " tail" // suffix edit away from the minimal window
    val other = "completely different content with no shared windows at all here"
    // precondition the heuristic rests on (deterministic for these strings):
    // the suffix edit preserves the winnowing fingerprint, the unrelated
    // text does not share it
    def fp(s: String) =
      graft.functions.TextOps.rollingFingerprint(UTF8String.fromString(s), 16).toString
    assert(fp(base) == fp(edited))
    assert(fp(base) != fp(other))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val query = StreamingDedup.firstOccurrencesNearDup(docs, "doc_id", "text", "ts")
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, base, ts("2024-01-01 00:00:00")),
        (2L, other, ts("2024-01-01 00:01:00")))
      query.processAllAvailable()
      input.addData((3L, edited, ts("2024-01-01 00:02:00"))) // near-dup of 1
      query.processAllAvailable()
      val out = spark.table("neardup_out").collect()
        .map(_.getAs[Long]("id")).sorted.toSeq
      assert(out == Seq(1L, 2L))
    } finally query.stop()
  }

  test("dropSeenStream admits only texts unseen in the frozen corpus") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((100L, "alpha"), (101L, "beta"), (102L, "gamma"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    // a saturated filter (4 items at 40% fpp would be honest too — use
    // defaults here; the batch operator's spec covers fp saturation)
    val query = StreamingDedup.dropSeenStream(docs, corpus, "text")
      .writeStream.format("memory").queryName("dropseen_out")
      .outputMode("append").start()
    try {
      input.addData((1L, "alpha"), (2L, "delta"))
      query.processAllAvailable()
      input.addData((3L, "beta"), (4L, "epsilon"), (5L, "delta"))
      query.processAllAvailable()
      val out = spark.table("dropseen_out").collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq
      // corpus texts refused in every batch; unseen admitted — note 5
      // passes too: membership is against the FROZEN set only (stateless;
      // compose with firstOccurrences for stream-internal dedup)
      assert(out == Seq(2L, 4L, 5L))
      // schema passes through
      assert(spark.table("dropseen_out").columns.toSeq == Seq("doc_id", "text"))
    } finally { query.stop(); graft.operators.Dedup.releaseCaches() }
  }

  test("dropSeenStream rejects a static incoming or streaming corpus") {
    implicit val sqlCtx = spark.sqlContext
    val static = Seq((1L, "a")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      StreamingDedup.dropSeenStream(static, static, "text")
    }
    intercept[IllegalArgumentException] {
      StreamingDedup.dropSeenStream(stream, stream, "text")
    }
  }
}
