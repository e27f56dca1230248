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
}
