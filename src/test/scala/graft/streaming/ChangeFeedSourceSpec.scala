package graft.streaming

import graft.SparkTestBase

import java.nio.file.Files

/** The streaming changefeed source: tailing an [[UpsertSink]] store as
  * a Structured Streaming relation, offsets = the store's committed
  * batch ids. */
class ChangeFeedSourceSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 8

  private def tmp(): String =
    Files.createTempDirectory("graft-cf").toString

  private def apply(path: String, rows: Seq[(Long, Long, String, String)],
                    id: Long): Boolean =
    UpsertSink.applyBatch(spark, path, "id", "seq", "op", Seq("v"), B)(
      rows.toDF("id", "seq", "op", "v"), id)

  private def feed(path: String, extra: (String, String)*) =
    extra.foldLeft(
      spark.readStream.format("graft-changefeed").option("path", path)) {
        case (r, (k, v)) => r.option(k, v)
      }.load()

  test("earliest: the initial snapshot streams as inserts, then the " +
      "tail delivers each commit's pruned diff") {
    val path = tmp()
    assert(apply(path, Seq((1L, 1L, "I", "a"), (2L, 1L, "I", "b")), 0))
    val q = feed(path, "startingVersion" -> "earliest")
      .writeStream.format("memory").queryName("cf_earliest")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def rows() = spark.table("cf_earliest")
        .as[(Long, String, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(rows() === Seq((1L, "insert", "a"), (2L, "insert", "b")))
      // two more commits: an update+insert, then a delete
      assert(apply(path, Seq((1L, 2L, "U", "a2"), (3L, 1L, "I", "c")), 1))
      q.processAllAvailable()
      assert(rows() === Seq((1L, "insert", "a"), (1L, "update", "a2"),
        (2L, "insert", "b"), (3L, "insert", "c")))
      assert(apply(path, Seq((2L, 3L, "D", null)), 2))
      q.processAllAvailable()
      assert(rows().contains((2L, "delete", null)))
      assert(rows().size == 5)
    } finally q.stop()
  }

  test("default tail mode: only changes committed AFTER the stream " +
      "starts flow; the opening head->head batch is empty") {
    val path = tmp()
    assert(apply(path, (1L to 20L).map(i => (i, 1L, "I", s"v$i")), 0))
    val q = feed(path)
      .writeStream.format("memory").queryName("cf_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cf_tail").count() == 0) // snapshot NOT replayed
      assert(apply(path, Seq((7L, 2L, "U", "V7")), 1))
      q.processAllAvailable()
      assert(spark.table("cf_tail").as[(Long, String, String)].collect()
        .toSeq === Seq((7L, "update", "V7")))
    } finally q.stop()
  }

  test("startingVersion = n: the first batch carries the changes since " +
      "version n (exclusive)") {
    val path = tmp()
    assert(apply(path, Seq((1L, 1L, "I", "a")), 0))
    assert(apply(path, Seq((2L, 2L, "I", "b")), 1))
    assert(apply(path, Seq((1L, 3L, "U", "a3")), 2))
    val q = feed(path, "startingVersion" -> "0")
      .writeStream.format("memory").queryName("cf_from0")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cf_from0").as[(Long, String, String)].collect()
        .sortBy(_._1).toSeq ===
        Seq((1L, "update", "a3"), (2L, "insert", "b")))
    } finally q.stop()
  }

  test("restart from checkpoint resumes at the stored offset: downtime " +
      "commits flow once, nothing replays") {
    val path = tmp()
    val ckpt = tmp()
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String)]()
    def start() = feed(path, "startingVersion" -> "earliest")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.as[(Long, String, String)].collect().foreach(got.add)
      }.start()
    assert(apply(path, Seq((1L, 1L, "I", "a")), 0))
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(got.size() == 1)
    // two commits while the stream is DOWN
    assert(apply(path, Seq((2L, 2L, "I", "b")), 1))
    assert(apply(path, Seq((2L, 3L, "U", "b2"), (3L, 3L, "I", "c")), 2))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    import scala.jdk.CollectionConverters._
    val rows = got.asScala.toSeq.sortBy(r => (r._1, r._2))
    // the gap delivered as ONE composed diff (key 2's two hops collapse),
    // the pre-restart insert NOT replayed twice
    assert(rows === Seq((1L, "insert", "a"), (2L, "insert", "b2"),
      (3L, "insert", "c")), rows)
  }

  test("a missing path option or an absent store fails loudly at start") {
    val e1 = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-changefeed").load()
        .writeStream.format("memory").queryName("cf_nopath").start()
    }
    assert(e1.getMessage.contains("path"))
    val e2 = intercept[Exception] {
      val q = spark.readStream.format("graft-changefeed")
        .option("path", tmp() + "/nothing").load()
        .writeStream.format("memory").queryName("cf_nostore").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(e2.getMessage.contains("no snapshot") ||
      String.valueOf(e2.getCause).contains("no snapshot"))
  }

  test("preImages = true streams the four-type feed; a LIVE matview in " +
      "foreachBatch tracks recomputation across commits") {
    val path = tmp(); val view = tmp() + "/v"
    def applyG(rows: Seq[(Long, Long, String, String, Long)], id: Long) =
      UpsertSink.applyBatch(spark, path, "id", "seq", "op",
        Seq("grp", "x"), B)(rows.toDF("id", "seq", "op", "grp", "x"), id)
    assert(applyG(Seq((1L, 1L, "I", "a", 10L), (2L, 1L, "I", "b", 20L)), 0))
    val q = spark.readStream.format("graft-changefeed")
      .option("path", path).option("preImages", "true")
      .option("startingVersion", "earliest").load()
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        MatView.applyDelta(spark, view, "grp", Seq("x"), B)(df, id); () }
      .start()
    def viewRows() = UpsertSink.readSnapshot(spark, view)
      .select("grp", "cnt", "x").as[(String, Long, Long)]
      .collect().sorted.toSeq
    def recomputed() = UpsertSink.readSnapshot(spark, path)
      .groupBy("grp").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.sum("x").as("x"))
      .as[(String, Long, Long)].collect().sorted.toSeq
    try {
      q.processAllAvailable()
      assert(viewRows() === recomputed())
      // an update that MOVES groups plus a delete, live
      assert(applyG(Seq((1L, 2L, "U", "b", 11L), (2L, 2L, "D", null, 0L)), 1))
      q.processAllAvailable()
      assert(viewRows() === recomputed())
      assert(viewRows() === Seq(("b", 1L, 11L)))
    } finally q.stop()

    val e = intercept[Exception] {
      val bad = spark.readStream.format("graft-changefeed")
        .option("path", path).option("preImages", "maybe").load()
        .writeStream.format("memory").queryName("cf_badpre").start()
      try bad.processAllAvailable() finally bad.stop()
    }
    assert(e.getMessage.contains("preImages") ||
      String.valueOf(e.getCause).contains("preImages"))
  }
}
