package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Incremental materialized-view maintenance over the CDC surface:
  * pre-image feeds fold into a derived sink store whose content always
  * equals recomputation over the base snapshot. */
class MatViewSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 8

  private def tmp(): String =
    Files.createTempDirectory("graft-matview").toString

  private def applyBase(path: String,
                        rows: Seq[(Long, Long, String, String, Long)],
                        id: Long): Boolean =
    UpsertSink.applyBatch(spark, path, "id", "seq", "op",
      Seq("grp", "x"), B)(
      rows.toDF("id", "seq", "op", "grp", "x"), id)

  private def feedFor(base: String, from: Long, to: Long): DataFrame =
    UpsertSink.readChanges(spark, base, from, to, preImages = true)

  private def viewRows(view: String): Seq[(String, Long, Long)] =
    UpsertSink.readSnapshot(spark, view)
      .select("grp", "cnt", "x").as[(String, Long, Long)]
      .collect().sorted.toSeq

  private def recompute(base: String): Seq[(String, Long, Long)] =
    UpsertSink.readSnapshot(spark, base)
      .groupBy("grp").agg(count(lit(1)).as("cnt"), sum("x").as("x"))
      .as[(String, Long, Long)].collect().sorted.toSeq

  private def messages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x =>
      Option(x.getMessage).toSeq ++ messages(x.getCause))

  test("pre-image changefeed emits the four-type classification") {
    val base = tmp()
    assert(applyBase(base, Seq((1L, 1L, "I", "a", 10L),
      (2L, 1L, "I", "a", 20L), (3L, 1L, "I", "b", 30L)), 0))
    assert(applyBase(base, Seq((2L, 2L, "U", "a", 25L),
      (3L, 2L, "D", null, 0L), (4L, 2L, "I", "b", 40L)), 1))
    val feed = feedFor(base, 0, 1)
      .select("id", UpsertSink.ChangeTypeCol, "grp", "x")
      .as[(Long, String, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(feed.toSeq === Seq(
      (2L, "update_postimage", "a", 25L),
      (2L, "update_preimage", "a", 20L),
      (3L, "delete", "b", 30L), // pre-image payloads, not NULLs
      (4L, "insert", "b", 40L)))
    // the post-only default is unchanged: one update row, NULL deletes
    val postOnly = UpsertSink.readChanges(spark, base, 0, 1)
      .select("id", UpsertSink.ChangeTypeCol, "grp")
      .as[(Long, String, Option[String])].collect().sortBy(_._1)
    assert(postOnly.toSeq === Seq((2L, "update", Some("a")),
      (3L, "delete", None), (4L, "insert", Some("b"))))
  }

  test("view == recomputation across inserts, group moves, deletes, " +
      "and a group emptying out") {
    val base = tmp(); val view = tmp() + "/v"
    assert(applyBase(base, Seq((1L, 1L, "I", "a", 10L),
      (2L, 1L, "I", "a", 20L), (3L, 1L, "I", "b", 30L),
      (4L, 1L, "I", "c", 5L)), 0))
    assert(MatView.applyDelta(spark, view, "grp", Seq("x"), B)(
      feedFor(base, -1, 0), 0))
    assert(viewRows(view) === recompute(base))

    // batch 1: 2 MOVES a->b (both groups adjust), 4 deleted (group c
    // empties out of the view entirely), 5 inserts into a
    assert(applyBase(base, Seq((2L, 2L, "U", "b", 22L),
      (4L, 2L, "D", null, 0L), (5L, 2L, "I", "a", 50L)), 1))
    assert(MatView.applyDelta(spark, view, "grp", Seq("x"), B)(
      feedFor(base, 0, 1), 1))
    assert(viewRows(view) === recompute(base))
    assert(!viewRows(view).exists(_._1 == "c"))
    assert(viewRows(view) === Seq(("a", 2L, 60L), ("b", 2L, 52L)))

    // batch 2: value-only update (delta nets on x, not cnt)
    assert(applyBase(base, Seq((1L, 3L, "U", "a", 11L)), 2))
    assert(MatView.applyDelta(spark, view, "grp", Seq("x"), B)(
      feedFor(base, 1, 2), 2))
    assert(viewRows(view) === recompute(base))
  }

  test("replayed feed batches skip; post-only feeds and NULL groups refuse") {
    val base = tmp(); val view = tmp() + "/v"
    assert(applyBase(base, Seq((1L, 1L, "I", "a", 10L)), 0))
    assert(MatView.applyDelta(spark, view, "grp", Seq("x"), B)(
      feedFor(base, -1, 0), 0))
    val before = viewRows(view)
    // exactly-once: the same feed batch id replayed is a no-op
    assert(!MatView.applyDelta(spark, view, "grp", Seq("x"), B)(
      feedFor(base, -1, 0), 0))
    assert(viewRows(view) === before)
    // a post-only feed must refuse loudly (it cannot subtract)
    assert(applyBase(base, Seq((1L, 2L, "U", "a", 11L)), 1))
    val e = intercept[Exception] {
      MatView.applyDelta(spark, view, "grp", Seq("x"), B)(
        UpsertSink.readChanges(spark, base, 0, 1), 1)
    }
    assert(messages(e).exists(_.contains("post-only")))
    // NULL groups refuse before anything is written
    val e2 = intercept[IllegalArgumentException] {
      MatView.applyDelta(spark, view, "grp", Seq("x"), B)(
        Seq((9L, "insert", null.asInstanceOf[String], 1L))
          .toDF("id", UpsertSink.ChangeTypeCol, "grp", "x"), 1)
    }
    assert(e2.getMessage.contains("NULL group"))
    assert(viewRows(view) === before)
  }

  test("a feed that does not match the base history fails the negative-" +
      "count guard instead of persisting a wrong aggregate") {
    val base = tmp(); val view = tmp() + "/v"
    assert(applyBase(base, Seq((1L, 1L, "I", "a", 10L)), 0))
    assert(MatView.applyDelta(spark, view, "grp", Seq("x"), B)(
      feedFor(base, -1, 0), 0))
    // a fabricated feed deleting a row the view never counted
    val bogus = Seq((7L, "delete", "zzz", 1L), (8L, "delete", "zzz", 2L))
      .toDF("id", UpsertSink.ChangeTypeCol, "grp", "x")
    val e = intercept[Exception] {
      MatView.applyDelta(spark, view, "grp", Seq("x"), B)(bogus, 1)
    }
    assert(messages(e).exists(_.contains("negative")))
  }

  test("SQL sum parity on NULL addends: an all-NULL group sums NULL, and " +
      "deleting the last non-NULL contributor returns the group to NULL") {
    val base = tmp(); val view = tmp() + "/v"
    def applyN(rows: Seq[(Long, Long, String, String, java.lang.Long)],
               id: Long): Boolean =
      UpsertSink.applyBatch(spark, base, "id", "seq", "op",
        Seq("grp", "x"), B)(rows.toDF("id", "seq", "op", "grp", "x"), id)
    def stepParity(): Unit = {
      assert(MatView.catchUp(spark, base, view, "grp", Seq("x"), B) === 1)
      val got = MatView.readView(spark, view).select("grp", "cnt", "x")
        .as[(String, Long, Option[Long])].collect().sorted.toSeq
      val want = UpsertSink.readSnapshot(spark, base)
        .groupBy("grp").agg(count(lit(1)).as("cnt"), sum("x").as("x"))
        .as[(String, Long, Option[Long])].collect().sorted.toSeq
      assert(got === want)
    }
    // a group born with only a NULL addend
    assert(applyN(Seq((1L, 1L, "I", "a", null)), 0)); stepParity()
    assert(MatView.readView(spark, view).select("grp", "cnt", "x")
      .as[(String, Long, Option[Long])].head() === (("a", 1L, None)))
    // a non-NULL contributor arrives: the sum materializes
    assert(applyN(Seq((2L, 1L, "I", "a", 5L)), 1)); stepParity()
    // ... and leaves again: back to NULL, not 0
    assert(applyN(Seq((2L, 2L, "D", null, null)), 2)); stepParity()
    assert(MatView.readView(spark, view).select("grp", "cnt", "x")
      .as[(String, Long, Option[Long])].head() === (("a", 1L, None)))
  }

  test("multi-column groups key the view on a struct; flat columns read " +
      "back and composite moves adjust both tuples") {
    val base = tmp(); val view = tmp() + "/v"
    def applyBase2(rows: Seq[(Long, Long, String, String, Long, Long)],
                   id: Long): Boolean =
      UpsertSink.applyBatch(spark, base, "id", "seq", "op",
        Seq("g1", "g2", "x"), B)(
        rows.toDF("id", "seq", "op", "g1", "g2", "x"), id)
    def recompute2() = UpsertSink.readSnapshot(spark, base)
      .groupBy("g1", "g2").agg(count(lit(1)).as("cnt"), sum("x").as("x"))
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    def viewRows2() = MatView.readView(spark, view)
      .select("g1", "g2", "cnt", "x").as[(String, Long, Long, Long)]
      .collect().sorted.toSeq
    assert(applyBase2(Seq((1L, 1L, "I", "a", 1L, 10L),
      (2L, 1L, "I", "a", 2L, 20L), (3L, 1L, "I", "b", 1L, 30L)), 0))
    assert(MatView.catchUp(spark, base, view, Seq("g1", "g2"),
      Seq("x"), B) === 1)
    assert(viewRows2() === recompute2())
    // a COMPOSITE move: (a,1) -> (a,2); and (b,1) empties out
    assert(applyBase2(Seq((1L, 2L, "U", "a", 2L, 11L),
      (3L, 2L, "D", null, 0L, 0L)), 1))
    assert(MatView.catchUp(spark, base, view, Seq("g1", "g2"),
      Seq("x"), B) === 1)
    assert(viewRows2() === recompute2())
    assert(viewRows2() === Seq(("a", 2L, 2L, 31L)))
    // the internal key never leaks through readView — nor through the
    // SQL front door
    assert(!MatView.readView(spark, view).columns.contains("__grp"))
    graft.Graft.register(spark)
    val sqlRows = spark.sql(
      s"SELECT g1, g2, cnt, x FROM graft_view('$view')")
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(sqlRows === viewRows2())
    assert(spark.sql(s"SELECT * FROM graft_view('$view')").columns.toSeq
      === Seq("g1", "g2", "cnt", "x"))
  }

  test("catchUp bootstraps the view from every on-disk version and is " +
      "idempotent") {
    val base = tmp(); val view = tmp() + "/v"
    assert(applyBase(base, Seq((1L, 1L, "I", "a", 10L),
      (2L, 1L, "I", "b", 20L)), 0))
    assert(applyBase(base, Seq((2L, 2L, "U", "a", 21L)), 1))
    assert(applyBase(base, Seq((1L, 3L, "D", null, 0L)), 2))
    assert(MatView.catchUp(spark, base, view, "grp", Seq("x"), B) === 3)
    assert(viewRows(view) === recompute(base))
    assert(viewRows(view) === Seq(("a", 1L, 21L)))
    // nothing new: zero applied, content untouched
    assert(MatView.catchUp(spark, base, view, "grp", Seq("x"), B) === 0)
    // one more base version catches up incrementally
    assert(applyBase(base, Seq((3L, 4L, "I", "b", 7L)), 3))
    assert(MatView.catchUp(spark, base, view, "grp", Seq("x"), B) === 1)
    assert(viewRows(view) === recompute(base))
    // a base version whose state diff is EMPTY (delete of an absent key)
    // still advances the view's high-water mark — later catch-ups must
    // not re-read its feed forever
    assert(applyBase(base, Seq((99L, 9L, "D", null, 0L)), 4))
    assert(MatView.catchUp(spark, base, view, "grp", Seq("x"), B) === 0)
    assert(UpsertSink.readManifest(view).get.batchId === 4)
    assert(viewRows(view) === recompute(base))
  }
}
