package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkTestBase {
  import spark.implicits._

  private def trades = Seq(
    // (key, t, id)
    ("A", 10L, 1L), ("A", 20L, 2L), ("A", 25L, 3L),
    ("B", 5L, 4L), ("B", 100L, 5L),
    ("C", 7L, 6L) // key with no quotes at all
  ).toDF("sym", "t", "trade_id")

  private def quotes = Seq(
    ("A", 8L, 1.0), ("A", 20L, 2.0), ("A", 21L, 3.0),
    ("B", 50L, 4.0)
  ).toDF("sym", "qt", "px")

  private def asof(direction: String, tol: Option[Long] = None) =
    Temporal.asofJoin(trades, quotes, Seq("sym"), Seq("sym"), "t", "qt",
      Seq("qt", "px"), direction, tol)
      .select("sym", "t", "trade_id", "qt", "px")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet

  test("backward: most recent quote at or before each trade; no-match keys null") {
    assert(asof("backward") === Set(
      ("A", 10L, Some(8L), Some(1.0)),   // 8 <= 10
      ("A", 20L, Some(20L), Some(2.0)),  // exact match included
      ("A", 25L, Some(21L), Some(3.0)),
      ("B", 5L, None, None),             // quote is later
      ("B", 100L, Some(50L), Some(4.0)),
      ("C", 7L, None, None)))            // key absent from right
  }

  test("forward: next quote at or after each trade") {
    assert(asof("forward") === Set(
      ("A", 10L, Some(20L), Some(2.0)),
      ("A", 20L, Some(20L), Some(2.0)),  // exact match included
      ("A", 25L, None, None),
      ("B", 5L, Some(50L), Some(4.0)),
      ("B", 100L, None, None),
      ("C", 7L, None, None)))
  }

  test("tolerance bounds the match distance in both directions") {
    val b = asof("backward", Some(2L))
    assert(b.contains(("A", 10L, Some(8L), Some(1.0))))   // delta 2 kept
    assert(b.contains(("A", 25L, None, None)))            // delta 4 dropped
    val f = asof("forward", Some(10L))
    assert(f.contains(("A", 10L, Some(20L), Some(2.0))))  // delta 10 kept
    assert(f.contains(("B", 5L, None, None)))             // delta 45 dropped
  }

  test("ties at equal right time are pinned by tieCols (backward max, forward min)") {
    val l = Seq(("k", 10L)).toDF("k", "t")
    val r = Seq(("k", 10L, 1L, "first"), ("k", 10L, 2L, "second"))
      .toDF("k", "rt", "seq", "tag")
    def run(dir: String) = Temporal.asofJoin(l, r, Seq("k"), Seq("k"), "t", "rt",
      Seq("seq", "tag"), dir, tieCols = Seq("seq")).select("tag").head().getString(0)
    assert(run("backward") === "second") // largest (t, tie)
    assert(run("forward") === "first")   // smallest (t, tie)
  }

  test("null left time is unmatched, null right time is ignored, null key is a group") {
    val l = Seq((Some("k"), Option(10L)), (Some("k"), None),
      (None: Option[String], Option(10L))).toDF("k", "t")
    val r = Seq((Some("k"), Option(5L), 1.0), (Some("k"), None, 99.0),
      (None: Option[String], Option(3L), 7.0)).toDF("k", "rt", "v")
    val out = Temporal.asofJoin(l, r, Seq("k"), Seq("k"), "t", "rt", Seq("v"))
      .collect().map(row => (Option(row.get(0)), Option(row.get(1)).map(_.asInstanceOf[Long]),
        Option(row.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(out === Set(
      (Some("k"), Some(10L), Some(1.0)), // null-rt right row never carried
      (Some("k"), None, None),           // null left time → unmatched
      (None, Some(10L), Some(7.0))))     // null key joins within its own group
  }

  test("timestamp time columns work in microseconds") {
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10")))
      .toDF("id", "ts")
    val r = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), "x"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:11"), "y"))
      .toDF("id", "rts", "v")
    val hit = Temporal.asofJoin(l, r, Seq("id"), Seq("id"), "ts", "rts", Seq("v"))
      .select("v").head().getString(0)
    assert(hit === "x")
    // 4 s tolerance (µs units) excludes the 5 s-old match
    val none = Temporal.asofJoin(l, r, Seq("id"), Seq("id"), "ts", "rts", Seq("v"),
      tolerance = Some(4000000L)).select("v").head()
    assert(none.isNullAt(0))
  }

  test("nearest: closer side wins, exact tie takes backward, tolerance both ways") {
    assert(asof("nearest") === Set(
      ("A", 10L, Some(8L), Some(1.0)),   // back d=2 beats fwd d=10
      ("A", 20L, Some(20L), Some(2.0)),  // exact match (d=0) unbeatable
      ("A", 25L, Some(21L), Some(3.0)),  // back d=4, no forward
      ("B", 5L, Some(50L), Some(4.0)),   // forward-only match
      ("B", 100L, Some(50L), Some(4.0)),
      ("C", 7L, None, None)))
    // equidistant: back at 8 (d=2) vs fwd at 12 (d=2) -> backward wins
    val l = Seq(("A", 10L, 1L)).toDF("sym", "t", "trade_id")
    val q = Seq(("A", 8L, 1.0), ("A", 12L, 2.0)).toDF("sym", "qt", "px")
    val tie = Temporal.asofJoin(l, q, Seq("sym"), Seq("sym"), "t", "qt",
      Seq("qt", "px"), "nearest").select("qt", "px").head
    assert(tie.getLong(0) == 8L && tie.getDouble(1) == 1.0)
    // tolerance cuts BOTH sides independently
    assert(asof("nearest", tol = Some(2L)) === Set(
      ("A", 10L, Some(8L), Some(1.0)),
      ("A", 20L, Some(20L), Some(2.0)),
      ("A", 25L, None, None),            // back d=4 > 2, no fwd
      ("B", 5L, None, None),             // fwd d=45 > 2
      ("B", 100L, None, None),
      ("C", 7L, None, None)))
  }

  test("nearest: randomized parity with a two-sided min_by emulation") {
    val rnd = new scala.util.Random(17)
    val l = (1 to 400).map(i =>
      (i.toLong, s"k${rnd.nextInt(6)}", rnd.nextInt(500).toLong)).toDF("lid", "k", "t")
    val r = (1 to 250).map(i =>
      (s"k${rnd.nextInt(6)}", rnd.nextInt(500).toLong, i.toLong)).toDF("rk", "rt", "rid")
    val got = Temporal.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
      Seq("rt", "rid"), direction = "nearest", tolerance = Some(60L),
      tieCols = Seq("rid"))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    // emulation: all eligible rights, pick min (distance, side, ±tie) —
    // side 0 = backward; within backward ties take the LARGEST (rt, rid)
    // = smallest (-rt, -rid), forward the smallest (rt, rid)
    val want = l.join(r,
        $"k" === $"rk" && abs($"rt" - $"t") <= 60L, "left")
      .groupBy("lid").agg(min_by(struct($"rt", $"rid"),
        struct(abs($"rt" - $"t"),
          when($"rt" <= $"t", 0).otherwise(1),
          when($"rt" <= $"t", -$"rt").otherwise($"rt"),
          when($"rt" <= $"t", -$"rid").otherwise($"rid"))).as("m"))
      .select($"lid", $"m.rid").as[(Long, Option[Long])].collect().toMap
    assert(got === want)
    // and it is partition-invariant
    val again = Temporal.asofJoin(l.repartition(7), r.repartition(3),
      Seq("k"), Seq("rk"), "t", "rt", Seq("rt", "rid"),
      direction = "nearest", tolerance = Some(60L), tieCols = Seq("rid"))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(again === got)
  }

  test("randomized parity with a join+max_by emulation") {
    val rnd = new scala.util.Random(42)
    val l = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(8)}", rnd.nextInt(1000).toLong)).toDF("lid", "k", "t")
    val r = (1 to 200).map(i =>
      (s"k${rnd.nextInt(8)}", rnd.nextInt(1000).toLong, i.toLong)).toDF("rk", "rt", "rid")
    val got = Temporal.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
      Seq("rt", "rid"), tolerance = Some(100L), tieCols = Seq("rid"))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    // emulation: outer join all eligible rights, keep the max (rt, rid)
    val want = l.join(r, $"k" === $"rk" && $"rt" <= $"t" && $"t" - $"rt" <= 100L, "left")
      .groupBy("lid").agg(max_by(struct($"rt", $"rid"), struct($"rt", $"rid")).as("m"))
      .select($"lid", $"m.rid").as[(Long, Option[Long])].collect().toMap
    assert(got === want)
  }

  test("asof validations reject bad input") {
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(trades, quotes, Nil, Nil, "t", "qt", Seq("px"))
    }
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(trades, quotes, Seq("sym"), Seq("sym"), "t", "qt",
        Seq("px"), direction = "sideways")
    }
    intercept[IllegalArgumentException] { // payload collides with left
      Temporal.asofJoin(trades, quotes, Seq("sym"), Seq("sym"), "t", "qt", Seq("sym"))
    }
    intercept[IllegalArgumentException] { // double time column rejected
      val l = Seq(("k", 1.5)).toDF("k", "t")
      Temporal.asofJoin(l, quotes, Seq("k"), Seq("sym"), "t", "qt", Seq("px"))
    }
  }

  test("binary key columns compare by content, not reference") {
    val l = Seq((Array[Byte](1, 2), 10L), (Array[Byte](3), 10L)).toDF("k", "t")
    val r = Seq((Array[Byte](1, 2), 5L, "match")).toDF("k", "rt", "v")
    val out = Temporal.asofJoin(l, r, Seq("k"), Seq("k"), "t", "rt", Seq("v"))
      .select("t", "v").collect()
      .map(row => (row.getLong(0), Option(row.getString(1)))).toList
    // the Array[Byte](1,2) key must carry its quote; Array(3) must not
    assert(out.toSet === Set((10L, Some("match")), (10L, None)))
  }

  // ---- rangeJoin ----

  test("rangeJoin matches the cross-join filter on random data, negatives included") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 400).map(i => (i.toLong, rnd.nextDouble() * 400 - 200))
      .toDF("pid", "p")
    val ivs = (1 to 60).map { i =>
      val lo = rnd.nextDouble() * 400 - 200
      (i.toLong, lo, lo + rnd.nextDouble() * 50)
    }.toDF("iid", "lo", "hi")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = pairs(pts.crossJoin(ivs).where($"p" >= $"lo" && $"p" <= $"hi"))
    assert(pairs(Temporal.rangeJoin(pts, "p", ivs, "lo", "hi")) === want)
    // explicit width, including one far coarser and one far finer than auto
    assert(pairs(Temporal.rangeJoin(pts, "p", ivs, "lo", "hi", binWidth = 500.0)) === want)
    assert(pairs(Temporal.rangeJoin(pts, "p", ivs, "lo", "hi", binWidth = 0.37)) === want)
  }

  test("rangeJoin: inclusive bounds, invalid intervals and nulls dropped, extra keys") {
    val pts = Seq((1L, "u1", 5.0), (2L, "u2", 5.0), (3L, "u1", 10.0),
      (4L, "u1", Double.NaN)).toDF("pid", "pu", "p")
      .withColumn("p", when(isnan($"p"), lit(null)).otherwise($"p"))
    val ivs = Seq((10L, "u1", 5.0, 10.0), (20L, "u2", 6.0, 4.0), // lo > hi: dropped
      (30L, "u2", 0.0, 5.0)).toDF("iid", "iu", "lo", "hi")
    val out = Temporal.rangeJoin(pts, "p", ivs, "lo", "hi",
      extraKeys = Seq("pu" -> "iu"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    // both endpoints inclusive; user keys respected; null point dropped
    assert(out === Set((1L, 10L), (3L, 10L), (2L, 30L)))
  }

  test("rangeJoin auto width survives all-zero-length intervals at normal magnitudes") {
    // point lookups as degenerate intervals: a denormal auto width would
    // saturate every bucket cast to ±Long.MaxValue
    val pts = Seq((1L, 1234.5), (2L, -99.0), (3L, 0.5)).toDF("pid", "p")
    val ivs = Seq((10L, 1234.5, 1234.5), (20L, -99.0, -99.0)).toDF("iid", "lo", "hi")
    val out = Temporal.rangeJoin(pts, "p", ivs, "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L), (2L, 20L)))
  }

  test("rangeJoin survives an empty right side and rejects overlapping names") {
    val pts = Seq((1L, 5.0)).toDF("pid", "p")
    val empty = Seq.empty[(Long, Double, Double)].toDF("iid", "lo", "hi")
    assert(Temporal.rangeJoin(pts, "p", empty, "lo", "hi").count() === 0L)
    intercept[IllegalArgumentException] { // right reuses left's "pid" name
      Temporal.rangeJoin(pts, "p", pts.withColumnRenamed("p", "lo")
        .withColumn("hi", $"lo"), "lo", "hi")
    }
  }

  test("rangeJoin plans as an equi-join, not a nested loop") {
    val pts = Seq((1L, 5.0)).toDF("pid", "p")
    val ivs = Seq((10L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    val plan = Temporal.rangeJoin(pts, "p", ivs, "lo", "hi", binWidth = 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join fell back to a nested loop:\n$plan")
  }

  test("asof join output schema is left ++ payload with payload nullable") {
    val out = Temporal.asofJoin(trades, quotes, Seq("sym"), Seq("sym"), "t", "qt", Seq("px"))
    assert(out.columns.toSeq === Seq("sym", "t", "trade_id", "px"))
    assert(out.schema("px").nullable)
  }

  // ---------------------------------------------------------------- gapFill

  test("gapFill densifies each key's span and carries values forward") {
    val obs = Seq(
      ("a", 100L, 1.0), ("a", 130L, 2.0), ("a", 140L, 3.0), // gap at 110,120
      ("b", 0L, 9.0),                                       // single bin
      ("c", 50L, 5.0), ("c", 80L, 6.0)                      // gaps at 60,70
    ).toDF("k", "t", "v")
    val got = Temporal.gapFill(obs, Seq("k"), "t", 10L, Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2))
    val want = Seq(
      ("a", 100L, 100L, 1.0), ("a", 110L, 100L, 1.0), ("a", 120L, 100L, 1.0),
      ("a", 130L, 130L, 2.0), ("a", 140L, 140L, 3.0),
      ("b", 0L, 0L, 9.0),
      ("c", 50L, 50L, 5.0), ("c", 60L, 50L, 5.0), ("c", 70L, 50L, 5.0),
      ("c", 80L, 80L, 6.0))
    assert(got.toSeq === want)
  }

  test("gapFill: observed flag via src_t, multiple value columns, schema") {
    val obs = Seq(("x", 0L, 1.0, "u"), ("x", 30L, 2.0, "w")).toDF("k", "t", "v", "s")
    val out = Temporal.gapFill(obs, Seq("k"), "t", 10L, Seq("v", "s"))
    assert(out.columns.toSeq === Seq("k", "t", "src_t", "v", "s"))
    val rows = out.withColumn("obs", $"src_t" === $"t")
      .collect().map(r => (r.getLong(1), r.getBoolean(5), r.getString(4)))
      .sortBy(_._1)
    assert(rows.toSeq === Seq((0L, true, "u"), (10L, false, "u"),
      (20L, false, "u"), (30L, true, "w")))
  }

  test("gapFill validation: step, time type, value cols, collision") {
    val obs = Seq(("a", 1L, 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      Temporal.gapFill(obs, Seq("k"), "t", 0L, Seq("v"))
    }
    intercept[IllegalArgumentException] {
      Temporal.gapFill(obs, Nil, "t", 10L, Seq("v"))
    }
    intercept[IllegalArgumentException] {
      Temporal.gapFill(obs, Seq("k"), "t", 10L, Nil)
    }
    intercept[IllegalArgumentException] { // double time must be pre-binned
      Temporal.gapFill(Seq(("a", 1.5, 1.0)).toDF("k", "t", "v"),
        Seq("k"), "t", 10L, Seq("v"))
    }
    intercept[IllegalArgumentException] { // srcTimeCol collision
      Temporal.gapFill(Seq(("a", 1L, 1.0)).toDF("k", "src_t", "v"),
        Seq("k"), "src_t", 10L, Seq("v"))
    }
  }

  test("gapFill: equal-bin duplicates resolve to the largest payload tuple") {
    // three observations share bin 10 — the documented rule says the
    // largest (valueCols…) tuple wins, and the winner must carry into
    // the filled bins too. Repartition shapes must not change the pick.
    val obs = Seq(
      ("a", 10L, 1.0, "lo"), ("a", 10L, 9.0, "hi"), ("a", 10L, 9.0, "he"),
      ("a", 40L, 2.0, "x"))
      .toDF("k", "t", "v", "s")
    // largest (v, s) tuple in bin 10 is (9.0, "hi") — v breaks first,
    // then s breaks the 9.0 tie
    val want = Seq(
      ("a", 10L, 10L, 9.0, "hi"),
      ("a", 20L, 10L, 9.0, "hi"),
      ("a", 30L, 10L, 9.0, "hi"),
      ("a", 40L, 40L, 2.0, "x"))
    for (parts <- Seq(1, 7)) {
      val got = Temporal.gapFill(obs.repartition(parts), Seq("k"), "t", 10L,
          Seq("v", "s"))
        .select("k", "t", "src_t", "v", "s")
        .as[(String, Long, Long, Double, String)].collect().sortBy(_._2).toSeq
      assert(got === want, s"parts=$parts")
    }
  }

  test("gapFill: a non-orderable (map) payload fills without failing " +
      "analysis; orderable columns still tie-break around it") {
    // MapType can't sort, so it must be excluded from the tie columns
    // instead of blowing up asofJoin's sort at analysis time
    val obs = Seq(
      ("a", 10L, 1.0, Map("m" -> 1)), ("a", 10L, 9.0, Map("m" -> 2)),
      ("a", 40L, 2.0, Map("m" -> 3)))
      .toDF("k", "t", "v", "tags")
    val out = Temporal.gapFill(obs, Seq("k"), "t", 10L, Seq("v", "tags"))
      .select("k", "t", "src_t", "v", "tags")
      .collect().map(r => (r.getLong(1), r.getDouble(3),
        r.getMap[String, Int](4).toMap)).sortBy(_._1)
    // the orderable column v still picks the 9.0 winner in bin 10, and
    // the map that RIDES with the winning row comes along (payloads
    // travel as one row — excluding maps from the TIE columns doesn't
    // decouple them from the chosen row)
    assert(out.map(_._1).toSeq === Seq(10L, 20L, 30L, 40L))
    assert(out.map(_._2).toSeq === Seq(9.0, 9.0, 9.0, 2.0))
    assert(out(0)._3 === Map("m" -> 2) && out(3)._3 === Map("m" -> 3))
  }

  // ------------------------------------------------------------------ scd2

  test("scd2 collapses no-op changes and chains half-open intervals") {
    val log = Seq(
      (1L, 10L, "A", 1L), (1L, 20L, "A", 2L), // no-op: collapses into 10
      (1L, 30L, "B", 3L), (1L, 40L, "A", 4L), // back to A = a NEW version
      (2L, 5L, "X", 5L)
    ).toDF("k", "t", "attr", "tie")
    val got = Temporal.scd2(log, Seq("k"), "t", Seq("attr"), Seq("tie"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .sortBy(x => (x._1, x._3))
    assert(got.toSeq === Seq(
      (1L, "A", 10L, 30L, false),
      (1L, "B", 30L, 40L, false),
      (1L, "A", 40L, -1L, true),
      (2L, "X", 5L, -1L, true)))
  }

  test("scd2: ties pinned by tieCols, null times dropped, null attrs are states") {
    val log = Seq(
      (Some(1L), Some(10L), Some("A"), 2L),
      (Some(1L), Some(10L), Some("B"), 1L), // same time: tie=1 orders FIRST
      (Some(1L), None, Some("C"), 3L),      // null time: dropped
      (Some(1L), Some(20L), None, 4L),      // null attr is a real state
      (Some(1L), Some(30L), None, 5L)       // ...and a null==null no-op
    ).toDF("k", "t", "attr", "tie")
    val got = Temporal.scd2(log, Seq("k"), "t", Seq("attr"), Seq("tie"))
      .collect()
      .map(r => (Option(r.get(1)).map(_.toString).getOrElse("∅"), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(x => (x._2, x._3))
    // B (tie 1) becomes a zero-length [10,10) version, A (tie 2) follows
    // at the same time, then the null state at 20 collapsing the 30 no-op
    assert(got.toSeq === Seq(("B", 10L, 10L), ("A", 10L, 20L), ("∅", 20L, -1L)))
  }

  test("scd2 validation: reserved output names, empty key/attr lists") {
    val log = Seq((1L, 10L, "A")).toDF("k", "t", "valid_from")
    intercept[IllegalArgumentException] {
      Temporal.scd2(log, Seq("k"), "t", Seq("valid_from"))
    }
    intercept[IllegalArgumentException] {
      Temporal.scd2(log, Nil, "t", Seq("valid_from"))
    }
    intercept[IllegalArgumentException] {
      Temporal.scd2(log, Seq("k"), "t", Nil)
    }
  }
}
