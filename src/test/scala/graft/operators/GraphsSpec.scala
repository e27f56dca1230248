package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkTestBase {
  import spark.implicits._

  /** Local reference implementation of the same fixed-point recurrence. */
  private def referenceRanks(edges: Seq[(String, String, Double)],
                             iters: Int, d: Double): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _, w) => r(u) * w / outW(u) }.sum).toMap
      r = nodes.map(v => v -> ((1 - d) / n + d * in.getOrElse(v, 0.0))).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String, Double)], iters: Int = 3) =
    Graphs.pageRank(edges.toDF("s", "t", "w").repartition(5), "s", "t",
      Some("w"), iterations = iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("pageRank matches the reference recurrence on a hand-built graph") {
    val edges = Seq(
      ("a", "b", 1.0), ("a", "c", 3.0), // a splits 1/4 : 3/4
      ("b", "c", 1.0),
      ("c", "a", 1.0),
      ("d", "c", 2.0))                  // d dangles on the IN side only
    val got = run(edges)
    val want = referenceRanks(edges, 3, 0.85)
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, k) }
    // authority ordering: c collects from everyone
    assert(got("c") > got("a") && got("a") > got("b") && got("b") > got("d"))
  }

  test("pageRank on a larger random graph equals the reference, any partitioning") {
    val rnd = new scala.util.Random(3)
    val edges = (1 to 2000).map(_ =>
      (s"n${rnd.nextInt(120)}", s"n${rnd.nextInt(120)}", 1.0 + rnd.nextInt(5)))
      .distinct
    val got = run(edges, iters = 4)
    val want = referenceRanks(edges, 4, 0.85)
    assert(got.size === want.size)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-9, k) }
    Dedup.releaseCaches()
  }

  test("pageRank drops invalid edges and handles empties and validation") {
    val edges = Seq(
      (Some("a"), Some("b"), Some(1.0)),
      (None, Some("b"), Some(1.0)),          // null src
      (Some("a"), None, Some(1.0)),          // null dst
      (Some("a"), Some("c"), Some(-2.0)),    // non-positive weight
      (Some("a"), Some("c"), None))          // null weight
      .toDF("s", "t", "w")
    val got = Graphs.pageRank(edges, "s", "t", Some("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === Set("a", "b"))
    val empty = Seq.empty[(String, String, Double)].toDF("s", "t", "w")
    assert(Graphs.pageRank(empty, "s", "t", Some("w")).count() === 0L)
    intercept[IllegalArgumentException] {
      Graphs.pageRank(edges, "s", "t", None, iterations = 0)
    }
    intercept[IllegalArgumentException] {
      Graphs.pageRank(edges, "s", "t", None, damping = 1.0)
    }
    Dedup.releaseCaches()
  }

  test("unweighted pageRank treats every out-edge equally") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("s", "t")
    val got = Graphs.pageRank(edges, "s", "t", None, iterations = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = referenceRanks(Seq(("a", "b", 1.0), ("a", "c", 1.0),
      ("b", "c", 1.0)), 2, 0.85)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, k) }
    Dedup.releaseCaches()
  }

  test("triangleCount: known graphs, dirty-input canonicalization, brute-force parity") {
    import spark.implicits._
    def count(edges: Seq[(String, String)]): Long =
      Graphs.triangleCount(edges.toDF("a", "b"), "a", "b").head().getLong(0)
    // one triangle; square has none; K4 has four
    assert(count(Seq(("a", "b"), ("b", "c"), ("c", "a"))) === 1L)
    assert(count(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))) === 0L)
    val k4 = for { x <- Seq("a", "b", "c", "d"); y <- Seq("a", "b", "c", "d") if x < y } yield (x, y)
    assert(count(k4) === 4L)
    // self-loops, duplicate and reversed edges collapse before counting
    assert(count(Seq(("a", "a"), ("a", "b"), ("b", "a"), ("a", "b"),
      ("b", "c"), ("c", "a"))) === 1L)
    assert(count(Seq.empty) === 0L)
    // brute-force parity on a random graph across partitionings
    val rnd = new scala.util.Random(31)
    val edges = (1 to 2000).map(_ => (s"n${rnd.nextInt(60)}", s"n${rnd.nextInt(60)}"))
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => if (e._1 < e._2) e else e.swap).distinct
    val adj = canon.toSet
    val nodesSorted = canon.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val brute = (for {
      i <- nodesSorted.indices; j <- (i + 1) until nodesSorted.size
      if adj((nodesSorted(i), nodesSorted(j)))
      k <- (j + 1) until nodesSorted.size
      if adj((nodesSorted(j), nodesSorted(k))) && adj((nodesSorted(i), nodesSorted(k)))
    } yield 1).size.toLong
    for (parts <- Seq(1, 7)) {
      assert(Graphs.triangleCount(edges.toDF("a", "b").repartition(parts), "a", "b")
        .head().getLong(0) === brute, s"parts=$parts")
    }
    Dedup.releaseCaches()
  }
}
