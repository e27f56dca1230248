package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("heavyHitters is exact: equals groupBy-count-having on skewed data") {
    val rnd = new scala.util.Random(11)
    // zipf-ish: item i drawn with weight 1/i over 500 distinct items
    val weights = (1 to 500).map(i => 1.0 / i)
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    val rows = (1 to 20000).map { _ =>
      val u = rnd.nextDouble() * total
      s"item${cum.indexWhere(_ >= u)}"
    }
    val df = rows.toDF("x").repartition(7)
    for (k <- Seq(10, 50, 200)) {
      val got = Sketches.heavyHitters(df, "x", k)
        .as[(String, Long)].collect().toSet
      val n = rows.size.toLong
      val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * k > n }.toSet
      assert(got === want, s"k=$k")
    }
  }

  test("heavyHitters: nulls excluded, more counters than distinct items, empty input") {
    val df = Seq(Some("a"), Some("a"), Some("a"), Some("b"), None).toDF("x")
    // n = 4 non-null; threshold n/k with k=3 → cnt > 1.33: only a (3)
    assert(Sketches.heavyHitters(df, "x", 3).as[(String, Long)].collect().toSet
      === Set(("a", 3L)))
    // k far above cardinality: every item is a candidate, threshold still applies
    assert(Sketches.heavyHitters(df, "x", 100).as[(String, Long)].collect().toSet
      === Set(("a", 3L), ("b", 1L)))
    val empty = Seq.empty[String].toDF("x")
    assert(Sketches.heavyHitters(empty, "x", 5).count() === 0L)
    intercept[IllegalArgumentException] { Sketches.heavyHitters(df, "x", 1) }
  }

  test("heavyHitters candidate superset survives adversarial partition skew") {
    // all heavy mass in one partition, noise in the others
    val heavy = Seq.fill(400)("H")
    val noise = (1 to 600).map(i => s"n$i")
    val df = spark.createDataFrame(
      spark.sparkContext.makeRDD(heavy.map(Tuple1(_)), 1)
        .union(spark.sparkContext.makeRDD(noise.map(Tuple1(_)), 5)))
      .toDF("x")
    // n=1000, k=5 → threshold 200: H (400) must survive
    assert(Sketches.heavyHitters(df, "x", 5).as[(String, Long)].collect().toSet
      === Set(("H", 400L)))
  }

  test("kmv_distinct is exact below k and partitioning-invariant above it") {
    val hashes = (1 to 5000).map(i => (graft.functions.TextOps.md5Prefix64(s"v$i") >>> 4))
    // exact regime: 100 distinct < k=256
    val small = hashes.take(100).toDF("h")
    assert(small.agg(call_function("kmv_distinct", $"h", lit(256))).head().getDouble(0)
      === 100.0)
    // duplicates don't count
    val duped = (hashes.take(100) ++ hashes.take(100)).toDF("h")
    assert(duped.agg(call_function("kmv_distinct", $"h", lit(256))).head().getDouble(0)
      === 100.0)
    // estimate regime: deterministic across partitionings, and accurate
    val ests = Seq(1, 4, 13).map { p =>
      hashes.toDF("h").repartition(p)
        .agg(call_function("kmv_distinct", $"h", lit(256))).head().getDouble(0)
    }
    assert(ests.distinct.size === 1, s"partitioning changed the estimate: $ests")
    // KMV relative error ~ 1/sqrt(k-2) ≈ 6.3%; allow 3σ
    assert(math.abs(ests.head - 5000.0) / 5000.0 < 0.19, s"estimate ${ests.head}")
  }

  test("kmv_distinct: nulls ignored, grouped aggregation, k validation") {
    val df = Seq((Some(1L), "a"), (Some(2L), "a"), (None, "a"), (Some(9L), "b"))
      .toDF("h", "g")
    val out = df.groupBy("g").agg(call_function("kmv_distinct", $"h", lit(4)).as("d"))
      .as[(String, Double)].collect().toMap
    assert(out === Map("a" -> 2.0, "b" -> 1.0))
    // empty group set → zero
    assert(Seq.empty[Long].toDF("h")
      .agg(call_function("kmv_distinct", $"h", lit(4))).head().getDouble(0) === 0.0)
    val e = intercept[Exception] {
      df.agg(call_function("kmv_distinct", $"h", lit(1))).head()
    }
    // the require fires inside task execution; walk the cause chain
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("k must be >= 2"))
  }

  test("cms_sketch: counter matrix equals a local replica and is partition-invariant") {
    val rnd = new scala.util.Random(17)
    val items = (1 to 3000).map(_ => s"item${rnd.nextInt(300)}")
    val (depth, width) = (4, 64)
    // local replica of the exact same row-salted md5 placement
    def cell(i: Int, s: String): Int =
      ((graft.functions.TextOps.md5Prefix64(s"cms$i:$s") >>> 4) % width).toInt
    val want = new Array[Long](depth * width)
    items.foreach(s => (0 until depth).foreach(i => want(i * width + cell(i, s)) += 1))
    for (p <- Seq(1, 9)) {
      val got = items.toDF("x").repartition(p)
        .agg(call_function("cms_sketch", $"x", lit(depth), lit(width)))
        .head().getSeq[Long](0)
      assert(got.toArray.toSeq === want.toSeq, s"partitions=$p")
    }
    // point estimate: min over rows — never below the true count
    val sketch = want
    def estimate(s: String): Long =
      (0 until depth).map(i => sketch(i * width + cell(i, s))).min
    val trueCounts = items.groupBy(identity).view.mapValues(_.size.toLong)
    trueCounts.foreach { case (s, c) => assert(estimate(s) >= c, s) }
  }

  test("cms_sketch: nulls skipped, grouped use, and validation at analysis time") {
    val df = Seq((Some("a"), "g"), (None, "g"), (Some("a"), "h")).toDF("x", "g")
    val bySum = df.groupBy("g")
      .agg(call_function("cms_sketch", $"x", lit(2), lit(16)).as("sk"))
      .select($"g", expr("aggregate(sk, 0L, (a, b) -> a + b)").as("total"))
      .as[(String, Long)].collect().toMap
    // each non-null item lands once per row: depth 2 → 2 increments
    assert(bySum === Map("g" -> 2L, "h" -> 2L))
    val e = intercept[Exception] {
      df.agg(call_function("cms_sketch", $"x", lit(0), lit(16))).head()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("depth >= 1"))
  }

  test("hll_sketch: registers equal a local replica and are partition-invariant") {
    val p = 6
    val m = 1 << p
    val hashes = (1 to 4000).map(i => (graft.functions.TextOps.md5Prefix64(s"v$i") >>> 4))
    // local replica of the exact register placement: top p bits route,
    // rho = 1 + leading zeros of the (60-p)-bit tail
    val want = new Array[Int](m)
    hashes.foreach { h =>
      val idx = (h >>> (60 - p)).toInt
      val w = h & ((1L << (60 - p)) - 1)
      val rho = if (w == 0L) 60 - p + 1
        else 60 - p - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rho > want(idx)) want(idx) = rho
    }
    for (parts <- Seq(1, 9)) {
      val got = hashes.toDF("h").repartition(parts)
        .agg(call_function("hll_sketch", $"h", lit(p)))
        .head().getSeq[Int](0)
      assert(got.toSeq === want.toSeq, s"partitions=$parts")
    }
    // duplicates leave the registers unchanged (a SET function)
    val duped = (hashes ++ hashes.take(500)).toDF("h")
      .agg(call_function("hll_sketch", $"h", lit(p))).head().getSeq[Int](0)
    assert(duped.toSeq === want.toSeq)
  }

  test("hll_sketch: nulls skipped, grouped use, p validated at analysis time") {
    val df = Seq((Some(5L), "a"), (Some(5L), "a"), (None, "a"), (Some(9L), "b"))
      .toDF("h", "g")
    val out = df.groupBy("g")
      .agg(call_function("hll_sketch", $"h", lit(4)).as("sk"))
      .select($"g", expr("aggregate(sk, 0, (a, b) -> a + b)").as("rhosum"))
      .as[(String, Int)].collect().toMap
    // one distinct hash per group → exactly one non-zero register each
    assert(out("a") > 0 && out("b") > 0)
    val e = intercept[Exception] {
      df.agg(call_function("hll_sketch", $"h", lit(3))).head()
    }
    assert(e.getMessage.contains("[4, 16]"))
  }

  test("hllEstimate: linear-counting branch is near-exact small, harmonic within 3 sigma large") {
    def regs(hashes: Seq[Long], p: Int): Seq[Int] =
      hashes.toDF("h").agg(call_function("hll_sketch", $"h", lit(p)))
        .head().getSeq[Int](0)
    // small regime (n << m): linear counting, tight
    val small = (1 to 40).map(i => graft.functions.TextOps.md5Prefix64(s"s$i") >>> 4)
    val estSmall = Sketches.hllEstimate(regs(small, 10))
    assert(math.abs(estSmall - 40.0) <= 2.0, s"small estimate $estSmall")
    // large regime: standard error 1.04/sqrt(1024) = 3.25%; allow 3 sigma
    val large = (1 to 20000).map(i => graft.functions.TextOps.md5Prefix64(s"L$i") >>> 4)
    val estLarge = Sketches.hllEstimate(regs(large, 10))
    assert(math.abs(estLarge - 20000.0) / 20000.0 < 0.10, s"large estimate $estLarge")
    // empty sketch → 0 via linear counting (ln(m/m) = 0)
    assert(Sketches.hllEstimate(Seq.fill(64)(0)) === 0.0)
    intercept[IllegalArgumentException] { Sketches.hllEstimate(Seq(1, 2, 3)) }
  }

  test("kmv_distinct matches the oracle's closed form on the full regime") {
    // replicate the DuckDB oracle's arithmetic exactly: sort distinct
    // hashes, take the k-th smallest, ((k-1) * 2^60) / kth
    val k = 64
    val hashes = (1 to 1000).map(i => (graft.functions.TextOps.md5Prefix64(s"w$i") >>> 4))
    val got = hashes.toDF("h").repartition(5)
      .agg(call_function("kmv_distinct", $"h", lit(k))).head().getDouble(0)
    val kth = hashes.distinct.sorted.apply(k - 1)
    val want = (k - 1).toDouble * math.pow(2, 60) / kth.toDouble
    assert(got === want) // bit-exact, not approximate
  }

  test("kmv_sketch state is the sorted bottom-k distinct set, any partitioning") {
    val rnd = new scala.util.Random(5)
    val hashes = (1 to 3000).map(_ => rnd.nextLong(1L << 60)).map(math.abs)
    val want = hashes.distinct.sorted.take(64)
    for (parts <- Seq(1, 9)) {
      val got = hashes.toDF("h").repartition(parts)
        .agg(call_function("kmv_sketch", $"h", lit(64))).head().getSeq[Long](0)
      assert(got.toSeq === want, s"parts=$parts")
    }
    // below k: the full distinct set, still sorted
    val small = Seq(9L, 3L, 9L, 1L).toDF("h")
      .agg(call_function("kmv_sketch", $"h", lit(64))).head().getSeq[Long](0)
    assert(small.toSeq === Seq(1L, 3L, 9L))
  }

  test("kmv_merge rollup state EQUALS the single-pass state (lossless merge)") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 5000).map(_ => (s"g${rnd.nextInt(7)}", math.abs(rnd.nextLong(1L << 60))))
    val df = rows.toDF("g", "h").repartition(11)
    val k = 32
    // two-level: per-group states, merged
    val rolled = df.groupBy("g").agg(call_function("kmv_sketch", $"h", lit(k)).as("sk"))
      .agg(call_function("kmv_merge", $"sk", lit(k))).head().getSeq[Long](0)
    // single pass over everything
    val single = df.agg(call_function("kmv_sketch", $"h", lit(k))).head().getSeq[Long](0)
    assert(rolled.toSeq === single.toSeq)
    assert(single.toSeq === rows.map(_._2).distinct.sorted.take(k))
    // and the estimate off the merged state equals kmv_distinct
    val est = df.agg(call_function("kmv_distinct", $"h", lit(k))).head().getDouble(0)
    val kth = single(k - 1)
    assert(est === (k - 1).toDouble * math.pow(2, 60) / kth.toDouble)
  }

  test("kmv_merge: null states skipped, validation at analysis time") {
    val states = Seq(Some(Seq(5L, 7L)), None, Some(Seq(1L, 7L, 9L)))
      .toDF("sk")
    val merged = states.agg(call_function("kmv_merge", $"sk", lit(4)))
      .head().getSeq[Long](0)
    assert(merged.toSeq === Seq(1L, 5L, 7L, 9L)) // dedup of 7, capped sort
    intercept[Exception] { // non-literal / bad k fails analysis
      Seq(Seq(1L)).toDF("sk").agg(call_function("kmv_merge", $"sk", lit(1))).head()
    }
    intercept[Exception] { // wrong child type
      Seq("x").toDF("sk").agg(call_function("kmv_merge", $"sk", lit(4))).head()
    }
    intercept[Exception] {
      Seq(1L).toDF("h").agg(call_function("kmv_sketch", $"h", lit(1))).head()
    }
  }
}
