package graft.functions

import graft.SparkTestBase
import graft.operators.Corpus
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkTestBase {
  import spark.implicits._

  test("topk/bottomk equal the window emulation on random grouped data") {
    val rnd = new scala.util.Random(5)
    val df = (1 to 4000).map(i =>
      (s"g${rnd.nextInt(7)}", rnd.nextInt(500).toDouble, i.toLong))
      .toDF("g", "v", "id").repartition(9)
    for (k <- Seq(1, 5, 40)) {
      val top = df.groupBy("g")
        .agg(call_function("topk_agg", struct($"v", $"id"), lit(k)).as("t"))
        .select($"g", explode($"t").as("s")).select($"g", $"s.v", $"s.id")
        .as[(String, Double, Long)].collect().toSet
      val wantTop = df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy($"v".desc, $"id".desc)))
        .where($"rn" <= k).select("g", "v", "id")
        .as[(String, Double, Long)].collect().toSet
      assert(top === wantTop, s"topk k=$k")
      val bot = df.groupBy("g")
        .agg(call_function("bottomk_agg", struct($"v", $"id"), lit(k)).as("t"))
        .select($"g", explode($"t").as("s")).select($"g", $"s.v", $"s.id")
        .as[(String, Double, Long)].collect().toSet
      val wantBot = df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy($"v".asc, $"id".asc)))
        .where($"rn" <= k).select("g", "v", "id")
        .as[(String, Double, Long)].collect().toSet
      assert(bot === wantBot, s"bottomk k=$k")
    }
  }

  test("result arrays are sorted best-first and duplicates are kept") {
    val df = Seq(3, 1, 3, 2, 3).toDF("v")
    assert(df.agg(call_function("topk_agg", $"v", lit(4))).head()
      .getSeq[Int](0) === Seq(3, 3, 3, 2))
    assert(df.agg(call_function("bottomk_agg", $"v", lit(2))).head()
      .getSeq[Int](0) === Seq(1, 2))
  }

  test("plain strings order correctly; k larger than the group returns all") {
    val df = Seq("pear", "apple", "fig").toDF("s")
    assert(df.agg(call_function("topk_agg", $"s", lit(2))).head()
      .getSeq[String](0) === Seq("pear", "fig"))
    assert(df.agg(call_function("bottomk_agg", $"s", lit(99))).head()
      .getSeq[String](0) === Seq("apple", "fig", "pear"))
  }

  test("null inputs are skipped; null struct fields sort below any value") {
    val df = Seq(Some(5), None, Some(1)).toDF("v")
    assert(df.agg(call_function("topk_agg", $"v", lit(3))).head()
      .getSeq[Int](0) === Seq(5, 1))
    val sdf = Seq((Some(2.0), 1L), (None, 2L), (Some(9.0), 3L))
      .toDF("v", "id")
    // bottomk: the null-v struct is the smallest, so it wins at k=1
    val picked = sdf.agg(call_function("bottomk_agg", struct($"v", $"id"), lit(1)))
      .select(element_at(col("bottomk_agg(struct(v, id), 1)"), 1).getField("id"))
      .head().getLong(0)
    assert(picked === 2L)
  }

  test("SQL registration and partial-merge round trip through a real shuffle") {
    val view = (1 to 1000).map(i => (i % 13, i)).toDF("g", "v")
    view.repartition(11).createOrReplaceTempView("tk_input")
    val rows = spark.sql(
      "SELECT g, topk_agg(v, 3) AS t FROM tk_input GROUP BY g ORDER BY g")
      .as[(Int, Seq[Int])].collect()
    assert(rows.length === 13)
    rows.foreach { case (g, t) =>
      val want = (1 to 1000).filter(_ % 13 == g).sorted(Ordering[Int].reverse).take(3)
      assert(t === want, s"group $g")
    }
  }

  test("unorderable values and bad k are rejected") {
    val df = Seq((1, Map("a" -> 1))).toDF("v", "m")
    intercept[Exception] {
      df.agg(call_function("topk_agg", $"m", lit(2))).head()
    }
    val e = intercept[Exception] {
      df.agg(call_function("topk_agg", $"v", lit(0))).head()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("k must be >= 1"))
  }

  test("weightedSample: exact counts, weight-proportional odds, deterministic") {
    // 1000 light (w=1) + 1000 heavy (w=9) rows; A-ES without replacement
    // must over-represent heavy rows strongly in a 200-row sample
    val df = (1 to 2000).map(i =>
      (i.toLong, "g", if (i <= 1000) 1.0 else 9.0)).toDF("id", "g", "w")
    val s = Corpus.weightedSample(df, "g", "id", "w", 200)
    assert(s.count() === 200L)
    val heavy = s.where($"w" === 9.0).count()
    assert(heavy > 140L, s"heavy=$heavy") // ~90% expected, assert > 70%
    // deterministic under repartitioning
    val ids1 = s.select("id").as[Long].collect().toSet
    val ids2 = Corpus.weightedSample(df.repartition(13), "g", "id", "w", 200)
      .select("id").as[Long].collect().toSet
    assert(ids1 === ids2)
    // zero/negative/NaN weights are excluded even at huge n — RAW NaN,
    // not pre-converted: NaN > 0 is true under Spark's total ordering,
    // so the operator must carry its own isnan guard
    val bad = Seq((1L, "g", 0.0), (2L, "g", -1.0),
      (3L, "g", Double.NaN), (4L, "g", 2.0)).toDF("id", "g", "w")
    assert(Corpus.weightedSample(bad, "g", "id", "w", 100)
      .select("id").as[Long].collect().toSeq === Seq(4L))
    // tiny classifier-score weights must not collapse (the u^(1/w)
    // underflow the log-space key avoids): with w=0.001 everywhere the
    // sample is still exactly n distinct rows
    val tiny = (1 to 500).map(i => (i.toLong, "g", 0.001)).toDF("id", "g", "w")
    assert(Corpus.weightedSample(tiny, "g", "id", "w", 50).count() === 50L)
    intercept[IllegalArgumentException] {
      Corpus.weightedSample(df, "g", "id", "w", 0)
    }
  }

  test("stratifiedSample: exact per-group counts, deterministic, id-keyed") {
    val df = (1 to 900).map(i => (i.toLong, s"g${i % 3}", s"payload$i"))
      .toDF("id", "g", "p")
    val s1 = Corpus.stratifiedSample(df, "g", "id", 50)
    val counts = s1.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts === Map("g0" -> 50L, "g1" -> 50L, "g2" -> 50L))
    // full row survives; selection is partitioning-invariant
    assert(s1.columns.toSeq === Seq("id", "g", "p"))
    val ids1 = s1.select("id").as[Long].collect().toSet
    val ids2 = Corpus.stratifiedSample(df.repartition(17), "g", "id", 50)
      .select("id").as[Long].collect().toSet
    assert(ids1 === ids2)
    // a group smaller than n returns whole
    val tiny = df.where($"id" <= 4)
    assert(Corpus.stratifiedSample(tiny, "g", "id", 50).count() === 4L)
  }
}
