package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 32

  private def normalize(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).max(1e-30)
    v.map(x => (x / n).toFloat)
  }

  /** 50 planted duplicate pairs (anchor + tiny-noise copy, cosine >
    * 0.9999) and 100 singletons, all deterministic. Random unit vectors
    * in 32 dims are near-orthogonal, so singletons never reach tau. */
  private lazy val corpus = {
    val rnd = new scala.util.Random(7)
    def randUnit(): Array[Float] =
      normalize(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val pairs = (0 until 50).flatMap { g =>
      val anchor = randUnit()
      val noisy = normalize(anchor.map(x => x + 1e-3f * rnd.nextGaussian().toFloat))
      Seq((g.toLong * 2, anchor.toSeq, g), (g.toLong * 2 + 1, noisy.toSeq, g))
    }
    val singles = (0 until 100).map(i => (1000L + i, randUnit().toSeq, -1))
    spark.createDataFrame(pairs ++ singles).toDF("id", "vec", "grp")
      .repartition(6)
  }

  test("each planted duplicate pair loses exactly one member; singletons survive") {
    val verdicts = SemDedup.assign(corpus, "id", "vec", tau = 0.99, k = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(verdicts.size == 200)
    // every singleton kept
    assert((0 until 100).forall(i => verdicts(1000L + i)), "a singleton was dropped")
    // exactly one survivor per planted pair
    val survivors = (0 until 50).map(g =>
      Seq(g.toLong * 2, g.toLong * 2 + 1).count(verdicts))
    assert(survivors.forall(_ == 1), s"per-pair survivor counts: $survivors")
    // dedup() keeps every input column and exactly the kept rows
    val kept = SemDedup.dedup(corpus, "id", "vec", tau = 0.99, k = 8)
    assert(kept.columns.toSeq == Seq("id", "vec", "grp"))
    assert(kept.count() == 150)
  }

  test("the paper's keep rule: the surviving member is the more peripheral one") {
    val rows = SemDedup.assign(corpus, "id", "vec", tau = 0.99, k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    val byPair = rows.filter(_._1 < 1000L).groupBy(t => t._1 / 2)
    byPair.values.filter(_.map(_._2).distinct.size == 1).foreach { pair =>
      // both members in one cluster: the kept one must sort first by
      // (centroid_cos asc, id asc) — lowest centroid similarity wins
      val sorted = pair.sortBy(t => (t._3, t._1))
      assert(sorted.head._4 && !sorted.last._4, s"pair: ${pair.toSeq}")
    }
  }

  test("driver-local path: verdicts identical across runs AND input layouts") {
    // the id-sorted driver-local sample makes the k-means seeding — and
    // so every verdict — independent of partition order
    val a = SemDedup.assign(corpus, "id", "vec", tau = 0.99, k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3))).toSet
    val b = SemDedup.assign(corpus.repartition(13), "id", "vec", tau = 0.99, k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3))).toSet
    assert(a == b)
  }

  test("the distributed MLlib path (forced) upholds the dedup invariants") {
    // maxDriverFlops = 0 forces the big-configuration path; cluster ids
    // are layout-deterministic only (k-means|| — the Ivf caveat), so
    // assert the invariants, not bit equality with the driver path
    val verdicts = SemDedup.assign(corpus, "id", "vec", tau = 0.99, k = 8,
        maxDriverFlops = 0L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert((0 until 100).forall(i => verdicts(1000L + i)))
    assert((0 until 50).forall(g =>
      Seq(g.toLong * 2, g.toLong * 2 + 1).count(verdicts) == 1))
  }

  test("oversized clusters sub-split without losing planted duplicates") {
    // maxClusterRows=10 forces sign-bit splitting (200 rows / 8 clusters);
    // near-identical vectors share their hyperplane signs, so planted
    // pairs still collapse — the dropped set matches the unsplit run
    val whole = SemDedup.assign(corpus, "id", "vec", tau = 0.99, k = 8)
      .where(!col("kept")).collect().map(_.getLong(0)).toSet
    val split = SemDedup.assign(corpus, "id", "vec", tau = 0.99, k = 8,
        maxClusterRows = 10L)
      .where(!col("kept")).collect().map(_.getLong(0)).toSet
    assert(split == whole)
  }

  test("argument validation") {
    intercept[IllegalArgumentException] {
      SemDedup.assign(corpus, "id", "vec", tau = 0.0)
    }
    intercept[IllegalArgumentException] {
      SemDedup.assign(corpus.where(lit(false)), "id", "vec", tau = 0.9)
    }
  }
}
