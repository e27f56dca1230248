package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class VectorStorageSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("bucketed layout prunes partitions and matches the scan-time LSH result") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vec").toFile
    dir.deleteOnExit()
    VectorStorage.writeBucketed(embs, "embedding", dir.getAbsolutePath, planes = 6)

    val q = embs.where($"vec_id" === 0).select("embedding").head().getSeq[Float](0).toArray
    val df = VectorStorage.topK(spark, dir.getAbsolutePath, "vec_id", "embedding",
      q, k = 5, planes = 6, probes = 1)

    // partition pruning visible in the scan: bucket is a partition column
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("bucket"), p)

    // same result as the scan-time LSH path on the same corpus
    val fromStorage = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fromScan = Ann.lshTopK(embs, "vec_id", "embedding", q, 5, planes = 6, probes = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromStorage == fromScan)
    assert(fromStorage.head._1 == 0L) // the query vector itself ranks first
  }

  test("hammingBall enumerates exactly the buckets within distance p, once each") {
    // planes=5, probes=2: 1 + 5 + 10 = 16 distinct buckets
    val ball = Ann.hammingBall(qBucket = 0x15, planes = 5, probes = 2)
    assert(ball.length == 16 && ball.distinct.length == 16)
    assert(ball.forall(b => Integer.bitCount(b ^ 0x15) <= 2))
    // probes=0 → just the bucket; probes>planes clamps to the full cube
    assert(Ann.hammingBall(3, 5, 0) == Seq(3))
    assert(Ann.hammingBall(3, 4, 99).length == 16)
  }

  test("hammingBall clamps balls past MaxBallSize instead of enumerating them") {
    // C(30, ≤15) ≈ 155M buckets — must clamp to the largest feasible ball,
    // not OOM the driver enumerating into an isin()
    val feasible = Ann.maxFeasibleProbes(30)
    assert(Ann.ballSize(30, feasible) <= Ann.MaxBallSize)
    assert(Ann.ballSize(30, feasible + 1) > Ann.MaxBallSize)
    val clamped = Ann.hammingBall(0, 30, 15)
    assert(clamped.length == Ann.ballSize(30, feasible))
    assert(clamped.distinct.length == clamped.length)
    // ballSize is exact below the cap and saturates (stops) above it
    assert(Ann.ballSize(5, 2) == 16L)
    assert(Ann.ballSize(30, 1) == 31L)
    assert(Ann.ballSize(30, 15) > Ann.MaxBallSize)
    // planes past 62 would overflow the Long binomial recurrence — refused
    intercept[IllegalArgumentException](Ann.ballSize(63, 2))
    // full cube on 18 planes = 2^18 = MaxBallSize: the boundary still works
    assert(Ann.hammingBall(0, 18, 18).length == (1 << 18))
  }

  test("recall vs brute force is monotone in probes (probes=2 means distance 2)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vec3").toFile
    dir.deleteOnExit()
    VectorStorage.writeBucketed(embs, "embedding", dir.getAbsolutePath, planes = 8)
    val ids = Seq(0L, 7L, 23L, 101L, 404L)
    val truth = ids.map { id =>
      val q = embs.where($"vec_id" === id).select("embedding").head().getSeq[Float](0).toArray
      id -> Ann.bruteForceTopK(embs, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
    }.toMap
    val recalls = (0 to 3).map { probes =>
      val hits = ids.map { id =>
        val q = embs.where($"vec_id" === id).select("embedding").head().getSeq[Float](0).toArray
        val got = VectorStorage.topK(spark, dir.getAbsolutePath, "vec_id", "embedding",
          q, k = 10, planes = 8, probes = probes)
          .collect().map(_.getLong(0)).toSet
        (got intersect truth(id)).size
      }.sum
      hits.toDouble / (ids.size * 10)
    }
    assert(recalls.sliding(2).forall { case Seq(a, b) => b >= a }, recalls.toString)
    assert(recalls.last > recalls.head, recalls.toString) // wider ball finds strictly more here
  }

  test("probe count bounds the partitions read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vec2").toFile
    dir.deleteOnExit()
    VectorStorage.writeBucketed(embs, "embedding", dir.getAbsolutePath, planes = 4)
    val q = embs.where($"vec_id" === 1).select("embedding").head().getSeq[Float](0).toArray
    val noProbe = VectorStorage.topK(spark, dir.getAbsolutePath, "vec_id", "embedding",
      q, k = 3, planes = 4, probes = 0)
    // with probes=0 exactly one bucket value appears in the filter
    val p = noProbe.queryExecution.executedPlan.toString
    assert(p.contains("bucket"), p)
    assert(noProbe.count() <= 3)
  }

  test("quantizeInt8: known codes, error bound, zero vector, no shuffle") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f)),
      (3L, Seq(-2.0f, 1.0f, 0.5f))
    ).toDF("id", "vec")
    val q = VectorStorage.quantizeInt8(df, "id", "vec").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Byte](2)))).toMap
    // scale = max|x|/127; q = floor(x/scale + 0.5): half rounds toward +inf
    assert(math.abs(q(1L)._1 - 1.0 / 127) < 1e-12)
    assert(q(1L)._2 == Seq[Byte](127, -63, 32))
    // all-zero vector: scale 1, zero codes (not NaN/-128)
    assert(q(2L) == ((1.0, Seq[Byte](0, 0, 0))))
    assert(q(3L)._2 == Seq[Byte](-127, 64, 32))
    // reconstruction error ≤ scale/2 per dimension, codes within [-127,127]
    val rnd = new scala.util.Random(7)
    val big = (0 until 200).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 4 - 2))).toDF("id", "vec")
    val back = VectorStorage.quantizeInt8(big, "id", "vec").collect()
    val orig = big.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    back.foreach { r =>
      val scale = r.getDouble(1)
      val codes = r.getSeq[Byte](2)
      assert(codes.forall(c => c >= -127 && c <= 127))
      codes.zip(orig(r.getLong(0))).foreach { case (c, x) =>
        assert(math.abs(c * scale - x) <= scale / 2 + 1e-9)
      }
    }
    // map-only: a 4× storage shrink must not cost an exchange
    val plan = VectorStorage.quantizeInt8(big, "id", "vec")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
