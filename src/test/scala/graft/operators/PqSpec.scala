package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Product quantization: exactness in the degenerate full-codebook case,
  * recall on clustered data, determinism, code compactness, map-only
  * encode/score plans. */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  private def syntheticClusters(nCenters: Int, perCenter: Int, dim: Int) = {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(nCenters, dim)(rnd.nextFloat() * 10 - 5)
    val rows = for {
      c <- 0 until nCenters
      i <- 0 until perCenter
    } yield ((c * perCenter + i).toLong,
      centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f).toSeq)
    (rows.toDF("id", "vec"), centers)
  }

  test("m=1 with k >= distinct vectors reproduces exact nearest neighbors") {
    // full codebook degenerates PQ to a lookup of the vectors themselves:
    // ADC distance == exact squared L2, so top-k matches brute force
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 40L).map(i => (i, Seq.fill(4)(rnd.nextFloat()))).toDF("id", "vec")
    val model = Pq.train(vecs, "id", "vec", m = 1, k = 64, iters = 25)
    val codes = Pq.encode(vecs, "id", "vec", model)
    val q = Array.fill(4)(rnd.nextFloat())
    val got = Pq.searchTopK(codes, "id", "codes", model, q, 5)
      .collect().map(_.getLong(0)).toSeq
    val want = vecs.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).zip(q).map { case (a, b) =>
        val d = a - b; d * d }.sum))
      .sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSeq
    assert(got == want)
  }

  test("clustered corpus: ADC top-10 recall vs brute force, 16x compression") {
    val (df, _) = syntheticClusters(nCenters = 16, perCenter = 50, dim = 16)
    val model = Pq.train(df, "id", "vec", m = 4, k = 16)
    assert(model.dsub == 4 && model.k == 16)
    val codes = Pq.encode(df, "id", "vec", model)
    // 16 dims × 4 bytes → 4 bytes of codes
    assert(codes.head.getAs[Array[Byte]](1).length == 4)
    val all = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val queries = Seq(3L, 250L, 777L)
    queries.foreach { qid =>
      val q = all.find(_._1 == qid).get._2
      val qCluster = qid / 50
      val exact10 = all.map { case (id, v) =>
        (id, v.zip(q).map { case (a, b) => val d = a - b; d * d }.sum) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
      // within a tight cluster every member shares one code, so ADC
      // cannot (and need not) rank INSIDE the cluster — the PQ contract
      // is recall@R: the exact top-10 sits inside the ADC top-50, and
      // every ADC top-10 hit is from the query's own cluster
      val approx50 = Pq.searchTopK(codes, "id", "codes", model, q, 50)
        .collect().map(_.getLong(0))
      assert(exact10.subsetOf(approx50.toSet), s"q=$qid missing exact neighbors")
      assert(approx50.take(10).forall(_ / 50 == qCluster),
        s"q=$qid strays: ${approx50.take(10).mkString(",")}")
    }
  }

  test("IVF-PQ composition: centroid routing, ADC candidates, float rescoring") {
    // unit-normalized clusters: cosine routing (Ivf) and L2 scoring (PQ)
    // rank identically on the sphere, so the composed pipeline's answer
    // must equal the brute-force top-10
    val (raw, _) = syntheticClusters(nCenters = 8, perCenter = 40, dim = 16)
    val df = raw.select(col("id"), expr(
      """transform(vec, x -> CAST(CAST(x AS DOUBLE) /
        |  sqrt(aggregate(vec, CAST(0.0 AS DOUBLE), (a, v) -> a + CAST(v AS DOUBLE) * v)) AS FLOAT))"""
        .stripMargin).as("vec"))
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString + "/idx"
    Ivf.writeIndexed(df, "id", "vec", path, k = 8)
    val all = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val q = all.find(_._1 == 100L).get._2
    // route: the 2 nearest centroids' partitions only (partition-pruned read)
    val centroids = spark.read.parquet(s"$path/_graft_centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val probes = centroids.sortBy { case (id, c) =>
      (-dot(c, q) / math.sqrt(dot(c, c) + 1e-30), id) }.take(2).map(_._1)
    val candidates = spark.read.parquet(path)
      .where(col("cluster").isin(probes.toIndexedSeq: _*))
    // ADC over the probed clusters' CODES, then exact rescoring on floats
    val model = Pq.train(df, "id", "vec", m = 4, k = 32)
    val codes = Pq.encode(candidates, "id", "vec", model)
    val cand = Pq.searchTopK(codes, "id", "codes", model, q, 60).select(col("id"))
    val rescored = candidates.join(cand, "id")
      .select(col("id"),
        call_function("cosine_similarity", col("vec"), typedLit(q.toSeq)).as("cos"))
      .orderBy(col("cos").desc, col("id")).limit(10)
      .collect().map(_.getLong(0)).toSeq
    val exact = all.map { case (id, v) => (id, dot(v, q)) }
      .sortBy { case (id, d) => (-d, id) }.take(10).map(_._1).toSeq
    assert(rescored == exact, s"got $rescored want $exact")
  }

  test("training is deterministic and bounded; encode/score plans are map-only") {
    val (df, _) = syntheticClusters(nCenters = 4, perCenter = 30, dim = 8)
    val m1 = Pq.train(df, "id", "vec", m = 2, k = 8)
    val m2 = Pq.train(df, "id", "vec", m = 2, k = 8)
    assert(m1.codebooks.flatten.flatten == m2.codebooks.flatten.flatten) // bit-equal
    // over-cap path: bounded deterministic sample still trains
    val m3 = Pq.train(df, "id", "vec", m = 2, k = 8, maxTrainVecs = 50)
    assert(m3.codebooks.length == 2 && m3.k == 8)
    val codes = Pq.encode(df, "id", "vec", m1)
    assert(!codes.queryExecution.executedPlan.toString.contains("Exchange"),
      codes.queryExecution.executedPlan)
    val top = Pq.searchTopK(codes, "id", "codes", m1, Array.fill(8)(0.0f), 3)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan) // no global sort exchange
    assert(top.count() == 3)
    // dimension guards fail loudly
    intercept[IllegalArgumentException] {
      Pq.searchTopK(codes, "id", "codes", m1, Array.fill(5)(0.0f), 3)
    }
    intercept[Exception] { Pq.train(df, "id", "vec", m = 3) } // 8 % 3 != 0
  }

  /** Axis-aligned cluster structure mixed ACROSS the m=2 subspace
    * boundary by a fixed global rotation: plain PQ must quantize the
    * mixed halves independently and pays for the cross-boundary
    * correlation; OPQ's learned rotation un-mixes it. */
  private def rotatedClusters(dim: Int) = {
    val rnd = new scala.util.Random(97)
    // a deterministic random orthogonal matrix via Gram-Schmidt
    val g = Array.fill(dim, dim)(rnd.nextGaussian())
    for (i <- 0 until dim) {
      for (p <- 0 until i) {
        val d = (0 until dim).map(j => g(i)(j) * g(p)(j)).sum
        for (j <- 0 until dim) g(i)(j) -= d * g(p)(j)
      }
      val n = math.sqrt((0 until dim).map(j => g(i)(j) * g(i)(j)).sum)
      for (j <- 0 until dim) g(i)(j) /= n
    }
    // product of two independent 16-cluster half-spaces + small noise,
    // then mix by g: after un-mixing, k=16 per subspace captures each
    // half almost exactly; in the mixed basis each half sees BOTH
    // cluster choices and 16 centroids cannot cover the 256 combinations
    val half = dim / 2
    val centersA = Array.fill(16, half)(rnd.nextGaussian() * 4.0)
    val centersB = Array.fill(16, half)(rnd.nextGaussian() * 4.0)
    val rows = (0 until 600).map { i =>
      val a = centersA(rnd.nextInt(16)); val b = centersB(rnd.nextInt(16))
      val axis = Array.tabulate(dim)(j =>
        (if (j < half) a(j) else b(j - half)) + rnd.nextGaussian() * 0.05)
      val mixed = Array.tabulate(dim)(j =>
        (0 until dim).map(l => axis(l) * g(l)(j)).sum.toFloat)
      (i.toLong, mixed.toSeq)
    }
    rows.toDF("id", "vec")
  }

  test("OPQ: learned rotation beats plain PQ on cross-subspace structure; " +
      "search answers original-space queries") {
    val df = rotatedClusters(dim = 8)
    val sample = df.collect().map(_.getSeq[Float](1).toArray)
    val pq = Pq.train(df, "id", "vec", m = 2, k = 16, iters = 15)
    val opq = Pq.trainOpq(df, "id", "vec", m = 2, k = 16, iters = 15, opqIters = 6)
    // rotation is orthogonal: RᵀR ≈ I
    val r = opq.rotation
    for (i <- r.indices; j <- r.indices) {
      val dot = r.indices.map(l => r(l)(i).toDouble * r(l)(j)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-4, s"RtR($i,$j)=$dot")
    }
    val pqMse = Pq.quantizationMse(sample, pq)
    val opqMse = Pq.quantizationMse(sample, opq.pq, Some(opq.rotation))
    assert(opqMse < 0.8 * pqMse,
      s"OPQ must reduce quantization error: pq=$pqMse opq=$opqMse")
    // end-to-end: ADC over OPQ codes answers an ORIGINAL-space query.
    // Rows sharing the probe's cluster combo quantize to the SAME code
    // (ties break by id), so the guarantee is membership in a top-k that
    // covers the cell population (~600/256 rows), not top-1
    val probe = sample(123).clone()
    probe(0) += 0.01f
    val codes = Pq.encodeOpq(df, "id", "vec", opq)
    val top = Pq.searchTopKOpq(codes, "id", "codes", opq, probe, 10)
      .collect().map(_.getLong(0))
    assert(top.contains(123L), top.mkString(","))
    // deterministic retrain
    val opq2 = Pq.trainOpq(df, "id", "vec", m = 2, k = 16, iters = 15, opqIters = 6)
    assert(opq2.rotation.flatten.toSeq == opq.rotation.flatten.toSeq)
  }
}
