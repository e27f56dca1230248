package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IvfSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("IVF index routes queries to centroid partitions and finds the query itself") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toFile
    dir.deleteOnExit()
    Ivf.writeIndexed(embs, "vec_id", "embedding", dir.getAbsolutePath, k = 8, maxIter = 5)

    val q = embs.where($"vec_id" === 0).select("embedding").head().getSeq[Float](0).toArray
    val df = Ivf.topK(spark, dir.getAbsolutePath, "vec_id", "embedding", q, k = 5, nprobe = 2)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cluster"), p)

    val rows = df.collect()
    assert(rows.nonEmpty)
    // the query vector lives in its own nearest-centroid partition → always found
    assert(rows.head.getAs[Long]("id") == 0L)
    assert(math.abs(rows.head.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("skew cap: oversized clusters sub-split, full probe still equals brute force") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf3").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    // tiny cap forces every cluster over 50 rows to hash-split
    Ivf.writeIndexed(embs, "vec_id", "embedding", path, k = 4, maxIter = 3,
      maxPartitionRows = 50L)
    val clusterDirs = new java.io.File(path).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("cluster="))
    val subDirs = clusterDirs.flatMap(_.listFiles)
      .filter(f => f.isDirectory && f.getName.startsWith("subpart="))
    assert(subDirs.length > clusterDirs.length, // at least one cluster actually split
      s"clusters=${clusterDirs.length} subparts=${subDirs.length}")

    val q = embs.where($"vec_id" === 3).select("embedding").head().getSeq[Float](0).toArray
    val ivf = Ivf.topK(spark, path, "vec_id", "embedding", q, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), math.floor(r.getDouble(1) * 1e6) / 1e6)).toSeq
    val brute = Ann.bruteForceTopK(embs, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getLong(0), math.floor(r.getDouble(1) * 1e6) / 1e6)).toSeq
    assert(ivf == brute)
  }

  test("k=0 auto-sizes the centroid count to ~sqrt(n) and trains on a bounded sample") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf4").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    val n = embs.count()
    Ivf.writeIndexed(embs, "vec_id", "embedding", path, maxIter = 2,
      trainSampleSize = 200) // sample smaller than the corpus: exercises the sample path
    val expected = math.round(math.sqrt(n.toDouble)).max(16L).min(4096L).min(n)
    val centroids = spark.read.parquet(s"$path/_graft_centroids").count()
    assert(centroids == expected, s"n=$n expected=$expected centroids=$centroids")
  }

  test("IVF-PQ: codes-only store, centroid pruning, degenerate full probe = brute force") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    val sub = embs.where($"vec_id" < 200).select($"vec_id", $"embedding")
    // degenerate-exact PQ (m=1, codebook >= corpus): ADC == exact sq L2
    val model = Ivf.writeIndexedPq(sub, "vec_id", "embedding", path,
      pqM = 1, pqK = 256, k = 4, maxIter = 3)
    assert(model.m == 1 && model.k == 200) // every vector its own centroid
    // the 100 TB shape: data files carry (id, codes), NOT the float vectors
    val stored = spark.read.parquet(path)
    assert(stored.columns.toSet == Set("vec_id", "codes", "cluster", "subpart"),
      stored.columns.mkString(","))
    // the persisted model round-trips
    val loaded = Ivf.loadPqModel(spark, path)
    assert(loaded.dim == model.dim && loaded.m == model.m &&
      loaded.codebooks.map(_.map(_.toSeq)) == model.codebooks.map(_.map(_.toSeq)))

    val q = sub.where($"vec_id" === 0).select("embedding").head().getSeq[Float](0).toArray
    // partial probe prunes centroid partitions at the file listing
    val pruned = Ivf.topKPq(spark, path, "vec_id", q, n = 5, nprobe = 1)
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cluster"), p)
    assert(pruned.collect().head.getLong(0) == 0L) // own partition has the query

    // full probe + degenerate model: exactly brute-force squared L2
    val got = Ivf.topKPq(spark, path, "vec_id", q, n = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = sub.collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
      var d = 0.0; var j = 0
      while (j < v.length) { val t = v(j).toDouble - q(j).toDouble; d += t * t; j += 1 }
      (r.getLong(0), BigDecimal(d) // Spark round() semantics: HALF_UP
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, d) => (d, id) }.take(10).toSeq
    assert(got == brute, s"\ngot  $got\nwant $brute")
  }

  test("IVF-PQ at realistic m=8/k=256: pruned probe keeps recall on clustered data") {
    // non-degenerate serving configuration (the q_ivf_pq gate pins only
    // the m=1 exact case): 8 sub-quantizers of 256 centroids over a
    // planted 16-cluster corpus, probing 4 of 16 coarse partitions.
    val rnd = new scala.util.Random(19)
    val dim = 16
    val centers = Array.fill(16, dim)(rnd.nextFloat() * 10 - 5)
    val rows = for { c <- 0 until 16; i <- 0 until 100 } yield
      ((c * 100 + i).toLong,
        centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.4f).toSeq)
    val df = rows.toDF("id", "vec")
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq-m8").toString + "/idx"
    Ivf.writeIndexedPq(df, "id", "vec", path, pqM = 8, pqK = 256, k = 16, maxIter = 5)

    val all = rows.map { case (id, v) => (id, v.toArray) }
    Seq(42L, 505L, 1337L).foreach { qid =>
      val q = all.find(_._1 == qid).get._2
      val exact10 = all.map { case (id, v) =>
        (id, v.zip(q).map { case (a, b) => val d = a.toDouble - b; d * d }.sum)
      }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
      val probed = Ivf.topKPq(spark, path, "id", q, n = 50, nprobe = 4)
      // nprobe < k: the scan must prune at the file listing
      val plan = probed.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cluster"), plan)
      val adc50 = probed.collect().map(_.getLong(0))
      // recall contract (the PqSpec bound, now THROUGH the store + pruned
      // listing): all exact top-10 inside the ADC top-50, and the ADC
      // top-10 stays inside the query's own planted cluster
      val recall = exact10.count(adc50.toSet).toDouble / 10
      assert(recall == 1.0, s"q=$qid recall@10-in-50 = $recall")
      assert(adc50.take(10).forall(_ / 100 == qid / 100),
        s"q=$qid strays: ${adc50.take(10).mkString(",")}")
    }
  }

  test("unnormalized corpus: L2 routing probes the partition angular routing would prune") {
    // the FAISS one-metric invariant: ADC scores squared L2, so routing
    // must too. Cluster A sits far out along +x (magnitude ~100), cluster
    // B near the origin; the query points along +x but is CLOSE to B —
    // cosine picks A's centroid (alignment), L2 picks B's (distance).
    val rnd = new scala.util.Random(7)
    val dim = 8
    def jitter() = (rnd.nextFloat() - 0.5f) * 0.1f
    val a = (0L until 50L).map(i => (i,
      Seq.tabulate(dim)(j => (if (j == 0) 100f else 0f) + jitter())))
    val b = (50L until 100L).map(i => (i,
      Seq.tabulate(dim)(j => (if (j == 1) 0.5f else 0f) + jitter())))
    val df = (a ++ b).toDF("id", "vec")
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq-l2").toString + "/idx"
    Ivf.writeIndexedPq(df, "id", "vec", path, pqM = 4, pqK = 64, k = 2, maxIter = 5)

    val q = Array.tabulate(dim)(j => if (j == 0) 3f else 0f)
    // sanity: angular routing WOULD have picked cluster A's centroid
    val cents = spark.read.parquet(s"$path/_graft_centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    def cos(x: Array[Float], y: Array[Float]) = {
      val d = x.zip(y).map { case (p, r2) => p.toDouble * r2 }.sum
      d / (math.sqrt(x.map(v => v.toDouble * v).sum) * math.sqrt(y.map(v => v.toDouble * v).sum))
    }
    def sq(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (p, r2) => val t = p.toDouble - r2; t * t }.sum
    val byCos = cents.maxBy { case (_, c) => cos(c, q) }._1
    val byL2 = cents.minBy { case (_, c) => sq(c, q) }._1
    assert(byCos != byL2, "fixture must separate the metrics")

    // with one probe, topKPq must land in the TRUE L2-nearest cluster (B)
    val got = Ivf.topKPq(spark, path, "id", q, n = 10, nprobe = 1)
      .collect().map(_.getLong(0))
    assert(got.forall(_ >= 50L), s"angular-routed miss: ${got.mkString(",")}")
  }

  test("full-probe IVF equals brute force (pruning is the only approximation)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf2").toFile
    dir.deleteOnExit()
    Ivf.writeIndexed(embs, "vec_id", "embedding", dir.getAbsolutePath, k = 4, maxIter = 3)
    val q = embs.where($"vec_id" === 7).select("embedding").head().getSeq[Float](0).toArray
    val ivf = Ivf.topK(spark, dir.getAbsolutePath, "vec_id", "embedding", q, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), math.floor(r.getDouble(1) * 1e6) / 1e6)).toSeq
    val brute = Ann.bruteForceTopK(embs, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getLong(0), math.floor(r.getDouble(1) * 1e6) / 1e6)).toSeq
    assert(ivf == brute)
  }

  test("IVF-OPQ store: rotation persists in the sidecar, query rotates once, " +
      "recall >= the plain-PQ floor at identical m/k") {
    // cross-subspace structure: each cluster varies along ONE dense
    // direction that straddles every m=4 subspace boundary — the case
    // OPQ's learned rotation exists for
    val rnd = new scala.util.Random(77)
    val dim = 16
    val centers = Array.fill(12, dim)(rnd.nextFloat() * 8 - 4)
    val dirs = Array.fill(12, dim)(rnd.nextFloat() - 0.5f)
    val rows = for { c <- 0 until 12; i <- 0 until 80 } yield {
      val t = (rnd.nextFloat() - 0.5f) * 4
      ((c * 80 + i).toLong,
        centers(c).zip(dirs(c)).map { case (x, d) =>
          x + d * t + (rnd.nextFloat() - 0.5f) * 0.05f }.toSeq)
    }
    val df = rows.toDF("id", "vec")
    val base = java.nio.file.Files.createTempDirectory("graft-ivfopq").toString
    val pPq = base + "/pq"; val pOpq = base + "/opq"
    Ivf.writeIndexedPq(df, "id", "vec", pPq, pqM = 4, pqK = 16, k = 12, maxIter = 5)
    val opq = Ivf.writeIndexedOpq(df, "id", "vec", pOpq, pqM = 4, pqK = 16,
      k = 12, maxIter = 5, opqIters = 6)

    // the rotation round-trips through the _graft_pq sidecar; a plain-PQ
    // store loads with NO rotation (back-compat)
    val (_, rot) = Ivf.loadPqModelWithRotation(spark, pOpq)
    assert(rot.isDefined && rot.get.length == dim)
    assert(rot.get.flatten.toSeq == opq.rotation.flatten.toSeq)
    assert(Ivf.loadPqModelWithRotation(spark, pPq)._2.isEmpty)

    val all = rows.map { case (id, v) => (id, v.map(_.toFloat).toArray) }
    def recallAt(path: String): Double = {
      val qids = Seq(40L, 333L, 777L)
      qids.map { qid =>
        val q = all.find(_._1 == qid).get._2
        val exact10 = all.map { case (id, v) =>
          (id, v.zip(q).map { case (a, b) => val d = a.toDouble - b; d * d }.sum)
        }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
        // STRICT top-10 (no slack set): the configuration where PQ-vs-OPQ
        // code quality is visible — measured 0.40 vs 0.57 on this corpus
        val got = Ivf.topKPq(spark, path, "id", q, n = 10, nprobe = 12)
          .collect().map(_.getLong(0)).toSet
        exact10.count(got).toDouble / 10
      }.sum / qids.size
    }
    // full probe on both stores: the ONLY difference is PQ vs OPQ codes
    val rPq = recallAt(pPq); val rOpq = recallAt(pOpq)
    assert(rOpq >= rPq, s"OPQ store recall $rOpq < plain-PQ floor $rPq")
    assert(rOpq >= 0.5, s"OPQ store recall $rOpq below the expected band")
    // pruned serving still prunes at the file listing on the OPQ store
    val probed = Ivf.topKPq(spark, pOpq, "id", all.head._2, n = 5, nprobe = 3)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"), plan)
  }
}
