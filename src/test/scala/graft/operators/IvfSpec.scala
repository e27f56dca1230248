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
}
