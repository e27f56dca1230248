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
