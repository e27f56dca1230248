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
