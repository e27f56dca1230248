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
}
