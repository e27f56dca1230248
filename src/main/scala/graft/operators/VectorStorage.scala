package graft.operators

import graft.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hyperplane-bucket-partitioned parquet layout for embedding corpora — the
  * vector analog of [[SpatialStorage]]. Writing partitioned by LSH bucket
  * turns query-time ANN from a full corpus scan into a partition-pruned
  * read: only the query's bucket (plus hamming-probe neighbors) is listed
  * and scanned, visible as PartitionFilters in the scan node. At 100 TB
  * this is the difference between touching ~1/2^planes of the corpus and
  * all of it.
  *
  * The bucket function is the same fixed-seed [[graft.functions.TextOps
  * .hyperplaneBucket]] used by [[Ann.lshTopK]], so any session can compute
  * a query's bucket without metadata.
  */
object VectorStorage {

  /** Symmetric per-vector int8 scalar quantization — the storage half of
    * ANN at corpus scale (FAISS's SQ8): each vector stores one double
    * `scale` = max|x|/127 plus an int8 per dimension, a 4× shrink of a
    * float32 corpus (100 TB of embeddings → 25 TB) with reconstruction
    * error ≤ scale/2 per dimension. Returns `(idCol, scale, qvec)` with
    * `q = floor(x/scale + 0.5)` ∈ [-127, 127] (never -128: the formula
    * rounds half toward +∞ identically in any engine — no banker's/
    * HALF_UP divergence, which keeps the DuckDB oracle exact). An
    * all-zero vector quantizes under scale 1 to zeros. Map-only: no
    * shuffle, codegen'd `transform`/`aggregate` lambdas. Dequantize with
    * `transform(qvec, q -> q * scale)` for refine-stage exact rescoring
    * ([[Ann]]); bucket routing ([[writeBucketed]]) composes — quantize
    * the payload, keep routing on the original floats. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val maxAbs = aggregate(col(vecCol), lit(0.0f), (acc, x) => greatest(acc, abs(x)))
    df
      .select(col(idCol), col(vecCol),
        when(maxAbs === 0.0f, lit(1.0))
          .otherwise(maxAbs.cast("double") / 127.0).as("scale"))
      .select(col(idCol), col("scale"),
        transform(col(vecCol),
          x => floor(x.cast("double") / col("scale") + 0.5).cast("byte")).as("qvec"))
  }

  /** Writes `df` partitioned by the `planes`-bit hyperplane bucket of
    * `vecCol`. Pass the same `planes` at read time. */
  def writeBucketed(df: DataFrame, vecCol: String, path: String,
                    planes: Int = 8): Unit = {
    Graft.register(df.sparkSession)
    df.withColumn("bucket",
        call_function("hyperplane_bucket", col(vecCol), lit(planes)))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
  }

  /** Approximate top-k over a bucketed corpus: scans only the query bucket
    * and its hamming-≤`probes` neighbors via partition pruning, then exact
    * cosine + top-k inside the pruned set. Raising `probes` trades scanned
    * partitions (Σ C(planes,i), i ≤ probes of 2^planes) for recall. */
  def topK(spark: SparkSession, path: String, idCol: String, vecCol: String,
           query: Array[Float], k: Int,
           planes: Int = 8, probes: Int = 1): DataFrame = {
    Graft.register(spark)
    val qBucket = spark.range(1)
      .select(call_function("hyperplane_bucket", typedLit(query), lit(planes)))
      .head().getInt(0)
    val candidates = Ann.hammingBall(qBucket, planes, probes)
    spark.read.parquet(path)
      .where(col("bucket").isin(candidates: _*)) // prunes partitions
      .select(col(idCol).as("id"),
        call_function("cosine_similarity", col(vecCol), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }
}
