package graft.operators

import graft.Graft
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (one scan + TakeOrdered — the right
  * plan when k is small; no shuffle of the corpus). Scale path: hyperplane
  * LSH restricts the scan to the query's bucket (plus hamming-1 probes),
  * turning a full scan into a partition-pruned one when the corpus is
  * bucketed/bucket-partitioned on `bucket`.
  */
object Ann {

  /** Exact cosine top-k by full scan. O(n·d) map + top-k reduce; at 100 TB
    * this is the correctness baseline and the fallback for OOV queries. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Array[Float], k: Int): DataFrame = {
    Graft.register(df.sparkSession)
    df.select(col(idCol).as("id"),
        call_function("cosine_similarity", col(vecCol),
          typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  /** LSH top-k: scan only buckets within hamming distance `probes` of the
    * query bucket (multi-probe improves recall without widening buckets). */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Array[Float], k: Int,
              planes: Int = 12, probes: Int = 1): DataFrame = {
    Graft.register(df.sparkSession)
    val spark = df.sparkSession
    val qBucket = spark.range(1)
      .select(call_function("hyperplane_bucket", typedLit(query), lit(planes)))
      .head().getInt(0)
    // query bucket + all buckets at hamming distance ≤ probes
    val candidates: Seq[Int] =
      if (probes <= 0) Seq(qBucket)
      else qBucket +: (0 until planes).map(p => qBucket ^ (1 << p))
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
        call_function("hyperplane_bucket", col(vecCol), lit(planes)).as("bucket"))
      .where(col("bucket").isin(candidates: _*))
      .select(col("id"),
        call_function("cosine_similarity", col("vec"), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }
}
