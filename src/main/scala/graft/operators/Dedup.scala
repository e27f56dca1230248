package graft.operators

import graft.Graft
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication at pipeline scale.
  *
  * Every variant is built from map-side hashing + equi-joins on bucket keys
  * — no O(n²) pair enumeration, no driver collect. Candidate pairs are
  * always refined with an exact measure before being reported.
  */
object Dedup {

  /** Exact dedup: one representative row (min id) per identical text.
    * Single hash-aggregate; at 100 TB group on a 128-bit hash of the text
    * rather than the full text to keep shuffle rows small. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash + LSH near-duplicate pairs.
    * shingle(k) → `numHashes` minhash sig → `bands` band-hash buckets →
    * bucket equi-join for candidates → exact shingle-Jaccard refine ≥
    * `threshold`. Probability of catching a pair with Jaccard j is
    * 1-(1-j^(numHashes/bands))^bands (standard S-curve). */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 5, numHashes: Int = 128, bands: Int = 32,
                   threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    Graft.register(df.sparkSession)
    val rows = numHashes / bands
    val sig = df.select(col(idCol).as("id"), col(textCol).as("text"),
      call_function("minhash_signature", col(textCol), lit(shingleK), lit(numHashes)).as("sig"))
    // one row per (band, hash-of-band-slice)
    val buckets = sig.select(col("id"), col("text"),
        explode(expr(
          s"transform(sequence(0, ${bands - 1}), b -> struct(b as band, hash(slice(sig, b * $rows + 1, $rows)) as h))"
        )).as("bucket"))
      .select(col("id"), col("text"), col("bucket.band"), col("bucket.h"))
    val a = buckets.toDF("id_a", "text_a", "band", "h")
    val b = buckets.toDF("id_b", "text_b", "band", "h")
    a.join(b, Seq("band", "h"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "text_a", "text_b")
      .dropDuplicates("id_a", "id_b") // same pair can collide in many bands
      .withColumn("jaccard",
        call_function("jaccard_shingles", col("text_a"), col("text_b"), lit(shingleK)))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-duplicate pairs: 64-bit simhash, block-permutation LSH
    * (4×16-bit blocks → any pair with hamming ≤ 3 shares ≥ 1 block),
    * exact hamming refine via bit_count(xor). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    Graft.register(df.sparkSession)
    val sig = df.select(col(idCol).as("id"),
      call_function("simhash64", col(textCol)).as("sim"))
    val blocks = sig.select(col("id"), col("sim"),
        explode(expr(
          "transform(sequence(0, 3), b -> struct(b as blk, shiftright(sim, b * 16) & 65535 as v))"
        )).as("block"))
      .select(col("id"), col("sim"), col("block.blk"), col("block.v"))
    val a = blocks.toDF("id_a", "sim_a", "blk", "v")
    val b = blocks.toDF("id_b", "sim_b", "blk", "v")
    a.join(b, Seq("blk", "v"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)"))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding near-duplicate pairs: hyperplane-LSH bucket join + exact
    * cosine refine ≥ `minCosine`. `planes` trades recall vs bucket size. */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     minCosine: Double = 0.95, planes: Int = 12): DataFrame = {
    Graft.register(df.sparkSession)
    val withBucket = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      call_function("hyperplane_bucket", col(vecCol), lit(planes)).as("bucket"))
    val a = withBucket.toDF("id_a", "vec_a", "bucket")
    val b = withBucket.toDF("id_b", "vec_b", "bucket")
    a.join(b, "bucket")
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", call_function("cosine_similarity", col("vec_a"), col("vec_b")))
      .where(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }

  /** N-gram-Jaccard duplicate report for a candidate pair set (exact
    * refinement used standalone when candidates come from elsewhere). */
  def jaccardRefine(pairs: DataFrame, textA: String, textB: String,
                    shingleK: Int, threshold: Double): DataFrame = {
    Graft.register(pairs.sparkSession)
    pairs.withColumn("jaccard",
        call_function("jaccard_shingles", col(textA), col(textB), lit(shingleK)))
      .where(col("jaccard") >= threshold)
  }
}
