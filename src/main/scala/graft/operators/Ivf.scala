package graft.operators

import graft.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index — the centroid-routed alternative to the
  * hyperplane-LSH path ([[VectorStorage]]): spherical k-means centroids
  * partition the corpus; a query scans only its `nprobe` nearest
  * centroids' partitions (partition pruning), then ranks by exact cosine.
  *
  * Compared to LSH buckets, IVF adapts to the data distribution (clustered
  * corpora route far fewer candidates per probe) at the cost of a training
  * pass. Training uses Spark MLlib k-means on unit-normalized vectors
  * (Euclidean on the unit sphere ≡ spherical k-means ≡ cosine routing)
  * with a fixed seed — the index is deterministic for a given corpus.
  */
object Ivf {

  private val CentroidDir = "_graft_centroids" // _-prefix: invisible to readers

  /** Trains k centroids and writes the corpus partitioned by nearest
    * centroid. `path` gets the data partitions plus a `_graft_centroids`
    * parquet (ignored by `spark.read.parquet(path)` scans). */
  def writeIndexed(df: DataFrame, idCol: String, vecCol: String, path: String,
                   k: Int = 64, maxIter: Int = 10): Unit = {
    val spark = df.sparkSession
    Graft.register(spark)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    // unit-normalize so Euclidean k-means routes by angle (cosine); norm
    // computed once per vector, not per element
    val unit = df
      .withColumn("__norm", expr(
        s"greatest(sqrt(aggregate($vecCol, CAST(0.0 AS DOUBLE), " +
          s"(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), CAST(1e-30 AS DOUBLE))"))
      .withColumn("__unit", expr(
        s"transform($vecCol, x -> CAST(CAST(x AS DOUBLE) / __norm AS FLOAT))"))
    val feats = unit.withColumn("__features", array_to_vector(col("__unit")))
    val model = new KMeans().setK(k).setMaxIter(maxIter).setSeed(42L)
      .setFeaturesCol("__features").setPredictionCol("cluster")
      .fit(feats)
    model.transform(feats)
      .drop("__norm", "__unit", "__features")
      .write.mode("overwrite").partitionBy("cluster").parquet(path)

    val centers = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }
    import spark.implicits._
    centers.toSeq.toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/$CentroidDir")
  }

  /** Top-k by exact cosine over the `nprobe` partitions whose centroids are
    * nearest the query — everything else is pruned at the file listing. */
  def topK(spark: SparkSession, path: String, idCol: String, vecCol: String,
           query: Array[Float], k: Int, nprobe: Int = 4): DataFrame = {
    Graft.register(spark)
    val centroids = spark.read.parquet(s"$path/$CentroidDir")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val probeIds = centroids
      .map { case (id, c) => (id, cosine(c, query)) }
      .sortBy { case (id, cos) => (-cos, id) }
      .take(math.min(nprobe, centroids.length))
      .map(_._1)
    spark.read.parquet(path)
      .where(col("cluster").isin(probeIds.toIndexedSeq: _*)) // partition pruning
      .select(col(idCol).as("id"),
        call_function("cosine_similarity", col(vecCol), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
