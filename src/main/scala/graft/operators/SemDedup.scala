package graft.operators

import graft.Graft
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
  * deduplication over an embedding corpus — the layer that catches what
  * the text-level near-dup family (MinHash / SimHash / ExactSubstr)
  * cannot: translations, paraphrases, and templated rewrites that share
  * meaning but few n-grams. k-means partitions the embedding space;
  * within each cluster, items whose pairwise cosine reaches `tau`
  * collapse to ONE representative. The paper keeps, within a duplicate
  * neighborhood, the item with the LOWEST cosine to the cluster
  * centroid (the most peripheral — it preserves diversity); this
  * implementation reproduces that with a deterministic greedy sweep in
  * ascending (centroid-cosine, id) order: an item is dropped iff an
  * earlier-swept clustermate already kept within `tau`.
  *
  * Scale shape (100 TB): training is the [[Ivf]] recipe — MLlib k-means
  * on a bounded sample (cost independent of corpus size), fixed seed
  * (re-runs on the same input layout are bit-identical; k-means|| init
  * samples per partition, so a RELAID corpus can shift cluster ids —
  * the Ivf caveat — while the dedup invariants hold), `k` ≈ √n so mean
  * cluster size grows as √n; the assignment pass is
  * map-only against broadcast centroids; the sweep needs each cluster
  * co-resident in one task, so clusters past `maxClusterRows` are
  * sub-split by hyperplane sign bits (near-identical vectors share
  * their signs — a split can only lose a duplicate pair that straddles
  * a plane, the standard LSH trade, vanishingly rare at dedup-grade
  * `tau`) and task memory stays bounded. Nothing ever forms
  * cross-cluster pairs: total compare cost is Σ|c|·|kept_c|·dim, never
  * n². Both passes are map-only over the source (one for cluster
  * counts, one for the sweep's single shuffle) — persist the input
  * upstream if a run cannot afford the second scan.
  */
object SemDedup {

  /** Per-row verdicts: `(id, cluster, centroid_cos, kept)`. `kept=false`
    * rows are the semantic duplicates [[dedup]] removes; callers join
    * verdicts back to the corpus by id.
    *
    * @param tau  cosine at or above which two clustermates are the same
    *             semantic item (the paper sweeps 0.95-0.999)
    * @param k    centroid count; 0 (default) = auto ≈ √n in [16, 4096]
    * @param maxClusterRows clusters larger than this are hyperplane-
    *             sub-split so one hot cluster cannot become a straggler
    *             task (or exhaust its memory)
    */
  def assign(df: DataFrame, idCol: String, vecCol: String, tau: Double,
             k: Int = 0, maxIter: Int = 10, trainSampleSize: Int = 100000,
             maxClusterRows: Long = 100000L): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    val spark = df.sparkSession
    Graft.register(spark)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    // unit-normalize once: Euclidean k-means on the unit sphere routes by
    // angle, and the sweep's pairwise cosine becomes a plain dot product
    val unit = df
      .select(col(idCol).as("id"), col(vecCol).as("__vec"))
      .withColumn("__norm", expr(
        "greatest(sqrt(aggregate(__vec, CAST(0.0 AS DOUBLE), " +
          "(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), CAST(1e-30 AS DOUBLE))"))
      .withColumn("__unit", expr(
        "transform(__vec, x -> CAST(CAST(x AS DOUBLE) / __norm AS FLOAT))"))
      .withColumn("__features", array_to_vector(col("__unit")))
      .drop("__vec", "__norm")

    val n = df.count()
    require(n > 0, "cannot deduplicate an empty corpus")
    val effectiveK = {
      val auto = if (k > 0) k.toLong else math.round(math.sqrt(n.toDouble)).max(16L).min(4096L)
      auto.min(n).toInt
    }
    val target = math.max(trainSampleSize.toLong, 10L * effectiveK)
    val trainSet =
      if (n <= target) unit
      else unit.sample(withReplacement = false,
        fraction = math.min(1.0, target.toDouble / n), seed = 42L)
    val model = new KMeans().setK(effectiveK).setMaxIter(maxIter).setSeed(42L)
      .setFeaturesCol("__features").setPredictionCol("cluster")
      .fit(trainSet)

    val centersDf = {
      import spark.implicits._
      model.clusterCenters.zipWithIndex
        .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
        .toSeq.toDF("cluster", "__centroid")
    }
    val assigned = model.transform(unit)
      .drop("__features")
      .join(broadcast(centersDf), "cluster")
      .withColumn("centroid_cos",
        call_function("cosine_similarity", col("__unit"), col("__centroid")))
      .drop("__centroid")

    // skew guard: bounded collect (one count per centroid), then a
    // per-cluster sign-bit mask — masking the low bits of ONE signature
    // column is the same as using fewer planes, so every cluster reads
    // its sub-key from the same codegen'd kernel call
    val clusterCounts = assigned.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nbits = clusterCounts.map { case (c, cnt) =>
      c -> math.min(24, math.max(0,
        math.ceil(math.log(cnt.toDouble / maxClusterRows) / math.log(2.0)).toInt))
    }
    val maxBits = if (nbits.isEmpty) 0 else nbits.values.max
    val keyed =
      if (maxBits == 0) assigned.withColumn("__sub", lit(0))
      else {
        import spark.implicits._
        val masks = broadcast(nbits.toSeq.map { case (c, b) => (c, (1 << b) - 1) }
          .toDF("cluster", "__mask"))
        assigned.join(masks, "cluster")
          .withColumn("__sub",
            call_function("hyperplane_bucket", col("__unit"), lit(maxBits))
              .bitwiseAND(col("__mask")))
          .drop("__mask")
      }

    // the sweep: co-locate each (cluster, sub) and walk it in ascending
    // (centroid_cos, id) order so the paper's keep-the-peripheral rule
    // falls out of greedy order. One shuffle; vectors travel once.
    val prepared = keyed.select(col("id"), col("cluster"), col("__sub"),
        col("centroid_cos"), col("__unit"))
      .repartition(col("cluster"), col("__sub"))
      .sortWithinPartitions(col("cluster"), col("__sub"),
        col("centroid_cos").asc, col("id").asc)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      prepared.schema("id"),
      prepared.schema("cluster"),
      prepared.schema("centroid_cos"),
      org.apache.spark.sql.types.StructField("kept",
        org.apache.spark.sql.types.BooleanType, nullable = false)))
    val verdicts = prepared.rdd.mapPartitions { it =>
      // per-(cluster, sub) state; groups are contiguous after the sort.
      // keptVecs is bounded by maxClusterRows (the sub-split guarantee).
      var curCluster = Int.MinValue
      var curSub = Int.MinValue
      val keptVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
      it.map { row =>
        val cluster = row.getInt(1)
        val sub = row.getInt(2)
        if (cluster != curCluster || sub != curSub) {
          curCluster = cluster; curSub = sub; keptVecs.clear()
        }
        // one boxed→primitive copy per row; the pairwise loop below runs
        // on primitive arrays (the Pq encode lesson)
        val seq = row.getSeq[Float](4)
        val v = new Array[Float](seq.length)
        var i = 0
        while (i < v.length) { v(i) = seq(i); i += 1 }
        val dup = keptVecs.exists(kv => dot(kv, v) >= tau)
        if (!dup) keptVecs += v
        Row(row.get(0), cluster, row.getDouble(3), !dup)
      }
    }
    spark.createDataFrame(verdicts, schema)
  }

  /** The corpus minus its semantic duplicates: every input column, one
    * representative per `tau`-neighborhood (the paper's lowest-
    * centroid-cosine member). */
  def dedup(df: DataFrame, idCol: String, vecCol: String, tau: Double,
            k: Int = 0, maxIter: Int = 10, trainSampleSize: Int = 100000,
            maxClusterRows: Long = 100000L): DataFrame = {
    val verdicts = assign(df, idCol, vecCol, tau, k, maxIter,
      trainSampleSize, maxClusterRows)
    df.join(verdicts.where(col("kept")).select(col("id").as(idCol)), idCol)
  }

  /** Unit-vector dot product = cosine (inputs are pre-normalized). */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    val len = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < len) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
}
