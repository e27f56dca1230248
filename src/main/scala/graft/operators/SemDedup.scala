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
  * Scale shape (100 TB): training is bounded-sample (cost independent
  * of corpus size) and HYBRID — below a flops budget it runs driver-
  * local with the bit-deterministic [[Pq]] k-means on an id-sorted
  * sample (no per-iteration Spark jobs, verdicts independent of input
  * layout); past it, distributed MLlib with a fixed seed (bit-identical
  * per input layout — the [[Ivf]] caveat). `k` ≈ √n so mean cluster
  * size grows as √n; the assignment pass is
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
             maxClusterRows: Long = 100000L,
             maxDriverFlops: Long = 2000000000L): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    val spark = df.sparkSession
    Graft.register(spark)

    // unit-normalize once: Euclidean k-means on the unit sphere routes by
    // angle, and the sweep's pairwise cosine becomes a plain dot product
    val unit = df
      .select(col(idCol).as("id"), col(vecCol).as("__vec"))
      .withColumn("__norm", expr(
        "greatest(sqrt(aggregate(__vec, CAST(0.0 AS DOUBLE), " +
          "(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), CAST(1e-30 AS DOUBLE))"))
      .withColumn("__unit", expr(
        "transform(__vec, x -> CAST(CAST(x AS DOUBLE) / __norm AS FLOAT))"))
      .drop("__vec", "__norm")

    // ONE setup job (round 15; was two): corpus count and vector dim —
    // first() over an unordered frame is the same arbitrary-row dim the
    // old head() read
    val nd = df.agg(count(lit(1)), first(size(col(vecCol)))).head()
    val n = nd.getLong(0)
    require(n > 0, "cannot deduplicate an empty corpus")
    val effectiveK = {
      val auto = if (k > 0) k.toLong else math.round(math.sqrt(n.toDouble)).max(16L).min(4096L)
      auto.min(n).toInt
    }
    val dim = nd.getInt(1)
    val sampleN = math.min(n, math.max(trainSampleSize.toLong, 10L * effectiveK))

    // Training is a bounded, corpus-size-independent workload — so below
    // `maxDriverFlops` (k·sample·dim·iters) it runs DRIVER-LOCAL with the
    // bit-deterministic Pq k-means on an id-SORTED sample: no per-
    // iteration Spark jobs (measured ~5 s of pure scheduler overhead on
    // a 4k-vector corpus), and the centroids — hence every verdict —
    // become independent of the input layout. Past the budget (big k ×
    // big sample × wide vectors) distributed MLlib takes over; its
    // k-means|| init samples per partition, so THAT path is
    // deterministic per layout only (the Ivf caveat).
    val flops = effectiveK.toLong * sampleN * dim * math.max(maxIter, 1)
    val assigned: DataFrame =
      if (flops <= maxDriverFlops)
        assignDriverLocal(unit, n, sampleN, effectiveK, maxIter)
      else
        assignMllib(unit, n, sampleN, effectiveK, maxIter)

    // skew guard: bounded collect (one count per centroid), then a
    // per-cluster sign-bit mask — masking the low bits of ONE signature
    // column is the same as using fewer planes, so every cluster reads
    // its sub-key from the same codegen'd kernel call.
    // r14: SKIPPED when n <= maxClusterRows — no cluster can exceed the
    // cap then, so the counting pass (a full scan that re-evaluates the
    // assignment UDF, plus a shuffle and a driver collect) proves
    // nothing; its absence leaves every nbits at 0, the same verdicts
    // (measured: one of the gate's two corpus-wide UDF passes gone)
    val clusterCounts =
      if (n <= maxClusterRows) Map.empty[Int, Long]
      else assigned.groupBy("cluster").count().collect()
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

  /** Driver-local training + broadcast assignment. The sample collects
    * once (≤ sampleN·dim floats — bounded by the flops budget), sorts by
    * the id's string rendering so the k-means seeding cannot depend on
    * partition order, and the assignment UDF does one primitive-array
    * pass per row: argmin Euclidean ≡ argmax (v·c − |c|²/2) for unit v,
    * first-wins ties like MLlib. */
  private def assignDriverLocal(unit: DataFrame, n: Long, sampleN: Long,
                                k: Int, iters: Int): DataFrame = {
    val spark = unit.sparkSession
    val sampled =
      if (n <= sampleN) unit
      else Corpus.sampleByHash(unit, "id", sampleN.toDouble / n, "semdedup-train")
    val pts = sampled.select(col("id").cast("string"), col("__unit"))
      .collect()
      .sortBy(_.getString(0))
      .map { r =>
        val s = r.getSeq[Float](1)
        val a = new Array[Float](s.length)
        var i = 0
        while (i < a.length) { a(i) = s(i); i += 1 }
        a
      }
    val centroids = Pq.kmeans(pts, k, iters).toArray
    val halfSq = centroids.map(c => c.map(x => x.toDouble * x).sum / 2.0)
    val norms = centroids.map(c => math.sqrt(c.map(x => x.toDouble * x).sum).max(1e-30))
    val bc = spark.sparkContext.broadcast((centroids, halfSq, norms))
    val assignU = udf { (v: Array[Float]) =>
      val (cen, half, nrm) = bc.value
      var best = 0
      var bestScore = Double.NegativeInfinity
      var bestDot = 0.0
      var c = 0
      while (c < cen.length) {
        val cc = cen(c)
        val len = math.min(v.length, cc.length)
        var dot = 0.0
        var j = 0
        while (j < len) { dot += v(j).toDouble * cc(j); j += 1 }
        val score = dot - half(c)
        if (score > bestScore) { bestScore = score; best = c; bestDot = dot }
        c += 1
      }
      (best, bestDot / nrm(best))
    }
    unit.withColumn("__a", assignU(col("__unit")))
      .select(col("id"), col("__a._1").as("cluster"),
        col("__a._2").as("centroid_cos"), col("__unit"))
  }

  /** Distributed MLlib training for configurations past the driver flops
    * budget; assignment via `model.transform` + a broadcast centroid
    * join for the centroid cosine. */
  private def assignMllib(unit: DataFrame, n: Long, sampleN: Long,
                          k: Int, iters: Int): DataFrame = {
    val spark = unit.sparkSession
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = unit.withColumn("__features", array_to_vector(col("__unit")))
    val trainSet =
      if (n <= sampleN) feats
      else feats.sample(withReplacement = false,
        fraction = math.min(1.0, sampleN.toDouble / n), seed = 42L)
    val model = new KMeans().setK(k).setMaxIter(iters).setSeed(42L)
      .setFeaturesCol("__features").setPredictionCol("cluster")
      .fit(trainSet)
    val centersDf = {
      import spark.implicits._
      model.clusterCenters.zipWithIndex
        .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
        .toSeq.toDF("cluster", "__centroid")
    }
    model.transform(feats)
      .drop("__features")
      .join(broadcast(centersDf), "cluster")
      .withColumn("centroid_cos",
        call_function("cosine_similarity", col("__unit"), col("__centroid")))
      .drop("__centroid")
      .select(col("id"), col("cluster"), col("centroid_cos"), col("__unit"))
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
