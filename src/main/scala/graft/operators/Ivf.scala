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
  *
  * Scale shape (100 TB): training runs on a bounded random sample (k-means
  * cost is independent of corpus size), `k` defaults to ≈√n so the
  * partition count grows with the corpus, and any cluster the data skews
  * into is sub-split at `maxPartitionRows` so no single directory becomes
  * a multi-TB partition. Probe cost stays ∝ nprobe/k of the corpus.
  */
object Ivf {

  private val CentroidDir = "_graft_centroids" // _-prefix: invisible to readers

  /** Trains centroids and writes the corpus partitioned by nearest
    * centroid. `path` gets the data partitions plus a `_graft_centroids`
    * parquet (ignored by `spark.read.parquet(path)` scans).
    *
    * @param k     centroid count; 0 (default) = auto ≈ √n, clamped to
    *              [16, 4096]
    * @param trainSampleSize  k-means trains on a random sample of about
    *              this many vectors (never less than 10·k expected) —
    *              training cost is bounded regardless of corpus size
    * @param maxPartitionRows clusters larger than this are hash-sub-split
    *              into `subpart` partitions of at most about this many
    *              rows, so skewed corpora cannot produce giant partitions
    * @param metric "cosine" (default): vectors unit-normalize before
    *              k-means, so assignment and probe routing are angular —
    *              pair with [[topK]]'s exact-cosine rescoring. "l2":
    *              k-means runs on the RAW vectors and routing is squared
    *              L2 — the metric [[Pq]] ADC scores with, so IVF-PQ
    *              stores use it (FAISS IndexIVFPQ keeps the coarse
    *              quantizer and PQ on ONE metric for exactly this
    *              reason: angular routing over an unnormalized corpus
    *              can prune the partition holding the true L2-nearest
    *              neighbor). The metric persists in the centroid sidecar
    *              and serving reads it back — a store never gets probed
    *              with the wrong metric.
    */
  def writeIndexed(df: DataFrame, idCol: String, vecCol: String, path: String,
                   k: Int = 0, maxIter: Int = 10,
                   trainSampleSize: Int = 100000,
                   maxPartitionRows: Long = 1000000L,
                   dropCols: Seq[String] = Nil,
                   metric: String = "cosine",
                   maxDriverFlops: Long = 2000000000L): Unit = {
    val spark = df.sparkSession
    Graft.register(spark)
    require(metric == "cosine" || metric == "l2", s"metric must be cosine|l2, got $metric")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    // cosine: unit-normalize so Euclidean k-means routes by angle; norm
    // computed once per vector, not per element. l2: raw vectors.
    // `__feat` is the plain float-array form the driver-local trainer
    // and assignment kernel read; `__features` the MLlib vector view.
    def featurizeArr(d: DataFrame): DataFrame =
      if (metric == "l2")
        d.withColumn("__feat",
          expr(s"transform($vecCol, x -> CAST(x AS FLOAT))"))
      else d
        .withColumn("__norm", expr(
          s"greatest(sqrt(aggregate($vecCol, CAST(0.0 AS DOUBLE), " +
            s"(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), CAST(1e-30 AS DOUBLE))"))
        .withColumn("__feat", expr(
          s"transform($vecCol, x -> CAST(CAST(x AS DOUBLE) / __norm AS FLOAT))"))
    def featurize(d: DataFrame): DataFrame =
      featurizeArr(d).withColumn("__features", array_to_vector(col("__feat")))

    // ONE setup job (round 15; was two): corpus count and vector dim —
    // first() over an unordered frame is the same arbitrary-row dim the
    // old head() read
    val nd = df.agg(count(lit(1)), first(size(col(vecCol)))).head()
    val n = nd.getLong(0)
    require(n > 0, "cannot index an empty corpus")
    val effectiveK = {
      val auto = if (k > 0) k.toLong else math.round(math.sqrt(n.toDouble)).max(16L).min(4096L)
      auto.min(n).toInt
    }

    // bounded training sample: k-means cost must not scale with the corpus.
    // Sample the RAW rows, then featurize — sampling above the projection
    // would normalize the full corpus only to discard most of it.
    val target = math.max(trainSampleSize.toLong, 10L * effectiveK)
    val sampled =
      if (n <= target) df
      else df.sample(withReplacement = false, fraction = math.min(1.0, target.toDouble / n), seed = 42L)

    // Training is a bounded, corpus-size-independent workload — the
    // SemDedup hybrid (r14): below a flops budget (k·sample·dim·iters) it
    // runs DRIVER-LOCAL with the bit-deterministic Pq k-means on an
    // id-sorted sample — the MLlib fit alone cost ~15 scheduler-bound
    // jobs per store build at gate scale, and the centroids (hence the
    // layout) become independent of input partitioning. Past the budget,
    // distributed MLlib takes over unchanged (deterministic per layout —
    // the existing caveat). Either path yields (centroids, assigned).
    val dim = nd.getInt(1)
    val sampleN = math.min(n, target)
    val flops = effectiveK.toLong * sampleN * dim * math.max(maxIter, 1)
    val (centroids: Array[Array[Float]], assignedRaw: DataFrame) =
      if (flops <= maxDriverFlops) {
        val pts = featurizeArr(sampled)
          .select(col(idCol).cast("string"), col("__feat"))
          .collect()
          .sortBy(_.getString(0))
          .map { r =>
            val s = r.getSeq[Float](1)
            val a = new Array[Float](s.length)
            var i = 0
            while (i < a.length) { a(i) = s(i); i += 1 }
            a
          }
        val cents = Pq.kmeans(pts, effectiveK, maxIter).toArray
        // argmin Euclidean ≡ argmax (v·c − |c|²/2); first-wins ties like
        // MLlib — primitive-array loop, one broadcast
        val halfSq = cents.map(c => c.map(x => x.toDouble * x).sum / 2.0)
        val bc = spark.sparkContext.broadcast((cents, halfSq))
        val assignU = udf { (v: Array[Float]) =>
          val (cen, half) = bc.value
          var best = 0
          var bestScore = Double.NegativeInfinity
          var c = 0
          while (c < cen.length) {
            val cc = cen(c)
            val len = math.min(v.length, cc.length)
            var dot = 0.0
            var j = 0
            while (j < len) { dot += v(j).toDouble * cc(j); j += 1 }
            val score = dot - half(c)
            if (score > bestScore) { bestScore = score; best = c }
            c += 1
          }
          best
        }
        (cents, featurizeArr(df).withColumn("cluster", assignU(col("__feat")))
          .drop("__norm", "__feat"))
      } else {
        val model = new KMeans().setK(effectiveK).setMaxIter(maxIter).setSeed(42L)
          .setFeaturesCol("__features").setPredictionCol("cluster")
          .fit(featurize(sampled))
        (model.clusterCenters.map(_.toArray.map(_.toFloat)),
          model.transform(featurize(df))
            .drop("__norm", "__feat", "__features"))
      }

    // persist the assignment: the skew-cap count pass and the write both
    // consume it, and recomputing means re-running normalization + a
    // k-centroid predict over the full corpus (spill-safe at scale)
    val assigned = assignedRaw
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // skew cap: clusters past maxPartitionRows split into hash
      // sub-partitions (bounded collect: one count per centroid).
      // r14: SKIPPED when n <= maxPartitionRows — no cluster can exceed
      // the cap then, so the counting pass (a corpus scan + shuffle +
      // collect) proves nothing (the SemDedup precedent)
      val counts =
        if (n <= maxPartitionRows) Map.empty[Int, Long]
        else assigned.groupBy("cluster").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val nsub = counts.map { case (c, cnt) =>
        c -> math.max(1L, (cnt + maxPartitionRows - 1) / maxPartitionRows).toInt
      }
      val anySplit = nsub.values.exists(_ > 1)
      val withSub =
        if (!anySplit) assigned.withColumn("subpart", lit(0))
        else {
          import spark.implicits._
          val subDf = broadcast(nsub.toSeq.toDF("cluster", "__nsub"))
          assigned.join(subDf, "cluster")
            .withColumn("subpart", pmod(hash(col(idCol)), col("__nsub")))
            .drop("__nsub")
        }
      // co-locate each (cluster, subpart) in one task before partitionBy:
      // without this every write task emits a file into every partition dir
      // (tasks × k small files — the scan-side death of the layout)
      withSub.drop(dropCols: _*) // routing needed vecCol; the files may not
        .repartition(col("cluster"), col("subpart"))
        .write.mode("overwrite").partitionBy("cluster", "subpart").parquet(path)
    } finally assigned.unpersist()

    val centers = centroids.zipWithIndex.map { case (c, i) => (i, c, metric) }
    import spark.implicits._
    centers.toSeq.toDF("cluster", "centroid", "metric")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/$CentroidDir")
  }

  /** Centroids + the store's routing metric ("cosine" if the sidecar
    * predates the metric column). */
  private def loadCentroids(spark: SparkSession, path: String): (Array[(Int, Array[Float])], String) = {
    val df = spark.read.parquet(s"$path/$CentroidDir")
    // ONE collect serves both the metric and the centroid list — the
    // separate head() was a second job per probe (r14)
    val hasMetric = df.columns.contains("metric")
    val cols = if (hasMetric) df.select("cluster", "centroid", "metric")
               else df.select("cluster", "centroid")
    val rows = cols.collect()
    val metric = if (hasMetric && rows.nonEmpty) rows.head.getString(2) else "cosine"
    val cents = rows.map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    (cents, metric)
  }

  /** The `nprobe` cluster ids whose centroids are nearest `query` under
    * the store's own metric — the SAME metric k-means assigned rows
    * with, so probing agrees with the layout by construction. */
  private def probeClusters(centroids: Array[(Int, Array[Float])], metric: String,
                            query: Array[Float], nprobe: Int): Array[Int] = {
    val scored =
      if (metric == "l2") centroids.map { case (id, c) => (id, sqL2(c, query)) }
      else centroids.map { case (id, c) => (id, -cosine(c, query)) }
    scored.sortBy { case (id, d) => (d, id) } // ascending = nearest first
      .take(math.min(nprobe, centroids.length))
      .map(_._1)
  }

  private val PqDir = "_graft_pq" // PQ codebooks sidecar (invisible to readers)

  /** IVF-PQ (the FAISS IndexIVFPQ composition): trains a [[Pq]] model,
    * encodes every vector to its m-byte code, and writes the corpus in
    * the IVF centroid-partitioned layout with the CODES as the payload —
    * a query prunes to `nprobe` centroid partitions at the file listing
    * and scores survivors by ADC table lookups, never touching floats.
    *
    * `keepVectors=false` (the 100 TB shape) drops the float vectors from
    * the data files — storage is m bytes + id per row, and exact
    * rescoring is left to a separate id-join against the raw corpus
    * ([[Ann]]); `true` keeps them alongside for in-place rescoring.
    *
    * The PQ codebooks persist next to the centroids (`_graft_pq`), so
    * serving needs only the path. Returns the trained model for callers
    * that encode queries in the same session.
    *
    * `metric` defaults to "l2" — ADC scores squared L2, so the coarse
    * quantizer trains, assigns, and routes on squared L2 too (one metric
    * end to end, the FAISS IndexIVFPQ invariant). Pass "cosine" only for
    * a corpus known unit-normalized, where the two metrics rank
    * identically. */
  def writeIndexedPq(df: DataFrame, idCol: String, vecCol: String, path: String,
                     pqM: Int, pqK: Int = 256, k: Int = 0, maxIter: Int = 10,
                     trainSampleSize: Int = 100000,
                     maxPartitionRows: Long = 1000000L,
                     keepVectors: Boolean = false,
                     pqTrainVecs: Int = 100000, pqIters: Int = 15,
                     metric: String = "l2"): Pq.Model = {
    val spark = df.sparkSession
    val pq = Pq.train(df, idCol, vecCol, pqM, pqK, pqTrainVecs, pqIters)
    // FUSED encode: the code column rides the same corpus scan the
    // routing pass reads — joining Pq.encode's frame back on the id
    // would scan the corpus twice and shuffle it once for nothing
    val withCodes = df.where(col(vecCol).isNotNull)
      .withColumn("codes", Pq.encoder(df, pq)(col(vecCol)))
    writeIndexed(withCodes, idCol, vecCol, path, k, maxIter,
      trainSampleSize, maxPartitionRows,
      dropCols = if (keepVectors) Nil else Seq(vecCol),
      metric = metric)
    writePqSidecar(spark, path, pq, rotation = None)
    pq
  }

  /** ONE sidecar serialization for both PQ writers: codebook rows
    * (s ≥ 0) plus, for OPQ stores, the rotation rows (s = -1) — a
    * schema change here reaches every store the same way. */
  private def writePqSidecar(spark: SparkSession, path: String, pq: Pq.Model,
                             rotation: Option[Array[Array[Float]]]): Unit = {
    import spark.implicits._
    val bookRows = for {
      s <- pq.codebooks.indices
      c <- pq.codebooks(s).indices
    } yield (s, c, pq.codebooks(s)(c).toSeq, pq.dim, pq.m)
    val rotRows = rotation.toSeq.flatMap(r =>
      r.indices.map(i => (-1, i, r(i).toSeq, pq.dim, pq.m)))
    (bookRows ++ rotRows).toDF("s", "c", "centroid", "dim", "m")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/$PqDir")
  }

  /** IVF-OPQ-PQ (FAISS's `OPQn,IVFk,PQm` recipe): like [[writeIndexedPq]]
    * but every vector first passes the learned orthogonal OPQ rotation —
    * the corpus rotates ONCE at build (one d×d matvec per row, map-only),
    * the coarse quantizer trains/assigns and the PQ codes encode in the
    * ROTATED space, and the rotation persists in the `_graft_pq` sidecar
    * (rows with `s = -1`). Serving ([[topKPq]]) rotates the query once on
    * the driver; orthogonality makes rotated-space L2 the true L2, so
    * results are comparable to plain PQ at identical m/k — with less
    * quantization error whenever variance correlates across subspace
    * boundaries. `keepVectors=true` keeps the ORIGINAL-space vectors in
    * the files (exact rescoring is original-space); the rotated copy is
    * never stored. */
  def writeIndexedOpq(df: DataFrame, idCol: String, vecCol: String, path: String,
                      pqM: Int, pqK: Int = 256, k: Int = 0, maxIter: Int = 10,
                      trainSampleSize: Int = 100000,
                      maxPartitionRows: Long = 1000000L,
                      keepVectors: Boolean = false,
                      pqTrainVecs: Int = 100000, pqIters: Int = 15,
                      opqIters: Int = 8): Pq.OpqModel = {
    val spark = df.sparkSession
    val opq = Pq.trainOpq(df, idCol, vecCol, pqM, pqK, pqTrainVecs, pqIters,
      opqIters)
    val rotVec = "__graft_rotvec"
    require(!df.columns.contains(rotVec), s"column $rotVec is reserved")
    val bcR = spark.sparkContext.broadcast(opq.rotation)
    val rot = udf { (v: Array[Float]) =>
      val r = bcR.value
      require(v.length == r.length, s"vector dim ${v.length} != model dim ${r.length}")
      Pq.rotate(r, v)
    }
    // ONE corpus pass: rotate, encode, route — the code and rotated
    // columns ride the same scan the coarse assignment reads
    val withCodes = df.where(col(vecCol).isNotNull)
      .withColumn(rotVec, rot(col(vecCol)))
      .withColumn("codes", Pq.encoder(df, opq.pq)(col(rotVec)))
    writeIndexed(withCodes, idCol, rotVec, path, k, maxIter,
      trainSampleSize, maxPartitionRows,
      dropCols = if (keepVectors) Seq(rotVec) else Seq(rotVec, vecCol),
      metric = "l2")
    writePqSidecar(spark, path, opq.pq, rotation = Some(opq.rotation))
    opq
  }

  /** Loads the PQ codebooks persisted by [[writeIndexedPq]] /
    * [[writeIndexedOpq]], plus the OPQ rotation when the store has one
    * (`s = -1` sidecar rows; absent on plain-PQ stores). */
  def loadPqModelWithRotation(spark: SparkSession, path: String)
    : (Pq.Model, Option[Array[Array[Float]]]) = {
    val rows = spark.read.parquet(s"$path/$PqDir").collect()
    require(rows.nonEmpty, s"no PQ model at $path/$PqDir")
    val dim = rows.head.getInt(3)
    val m = rows.head.getInt(4)
    val byS = rows.map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
      .groupBy(_._1)
    val books = (0 until m).map { s =>
      byS(s).sortBy(_._2).map(_._3).toVector
    }.toVector
    val rotation = byS.get(-1).map(_.sortBy(_._2).map(_._3))
    rotation.foreach(r => require(r.length == dim && r.forall(_.length == dim),
      s"malformed OPQ rotation at $path/$PqDir"))
    (Pq.Model(dim, m, books), rotation)
  }

  /** Loads the PQ codebooks persisted by [[writeIndexedPq]]. */
  def loadPqModel(spark: SparkSession, path: String): Pq.Model =
    loadPqModelWithRotation(spark, path)._1

  /** ADC top-`n` over the `nprobe` nearest centroid partitions of a
    * [[writeIndexedPq]] store — IVF partition pruning at the file
    * listing, then [[Pq.searchTopK]]'s broadcast-table scoring on the
    * surviving codes. With full probe and a degenerate-exact model
    * (m=1, codebook ≥ distinct vectors) this IS brute-force squared-L2
    * top-k — the oracle-gated configuration (q_ivf_pq). */
  def topKPq(spark: SparkSession, path: String, idCol: String,
             query: Array[Float], n: Int, nprobe: Int = 4): DataFrame = {
    val (model, rotation) = loadPqModelWithRotation(spark, path)
    // OPQ store: the query rotates ONCE on the driver into the space the
    // centroids and codes live in (orthogonal ⇒ distances unchanged)
    val q = rotation.fold(query)(r => Pq.rotate(r, query))
    val (centroids, metric) = loadCentroids(spark, path)
    val probeIds = probeClusters(centroids, metric, q, nprobe)
    val scan = spark.read.parquet(path)
      .where(col("cluster").isin(probeIds.toIndexedSeq: _*)) // partition pruning
    Pq.searchTopK(scan, idCol, "codes", model, q, n)
  }

  /** Top-k by exact cosine over the `nprobe` partitions whose centroids
    * are nearest the query under the STORE's metric — everything else is
    * pruned at the file listing. Pairs naturally with metric="cosine"
    * stores (routing and rescoring agree); on an "l2" store the routing
    * follows the layout's L2 assignment while rescoring stays cosine. */
  def topK(spark: SparkSession, path: String, idCol: String, vecCol: String,
           query: Array[Float], k: Int, nprobe: Int = 4): DataFrame = {
    Graft.register(spark)
    val (centroids, metric) = loadCentroids(spark, path)
    val probeIds = probeClusters(centroids, metric, query, nprobe)
    spark.read.parquet(path)
      .where(col("cluster").isin(probeIds.toIndexedSeq: _*)) // partition pruning
      .select(col(idCol).as("id"),
        call_function("cosine_similarity", col(vecCol), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  private def sqL2(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) {
      val t = a(i).toDouble - b(i).toDouble; d += t * t; i += 1
    }
    d
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
