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

  /** kNN join: for EVERY query vector, the k nearest corpus vectors.
    * Queries are collected + broadcast (a query set is small relative to a
    * 100 TB corpus); the corpus is scanned ONCE, each partition keeping a
    * bounded per-query heap, so the shuffle carries ≤ partitions·|Q|·k rows
    * into the final per-query merge — never the |corpus|·|Q| cross product.
    * Ranking is by cosine rounded to 4 decimals with id tiebreak
    * (deterministic across runs and engines). */
  def knnJoin(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qIdCol: String, qVecCol: String,
              k: Int, maxBroadcastQueries: Int = 100000): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // guard the driver collect: limit(max+1) bounds the fetch itself, so even
    // a 100 TB frame passed as `queries` cannot OOM the driver before the
    // size check fires
    val qs: Array[(Long, Array[Float])] = queries
      .select(col(qIdCol).cast("long"), col(qVecCol))
      .limit(maxBroadcastQueries + 1)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(qs.length <= maxBroadcastQueries,
      s"knnJoin broadcasts the query side to every task; got > $maxBroadcastQueries query vectors. " +
        "Raise maxBroadcastQueries deliberately, or use knnJoinLsh for large query sets " +
        "(distributed bucket join, approximate).")
    val bc = spark.sparkContext.broadcast(qs)

    val partial = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val queries = bc.value
        // bounded min-heap per query: (roundedCosine, -id) ordering
        val heaps = queries.map(_ => new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
          Ordering.by[(Double, Long), (Double, Long)] { case (c, id) => (-c, id) }))
        rows.foreach { case (cid, vec) =>
          var qi = 0
          while (qi < queries.length) {
            val q = queries(qi)._2
            var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
            while (i < vec.length) {
              val x = vec(i).toDouble; val y = q(i).toDouble
              dot += x * y; na += x * x; nb += y * y; i += 1
            }
            val cos = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
            val rounded = math.floor(cos * 10000.0 + 0.5) / 10000.0
            val h = heaps(qi)
            if (h.size < k) h.enqueue((rounded, cid))
            else {
              val worst = h.head // max of (-cos, id) = worst candidate
              if (rounded > worst._1 || (rounded == worst._1 && cid < worst._2)) {
                h.dequeue(); h.enqueue((rounded, cid))
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          val qid = bc.value(qi)._1
          h.iterator.map { case (cos, cid) => (qid, cid, cos) }
        }
      }
      .toDF("qid", "id", "cosine")

    // global merge: per-query rank over the ≤ partitions·k survivors
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id").asc)
    partial.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .drop("rn")
  }

  /** Approximate kNN join for LARGE query sets — the no-driver-state path
    * when |Q| exceeds [[knnJoin]]'s broadcast budget. Both sides get
    * `tables` independent hyperplane-LSH buckets; candidates come from a
    * narrow (qid/id/table/bucket) equi-join, are deduped, and only then
    * joined back to the vectors for the exact cosine + per-query top-k.
    * Per-pair recall = 1-(1-p^planes)^tables (p = 1-θ/π) — tune
    * planes/tables for the similarity band that matters. Fully distributed:
    * both sides shuffle by bucket, never the |Q|·|corpus| cross product. */
  def knnJoinLsh(corpus: DataFrame, idCol: String, vecCol: String,
                 queries: DataFrame, qIdCol: String, qVecCol: String,
                 k: Int, planes: Int = 8, tables: Int = 8): DataFrame = {
    Graft.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(qIdCol).cast("long").as("qid"), col(qVecCol).as("qvec"))
    val cb = c.select(col("id"),
        posexplode(call_function("hyperplane_buckets", col("vec"), lit(planes), lit(tables))))
      .toDF("id", "tbl", "bucket")
    val qb = q.select(col("qid"),
        posexplode(call_function("hyperplane_buckets", col("qvec"), lit(planes), lit(tables))))
      .toDF("qid", "tbl", "bucket")
    val cand = qb.join(cb, Seq("tbl", "bucket"))
      .select("qid", "id")
      .dropDuplicates("qid", "id") // a pair can collide in several tables
    val scored = cand.join(c, "id").join(q, "qid")
      // same deterministic ranking contract as knnJoin: cosine rounded to 4
      // decimals (half-up), id tiebreak
      .select(col("qid"), col("id"),
        expr("floor(cosine_similarity(vec, qvec) * 10000.0 + 0.5) / 10000.0").as("cosine"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .drop("rn")
  }

  /** Largest hamming ball we will enumerate into an `isin()`: past this the
    * bucket-membership predicate stops being a cheap InSet and the driver
    * pays the enumeration (C(30, ≤15) would be ~155M Ints). */
  private[operators] val MaxBallSize = 1 << 18

  /** Σ C(planes, i), i ≤ probes — saturating: the loop stops once the
    * running sum exceeds MaxBallSize, so the returned value may overshoot
    * by up to the last binomial term added; only the `> MaxBallSize`
    * comparison is meaningful past the cap. planes ≤ 62 keeps the Long
    * binomial recurrence `c * (planes - i)` overflow-free. */
  private[operators] def ballSize(planes: Int, probes: Int): Long = {
    require(planes >= 0 && planes <= 62, s"planes must be in [0,62], got $planes")
    var total = 0L
    var c = 1L // C(planes, 0)
    var i = 0
    while (i <= probes && total <= MaxBallSize) {
      total += c
      c = c * (planes - i) / (i + 1)
      i += 1
    }
    total
  }

  /** Largest probes value whose full ball over `planes` bits stays within
    * MaxBallSize (always ≥ 0: a 0-probe ball is a single bucket). */
  private[operators] def maxFeasibleProbes(planes: Int): Int = {
    var p = 0
    while (p < planes && ballSize(planes, p + 1) <= MaxBallSize) p += 1
    p
  }

  /** All buckets within hamming distance ≤ `probes` of `qBucket` over
    * `planes` bits — Σ C(planes, i), i ≤ probes buckets, each exactly once
    * (bit subsets enumerated in increasing-index order).
    *
    * `probes` is clamped to the largest ball that fits MaxBallSize: the
    * cost being bounded is the DRIVER-side enumeration and the size of the
    * resulting bucket InSet predicate, so an oversized setting degrades to
    * the biggest feasible ball instead of failing (e.g. planes=30 clamps
    * to probes ≤ 5 ≈ 174k buckets). */
  private[operators] def hammingBall(qBucket: Int, planes: Int, probes: Int): Seq[Int] = {
    require(planes >= 1 && planes <= 30, s"planes must be in [1,30], got $planes")
    val p = math.min(math.min(math.max(probes, 0), planes), maxFeasibleProbes(planes))
    val out = Seq.newBuilder[Int]
    def walk(start: Int, remaining: Int, acc: Int): Unit = {
      out += (qBucket ^ acc)
      if (remaining > 0) {
        var i = start
        while (i < planes) { walk(i + 1, remaining - 1, acc | (1 << i)); i += 1 }
      }
    }
    walk(0, p, 0)
    out.result()
  }

  /** LSH top-k: scan only buckets within hamming distance ≤ `probes` of the
    * query bucket (multi-probe improves recall without widening buckets). */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Array[Float], k: Int,
              planes: Int = 12, probes: Int = 1): DataFrame = {
    Graft.register(df.sparkSession)
    val spark = df.sparkSession
    val qBucket = spark.range(1)
      .select(call_function("hyperplane_bucket", typedLit(query), lit(planes)))
      .head().getInt(0)
    val candidates = hammingBall(qBucket, planes, probes)
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
        call_function("hyperplane_bucket", col(vecCol), lit(planes)).as("bucket"))
      .where(col("bucket").isin(candidates: _*))
      .select(col("id"),
        call_function("cosine_similarity", col("vec"), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }
}
