package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Frequency sketches for high-cardinality columns (words, n-grams, URLs,
  * domains) where a plain `groupBy(x).count()` would shuffle one row per
  * DISTINCT value.
  *
  * [[heavyHitters]] is the Misra-Gries summary (Misra & Gries 1982, the
  * deterministic ancestor of Count-Min / SpaceSaving) run as a two-pass
  * EXACT computation:
  *
  *   pass 1 — each partition folds its rows into a k-counter Misra-Gries
  *   summary; by the pigeonhole bound, any item with GLOBAL frequency
  *   > n/k must exceed its local n_p/k share in at least one partition,
  *   so the union of per-partition summaries is a guaranteed superset of
  *   the true heavy hitters. Only ≤ k candidates + 1 count leave each
  *   partition — driver state is bounded by k·partitions, never by
  *   cardinality.
  *
  *   pass 2 — the candidate set broadcasts back and an ordinary
  *   combiner-backed count runs over candidate rows only; the final
  *   threshold `cnt·k > n` is exact integer arithmetic.
  *
  * The result is exactly `{x : freq(x) > n/k}` with exact counts — what a
  * one-shot `groupBy.count.having` returns — but the shuffle carries only
  * candidate items, so a 100 TB n-gram scan with billions of distinct
  * values moves k·partitions rows instead of the full dictionary. Null
  * items are excluded (n counts non-null rows).
  *
  * The companion distinct-count sketch lives in
  * [[graft.functions.KmvDistinctAgg]] (`kmv_distinct` in SQL) — a native
  * Catalyst aggregate whose partial state is ≤ k longs per partition.
  */
object Sketches {

  /** Exact items of `itemCol` with frequency strictly greater than n/k
    * (n = non-null rows), with their exact counts, as `(item, cnt)`. */
  def heavyHitters(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)

    // pass 1: per-partition Misra-Gries summaries. Each partition emits a
    // (null, rowCount) marker plus ≤ k-1 surviving candidates.
    val sketch: Array[(String, Long)] = items.as[String].mapPartitions { it =>
      val counters = new java.util.HashMap[String, java.lang.Long](2 * k)
      var n = 0L
      while (it.hasNext) {
        val x = it.next()
        n += 1
        val cur = counters.get(x)
        if (cur != null) counters.put(x, cur + 1L)
        else if (counters.size < k - 1) counters.put(x, 1L)
        else {
          // classic decrement-all step; zeroed counters free their slot
          val itr = counters.entrySet().iterator()
          while (itr.hasNext) {
            val e = itr.next()
            if (e.getValue == 1L) itr.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      Iterator.single((null: String, n)) ++
        counters.keySet().iterator().asScala.map(s => (s, 0L))
    }.collect() // bounded by construction: ≤ k rows per partition

    val n = sketch.iterator.filter(_._1 == null).map(_._2).sum
    val candidates = sketch.iterator.collect { case (s, _) if s != null => s }
      .toSeq.distinct
    if (candidates.isEmpty || n == 0L)
      return items.limit(0).withColumn("cnt", lit(0L)).select("item", "cnt")

    // pass 2: exact recount over candidate rows only; the broadcast join
    // prunes everything else at the scan, so the shuffle carries
    // ≤ |candidates| × partitions partial counts
    items.join(broadcast(candidates.toDF("item")), "item")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * k > n) // cnt > n/k, exact in integers
  }

  /** alpha_m bias constants from Flajolet et al. 2007 §4. */
  private def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** The full HyperLogLog estimator over a register array produced by
    * `hll_sketch(h, p)` — raw harmonic mean with the small-range
    * linear-counting correction (`m·ln(m/V)` when the raw estimate is
    * ≤ 2.5m and V empty registers remain). No large-range correction:
    * the 60-bit hash space makes collisions negligible below 2^50.
    *
    * Driver-side math over one small array (the heavy lifting — one
    * byte-array per group — already happened distributed inside the
    * aggregate). `ln` makes this libm-dependent, which is why the hash
    * GATE (q_hll_distinct) pins the transcendental-free harmonic sum
    * instead and this estimator is spec-bounded against exact counts. */
  def hllEstimate(registers: Seq[Int]): Double = {
    val m = registers.length
    require(m >= 16 && (m & (m - 1)) == 0, s"register count must be a power of two >= 16, got $m")
    var s = 0.0
    var zeros = 0
    registers.foreach { r =>
      s += 1.0 / (1L << r).toDouble
      if (r == 0) zeros += 1
    }
    val raw = hllAlpha(m) * m * m / s
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }
}
