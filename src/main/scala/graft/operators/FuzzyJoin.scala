package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity join: all (left, right) pairs with
  * `levenshtein ≤ maxDist`, found WITHOUT a cartesian product — the
  * record-linkage / near-duplicate-title primitive (matching product
  * names, author spellings, OCR'd strings across corpora).
  *
  * The candidate generator is the PassJoin segment scheme (Li, Deng,
  * Feng 2011): partition every right string of length L into
  * `maxDist + 1` contiguous segments (pigeonhole: if two strings are
  * within distance d, at least one of the d+1 segments of one appears
  * EXACTLY — unedited — inside the other); the left side enumerates,
  * for every compatible target length L (|L − len| ≤ d) and segment
  * index, the substrings where that segment could align, and candidates
  * meet in an ordinary equi-join on `(target length, segment index,
  * segment text)`. The alignment shift is position-filtered: a segment
  * match at shift `sh` forces ≥ |sh| edits before it and ≥ |Δ − sh|
  * after it (Δ = leftLen − L), so only shifts with
  * |sh| + |Δ − sh| ≤ d are enumerated — for d=1 that is ONE shift at
  * Δ=0 and two at Δ=±1, a ~3× candidate cut vs the naive ±d window.
  * Each left row emits O(d³) probes independent of data size, so the
  * join shuffles bounded candidate keys, never the cross product, and
  * Spark plans hash/sort-merge joins throughout (spec-asserted: no
  * BroadcastNestedLoopJoin, no CartesianProduct).
  *
  * The probe enumeration is three chained `explode`s over arithmetic
  * `sequence`s (codegen'd generators) — not nested higher-order
  * functions, which Catalyst evaluates interpreted with per-row closure
  * allocation. The exact threshold levenshtein (early-abandon at d —
  * O(d·len) per pair) runs MAP-SIDE in the join's output projection,
  * while both strings are colocated; only verified `(leftId, rightId,
  * edit_dist)` triples — no string payloads — reach the final
  * dropDuplicates shuffle. (A pair can surface from several matching
  * segments, at most d+1 times.)
  *
  * Strings SHORTER than d+1 characters cannot donate d+1 non-empty
  * segments; they take a length-bucketed side path (join on exact
  * target length within ±d, then verify) whose fan-out is again 2d+1
  * per row.
  *
  * Result: `(leftId, rightId, edit_dist)` with the EXACT distance —
  * callers join payloads back by id. Ids must be unique per side;
  * null strings never match.
  *
  * UNICODE CAVEAT — exactness is guaranteed for BMP text only. Spark's
  * `length`/`substring` count CODEPOINTS while `levenshtein` compares
  * UTF-16 CODE UNITS, so a supplementary-plane character (emoji,
  * rare CJK) counts once during candidate generation but twice during
  * verification: a genuinely-qualifying pair whose code-unit length
  * difference exceeds d can be silently missed. On BMP strings the two
  * units coincide and the pigeonhole argument is exact.
  */
object FuzzyJoin {

  def join(left: DataFrame, leftId: String, leftCol: String,
           right: DataFrame, rightId: String, rightCol: String,
           maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 8,
      s"maxDist must be in [1, 8] (candidate fan-out is O(d^3)), got $maxDist")
    val d = maxDist
    val m = d + 1 // segment count; also the short/long length boundary

    val l = left.select(col(leftId).as("__lid"), col(leftCol).cast("string").as("__ls"))
      .where(col("__ls").isNotNull)
      .withColumn("__llen", length(col("__ls")))
    val r = right.select(col(rightId).as("__rid"), col(rightCol).cast("string").as("__rs"))
      .where(col("__rs").isNotNull)
      .withColumn("__rlen", length(col("__rs")))

    // ---- long path: right strings with >= m chars donate m segments ----
    // even-partition scheme: base = L div m, rem = L % m — the first
    // m-rem segments take `base` chars, the last rem take base+1
    // (deterministic; both sides must agree on it, and do: the probe
    // generator below computes the same arithmetic for target length L)
    val rseg = r.where(col("__rlen") >= m)
      .select(col("__rid"), col("__rs"), col("__rlen"),
        posexplode(expr(
          s"""transform(sequence(0, $d), i ->
             |  substring(__rs,
             |    i * (__rlen div $m) + greatest(0, i - ($m - __rlen % $m)) + 1,
             |    (__rlen div $m) + if(i >= $m - __rlen % $m, 1, 0)))""".stripMargin))
          .as(Seq("__i", "__seg")))

    // probe substrings of each left string where segment __i of a
    // length-L right string could sit after <= d edits. Three chained
    // codegen'd explodes (L, i, sh); the shift range is the closed-form
    // solution of |sh| + |Δ - sh| <= d with Δ = __llen - L:
    //   sh ∈ [min(0,Δ) - (d-|Δ|) div 2,  max(0,Δ) + (d-|Δ|) div 2]
    // (|Δ| <= d always holds because L ranges over __llen ± d).
    val probes = l
      .withColumn("__L", explode(when(col("__llen") + d >= m,
        sequence(greatest(lit(m), col("__llen") - d), col("__llen") + d))
        .otherwise(expr("array()").cast("array<int>"))))
      .withColumn("__delta", col("__llen") - col("__L"))
      .withColumn("__slack", ((lit(d) - abs(col("__delta"))) / 2).cast("int"))
      .withColumn("__sh", explode(sequence(
        least(lit(0), col("__delta")) - col("__slack"),
        greatest(lit(0), col("__delta")) + col("__slack"))))
      .withColumn("__i", explode(sequence(lit(0), lit(d))))
      .withColumn("__start",
        col("__i") * (col("__L") / lit(m)).cast("int") +
          greatest(lit(0), col("__i") - (lit(m) - pmod(col("__L"), lit(m)))) +
          col("__sh"))
      .withColumn("__len",
        (col("__L") / lit(m)).cast("int") +
          when(col("__i") >= lit(m) - pmod(col("__L"), lit(m)), 1).otherwise(0))
      .where(col("__start") >= 0 && col("__start") + col("__len") <= col("__llen"))
      .select(col("__lid"), col("__ls"), col("__L"), col("__i"),
        expr("substring(__ls, __start + 1, __len)").as("__seg"))

    // Repartition BOTH sides on the join key before the candidate join:
    // hot segments fan out (a popular segment can match thousands of
    // rows), and a small input otherwise arrives in 1-2 scan partitions,
    // so the entire fan-out + verify would run in 1-2 tasks. The explicit
    // partition count pins the exchange (AQE would coalesce a small
    // pre-join shuffle back to one partition); on big inputs a sort-merge
    // join requires this exact distribution anyway, so the exchanges are
    // reused, not added.
    val shufflePartitions = left.sparkSession.sessionState.conf.numShufflePartitions
    val longCands = probes
      .repartition(shufflePartitions, col("__L"), col("__i"), col("__seg"))
      .join(rseg.repartition(shufflePartitions, col("__rlen"), col("__i"), col("__seg")),
        probes("__L") === rseg("__rlen") && probes("__i") === rseg("__i") &&
          probes("__seg") === rseg("__seg"))
      .select(col("__lid"), col("__rid"), col("__ls"), col("__rs"))

    // ---- short path: right strings with < m chars (too short to donate
    // m segments) meet every left string of compatible length ----
    val rshort = r.where(col("__rlen") < m)
    val shortCands = l
      .withColumn("__tl", explode(
        when(col("__llen") - d <= m - 1,
          sequence(greatest(col("__llen") - d, lit(0)),
            least(col("__llen") + d, lit(m - 1))))
          .otherwise(expr("array()").cast("array<int>"))))
      .join(rshort, col("__tl") === col("__rlen"))
      .select(col("__lid"), col("__rid"), col("__ls"), col("__rs"))

    // exact threshold levenshtein FIRST — map-side, strings still
    // colocated from the join — then dedup only the verified narrow
    // (id, id, dist) triples (duplicates from multi-segment matches)
    longCands.unionByName(shortCands)
      .withColumn("edit_dist", levenshtein(col("__ls"), col("__rs"), d))
      .where(col("edit_dist") >= 0) // threshold variant answers -1 past d
      .select(col("__lid").as(leftId), col("__rid").as(rightId), col("edit_dist"))
      .dropDuplicates(leftId, rightId)
  }
}
