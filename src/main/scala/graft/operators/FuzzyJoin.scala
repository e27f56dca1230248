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
  * index, the substrings where that segment could align (position
  * shift bounded by ±d), and candidates meet in an ordinary equi-join
  * on `(target length, segment index, segment text)`. Each left row
  * emits at most `(2d+1)·(d+1)·(2d+1)` probes — O(d³), independent of
  * data size — so the join shuffles bounded candidate keys, never the
  * cross product, and Spark plans hash/sort-merge joins throughout
  * (spec-asserted: no BroadcastNestedLoopJoin, no CartesianProduct).
  *
  * Strings SHORTER than d+1 characters cannot donate d+1 non-empty
  * segments; they take a length-bucketed side path (join on exact
  * target length within ±d, then verify) whose fan-out is again 2d+1
  * per row. Candidate pairs dedup on (leftId, rightId) BEFORE the
  * levenshtein refine, and the refine uses the threshold variant
  * (early-abandon at d — O(d·len) per pair, not O(len²)).
  *
  * Result: `(leftId, rightId, edit_dist)` with the EXACT distance —
  * callers join payloads back by id. Ids must be unique per side;
  * null strings never match. Distance is unit-cost Levenshtein over
  * UTF-16 code units (Spark's `levenshtein` semantics — identical to
  * codepoints on BMP text).
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
    // length-L right string could sit after <= d edits: start shifts by
    // at most +-d around the segment's home position
    val probes = l
      .select(col("__lid"), col("__ls"), col("__llen"),
        explode(when(col("__llen") + d >= m, expr(
          s"""filter(
             |  flatten(transform(sequence(greatest($m, __llen - $d), __llen + $d), L ->
             |    flatten(transform(sequence(0, $d), i ->
             |      transform(sequence(-$d, $d), sh -> named_struct(
             |        'L', L, 'i', i,
             |        'start', i * (L div $m) + greatest(0, i - ($m - L % $m)) + sh,
             |        'len', (L div $m) + if(i >= $m - L % $m, 1, 0))))))),
             |  c -> c.start >= 0 AND c.start + c.len <= __llen)""".stripMargin))
          .otherwise(expr("array()").cast(
            "array<struct<L: int, i: int, start: int, len: int>>"))).as("__p"))
      .select(col("__lid"), col("__ls"),
        col("__p.L").as("__L"), col("__p.i").as("__i"),
        expr("substring(__ls, __p.start + 1, __p.len)").as("__seg"))

    val longCands = probes.join(rseg,
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

    // dedup candidate PAIRS before the refine (a pair can surface from
    // several matching segments), then exact threshold levenshtein
    longCands.unionByName(shortCands)
      .dropDuplicates("__lid", "__rid")
      .withColumn("edit_dist", levenshtein(col("__ls"), col("__rs"), d))
      .where(col("edit_dist") >= 0) // threshold variant answers -1 past d
      .select(col("__lid").as(leftId), col("__rid").as(rightId), col("edit_dist"))
  }
}
