package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact asymmetric CONTAINMENT similarity join: all (left, right) pairs
  * with `|T(l) ∩ T(r)| / |T(l)| ≥ threshold` over distinct word-token
  * sets — the near-dup measure symmetric Jaccard misses (a short
  * document pasted verbatim inside a long one has containment 1.0 but
  * Jaccard |l|/|r|, arbitrarily small), and the shape quote/boilerplate
  * propagation and partial-scrape dedup actually need.
  *
  * Candidate generation is the standard PREFIX FILTER (Chaudhuri/Ganti/
  * Kaushik 2006, the PPJoin family): order every token by a global
  * total order — document frequency in the RIGHT corpus ascending, then
  * hash (rarity-first minimizes candidates; ANY consistent order is
  * sound) — and emit only each left document's first
  * `p = n − ⌈t·n⌉ + 1` tokens. Pigeonhole: a right document sharing
  * NONE of those p tokens overlaps at most `n − p = ⌈t·n⌉ − 1 < ⌈t·n⌉`
  * tokens, below threshold. Candidates meet in an ordinary equi-join of
  * the left prefixes against the right inverted index — bounded by the
  * prefix tokens' document frequencies, never the cross product
  * (spec-asserted: no CartesianProduct / BroadcastNestedLoopJoin).
  * Tokens absent from the right corpus get df 0 and sort first: they
  * occupy prefix slots, generate zero candidates, and the bound above
  * holds regardless (they can contribute no overlap).
  *
  * 100 TB shape: tokens hash to 60-bit md5 values at the scan
  * (`word_window_hashes` — no token strings shuffle, and the arithmetic
  * is replayable by external engines, so the DuckDB oracle reproduces
  * results BIT-EXACTLY, hash collisions included); the df table is one
  * partial-agg groupBy; the per-document prefix rank is a window whose
  * partitions are single documents (bounded by document length, never
  * corpus size); candidate pairs dedup as NARROW (lid, rid) rows before
  * token arrays re-attach for the sorted-merge refine
  * ([[graft.functions.TextOps.containmentSorted]]).
  *
  * Result: `(leftId, rightId, containment)` with containment rounded to
  * 4 dp AFTER the threshold test. Documents with no tokens are dropped
  * (containment over an empty probe set is undefined). Ids must be
  * unique per side and the two id column names must differ.
  *
  * CACHE NOTE: both token-set frames materialize EAGERLY at call time
  * (each is referenced by two plan branches — lazy evaluation would
  * tokenize+hash+sort every document twice). The RESULT is eagerly
  * materialized too and the intermediates are released before
  * returning, so a later [[Dedup.releaseCaches]] cannot strand the
  * returned frame on dropped checkpoint blocks (the dbscan convention —
  * the lazy-result shape invited exactly that mistake).
  */
object ContainmentJoin {

  def join(left: DataFrame, leftId: String, leftText: String,
           right: DataFrame, rightId: String, rightText: String,
           threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(leftId != rightId,
      s"left and right id columns must have distinct names, both are '$leftId'")
    graft.Graft.register(left.sparkSession)

    def prep(df: DataFrame, id: String, text: String, idOut: String, setOut: String) =
      df.select(col(id).as(idOut),
          array_sort(array_distinct(call_function("word_window_hashes",
            TextAnalysis.wsTokens(col(text)), lit(1)))).as(setOut))
        .where(size(col(setOut)) > 0)

    // materialized ONCE: each side is referenced twice (prefix/index
    // derivation AND the refine re-attach) — without this the tokenize +
    // hash + sort scan would run twice per side (the dbscan `pairs`
    // precedent); tracked so releaseCaches reclaims the blocks
    val l = Dedup.track(prep(left, leftId, leftText, "__lid", "__lset")
      .withColumn("__n", size(col("__lset")))
      .localCheckpoint(true))
    val r = Dedup.track(prep(right, rightId, rightText, "__rid", "__rset")
      .localCheckpoint(true))

    // right inverted index + global document frequencies
    val rIndex = r.select(col("__rid"), explode(col("__rset")).as("__h"))
    val dfreq = rIndex.groupBy("__h").agg(count(lit(1)).as("__df"))

    // left prefixes: the p rarest tokens under the (df, hash) total order.
    // The window partitions are SINGLE documents — bounded by document
    // length by construction, never by corpus size
    import org.apache.spark.sql.expressions.Window
    // required overlap o = the SMALLEST integer with o/n >= t under the
    // refine's own double arithmetic — ceil(t*n) alone is off by one
    // when fl(t*n) rounds across an integer (t=0.07, n=100: fl = 7.0000…1,
    // ceil = 8, yet 7/100.0 >= 0.07 passes the refine; a prefix one token
    // short would silently drop that qualifying pair). The true o is
    // always within 1 of the candidate, so probe c-1, c, c+1.
    val c = ceil(lit(threshold) * col("__n")).cast("long")
    val oMin = when((c - 1).cast("double") / col("__n") >= threshold, c - 1)
      .when(c.cast("double") / col("__n") >= threshold, c)
      .otherwise(c + 1)
    val p = (col("__n") - oMin + 1).cast("int")
    val prefix = l
      .select(col("__lid"), col("__n"), explode(col("__lset")).as("__h"))
      .join(dfreq, Seq("__h"), "left")
      .na.fill(0L, Seq("__df"))
      .withColumn("__rn",
        row_number().over(Window.partitionBy("__lid").orderBy("__df", "__h")))
      .where(col("__rn") <= p)
      .select("__lid", "__h")

    // narrow candidate pairs (a pair can meet through ≤ p shared prefix
    // tokens), then re-attach both token arrays for the map-side refine
    val cand = prefix.join(rIndex, "__h")
      .select("__lid", "__rid")
      .dropDuplicates("__lid", "__rid")
    val res = Dedup.trackResult(cand
      .join(l.select(col("__lid"), col("__lset")), "__lid")
      .join(r, "__rid")
      .withColumn("__c",
        call_function("containment_sorted", col("__lset"), col("__rset")))
      .where(col("__c") >= threshold)
      .select(col("__lid").as(leftId), col("__rid").as(rightId),
        round(col("__c"), 4).as("containment"))
      .localCheckpoint(true)) // self-contained: survives releaseCaches
    // releaseFrame, not unpersist: these are checkpoint-backed, and
    // Dataset.unpersist silently no-ops on checkpoints
    Dedup.releaseFrame(l)
    Dedup.releaseFrame(r)
    res
  }
}
