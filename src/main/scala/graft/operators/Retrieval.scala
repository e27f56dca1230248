package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval scoring and hybrid-ranking fusion — the query side
  * of a corpus engine (RAG retrieval, eval-set mining, search-quality
  * filtering). [[Ann]] covers the vector leg; this file covers the
  * lexical leg (BM25) and the standard way to combine the two
  * (reciprocal-rank fusion).
  */
object Retrieval {

  /** Okapi BM25 score of every document against a bag of query terms:
    *
    *   score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1-b+b·|d|/avgdl))
    *   idf(t)   = ln( (N - n_t + 0.5) / (n_t + 0.5) + 1 )
    *
    * (the Robertson/Sparck-Jones idf with the +1 floor — non-negative for
    * terms in more than half the corpus). Documents matching no term are
    * omitted (their score is 0). Returns `(idCol, score)`.
    *
    * Plan shape at 100 TB: tokens explode map-side and are pre-filtered
    * to the query terms by a broadcast set BEFORE the one partial-agg
    * shuffle of `(doc, term, tf)` triples — the corpus-sized token
    * stream never shuffles. Document lengths are scan-level expressions
    * carried on the matching rows; `N`, `avgdl` (one tiny agg) and the
    * per-term document frequencies (≤ |terms| rows) broadcast back.
    * Everything downstream of tokenization is plain arithmetic the
    * DuckDB oracle replays; only `ln` differs at the ulp level, absorbed
    * by the gate's rounding.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(k1 >= 0 && b >= 0 && b <= 1, s"need k1 >= 0 and b in [0,1], got ($k1, $b)")
    val lowered = terms.map(_.toLowerCase).distinct

    // one corpus scan: per-doc matching-term frequencies + doc length.
    // (N, avgdl) comes from its own tiny scan-level aggregate — lengths
    // are cheap to recompute and the tf rows only exist for matches.
    // Tokenize ONCE into a named column: size() and explode() land in
    // different physical operators, so an inlined wsTokens would run the
    // regex split twice per row (the dupSpanStats materialization lesson)
    val toks = df
      .select(col(idCol).as("__id"), TextAnalysis.wsTokens(col(textCol)).as("__ws"))
      .select(col("__id"), size(col("__ws")).as("__len"),
        explode(col("__ws")).as("__t"))
      .where(col("__t").isin(lowered: _*))
    val tf = toks.groupBy("__id", "__t")
      .agg(count(lit(1)).as("__tf"), first("__len").as("__len"))

    val stats = df.select(size(TextAnalysis.wsTokens(col(textCol))).as("__l"))
      .agg(count(lit(1)).cast("double").as("__n"), avg("__l").as("__avgdl")).head()
    val n = stats.getDouble(0)
    val avgdl = stats.getDouble(1)

    // per-term document frequency: ≤ |terms| rows, broadcast back
    val dfreq = tf.groupBy("__t").agg(count(lit(1)).cast("double").as("__nt"))
    val idf = log((lit(n) - col("__nt") + 0.5) / (col("__nt") + 0.5) + 1.0)
    val partial = col("__tf") * (k1 + 1.0) /
      (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__len") / avgdl))
    tf.join(broadcast(dfreq), "__t")
      .select(col("__id"), (idf * partial).as("__s"))
      .groupBy("__id").agg(sum("__s").as("score"))
      .select(col("__id").as(idCol), col("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of several ranked
    * candidate lists — the standard hybrid-retrieval combiner (BM25 leg
    * + ANN leg, or any mix):
    *
    *   rrf(d) = Σ over lists of 1 / (k + rank_list(d))
    *
    * Each input is `(idCol, scoreCol)`; within a list, rank 1 is the
    * highest score, ties broken by id (deterministic). Documents missing
    * from a list simply contribute nothing for it. Returns
    * `(idCol, rrf)` for the union of candidates.
    *
    * A document appearing more than once within one list is collapsed to
    * its best score first (RRF defines one rank per document per list —
    * double-counting would unfairly boost fan-out artifacts).
    *
    * Scale note: ranking a list with a global window is only sane on
    * BOUNDED candidate lists — cap each leg first (`orderBy(desc).limit(n)`
    * plans as a distributed TakeOrdered, so the cap itself is cheap);
    * fusing top-n lists is O(lists·n), independent of corpus size.
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, scoreCol: String,
              k: Int = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(k >= 1, s"k must be >= 1, got $k")
    val ranked = lists.map { l =>
      val w = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
      l.groupBy(col(idCol)).agg(max(col(scoreCol)).as(scoreCol))
        .select(col(idCol).as("__id"),
          (lit(1.0) / (lit(k.toDouble) + row_number().over(w))).as("__c"))
    }
    ranked.reduce(_ unionByName _)
      .groupBy("__id").agg(sum("__c").as("rrf"))
      .select(col("__id").as(idCol), col("rrf"))
  }
}
