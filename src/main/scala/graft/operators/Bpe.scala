package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding tokenizer training and application (Sennrich et al.
  * 2016, the public subword-nmt algorithm) for training-data pipelines:
  * learn a merge table from the corpus, then tokenize/count with it.
  *
  * Scale design mirrors `TextAnalysis.bigramModel` and `Ivf`'s bounded
  * training: the CORPUS-scale work — reducing 100 TB of text to a word
  * frequency table — is a distributed two-stage aggregation whose shuffle
  * carries one row per DISTINCT word; the merge loop then runs on that
  * vocabulary-bounded table (capped by `maxWordTypes`, so trainer cost is
  * corpus-size INDEPENDENT — exactly how sentencepiece/HF trainers
  * operate on word counts rather than raw text). Encoding broadcasts the
  * merge ranks and is embarrassingly parallel.
  */
object Bpe {

  /** Ordered merge table; rank = position. `EndOfWord` marks word ends so
    * merged tokens can't span word boundaries and decoding is lossless. */
  case class BpeModel(merges: IndexedSeq[(String, String)]) {
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  val EndOfWord = "</w>"

  /** Distributed word-frequency table: one row per distinct word of the
    * lowercased, whitespace-split corpus. The only corpus-scale stage. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))

  private def toSymbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ EndOfWord

  /** Learn `numMerges` BPE merges from the corpus. Deterministic: pair
    * selection breaks count ties lexicographically, so two runs (or two
    * engines) produce the identical merge table. The driver holds at most
    * `maxWordTypes` word types (guarded collect — the limit+1 probe
    * pattern; raise it consciously for very large vocabularies).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWordTypes: Int = 1000000, minFreq: Long = 1L): BpeModel = {
    require(numMerges >= 0 && maxWordTypes > 0 && minFreq >= 1)
    val counts = wordCounts(df, textCol).where(col("n") >= minFreq)
      .orderBy(col("n").desc, col("word")).limit(maxWordTypes + 1).collect()
    require(counts.length <= maxWordTypes,
      s"corpus has more than $maxWordTypes word types above minFreq=$minFreq; " +
        "raise maxWordTypes or minFreq")
    trainFromCounts(counts.map(r => r.getString(0) -> r.getLong(1)), numMerges)
  }

  /** The merge loop on a word-frequency table (corpus-size independent).
    * Incremental: after a merge, only the words containing that pair are
    * re-segmented and only their pair counts adjust.
    */
  def trainFromCounts(wordFreq: Seq[(String, Long)], numMerges: Int): BpeModel = {
    val words = wordFreq.map { case (w, f) => (toSymbols(w), f) }.toArray
    val segs = words.map(_._1)
    val freqs = words.map(_._2)
    // pair -> total count; pair -> word indices containing it
    val pairCount = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    val pairWords = mutable.Map.empty[(String, String), mutable.Set[Int]]
    def addWord(i: Int, sign: Long): Unit = {
      val s = segs(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        pairCount(p) += sign * freqs(i)
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
        j += 1
      }
      if (sign < 0) {
        var k = 0
        while (k < s.length - 1) {
          val p = (s(k), s(k + 1))
          if (pairCount(p) <= 0) pairCount.remove(p)
          // prune the reverse index too: without this, a re-segmented
          // word's stale entries make later merges of p re-walk words
          // that no longer contain it (a no-op retract/re-add per word —
          // correct but the merge loop degrades on large vocabularies)
          pairWords.get(p).foreach { set =>
            set -= i
            if (set.isEmpty) pairWords.remove(p)
          }
          k += 1
        }
      }
    }
    segs.indices.foreach(addWord(_, 1L))

    val merges = IndexedSeq.newBuilder[(String, String)]
    var m = 0
    while (m < numMerges && pairCount.nonEmpty) {
      // deterministic argmax: count desc, then pair lexicographic
      val best = pairCount.keysIterator.reduce { (a, b) =>
        val ca = pairCount(a); val cb = pairCount(b)
        if (ca > cb) a
        else if (cb > ca) b
        else if (Ordering[(String, String)].lt(a, b)) a else b
      }
      merges += best
      val affected = pairWords.getOrElse(best, mutable.Set.empty).toArray
      val merged = best._1 + best._2
      affected.foreach { i =>
        addWord(i, -1L) // retract old pair counts for this word
        val s = segs(i)
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < s.length) {
          if (j < s.length - 1 && s(j) == best._1 && s(j + 1) == best._2) {
            out += merged; j += 2 // left-to-right non-overlapping, à la str.replace
          } else { out += s(j); j += 1 }
        }
        segs(i) = out.result()
        addWord(i, 1L)
      }
      pairCount.remove(best)
      pairWords.remove(best)
      m += 1
    }
    BpeModel(merges.result())
  }

  /** Segment one word with the learned merges, applying them in rank
    * order (the reference subword-nmt semantics: each merge replaces all
    * non-overlapping occurrences left-to-right). */
  def encodeWord(word: String, model: BpeModel): Vector[String] = {
    var s = toSymbols(word)
    // standard rank-priority loop: repeatedly merge the lowest-rank
    // adjacent pair present — equivalent to applying merges in rank order
    // without a pass per merge-table entry. Each iteration rescans the
    // word (O(len) per merge, O(len²) worst case for a word that merges
    // down to one token); natural-language word lengths keep this cheap,
    // and a heap would only pay off on pathological inputs
    var done = false
    while (!done && s.length > 1) {
      var bestRank = Int.MaxValue
      var at = -1
      var j = 0
      while (j < s.length - 1) {
        val r = model.ranks.getOrElse((s(j), s(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; at = j }
        j += 1
      }
      if (at < 0) done = true
      else {
        val pair = (s(at), s(at + 1))
        val merged = pair._1 + pair._2
        val out = Vector.newBuilder[String]
        var k = 0
        while (k < s.length) {
          if (k < s.length - 1 && s(k) == pair._1 && s(k + 1) == pair._2) {
            out += merged; k += 2
          } else { out += s(k); k += 1 }
        }
        s = out.result()
      }
    }
    s
  }

  /** Tokenize `textCol` into BPE tokens (array column `bpe_tokens`) plus
    * `bpe_len`. The model rides a broadcast; per-row work only. */
  def encode(df: DataFrame, textCol: String, model: BpeModel): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val enc = udf { text: String =>
      if (text == null) Array.empty[String]
      else text.toLowerCase(java.util.Locale.ROOT).trim
        .split("\\s+").filter(_.nonEmpty)
        .flatMap(w => encodeWord(w, bc.value))
    }
    df.withColumn("bpe_tokens", enc(col(textCol)))
      .withColumn("bpe_len", size(col("bpe_tokens")))
  }

  /** Lossless inverse of [[encode]]'s per-word segmentation: concatenate
    * tokens and turn word-end markers back into spaces. */
  def decode(tokens: Seq[String]): String =
    tokens.mkString("").replace(EndOfWord, " ").trim
}
