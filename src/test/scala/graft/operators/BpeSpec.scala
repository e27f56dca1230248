package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  // the classic Sennrich walkthrough corpus
  private val toyCounts = Seq(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("merge selection matches the hand-computed Sennrich example") {
    val model = Bpe.trainFromCounts(toyCounts, numMerges = 5)
    // counts: (e,s)=9 (s,t)=9 (t,</w>)=9 tie → lexicographic; then the
    // merged symbols chain; then (l,o)=7 ties (o,w)=7
    assert(model.merges == Vector(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
  }

  test("frequent words collapse to single tokens; round-trip is lossless") {
    val model = Bpe.trainFromCounts(toyCounts, numMerges = 12)
    assert(Bpe.encodeWord("newest", model) == Vector("newest</w>"))
    val text = "the newest lower widest low"
    val toks = text.split(" ").flatMap(w => Bpe.encodeWord(w, model)).toSeq
    assert(Bpe.decode(toks) == text)
    // zero merges → plain characters + end-of-word markers
    val chars = Bpe.encodeWord("low", Bpe.BpeModel(Vector.empty))
    assert(chars == Vector("l", "o", "w", "</w>"))
  }

  test("rank-priority encoding equals naive apply-merges-in-order") {
    val model = Bpe.trainFromCounts(toyCounts, numMerges = 12)
    def naive(word: String): Vector[String] = {
      var s = word.map(_.toString).toVector :+ Bpe.EndOfWord
      model.merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var k = 0
        while (k < s.length) {
          if (k < s.length - 1 && s(k) == a && s(k + 1) == b) { out += a + b; k += 2 }
          else { out += s(k); k += 1 }
        }
        s = out.result()
      }
      s
    }
    val words = Seq("low", "lower", "lowest", "newest", "widest", "wide",
      "news", "stew", "x", "estestest")
    words.foreach(w => assert(Bpe.encodeWord(w, model) == naive(w), w))
  }

  test("training from the corpus is deterministic and bounded") {
    val m1 = Bpe.train(docs, "text", numMerges = 50)
    val m2 = Bpe.train(docs, "text", numMerges = 50)
    assert(m1.merges == m2.merges)
    assert(m1.merges.size == 50)
    // the word-type guard trips when the vocabulary exceeds the cap
    intercept[IllegalArgumentException] {
      Bpe.train(docs, "text", numMerges = 5, maxWordTypes = 3)
    }
  }

  test("encode over a DataFrame: lossless round-trip and shorter-than-chars") {
    val model = Bpe.train(docs, "text", numMerges = 200)
    val enc = Bpe.encode(docs.select("doc_id", "text"), "text", model)
    val rows = enc.select(col("text"), col("bpe_tokens"), col("bpe_len")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val norm = r.getString(0).toLowerCase(java.util.Locale.ROOT).trim
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(Bpe.decode(r.getSeq[String](1)) == norm)
      // merges only ever shorten the char segmentation
      assert(r.getInt(2) <= norm.replace(" ", "").length + norm.split(" ").length)
    }
    // with 200 merges the corpus tokenization is far below char count
    val totalBpe = enc.agg(sum("bpe_len")).head().getLong(0)
    val totalChars = docs.agg(sum(length(col("text")))).head().getLong(0)
    assert(totalBpe < totalChars)
  }
}
