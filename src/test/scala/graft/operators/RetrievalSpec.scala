package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark shuffles data across the cluster"),
    (2L, "spark spark spark everywhere spark"),
    (3L, "a quiet document about nothing relevant"),
    (4L, "data data data and more data"),
    (5L, "Spark AND Data together")) // case-folded by the tokenizer

  /** Local BM25 replica over the shared whitespace tokenizer. */
  private def referenceBm25(terms: Seq[String], k1: Double = 1.2,
                            b: Double = 0.75): Map[Long, Double] = {
    val docs = corpus.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq }
    val n = docs.size.toDouble
    val avgdl = docs.map(_._2.size).sum.toDouble / n
    val nt = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    docs.flatMap { case (id, ws) =>
      val score = terms.map { t =>
        val tf = ws.count(_ == t).toDouble
        if (tf == 0 || nt(t) == 0) 0.0
        else math.log((n - nt(t) + 0.5) / (nt(t) + 0.5) + 1.0) *
          (tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * ws.size / avgdl)))
      }.sum
      if (score == 0.0) None else Some(id -> score)
    }.toMap
  }

  test("bm25 matches a local reference; non-matching docs are omitted") {
    val terms = Seq("spark", "data")
    val got = Retrieval.bm25(corpus.toDF("id", "text"), "id", "text", terms)
      .as[(Long, Double)].collect().toMap
    val want = referenceBm25(terms)
    assert(got.keySet === want.keySet) // doc 3 matches nothing
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, k) }
    // tf saturation, isolated on a single term: doc 2 has 5x doc 1's
    // 'spark' count but must score far less than 5x higher
    val sp = Retrieval.bm25(corpus.toDF("id", "text"), "id", "text", Seq("spark"))
      .as[(Long, Double)].collect().toMap
    assert(sp(2L) > sp(1L) && sp(2L) < sp(1L) * 5)
  }

  test("bm25 query terms are case-folded and deduplicated; validation") {
    val a = Retrieval.bm25(corpus.toDF("id", "text"), "id", "text",
      Seq("SPARK", "spark")).as[(Long, Double)].collect().toMap
    val b = Retrieval.bm25(corpus.toDF("id", "text"), "id", "text",
      Seq("spark")).as[(Long, Double)].collect().toMap
    assert(a === b)
    intercept[IllegalArgumentException] {
      Retrieval.bm25(corpus.toDF("id", "text"), "id", "text", Nil)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25(corpus.toDF("id", "text"), "id", "text", Seq("x"), b = 1.5)
    }
  }

  test("bm25 never shuffles the full token stream") {
    // the exploded tokens are filtered to the query terms BEFORE the
    // aggregation exchange: the term filter must appear in the plan
    // (a 2+-element isin survives as IN/INSET; one element would fold
    // to an equality)
    val plan = Retrieval.bm25(corpus.toDF("id", "text"), "id", "text",
      Seq("spark", "data")).queryExecution.optimizedPlan.toString
    assert(plan.contains("IN") || plan.contains("INSET"), plan)
  }

  test("rrfFuse combines ranked lists with deterministic tie handling") {
    val l1 = Seq((1L, 10.0), (2L, 5.0), (3L, 1.0)).toDF("id", "s")
    val l2 = Seq((3L, 9.0), (2L, 9.0), (4L, 1.0)).toDF("id", "s") // tie: id asc wins
    val got = Retrieval.rrfFuse(Seq(l1, l2), "id", "s", k = 10)
      .as[(Long, Double)].collect().toMap
    val want = Map(
      1L -> 1.0 / 11,               // rank 1 in l1 only
      2L -> (1.0 / 12 + 1.0 / 11),  // rank 2 in l1, rank 1 in l2 (tie → id 2 first)
      3L -> (1.0 / 13 + 1.0 / 12),
      4L -> 1.0 / 13)
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, k) }
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Nil, "id", "s") }
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Seq(l1), "id", "s", k = 0) }
  }

  test("rrfFuse collapses duplicate ids within one list to their best score") {
    // a fanned-out candidate list must not double-count: id 1 appears
    // twice but gets ONE rank (by its best score 9.0 → rank 1)
    val dup = Seq((1L, 9.0), (1L, 2.0), (2L, 5.0)).toDF("id", "s")
    val got = Retrieval.rrfFuse(Seq(dup), "id", "s", k = 10)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - 1.0 / 11) < 1e-12)
    assert(math.abs(got(2L) - 1.0 / 12) < 1e-12)
  }
}
