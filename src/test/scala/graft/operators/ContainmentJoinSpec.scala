package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ContainmentJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def bruteForce(left: Seq[(Long, String)], right: Seq[(Long, String)],
                         t: Double): Set[(Long, Long, Double)] = {
    def toks(s: String) = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    (for {
      (lid, ltxt) <- left
      lt = toks(ltxt) if lt.nonEmpty
      (rid, rtxt) <- right
      rt = toks(rtxt)
      c = lt.intersect(rt).size.toDouble / lt.size if c >= t
    } yield (lid, rid, math.rint(c * 10000) / 10000)).toSet
  }

  private def run(left: Seq[(Long, String)], right: Seq[(Long, String)],
                  t: Double): Set[(Long, Long, Double)] =
    ContainmentJoin.join(
      left.toDF("lid", "text"), "lid", "text",
      right.toDF("rid", "text"), "rid", "text", t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("equals brute force over random word sets at several thresholds") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"w$i")
    def doc() = (1 + rnd.nextInt(12) to 0 by -1).map(_ =>
      vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val left = (0L until 60L).map(i => i -> doc())
    val right = (1000L until 1080L).map(i => i -> doc())
    for (t <- Seq(0.5, 0.8, 1.0)) {
      val got = run(left, right, t)
      val want = bruteForce(left, right, t)
      assert(got == want, s"t=$t: ${got.diff(want)} extra, ${want.diff(got)} missing")
    }
  }

  test("asymmetry: a fragment is contained in its source, not vice versa") {
    val full = Seq(1L -> "alpha beta gamma delta epsilon zeta eta theta")
    val frag = Seq(2L -> "beta delta zeta")
    // fragment ⊆ full: containment 1.0 left→right
    assert(run(frag, full, 0.99) == Set((2L, 1L, 1.0)))
    // full ⊄ fragment: only 3 of 8 tokens covered
    assert(run(full, frag, 0.5).isEmpty)
    assert(run(full, frag, 0.3) == Set((1L, 2L, 0.375)))
  }

  test("empty, whitespace, and no-token documents drop; exact dup scores 1.0") {
    val left = Seq(1L -> "a b c", 2L -> "   ", 3L -> "")
    val right = Seq(10L -> "c b a extra", 11L -> "")
    assert(run(left, right, 0.9) == Set((1L, 10L, 1.0)))
  }

  test("result is self-contained: survives a releaseCaches before consumption") {
    // the round-9 advice trap: join() checkpoints its token-set frames
    // into the shared registry; draining it before consuming the result
    // used to fail unrecoverably. The result is now materialized and the
    // intermediates released inside join().
    val full = Seq(1L -> "alpha beta gamma delta epsilon zeta eta theta")
    val frag = Seq(2L -> "beta delta zeta")
    import spark.implicits._
    val res = ContainmentJoin.join(
      frag.toDF("lid", "text"), "lid", "text",
      full.toDF("rid", "text"), "rid", "text", 0.99)
    graft.operators.Dedup.releaseCaches()
    assert(res.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet == Set((2L, 1L, 1.0)))
  }

  test("prefix length survives floating-point thresholds (t*n rounding)") {
    // t=0.07, n=100: fl(0.07*100) = 7.000000000000001 -> ceil = 8, yet a
    // pair sharing exactly 7 tokens PASSES the refine (7/100.0 >= 0.07).
    // The 93 left-only tokens are absent from the right corpus (df 0),
    // so they fill the naive 93-slot prefix and the 7 shared tokens
    // would sit entirely in the suffix — a one-short prefix silently
    // drops the qualifying pair.
    val shared = (0 until 7).map(i => s"shared$i")
    val leftOnly = (0 until 93).map(i => s"leftonly$i")
    val left = Seq(1L -> (leftOnly ++ shared).mkString(" "))
    val right = Seq(100L -> (shared ++ (0 until 40).map(i => s"rightpad$i")).mkString(" "))
    assert(run(left, right, 0.07) == Set((1L, 100L, 0.07)))
    assert(run(left, right, 0.07) == bruteForce(left, right, 0.07))
    // and the adjustment never OVER-matches: 6 shared tokens stay out
    val left6 = Seq(1L -> (leftOnly ++ shared.take(6) ++ Seq("x94")).mkString(" "))
    assert(run(left6, right, 0.07).isEmpty)
  }

  test("threshold validation and same-name id refusal") {
    val df = Seq(1L -> "x").toDF("id", "text")
    intercept[IllegalArgumentException] {
      ContainmentJoin.join(df, "id", "text", df, "id", "text", 0.5)
    }
    intercept[IllegalArgumentException] {
      ContainmentJoin.join(df, "id", "text", df.toDF("rid", "text"), "rid", "text", 0.0)
    }
    intercept[IllegalArgumentException] {
      ContainmentJoin.join(df, "id", "text", df.toDF("rid", "text"), "rid", "text", 1.5)
    }
  }

  test("never plans a cartesian or nested-loop join") {
    val left = (0L until 50L).map(i => i -> s"tok${i % 7} tok${i % 11} tok${i % 13}")
    val right = (100L until 160L).map(i => i -> s"tok${i % 7} tok${i % 11}")
    val plan = ContainmentJoin.join(
      left.toDF("lid", "text"), "lid", "text",
      right.toDF("rid", "text"), "rid", "text", 0.6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
