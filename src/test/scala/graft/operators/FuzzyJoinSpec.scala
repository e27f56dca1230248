package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  private def brute(ls: Seq[(Long, String)], rs: Seq[(Long, String)], d: Int) =
    (for { (li, l) <- ls; (ri, r) <- rs; dist = lev(l, r) if dist <= d }
      yield (li, ri, dist)).toSet

  test("equals brute force over random words for d = 1 and 2") {
    val rnd = new scala.util.Random(7)
    def word(): String =
      (0 until 3 + rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val ls = (1L to 300L).map(i => (i, word()))
    val rs = (1L to 300L).map(i => (i + 10000L, word()))
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.join(ls.toDF("id", "s").repartition(5), "id", "s",
          rs.toDF("rid", "t").repartition(3), "rid", "t", d)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === brute(ls, rs, d), s"d=$d")
    }
  }

  test("short strings, empty strings, and cross-length pairs are exact") {
    val ls = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, "abc"), (5L, "abcd"), (6L, "xyz"))
    val rs = Seq((11L, ""), (12L, "b"), (13L, "ba"), (14L, "abcde"), (15L, "zzzz"))
    for (d <- Seq(1, 2, 3)) {
      val got = FuzzyJoin.join(ls.toDF("id", "s"), "id", "s",
          rs.toDF("rid", "t"), "rid", "t", d)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === brute(ls, rs, d), s"d=$d")
    }
  }

  test("planted single-char deletions are all found with their exact distance") {
    val base = (1L to 200L).map(i => (i, s"document title number $i with words"))
    // delete one char mid-string -> distance exactly 1
    val variants = base.map { case (i, s) => (i + 1000L, s.patch(9, "", 1)) }
    val got = FuzzyJoin.join(base.toDF("id", "s"), "id", "s",
        variants.toDF("rid", "t"), "rid", "t", 1)
      .as[(Long, Long, Int)].collect()
    // every base row finds its own variant at distance 1 (other titles
    // differ in their number suffix by >1 except shared-prefix ids)
    val own = got.filter { case (l, r, _) => r == l + 1000L }
    assert(own.length === 200 && own.forall(_._3 === 1))
  }

  test("never plans a cartesian or nested-loop join") {
    val df = (1L to 50L).map(i => (i, s"w$i")).toDF("id", "s")
    val plan = FuzzyJoin.join(df, "id", "s",
        df.select($"id".as("rid"), $"s".as("t")), "rid", "t", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("null strings never match; maxDist validated") {
    val ls = Seq((1L, Option("abc")), (2L, None)).toDF("id", "s")
    val rs = Seq((11L, Option("abc")), (12L, None)).toDF("rid", "t")
    val got = FuzzyJoin.join(ls, "id", "s", rs, "rid", "t", 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 11L, 0)))
    intercept[IllegalArgumentException] { FuzzyJoin.join(ls, "id", "s", rs, "rid", "t", 0) }
    intercept[IllegalArgumentException] { FuzzyJoin.join(ls, "id", "s", rs, "rid", "t", 9) }
  }
}
