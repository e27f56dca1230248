package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  // skewed left: one key owns 60% of rows, a second 20%, the rest cold;
  // includes null keys and duplicate rows on both sides
  private def skewedLeft: DataFrame =
    (Seq.fill(600)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 200).map(i => s"c$i") ++ Seq(null, null, "dupL", "dupL"))
      .zipWithIndex.map { case (k, i) => (k, i % 7) } // payload collides on purpose
      .toDF("lk", "lv").repartition(5)

  private def rightSide: DataFrame =
    (Seq("hot", "warm", "dupR", "dupL", "dupL") ++ (1 to 150).map(i => s"c$i") ++ Seq(null))
      .zipWithIndex.map { case (k, i) => (k, i * 10) }
      .toDF("rk", "rv").repartition(3)

  private def canon(df: DataFrame): Map[String, Int] =
    df.collect().map(_.mkString("|")).groupBy(identity).view.mapValues(_.length).toMap

  test("salted result equals the plain join for every supported join type") {
    val l = skewedLeft
    val r = rightSide
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val got = SkewJoin.join(l, r, "lk", "rk", jt, hotK = 8, salt = 4)
      val want = l.join(r, l("lk") === r("rk"), jt)
      assert(got.columns.toSeq === want.columns.toSeq, jt)
      assert(canon(got) === canon(want), s"joinType=$jt")
    }
  }

  test("no hot keys: falls through to the plain join, result unchanged") {
    val l = (1 to 300).map(i => (s"k$i", i)).toDF("lk", "lv")
    val r = (1 to 50).map(i => (s"k$i", i * 2)).toDF("rk", "rv")
    val got = SkewJoin.join(l, r, "lk", "rk", "inner", hotK = 8, salt = 4)
    assert(canon(got) === canon(l.join(r, l("lk") === r("rk"))))
    // uniform keys: nothing exceeds n/8, so no salt columns ever exist
    assert(!got.columns.exists(_.contains("salt")))
  }

  test("hot path really splits: salted join present in the plan and balanced") {
    val l = skewedLeft
    val r = rightSide
    val joined = SkewJoin.join(l, r, "lk", "rk", "inner", hotK = 8, salt = 4)
    val plan = joined.queryExplain("formatted")
    // two joins unioned: the salted hot branch plus the cold branch
    assert(plan.contains("Union"), plan.takeWhile(_ => true))
    assert("(?s)Join.*Join".r.findFirstIn(plan).isDefined, "expected two join nodes")
    // helper columns never escape
    assert(!joined.columns.exists(_.startsWith("__graft")))
  }

  test("numeric keys: hot literals cast back to the key type") {
    val l = (Seq.fill(500)(42L) ++ (1L to 100L)).map(k => (k, "x")).toDF("lk", "lv")
    val r = (1L to 100L).map(k => (k, k * 3)).toDF("rk", "rv")
      .union(Seq((42L, 1L)).toDF("rk", "rv"))
    val got = SkewJoin.join(l, r, "lk", "rk", "inner", hotK = 4, salt = 4)
    assert(canon(got) === canon(l.join(r, l("lk") === r("rk"))))
  }

  test("validation: join types, salt bound, overlapping columns") {
    val l = Seq(("a", 1)).toDF("lk", "lv")
    val r = Seq(("a", 2)).toDF("rk", "lv") // lv overlaps
    intercept[IllegalArgumentException] {
      SkewJoin.join(l, Seq(("a", 2)).toDF("rk", "rv"), "lk", "rk", "right")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.join(l, Seq(("a", 2)).toDF("rk", "rv"), "lk", "rk", "inner", salt = 1)
    }
    intercept[IllegalArgumentException] {
      SkewJoin.join(l, r, "lk", "rk", "inner")
    }
  }

  implicit class ExplainOps(df: DataFrame) {
    def queryExplain(mode: String): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { df.explain(mode) }
      out.toString
    }
  }
}
