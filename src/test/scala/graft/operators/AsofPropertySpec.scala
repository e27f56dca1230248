package graft.operators

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for [[Temporal.asofJoin]]: random two-sided logs
  * (key collisions, duplicate times on both sides, exact-time matches,
  * null left times, tolerance boundaries) must agree with a naive
  * O(n²) reference of the documented contract in all THREE directions —
  * backward carries the largest `(time, ties)` right at or before,
  * forward the smallest at or after, nearest the closer of the two with
  * exact-distance ties going backward. Corners an example-based oracle
  * can miss (equal-distance nearest ties at random offsets, tolerance
  * exactly on the boundary) get swept by construction. */
class AsofPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var seed = Seed(4242L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private case class L(k: Long, t: Option[Long], id: Long)
  private case class R(k: Long, t: Long, tie: Long, v: String)

  // dense small domains force same-key same-time pileups on both sides
  private val logGen: Gen[(List[L], List[R])] = for {
    nl <- Gen.chooseNum(1, 10)
    nr <- Gen.chooseNum(0, 12)
    ls <- Gen.listOfN(nl, for {
      k <- Gen.chooseNum(1L, 3L)
      t <- Gen.option(Gen.chooseNum(0L, 12L))
    } yield (k, t))
    rs <- Gen.listOfN(nr, for {
      k <- Gen.chooseNum(1L, 3L)
      t <- Gen.chooseNum(0L, 12L)
      tie <- Gen.chooseNum(0L, 2L)
      v <- Gen.listOfN(2, Gen.alphaLowerChar).map(_.mkString)
    } yield R(k, t, tie, v))
  } yield (ls.zipWithIndex.map { case ((k, t), i) => L(k, t, i.toLong) }, rs)

  private def refMatch(l: L, rights: Seq[R], dir: String,
                       tol: Option[Long]): Option[R] = l.t.flatMap { lt =>
    val back = rights.filter(r =>
        r.k == l.k && r.t <= lt && tol.forall(lt - r.t <= _))
      .sortBy(r => (r.t, r.tie, r.v)).lastOption
    val fwd = rights.filter(r =>
        r.k == l.k && r.t >= lt && tol.forall(r.t - lt <= _))
      .sortBy(r => (r.t, r.tie, r.v)).headOption
    dir match {
      case "backward" => back
      case "forward"  => fwd
      case _ => (back, fwd) match { // nearest: exact-distance tie -> backward
        case (Some(b), Some(f)) =>
          if (lt - b.t <= f.t - lt) Some(b) else Some(f)
        case (b, f) => b.orElse(f)
      }
    }
  }

  test("asofJoin agrees with the O(n^2) reference on random logs, all " +
      "directions and tolerances, ties pinned") {
    forAll(logGen, n = 12) { case (ls, rs) =>
      val left = ls.map(l => (l.k, l.t.map(Long.box).orNull, l.id))
        .toDF("k", "t", "id")
      val right = rs.map(r => (r.k, r.t, r.tie, r.v, r.t))
        .toDF("rk", "rt", "rtie", "rv", "rt2")
      for (dir <- Seq("backward", "forward", "nearest");
           tol <- Seq(None, Some(2L))) {
        val got = Temporal.asofJoin(left, right, Seq("k"), Seq("rk"),
            "t", "rt", payloadCols = Seq("rt2", "rv"), direction = dir,
            tolerance = tol, tieCols = Seq("rtie", "rv"))
          .select("id", "rt2", "rv")
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getString(2)))))
          .toMap
        assert(got.size == ls.size, s"$dir/$tol: row count")
        ls.foreach { l =>
          val want = refMatch(l, rs, dir, tol).map(r => (r.t, r.v))
          assert(got(l.id) === want,
            s"$dir tol=$tol left=$l rights=$rs")
        }
      }
    }
  }
}
