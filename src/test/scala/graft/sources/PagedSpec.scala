package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The shared server-cursor invariants, pinned without HTTP: absolute-
  * offset resumption, capped asks, lazy pulling, and the termination
  * heuristic's three regimes (short / exact / over-full pages). */
class PagedSpec extends AnyFunSuite {

  /** An honest 0-indexed corpus server: answers `slice(skip, skip+ask)`
    * and records every (skip, ask) request. */
  private def corpus(n: Int) = {
    val asked = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val fetch = (skip: Int, ask: Int) => {
      asked += ((skip, ask)); (skip until math.min(skip + ask, n)).toSeq
    }
    (asked, fetch)
  }

  test("uncapped pull walks full pages and stops on the short one") {
    val (asked, fetch) = corpus(60)
    assert(Paged.pull(1000, "t", _ => 25, fetch).toSeq == (0 until 60))
    assert(asked.toSeq == Seq((0, 25), (25, 25), (50, 25)))
  }

  test("a shrunk ask resumes at the absolute offset, not ask*page") {
    val (asked, fetch) = corpus(60)
    // the capped-cursor shape: first full page, then the remainder
    val cap = 30
    val ask = (served: Int) =>
      if (served < cap) math.min(25, cap - served) else 25
    val it = Paged.pull(1000, "t", ask, fetch)
    assert(it.take(30).toSeq == (0 until 30))
    assert(asked.toSeq == Seq((0, 25), (25, 5)))
  }

  test("pulling past a cap resumes full-size pages (hint, not truncation)") {
    val (asked, fetch) = corpus(60)
    val ask = (served: Int) => if (served < 3) 3 - served else 25
    assert(Paged.pull(1000, "t", ask, fetch).take(10).toSeq == (0 until 10))
    assert(asked.toSeq == Seq((0, 3), (3, 25)))
  }

  test("pages fetch lazily — an early stop ends the traffic") {
    val (asked, fetch) = corpus(1000)
    assert(Paged.pull(1000, "t", _ => 25, fetch).take(10).toSeq == (0 until 10))
    assert(asked.size == 1, asked)
  }

  test("a server over-answering the ask keeps the cursor paging") {
    // protocol violation: ignores the ask, always returns 25; the cursor
    // must not mistake ask=3's over-full answer for exhaustion
    val asked = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val fetch = (skip: Int, _: Int) => {
      asked += ((skip, 0)); (skip until math.min(skip + 25, 60)).toSeq
    }
    val ask = (served: Int) => if (served < 3) 3 - served else 25
    assert(Paged.pull(1000, "t", ask, fetch).toSeq == (0 until 60))
    assert(asked.map(_._1).toSeq == Seq(0, 25, 50))
  }

  test("the backstop stops a server that answers full pages forever") {
    val fetch = (skip: Int, ask: Int) => (skip until skip + ask).toSeq
    val it = Paged.pull(4, "t", _ => 25, fetch)
    val ex = intercept[IllegalArgumentException](it.size)
    assert(ex.getMessage.contains("exceeded 4 pages"))
  }
}
