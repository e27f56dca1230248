package graft.sources.mongo

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

/** The Mango selector widening must be MONOTONE: every widened selector
  * matches a superset of the original under either JSON typing, so the
  * scan's local re-apply can always narrow it back. */
class CouchWidenSpec extends AnyFunSuite {

  test("positive comparisons on numeric-looking strings widen to an OR") {
    assert(CouchFind.widen(EqualTo("pop", "5")) ==
      Or(EqualTo("pop", "5"), EqualTo("pop", 5.0)))
    assert(CouchFind.widen(LessThan("pop", "10.5")) ==
      Or(LessThan("pop", "10.5"), LessThan("pop", 10.5)))
    assert(CouchFind.widen(GreaterThanOrEqual("pop", "0")) ==
      Or(GreaterThanOrEqual("pop", "0"), GreaterThanOrEqual("pop", 0.0)))
    // In merges numeric variants into the one $in list
    val In(c, vs) = CouchFind.widen(In("pop", Array("5", "x"))): @unchecked
    assert(c == "pop" && vs.toSeq == Seq("5", "x", 5.0))
  }

  test("non-numeric values and structure-only nodes pass through") {
    assert(CouchFind.widen(EqualTo("name", "beta")) == EqualTo("name", "beta"))
    // NaN/Infinity parse as doubles but have no JSON literal — widening
    // them would emit an invalid selector and fail the query
    assert(CouchFind.widen(EqualTo("x", "NaN")) == EqualTo("x", "NaN"))
    assert(CouchFind.widen(EqualTo("x", "Infinity")) == EqualTo("x", "Infinity"))
    assert(CouchFind.widen(LessThan("x", "-Infinity")) == LessThan("x", "-Infinity"))
    assert(CouchFind.widen(IsNull("name")) == IsNull("name"))
    assert(CouchFind.widen(And(EqualTo("a", "1"), EqualTo("b", "x"))) ==
      And(Or(EqualTo("a", "1"), EqualTo("a", 1.0)), EqualTo("b", "x")))
  }

  test("Not subtrees must NOT widen (negation inverts the superset direction)") {
    // $ne already matches across type boundaries; Or(Not(str), Not(num))
    // would be wrong only if widened INSIDE the Not — assert pass-through
    val f = Not(EqualTo("pop", "5"))
    assert(CouchFind.widen(f) == f)
    val g = Not(In("pop", Array("5")))
    assert(CouchFind.widen(g) == g)
  }

  test("docsOf extracts documents and tolerates extra response keys") {
    val docs = CouchFind.docsOf(
      """{"warning":"x","docs":[{"a":1},{"b":{"c":[2,3]}}],"bookmark":"z"}""")
    assert(docs == Seq("""{"a":1}""", """{"b":{"c":[2,3]}}"""))
    assert(CouchFind.docsOf("""{"docs":[]}""") == Seq.empty)
    intercept[IllegalArgumentException](CouchFind.docsOf("""[1,2]"""))
  }
}
