package graft.sources.xquery

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage of the live-execution building blocks — the end-to-end
  * protocol behavior lives in XmlDataSourceSpec's in-process servers. */
class BaseXRestSpec extends AnyFunSuite {

  test("anatomy splits rest-root/db/doc and rejects shallow or non-HTTP URLs") {
    assert(BaseXRest.anatomy("http://h:8984/rest/db/a.xml") ==
      Some(("http://h:8984/rest", "db", "a.xml")))
    assert(BaseXRest.anatomy("https://h/exist/rest/db/graft/res") ==
      Some(("https://h/exist/rest/db", "graft", "res")))
    // query/fragment noise strips
    assert(BaseXRest.anatomy("http://h/rest/db/a.xml?x=1#f") ==
      Some(("http://h/rest", "db", "a.xml")))
    assert(BaseXRest.anatomy("http://h/onlydb/doc").isEmpty) // no rest root
    assert(BaseXRest.anatomy("/local/db/doc.xml").isEmpty)
  }

  test("documentQuery: variable names stay valid NCNames") {
    // a leading digit (2024.xml → $2024xmli) would be an XQuery syntax error
    val q = BaseXRest.documentQuery("db", "2024.xml", XQueryGen.BaseX97,
      Some("feature"), Nil)
    assert(q.contains("for $d2024xmli in"), q)
    // fully-symbolic names still get a usable variable
    val q2 = BaseXRest.documentQuery("db", "---", XQueryGen.BaseX97, None, Nil)
    assert(q2.contains("for $di in"), q2)
  }

  test("queryBody escapes CDATA terminators") {
    val xq = "*:c = ']]>' and *:d = 'x'"
    val body = BaseXRest.queryBody(xq)
    assert(body.contains("]]]]><![CDATA[>"), body)
    // the real property: the body parses as XML and the query text
    // round-trips exactly (a raw ]]> would truncate it)
    val parsed = graft.geo.SecureXml.strict.loadString(body)
    assert(parsed.label == "query" && (parsed \ "text").text == xq, body)
  }

  test("bboxPredicate: empty prune generates no query; box becomes an envelope test") {
    assert(BaseXRest.bboxPredicate("empty").isEmpty)
    val p = BaseXRest.bboxPredicate("0,0,2,3").get
    assert(p.contains("some $g in (*|*/*)["), p)
    assert(p.contains("local-name()='Point'") && p.contains("local-name()='MultiGeometry'"), p)
    assert(p.contains("geo:intersects(<gml:Polygon"), p)
    assert(p.contains("geo:envelope($g)"), p)
  }

  test("projectionExpr: simple columns + geometry project; flattened forms fall back") {
    assert(BaseXRest.projectionExpr("vi", Seq("name", "kind"), wantGeometry = false) ==
      Some("element{'result'}{$vi/*:name,$vi/*:kind}"))
    val withGeom = BaseXRest.projectionExpr("vi", Seq("name", "geometry"), wantGeometry = true).get
    assert(withGeom.startsWith("element{'result'}{$vi/*:name,$vi/(*|*/*)["), withGeom)
    // attribute / nested / un-named group columns cannot be rebuilt from a
    // copied child list — the whole record must travel
    assert(BaseXRest.projectionExpr("vi", Seq("_attribute__kind__t"), wantGeometry = false).isEmpty)
    assert(BaseXRest.projectionExpr("vi", Seq("addr__zip"), wantGeometry = false).isEmpty)
    assert(BaseXRest.projectionExpr("vi", Seq("_undef__g"), wantGeometry = false).isEmpty)
  }

  test("supportsServerAgg gates on expressibility") {
    import graft.sources.AggPushdown._
    val ok = Seq[Filter](EqualTo("name", "a"))
    assert(BaseXRest.supportsServerAgg(XQueryGen.BaseX97, ok, None,
      Seq("kind"), Seq(CountStarSpec)))
    // eXist pushes no aggregation; bbox prune has record-level semantics;
    // nested columns transfer records instead. Multi-key groups and
    // MIN/MAX (since round 8) travel server-side.
    assert(!BaseXRest.supportsServerAgg(XQueryGen.ExistDb601, ok, None,
      Seq("kind"), Seq(CountStarSpec)))
    assert(!BaseXRest.supportsServerAgg(XQueryGen.BaseX97, ok, Some("0,0,1,1"),
      Seq("kind"), Seq(CountStarSpec)))
    assert(BaseXRest.supportsServerAgg(XQueryGen.BaseX97, ok, None,
      Seq("kind", "name"), Seq(CountStarSpec)))
    assert(BaseXRest.supportsServerAgg(XQueryGen.BaseX97, ok, None,
      Seq("kind"), Seq(MinSpec("name"), MaxSpec("name"))))
    assert(!BaseXRest.supportsServerAgg(XQueryGen.BaseX97, ok, None,
      Seq("kind"), Seq(MinSpec("addr__zip"))))
    assert(!BaseXRest.supportsServerAgg(XQueryGen.BaseX97, ok, None,
      Seq("addr__zip"), Seq(CountStarSpec)))
    // a pushed filter with no XQuery form (IS NULL on an _undef__ column
    // never compiles) forces record transfer + local re-apply
    assert(!BaseXRest.supportsServerAgg(XQueryGen.BaseX97,
      Seq(IsNull("_undef__g")), None, Seq("kind"), Seq(CountStarSpec)))
  }
}
