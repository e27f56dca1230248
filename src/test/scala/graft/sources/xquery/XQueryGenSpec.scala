package graft.sources.xquery

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

/** Generated XQuery must match the reference's construction templates
  * verbatim (extension/basex/basex_extension.ts constructors), so a
  * deployment pointing at a real BaseX pushes the same server-side
  * selections the reference does. */
class XQueryGenSpec extends SparkTestBase {

  private val typeGuard =
    "*/local-name()='MultiPoint' or */local-name()='Point' or " +
    "*/local-name()='LineString' or */local-name()='LinearRing' or " +
    "*/local-name()='Polygon' or */local-name()='MultiLineString' or " +
    "*/local-name()='MultiPolygon' or */local-name()='MultiGeometry'"

  test("two-arg spatial selection matches the reference template") {
    // reference: basex_extension.ts:385 constructSpatialFunctionTwoArgs
    //   `geo:${funcName}(${constant1}, *[${types}]/*) ${operator} ${constant2}`
    val gml = "$gmlconst"
    assert(XQueryGen.spatialFunctionTwoArgs("ST_Distance", gml, "<", "100") ==
      s"geo:distance($gml, *[$typeGuard]/*) < 100")
    assert(XQueryGen.spatialFunctionTwoArgs("ST_Within", gml, "=", "true") ==
      s"geo:within($gml, *[$typeGuard]/*) = true")
    // intersects: comparison dropped; false negates (reference special case)
    assert(XQueryGen.spatialFunctionTwoArgs("ST_Intersects", gml, "=", "true") ==
      s"geo:intersects($gml, *[$typeGuard]/*)")
    assert(XQueryGen.spatialFunctionTwoArgs("ST_Intersects", gml, "=", "false") ==
      s"not(geo:intersects($gml, *[$typeGuard]/*))")
  }

  test("one-arg spatial and mod selections match the reference templates") {
    // reference: basex_extension.ts:415 constructSpatialFunctionOneArgs
    assert(XQueryGen.spatialFunctionOneArg("ST_Dimension", "=", "2") ==
      s"geo:dimension(*[$typeGuard]/*) = 2")
    // geometry-type answers a QName → local-name() wrapper
    assert(XQueryGen.spatialFunctionOneArg("ST_GeometryType", "=", "'Point'") ==
      s"local-name(geo:geometry-type(*[$typeGuard]/*)) = 'Point'")
    // reference: basex_extension.ts:379 constructModFunction
    assert(XQueryGen.modFunction("custkey", 2, "=", 0) == "*:custkey mod 2 = 0")
  }

  test("column paths follow the flattening convention both ways") {
    assert(XQueryGen.columnPath("name") == "*:name")
    assert(XQueryGen.columnPath("address__city") == "*:address/*:city")
    assert(XQueryGen.columnPath("_attribute__id") == "@id")
    assert(XQueryGen.columnPath("_attribute__road__lanes") == "*:road/@lanes")
  }

  test("apostrophes in values escape by doubling; _undef__ expands to the disjunction") {
    // XQuery 3.1 §2.4.4: '' inside a single-quoted literal — without it
    // any value containing ' is a syntax error / injection vector
    assert(XQueryGen.fromSparkFilter(EqualTo("name", "O'Brien")) ==
      Some("*:name = 'O''Brien'"))
    assert(XQueryGen.fromSparkFilter(StringContains("name", "d'I")) ==
      Some("contains(*:name, 'd''I')"))
    // _undef__<group> members match in several document positions
    // (reference: xml_extension.ts:1712-1738) — comparisons expand to the
    // reference's disjunction; single-path forms refuse
    val undef = XQueryGen.fromSparkFilter(EqualTo("_undef__measure", "12")).get
    assert(undef.startsWith("(*:measure = '12' or @measure = '12' or "), undef)
    assert(undef.contains("*[@_is_collection='true']/*/*:measure = '12'"), undef)
    assert(XQueryGen.fromSparkFilter(StringStartsWith("_undef__measure", "1")).isEmpty)
    intercept[IllegalArgumentException](XQueryGen.columnPath("_undef__measure"))
  }

  test("Spark pushdown filters translate to XQuery predicates") {
    assert(XQueryGen.fromSparkFilter(EqualTo("name", "a")) ==
      Some("*:name = 'a'"))
    assert(XQueryGen.fromSparkFilter(GreaterThan("pop", 1000)) ==
      Some("*:pop > 1000"))
    assert(XQueryGen.fromSparkFilter(
      And(EqualTo("kind", "k1"), StringStartsWith("name", "ma"))) ==
      Some("(*:kind = 'k1' and starts-with(*:name, 'ma'))"))
    // IN = XQuery's existential general comparison against a sequence;
    // its empty-sequence false matches SQL's NULL IN (...) = unknown.
    // NOT IN must NOT push (not() answers true on a missing element)
    assert(XQueryGen.fromSparkFilter(In("kind", Array("k1", "o'k"))) ==
      Some("*:kind = ('k1', 'o''k')"))
    assert(XQueryGen.fromSparkFilter(Not(In("kind", Array("k1")))).isEmpty)
    assert(XQueryGen.fromSparkFilter(In("_undef__m", Array("1"))).isEmpty)
    assert(XQueryGen.fromSparkFilter(EqualNullSafe("name", "a")).isEmpty)
  }

  test("versioned document access matches the reference's moduleConfig") {
    // reference: basex_extension.ts:32 (7.6/9.7 db:open; 10.5 db:get/db:list)
    assert(XQueryGen.BaseX97.docFunc("graft", "masjid") == """db:open("graft","masjid")""")
    assert(XQueryGen.BaseX105.docFunc("graft", "masjid") == """db:get("graft","masjid")""")
    assert(XQueryGen.BaseX97.collectionNamesFunc("graft") == """db:list-details("graft")/text()""")
    assert(XQueryGen.BaseX105.collectionNamesFunc("graft") == """db:list("graft")""")
    // eXist-db 6.0.1: hierarchical collection path, no spatial pushdown
    // (reference: existdb_extension.ts:36)
    assert(XQueryGen.ExistDb601.docFunc("graft", "masjid") ==
      """collection("/db/graft/masjid")""")
    val ex = XQueryGen.selection("graft", "masjid", XQueryGen.ExistDb601,
      filters = Seq(EqualTo("name", "a")))
    assert(ex.startsWith(
      """for $masjidi in collection("/db/graft/masjid")//gml:featureMember/*[*:name = 'a']"""), ex)
  }

  test("COUNT + GROUP BY aggregation matches the reference shapes") {
    // reference: xml_extension.ts:1913 (count wrapper element), :697
    // (aggregation FLWOR), :2045 (group-by key paths)
    assert(XQueryGen.countProjection("nama") ==
      "element{'_func__count__nama'}{attribute{'order'}{'1'}," +
        "attribute{'group'}{'_func__count__nama'},count($aggregaterow/*:nama)}")
    assert(XQueryGen.countProjection("*").contains("count($aggregaterow)}"))
    val plain = XQueryGen.aggregation(Nil, Seq(XQueryGen.countProjection("*")))
    assert(plain.startsWith("let $aggregaterow := $doc"), plain)
    val grouped = XQueryGen.aggregation(Seq("kind"), Seq(XQueryGen.countProjection("nama")))
    assert(grouped.contains("group by $group := $aggregaterow/*:kind"), grouped)
    assert(grouped.startsWith("let $aggregated :=for $aggregaterow in $doc"), grouped)
    // two keys join with commas, reference order preserved
    assert(XQueryGen.aggregation(Seq("kind", "city"), Seq("x"))
      .contains("$aggregaterow/*:kind,$aggregaterow/*:city"))
  }

  test("two-collection INNER join compiles to the reference's single FLWOR") {
    // reference: src/getdata.ts:110 dispatches 2-collection non-FULL joins
    // to ONE backend query; xml_extension.ts:712 INNER branch — both
    // collections in one `for`, ON in the FLWOR `where` with the RIGHT
    // operand leading (:770), merged records deduped first-wins (:644)
    val xq = XQueryGen.joinQuery("graft", XQueryGen.JoinSide("city",
        Seq(EqualTo("kind", "k1"))),
      XQueryGen.JoinSide("road"), Seq(("name", "cityname")))
    // the ON leaf keeps its reference trailing space (:770) — <SP> marks it
    assert(xq ==
      """let $doc:= for $cityi in db:open("graft","city")//gml:featureMember/*[*:kind = 'k1'], $roadi in db:open("graft","road")//gml:featureMember/*
        |where $roadi/*:cityname/text() = $cityi/*:name/text()<SP>
        |return if(exists($cityi/*) or exists($roadi/*)) then(
        |let $joinedCol := element{'result'}{($cityi/*,$roadi/*)}
        |return element {'result'}{for $node in distinct-values($joinedCol/*/local-name()) return $joinedCol/*[local-name() eq $node][1]}
        |) else()
        |return $doc""".stripMargin.replace("<SP>", " "), xq)
    // multi-key ON: leaves keep their trailing space, `and` composes
    // without one (xml_extension.ts:724)
    assert(XQueryGen.joinOnClause("ai", "bi",
      Seq(("x", "y"), ("_attribute__id", "z"))) ==
      "$bi/*:y/text() = $ai/*:x/text() and $bi/*:z/text() = $ai/@id/data() ")
    // nested keys walk the flattening's document path (a bare
    // `*:addr__zip` step would match nothing); _undef__ keys refuse
    // rather than silently joining zero rows
    assert(XQueryGen.joinOnClause("ai", "bi", Seq(("addr__zip", "zip"))) ==
      "$bi/*:zip/text() = $ai/*:addr/*:zip/text() ")
    intercept[IllegalArgumentException](
      XQueryGen.joinOnClause("ai", "bi", Seq(("_undef__m", "zip"))))
  }

  test("LEFT join null-extends through the reference's skeleton; FULL refuses") {
    // reference: xml_extension.ts:1052 LEFT/RIGHT branch — per-left
    // subquery, unmatched rows merge the null-column skeleton (:1101)
    val xq = XQueryGen.joinQuery("graft", XQueryGen.JoinSide("city"),
      XQueryGen.JoinSide("road"), Seq(("name", "cityname")), joinType = "LEFT")
    assert(xq.startsWith(
      """let $doccity := for $cityi in db:open("graft","city")//gml:featureMember/*
        |return $cityi
        |let $docroad := for $roadi in db:open("graft","road")//gml:featureMember/*
        |return $roadi
        |let $nullColroad := for $roadi in $docroad[1]""".stripMargin), xq)
    assert(xq.contains("let $matchedRow := for $right in $docroad\n" +
      "where $right/*:cityname/text() = $left/*:name/text() "), xq)
    assert(xq.contains("return if(empty($matchedRow)) then(\n" +
      "let $elementroad:=$nullColroad\n" +
      "let $joinedCol :=  element{'result'}{($left/*,$nullColroad)}"), xq)
    // RIGHT swaps the iteration roles (:1245): outer loop walks road
    val rq = XQueryGen.joinQuery("graft", XQueryGen.JoinSide("city"),
      XQueryGen.JoinSide("road"), Seq(("name", "cityname")), joinType = "RIGHT")
    assert(rq.contains("let $doc:= for $left in $docroad"), rq)
    assert(rq.contains("let $nullColcity := for $cityi in $doccity[1]"), rq)
    // FULL never pushes (src/getdata.ts:95 joinIsFullJoin exclusion)
    intercept[IllegalArgumentException](
      XQueryGen.joinQuery("graft", XQueryGen.JoinSide("a"),
        XQueryGen.JoinSide("b"), Seq(("x", "y")), joinType = "FULL"))
    // a COUNT+GROUP BY tail reuses the aggregation FLWOR (:697)
    val agg = XQueryGen.joinQuery("graft", XQueryGen.JoinSide("city"),
      XQueryGen.JoinSide("road"), Seq(("name", "cityname")),
      groupBy = Seq("kind"), aggProjections = Seq(XQueryGen.countProjection("*")))
    assert(agg.endsWith("return $aggregated"), agg)
    assert(agg.contains("group by $group := $aggregaterow/*:kind"), agg)
  }

  test("full selection FLWOR over the in-process HTTP listing's pushed filters") {
    // the same BaseX-REST-style fixture the DSv2 HTTP tests use: the scan's
    // PUSHED filters are exactly what a live-BaseX deployment would instead
    // compile into the where-root of the FLWOR line
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def serve(path: String, body: String): Unit =
      server.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val bytes = body.getBytes("UTF-8")
          ex.getResponseHeaders.add("Content-Type", "application/xml")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
      })
    serve("/rest/db",
      """<rest:database xmlns:rest="http://basex.org/rest" name="db">
        |  <rest:resource type="xml">a.xml</rest:resource>
        |</rest:database>""".stripMargin)
    serve("/rest/db/a.xml",
      """<col><feature><name>a</name><kind>k1</kind></feature></col>""")
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val df = spark.read.format("graft-xml").option("recordTag", "feature")
        .load(s"$base/rest/db")
        .where(col("name") === "a" && col("kind") =!= "k0")
      // the filters reached the scan…
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("EqualTo(name,a)"), plan)
      assert(df.count() == 1)
      // …and the same filters compile to the reference-shaped FLWOR
      val xq = XQueryGen.selection("db", "masjid", XQueryGen.BaseX97,
        filters = Seq(EqualTo("name", "a"), Not(EqualTo("kind", "k0"))))
      assert(xq ==
        """for $masjidi in db:open("db","masjid")//gml:featureMember/*[*:name = 'a' and *:kind != 'k0']
          |return $masjidi""".stripMargin, xq)
      // spatial predicate composes into the same where-root
      val spatial = XQueryGen.selection("db", "masjid", XQueryGen.BaseX105,
        spatialPredicates = Seq(
          XQueryGen.spatialFunctionTwoArgs("ST_Within", "$poly", "=", "true")))
      assert(spatial.startsWith(
        """for $masjidi in db:get("db","masjid")//gml:featureMember/*[geo:within($poly, """), spatial)
    } finally server.stop(0)
  }
}
