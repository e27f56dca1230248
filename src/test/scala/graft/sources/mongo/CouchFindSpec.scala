package graft.sources.mongo

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Live-execution path of the CouchDB integration: the graft-geojson
  * source POSTs the MongoFindGen Mango selector to `_find` and paginates
  * in the reference's skip-25 stride (couchdb_extension.ts:84). The fake
  * endpoint honestly evaluates grp-equality selectors and ignores all
  * others — the client must stay exact either way (local re-apply). */
class CouchFindSpec extends SparkTestBase {

  test("serverPushdown: selector executes on a CouchDB _find endpoint") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import scala.jdk.CollectionConverters._
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val posted = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val docs = (0 until 60).map { i =>
      s"""{"_id":"d$i","_rev":"1-x","type":"Feature","properties":{"name":"p$i","grp":"${i % 3}"},"geometry":{"type":"Point","coordinates":[$i,1]}}"""
    }
    server.createContext("/db/_find", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        posted.add(body)
        val skip = """"skip": (\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt).getOrElse(0)
        val grpEq = """"properties\.grp": \{ "\$eq": "(\w+)" \}""".r
          .findFirstMatchIn(body).map(_.group(1))
        val matched = docs.filter(d => grpEq.forall(g => d.contains(s""""grp":"$g"""")))
        val page = matched.slice(skip, skip + CouchFind.PageSize)
        val resp = s"""{"docs":[${page.mkString(",")}],"bookmark":"nil"}""".getBytes("UTF-8")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/db"
      val df = spark.read.format("graft-geojson")
        .option("serverPushdown", "true").load(base)
      // schema inferred from the first _find page (no listing GET exists)
      assert(df.columns.toSet == Set("name", "grp", "geometry"))
      // 60 docs arrive over three pages (25 + 25 + 10, reference stride)
      assert(df.count() == 60)
      // pushed predicate → evaluated inside the database
      val f = df.where(col("grp") === "1")
      assert(f.queryExecution.executedPlan.toString.contains("ServerExec: couchdb-find"))
      assert(f.count() == 20)
      val sent = posted.asScala.last
      assert(sent.contains("""{"properties.grp": { "$eq": "1" }}"""), sent)
      // Mango matches type-sensitively: a numeric-looking literal widens
      // to (string OR number) so typed documents still match; the local
      // re-apply narrows the superset back
      assert(sent.contains("""{"properties.grp": { "$eq": 1 }}"""), sent)
      // the page size is explicit, not the endpoint's default
      assert(sent.contains(""""limit": 25"""), sent)
      // the Mango fields projection covers output AND filter columns,
      // plus the top-level FeatureCollection passthrough (r9: without
      // it an inclusion projection strips nested feature rows)
      val names = df.where(col("grp") === "2").select("name")
        .collect().map(_.getString(0))
      assert(names.length == 20 && names.forall(_.nonEmpty))
      val withFields = posted.asScala.last
      assert(withFields.contains(
        """"fields": ["properties.name", "properties.grp", "features"]"""),
        withFields)
      // a predicate Mango cannot express is still pushed to the scan and
      // re-applied on the returned documents
      assert(df.where(col("name").startsWith("p1")).count() == 11)
      // geometry survives the wire
      assert(df.where(call_function("st_x", col("geometry")) === 5.0).count() == 1)
    } finally server.stop(0)
  }

  test("bookmark pagination: pages 2+ resume at the server's cursor, never by skip") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import scala.jdk.CollectionConverters._
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val posted = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val docs = (0 until 60).map { i =>
      s"""{"_id":"d$i","type":"Feature","properties":{"name":"p$i"},"geometry":{"type":"Point","coordinates":[$i,1]}}"""
    }
    // An honest bookmark server: the opaque cursor encodes the resume
    // offset; a request carrying BOTH skip and bookmark would double-skip
    // (CouchDB resumes at the bookmark, then skips on top) — modeled here
    // so the client's omit-skip contract is actually load-bearing.
    server.createContext("/db/_find", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        posted.add(body)
        val bm = """"bookmark": "g1-(\d+)"""".r.findFirstMatchIn(body).map(_.group(1).toInt)
        val skip = """"skip": (\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt).getOrElse(0)
        val from = bm.getOrElse(0) + skip
        val page = docs.slice(from, from + CouchFind.PageSize)
        val resp =
          s"""{"docs":[${page.mkString(",")}],"bookmark":"g1-${from + page.size}"}"""
            .getBytes("UTF-8")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/db"
      val got = CouchFind.docs(base, "{}", Nil, timeoutMs = 5000).toVector
      assert(got.size == 60)
      assert(got == docs.toVector)
      val bodies = posted.asScala.toVector
      assert(bodies.size == 3, bodies.mkString("\n")) // 25 + 25 + 10
      // page 1 opens with skip-stride (no cursor exists yet)
      assert(bodies(0).contains(""""skip": 0"""), bodies(0))
      assert(!bodies(0).contains("bookmark"), bodies(0))
      // pages 2+ carry the previous response's bookmark and NO skip at
      // all — zero skip growth is the O(page)-server-work contract
      assert(bodies(1).contains(""""bookmark": "g1-25""""), bodies(1))
      assert(bodies(2).contains(""""bookmark": "g1-50""""), bodies(2))
      assert(!bodies(1).contains("skip") && !bodies(2).contains("skip"),
        bodies.mkString("\n"))
    } finally server.stop(0)
  }

  test("pageOf: bookmark extraction tolerates nil, empty, null and non-string shapes") {
    assert(CouchFind.pageOf("""{"docs":[{"a":1}],"bookmark":"g1AAAA"}""") ==
      (Seq("""{"a":1}"""), Some("g1AAAA")))
    assert(CouchFind.pageOf("""{"docs":[],"bookmark":"nil"}""")._2.isEmpty)
    assert(CouchFind.pageOf("""{"docs":[],"bookmark":""}""")._2.isEmpty)
    assert(CouchFind.pageOf("""{"docs":[],"bookmark":null}""")._2.isEmpty)
    // a malformed bookmark shape must not desync the docs parse
    assert(CouchFind.pageOf("""{"bookmark":{"x":1},"docs":[{"b":2}]}""") ==
      (Seq("""{"b":2}"""), None))
  }

  test("spatial WHERE travels as a Mango coordinate-range clause and cuts pages") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import scala.jdk.CollectionConverters._
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val posted = new java.util.concurrent.CopyOnWriteArrayList[String]()
    // 120 Point docs on a line, plus one polygon doc the range clause can
    // never express — the $or's $ne branch must keep it on the wire
    val points = (0 until 120).map { i =>
      s"""{"_id":"d$i","type":"Feature","properties":{"name":"p$i"},"geometry":{"type":"Point","coordinates":[$i,1]}}"""
    }
    val poly =
      """{"_id":"poly","type":"Feature","properties":{"name":"zone"},"geometry":{"type":"Polygon","coordinates":[[[2,0],[4,0],[4,2],[2,2],[2,0]]]}}"""
    val docs = points :+ poly
    server.createContext("/db/_find", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        posted.add(body)
        val skip = """"skip": (\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt).getOrElse(0)
        // honest Mango semantics for the bbox shape: Points range-filter
        // on x, non-Points pass through the $ne branch
        val gte = """"geometry\.coordinates\.0": \{ "\$gte": (-?\d+(?:\.\d+)?) \}""".r
          .findFirstMatchIn(body).map(_.group(1).toDouble)
        val lte = """"geometry\.coordinates\.0": \{ "\$lte": (-?\d+(?:\.\d+)?) \}""".r
          .findFirstMatchIn(body).map(_.group(1).toDouble)
        val matched = docs.filter { d =>
          val x = """"coordinates":\[(-?\d+)""".r.findFirstMatchIn(d).map(_.group(1).toDouble)
          x match {
            case Some(v) => gte.forall(v >= _) && lte.forall(v <= _)
            case None    => true // the polygon: $ne "Point" branch
          }
        }
        val page = matched.slice(skip, skip + CouchFind.PageSize)
        val resp = s"""{"docs":[${page.mkString(",")}]}""".getBytes("UTF-8")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/db"
      graft.Graft.register(spark)
      val df = spark.read.format("graft-geojson")
        .option("serverPushdown", "true").option("columns", "name").load(base)
      posted.clear()
      // full scan: 121 docs = 5 pages
      assert(df.count() == 121)
      val fullPages = posted.asScala.size
      assert(fullPages == 5, s"$fullPages")
      posted.clear()
      // spatial WHERE → SpatialFilterPushdown writes the bbox option →
      // the reader ships it as a coordinate range; only the 6 in-range
      // points + the polygon cross the wire (1 page, not 5)
      val sel = df.where(expr(
        "st_intersects(geometry, st_geomfromtext('POLYGON((10 0, 15 0, 15 2, 10 2, 10 0))'))"))
      assert(sel.count() == 6) // points x=10..15; the polygon fails the exact predicate
      val sent = posted.asScala.mkString("\n")
      assert(sent.contains(""""geometry.coordinates.0": { "$gte": 10 }"""), sent)
      assert(sent.contains(""""geometry.coordinates.0": { "$lte": 15 }"""), sent)
      assert(sent.contains(""""geometry.coordinates.1": { "$gte": 0 }"""), sent)
      assert(sent.contains(""""geometry.coordinates.1": { "$lte": 2 }"""), sent)
      assert(sent.contains("""{"geometry.type": { "$ne": "Point" }}"""), sent)
      assert(posted.asScala.size == 1, s"expected 1 page after prune, got ${posted.asScala.size}")
      // the polygon doc reached the engine (superset) but the EXACT
      // predicate dropped it locally; a within() that admits it keeps it
      val within = df.where(expr(
        "st_intersects(geometry, st_geomfromtext('POLYGON((2 0, 4 0, 4 2, 2 2, 2 0))'))"))
      assert(within.collect().map(_.getString(0)).sorted.toSeq == Seq("p2", "p3", "p4", "zone"))
    } finally server.stop(0)
  }
}
