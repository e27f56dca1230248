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
      // the Mango fields projection covers output AND filter columns
      val names = df.where(col("grp") === "2").select("name")
        .collect().map(_.getString(0))
      assert(names.length == 20 && names.forall(_.nonEmpty))
      val withFields = posted.asScala.last
      assert(withFields.contains(""""fields": ["properties.name", "properties.grp"]"""),
        withFields)
      // a predicate Mango cannot express is still pushed to the scan and
      // re-applied on the returned documents
      assert(df.where(col("name").startsWith("p1")).count() == 11)
      // geometry survives the wire
      assert(df.where(call_function("st_x", col("geometry")) === 5.0).count() == 1)
    } finally server.stop(0)
  }
}
