package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pushed LIMIT on both DSv2 sources: per-partition truncation after the
  * local filter re-apply (LocalLimit's exact contract), plus a wire-level
  * `subsequence` cap on predicate-free server scans — `SELECT * FROM t
  * LIMIT 10` against a huge HTTP collection must not transfer the
  * collection. With pushed filters the wire cap stays OFF: the server's
  * first-n matches could shrink under the local re-apply (widened
  * predicates), an under-delivery nothing local can repair. */
class LimitPushdownSpec extends SparkTestBase {

  import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
  import scala.jdk.CollectionConverters._

  test("local graft-xml: limit truncates after filters, plan shows the push") {
    val dir = java.nio.file.Files.createTempDirectory("graft-limit").toFile
    (0 until 3).foreach { i =>
      val f = new java.io.File(dir, s"d$i.xml")
      val recs = (0 until 4).map(j =>
        s"<feature><name>n${i}_$j</name><kind>k${j % 2}</kind></feature>").mkString
      java.nio.file.Files.write(f.toPath, s"<col>$recs</col>".getBytes("UTF-8"))
    }
    val rd = spark.read.format("graft-xml").option("recordTag", "feature")
      .option("columns", "name,kind").load(dir.getAbsolutePath)
    val lim = rd.limit(5)
    assert(lim.queryExecution.executedPlan.toString.contains("PushedLimit: 5"),
      lim.queryExecution.executedPlan.toString)
    assert(lim.count() == 5)
    // with an absorbed filter the truncation happens AFTER the filter:
    // k0 matches 2 of 4 records per doc, limit 3 still finds 3 across docs
    val fl = rd.where(col("kind") === "k0").limit(3)
    assert(fl.queryExecution.executedPlan.toString.contains("PushedLimit: 3"),
      fl.queryExecution.executedPlan.toString)
    assert(fl.count() == 3)
    assert(fl.collect().forall(_.getString(1) == "k0"))
    // a limit above an aggregate stays in Spark (builder refuses agg+limit)
    assert(rd.groupBy("kind").count().limit(1).count() == 1)
  }

  test("server graft-xml: predicate-free limits cap the wire, filtered ones do not") {
    val posted = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val recs = (0 until 6).map(j => s"<rec><name>n$j</name><kind>k${j % 2}</kind></rec>")
    def respond(ex: HttpExchange, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    val lastServed = new java.util.concurrent.atomic.AtomicInteger(-1)
    server.createContext("/rest", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        if (ex.getRequestMethod == "POST") {
          val q = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          posted.add(q)
          // honest subsequence ((?s): the FLWOR spans lines); predicates
          // deliberately IGNORED (superset)
          val n = """(?s)subsequence\(.*, 1, (\d+)\)""".r
            .findFirstMatchIn(q).map(_.group(1).toInt).getOrElse(recs.size)
          lastServed.set(math.min(n, recs.size))
          respond(ex, s"<rest-results>${recs.take(n).mkString}</rest-results>")
        } else respond(ex,
          """<rest:database xmlns:rest="http://basex.org/rest">
            |<rest:resource>a.xml</rest:resource></rest:database>""".stripMargin)
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/rest/db"
      def rd = spark.read.format("graft-xml").option("recordTag", "rec")
        .option("columns", "name,kind").option("serverPushdown", "true").load(base)
      // no predicate → the cap travels in the query and the wire really
      // carried 2 records, not the collection
      assert(rd.limit(2).count() == 2)
      assert(posted.asScala.last.contains("subsequence("), posted.asScala.last)
      assert(lastServed.get() == 2, s"wire carried ${lastServed.get()} records")
      // pushed filter → NO wire cap (first-n could shrink under re-apply);
      // the server ignores the predicate, re-apply + local take stay exact
      val fl = rd.where(col("kind") === "k1").limit(2)
      assert(fl.collect().map(_.getString(0)).toSeq == Seq("n1", "n3"))
      assert(!posted.asScala.last.contains("subsequence("), posted.asScala.last)
      assert(lastServed.get() == recs.size)
    } finally server.stop(0)
  }

  test("eXist dialect: lazy paging stops at the first page under a limit") {
    val posted = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    // more records than one eXist page (1000), so an eager pager would
    // need 2+ POSTs even for LIMIT 2
    val recs = (0 until 1500).map(j => s"<rec><name>n$j</name><kind>k${j % 2}</kind></rec>")
    server.createContext("/exist/rest/db", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body =
          if (ex.getRequestMethod == "POST") {
            val q = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
            posted.add(q)
            val (start, max) = ("""start="(\d+)" max="(\d+)"""".r
              .findFirstMatchIn(q).map(m => (m.group(1).toInt, m.group(2).toInt))
              .getOrElse((1, 10)))
            // honest eXist paging; predicates ignored (superset)
            "<exist:result xmlns:exist=\"http://exist.sourceforge.net/NS/exist\">" +
              recs.slice(start - 1, start - 1 + max).mkString + "</exist:result>"
          } else
            """<exist:result xmlns:exist="http://exist.sourceforge.net/NS/exist">
              |  <exist:collection name="/db/db">
              |    <exist:resource name="a.xml" created="2026-01-01"/>
              |  </exist:collection>
              |</exist:result>""".stripMargin
        val b = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/exist/rest/db"
      val rd = spark.read.format("graft-xml").option("recordTag", "rec")
        .option("columns", "name,kind").option("serverPushdown", "true")
        .option("dialect", "existdb").load(base)
      // a filtered limit: no wire cap, but the lazy pager stops after
      // page 1 (the 4 matching records it needs sit in the first 1000)
      val before = posted.size
      assert(rd.where(col("kind") === "k1").limit(2)
        .collect().map(_.getString(0)).toSeq == Seq("n1", "n3"))
      assert(posted.size - before == 1,
        s"expected 1 page POST, got ${posted.size - before}")
      // unfiltered: the subsequence cap makes the first chunk short
      assert(rd.limit(3).count() == 3)
    } finally server.stop(0)
  }

  test("server graft-geojson: a limit caps the _find cursor") {
    val posted = new java.util.concurrent.atomic.AtomicInteger(0)
    val lastLimit = new java.util.concurrent.atomic.AtomicInteger(-1)
    val docs = (0 until 60).map(i =>
      s"""{"type":"Feature","properties":{"name":"p$i","grp":"g${i % 2}"},"geometry":{"type":"Point","coordinates":[$i,0]}}""")
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/db/_find", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        posted.incrementAndGet()
        val skip = """"skip": (\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt).getOrElse(0)
        val lim = """"limit": (\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt).getOrElse(25)
        lastLimit.set(lim)
        // honest paging; any selector ignored (superset)
        val resp = s"""{"docs":[${docs.slice(skip, skip + lim).mkString(",")}]}"""
          .getBytes("UTF-8")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/db"
      def rd = spark.read.format("graft-geojson")
        .option("columns", "name,grp").option("serverPushdown", "true").load(base)
      val lim = rd.limit(3)
      assert(lim.queryExecution.executedPlan.toString.contains("PushedLimit: 3"),
        lim.queryExecution.executedPlan.toString)
      assert(lim.count() == 3)
      // no re-apply → the cursor itself caps: ONE _find asking for 3 docs
      assert(posted.get() == 1, s"expected 1 page pull, got ${posted.get()}")
      assert(lastLimit.get() == 3, s"wire asked for ${lastLimit.get()} docs")
      // with a pushed filter the cursor must NOT cap (the server could
      // drop re-apply survivors past its first n) — pages stay full-size
      // and the lazy pull still stops at one page
      val before = posted.get()
      assert(rd.where(col("grp") === "g1").limit(2)
        .collect().map(_.getString(0)).toSeq == Seq("p1", "p3"))
      assert(posted.get() - before == 1)
      assert(lastLimit.get() == 25, s"filtered page asked for ${lastLimit.get()}")
    } finally server.stop(0)
  }

  /** An honest-paging `_find` endpoint that records every (skip, limit)
    * request pair — the stride itself is under test here. */
  private def withFindServer(docs: IndexedSeq[String])(
      body: (String, java.util.List[(Int, Int)]) => Unit): Unit = {
    val asked = new java.util.concurrent.CopyOnWriteArrayList[(Int, Int)]()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/db/_find", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val req = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val skip = """"skip": (\d+)""".r.findFirstMatchIn(req).map(_.group(1).toInt).getOrElse(0)
        val lim = """"limit": (\d+)""".r.findFirstMatchIn(req).map(_.group(1).toInt).getOrElse(25)
        asked.add((skip, lim))
        val resp = s"""{"docs":[${docs.slice(skip, skip + lim).mkString(",")}]}"""
          .getBytes("UTF-8")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/db", asked)
    finally server.stop(0)
  }

  test("capped _find cursor keeps the skip stride across a page boundary") {
    val docs = (0 until 60).map(i =>
      s"""{"type":"Feature","properties":{"name":"p$i"},"geometry":{"type":"Point","coordinates":[$i,0]}}""")
    withFindServer(docs) { (base, asked) =>
      val rd = spark.read.format("graft-geojson")
        .option("columns", "name").option("serverPushdown", "true").load(base)
      // 25 < 30 and 30 % 25 != 0: the remainder page must resume at the
      // ABSOLUTE offset 25, not re-derive it from the shrunk limit (a
      // batch*limit stride would ask skip=5 — duplicates + dropped tail)
      val names = rd.limit(30).collect().map(_.getString(0)).toSeq
      assert(names == (0 until 30).map(i => s"p$i"), names)
      assert(asked.asScala.toSeq == Seq((0, 25), (25, 5)), asked.asScala)
    }
  }

  test("a zero-row document cannot make the capped cursor under-deliver") {
    // doc 0 flattens to ZERO rows (empty FeatureCollection): first-3-docs
    // yields only 2 rows, so the cap must be a transfer hint the reader
    // can pull past, never a truncation
    val docs = """{"type":"FeatureCollection","features":[]}""" +:
      (1 until 30).map(i =>
        s"""{"type":"Feature","properties":{"name":"p$i"},"geometry":{"type":"Point","coordinates":[$i,0]}}""")
    withFindServer(docs.toIndexedSeq) { (base, asked) =>
      val rd = spark.read.format("graft-geojson")
        .option("columns", "name").option("serverPushdown", "true").load(base)
      val names = rd.limit(3).collect().map(_.getString(0)).toSeq
      assert(names == Seq("p1", "p2", "p3"), names)
      // capped first ask (3 docs), then the resumed full-size page from
      // the correct absolute offset
      assert(asked.asScala.toSeq == Seq((0, 3), (3, 25)), asked.asScala)
    }
  }
}
