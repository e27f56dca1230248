package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pushed ORDER BY + LIMIT (TopN) on both DSv2 sources: per-partition
  * bounded-heap reduction after the local filter re-apply (partial
  * pushdown — Spark still merges globally), a wire-level `order by` +
  * `subsequence` cap on predicate-free BaseX/eXist scans, and NO wire cap
  * on the document-store path (BSON type order provably diverges from the
  * flattened string order). */
class TopNPushdownSpec extends SparkTestBase {

  import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
  import scala.jdk.CollectionConverters._

  // ------------------------------------------------------------ heap unit

  private def naiveTopN(rows: Seq[Map[String, String]], keys: Seq[TopNPushdown.SortKey],
                        n: Int): Seq[Array[UTF8String]] =
    rows.map(m => TopNPushdown.keyVec(keys, m))
      .sortWith((a, b) => TopNPushdown.compareKeys(keys, a, b) < 0).take(n)

  test("bounded heap equals naive sort-take under every direction/null combo") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 500).map { _ =>
      val m = scala.collection.mutable.Map.empty[String, String]
      if (rnd.nextInt(5) != 0) m += "a" -> rnd.nextInt(40).toString // "10" < "9" string order on purpose
      if (rnd.nextInt(7) != 0) m += "b" -> ("v" + rnd.nextInt(3))
      m.toMap
    }
    for (aDesc <- Seq(false, true); aNl <- Seq(false, true);
         bDesc <- Seq(false, true); bNl <- Seq(false, true); n <- Seq(0, 1, 7, 499, 600)) {
      val keys = Seq(TopNPushdown.SortKey("a", aDesc, aNl), TopNPushdown.SortKey("b", bDesc, bNl))
      val got = TopNPushdown.topN(rows.iterator, keys, n)(m => TopNPushdown.keyVec(keys, m))
        .map(m => TopNPushdown.keyVec(keys, m)).toSeq
        .sortWith((a, b) => TopNPushdown.compareKeys(keys, a, b) < 0)
      val want = naiveTopN(rows, keys, n)
      assert(got.length == want.length, s"$keys n=$n")
      got.zip(want).foreach { case (g, w) =>
        // same key vectors kept (ties may swap indistinguishable records)
        assert(TopNPushdown.compareKeys(keys, g, w) == 0, s"$keys n=$n")
      }
    }
  }

  test("translate refuses expressions, unknown and non-string columns") {
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, NullOrdering}
    val schema = geojson.GeoJsonDataSource.schemaFor(Seq("name", "grp")) // + binary geometry
    def order(col: String) = Expressions.sort(
      Expressions.column(col), SortDirection.ASCENDING, NullOrdering.NULLS_FIRST)
    assert(TopNPushdown.translate(Array(order("name"), order("grp")), schema).isDefined)
    assert(TopNPushdown.translate(Array(order("nope")), schema).isEmpty)
    assert(TopNPushdown.translate(Array(order("geometry")), schema).isEmpty) // binary
    assert(TopNPushdown.translate(Array.empty, schema).isEmpty)
  }

  // ------------------------------------------------------- local graft-xml

  test("local graft-xml: ORDER BY + LIMIT pushes, heap matches full sort") {
    val dir = java.nio.file.Files.createTempDirectory("graft-topn").toFile
    (0 until 3).foreach { i =>
      val recs = (0 until 40).map { j =>
        val v = (i * 40 + j) * 7919 % 120 // unique, scrambled
        // every 11th record lacks <name> → NULL sort key
        if (v % 11 == 0) s"<feature><kind>k${j % 2}</kind></feature>"
        else f"<feature><name>n$v%03d</name><kind>k${j % 2}</kind></feature>"
      }.mkString
      java.nio.file.Files.write(new java.io.File(dir, s"d$i.xml").toPath,
        s"<col>$recs</col>".getBytes("UTF-8"))
    }
    val rd = spark.read.format("graft-xml").option("recordTag", "feature")
      .option("columns", "name,kind").load(dir.getAbsolutePath)
    val q = rd.orderBy(col("name").desc_nulls_last).limit(5)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN: [name DESC NULLS LAST], N: 5"), plan)
    val want = rd.collect().map(r => Option(r.getString(0)))
      .sortBy(identity)(Ordering[Option[String]].reverse).take(5).map(_.get).toSeq
    assert(q.collect().map(_.getString(0)).toSeq == want)
    // NULLS FIRST ascending: the name-less records lead
    val nf = rd.orderBy(col("name").asc_nulls_first).limit(3)
    assert(nf.queryExecution.executedPlan.toString.contains("NULLS FIRST"), nf.queryExecution.executedPlan)
    assert(nf.collect().forall(_.isNullAt(0)))
    // a sort on an expression stays in Spark — no push, same answer
    val expr = rd.orderBy(concat(col("kind"), col("name")).desc).limit(4)
    assert(!expr.queryExecution.executedPlan.toString.contains("PushedTopN"))
    assert(expr.count() == 4)
    // TopN under a pushed filter: truncation AFTER the re-apply
    val fl = rd.where(col("kind") === "k1").orderBy(col("name")).limit(4)
    assert(fl.queryExecution.executedPlan.toString.contains("PushedTopN"))
    assert(fl.collect().forall(_.getString(1) == "k1"))
  }

  // ------------------------------------------------------ server graft-xml

  test("server graft-xml: predicate-free TopN ships order by + subsequence; filtered does not") {
    val posted = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val lastServed = new java.util.concurrent.atomic.AtomicInteger(-1)
    val recs = Seq(3, 1, 4, 1, 5, 9, 2, 6).zipWithIndex.map { case (v, j) =>
      s"<rec><name>n$v$j</name><kind>k${j % 2}</kind></rec>"
    }
    def nameOf(r: String) = """<name>([^<]*)</name>""".r.findFirstMatchIn(r).get.group(1)
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/rest", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body =
          if (ex.getRequestMethod == "POST") {
            val q = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
            posted.add(q)
            // an honest BaseX: sort when ordered, cap when subsequenced,
            // predicates deliberately ignored (superset)
            val ordered =
              if (!q.contains("order by")) recs
              else {
                val desc = q.contains("descending")
                val s = recs.sortBy(nameOf)
                if (desc) s.reverse else s
              }
            val n = """(?s)subsequence\(.*, 1, (\d+)\)""".r
              .findFirstMatchIn(q).map(_.group(1).toInt).getOrElse(recs.size)
            lastServed.set(math.min(n, ordered.size))
            s"<rest-results>${ordered.take(n).mkString}</rest-results>"
          } else
            """<rest:database xmlns:rest="http://basex.org/rest">
              |<rest:resource>a.xml</rest:resource></rest:database>""".stripMargin
        val b = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/rest/db"
      def rd = spark.read.format("graft-xml").option("recordTag", "rec")
        .option("columns", "name,kind").option("serverPushdown", "true").load(base)
      // no predicate → the ordered cap travels and the wire carried 3
      val top = rd.orderBy(col("name").desc).limit(3).collect().map(_.getString(0)).toSeq
      assert(top == recs.map(nameOf).sorted.reverse.take(3), top)
      val wire = posted.asScala.last
      assert(wire.contains(
        "order by ($axmli/*:name[not(*)][not(@group)])[last()]/string() descending empty least"), wire)
      assert(wire.contains("subsequence("), wire)
      assert(lastServed.get() == 3, s"wire carried ${lastServed.get()} records")
      // pushed filter → NO wire order/cap (the server's first-n could
      // shrink under the re-apply); local heap keeps it exact against
      // the predicate-ignoring server
      val fl = rd.where(col("kind") === "k1").orderBy(col("name")).limit(2)
      assert(fl.collect().map(_.getString(0)).toSeq ==
        recs.zipWithIndex.filter(_._2 % 2 == 1).map(p => nameOf(p._1)).sorted.take(2))
      val fwire = posted.asScala.last
      assert(!fwire.contains("order by"), fwire)
      assert(!fwire.contains("subsequence("), fwire)
      assert(lastServed.get() == recs.size)
    } finally server.stop(0)
  }

  test("eXist dialect: ordered cap travels and pages stay short") {
    val posted = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val recs = Seq(5, 2, 9, 1, 7).zipWithIndex.map { case (v, j) =>
      s"<rec><name>n$v$j</name></rec>"
    }
    def nameOf(r: String) = """<name>([^<]*)</name>""".r.findFirstMatchIn(r).get.group(1)
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/exist/rest/db", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body =
          if (ex.getRequestMethod == "POST") {
            val q = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
            posted.add(q)
            val (start, max) = """start="(\d+)" max="(\d+)"""".r
              .findFirstMatchIn(q).map(m => (m.group(1).toInt, m.group(2).toInt))
              .getOrElse((1, 10))
            // an honest eXist: evaluate order by + subsequence, THEN the
            // protocol's start/max paging over the result sequence
            val ordered =
              if (!q.contains("order by")) recs
              else { val s = recs.sortBy(nameOf); if (q.contains("descending")) s.reverse else s }
            val capped = """(?s)subsequence\(.*, 1, (\d+)\)""".r
              .findFirstMatchIn(q).map(m => ordered.take(m.group(1).toInt)).getOrElse(ordered)
            "<exist:result xmlns:exist=\"http://exist.sourceforge.net/NS/exist\">" +
              capped.slice(start - 1, start - 1 + max).mkString + "</exist:result>"
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
        .option("columns", "name").option("serverPushdown", "true")
        .option("dialect", "existdb").load(base)
      val before = posted.size
      val top = rd.orderBy(col("name")).limit(2).collect().map(_.getString(0)).toSeq
      assert(top == recs.map(nameOf).sorted.take(2), top)
      val wire = posted.asScala.last
      assert(wire.contains("order by") && wire.contains("subsequence("), wire)
      // the capped sequence has 2 records: ONE page suffices
      assert(posted.size - before == 1, s"pages: ${posted.size - before}")
    } finally server.stop(0)
  }

  test("ascending nulls-last maps to empty greatest on the wire") {
    val sk = Seq(TopNPushdown.SortKey("name", descending = false, nullsLast = true))
    val clause = graft.sources.xquery.BaseXRest.orderByClause("v", sk)
    assert(clause ==
      "order by ($v/*:name[not(*)][not(@group)])[last()]/string() ascending empty greatest")
    val desc = Seq(TopNPushdown.SortKey("name", descending = true, nullsLast = false))
    assert(graft.sources.xquery.BaseXRest.orderByClause("v", desc).endsWith("descending empty greatest"))
  }

  // -------------------------------------------------- server graft-geojson

  test("server graft-geojson: TopN reduces locally, wire stays uncapped and unordered") {
    val posted = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val docs = Seq(12, 3, 25, 7, 19, 1).zipWithIndex.map { case (v, i) =>
      s"""{"type":"Feature","properties":{"name":"p$v","grp":"g${i % 2}"},"geometry":{"type":"Point","coordinates":[$i,0]}}"""
    }
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/db/_find", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val req = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        posted.add(req)
        val skip = """"skip": (\d+)""".r.findFirstMatchIn(req).map(_.group(1).toInt).getOrElse(0)
        val lim = """"limit": (\d+)""".r.findFirstMatchIn(req).map(_.group(1).toInt).getOrElse(25)
        val resp = s"""{"docs":[${docs.slice(skip, skip + lim).mkString(",")}]}""".getBytes("UTF-8")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/db"
      val rd = spark.read.format("graft-geojson")
        .option("columns", "name,grp").option("serverPushdown", "true").load(base)
      val q = rd.orderBy(col("name")).limit(2)
      assert(q.queryExecution.executedPlan.toString.contains("PushedTopN"), q.queryExecution.executedPlan)
      // string order: p1 < p12 < p19 < p25 < p3 < p7
      assert(q.collect().map(_.getString(0)).toSeq == Seq("p1", "p12"))
      // the wire carried NO sort and NO shrunk limit — full-size page
      val wire = posted.asScala.last
      assert(!wire.contains("sort"), wire)
      assert(wire.contains("\"limit\": 25"), wire)
    } finally server.stop(0)
  }
}
