package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class XmlDataSourceSpec extends SparkTestBase {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft-xml").toFile
    d.deleteOnExit()
    val docs = Seq(
      """<col><feature><name>a</name><kind t="x">k1</kind><gml:Point xmlns:gml="http://www.opengis.net/gml"><gml:coordinates>1,2</gml:coordinates></gml:Point></feature></col>""",
      """<col><feature><name>b</name><kind t="y">k2</kind><gml:Point xmlns:gml="http://www.opengis.net/gml"><gml:coordinates>3,4</gml:coordinates></gml:Point></feature>
        |<feature><name>c</name><kind>k3</kind></feature></col>""".stripMargin)
    docs.zipWithIndex.foreach { case (x, i) =>
      java.nio.file.Files.writeString(new java.io.File(d, s"doc$i.xml").toPath, x)
    }
    d.getAbsolutePath
  }

  test("format(graft-xml) reads, infers schema, flattens, extracts geometry") {
    val df = spark.read.format("graft-xml").option("recordTag", "feature").load(dir)
    assert(df.count() == 3)
    assert(df.columns.toSet == Set("name", "kind", "_attribute__kind__t", "geometry"))
    val a = df.where(col("name") === "a").head()
    assert(a.getAs[String]("_attribute__kind__t") == "x")
    assert(spark.read.format("graft-xml").option("recordTag", "feature").load(dir)
      .where(call_function("st_x", col("geometry")) === 1.0).count() == 1)
  }

  test("explicit columns option skips inference") {
    val df = spark.read.format("graft-xml")
      .option("recordTag", "feature").option("columns", "name")
      .load(dir)
    assert(df.columns.toSeq == Seq("name", "geometry"))
    assert(df.count() == 3)
  }

  test("filter pushdown: predicates reach the scan and prune at parse") {
    val df = spark.read.format("graft-xml").option("recordTag", "feature").load(dir)
      .where(col("name") === "a")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(name,a)"), plan)
    // the scan also surfaces the XQuery a live BaseX would receive
    // (Spark adds the implicit IsNotNull → exists())
    assert(plan.contains("XQueryPredicates: [exists(*:name[not(*)][not(@group)]) and *:name = 'a']"), plan)
    assert(df.count() == 1)
    assert(df.head().getAs[String]("kind") == "k1")
  }

  test("filter pushdown: range, IN, LIKE-prefix, IS NULL semantics") {
    val df = spark.read.format("graft-xml").option("recordTag", "feature").load(dir)
    assert(df.where(col("name") > "a").count() == 2)
    assert(df.where(col("name").isin("a", "c")).count() == 2)
    assert(df.where(col("kind").startsWith("k")).count() == 3)
    // record c has no kind attribute → _attribute__kind__t IS NULL
    assert(df.where(col("_attribute__kind__t").isNull).count() == 1)
    assert(df.where(col("_attribute__kind__t").isNotNull).count() == 2)
    // NOT over a missing value is unknown, not true (SQL three-valued logic)
    assert(df.where(!(col("_attribute__kind__t") === "x")).count() == 1)
  }

  test("filter pushdown: filter column pruned from output still applies") {
    val df = spark.read.format("graft-xml").option("recordTag", "feature").load(dir)
      .where(col("_attribute__kind__t") === "y")
      .select("name")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("b"))
  }

  test("pushdown equivalence: every filter shape matches Spark's own evaluation") {
    // adversarial check on the fully-handled pushdown: for each predicate,
    // the pushed source result must equal applying the same predicate in
    // Spark AFTER an unfiltered read (three-valued logic, null handling,
    // NOT/OR, string ordering)
    import org.apache.spark.sql.Column
    val unfiltered = spark.read.format("graft-xml").option("recordTag", "feature")
      .load(dir).cache()
    def col(n: String) = org.apache.spark.sql.functions.col(n)
    val predicates: Seq[Column] = Seq(
      col("name") === "a",
      col("name") =!= "a",
      !(col("name") === "a"),
      col("name") > "a" && col("kind") < "k9",
      col("name").isin("a", "c") || col("_attribute__kind__t") === "y",
      col("_attribute__kind__t").isNull,
      col("_attribute__kind__t").isNotNull && !(col("_attribute__kind__t") === "x"),
      !(col("_attribute__kind__t") === "x"), // NULL kind → unknown → dropped
      col("kind").startsWith("k") && col("kind").endsWith("2"),
      col("kind").contains("3") || col("name") <= "a",
      col("name") <=> "a",
      !col("name").isin("a", "b", "c"))
    for (p <- predicates) {
      val pushed = spark.read.format("graft-xml").option("recordTag", "feature")
        .load(dir).where(p).select("name")
        .collect().map(_.getString(0)).sorted.toSeq
      val baseline = unfiltered.where(p).select("name")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(pushed == baseline, s"predicate: $p pushed=$pushed baseline=$baseline")
    }
    unfiltered.unpersist()
  }

  test("bbox option prunes by geometry envelope at parse") {
    val df = spark.read.format("graft-xml").option("recordTag", "feature")
      .option("bbox", "0,0,2,3").load(dir)
    // only point (1,2) intersects; (3,4) outside; record c has no geometry
    assert(df.collect().map(_.getAs[String]("name")).toSeq == Seq("a"))
    assert(df.queryExecution.executedPlan.toString.contains("bbox: [0,0,2,3]"))
  }

  test("glob paths resolve (load(dir/*.xml))") {
    val df = spark.read.format("graft-xml").option("recordTag", "feature")
      .load(s"$dir/*.xml")
    assert(df.count() == 3)
    val geo = spark.read.format("graft-geojson").option("columns", "name")
      .load(s"$dir/*.nomatch")
    assert(geo.count() == 0) // glob matching nothing = empty, not an error
    intercept[java.io.FileNotFoundException] {
      spark.read.format("graft-xml").option("columns", "name")
        .load(s"$dir/missing-literal-path").count()
    }
  }

  test("HTTP collection: BaseX-REST-style listing, document fetch, pushdown intact") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def serve(path: String, body: String, cType: String): Unit =
      server.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val bytes = body.getBytes("UTF-8")
          ex.getResponseHeaders.add("Content-Type", cType)
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
      })
    val docA =
      """<col><feature><name>a</name><kind>k1</kind><gml:Point xmlns:gml="http://www.opengis.net/gml"><gml:coordinates>1,2</gml:coordinates></gml:Point></feature></col>"""
    val docB =
      """<col><feature><name>b</name><kind>k2</kind></feature><feature><name>c</name><kind>k3</kind></feature></col>"""
    // the BaseX REST listing shape: GET /rest/<db> names the resources
    val listing =
      """<rest:database xmlns:rest="http://basex.org/rest" name="db">
        |  <rest:resource type="xml">a.xml</rest:resource>
        |  <rest:resource type="xml">b.xml</rest:resource>
        |</rest:database>""".stripMargin
    serve("/rest/db/a.xml", docA, "application/xml")
    serve("/rest/db/b.xml", docB, "application/xml")
    serve("/rest/db", listing, "application/xml")
    serve("/pts.geojson",
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"name":"p1"},"geometry":{"type":"Point","coordinates":[5,6]}}]}""".stripMargin,
      "application/geo+json")
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      // schema inference works over HTTP (bounded sample fetch)
      val df = spark.read.format("graft-xml").option("recordTag", "feature")
        .load(s"$base/rest/db")
      assert(df.count() == 3)
      assert(df.columns.contains("name") && df.columns.contains("kind"))
      // pushed string filters still reach the scan on the network path
      val filtered = df.where(col("name") === "a")
      val plan = filtered.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("EqualTo(name,a)"), plan)
      assert(filtered.count() == 1)
      assert(filtered.head().getAs[String]("kind") == "k1")
      // a URL naming a document directly (by extension) skips the listing
      val gj = spark.read.format("graft-geojson").load(s"$base/pts.geojson")
      assert(gj.count() == 1)
      assert(gj.head().getAs[String]("name") == "p1")
    } finally server.stop(0)
  }

  test("serverPushdown: predicates execute on the BaseX REST endpoint") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import scala.jdk.CollectionConverters._
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val posted = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val docGets = new java.util.concurrent.atomic.AtomicInteger(0)
    val docs = Map(
      "a.xml" -> Seq(
        ("""<feature><name>a</name><kind>k1</kind><gml:Point xmlns:gml="http://www.opengis.net/gml"><gml:coordinates>1,2</gml:coordinates></gml:Point></feature>""", "a")),
      "b.xml" -> Seq(
        ("""<feature><name>b</name><kind>k2</kind></feature>""", "b"),
        ("""<feature><name>c</name><kind>k3</kind></feature>""", "c")))
    val listing =
      """<rest:database xmlns:rest="http://basex.org/rest" name="db">
        |  <rest:resource type="xml">a.xml</rest:resource>
        |  <rest:resource type="xml">b.xml</rest:resource>
        |</rest:database>""".stripMargin
    def respond(ex: HttpExchange, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    // POST /rest runs the rest:query; the fake evaluates ONLY the
    // name-equality predicate and ignores everything else — which the
    // client must survive, since it re-applies all pushed filters locally.
    // Aggregation queries (the count-wrapper shapes) group and count the
    // matching records like a real BaseX would run the FLWOR.
    server.createContext("/rest", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        if (ex.getRequestMethod == "POST") {
          val q = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          posted.add(q)
          val doc = """db:open\("db","([^"]+)"\)""".r.findFirstMatchIn(q).get.group(1)
          val nameEq = """\*:name = '([^']*)'""".r.findFirstMatchIn(q).map(_.group(1))
          val matched = docs(doc).filter { case (_, name) => nameEq.forall(_ == name) }
          if (q.contains("_func__")) {
            def fieldOf(xml: String, f: String): Option[String] =
              s"<$f[^>]*>([^<]*)</$f>".r.findFirstMatchIn(xml).map(_.group(1))
            val groupCols = """element\{'(\w+)'\}\{let""".r
              .findAllMatchIn(q).map(_.group(1)).toSeq
              .filterNot(_.startsWith("_func__")) // min/max also bind `let`
            val aggNames = """element\{'(_func__\w+)'\}""".r
              .findAllMatchIn(q).map(_.group(1)).toSeq
            val grouped =
              if (groupCols.isEmpty) Seq(Nil -> matched)
              else matched.groupBy { case (xml, _) => groupCols.map(fieldOf(xml, _)) }
                .toSeq.map { case (k, v) => (groupCols.zip(k.map(_.orNull)), v) }
            val results = grouped.map { case (key, rs) =>
              val gx = key.map { case (c, v) => s"<$c>$v</$c>" }.mkString
              val cx = aggNames.map {
                case n @ "_func__count__star" => s"<$n>${rs.size}</$n>"
                case n if n.startsWith("_func__count__") =>
                  val c = n.stripPrefix("_func__count__")
                  s"<$n>${rs.count(r => fieldOf(r._1, c).isDefined)}</$n>"
                case n => // min/max: string order over present values
                  val c = n.replaceFirst("_func__(min|max)__", "")
                  val vs = rs.flatMap(r => fieldOf(r._1, c))
                  if (vs.isEmpty) s"""<$n null="true"/>"""
                  else s"<$n>${if (n.contains("__min__")) vs.min else vs.max}</$n>"
              }.mkString
              s"<result>$gx$cx</result>"
            }
            respond(ex, s"<rest-results>${results.mkString}</rest-results>")
          } else {
            // selection mode — apply a server-side projection when the
            // query's return clause asks for one, like a real BaseX would
            val projCols = """\$\w+/\*:(\w+)""".r.findAllMatchIn(q).map(_.group(1)).toList
            val wantGeom = q.contains("""/(*|*/*)[""")
            val body =
              if (projCols.isEmpty) matched.map(_._1).mkString
              else matched.map { case (xml, _) =>
                val cols = projCols.flatMap(c =>
                  s"(?s)<$c[^>]*>.*?</$c>".r.findFirstIn(xml))
                val geom =
                  if (wantGeom) "(?s)<gml:Point.*?</gml:Point>".r.findFirstIn(xml).toList
                  else Nil
                s"<result>${(cols ++ geom).mkString}</result>"
              }.mkString
            respond(ex, s"<rest-results>$body</rest-results>")
          }
        } else respond(ex, listing) // GET /rest/db → the resource listing
    })
    docs.keys.foreach { d =>
      server.createContext(s"/rest/db/$d", new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          docGets.incrementAndGet()
          respond(ex, s"<col>${docs(d).map(_._1).mkString}</col>")
        }
      })
    }
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/rest/db"
      def rd = spark.read.format("graft-xml").option("recordTag", "feature")
        .option("columns", "name,kind").option("serverPushdown", "true").load(base)
      // no predicate → the per-document queries return every record
      assert(rd.count() == 3)
      // pushed predicate → evaluated inside the database
      val f = rd.where(col("name") === "a")
      assert(f.queryExecution.executedPlan.toString.contains("ServerExec: basex-rest"))
      assert(f.count() == 1)
      assert(f.head().getAs[String]("kind") == "k1")
      // the sent XQuery is the reference's selection construction
      val sent = posted.asScala.filter(_.contains("a.xml")).last
      assert(sent.contains(
        """for $axmli in db:open("db","a.xml")//*:feature[exists(*:name[not(*)][not(@group)]) and *:name = 'a']"""),
        sent)
      assert(sent.contains("<rest:query xmlns:rest=\"http://basex.org/rest\">"), sent)
      // geometry crosses the wire as records, not rows
      assert(rd.where(call_function("st_x", col("geometry")) === 1.0).count() == 1)
      // a predicate the server ignores (kind=) comes back as a superset;
      // the local re-apply keeps the result exact
      assert(rd.where(col("kind") === "k2").select("name")
        .collect().map(_.getString(0)).toSeq == Seq("b"))
      // narrow reads project server-side: only the output + re-check
      // columns cross the wire, and the filter still applies to them
      val narrow = rd.where(col("name") === "a").select("kind")
      assert(narrow.collect().map(_.getString(0)).toSeq == Seq("k1"))
      val narrowSent = posted.asScala.filter(_.contains("a.xml")).last
      assert(narrowSent.contains("return element{'result'}{$axmli/*:kind,$axmli/*:name}"),
        narrowSent)
      // COUNT + GROUP BY aggregates INSIDE the database — per-group
      // partials cross the wire, not records (the reference's COUNT
      // pushdown into BaseX)
      val counts = rd.groupBy("kind").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(counts == Map("k1" -> 1L, "k2" -> 1L, "k3" -> 1L))
      val aggSent = posted.asScala.last
      // last-wins simple-valued key path: multi-valued elements atomize
      // instead of erroring, matching the flattening's rule
      assert(aggSent.contains(
        "group by $group := ($aggregaterow/*:kind[not(*)])[last()]"), aggSent)
      assert(aggSent.contains("count($aggregaterow)"), aggSent)
      // COUNT(col) counts RECORDS carrying a simple-valued column — the
      // local flattened-map semantics, not raw element occurrences
      import org.apache.spark.sql.functions.count
      assert(rd.groupBy("kind").agg(count("name").as("n"))
        .collect().map(_.getLong(1)).sum == 3)
      assert(posted.asScala.last.contains(
        "element{'_func__count__name'}{count($aggregaterow[*:name[not(*)]])}"),
        posted.asScala.last)
      // tag-less reads select children of the document ROOT (db:open
      // answers a document node — one step would select the root itself)
      assert(spark.read.format("graft-xml").option("columns", "name,kind")
        .option("serverPushdown", "true").load(base).count() == 3)
      assert(posted.asScala.last.contains("\"a.xml\")/*/*") ||
        posted.asScala.last.contains("\"b.xml\")/*/*"), posted.asScala.last)
      // MIN/MAX aggregate inside the database too — forced to xs:string
      // (fn:min would cast untyped values to double and re-order "10"
      // before "9" differently from the local string comparison), with
      // the null marker for an all-absent group
      import org.apache.spark.sql.functions.{min, max}
      val mm = rd.groupBy("kind").agg(min("name").as("lo"), max("name").as("hi"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(mm == Set(("k1", "a", "a"), ("k2", "b", "b"), ("k3", "c", "c")))
      val mmSent = posted.asScala.last
      assert(mmSent.contains("element{'_func__min__name'}{let $v := min(for $r in $aggregaterow " +
        "return ($r/*:name[not(*)])[last()]/string())"), mmSent)
      assert(mmSent.contains("element{'_func__max__name'}{let $v := max("), mmSent)
      // a multi-column GROUP BY binds one grouping variable per key (the
      // reference's comma-joined key list would be invalid XQuery) and
      // STILL aggregates server-side
      val mg = rd.groupBy("kind", "name").count().collect()
      assert(mg.length == 3 && mg.map(_.getLong(2)).sum == 3)
      val mgSent = posted.asScala.last
      assert(mgSent.contains("group by $group0 := ($aggregaterow/*:kind[not(*)])[last()], " +
        "$group1 := ($aggregaterow/*:name[not(*)])[last()]"), mgSent)
      assert(mgSent.contains("_func__count__star"), mgSent)
      // a bbox prune travels as geo:intersects with a GML2 envelope —
      // the reference's spatial pushdown into BaseX; the fake ignores it
      // (superset) and the local prune keeps the result exact
      val boxed = spark.read.format("graft-xml").option("recordTag", "feature")
        .option("columns", "name,kind").option("serverPushdown", "true")
        .option("bbox", "0,0,2,3").load(base)
      assert(boxed.collect().map(_.getAs[String]("name")).toSeq == Seq("a"))
      val spatialSent = posted.asScala.last
      assert(spatialSent.contains("geo:intersects(<gml:Polygon"), spatialSent)
      assert(spatialSent.contains("outerBoundaryIs"), spatialSent)
      // envelope semantics + any-geometry + both nesting shapes: the
      // server-side prune must be a SUPERSET of the local envelope test
      assert(spatialSent.contains("some $g in (*|*/*)["), spatialSent)
      assert(spatialSent.contains("geo:envelope($g)"), spatialSent)
      // an unsatisfiable prune never reaches the server
      val before = posted.size
      assert(spark.read.format("graft-xml").option("recordTag", "feature")
        .option("columns", "name,kind").option("serverPushdown", "true")
        .option("bbox", "empty").load(base).count() == 0)
      assert(posted.size == before)
      // server mode never fetched a full document
      assert(docGets.get == 0)
    } finally server.stop(0)
  }

  test("serverPushdown: eXist-db dialect speaks the eXist REST protocol") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import scala.jdk.CollectionConverters._
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val posted = new java.util.concurrent.CopyOnWriteArrayList[String]()
    // eXist names listing resources in a `name` attribute
    val listing =
      """<exist:result xmlns:exist="http://exist.sourceforge.net/NS/exist">
        |  <exist:collection name="/db/db">
        |    <exist:resource name="a.xml" created="2026-01-01"/>
        |  </exist:collection>
        |</exist:result>""".stripMargin
    def respond(ex: HttpExchange, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    server.createContext("/exist/rest/db", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        if (ex.getRequestMethod == "POST") {
          val q = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          posted.add(q)
          // the fake evaluates the name-equality predicate
          val nameEq = """\*:name = '([^']*)'""".r.findFirstMatchIn(q).map(_.group(1))
          val recs = Seq(
            ("""<feature><name>a</name><kind>k1</kind></feature>""", "a"),
            ("""<feature><name>b</name><kind>k2</kind></feature>""", "b"))
            .collect { case (xml, n) if nameEq.forall(_ == n) => xml }
          respond(ex,
            "<exist:result xmlns:exist=\"http://exist.sourceforge.net/NS/exist\">" +
              recs.mkString + "</exist:result>")
        } else respond(ex, listing)
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/exist/rest/db"
      val rd = spark.read.format("graft-xml").option("recordTag", "feature")
        .option("columns", "name,kind")
        .option("serverPushdown", "true").option("dialect", "existdb").load(base)
      assert(rd.count() == 2)
      val f = rd.where(col("name") === "a")
      assert(f.queryExecution.executedPlan.toString.contains("ServerExec: existdb-rest"))
      assert(f.head().getAs[String]("kind") == "k1")
      val sent = posted.asScala.last
      // the eXist protocol envelope + the reference's hierarchical
      // collection() access (existdb_extension.ts:36), no result wrapper
      // explicit paging attributes: without max, eXist truncates at its
      // own default result-chunk size
      assert(sent.contains(
        "<query xmlns=\"http://exist.sourceforge.net/NS/exist\" start=\"1\" max=\"1000\">"),
        sent)
      assert(sent.contains(
        """for $axmli in collection("/db/db/a.xml")//*:feature[exists(*:name[not(*)][not(@group)]) and *:name = 'a']"""),
        sent)
      assert(!sent.contains("rest-results"), sent)
    } finally server.stop(0)
  }

  test("SQL-only flow: CREATE TEMPORARY VIEW ... USING graft-xml") {
    // the reference's users work purely in SQL — the DDL path must reach
    // the same DSv2 source with pushdown intact
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW xml_sql_view
         |USING `graft-xml`
         |OPTIONS (path '$dir', recordTag 'feature', columns 'name,kind')""".stripMargin)
    assert(spark.sql("SELECT name FROM xml_sql_view WHERE kind = 'k2'")
      .collect().map(_.getString(0)).toSeq == Seq("b"))
    val plan = spark.sql("SELECT name FROM xml_sql_view WHERE name = 'a'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(name,a)"), plan)
  }

  test("SQL over the source: spatial filter composes") {
    spark.read.format("graft-xml").option("recordTag", "feature").load(dir)
      .createOrReplaceTempView("xml_features")
    val n = spark.sql(
      "SELECT count(*) AS n FROM xml_features WHERE geometry IS NOT NULL AND ST_Y(geometry) > 3.0")
      .head().getLong(0)
    assert(n == 1)
  }
}
