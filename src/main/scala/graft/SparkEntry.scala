package graft

import graft.operators.{Ann, ContainmentJoin, Corpus, Dedup, FuzzyJoin, Graphs, Layout, Multimodal, Retrieval, Sketches, SkewJoin, SpatialJoin, Temporal, TextAnalysis}
import graft.sources.Xml
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Driver contract — the complete operator surface (SURVEY.md §2).
  *
  * Geometry queries derive coordinates from numeric columns so the DuckDB
  * oracle (no spatial extension) can verify the math with plain arithmetic
  * (SURVEY.md §6). Doubles that go through different computation paths are
  * rounded on BOTH sides before compare.
  */
object SparkEntry {
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[Integer, String]()

  /** One temp store for the q_ivf_pq gate per JVM, deleted at exit —
    * the write is mode=overwrite, so repeated gate runs reuse it
    * instead of leaving a dead store per invocation. */
  private lazy val ivfPqGateDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ivfpq-gate")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Same per-JVM reuse for the q_ivf_opq gate's store. */
  private lazy val ivfOpqGateDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ivfopq-gate")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Per-JVM dir for the q_compact gate (the fragmented write is
    * mode=overwrite, so repeated bench passes reuse it). */
  private lazy val compactGateDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-compact-gate")
    d.toFile.deleteOnExit()
    d.toString + "/t"
  }

  /** Per-JVM dir for the q_upsert_stream_parity gate, WIPED at every
    * invocation: the gate's batchIds restart at 0 each pass, and the
    * sink's replay guard would (correctly) skip them against a
    * surviving manifest — a clean slate keeps each pass the same
    * cold-cost apply sequence without accumulating temp stores. */
  private def wipedDir(root: String): String = {
    val d = new java.io.File(root)
    if (d.exists) {
      // Files.walk holds a directory stream until closed — leaking one
      // per gate invocation leaks file descriptors across a bench run
      val walk = java.nio.file.Files.walk(d.toPath)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
      finally walk.close()
    }
    d.mkdirs()
    d.toString
  }
  private def upsertGateDir(): String = wipedDir(upsertGateRoot)
  private lazy val upsertGateRoot: String = gateRoot("graft-upsert-gate")

  /** One per-JVM root per sink-backed gate (wiped per invocation via
    * [[wipedDir]], same restart-at-batch-0 reason as [[upsertGateDir]]). */
  private def gateRoot(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString + "/t"
  }
  private lazy val compactSinkGateRoot = gateRoot("graft-compact-sink-gate")
  private def compactSinkGateDir(): String = wipedDir(compactSinkGateRoot)
  private lazy val timeTravelGateRoot = gateRoot("graft-time-travel-gate")
  private def timeTravelGateDir(): String = wipedDir(timeTravelGateRoot)
  private lazy val timeTravelSqlGateRoot = gateRoot("graft-tt-sql-gate")
  private def timeTravelSqlGateDir(): String = wipedDir(timeTravelSqlGateRoot)
  private lazy val pointLookupGateRoot = gateRoot("graft-point-lookup-gate")
  private def pointLookupGateDir(): String = wipedDir(pointLookupGateRoot)
  private lazy val tableScanGateRoot = gateRoot("graft-table-scan-gate")
  private def tableScanGateDir(): String = wipedDir(tableScanGateRoot)
  private lazy val matviewGateRoot = gateRoot("graft-matview-gate")
  private def matviewGateDir(): String = wipedDir(matviewGateRoot)
  private lazy val changefeedGateRoot = gateRoot("graft-changefeed-gate")
  private def changefeedGateDir(): String = wipedDir(changefeedGateRoot)
  private lazy val schemaEvoGateRoot = gateRoot("graft-schema-evo-gate")
  private def schemaEvoGateDir(): String = wipedDir(schemaEvoGateRoot)

  private[graft] def init(spark: SparkSession, dir: String): SparkSession = {
    // re-registering 10 views costs ~0.3 s of schema reads — do it once per
    // (session, dir)
    val key = Integer.valueOf(System.identityHashCode(spark))
    if (registeredDir.get(key) != dir) {
      Graft.register(spark)
      // events.ts is parquet TIMESTAMP(NANOS) which Spark has no native type
      // for: read the raw int64 nanos and downcast to a microsecond timestamp.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the NTZ→LTZ normalization below is value-preserving ONLY at UTC;
      // pin it here rather than trusting every caller to have set it
      // (Bench/Verify/tests do, an ad-hoc session may not)
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      tables.foreach { t =>
        val df = spark.read.parquet(s"$dir/$t.parquet")
        val fixed =
          if (t == "events") df.schema("ts").dataType match {
            // the NANOS encoding arrives as a long under nanosAsLong
            case org.apache.spark.sql.types.LongType =>
              df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
            // DuckDB-written parquet (e.g. the sf1 generator) arrives as
            // TIMESTAMP_NTZ, which rejects CAST(ts AS BIGINT); at the
            // session's UTC timezone the LTZ reinterpretation is value-
            // identical, so normalize once here
            case _: org.apache.spark.sql.types.TimestampNTZType =>
              df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
            case _ => df
          } else df
        fixed.createOrReplaceTempView(t)
      }
      registeredDir.put(key, dir)
    }
    spark
  }

  /** Derived test geometry: every customer/supplier becomes a point with
    * 4-decimal x and integer y — oracle-reproducible with arithmetic. */
  private val PT = "ST_Point(c_acctbal / 100.0, CAST(c_custkey % 97 AS DOUBLE))"
  private val CX = "(c_acctbal / 100.0)"
  private val CY = "CAST(c_custkey % 97 AS DOUBLE)"

  /** In-process OP_MSG endpoint serving customer-derived Feature
    * documents for the live Mongo gates: real wire frames, honest
    * nk-equality evaluation for `find`, cursor paging via `getMore`, and
    * honest per-property COUNT grouping for the generated `aggregate`
    * pipeline (the endpoint groups its real documents by the property
    * the pipeline names — it does not echo precomputed answers). */
  private def withInlineMongod(spark: org.apache.spark.sql.SparkSession)(
      body: String => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val docs = spark.sql(
      s"""SELECT concat('{"type":"Feature","properties":{"name":"', c_name,
         |  '","nk":"', CAST(c_nationkey AS STRING),
         |  '"},"geometry":{"type":"Point","coordinates":[', CAST($CX AS STRING), ',',
         |  CAST($CY AS STRING), ']}}') AS j
         |FROM customer""".stripMargin)
      .collect().map(_.getString(0)).toIndexedSeq
    val server = new java.net.ServerSocket(0, 16,
      java.net.InetAddress.getByName("127.0.0.1"))
    val cursors = new java.util.concurrent.ConcurrentHashMap[
      Long, scala.collection.mutable.Queue[String]]()
    val nextCursor = new java.util.concurrent.atomic.AtomicLong(1L)
    def reply(cmdJson: String): String = {
      val batch = """"batchSize":(\d+)""".r.findFirstMatchIn(cmdJson)
        .map(_.group(1).toInt).getOrElse(101)
      def page(q: scala.collection.mutable.Queue[String], id: Long, first: Boolean) = {
        val out = (0 until math.min(batch, q.size)).map(_ => q.dequeue())
        val more = q.nonEmpty
        if (!more) cursors.remove(id) else cursors.put(id, q)
        s"""{"cursor":{"${if (first) "firstBatch" else "nextBatch"}":[${out.mkString(",")}],""" +
          s""""id":${if (more) id else 0L},"ns":"db.features"},"ok":1.0}"""
      }
      if (cmdJson.contains(""""find":""")) {
        val nkEq = """"properties\.nk":\{"\$eq":"([^"]*)"\}""".r
          .findFirstMatchIn(cmdJson).map(_.group(1))
        val matched = docs.filter(d => nkEq.forall(v => d.contains(s""""nk":"$v"""")))
        page(scala.collection.mutable.Queue(matched: _*), nextCursor.getAndIncrement(), first = true)
      } else if (cmdJson.contains(""""aggregate":""")) {
        // honor the exact typed $match prefix's string branch (the inline
        // corpus stores every property as a JSON string, so the string
        // branch IS the whole truth here — FakeMongod in the spec suite
        // evaluates the full typed expression)
        // whitespace-tolerant: the command arrives re-rendered compactly
        val matchEq = """\{"\$eq":\s*\["\$f\.properties\.([A-Za-z0-9_]+)",\s*"([^"]*)"\]\}""".r
          .findFirstMatchIn(cmdJson).map(m => (m.group(1), m.group(2)))
        val eligible = docs.filter(d =>
          matchEq.forall { case (c, v) => d.contains(s""""$c":"$v"""") })
        val gcol = """"g0":\s*\{"\$toString":\s*\{"\$ifNull":\s*\["\$f\.properties\.([A-Za-z0-9_]+)"""".r
          .findFirstMatchIn(cmdJson).map(_.group(1)).getOrElse(
            throw new IllegalArgumentException(s"inline mongod: no group column in $cmdJson"))
        val ex = ("\"" + gcol + "\":\"([^\"]*)\"").r
        val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        eligible.foreach(d => ex.findFirstMatchIn(d).foreach(m =>
          counts(m.group(1)) = counts.getOrElse(m.group(1), 0L) + 1))
        val rows = counts.map { case (v, n) =>
          s"""{"_id":{"g0":${graft.JsonText.str(v)}},"a0":$n}"""
        }.toIndexedSeq
        page(scala.collection.mutable.Queue(rows: _*), nextCursor.getAndIncrement(), first = true)
      } else {
        val id = """"getMore":(\d+)""".r.findFirstMatchIn(cmdJson).get.group(1).toLong
        page(Option(cursors.get(id)).getOrElse(scala.collection.mutable.Queue.empty), id, first = false)
      }
    }
    val acceptor = new Thread(() => {
      try while (true) {
        val sock = server.accept()
        new Thread(() => try {
          val in = new java.io.DataInputStream(sock.getInputStream)
          val out = new java.io.DataOutputStream(sock.getOutputStream)
          while (true) {
            val lenB = new Array[Byte](4); in.readFully(lenB)
            val total = java.nio.ByteBuffer.wrap(lenB)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt()
            val rest = new Array[Byte](total - 4); in.readFully(rest)
            val buf = java.nio.ByteBuffer.wrap(rest)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val reqId = buf.getInt(); buf.getInt(); buf.getInt(); buf.getInt()
            buf.get() // kind 0
            val body = graft.sources.mongo.Bson.fromJson(
              reply(graft.sources.mongo.Bson.toJson(buf)))
            val frame = java.nio.ByteBuffer.allocate(21 + body.length)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            frame.putInt(21 + body.length).putInt(1).putInt(reqId).putInt(2013)
            frame.putInt(0).put(0.toByte).put(body)
            out.write(frame.array()); out.flush()
          }
        } catch { case _: Throwable => () }).start()
      } catch { case _: Throwable => () }
    })
    acceptor.setDaemon(true)
    acceptor.start()
    try body(s"mongodb://127.0.0.1:${server.getLocalPort}/db/features")
    finally server.close()
  }

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (spark, dir) => init(spark, dir).sql(q)

  /** Shared in-process BaseX-REST endpoint + read for the two join gates:
    * customer records sharded over four `dbc` documents, nation records
    * in `dbn` (all) and `dbn2` (nationkey < 10 only — the LEFT gate's
    * restricted right side, so null extension provably occurs). The fake
    * evaluates ONLY the join's ON equality; per-side predicates are
    * deliberately ignored (superset), which the local re-apply absorbs. */
  private def xmlJoinServerGate(spark: SparkSession, leftJoin: Boolean): DataFrame = {
    val custRecs = spark.sql(
      """SELECT c_custkey % 4 AS part,
        |  concat('<rec><name>', c_name, '</name><nk>', CAST(c_nationkey AS STRING), '</nk></rec>') AS r
        |FROM customer""".stripMargin)
      .collect().groupBy(_.getLong(0))
      .map { case (p, rows) => (s"d$p.xml", rows.map(_.getString(1)).mkString) }
    def natDoc(maxExclusive: Int) = spark.sql(
      s"""SELECT concat('<rec><nname>', n_name, '</nname><nkey>', CAST(n_nationkey AS STRING), '</nkey></rec>') AS r
         |FROM nation WHERE n_nationkey < $maxExclusive""".stripMargin)
      .collect().map(_.getString(0)).mkString
    val natDocs = Map("dbn" -> natDoc(Int.MaxValue), "dbn2" -> natDoc(10))
    def listing(names: Seq[String]) =
      "<rest:database xmlns:rest=\"http://basex.org/rest\">" +
        names.sorted.map(n => s"<rest:resource>$n</rest:resource>").mkString +
        "</rest:database>"
    val rec = s"<rec>((?:(?!</rec>).)*)</rec>".r
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/rest", new com.sun.net.httpserver.HttpHandler {
      override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
        val resp =
          if (ex.getRequestMethod == "POST") {
            val q = new String(ex.getRequestBody.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
            val opened = """db:open\("([^"]+)","([^"]+)"\)""".r
              .findAllMatchIn(q).map(m => (m.group(1), m.group(2))).toSeq
            val body = opened match {
              case Seq(("dbc", doc), (rdb, _)) if natDocs.contains(rdb) =>
                // the join query: evaluate ONLY the ON equality (nk =
                // nkey) — per-side predicates deliberately ignored
                val nats = rec.findAllMatchIn(natDocs(rdb)).map(_.group(1)).map { n =>
                  ("<nkey>([^<]*)</nkey>".r.findFirstMatchIn(n).get.group(1), n)
                }.toMap
                rec.findAllMatchIn(custRecs(doc)).map(_.group(1)).flatMap { c =>
                  val nk = "<nk>([^<]*)</nk>".r.findFirstMatchIn(c).get.group(1)
                  nats.get(nk).map(n => s"<result><l>$c</l><r>$n</r></result>")
                }.mkString
              case Seq(("dbc", doc))                       => custRecs(doc)
              case Seq((rdb, _)) if natDocs.contains(rdb)  => natDocs(rdb)
              case _                                       => ""
            }
            s"<rest-results>$body</rest-results>"
          } else if (ex.getRequestURI.getPath.endsWith("dbn") ||
                     ex.getRequestURI.getPath.endsWith("dbn2")) listing(Seq("n.xml"))
          else listing(custRecs.keys.toSeq)
        val b = resp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b)
        ex.close()
      }
    })
    server.start()
    val joinConf = "spark.sql.optimizer.datasourceV2JoinPushdown"
    val priorJoinConf = spark.conf.getOption(joinConf)
    spark.conf.set(joinConf, "true")
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/rest"
      val c = spark.read.format("graft-xml")
        .option("recordTag", "rec").option("columns", "name,nk")
        .option("serverPushdown", "true").load(s"$base/dbc")
      val n = spark.read.format("graft-xml")
        .option("recordTag", "rec").option("columns", "nname,nkey")
        .option("serverPushdown", "true")
        .load(s"$base/${if (leftJoin) "dbn2" else "dbn"}")
      val joined =
        if (leftJoin)
          c.join(n, c("nk") === n("nkey"), "left")
            .select(col("name"), col("nk"), col("nname"))
        else
          c.join(n, c("nk") === n("nkey"))
            .where(col("nname").startsWith("NATION_1"))
            .select(col("name"), col("nk"), col("nname"))
      operators.Dedup.trackResult(joined.localCheckpoint(true))
    } finally {
      priorJoinConf match {
        case Some(v) => spark.conf.set(joinConf, v)
        case None    => spark.conf.unset(joinConf)
      }
      server.stop(0)
    }
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Grid-partitioned spatial distance join + aggregate: customers within
    * distance 8 of a supplier, counted per nation. */
  def entry(spark: SparkSession): DataFrame = {
    init(spark, "/root/testdata/sf0.001")
    val cust = spark.sql(s"SELECT c_custkey, c_nationkey, $PT AS cgeom FROM customer")
    val supp = spark.sql(
      "SELECT s_suppkey, ST_Point(s_acctbal / 100.0, CAST(s_suppkey % 97 AS DOUBLE)) AS sgeom FROM supplier")
    SpatialJoin.distanceJoin(cust, "cgeom", supp, "sgeom", radius = 8.0, cellSize = 8.0)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    // ---------------------------------------------------- relational surface
    "q_select_filter" -> sql(
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        |FROM customer
        |WHERE c_acctbal > 1000 AND c_mktsegment = 'BUILDING' AND c_nationkey <> 3""".stripMargin),
    "q_filter_in" -> sql(
      """SELECT p_partkey, p_size, p_brand FROM part
        |WHERE p_size IN (5, 10, 15, 20) AND p_partkey NOT IN (1, 2, 3)""".stripMargin),
    "q_filter_isnull" -> sql(
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE nullif(o_orderstatus, 'F') IS NOT NULL AND o_totalprice IS NOT NULL""".stripMargin),
    "q_groupby_agg" -> sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price,
        |       round(min(l_discount), 4) AS min_disc,
        |       round(max(l_tax), 4) AS max_tax
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin),
    "q_join_inner" -> sql(
      """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin),
    "q_join_left" -> sql(
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey""".stripMargin),
    "q_join_full" -> sql(
      """SELECT coalesce(a.k, b.k) AS k, coalesce(a.cnt_a, 0) AS cnt_a, coalesce(b.cnt_b, 0) AS cnt_b
        |FROM (SELECT c_nationkey AS k, count(*) AS cnt_a FROM customer GROUP BY 1) a
        |FULL JOIN (SELECT s_nationkey AS k, count(*) AS cnt_b FROM supplier GROUP BY 1) b
        |ON a.k = b.k""".stripMargin),
    "q_subquery_from" -> sql(
      """SELECT mkt, round(avg(total), 2) AS avg_total
        |FROM (SELECT c_mktsegment AS mkt, o_totalprice AS total
        |      FROM customer JOIN orders ON o_custkey = c_custkey) t
        |GROUP BY mkt""".stripMargin),
    "q_subquery_in_where" -> sql(
      """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 500)""".stripMargin),
    "q_mod_filter" -> sql(
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE mod(l_orderkey, 7) = 0 AND l_quantity > 25""".stripMargin),
    "q_date_filter" -> sql(
      """SELECT l_orderkey, l_linenumber, CAST(CAST(l_shipdate AS DATE) AS STRING) AS ship_d FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'""".stripMargin),
    "q_orderby_limit" -> sql(
      """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
    "q_distinct" -> sql(
      "SELECT DISTINCT c_mktsegment AS seg, c_nationkey AS nk FROM customer"),
    "q_expr_project" -> sql(
      """SELECT l_orderkey, l_linenumber,
        |       floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100 AS charge,
        |       CASE WHEN l_quantity > 30 THEN 'bulk' ELSE 'small' END AS qclass
        |FROM lineitem WHERE l_linenumber = 1""".stripMargin),

    "q_like" -> sql(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_name LIKE 'Customer#0000001%' AND c_name NOT LIKE '%9'""".stripMargin),
    "q_having" -> sql(
      """SELECT c_nationkey, count(*) AS n, round(sum(c_acctbal), 2) AS bal
        |FROM customer GROUP BY c_nationkey HAVING count(*) > 20""".stripMargin),
    "q_union" -> sql(
      """SELECT c_nationkey AS k, 'cust' AS side FROM customer WHERE c_acctbal > 9000
        |UNION ALL
        |SELECT s_nationkey AS k, 'supp' AS side FROM supplier WHERE s_acctbal > 9000""".stripMargin),
    "q_intersect" -> sql(
      """SELECT c_nationkey AS k FROM customer
        |INTERSECT
        |SELECT s_nationkey AS k FROM supplier""".stripMargin),
    "q_except" -> sql(
      """SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT c_custkey AS k FROM customer WHERE c_acctbal < 5000""".stripMargin),
    "q_exists" -> sql(
      """SELECT p_partkey, p_name FROM part p
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)""".stripMargin),
    "q_window_rank" -> sql(
      """SELECT c_custkey, c_nationkey, rnk FROM (
        |  SELECT c_custkey, c_nationkey,
        |         rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |  FROM customer) t
        |WHERE rnk <= 3""".stripMargin),

    // ------------------------------------------------------ spatial surface
    "q_st_point_xy" -> sql(
      s"""SELECT c_custkey, ST_X(pt) AS x, ST_Y(pt) AS y,
         |       ST_SRID(ST_SetSRID(pt, 4326)) AS srid
         |FROM (SELECT c_custkey, $PT AS pt FROM customer) t""".stripMargin),
    "q_st_distance" -> sql(
      s"""SELECT c_custkey, round(ST_Distance(pt, ST_Point(30.0, 50.0)), 4) AS dist
         |FROM (SELECT c_custkey, $PT AS pt FROM customer) t
         |WHERE ST_Distance(pt, ST_Point(30.0, 50.0)) <= 40.0""".stripMargin),
    // geodesic: haversine on the WGS84 mean-radius sphere; lon/lat derived
    // so the oracle can recompute the same closed form in plain SQL at cm
    // rounding (the q_st_transform precedent)
    "q_st_distance_sphere" -> sql(
      s"""SELECT c_custkey,
         |       floor(ST_DistanceSphere(pt, ST_Point(30.0, 20.0)) * 100 + 0.5) / 100 AS dist_m
         |FROM (SELECT c_custkey,
         |        ST_Point($CX, CAST(c_custkey % 97 AS DOUBLE) / 2.0 - 10.0) AS pt
         |      FROM customer) t""".stripMargin),
    // geodesic forward problem: point at distance+bearing on the same
    // mean-radius sphere as ST_DistanceSphere; oracle recomputes the
    // closed form at 1e-6° rounding (the q_st_transform precedent)
    "q_st_project" -> sql(
      s"""SELECT c_custkey,
         |  floor(ST_X(p2) * 1000000 + 0.5) / 1000000 AS lon2,
         |  floor(ST_Y(p2) * 1000000 + 0.5) / 1000000 AS lat2
         |FROM (SELECT c_custkey,
         |        ST_Project(ST_Point($CX, CAST(c_custkey % 97 AS DOUBLE) / 2.0 - 10.0),
         |                   1000.0 + CAST(c_custkey % 5 AS DOUBLE) * 500.0,
         |                   radians(CAST(c_custkey % 360 AS DOUBLE))) AS p2
         |      FROM customer) t""".stripMargin),
    // geohash at precision 5 = 13 lon bits + 12 lat bits interleaved —
    // the oracle recomputes the bit math in plain SQL (bisection ≡
    // floor-scale at dyadic boundaries, exact in IEEE doubles both sides)
    "q_st_geohash" -> sql(
      s"""SELECT c_custkey, ST_GeoHash(pt, 5) AS gh5
         |FROM (SELECT c_custkey,
         |        ST_Point($CX, CAST(c_custkey % 97 AS DOUBLE) / 2.0 - 10.0) AS pt
         |      FROM customer) t""".stripMargin),
    "q_st_dwithin" -> sql(
      s"""SELECT count(*) AS n_close
         |FROM (SELECT $PT AS pt FROM customer) t
         |WHERE ST_DWithin(pt, ST_Point(30.0, 50.0), 25.0)""".stripMargin),
    "q_st_within" -> sql(
      s"""SELECT c_custkey
         |FROM (SELECT c_custkey, $PT AS pt FROM customer) t
         |WHERE ST_Within(pt, ST_MakeEnvelope(10.37, 20.11, 60.93, 77.21))""".stripMargin),
    "q_st_contains" -> sql(
      s"""SELECT count(*) AS n_inside
         |FROM (SELECT $PT AS pt FROM customer) t
         |WHERE ST_Contains(ST_MakeEnvelope(5.13, 3.07, 55.99, 66.5), pt)""".stripMargin),
    "q_st_intersects" -> sql(
      s"""SELECT c_custkey
         |FROM (SELECT c_custkey, $PT AS pt FROM customer) t
         |WHERE ST_Intersects(
         |  ST_MakeEnvelope(ST_X(pt), ST_Y(pt), ST_X(pt) + 5.0, ST_Y(pt) + 5.0),
         |  ST_MakeEnvelope(20.5, 30.5, 40.5, 60.5))""".stripMargin),
    "q_st_geomtype_dim" -> sql(
      """SELECT c_custkey, ST_GeometryType(g) AS gtype, ST_Dimension(g) AS gdim
        |FROM (SELECT c_custkey,
        |             CASE CAST(c_custkey % 3 AS INT)
        |               WHEN 0 THEN ST_Point(1.0, 2.0)
        |               WHEN 1 THEN ST_MakeEnvelope(0.0, 0.0, 1.0, 1.0)
        |               ELSE ST_GeomFromText('LINESTRING (0 0, 1 1)') END AS g
        |      FROM customer) t""".stripMargin),
    "q_st_area_length_centroid" -> sql(
      s"""SELECT c_custkey,
         |       round(ST_Area(env), 4) AS area,
         |       round(ST_Length(env), 4) AS perim,
         |       round(ST_X(ST_Centroid(env)), 4) AS cx0,
         |       round(ST_Y(ST_Centroid(env)), 4) AS cy0
         |FROM (SELECT c_custkey,
         |             ST_MakeEnvelope($CX, $CY,
         |                             $CX + 1.0 + CAST(c_custkey % 5 AS DOUBLE),
         |                             $CY + 2.0 + CAST(c_custkey % 7 AS DOUBLE)) AS env
         |      FROM customer) t""".stripMargin),
    "q_st_extent" -> sql(
      s"""SELECT round(min(ST_XMin(pt)), 4) AS xmin, round(min(ST_YMin(pt)), 4) AS ymin,
         |       round(max(ST_XMax(pt)), 4) AS xmax, round(max(ST_YMax(pt)), 4) AS ymax,
         |       count(*) AS n
         |FROM (SELECT $PT AS pt FROM customer) t""".stripMargin),
    "q_st_union_agg" -> sql(
      """SELECT c_nationkey,
        |       round(ST_Area(ST_Union_Agg(ST_MakeEnvelope(
        |         CAST(c_custkey % 50 AS DOUBLE), CAST(c_custkey % 23 AS DOUBLE),
        |         CAST(c_custkey % 50 AS DOUBLE) + 1.0, CAST(c_custkey % 23 AS DOUBLE) + 1.0))), 2) AS area
        |FROM customer GROUP BY c_nationkey""".stripMargin),
    "q_st_buffer_union" -> sql(
      s"""SELECT count(*) AS n_buffer_ok,
         |       round(sum(ST_Area(ST_Union(
         |         ST_MakeEnvelope($CX, $CY, $CX + 2.0, $CY + 2.0),
         |         ST_MakeEnvelope($CX + 1.0, $CY, $CX + 3.0, $CY + 2.0)))), 2) AS sum_union_area,
         |       round(sum(ST_Area(ST_ConvexHull(ST_GeomFromText(
         |         concat('MULTIPOINT ((', CAST($CX AS STRING), ' ', CAST($CY AS STRING),
         |                '), (', CAST($CX + 2.0 AS STRING), ' ', CAST($CY AS STRING),
         |                '), (', CAST($CX AS STRING), ' ', CAST($CY + 2.0 AS STRING), '))'))))), 2) AS sum_hull_area
         |FROM customer
         |WHERE ST_Area(ST_Buffer($PT, 2.0)) BETWEEN 12.0 AND 12.6""".stripMargin),
    // UTM reprojection (zone 48S = EPSG:32748, the reference's Indonesian
    // data region): forward easting/northing at cm rounding, plus the
    // round trip back to lon/lat at 1e-6° — the oracle recomputes the
    // forward Snyder series in plain SQL and echoes the inputs
    "q_st_transform" -> sql(
      s"""SELECT c_custkey,
         |       floor(ST_X(utm) * 100 + 0.5) / 100 AS easting,
         |       floor(ST_Y(utm) * 100 + 0.5) / 100 AS northing,
         |       floor(ST_X(ST_Transform(utm, 4326)) * 1000000 + 0.5) / 1000000 AS lon_rt,
         |       floor(ST_Y(ST_Transform(utm, 4326)) * 1000000 + 0.5) / 1000000 AS lat_rt
         |FROM (SELECT c_custkey,
         |        ST_Transform(ST_SetSRID(ST_Point(
         |          105.0 + CAST(c_custkey % 300 AS DOUBLE) / 100.0,
         |          -7.0 + CAST(c_custkey % 500 AS DOUBLE) / 100.0), 4326), 32748) AS utm
         |      FROM customer) t""".stripMargin),
    "q_wkt_roundtrip" -> sql(
      s"""SELECT c_custkey,
         |       round(ST_X(ST_GeomFromText(concat('POINT (', CAST($CX AS STRING), ' ', CAST($CY AS STRING), ')'))), 4) AS x2,
         |       ST_AsText(ST_Point(CAST(c_custkey % 10 AS DOUBLE), 0.0)) AS wkt
         |FROM customer""".stripMargin),
    "q_geojson_io" -> sql(
      s"""SELECT c_custkey,
         |       round(ST_X(ST_GeomFromGeoJSON(ST_AsGeoJSON(pt))), 4) AS x2,
         |       round(ST_Y(ST_GeomFromGeoJSON(ST_AsGeoJSON(pt))), 4) AS y2,
         |       ST_AsGeoJSON(ST_Point(CAST(c_custkey % 5 AS DOUBLE), 1.0)) AS gj
         |FROM (SELECT c_custkey, $PT AS pt FROM customer) t""".stripMargin),
    "q_gml_io" -> sql(
      s"""SELECT c_custkey,
         |       round(ST_X(ST_GeomFromGML(concat(
         |         '<gml:Point xmlns:gml="http://www.opengis.net/gml"><gml:coordinates>',
         |         CAST($CX AS STRING), ',', CAST($CY AS STRING),
         |         '</gml:coordinates></gml:Point>'))), 4) AS gx
         |FROM customer""".stripMargin),
    // GML2 writer (ST_AsGML 2-arg form) feeding the parser: the written
    // gml:coordinates round-trip exactly, so X survives to 4 decimals
    "q_gml2_roundtrip" -> sql(
      s"""SELECT c_custkey,
         |       round(ST_X(ST_GeomFromGML(ST_AsGML(2, ST_Point($CX, $CY)))), 4) AS gx
         |FROM customer""".stripMargin),
    "q_kml_io" -> sql(
      s"""SELECT c_custkey,
         |       round(ST_Y(ST_GeomFromKML(concat(
         |         '<Point><coordinates>', CAST($CX AS STRING), ',', CAST($CY AS STRING),
         |         '</coordinates></Point>'))), 4) AS gy
         |FROM customer""".stripMargin),
    // DBSCAN over supplier points: deterministic roles + min-core-id
    // cluster labels; the oracle replays neighborhoods, the recursive
    // core-core closure, and the border min-label rule
    "q_dbscan" -> ((spark, dir) => {
      init(spark, dir)
      val supp = spark.sql(
        "SELECT s_suppkey, ST_Point(s_acctbal / 100.0, CAST(s_suppkey % 97 AS DOUBLE)) AS geom FROM supplier")
      SpatialJoin.dbscan(supp, "s_suppkey", "geom", eps = 6.0, minPts = 3, cellSize = 6.0)
    }),
    "q_spatial_join" -> ((spark, dir) => {
      init(spark, dir)
      val cust = spark.sql(s"SELECT c_custkey, $PT AS cgeom FROM customer")
      val supp = spark.sql(
        "SELECT s_suppkey, ST_Point(s_acctbal / 100.0, CAST(s_suppkey % 97 AS DOUBLE)) AS sgeom FROM supplier")
      SpatialJoin.distanceJoin(cust, "cgeom", supp, "sgeom", radius = 5.0, cellSize = 5.0)
        .select(col("c_custkey"), col("s_suppkey"),
          round(call_function("st_distance", col("cgeom"), col("sgeom")), 4).as("dist"))
    }),
    // Exact KNN spatial join: 3 nearest suppliers per customer via the
    // expanding-radius grid join (no cartesian anywhere); ranks on the
    // raw doubles (JTS st_distance ≡ the oracle's sqrt form bit-for-bit,
    // proven by q_spatial_join), ties broken by s_suppkey on both sides
    "q_knn_spatial" -> ((spark, dir) => {
      init(spark, dir)
      val cust = spark.sql(s"SELECT c_custkey, $PT AS cgeom FROM customer")
      val supp = spark.sql(
        "SELECT s_suppkey, ST_Point(s_acctbal / 100.0, CAST(s_suppkey % 97 AS DOUBLE)) AS sgeom FROM supplier")
      SpatialJoin.knnJoin(cust, "cgeom", "c_custkey", supp, "sgeom", "s_suppkey", k = 3)
        .select(col("c_custkey"), col("s_suppkey"),
          round(col("knn_dist"), 4).as("dist"), col("knn_rank"))
    }),
    "q_xml_flatten" -> ((spark, dir) => {
      init(spark, dir)
      val docs = spark.sql(
        s"""SELECT concat('<doc><rec><name>', c_name, '</name>',
           |              '<acct balance="', CAST(c_acctbal AS STRING), '">',
           |              '<nation>', CAST(c_nationkey AS STRING), '</nation></acct>',
           |              '<gml:Point xmlns:gml="http://www.opengis.net/gml"><gml:coordinates>',
           |              CAST($CX AS STRING), ',', CAST($CY AS STRING),
           |              '</gml:coordinates></gml:Point></rec></doc>') AS xml
           |FROM customer""".stripMargin)
      Xml.fromDocuments(docs, "xml",
          columns = Some(Seq("name", "acct__nation", "_attribute__acct__balance")))
        .select(col("name"), col("acct__nation").as("nation_str"),
          col("_attribute__acct__balance").as("bal_str"),
          round(call_function("st_x", col("geometry")), 4).as("gx"))
    }),

    // DSv2 read paths under the gate: derive documents from customer, write
    // them to disk, read back through the registered formats (with a pushed
    // string filter), and verify the flattened result against plain SQL.
    // WARC ingest under the gate: a Common-Crawl-shaped archive built
    // from customer rows (one HTTP response record each, written
    // DISTRIBUTED through the text sink — the writer's extra newline
    // between records is legal inter-record noise), read back through
    // the graft-warc DSv2: record framing, header-filter pushdown, http
    // parsing, and the body bytes all hash-proven against plain SQL
    "q_warc" -> ((spark, dir) => {
      init(spark, dir)
      val out = java.nio.file.Files.createTempDirectory("graft-warc-gate").toString
      val crlf = "\r\n"
      // http block = status line + one header + CRLF + body ⇒ 45 + |name|
      spark.table("customer").select(concat(
          lit("WARC/1.0" + crlf + "WARC-Type: response" + crlf + "WARC-Target-URI: http://c"),
          col("c_custkey").cast("string"),
          lit(".example/" + crlf + "WARC-Date: 2024-01-01T00:00:00Z" + crlf +
            "WARC-Record-ID: <urn:uuid:"),
          col("c_custkey").cast("string"),
          lit(">" + crlf + "Content-Type: application/http; msgtype=response" + crlf +
            "Content-Length: "),
          (length(col("c_name")) + 45).cast("string"),
          lit(crlf + crlf + "HTTP/1.1 200 OK" + crlf + "Content-Type: text/plain" + crlf + crlf),
          col("c_name"), lit(crlf)).as("value"))
        .write.mode("overwrite").text(out)
      spark.read.format("graft-warc").load(out)
        .where(col("warc_type") === "response")
        .select(col("target_uri"), col("http_status"),
          col("body").cast("string").as("name"), col("content_length"))
    }),
    "q_xml_dsv2" -> ((spark, dir) => {
      init(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-xml-gate").toString
      spark.sql(
        """SELECT concat('<docs>', concat_ws('', collect_list(
          |  concat('<rec><name>', c_name, '</name><nk>', CAST(c_nationkey AS STRING), '</nk></rec>'))),
          |  '</docs>') AS doc
          |FROM customer""".stripMargin)
        .coalesce(1).write.mode("overwrite").text(tmp)
      spark.read.format("graft-xml")
        .option("recordTag", "rec").option("columns", "name,nk")
        .load(tmp)
        .where(col("nk") === "3")
        .select("name", "nk")
    }),
    // The distributed NDJSON export under the gate: customer rows become
    // a GeoJSON frame, writeFeatures exports it (codegen'd feature lines,
    // file per partition, no driver collect), the graft-geojson reader
    // reads it back — write→read round-trip hash-proven against plain SQL
    "q_geojson_export" -> ((spark, dir) => {
      init(spark, dir)
      val out = java.nio.file.Files.createTempDirectory("graft-gj-export").toString + "/x"
      val src = spark.sql(
        s"""SELECT c_name AS name, CAST(c_nationkey AS STRING) AS nk,
           |       ST_Point($CX, $CY) AS geometry
           |FROM customer""".stripMargin)
      sources.GeoJsonSource.writeFeatures(src, "geometry", out)
      spark.read.format("graft-geojson")
        .option("multiLine", "false").option("columns", "name,nk")
        .load(out)
        .where(col("nk") === "11")
        .select(col("name"), col("nk"),
          round(call_function("st_x", col("geometry")), 4).as("gx"))
    }),
    // The DSv2 writer (df.write.format("graft-geojson")) under the gate:
    // distributed NDJSON export via Spark's own BatchWrite protocol
    // (temp-file + rename task commit), read back through the reader.
    "q_geojson_v2write" -> ((spark, dir) => {
      init(spark, dir)
      val out = java.nio.file.Files.createTempDirectory("graft-gj-v2w").toString + "/x"
      spark.sql(
        s"""SELECT c_name AS name, CAST(c_nationkey AS STRING) AS nk,
           |       ST_Point($CX, $CY) AS geometry
           |FROM customer""".stripMargin)
        .write.format("graft-geojson").mode("overwrite").save(out)
      spark.read.format("graft-geojson")
        .option("multiLine", "false").option("columns", "name,nk")
        .load(out)
        .where(col("nk") === "13")
        .select(col("name"), col("nk"),
          round(call_function("st_x", col("geometry")), 4).as("gx"))
    }),
    "q_geojson_dsv2" -> ((spark, dir) => {
      init(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-gj-gate").toString
      spark.sql(
        s"""SELECT concat('{"type":"Feature","properties":{"name":"', c_name,
           |  '","nk":"', CAST(c_nationkey AS STRING),
           |  '"},"geometry":{"type":"Point","coordinates":[', CAST($CX AS STRING), ',',
           |  CAST($CY AS STRING), ']}}') AS j
           |FROM customer""".stripMargin)
        .coalesce(1).write.mode("overwrite").text(tmp)
      spark.read.format("graft-geojson")
        .option("multiLine", "false").option("columns", "name,nk")
        .load(tmp)
        .where(col("nk") === "3")
        .select(col("name"), col("nk"),
          round(call_function("st_x", col("geometry")), 4).as("gx"))
    }),
    // Pushed TopN on the document source (SupportsPushDownTopN): the scan
    // answers each partition's top-15 from a bounded heap — n rows per
    // partition reach Spark's global sort instead of the whole
    // collection. Unique names make the top-15 set deterministic.
    "q_geojson_topn" -> ((spark, dir) => {
      init(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-gj-topn").toString
      spark.sql(
        s"""SELECT concat('{"type":"Feature","properties":{"name":"', c_name,
           |  '","nk":"', CAST(c_nationkey AS STRING),
           |  '"},"geometry":{"type":"Point","coordinates":[', CAST($CX AS STRING), ',',
           |  CAST($CY AS STRING), ']}}') AS j
           |FROM customer""".stripMargin)
        .repartition(4).write.mode("overwrite").text(tmp)
      spark.read.format("graft-geojson")
        .option("multiLine", "false").option("columns", "name,nk")
        .load(tmp)
        .orderBy(col("name")).limit(15)
        .select(col("name"), col("nk"),
          round(call_function("st_x", col("geometry")), 4).as("gx"))
    }),

    // Live server-execution paths under the gate: the same derived
    // documents served from in-process BaseX-REST / CouchDB-_find
    // endpoints (which honestly evaluate the equality predicate and, for
    // _find, paginate in the skip-25 stride); serverPushdown=true sends
    // the generated XQuery / Mango selector over the wire and the scan
    // re-applies the filters locally. localCheckpoint materializes the
    // result while the server is still up.
    // filtered COUNT(+GROUP BY) INSIDE the XML store (round 9 — the
    // BaseX-side analog of q_geojson_mongo_agg_filtered): predicate and
    // aggregation travel as ONE aggregation FLWOR, only per-group
    // partials cross the wire; the inline server evaluates the pushed
    // query honestly (predicate filter + group + both count semantics)
    "q_xml_agg_server" -> ((spark, dir) => {
      init(spark, dir)
      val recs = spark.sql(
        """SELECT c_custkey % 4 AS part,
          |  concat('<rec><name>', c_name, '</name><nk>', CAST(c_nationkey AS STRING),
          |         '</nk><m>', CAST(c_custkey % 7 AS STRING), '</m></rec>') AS r
          |FROM customer""".stripMargin)
        .collect().groupBy(_.getLong(0))
        .map { case (p, rows) => (s"d$p.xml", rows.map(_.getString(1)).mkString) }
      val listing = "<rest:database xmlns:rest=\"http://basex.org/rest\">" +
        recs.keys.toSeq.sorted.map(n => s"<rest:resource>$n</rest:resource>").mkString +
        "</rest:database>"
      val server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/rest", new com.sun.net.httpserver.HttpHandler {
        override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
          val resp =
            if (ex.getRequestMethod == "POST") {
              val q = new String(ex.getRequestBody.readAllBytes(),
                java.nio.charset.StandardCharsets.UTF_8)
              val doc = """db:open\("db","([^"]+)"\)""".r.findFirstMatchIn(q).get.group(1)
              val nkEq = """\*:nk = '([^']*)'""".r.findFirstMatchIn(q).map(_.group(1))
              val rec = s"<rec>((?:(?!</rec>).)*)</rec>".r
              val eligible = rec.findAllIn(recs(doc))
                .filter(r => nkEq.forall(v => r.contains(s"<nk>$v</nk>"))).toSeq
              val body =
                if (!q.contains("group by")) eligible.mkString
                else {
                  // the aggregation FLWOR: group by <m>, specs in the
                  // query's own order (count star / count of a column)
                  val specs = """_func__count__([a-z*]+|star)""".r
                    .findAllMatchIn(q).map(_.group(1)).toSeq
                  val mOf = """<m>([^<]*)</m>""".r
                  eligible.groupBy(r => mOf.findFirstMatchIn(r).map(_.group(1)))
                    .toSeq.sortBy(_._1)
                    .map { case (m, rows) =>
                      val cells = specs.map {
                        case "star" => s"<a>${rows.size}</a>"
                        case c => s"<a>${rows.count(_.contains(s"<$c>"))}</a>"
                      }.mkString
                      val key = m.map(v => s"<m>$v</m>")
                        .getOrElse("""<m null="true"/>""")
                      s"<result>$key$cells</result>"
                    }.mkString
                }
              s"<rest-results>$body</rest-results>"
            } else listing
          val b = resp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, b.length)
          ex.getResponseBody.write(b)
          ex.close()
        }
      })
      server.start()
      try {
        val base = s"http://127.0.0.1:${server.getAddress.getPort}/rest/db"
        spark.read.format("graft-xml")
          .option("recordTag", "rec").option("columns", "name,nk,m")
          .option("serverPushdown", "true")
          .load(base)
          .where(col("nk") === "5")
          .groupBy("m")
          .agg(count(lit(1)).as("cnt"), count(col("name")).as("n_names"))
          .localCheckpoint(true)
          .transform(operators.Dedup.trackResult[org.apache.spark.sql.DataFrame])
      } finally server.stop(0)
    }),
    "q_xml_server" -> ((spark, dir) => {
      init(spark, dir)
      val recs = spark.sql(
        """SELECT c_custkey % 4 AS part,
          |  concat('<rec><name>', c_name, '</name><nk>', CAST(c_nationkey AS STRING), '</nk></rec>') AS r
          |FROM customer""".stripMargin)
        .collect().groupBy(_.getLong(0))
        .map { case (p, rows) => (s"d$p.xml", rows.map(_.getString(1)).mkString) }
      val listing = "<rest:database xmlns:rest=\"http://basex.org/rest\">" +
        recs.keys.toSeq.sorted.map(n => s"<rest:resource>$n</rest:resource>").mkString +
        "</rest:database>"
      val server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/rest", new com.sun.net.httpserver.HttpHandler {
        override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
          val resp =
            if (ex.getRequestMethod == "POST") {
              val q = new String(ex.getRequestBody.readAllBytes(),
                java.nio.charset.StandardCharsets.UTF_8)
              val doc = """db:open\("db","([^"]+)"\)""".r.findFirstMatchIn(q).get.group(1)
              val nkEq = """\*:nk = '([^']*)'""".r.findFirstMatchIn(q).map(_.group(1))
              val body = nkEq match {
                case Some(v) => // evaluate the pushed predicate like a real BaseX
                  s"<rec>((?:(?!</rec>).)*)</rec>".r.findAllIn(recs(doc))
                    .filter(_.contains(s"<nk>$v</nk>")).mkString
                case None => recs(doc)
              }
              s"<rest-results>$body</rest-results>"
            } else listing
          val b = resp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, b.length)
          ex.getResponseBody.write(b)
          ex.close()
        }
      })
      server.start()
      try {
        val base = s"http://127.0.0.1:${server.getAddress.getPort}/rest/db"
        spark.read.format("graft-xml")
          .option("recordTag", "rec").option("columns", "name,nk")
          .option("serverPushdown", "true")
          .load(base)
          .where(col("nk") === "7").select("name", "nk")
          .localCheckpoint(true)
          .transform(operators.Dedup.trackResult[org.apache.spark.sql.DataFrame])
      } finally server.stop(0)
    }),
    // Pushed TopN through the live wire: ORDER BY + LIMIT travels as the
    // FLWOR `order by` + `subsequence` cap (SupportsPushDownTopN,
    // TopNPushdown/BaseXRest.orderByClause) — the endpoint honestly
    // sorts by the ordered key and serves only the capped prefix per
    // document, each partition's top-n merging under Spark's global
    // sort. Names are unique, so the top-10 set is deterministic and
    // the DuckDB ORDER BY/LIMIT oracle hash-matches.
    "q_xml_topn_server" -> ((spark, dir) => {
      init(spark, dir)
      val recs = spark.sql(
        """SELECT c_custkey % 4 AS part,
          |  concat('<rec><name>', c_name, '</name><nk>', CAST(c_nationkey AS STRING), '</nk></rec>') AS r
          |FROM customer""".stripMargin)
        .collect().groupBy(_.getLong(0))
        .map { case (p, rows) => (s"d$p.xml", rows.map(_.getString(1)).toSeq) }
      val listing = "<rest:database xmlns:rest=\"http://basex.org/rest\">" +
        recs.keys.toSeq.sorted.map(n => s"<rest:resource>$n</rest:resource>").mkString +
        "</rest:database>"
      def nameOf(r: String): String =
        "<name>([^<]*)</name>".r.findFirstMatchIn(r).get.group(1)
      val server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/rest", new com.sun.net.httpserver.HttpHandler {
        override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
          val resp =
            if (ex.getRequestMethod == "POST") {
              val q = new String(ex.getRequestBody.readAllBytes(),
                java.nio.charset.StandardCharsets.UTF_8)
              val doc = """db:open\("db","([^"]+)"\)""".r.findFirstMatchIn(q).get.group(1)
              // honest BaseX: sort when ordered (codepoint = String order
              // on this ASCII corpus), cap when subsequenced
              val ordered =
                if (!q.contains("order by")) recs(doc)
                else {
                  val s = recs(doc).sortBy(nameOf)
                  if (q.contains("descending")) s.reverse else s
                }
              val n = """(?s)subsequence\(.*, 1, (\d+)\)""".r
                .findFirstMatchIn(q).map(_.group(1).toInt).getOrElse(ordered.size)
              s"<rest-results>${ordered.take(n).mkString}</rest-results>"
            } else listing
          val b = resp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, b.length)
          ex.getResponseBody.write(b)
          ex.close()
        }
      })
      server.start()
      try {
        val base = s"http://127.0.0.1:${server.getAddress.getPort}/rest/db"
        spark.read.format("graft-xml")
          .option("recordTag", "rec").option("columns", "name,nk")
          .option("serverPushdown", "true")
          .load(base)
          .orderBy(col("name").desc).limit(10).select("name", "nk")
          .localCheckpoint(true)
          .transform(operators.Dedup.trackResult[org.apache.spark.sql.DataFrame])
      } finally server.stop(0)
    }),
    // DPP-style runtime filtering e2e (SupportsRuntimeFiltering): a join
    // against the selectively-filtered nation dim hands the XML scan the
    // dim's key values at EXECUTION time; they prune documents at parse
    // time and ride the wire selector (RuntimeFilterSpec pins the wire
    // text — this endpoint ignores predicates, superset, so the local
    // re-apply carries exactness and the hash must equal plain SQL
    // whether or not the planner chose to inject the pruning subquery).
    "q_xml_runtime_filter" -> ((spark, dir) => {
      init(spark, dir)
      val recs = spark.sql(
        """SELECT c_custkey % 4 AS part,
          |  concat('<rec><name>', c_name, '</name><nk>', CAST(c_nationkey AS STRING), '</nk></rec>') AS r
          |FROM customer""".stripMargin)
        .collect().groupBy(_.getLong(0))
        .map { case (p, rows) => (s"d$p.xml", rows.map(_.getString(1)).mkString) }
      val listing = "<rest:database xmlns:rest=\"http://basex.org/rest\">" +
        recs.keys.toSeq.sorted.map(n => s"<rest:resource>$n</rest:resource>").mkString +
        "</rest:database>"
      val server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/rest", new com.sun.net.httpserver.HttpHandler {
        override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
          val resp =
            if (ex.getRequestMethod == "POST") {
              val q = new String(ex.getRequestBody.readAllBytes(),
                java.nio.charset.StandardCharsets.UTF_8)
              val doc = """db:open\("db","([^"]+)"\)""".r.findFirstMatchIn(q).get.group(1)
              s"<rest-results>${recs(doc)}</rest-results>" // predicates ignored
            } else listing
          val b = resp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, b.length)
          ex.getResponseBody.write(b)
          ex.close()
        }
      })
      server.start()
      try {
        val base = s"http://127.0.0.1:${server.getAddress.getPort}/rest/db"
        val fact = spark.read.format("graft-xml")
          .option("recordTag", "rec").option("columns", "name,nk")
          .option("serverPushdown", "true").load(base)
        val dim = spark.table("nation")
          .where(col("n_name") === "NATION_7")
          .select(col("n_nationkey").cast("string").as("nk"), col("n_name").as("nname"))
        fact.join(dim, Seq("nk")).select("name", "nk", "nname")
          .localCheckpoint(true)
          .transform(operators.Dedup.trackResult[org.apache.spark.sql.DataFrame])
      } finally server.stop(0)
    }),
    // The reference's 2-collection JOIN pushdown, live under the gate
    // (getdata.ts:110 dispatches 2-table joins to ONE backend query;
    // xml_extension.ts:614 constructJoinQuery): customers and nations
    // served as separate in-process BaseX-REST databases, joined through
    // Spark's own DSv2 join negotiation (SupportsPushDownJoin) — the
    // endpoint honestly evaluates the ON equality but IGNORES the pushed
    // per-side predicate, so the gate also proves the scan's local
    // re-apply reduces the server's superset to the exact join.
    "q_xml_join_server" -> ((spark, dir) => {
      init(spark, dir)
      xmlJoinServerGate(spark, leftJoin = false)
    }),
    // The live OUTER join under the gate: live INNER pairs + a live fetch
    // of the left side, null-extended locally (XmlDataSource round 8 —
    // exact even against a server that mismatches pairs, where the
    // reference trusts its backend's constructOuterJoin answer). The
    // right side carries only nations 0..9, so customers of nations
    // 10+ MUST null-extend for the oracle hash to match.
    "q_xml_join_left_server" -> ((spark, dir) => {
      init(spark, dir)
      xmlJoinServerGate(spark, leftJoin = true)
    }),
    "q_geojson_couch" -> ((spark, dir) => {
      init(spark, dir)
      val docs = spark.sql(
        s"""SELECT concat('{"type":"Feature","properties":{"name":"', c_name,
           |  '","nk":"', CAST(c_nationkey AS STRING),
           |  '"},"geometry":{"type":"Point","coordinates":[', CAST($CX AS STRING), ',',
           |  CAST($CY AS STRING), ']}}') AS j
           |FROM customer""".stripMargin)
        .collect().map(_.getString(0)).toIndexedSeq
      val server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/db/_find", new com.sun.net.httpserver.HttpHandler {
        // per-selector result cache + bookmark cursors — how a real
        // CouchDB behaves (a Mango match walks the index once and every
        // `_find` response carries a resumable bookmark, so pages 2+ are
        // O(page) server work); the client's skip-stride FALLBACK stays
        // spec-covered against a bookmark-less server (CouchFindSpec)
        val bySelector = new java.util.concurrent.ConcurrentHashMap[String, IndexedSeq[String]]()
        override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
          val body = new String(ex.getRequestBody.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          val skip = """"skip": (\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt).getOrElse(0)
          val bm = """"bookmark": "o-(\d+)"""".r.findFirstMatchIn(body).map(_.group(1).toInt)
          val nkEq = """"properties\.nk": \{ "\$eq": "([^"]*)" \}""".r
            .findFirstMatchIn(body).map(_.group(1))
          val matched = bySelector.computeIfAbsent(nkEq.getOrElse(""),
            _ => docs.filter(d => nkEq.forall(v => d.contains(s""""nk":"$v""""))))
          val from = bm.getOrElse(0) + (if (bm.isDefined) 0 else skip)
          val page = matched.slice(from, from + 25)
          val resp =
            s"""{"docs":[${page.mkString(",")}],"bookmark":"o-${from + page.size}"}"""
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, resp.length)
          ex.getResponseBody.write(resp)
          ex.close()
        }
      })
      server.start()
      try {
        val base = s"http://127.0.0.1:${server.getAddress.getPort}/db"
        spark.read.format("graft-geojson")
          .option("columns", "name,nk").option("serverPushdown", "true")
          .load(base)
          .where(col("nk") === "7")
          .select(col("name"), col("nk"),
            round(call_function("st_x", col("geometry")), 4).as("gx"))
          .localCheckpoint(true)
          .transform(operators.Dedup.trackResult[org.apache.spark.sql.DataFrame])
      } finally server.stop(0)
    }),

    // The MongoDB live path under the same gate: identical documents, but
    // the wire is the REAL binary protocol — OP_MSG frames over TCP, BSON
    // bodies (graft.sources.mongo.MongoWire/Bson) — against an in-process
    // endpoint that honestly evaluates the nk equality and pages the
    // cursor in find/getMore batches. The engine result hash-matches
    // plain SQL over customer, exactly like the Couch/BaseX gates.
    "q_geojson_mongo" -> ((spark, dir) => {
      init(spark, dir)
      withInlineMongod(spark) { url =>
        spark.read.format("graft-geojson")
          .option("columns", "name,nk").option("serverPushdown", "true")
          .load(url)
          .where(col("nk") === "7")
          .select(col("name"), col("nk"),
            round(call_function("st_x", col("geometry")), 4).as("gx"))
          .localCheckpoint(true)
          .transform(operators.Dedup.trackResult[org.apache.spark.sql.DataFrame])
      }
    }),

    // The in-database aggregation path: COUNT(*)+GROUP BY travels as ONE
    // `aggregate` pipeline command ($project/$unwind normalize +
    // $group), the endpoint honestly groups its real documents by the
    // named property, and only per-group partial rows cross the wire —
    // the Mongo analog of the BaseX COUNT pushdown, hash-proven against
    // plain SQL GROUP BY over customer.
    "q_geojson_mongo_agg" -> ((spark, dir) => {
      init(spark, dir)
      withInlineMongod(spark) { url =>
        spark.read.format("graft-geojson")
          .option("columns", "name,nk").option("serverPushdown", "true")
          .load(url)
          .groupBy(col("nk")).agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true)
          .transform(operators.Dedup.trackResult[org.apache.spark.sql.DataFrame])
      }
    }),
    // filtered variant (r9): the pushed equality travels WITH the count
    // as one aggregate pipeline — an exact typed $match prefix, no
    // record transfer (MongoFindGen.aggMatchExpr; spec-asserted in
    // MongoWireSpec that no find command fires)
    "q_geojson_mongo_agg_filtered" -> ((spark, dir) => {
      init(spark, dir)
      withInlineMongod(spark) { url =>
        spark.read.format("graft-geojson")
          .option("columns", "name,nk").option("serverPushdown", "true")
          .load(url)
          .where(col("nk") === "5")
          .groupBy(col("nk")).agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true)
          .transform(operators.Dedup.trackResult[org.apache.spark.sql.DataFrame])
      }
    }),

    // -------------------------------------------- LLM-data-pipeline surface
    "q_dedup_exact" -> ((spark, dir) => {
      init(spark, dir)
      Dedup.exact(spark.table("documents"), "doc_id", "text")
    }),
    // keep-one removal with planted exact clones (50 cloned ids) so the
    // drop path demonstrably drops; survivors = the original 500 ids
    "q_dedup_drop" -> ((spark, dir) => {
      init(spark, dir)
      val planted = spark.sql(
        """SELECT doc_id, text FROM documents
          |UNION ALL
          |SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50""".stripMargin)
      Dedup.dropExactDuplicates(planted, "doc_id", "text").select("doc_id")
    }),
    // Incremental admission against a frozen snapshot: 50 clones of
    // corpus texts (must be refused) + 50 genuinely new texts (must be
    // admitted); the Bloom filter routes, the confirm join decides, so
    // the result is exact regardless of false positives.
    "q_dedup_incremental" -> ((spark, dir) => {
      init(spark, dir)
      val incoming = spark.sql(
        """SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id < 50
          |UNION ALL
          |SELECT doc_id + 300000 AS doc_id,
          |       concat(text, ' fresh-', CAST(doc_id AS STRING)) AS text
          |FROM documents WHERE doc_id < 50""".stripMargin)
      Dedup.dropSeen(incoming, spark.table("documents"), "text").select("doc_id")
    }),
    "q_dedup_minhash" -> ((spark, dir) => {
      init(spark, dir)
      Dedup.minhashPairs(spark.table("documents"), "doc_id", "text",
          shingleK = 5, numHashes = 128, bands = 32, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    }),
    // Near-dup admission against a FROZEN index: the corpus signatures are
    // written once (build timed in-gate — honest), then the planted batch
    // (25 clones + 25 tail-mutated) probes them with broadcast-only joins.
    // Same oracle shape as q_dedup_minhash, restricted to cross pairs.
    "q_dedup_index" -> ((spark, dir) => {
      init(spark, dir)
      val idx = java.nio.file.Files.createTempDirectory("graft_mhidx").toString + "/idx"
      Dedup.writeMinhashIndex(spark.table("documents"), "doc_id", "text", idx,
        shingleK = 5, numHashes = 128, bands = 32)
      val incoming = spark.sql(
        """SELECT doc_id + 800000 AS doc_id, text FROM documents WHERE doc_id < 25
          |UNION ALL
          |SELECT doc_id + 850000 AS doc_id, concat(text, ' zz') AS text
          |FROM documents WHERE doc_id < 25""".stripMargin)
      Dedup.nearDupsAgainstIndex(incoming, "doc_id", "text", idx, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    }),
    // maxHamming = 3 ⇐ 4×16-bit block LSH: ≤ 3 flipped bits leave at least
    // one block intact (pigeonhole), so recall is exhaustive and the DuckDB
    // all-pairs oracle applies.
    "q_dedup_simhash" -> ((spark, dir) => {
      init(spark, dir)
      Dedup.simhashPairs(spark.table("documents"), "doc_id", "text", maxHamming = 3)
    }),
    "q_dedup_cluster" -> ((spark, dir) => {
      init(spark, dir)
      val pairs = Dedup.minhashPairs(spark.table("documents"), "doc_id", "text",
        shingleK = 5, numHashes = 128, bands = 32, threshold = 0.5)
      Dedup.clusters(pairs)
    }),
    // same pair semantics through the OTHER code paths, against the same
    // oracles: salted candidate generation must be pair-set-identical, and
    // distributed label propagation must label like the driver union-find
    "q_dedup_minhash_salted" -> ((spark, dir) => {
      init(spark, dir)
      Dedup.minhashPairs(spark.table("documents"), "doc_id", "text",
          shingleK = 5, numHashes = 128, bands = 32, threshold = 0.5, saltCap = 8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    }),
    "q_dedup_cluster_distributed" -> ((spark, dir) => {
      init(spark, dir)
      val pairs = Dedup.minhashPairs(spark.table("documents"), "doc_id", "text",
        shingleK = 5, numHashes = 128, bands = 32, threshold = 0.5)
      Dedup.clusters(pairs, smallGraphThreshold = 0)
    }),
    // Asymmetric containment join (prefix filter, no cartesian): probes
    // are the first half of every 50th document's tokens — guaranteed
    // containment 1.0 in their source — and the oracle replays the
    // identical 60-bit token-hash arithmetic exhaustively
    "q_containment_join" -> ((spark, dir) => {
      init(spark, dir)
      val docs = spark.table("documents")
      val base = docs.select(col("doc_id").as("full_id"), col("text"))
      val ws = TextAnalysis.wsTokens(col("text"))
      val probes = docs.where(pmod(col("doc_id"), lit(50)) === 0)
        .select((col("doc_id") + 1000000).as("probe_id"),
          array_join(slice(ws, lit(1),
            greatest(floor(size(ws) / 2), lit(1)).cast("int")), " ").as("text"))
      ContainmentJoin.join(probes, "probe_id", "text", base, "full_id", "text", 0.9)
    }),
    "q_ngram_jaccard" -> sql(
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       round(CAST(size(array_intersect(split(a.text, ' '), split(b.text, ' '))) AS DOUBLE)
        |             / size(array_union(split(a.text, ' '), split(b.text, ' '))), 4) AS jac
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1""".stripMargin),
    "q_ann_bruteforce" -> ((spark, dir) => {
      init(spark, dir)
      spark.sql(
        """SELECT e.vec_id AS id,
          |       round(cosine_similarity(e.embedding, q.embedding), 4) AS cosine
          |FROM embeddings e
          |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
          |ORDER BY cosine DESC, id LIMIT 10""".stripMargin)
    }),
    "q_knn_join" -> ((spark, dir) => {
      init(spark, dir)
      val emb = spark.table("embeddings")
      Ann.knnJoin(emb, "vec_id", "embedding",
        emb.where(col("vec_id") < 10), "vec_id", "embedding", k = 5)
    }),
    // On the natural corpus the query's true neighbors sit at cosine ≤ 0.51,
    // where bucket recall is a coin flip — LSH top-k ≠ brute-force top-k and
    // no SQL oracle can apply. Plant 16 deterministic near-copies of the
    // query vector (dim j shifted by 0.002·(j+1)); the true top-10 then all
    // lie at cosine ≥ 0.9998 where probes=1 recall is ~1 and deterministic
    // (fixed hyperplanes), so the result equals brute-force top-10 and the
    // exact SQL oracle verifies the whole LSH path end to end.
    "q_ann_lsh" -> ((spark, dir) => {
      init(spark, dir)
      val aug = spark.sql(
        """SELECT vec_id, embedding FROM embeddings
          |UNION ALL
          |SELECT 200000 + j AS vec_id,
          |       transform(embedding, (x, i) ->
          |         IF(i = j, CAST(CAST(x AS DOUBLE) + CAST(0.002 AS DOUBLE) * (j + 1) AS FLOAT), x)) AS embedding
          |FROM embeddings LATERAL VIEW explode(sequence(0, 15)) t AS j
          |WHERE vec_id = 0""".stripMargin)
      val query = spark.table("embeddings").where(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      Ann.lshTopK(aug, "vec_id", "embedding", query, k = 10, planes = 8, probes = 1)
        .select(col("id"), round(col("cosine"), 4).as("cosine"))
    }),
    // The natural corpus has no pairs above cosine 0.51, which would make the
    // oracle vacuous (it could only prove no-false-positives). Plant one
    // near-duplicate per vector — dim 0 shifted by +0.05 in double, cast back
    // to float — reproducibly on both sides; planted pairs sit at cosine
    // ≈ 0.9988 where every layout Dedup.lshConfig produces misses a pair
    // with probability < 1e-10 (and the hyperplanes are fixed, so
    // found-ness is deterministic, not sampled). At the sf0.01 gate the
    // auto layout is exactly the historical 8 planes × 8 tables.
    // Symmetric int8 scalar quantization (FAISS SQ8) — the gate projects
    // integer-exact summaries of the quantized vectors (the codes
    // themselves are int lists; sums/extrema pin them without relying on
    // cross-engine array stringification)
    "q_embed_quantize" -> ((spark, dir) => {
      init(spark, dir)
      operators.VectorStorage.quantizeInt8(spark.table("embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), round(col("scale"), 6).as("scale"),
          aggregate(col("qvec"), lit(0L), (a, x) => a + x).as("q_sum"),
          aggregate(col("qvec"), lit(0), (a, x) => greatest(a, abs(x.cast("int")))).as("q_absmax"),
          size(col("qvec")).as("n_dims"))
    }),
    "q_embed_dedup" -> ((spark, dir) => {
      init(spark, dir)
      val aug = spark.sql(
        """SELECT vec_id, embedding FROM embeddings
          |UNION ALL
          |SELECT vec_id + 100000 AS vec_id,
          |       transform(embedding, (x, i) ->
          |         IF(i = 0, CAST(CAST(x AS DOUBLE) + 0.05 AS FLOAT), x)) AS embedding
          |FROM embeddings""".stripMargin)
      Dedup.embeddingPairs(aug, "vec_id", "embedding", minCosine = 0.95)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
    }),
    // URL canonicalization (the url-dedup pre-pass): mixed-case host +
    // default port + unsorted query + fragment must collapse to ONE
    // canonical form. The oracle constructs the EXPECTED output
    // independently (not a chain replay) — a stronger check
    "q_url_normalize" -> ((spark, dir) => {
      init(spark, dir)
      val url = concat(lit("HTTP://C"), col("c_custkey").cast("string"),
        lit(".Example.COM:80/p/"), pmod(col("c_custkey"), lit(7)).cast("string"),
        lit("?z="), col("c_custkey").cast("string"), lit("&a=1#frag"))
      spark.table("customer").select(col("c_custkey"),
        TextAnalysis.normalizeUrl(url).as("url_norm"),
        TextAnalysis.urlDomain(url).as("domain"))
    }),
    // Triangle count: deterministic synthetic graph over events (300
    // nodes, ~10k edges), counted by degree-ordered wedge closure; the
    // oracle is the literal 3-way self-join
    "q_triangles" -> ((spark, dir) => {
      init(spark, dir)
      val edges = spark.table("events").select(
        pmod(col("user_id"), lit(300)).as("a"),
        pmod(col("user_id") * 7 + col("event_id"), lit(300)).as("b"))
      Graphs.triangleCount(edges, "a", "b")
    }),
    // Edit-distance similarity join: part names + planted one-char
    // deletions, matched through the PassJoin segment equi-join (no
    // cartesian); the oracle is the cross join the operator avoids
    "q_fuzzy_join" -> ((spark, dir) => {
      init(spark, dir)
      val base = spark.table("part").where(pmod(col("p_partkey"), lit(4)) === 0)
        .select(col("p_partkey"), col("p_name"))
      val variants = base.select((col("p_partkey") + 1000000).as("r_key"),
        concat(substring(col("p_name"), 1, 3),
          expr("substring(p_name, 5)")).as("r_name"))
      val right = base.select(col("p_partkey").as("r_key"),
        col("p_name").as("r_name")).unionByName(variants)
      FuzzyJoin.join(base, "p_partkey", "p_name", right, "r_key", "r_name", 1)
    }),
    // Stable distributed row ids: contiguous 0-based ids in doc_id
    // order WITHOUT a single-task window — range partition + counted
    // offsets; the oracle is the window the operator replaces
    "q_row_ids" -> ((spark, dir) => {
      init(spark, dir)
      Corpus.zipWithRowIds(
          spark.table("documents").select(col("doc_id"), col("source")),
          Seq(col("doc_id")))
        .select(col("doc_id"), col("source"), col("row_id"))
    }),
    // Unicode NFC normalization: decomposed accents prepended to each
    // document must compose to the same bytes both engines produce
    // (NFC is Unicode-stability-guaranteed, so JDK Normalizer and
    // DuckDB's utf8proc agree; the codepoint length pins composition
    // actually happened — 'e'+U+0301 collapses to one char)
    "q_text_normalize" -> ((spark, dir) => {
      init(spark, dir)
      val messy = concat(lit("Cafe\u0301 nai\u0308ve: "), col("text"))
      spark.table("documents").select(col("doc_id"),
        call_function("nfc_normalize", messy).as("nfc"),
        length(call_function("nfc_normalize", messy)).as("n_chars_nfc"))
    }),
    // URL blocklist filtering: four synthetic domains over customer,
    // two blocked — the scan-level NOT IN predicate must keep exactly
    // the rows whose registered domain (www. stripped by the last-two-
    // labels rule) survives
    "q_url_filter" -> ((spark, dir) => {
      init(spark, dir)
      val url = concat(lit("https://www."),
        element_at(array(lit("spam.net"), lit("tracker.biz"),
          lit("good.com"), lit("news.org")),
          (pmod(col("c_custkey"), lit(4)) + 1).cast("int")),
        lit("/p/"), col("c_custkey").cast("string"))
      val docs = spark.table("customer").select(col("c_custkey"), url.as("url"))
      TextAnalysis.domainFilter(docs, "url", Seq("Spam.NET", "tracker.biz"))
        .withColumn("domain", TextAnalysis.urlDomain(col("url")))
    }),
    // HTML main-content extraction (the WARC → text step): documents
    // wrapped into a full page (head/style/script/comments around the
    // body) must come back out as clean text — the identical RE2-safe
    // regex chain runs in DuckDB, so the extraction is hash-proven
    "q_html_text" -> ((spark, dir) => {
      init(spark, dir)
      val html = concat(
        lit("<html><head><title>d</title><style>p { color: red; }</style>" +
          "<script>if (1 < 2) { alert(\"x\"); }</script></head>" +
          "<body><!-- boilerplate --><h1>Doc&nbsp;"),
        col("doc_id").cast("string"),
        lit("</h1><p class=\"main\">"), col("text"), lit("</p></body></html>"))
      spark.table("documents")
        .select(col("doc_id"), TextAnalysis.htmlToText(html).as("clean"))
    }),
    "q_lang_id" -> ((spark, dir) => {
      init(spark, dir)
      spark.table("documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
    }),
    "q_text_quality" -> sql(
      """SELECT doc_id,
        |       CAST(length(text) AS BIGINT) AS n_chars2,
        |       CAST(size(split(trim(text), ' ')) AS BIGINT) AS n_tokens_ws,
        |       round(CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '')) AS DOUBLE) / length(text), 4) AS punct_ratio,
        |       round(CAST(size(filter(split(lower(text), ' '),
        |                       w -> w IN ('the', 'and', 'of', 'to', 'in', 'is'))) AS DOUBLE)
        |             / size(split(text, ' ')), 4) AS stop_ratio
        |FROM documents""".stripMargin),
    // Gopher-style repetition signals; ' a ' → newline plants multi-line
    // structure (the corpus is single-line) identically on both sides
    "q_repetition" -> ((spark, dir) => {
      init(spark, dir)
      spark.table("documents").select(col("doc_id"),
        expr("floor(dup_line_fraction(replace(text, ' a ', chr(10))) * 10000 + 0.5) / 10000")
          .as("dup_line_frac"),
        expr("floor(top_token_fraction(text) * 10000 + 0.5) / 10000")
          .as("top_tok_frac"))
    }),
    // PII redaction with planted addresses/URLs/phones (the corpus has
    // none, which would make the oracle an identity check)
    "q_redact_pii" -> ((spark, dir) => {
      init(spark, dir)
      val planted = spark.table("documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"),
          (col("doc_id") % 7).cast("string"),
          lit("@mail.example.com or 555-123-4567 via https://ex.com/p/"),
          col("doc_id").cast("string")).as("text"))
      planted.select(col("doc_id"), TextAnalysis.redactPii(col("text")).as("clean"))
    }),
    "q_token_count" -> sql(
      """SELECT doc_id,
        |       CAST(size(split(trim(text), ' ')) AS BIGINT) AS n_ws,
        |       CAST(regexp_count(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+') AS BIGINT) AS n_bpe
        |FROM documents""".stripMargin),
    "q_token_topk" -> sql(
      """SELECT token, count(*) AS freq
        |FROM (SELECT explode(split(lower(trim(text)), ' ')) AS token FROM documents) t
        |WHERE token <> ''
        |GROUP BY token ORDER BY freq DESC, token LIMIT 20""".stripMargin),
    "q_bigrams" -> sql(
      """SELECT bigram, count(*) AS freq
        |FROM (SELECT explode(transform(slice(ws, 1, size(ws) - 1),
        |                     (w, i) -> concat(w, ' ', element_at(ws, i + 2)))) AS bigram
        |      FROM (SELECT split(lower(trim(text)), ' ') AS ws FROM documents) s) t
        |GROUP BY bigram ORDER BY freq DESC, bigram LIMIT 20""".stripMargin),
    "q_fingerprint" -> sql(
      """SELECT doc_id,
        |       md5(CAST(regexp_replace(lower(trim(text)), '\\s+', ' ') AS BINARY)) AS fp
        |FROM documents""".stripMargin),
    "q_decontaminate" -> ((spark, dir) => {
      init(spark, dir)
      // eval set = every 20th document; flag training docs sharing any
      // word 4-gram with it (benchmark n-grams broadcast; corpus never
      // shuffles — only hit rows reach the per-doc count)
      val docs = spark.table("documents")
      operators.TextAnalysis.decontaminate(
        docs.where(col("doc_id") % 20 =!= 0),
        docs.where(col("doc_id") % 20 === 0),
        "doc_id", "text", n = 4)
    }),
    "q_fingerprint_rolling" -> ((spark, dir) => {
      init(spark, dir)
      spark.table("documents")
        .select(col("doc_id"), TextAnalysis.fingerprintRolling(col("text"), 16).as("fp"))
    }),
    // DSIR importance weights (Xie et al. 2023): every document scored
    // by ln p̂_target − ln p̂_raw over hashed uni+bigram buckets, target =
    // the English slice. The 60-bit md5 gram hashes are the oracle-
    // replayable decontaminate arithmetic, so the weights themselves
    // hash-match DuckDB at 4 dp
    "q_dsir" -> ((spark, dir) => {
      init(spark, dir)
      val docs = spark.table("documents")
      // + 0.0 collapses IEEE signed zero: a tiny negative weight rounds
      // to -0.0 in engines that round in doubles (DuckDB), while Spark's
      // BigDecimal round has no signed zero — the sf1 refresh caught the
      // "-0" vs "0" hash split on exactly one of 50k docs
      Corpus.dsirWeights(docs, docs.where(col("lang") === "en"),
          "doc_id", "text", buckets = 10000)
        .select(col("doc_id"), (round(col("dsir_weight"), 4) + 0.0).as("dsir_w"))
    }),
    // C4-style quality gate as scan-level predicates (352 of 500 docs pass
    // at sf0.01 — real selectivity, not a vacuous filter)
    "q_quality_filter" -> ((spark, dir) => {
      init(spark, dir)
      TextAnalysis.qualityFilter(spark.table("documents"), "text")
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars2"))
    }),
    // LM quality scoring with a corpus-trained bigram model; deterministic
    // (count, w1, w2)-ordered top-K cutoff makes the model — and the oracle
    // rebuild of it — exact
    "q_lm_score" -> ((spark, dir) => {
      init(spark, dir)
      val docs = spark.table("documents")
      val model = TextAnalysis.bigramModel(docs, "text", topK = 20000)
      TextAnalysis.lmScore(docs.select("doc_id", "text"), "text", model)
        .select(col("doc_id"), round(col("lm_logprob"), 4).as("lm"))
    }),
    // CCNet-style head/middle/tail buckets: per-LANGUAGE LM-score
    // terciles (Wenzek et al. 2020). The tercile split is the exact
    // SQL ntile(3), computed DISTRIBUTED (Corpus.ntileByGroup: range
    // partition + prefix-summed offsets — no one-task-per-language
    // window), and the oracle's single-node ntile window must agree
    // row-for-row. Scores are rounded to 4 dp BEFORE ordering so the
    // order both engines see is identical (rounding is hash-proven by
    // q_lm_score); doc_id breaks remaining ties
    "q_ccnet_buckets" -> ((spark, dir) => {
      init(spark, dir)
      val docs = spark.table("documents")
      val model = TextAnalysis.bigramModel(docs, "text", topK = 20000)
      val scored = TextAnalysis.lmScore(docs.select("doc_id", "lang", "text"), "text", model)
        .select(col("doc_id"), col("lang"), round(col("lm_logprob"), 4).as("lm"))
      Corpus.ntileByGroup(scored, "lang",
          Seq(col("lm").desc, col("doc_id").asc), 3, "tile")
        .select(col("doc_id"), col("lang"),
          when(col("tile") === 1, "head").when(col("tile") === 2, "middle")
            .otherwise("tail").as("bucket"))
    }),
    // ------------------------------------------------ corpus construction
    // Deterministic hash sampling: membership is a function of doc_id only
    // (hashUniform), so the oracle recomputes the exact same sample
    // A-ES weighted sample (Corpus.weightedSample): ln(u)/w keys, n
    // largest per group via the k-capped heap; pure function of ids and
    // weights, so the oracle replays it (round 9: upgraded from
    // spec-only to oracle)
    "q_weighted_sample" -> ((spark, dir) => {
      init(spark, dir)
      Corpus.weightedSample(spark.table("documents"), "source", "doc_id",
          "n_chars", n = 10)
        .select("doc_id", "source")
    }),
    "q_sample_hash" -> ((spark, dir) => {
      init(spark, dir)
      Corpus.sampleByHash(spark.table("documents"), "doc_id", 0.25, salt = "s1")
        .select("doc_id", "source")
    }),
    // Domain-mixture down-sampling: src0 halved, src1 doubled, everything
    // else at the uniform 6000-token budget
    "q_docmix" -> ((spark, dir) => {
      init(spark, dir)
      Corpus.mixture(spark.table("documents"), "doc_id", "source", "n_chars",
        budgetPerDomain = 6000.0, weights = Map("src0" -> 0.5, "src1" -> 2.0))
        .select("doc_id", "source")
    }),
    // Greedy sequential packing into 2000-token bins per source; the oracle
    // replays the same walk as a lockstep recursive CTE
    "q_pack_sequences" -> ((spark, dir) => {
      init(spark, dir)
      Corpus.packSequences(spark.table("documents"), "source", "doc_id",
        "n_chars", budget = 2000L)
    }),
    // 10-token windows every 5 tokens (50% overlap)
    "q_chunk_overlap" -> ((spark, dir) => {
      init(spark, dir)
      Corpus.chunkWindows(spark.table("documents"), "doc_id", "text",
        chunkSize = 10, stride = 5)
    }),
    "q_tfidf" -> ((spark, dir) => {
      init(spark, dir)
      Corpus.tfIdfTopTerms(spark.table("documents"), "doc_id", "text", k = 25)
    }),
    // BPE tokenizer: learn 200 merges from the corpus word counts
    // (vocabulary-bounded driver loop), tokenize every document. Not
    // ANSI-SQL-expressible (iterative argmax) → no oracle entry; the
    // driver records the weaker rows-only check and BpeSpec pins the
    // algorithm against the hand-computed Sennrich example
    "q_bpe" -> ((spark, dir) => {
      init(spark, dir)
      val model = operators.Bpe.train(spark.table("documents"), "text", numMerges = 200)
      operators.Bpe.encode(spark.table("documents"), "text", model)
        .select(col("doc_id"), col("bpe_len").cast("long").as("bpe_len"))
    }),
    // Product quantization (IVF-PQ's code half): codebooks train on a
    // bounded sample, every embedding encodes to m=8 bytes (32× vs
    // float32), ADC top-20 for a fixed query. k-means centroids are not
    // ANSI-SQL-expressible → rows-only gate; PqSpec pins the degenerate
    // exact case, recall@R on clustered data, and bit-determinism
    "q_ann_pq" -> ((spark, dir) => {
      init(spark, dir)
      val emb = spark.table("embeddings")
      // gate-sized training bound (the Ivf precedent): codebook quality
      // saturates far below the corpus and the driver-local k-means is
      // the gate's whole cost — 10k keeps it a corpus-size-independent
      // ~1-2 s constant instead of growing to the 100k default cap
      val model = operators.Pq.train(emb, "vec_id", "embedding", m = 8, k = 64,
        maxTrainVecs = 10000)
      val codes = operators.Pq.encode(emb, "vec_id", "embedding", model)
      val q = emb.where(col("vec_id") === 1)
        .select(col("embedding")).head.getSeq[Float](0).toArray
      operators.Pq.searchTopK(codes, "vec_id", "codes", model, q, 20)
    }),
    // IVF-PQ end-to-end serving path (write → centroid-partition prune →
    // ADC), oracle-gated via the DEGENERATE EXACT configuration: m=1
    // with a codebook ≥ the sub-corpus makes every vector its own
    // centroid (ADC distance ≡ exact squared L2) and full probe scans
    // every partition — so the routed+ADC result equals brute force and
    // plain SQL replays it. vec_id < 200 pins the sub-corpus at every
    // SF; IvfSpec/PqSpec pin the pruning and approximate regimes.
    "q_ivf_pq" -> ((spark, dir) => {
      init(spark, dir)
      val emb = spark.table("embeddings").where(col("vec_id") < 200)
      // ONE store path per JVM, overwritten each call (every layer of
      // writeIndexedPq writes mode=overwrite): a fresh temp dir per
      // invocation accumulated dead stores over a 20-run bench
      val path = ivfPqGateDir
      // gate-sized iteration bounds: with a full codebook the PQ train
      // converges AT INIT (every point its own centroid), and IVF
      // routing cannot affect a full-probe result — iterations past 1-2
      // are pure gate cost
      operators.Ivf.writeIndexedPq(emb, "vec_id", "embedding", path,
        pqM = 1, pqK = 256, k = 4, maxIter = 2, pqIters = 1)
      val q = emb.where(col("vec_id") === 0)
        .select(col("embedding")).head.getSeq[Float](0).toArray
      // trackResult: the checkpoint blocks release with the other
      // self-contained results (Bench's releaseResults between runs)
      // instead of lingering for the JVM's lifetime
      operators.Dedup.trackResult(
        operators.Ivf.topKPq(spark, path, "vec_id", q, n = 10, nprobe = 4)
          .select(col("vec_id").as("id"), col("adc_dist"))
          .localCheckpoint(true)) // the temp store may be reclaimed later
    }),
    // IVF-OPQ round-trip (train rotation → rotate corpus → encode →
    // store → load rotation → rotate query → ADC candidates → exact
    // rescore), oracle-gated: the m=1 full-codebook degenerate store
    // makes rotated-space ADC ≈ exact L2 up to float-rotation error
    // (~1e-6 relative — R is float32-orthogonal), so the ADC top-50
    // candidate set certainly covers the true top-10; the final rank
    // and the compared distances come from an EXACT original-space
    // rescore (keepVectors=true), which plain SQL replays. The serving
    // pattern itself — ANN candidates then exact rescore — is the real
    // production shape, now under the oracle end-to-end.
    "q_ivf_opq" -> ((spark, dir) => {
      init(spark, dir)
      val emb = spark.table("embeddings").where(col("vec_id") < 200)
      val path = ivfOpqGateDir
      operators.Ivf.writeIndexedOpq(emb, "vec_id", "embedding", path,
        pqM = 1, pqK = 256, k = 4, maxIter = 2, pqIters = 1, opqIters = 1,
        keepVectors = true)
      val q = emb.where(col("vec_id") === 0)
        .select(col("embedding")).head.getSeq[Float](0).toArray
      val cand = operators.Ivf.topKPq(spark, path, "vec_id", q, n = 50,
        nprobe = 4).select(col("vec_id"))
      val qcol = typedLit(q.toSeq)
      val exactDist = aggregate(
        zip_with(col("embedding"), qcol, (x, y) =>
          (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
      operators.Dedup.trackResult(
        cand.join(emb, "vec_id")
          .select(col("vec_id").as("id"), round(exactDist, 6).as("l2_dist"))
          .orderBy(col("l2_dist"), col("id"))
          .limit(10)
          .localCheckpoint(true))
    }),
    // SemDeDup (Abbas et al. 2023): semantic dedup over the embedding
    // corpus — k-means clusters, within-cluster cosine collapse, keep
    // the most-peripheral member. Planted duplicates (the q_embed_dedup
    // augmentation) must each lose exactly one member. Rows-only by
    // design: the k-means cluster assignment is not ANSI-SQL-
    // expressible; SemDedupSpec pins the keep rule, determinism, and
    // the sub-split path. Gate-sized bounds (k, train sample) keep the
    // cost a corpus-size-independent constant, the q_ann_pq precedent
    "q_semdedup" -> ((spark, dir) => {
      init(spark, dir)
      val aug = spark.sql(
        """SELECT vec_id, embedding FROM embeddings
          |UNION ALL
          |SELECT vec_id + 100000 AS vec_id,
          |       transform(embedding, (x, i) ->
          |         IF(i = 0, CAST(CAST(x AS DOUBLE) + 0.05 AS FLOAT), x)) AS embedding
          |FROM embeddings""".stripMargin)
      operators.SemDedup.assign(aug, "vec_id", "embedding", tau = 0.95,
          k = 64, trainSampleSize = 10000)
        .where(!col("kept"))
        .select(col("id").as("vec_id"), col("cluster"))
    }),
    // Trained quality filter (fastText-style hashed-n-gram logistic
    // regression): the heuristic gate labels the training split, the
    // model scores every document. L-BFGS float aggregation order makes
    // exact probabilities run-dependent → rows-only gate; the spec pins
    // held-out separation instead
    "q_quality_classifier" -> ((spark, dir) => {
      init(spark, dir)
      val docs = spark.table("documents")
      // label by predicate at the scan (no join); null text sorts negative
      val pass = TextAnalysis.qualityPass(col("text"))
      val pos = docs.where(pass)
      val neg = docs.where(!coalesce(pass, lit(false)))
      // bounded deterministic training sample: corpus-size-independent
      val model = operators.QualityClassifier.train(pos, neg, "text",
        numFeatures = 1 << 14, maxTrainDocs = 100000L, sampleIdCol = Some("doc_id"))
      operators.QualityClassifier.score(docs, "text", model)
        .select(col("doc_id"), round(col("quality_prob"), 2).as("q"))
    }),
    // Deterministic 75/12.5/12.5 split (binary-exact thresholds, so the
    // oracle's CASE chain compares the identical doubles)
    "q_split" -> ((spark, dir) => {
      init(spark, dir)
      Corpus.assignSplit(spark.table("documents"), "doc_id",
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
        .select("doc_id", "split")
    }),
    // Exact substring-level dedup signal: fraction of each doc's 8-token
    // windows that occur more than once anywhere in the corpus
    "q_dup_spans" -> ((spark, dir) => {
      init(spark, dir)
      Corpus.dupSpanStats(spark.table("documents"), "doc_id", "text",
        windowTokens = 8)
    }),
    // The removal half of ExactSubstr (Lee et al.): excise every 8-token
    // span occurring earlier in the corpus, keep-first, reassemble from
    // surviving tokens.
    "q_dedup_spans_remove" -> ((spark, dir) => {
      init(spark, dir)
      Corpus.removeDupSpans(spark.table("documents"), "doc_id", "text",
        windowTokens = 8)
    }),
    // Paragraph-level keep-first dedup (C4/FineWeb): the corpus has no
    // newlines, so the gate synthesizes multi-paragraph pages by joining
    // 10 docs per page AND appends doc 0's text to every page as shared
    // boilerplate — every page but the first-occurrence one must lose
    // that paragraph and reassemble from its survivors. The oracle
    // reproduces the same construction.
    "q_paragraph_dedup" -> ((spark, dir) => {
      init(spark, dir)
      val boiler = spark.table("documents")
        .where(col("doc_id") === 0).select(col("text").as("boiler"))
      val pages = spark.table("documents")
        .groupBy((col("doc_id") % 50).as("gid"))
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
            x => x("text")), "\n\n").as("body"))
        .crossJoin(broadcast(boiler))
        .select(col("gid"), concat(col("body"), lit("\n\n"), col("boiler")).as("text"))
      Corpus.dropRepeatedParagraphs(pages, "gid", "text")
    }),
    // Exact interpolated percentiles per source (Spark `percentile` and
    // DuckDB `quantile_cont` share the linear-interpolation definition)
    "q_stats_quantiles" -> sql(
      """SELECT source,
        |       round(percentile(n_chars, 0.5), 4) AS q50,
        |       round(percentile(n_chars, 0.9), 4) AS q90,
        |       round(percentile(n_chars, 0.99), 4) AS q99
        |FROM documents GROUP BY source""".stripMargin),
    // histogram quantile sketch: the single-pass bounded-state
    // alternative to the exact sort above — 1000 fixed bins over
    // l_extendedprice, rank interpolation inside the covering bin; the
    // arithmetic is transcendental-free so the estimates hash-match
    "q_hist_quantile" -> ((spark, dir) => {
      init(spark, dir)
      Corpus.histogramQuantiles(spark.table("lineitem"), "l_extendedprice",
        lo = 900.0, hi = 105000.0, nBins = 1000, qs = Seq(0.5, 0.9, 0.99))
    }),
    // range-free quantile leg: deterministic bottom-k-by-hash sample
    // (bounded aggregate state, no prior [lo, hi)); the oracle takes
    // the same k smallest md5 rows and the same rank convention
    "q_sample_quantiles" -> ((spark, dir) => {
      init(spark, dir)
      val keyed = spark.table("lineitem").select(
        concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string")).as("rk"),
        col("l_extendedprice"))
      Corpus.sampleQuantiles(keyed, "rk", "l_extendedprice",
        k = 4096, qs = Seq(0.5, 0.9, 0.99))
    }),

    "q_multimodal" -> ((spark, dir) => {
      init(spark, dir)
      val media = spark.table("documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      Multimodal.decodeMeta(media, "media")
        .select(col("doc_id"), col("media_meta.mime").as("mime"),
          col("media_meta.width").as("width"), col("media_meta.height").as("height"),
          col("media_meta.n_bytes").as("n_bytes"))
    }),
    // REAL MP4 container parsing, oracle-gated end to end: each document
    // row synthesizes a VALID ISO BMFF blob (ftyp+moov/mvhd+trak/tkhd)
    // whose duration/dimensions derive from doc_id, then the parser
    // (VideoHeaderDecoder — the SAME code path real corpora use) reads
    // them back; the oracle replays the doc_id arithmetic in plain SQL.
    // MKV/EBML and the corrupt-payload sentinel are spec-gated
    // (VideoMetaSpec: hand-built boxes incl. v1/largesize/unknown-size)
    "q_video_meta" -> ((spark, dir) => {
      init(spark, dir)
      val mk = udf { (id: Long) =>
        Multimodal.syntheticMp4(
          width = (160 + (id % 8) * 160).toInt, height = (90 + (id % 8) * 90).toInt,
          durationTicks = (id % 300) * 1000 + 500, timescale = 1000)
      }
      val media = spark.table("documents").select(col("doc_id"), mk(col("doc_id")).as("media"))
      Multimodal.decodeVideoMeta(media, "media")
        .select(col("doc_id"), col("video_meta.mime").as("mime"),
          col("video_meta.width").as("width"), col("video_meta.height").as("height"),
          col("video_meta.duration_sec").as("duration_sec"))
    }),

    // ----------------------------------------------------- events/streaming
    "q_events_window" -> sql(
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |       count(*) AS n_events, round(sum(value), 3) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin),
    "q_events_json" -> sql(
      """SELECT event_type, sum(CAST(get_json_object(props, '$.k') AS BIGINT)) AS sum_k, count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin),
    // Ordered conversion funnel with a 24 h per-stage window: first signup,
    // first click within a day after it, first purchase within a day after
    // that (150 → 65 → 29 users at sf0.01 — real discrimination). Stage
    // times compare at second precision on both engine sides (events.ts is
    // stored ns; Spark reads µs-truncated — second-floor is identical).
    "q_funnel" -> sql(
      """WITH s1 AS (SELECT user_id, min(unix_timestamp(ts)) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(unix_timestamp(e.ts)) AS t2 FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND unix_timestamp(e.ts) > s1.t1
        |         AND unix_timestamp(e.ts) <= s1.t1 + 86400
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(unix_timestamp(e.ts)) AS t3 FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND unix_timestamp(e.ts) > s2.t2
        |         AND unix_timestamp(e.ts) <= s2.t2 + 86400
        |       GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM s1) AS n_signup,
        |       (SELECT count(*) FROM s2) AS n_signup_click,
        |       (SELECT count(*) FROM s3) AS n_full_funnel""".stripMargin),
    // cohort retention matrix: users bucketed by first-event day,
    // counted in every later day they were active
    "q_retention" -> ((spark, dir) => {
      init(spark, dir)
      EventStreams.retentionCohorts(spark.table("events"), "user_id", "ts",
        periodSeconds = 86400L)
    }),
    "q_sessionize" -> ((spark, dir) => {
      init(spark, dir)
      EventStreams.sessionize(spark.table("events"), gapMinutes = 30,
          orderCols = Seq("ts", "event_id"))
        .groupBy("user_id")
        .agg(max("session_seq").as("n_sessions"), count(lit(1)).as("n_ev"))
    }),
    // Stream-stream interval join, batch-parity gate: every click within
    // the hour before each purchase (same definition powers the
    // watermarked streaming join in EventStreamsSpec). Second-floored
    // timestamps on both engine sides, the q_funnel convention.
    "q_interval_join" -> ((spark, dir) => {
      init(spark, dir)
      val ev = spark.table("events")
      val p = ev.where(col("event_type") === "purchase")
        .select(col("event_id"),
          timestamp_seconds(unix_timestamp(col("ts"))).as("pts"),
          col("user_id").as("pu"))
      val c = ev.where(col("event_type") === "click")
        .select(col("user_id").as("cu"),
          timestamp_seconds(unix_timestamp(col("ts"))).as("cts"),
          col("value").as("cv"))
      EventStreams.intervalJoin(p, "pts", c, "cts", Seq("pu" -> "cu"),
          beforeSec = 3600, afterSec = 0)
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_clicks"), round(sum("cv"), 3).as("sum_v"))
    }),
    // As-of join: each purchase gets the most recent prior click by the
    // same user within 1 hour (the trade←quote enrichment shape). Times
    // compare at second precision on BOTH engine sides (the q_funnel
    // convention — events.ts is ns in parquet, µs in Spark), with
    // click event_id as the deterministic tiebreaker.
    // nearest-direction as-of (pandas merge_asof parity): whichever of
    // the prior/next click is closer in time, exact tie -> backward
    "q_asof_nearest" -> ((spark, dir) => {
      init(spark, dir)
      val ev = spark.table("events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("pt"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id").as("cu"), unix_timestamp(col("ts")).as("ct"),
          col("event_id").as("click_id"), col("value").as("cv"))
      Temporal.asofJoin(purchases, clicks, Seq("user_id"), Seq("cu"), "pt", "ct",
          payloadCols = Seq("click_id", "cv"),
          direction = "nearest", tolerance = Some(3600L),
          tieCols = Seq("click_id"))
        .select(col("event_id"), col("user_id"), col("pt"), col("click_id"),
          round(col("cv"), 3).as("click_value"))
    }),
    "q_asof_join" -> ((spark, dir) => {
      init(spark, dir)
      val ev = spark.table("events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("pt"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id").as("cu"), unix_timestamp(col("ts")).as("ct"),
          col("event_id").as("click_id"), col("value").as("cv"))
      Temporal.asofJoin(purchases, clicks, Seq("user_id"), Seq("cu"), "pt", "ct",
          payloadCols = Seq("click_id", "cv"),
          tolerance = Some(3600L), tieCols = Seq("click_id"))
        .select(col("event_id"), col("user_id"), col("pt"), col("click_id"),
          round(col("cv"), 3).as("click_value"))
    }),
    // Gap-fill / resample: per event_type 5-minute sums densified to a
    // regular grid, missing bins carrying the last observed value
    // forward (asofJoin-backed — one exchange, O(1) state, no window).
    // src_t === t is the observed-vs-filled flag on both engine sides.
    "q_gap_fill" -> ((spark, dir) => {
      init(spark, dir)
      val obs = spark.table("events")
        .where(col("ts").isNotNull)
        .groupBy(col("event_type").as("k"),
          (unix_timestamp(col("ts")).divide(300).cast("long") * 300).as("t"))
        .agg(sum("value").as("v"))
      Temporal.gapFill(obs, Seq("k"), "t", 300L, Seq("v"))
        .select(col("k"), col("t"), col("src_t"),
          round(col("v"), 3).as("v_fill"),
          (col("src_t") === col("t")).as("observed"))
    }),
    // SCD type-2 build: each customer's order-priority history collapsed
    // to validity intervals (half-open, valid_to = next change, null on
    // the current version); o_orderkey pins equal-date order.
    "q_scd2" -> ((spark, dir) => {
      init(spark, dir)
      val log = spark.table("orders").select(
        col("o_custkey").as("k"), col("o_orderdate").cast("date").as("t"),
        col("o_orderpriority").as("prio"), col("o_orderkey").as("tie"))
      Temporal.scd2(log, Seq("k"), "t", Seq("prio"), tieCols = Seq("tie"))
        .select(col("k"), col("prio"),
          col("valid_from").cast("string").as("valid_from"),
          col("valid_to").cast("string").as("valid_to"),
          col("is_current"))
    }),
    // Hierarchical aggregate: ROLLUP over (returnflag, linestatus) with
    // grouping-level markers — subtotal rows are where engines usually
    // disagree on NULL semantics, so they're pinned under the oracle.
    "q_rollup" -> sql(
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
        |       coalesce(l_linestatus, '(all)') AS ls,
        |       CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |       CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |       count(*) AS cnt, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin),
    // GROUPING SETS with a level set neither ROLLUP nor CUBE can express:
    // ((rf, ls), (ls), ()) — skips the (rf)-only level and keeps the
    // (ls)-only one, so the planner's Expand must follow the explicit
    // set list, not a prefix/powerset shorthand. Identical SQL text runs
    // on both engines.
    "q_grouping_sets" -> sql(
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
        |       coalesce(l_linestatus, '(all)') AS ls,
        |       CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |       CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |       count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())""".stripMargin),
    // CUBE: the full power set of the two keys — the one level ROLLUP
    // lacks is (linestatus)-only; grouping markers disambiguate natural
    // NULLs from subtotal rows.
    "q_cube" -> sql(
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
        |       coalesce(l_linestatus, '(all)') AS ls,
        |       CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |       CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |       count(*) AS cnt, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin),
    // Pivot: order counts per status spread across priority columns.
    // Expressed as conditional aggregation so BOTH engines run the
    // identical portable form (Spark's .pivot sugar plans to the same).
    "q_pivot" -> sql(
      """SELECT o_orderstatus,
        |       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p_urgent,
        |       CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p_high,
        |       CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p_medium,
        |       round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END), 2) AS urgent_value
        |FROM orders GROUP BY o_orderstatus""".stripMargin),
    // Sliding window frame: 7-row centered moving average of daily order
    // value — the ROWS BETWEEN frame machinery under an oracle.
    "q_moving_avg" -> sql(
      """SELECT d, n, round(avg(v) OVER w, 2) AS ma7,
        |       CAST(sum(n) OVER w AS BIGINT) AS n7
        |FROM (SELECT date_trunc('DAY', o_orderdate) AS d, count(*) AS n,
        |             sum(o_totalprice) AS v
        |      FROM orders GROUP BY 1) t
        |WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)""".stripMargin),
    // String-kernel surface: the classic scalar string functions under
    // one exact gate (case folds, slicing, padding, replace, reverse,
    // edit distance, first-letter caps, code points). Identical SQL
    // text runs on both engines; every value compares exactly.
    "q_string_funcs" -> sql(
      """SELECT c_custkey,
        |       upper(c_mktsegment) AS seg_u,
        |       length(c_name) AS name_len,
        |       substr(c_name, 1, 8) AS name_pre,
        |       replace(c_name, '0', '#') AS name_rep,
        |       lpad(CAST(c_nationkey AS STRING), 4, '0') AS nk_pad,
        |       reverse(c_mktsegment) AS seg_rev,
        |       levenshtein(c_mktsegment, 'MACHINERY') AS lev,
        |       concat(upper(substr(lower(c_mktsegment), 1, 1)),
        |              substr(lower(c_mktsegment), 2)) AS seg_cap,
        |       ascii(c_name) AS first_code
        |FROM customer""".stripMargin),
    // Distribution-window surface: percent_rank / cume_dist /
    // dense_rank plus a value-RANGE frame sum (peers included by VALUE,
    // not row position — the frame ROWS can't express). One pinned
    // ordering; identical SQL text runs on both engines.
    "q_window_percentile" -> sql(
      """SELECT o_orderkey AS okey,
        |       round(percent_rank() OVER w, 6) AS pr,
        |       round(cume_dist() OVER w, 6) AS cd,
        |       dense_rank() OVER w AS drnk,
        |       round(sum(o_totalprice) OVER
        |         (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |          RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 2) AS rng_sum
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""".stripMargin),
    // Native recursive CTE (Spark 4.x WITH RECURSIVE): generate the
    // month calendar spine declaratively and left-join order aggregates
    // onto it — the classic date-dimension build, zero-order months
    // kept. Identical SQL text runs on both engines; the recursion is
    // bounded by the WHERE guard (80 iterations).
    "q_recursive_cte" -> sql(
      """WITH RECURSIVE months(mon) AS (
        |  SELECT CAST('1995-01-01' AS DATE)
        |  UNION ALL
        |  SELECT CAST(mon + INTERVAL '1' MONTH AS DATE) FROM months
        |  WHERE mon < CAST('2001-08-01' AS DATE))
        |SELECT CAST(mon AS STRING) AS mon_s, count(o_orderkey) AS n_orders,
        |       round(coalesce(sum(o_totalprice), 0), 2) AS revenue
        |FROM months LEFT JOIN orders
        |  ON CAST(date_trunc('month', o_orderdate) AS DATE) = mon
        |GROUP BY mon""".stripMargin),
    // Navigation-window surface: lag/lead/first_value + ntile over each
    // customer's order history, one fully-pinned ordering (date, then
    // orderkey). Identical SQL text runs on both engines; the delta
    // against the previous order is where off-by-one frame bugs show.
    "q_window_lag" -> sql(
      """SELECT o_orderkey AS okey, o_custkey AS ckey,
        |       round(o_totalprice - lag(o_totalprice) OVER w, 2) AS delta_prev,
        |       round(lead(o_totalprice) OVER w, 2) AS next_price,
        |       round(first_value(o_totalprice) OVER w, 2) AS first_price,
        |       ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin),
    // Weighted PageRank over the customer→supplier flow graph (the
    // crawl-prioritization authority signal, on the tables we have):
    // 3 power iterations, damping 0.85. Ranks scale ×1000 before the
    // 6-dp round so the compare keeps ~9 significant digits while
    // sitting far above both engines' summation-order FP noise.
    "q_pagerank" -> ((spark, dir) => {
      init(spark, dir)
      val edges = spark.sql(
        """SELECT concat('c', CAST(o_custkey AS STRING)) AS src,
          |       concat('s', CAST(l_suppkey AS STRING)) AS dst,
          |       sum(l_quantity) AS w
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY 1, 2""".stripMargin)
      Graphs.pageRank(edges, "src", "dst", Some("w"), iterations = 3)
        .select(col("node"), round(col("rank") * 1000, 6).as("rank_k"))
    }),
    // Multi-source BFS over the undirected customer↔supplier trade
    // graph: hop distance from the %1000 customer seed set, capped at 4
    // hops. Oracle = DuckDB WITH RECURSIVE walk + min(dist) — the
    // frontier loop must agree with the declarative fixpoint exactly.
    "q_graph_bfs" -> ((spark, dir) => {
      init(spark, dir)
      val edges = spark.sql(
        """SELECT DISTINCT concat('c', CAST(o_custkey AS STRING)) AS src,
          |       concat('s', CAST(l_suppkey AS STRING)) AS dst
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin)
      val sources = spark.sql(
        """SELECT DISTINCT concat('c', CAST(c_custkey AS STRING)) AS node
          |FROM customer WHERE c_custkey % 1000 = 0""".stripMargin)
      Graphs.bfs(edges, "src", "dst", sources, "node",
        maxHops = 4, undirected = true)
    }),
    // Weighted multi-source shortest paths (Bellman-Ford) over a PLANTED
    // layered DAG: edges c → c+δ (δ ∈ 1..3, weight 1 + (c*31 + δ*17) % 7),
    // sources every 20th customer, hop cap 8. The DAG + small integer
    // weights keep the DuckDB weighted-walk replay tractable: the
    // recursive CTE dedups (node, dist, hops) TRIPLES, whose count is
    // bounded by hops × the few-dozen reachable integer distances per
    // node — never the (exponential) path count. Exact-FP safe: every
    // dist is a sum of ≤ 8 small integers carried as doubles.
    "q_shortest_paths" -> ((spark, dir) => {
      init(spark, dir)
      val edges = spark.sql(
        """SELECT c_custkey AS src, c_custkey + d AS dst,
          |       CAST(1 + (c_custkey * 31 + d * 17) % 7 AS DOUBLE) AS w
          |FROM customer CROSS JOIN (SELECT * FROM VALUES (1), (2), (3) AS t(d))
          |WHERE c_custkey + d <= (SELECT max(c_custkey) FROM customer)""".stripMargin)
      val sources = spark.sql(
        "SELECT c_custkey AS node FROM customer WHERE c_custkey % 20 = 0")
      Graphs.shortestPaths(edges, "src", "dst", "w", sources, "node",
        maxIter = 8)
    }),
    // Synchronous label propagation, 2 rounds, min-label count tiebreak:
    // deterministic community labels over the undirected trade graph.
    // The oracle unrolls the same two rounds as grouped counts +
    // row_number — the distributed argmax reduce must agree with the
    // declarative replay exactly, node by node.
    "q_label_prop" -> ((spark, dir) => {
      init(spark, dir)
      val edges = spark.sql(
        """SELECT DISTINCT concat('c', CAST(o_custkey AS STRING)) AS src,
          |       concat('s', CAST(l_suppkey AS STRING)) AS dst
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin)
      Graphs.labelPropagation(edges, "src", "dst", rounds = 2)
    }),
    // Snapshot diff: version B is derived deterministically from the
    // documents table (drop %7, rewrite %5 of the survivors, add 100 new
    // ids), then every id is classified across the two versions.
    "q_snapshot_diff" -> ((spark, dir) => {
      init(spark, dir)
      val a = spark.table("documents")
      val b = a.where(col("doc_id") % 7 =!= 0)
        .withColumn("text", when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
        .unionByName(a.where(col("doc_id") < 100)
          .withColumn("doc_id", col("doc_id") + 1000000))
      Corpus.diffSnapshots(a, b, "doc_id", Seq("text"))
    }),
    // CDC MERGE / upsert: a derived change batch (updates on %3 keys,
    // deletes on %5 keys at CONFLICTING sequence numbers — on %15 keys
    // the update wins when the delete's seq is 1 and loses when it's 3 —
    // plus fresh inserts) applied onto the documents snapshot. Winner
    // per key = highest (seq, op, payloads) struct; one full-outer join.
    "q_merge_upsert" -> ((spark, dir) => {
      init(spark, dir)
      val changes = spark.sql(
        """SELECT doc_id, 2L AS seq, 'U' AS op,
          |       concat(text, ' [rev2]') AS text, lang
          |FROM documents WHERE doc_id % 3 = 0
          |UNION ALL
          |SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 3L ELSE 1L END, 'D',
          |       CAST(NULL AS STRING), CAST(NULL AS STRING)
          |FROM documents WHERE doc_id % 5 = 0
          |UNION ALL
          |SELECT doc_id + 2000000, 1L, 'I',
          |       concat('new doc ', CAST(doc_id AS STRING)), 'en'
          |FROM documents WHERE doc_id < 50""".stripMargin)
      Layout.mergeChanges(spark.table("documents"), changes, "doc_id",
        "seq", "op", Seq("text", "lang"))
    }),
    // Small-file compaction identity: the documents table writes
    // FRAGMENTED (16 writer tasks × 4 partition dirs ≈ 64 small files),
    // Layout.compact merges each leaf dir independently (no global
    // shuffle — coalesce per directory), and the compacted table must
    // hash-equal the plain source INCLUDING the partition column — the
    // oracle proves compaction changes layout, never content.
    // Cold-cost-by-design: the fragmented write + compaction run inside
    // the gate.
    "q_compact" -> ((spark, dir) => {
      init(spark, dir)
      val path = compactGateDir
      spark.table("documents").select(col("doc_id"), col("text"), col("lang"))
        .withColumn("p", (col("doc_id") % 4).cast("int"))
        .repartition(16)
        .write.mode("overwrite").partitionBy("p").parquet(path)
      val stats = operators.Layout.compact(spark, path, parallelism = 4)
      require(stats.dirsCompacted == 4 && stats.filesAfter < stats.filesBefore,
        s"compaction did not run: $stats")
      spark.read.parquet(path)
        .select(col("doc_id"), col("text"), col("lang"), col("p"))
    }),
    // Reader-safe compaction over the SINK-managed layout: three applied
    // insert batches split along the sink's OWN bucket routing
    // (pmod(xxhash64(doc_id), 8) — Spark SQL's xxhash64 IS the sink's
    // hash, so each batch touches a disjoint bucket set and the snapshot
    // genuinely fragments across three delta dirs); compactSnapshot
    // merges them into one behind the atomic manifest swap (no
    // doubled-rows window — nothing visible changes before the pointer
    // moves, unlike the in-place path) and vacuum reclaims the
    // superseded dirs; the surviving snapshot must hash-equal the plain
    // table (the bucket split is invisible to content, so the oracle
    // needs no xxhash64 — merge CONFLICT semantics are oracled
    // separately by q_upsert_stream_parity / q_merge_upsert).
    // Cold-cost-by-design: each pass builds, compacts, and vacuums a
    // fresh snapshot. q_compact proves the same identity for the
    // in-place path over a plain partitioned tree.
    "q_compact_sink" -> ((spark, dir) => {
      init(spark, dir)
      val path = compactSinkGateDir()
      def slice(lo: Int, hi: Int) = spark.sql(
        s"""SELECT doc_id, 1L AS seq, 'I' AS op, text, lang
           |FROM documents
           |WHERE pmod(xxhash64(doc_id), 8) BETWEEN $lo AND $hi""".stripMargin)
      val applyB = graft.streaming.UpsertSink.applyBatch(
        spark, path, "doc_id", "seq", "op", Seq("text", "lang"), 8) _
      applyB(slice(0, 2), 0); applyB(slice(3, 5), 1); applyB(slice(6, 7), 2)
      val frag = graft.streaming.UpsertSink.readManifest(path).get
        .buckets.values.toSet.size
      val stats = graft.streaming.UpsertSink.compactSnapshot(spark, path)
      require(frag == 3 && stats.dirsCompacted == frag,
        s"sink compaction did not run: fragmented over $frag dirs, $stats")
      val (vd, _) = graft.streaming.UpsertSink.vacuum(path)
      require(vd == frag, s"vacuum reclaimed $vd of $frag superseded dirs")
      graft.streaming.UpsertSink.readSnapshot(spark, path)
        .select("doc_id", "text", "lang")
    }),
    // TIME-TRAVEL read over the sink layout (round 13): three batches
    // land (insert evens → update %6 / delete %10 with an equal-seq
    // U-beats-D tie at %30 → delete EVERYTHING), then readSnapshotAt
    // recovers the state AS OF batch 1 from the retained manifests —
    // the lakehouse VERSION AS OF primitive, oracled as the two-batch
    // declarative fold. The final (current) snapshot is empty, so the
    // gate only passes if the historical manifest chain, not the
    // current one, produced the rows. Cold-cost-by-design: fresh store
    // per pass.
    "q_upsert_time_travel" -> ((spark, dir) => {
      init(spark, dir)
      val path = timeTravelGateDir()
      val b0 = spark.sql(
        """SELECT doc_id, 1L AS seq, 'I' AS op, text, lang
          |FROM documents WHERE doc_id % 2 = 0""".stripMargin)
      val b1 = spark.sql(
        """SELECT doc_id, 2L AS seq, 'U' AS op,
          |       concat(text, ' [v2]') AS text, lang
          |FROM documents WHERE doc_id % 6 = 0
          |UNION ALL
          |SELECT doc_id, 2L, 'D', CAST(NULL AS STRING), CAST(NULL AS STRING)
          |FROM documents WHERE doc_id % 10 = 0""".stripMargin)
      val b2 = spark.sql(
        """SELECT doc_id, 3L AS seq, 'D' AS op,
          |       CAST(NULL AS STRING) AS text, CAST(NULL AS STRING) AS lang
          |FROM documents WHERE doc_id % 2 = 0""".stripMargin)
      val applyB = graft.streaming.UpsertSink.applyBatch(
        spark, path, "doc_id", "seq", "op", Seq("text", "lang"), 8) _
      applyB(b0, 0); applyB(b1, 1); applyB(b2, 2)
      require(graft.streaming.UpsertSink.snapshotVersions(path) ==
        Seq(0L, 1L, 2L), "expected three committed versions")
      graft.streaming.UpsertSink.readSnapshotAt(spark, path, 1)
        .select("doc_id", "text", "lang")
    }),
    // Time travel through the SQL FRONT DOOR (round 14): the same
    // three-batch store read back with the graft_snapshot table-valued
    // function — `SELECT … FROM graft_snapshot(path, 1)` is the
    // engine-native spelling of `VERSION AS OF 1`, so the lakehouse
    // primitive is reachable from raw SQL (and therefore the HTTP
    // surface), not only the Scala API. Same oracle as the API gate.
    "q_time_travel_sql" -> ((spark, dir) => {
      init(spark, dir)
      val path = timeTravelSqlGateDir()
      val b0 = spark.sql(
        """SELECT doc_id, 1L AS seq, 'I' AS op, text, lang
          |FROM documents WHERE doc_id % 2 = 0""".stripMargin)
      val b1 = spark.sql(
        """SELECT doc_id, 2L AS seq, 'U' AS op,
          |       concat(text, ' [v2]') AS text, lang
          |FROM documents WHERE doc_id % 6 = 0
          |UNION ALL
          |SELECT doc_id, 2L, 'D', CAST(NULL AS STRING), CAST(NULL AS STRING)
          |FROM documents WHERE doc_id % 10 = 0""".stripMargin)
      val b2 = spark.sql(
        """SELECT doc_id, 3L AS seq, 'D' AS op,
          |       CAST(NULL AS STRING) AS text, CAST(NULL AS STRING) AS lang
          |FROM documents WHERE doc_id % 2 = 0""".stripMargin)
      val applyB = graft.streaming.UpsertSink.applyBatch(
        spark, path, "doc_id", "seq", "op", Seq("text", "lang"), 8) _
      applyB(b0, 0); applyB(b1, 1); applyB(b2, 2)
      spark.sql(
        s"SELECT doc_id, text, lang FROM graft_snapshot('$path', 1)")
    }),
    // Bucket-pruned POINT LOOKUP over the sink layout (round 14): the
    // same two-batch store as the time-travel gates, probed for four
    // literal keys through readSnapshotKeys — each key hashes through
    // the sink's own routing expression to exactly one bucket, so the
    // read opens ONLY those buckets (require asserts it via inputFiles:
    // ≤4 of the manifest's bucket dirs touched) and returns exactly the
    // live rows among them (2 survives, 6 carries the [v2] update, 10
    // was deleted, 123456789 never existed). This is the data-skipping
    // primitive of a hash-bucketed store: at production bucket counts a
    // point read costs O(keys), not O(table). Cold-cost-by-design:
    // fresh store per pass.
    "q_upsert_point_lookup" -> ((spark, dir) => {
      init(spark, dir)
      val path = pointLookupGateDir()
      val b0 = spark.sql(
        """SELECT doc_id, 1L AS seq, 'I' AS op, text, lang
          |FROM documents WHERE doc_id % 2 = 0""".stripMargin)
      val b1 = spark.sql(
        """SELECT doc_id, 2L AS seq, 'U' AS op,
          |       concat(text, ' [v2]') AS text, lang
          |FROM documents WHERE doc_id % 6 = 0
          |UNION ALL
          |SELECT doc_id, 2L, 'D', CAST(NULL AS STRING), CAST(NULL AS STRING)
          |FROM documents WHERE doc_id % 10 = 0""".stripMargin)
      val applyB = graft.streaming.UpsertSink.applyBatch(
        spark, path, "doc_id", "seq", "op", Seq("text", "lang"), 8) _
      applyB(b0, 0); applyB(b1, 1)
      val out = graft.streaming.UpsertSink.readSnapshotKeys(spark, path,
        Seq(2L, 6L, 10L, 123456789L))
      val bucketsRead = out.inputFiles.flatMap(f =>
        "__bucket=(\\d+)".r.findFirstMatchIn(f).map(_.group(1))).distinct
      val total = graft.streaming.UpsertSink.readManifest(path).get.buckets.size
      require(bucketsRead.length <= 4 && bucketsRead.length < total,
        s"lookup read ${bucketsRead.length} of $total buckets — not pruned")
      out.select("doc_id", "text", "lang")
    }),
    // The sink store as a REGISTERED TABLE (round 14): `CREATE TEMPORARY
    // VIEW … USING graft-snapshot` binds the manifest once, and the
    // OPTIMIZER routes the WHERE clause — Catalyst pushes the IN
    // conjunct into the relation's buildScan, the key literals hash
    // through the sink's own routing, and only those buckets' files
    // enter the plan (witnessed below on the relation's inner frame; the
    // residual lang predicate rides along re-applied above the scan).
    // Same two-batch store as the lookup gates; probes 4 (plain live),
    // 12 ([v2] update), 30 (the %30 equal-seq D/U tie → update), and a
    // never-present key. Cold-cost-by-design: fresh store per pass.
    "q_upsert_table_scan" -> ((spark, dir) => {
      init(spark, dir)
      val path = tableScanGateDir()
      val b0 = spark.sql(
        """SELECT doc_id, 1L AS seq, 'I' AS op, text, lang
          |FROM documents WHERE doc_id % 2 = 0""".stripMargin)
      val b1 = spark.sql(
        """SELECT doc_id, 2L AS seq, 'U' AS op,
          |       concat(text, ' [v2]') AS text, lang
          |FROM documents WHERE doc_id % 6 = 0
          |UNION ALL
          |SELECT doc_id, 2L, 'D', CAST(NULL AS STRING), CAST(NULL AS STRING)
          |FROM documents WHERE doc_id % 10 = 0""".stripMargin)
      val applyB = graft.streaming.UpsertSink.applyBatch(
        spark, path, "doc_id", "seq", "op", Seq("text", "lang"), 8) _
      applyB(b0, 0); applyB(b1, 1)
      // pruning witness on the relation's inner plan: the pushed IN must
      // route to ≤4 of the manifest's buckets before any task runs
      val rel = graft.sources.snapshot.SnapshotRelation(spark, path, None)
      val inner = rel.scanFrame(Array("doc_id", "text", "lang"),
        Array(org.apache.spark.sql.sources.In("doc_id",
          Array(4L, 12L, 30L, 123456789L))))
      val bucketsRead = inner.inputFiles.flatMap(f =>
        "__bucket=(\\d+)".r.findFirstMatchIn(f).map(_.group(1))).distinct
      val total = graft.streaming.UpsertSink.readManifest(path).get.buckets.size
      require(bucketsRead.length <= 4 && bucketsRead.length < total,
        s"table scan read ${bucketsRead.length} of $total buckets — not pruned")
      spark.sql(
        s"""CREATE OR REPLACE TEMPORARY VIEW graft_store_gate
           |USING `graft-snapshot` OPTIONS (path '$path')""".stripMargin)
      spark.sql(
        """SELECT doc_id, text, lang FROM graft_store_gate
          |WHERE doc_id IN (4, 12, 30, 123456789) AND lang IS NOT NULL""".stripMargin)
    }),
    // CHANGEFEED between two sink versions (round 14, the lakehouse CDF
    // read): batch 0 inserts the evens, batch 1 updates %6 / deletes %10
    // (the %30 equal-seq D/U tie resolves to update) and inserts ~40
    // fresh +3000000 keys; readChanges(0, 1) must emit exactly the keys
    // whose state differs, classified insert/update/delete with
    // post-image payloads — and reads ONLY the buckets batch 1 touched
    // (the manifest diff; spec-witnessed, here oracled for content).
    // Oracle: the v1 fold full-outer-diffed against the v0 state with
    // IS DISTINCT FROM. Cold-cost-by-design: fresh store per pass.
    "q_upsert_changefeed" -> ((spark, dir) => {
      init(spark, dir)
      val path = changefeedGateDir()
      val b0 = spark.sql(
        """SELECT doc_id, 1L AS seq, 'I' AS op, text, lang
          |FROM documents WHERE doc_id % 2 = 0""".stripMargin)
      val b1 = spark.sql(
        """SELECT doc_id, 2L AS seq, 'U' AS op,
          |       concat(text, ' [v2]') AS text, lang
          |FROM documents WHERE doc_id % 6 = 0
          |UNION ALL
          |SELECT doc_id, 2L, 'D', CAST(NULL AS STRING), CAST(NULL AS STRING)
          |FROM documents WHERE doc_id % 10 = 0
          |UNION ALL
          |SELECT doc_id + 3000000, 2L, 'I', concat('cf ', text), lang
          |FROM documents WHERE doc_id < 40""".stripMargin)
      val applyB = graft.streaming.UpsertSink.applyBatch(
        spark, path, "doc_id", "seq", "op", Seq("text", "lang"), 8) _
      applyB(b0, 0); applyB(b1, 1)
      graft.streaming.UpsertSink.readChanges(spark, path, 0, 1)
        .select("doc_id", "_change_type", "text", "lang")
    }),
    // ADDITIVE schema evolution on the sink (round 14): batch 0 inserts
    // the evens with payload (text) only; batch 1 carries mergeSchema =
    // true and a WIDER payload (text, lang) updating the %6 keys — the
    // manifest DDL widens in place, every pre-evolution bucket reads
    // `lang` as a typed NULL with no rewrite (dirs conform lazily on
    // read), and only the updated keys carry a value. Oracle: the even
    // docs with lang NULLed except on %6. Cold-cost-by-design: fresh
    // store per pass.
    "q_upsert_schema_evolution" -> ((spark, dir) => {
      init(spark, dir)
      val path = schemaEvoGateDir()
      val b0 = spark.sql(
        """SELECT doc_id, 1L AS seq, 'I' AS op, text
          |FROM documents WHERE doc_id % 2 = 0""".stripMargin)
      val b1 = spark.sql(
        """SELECT doc_id, 2L AS seq, 'U' AS op, text, lang
          |FROM documents WHERE doc_id % 6 = 0""".stripMargin)
      graft.streaming.UpsertSink.applyBatch(
        spark, path, "doc_id", "seq", "op", Seq("text"), 8)(b0, 0)
      graft.streaming.UpsertSink.applyBatch(
        spark, path, "doc_id", "seq", "op", Seq("text", "lang"), 8,
        mergeSchema = true)(b1, 1)
      graft.streaming.UpsertSink.readSnapshot(spark, path)
        .select("doc_id", "text", "lang")
    }),
    // INCREMENTALLY MAINTAINED MATERIALIZED VIEW (round 14): a grouped
    // count/sum of the base sink store kept in a DERIVED sink store and
    // advanced by PRE-IMAGE changefeed deltas (post-images add,
    // pre-images subtract) instead of recomputation — maintenance cost
    // ∝ touched groups (pruned feed read + pruned current-value lookup
    // + pruned write-back), never O(view) or O(base). Batch 1 carries
    // value-only updates (%6: tlen+5 — cnt delta cancels, sum moves),
    // deletes (%10, incl. the %30 equal-seq tie), and fresh groups
    // (+3000000 inserts under 'x'-prefixed langs). Oracle: GROUP BY
    // over the two-batch fold. Cold-cost-by-design: fresh stores per
    // pass.
    "q_incremental_matview" -> ((spark, dir) => {
      init(spark, dir)
      val root = matviewGateDir()
      val base = s"$root/base"; val view = s"$root/view"
      val b0 = spark.sql(
        """SELECT doc_id, 1L AS seq, 'I' AS op, lang,
          |       CAST(length(text) AS BIGINT) AS tlen
          |FROM documents WHERE doc_id % 2 = 0""".stripMargin)
      val b1 = spark.sql(
        """SELECT doc_id, 2L AS seq, 'U' AS op, lang,
          |       CAST(length(text) + 5 AS BIGINT) AS tlen
          |FROM documents WHERE doc_id % 6 = 0
          |UNION ALL
          |SELECT doc_id, 2L, 'D', CAST(NULL AS STRING), CAST(NULL AS BIGINT)
          |FROM documents WHERE doc_id % 10 = 0
          |UNION ALL
          |SELECT doc_id + 3000000, 2L, 'I', concat('x', lang),
          |       CAST(length(text) AS BIGINT)
          |FROM documents WHERE doc_id < 40""".stripMargin)
      val applyB = graft.streaming.UpsertSink.applyBatch(
        spark, base, "doc_id", "seq", "op", Seq("lang", "tlen"), 8) _
      applyB(b0, 0); applyB(b1, 1)
      require(graft.streaming.MatView.catchUp(
        spark, base, view, "lang", Seq("tlen"), 8) == 2,
        "matview catch-up did not apply both base versions")
      graft.streaming.UpsertSink.readSnapshot(spark, view)
        .select("lang", "cnt", "tlen")
    }),
    // Streaming↔batch CDC parity: three derived change batches applied
    // through the exactly-once UpsertSink (manifest + bucket-pruned
    // copy-on-write, 8 buckets — enough dirs to exercise pruning while
    // keeping the gate's FS constant visible-cost honest) must land on
    // the same snapshot the
    // declarative fold produces. Batch 1 carries delete-vs-update
    // conflicts resolved by seq (%20 keys: D@3 beats U@2; others: U@2
    // beats D@1); batch 2 carries an equal-seq D/U tie on %63 keys
    // (op 'U' > 'D' in the winner struct). Cold-cost-by-design: each
    // pass builds a fresh snapshot table in a temp dir.
    "q_upsert_stream_parity" -> ((spark, dir) => {
      init(spark, dir)
      val path = upsertGateDir()
      val b0 = spark.sql(
        """SELECT doc_id, 1L AS seq, 'I' AS op, text, lang
          |FROM documents WHERE doc_id % 2 = 0""".stripMargin)
      val b1 = spark.sql(
        """SELECT doc_id, 2L AS seq, 'U' AS op,
          |       concat(text, ' [u1]') AS text, lang
          |FROM documents WHERE doc_id % 6 = 0
          |UNION ALL
          |SELECT doc_id, 2L, 'I', text, lang
          |FROM documents WHERE doc_id % 2 = 1 AND doc_id % 3 = 0
          |UNION ALL
          |SELECT doc_id, CASE WHEN doc_id % 20 = 0 THEN 3L ELSE 1L END, 'D',
          |       CAST(NULL AS STRING), CAST(NULL AS STRING)
          |FROM documents WHERE doc_id % 10 = 0""".stripMargin)
      val b2 = spark.sql(
        """SELECT doc_id, 4L AS seq, 'D' AS op,
          |       CAST(NULL AS STRING) AS text, CAST(NULL AS STRING) AS lang
          |FROM documents WHERE doc_id % 9 = 0
          |UNION ALL
          |SELECT doc_id, 4L, 'U', concat('final ', CAST(doc_id AS STRING)), 'xx'
          |FROM documents WHERE doc_id % 7 = 0
          |UNION ALL
          |SELECT doc_id + 3000000, 1L, 'I',
          |       concat('new ', CAST(doc_id AS STRING)), 'en'
          |FROM documents WHERE doc_id < 30""".stripMargin)
      val applyB = graft.streaming.UpsertSink.applyBatch(
        spark, path, "doc_id", "seq", "op", Seq("text", "lang"), 8) _
      applyB(b0, 0); applyB(b1, 1); applyB(b2, 2)
      graft.streaming.UpsertSink.readSnapshot(spark, path)
        .select("doc_id", "text", "lang")
    }),
    // Bounded group-top-k: k-capped heap at every aggregation stage (no
    // window, no per-group buffering — see TopKAggregate.scala); ties
    // pinned by the orderkey in the sort struct.
    "q_topk_per_group" -> ((spark, dir) => {
      init(spark, dir)
      spark.table("orders").groupBy("o_orderpriority")
        .agg(call_function("topk_agg",
          struct(col("o_totalprice"), col("o_orderkey")), lit(3)).as("top"))
        .select(col("o_orderpriority"), explode(col("top")).as("t"))
        .select(col("o_orderpriority"),
          round(col("t.o_totalprice"), 2).as("price"),
          col("t.o_orderkey").as("okey"))
    }),
    // Exact deterministic stratified sample: 20 documents per source via
    // bottomk_agg over (hashUniform, id) — exact counts where Bernoulli
    // sampling only promises an expectation.
    "q_stratified_sample" -> ((spark, dir) => {
      init(spark, dir)
      Corpus.stratifiedSample(spark.table("documents"), "source", "doc_id", 20)
        .select("doc_id", "source")
    }),
    // Single-pass column profile of the documents table — the
    // data-quality audit step (null/distinct/min/max per column).
    "q_profile" -> ((spark, dir) => {
      init(spark, dir)
      Corpus.profile(spark.table("documents"))
    }),
    // Z-order layout: bit-interleaved bucket ranks over two dimensions —
    // the multi-dimensional clustering key lakehouse formats sort by for
    // data skipping. The gate verifies the z-values themselves.
    "q_zorder" -> ((spark, dir) => {
      init(spark, dir)
      val c = spark.table("customer")
        .select(col("c_custkey"), col("c_acctbal"),
          (col("c_custkey") % 97).cast("double").as("y"))
      operators.Layout.withZValue(c, Seq("c_acctbal", "y"), 8)
        .select("c_custkey", "z")
    }),
    // Bucketed co-located join: both sides written with the SAME bucket
    // count on the join key (Layout.writeBucketed), then joined AND
    // aggregated on that key with broadcast disabled — the bucketed
    // distribution satisfies both, so the plan carries ZERO Exchange
    // (plan-asserted in LayoutSpec; here the oracle proves the layout
    // changes nothing semantically). Cold-cost-by-design: the timed
    // section pays both table writes — the shuffle a bucketed layout
    // prepays once per LOAD, amortized across every co-located join
    // after it.
    "q_bucketed_join" -> ((spark, dir) => {
      init(spark, dir)
      val wh = new java.io.File(
        sys.props("java.io.tmpdir"), "graft-bucketed").getAbsolutePath
      operators.Layout.writeBucketed(
        spark.table("orders").select(col("o_custkey"), col("o_totalprice")),
        "graft_bkt_orders", s"$wh/orders", "o_custkey", 16,
        sortCols = Seq("o_custkey"))
      operators.Layout.writeBucketed(
        spark.table("customer").select(col("c_custkey"), col("c_acctbal")),
        "graft_bkt_customer", s"$wh/customer", "c_custkey", 16,
        sortCols = Seq("c_custkey"))
      val bcast = "spark.sql.autoBroadcastJoinThreshold"
      val prior = spark.conf.getOption(bcast)
      spark.conf.set(bcast, "-1")
      try {
        spark.table("graft_bkt_customer")
          .join(spark.table("graft_bkt_orders"),
            col("c_custkey") === col("o_custkey"))
          .groupBy(col("c_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("sum_price"))
          .localCheckpoint(true) // materialize under the conf, restore after
          .transform(operators.Dedup.trackResult[org.apache.spark.sql.DataFrame])
      } finally prior match {
        case Some(v) => spark.conf.set(bcast, v)
        case None    => spark.conf.unset(bcast)
      }
    }),
    // Okapi BM25 lexical scoring against a 4-term query; scores rounded
    // at 4 dp (ln differs at the ulp level across engines).
    "q_bm25" -> ((spark, dir) => {
      init(spark, dir)
      Retrieval.bm25(spark.table("documents"), "doc_id", "text",
          Seq("hash", "join", "vector", "stream"))
        .select(col("doc_id"), round(col("score"), 4).as("score"))
    }),
    // Hybrid retrieval: reciprocal-rank fusion of the BM25 top-50 with a
    // length-prior top-50 — the standard lexical+prior combiner. Legs
    // rank on ROUNDED scores with id tiebreaks so both engines build
    // identical rank lists.
    "q_rrf_fusion" -> ((spark, dir) => {
      init(spark, dir)
      val docs = spark.table("documents")
      val lex = Retrieval.bm25(docs, "doc_id", "text",
          Seq("hash", "join", "vector", "stream"))
        .select(col("doc_id"), round(col("score"), 4).as("s"))
        .orderBy(col("s").desc, col("doc_id").asc).limit(50)
      val lengthy = docs.select(col("doc_id"), col("n_chars").cast("double").as("s"))
        .orderBy(col("s").desc, col("doc_id").asc).limit(50)
      Retrieval.rrfFuse(Seq(lex, lengthy), "doc_id", "s")
        .select(col("doc_id"), round(col("rrf"), 6).as("rrf"))
    }),
    // Count-Min sketch: one 4×1024 counter matrix over the corpus word
    // stream, then point estimates (min over rows) for doc 1's words.
    // Both the matrix and the estimates are deterministic functions of
    // the word multiset, so DuckDB rebuilds them exactly.
    "q_cms_sketch" -> ((spark, dir) => {
      init(spark, dir)
      val docs = spark.table("documents")
      val words = docs.select(explode(TextAnalysis.wsTokens(col("text"))).as("w"))
      val sk = words.agg(call_function("cms_sketch", col("w"), lit(4), lit(1024)).as("sk"))
      val probes = docs.where(col("doc_id") === 1)
        .select(explode(TextAnalysis.wsTokens(col("text"))).as("probe")).distinct()
      val est = least((0 until 4).map { i =>
        element_at(col("sk"), (lit(i * 1024) +
          pmod(element_at(call_function("word_window_hashes",
            array(concat(lit(s"cms$i:"), col("probe"))), lit(1)), 1), lit(1024L))
          + 1).cast("int"))
      }: _*)
      probes.crossJoin(sk).select(col("probe"), est.as("est"))
    }),
    // Misra-Gries heavy hitters: the exact words covering > 1/200 of the
    // corpus token stream, found with bounded per-partition sketch state
    // plus an exact candidate recount (see operators/Sketches.scala).
    "q_heavy_hitters" -> ((spark, dir) => {
      init(spark, dir)
      val words = spark.table("documents")
        .select(explode(TextAnalysis.wsTokens(col("text"))).as("word"))
      Sketches.heavyHitters(words, "word", 200)
        .select(col("item").as("word"), col("cnt"))
    }),
    // KMV/theta distinct-count sketch: per-source estimated distinct
    // vocabulary from the 1024 smallest word hashes — deterministic, so
    // the DuckDB oracle reproduces the estimate bit-for-bit.
    "q_distinct_sketch" -> ((spark, dir) => {
      init(spark, dir)
      spark.table("documents")
        .select(col("source"),
          explode(call_function("word_window_hashes",
            TextAnalysis.wsTokens(col("text")), lit(1))).as("h"))
        .groupBy("source")
        .agg(round(call_function("kmv_distinct", col("h"), lit(1024)), 2)
          .as("est_distinct_words"))
    }),
    // Mergeable-sketch ROLLUP: per-(source, lang) KMV states
    // materialized, then rolled up per source by merging STATES — no
    // rescan of the token stream — and the estimate off the merged
    // state must equal the single-pass per-source sketch bit-for-bit
    // (bottomK(A∪B) = bottomK(bottomK(A)∪bottomK(B))). The oracle is
    // the single-pass replay, so the gate hashes the whole
    // aggregate-once / re-aggregate-anywhere path.
    "q_sketch_rollup" -> ((spark, dir) => {
      init(spark, dir)
      val k = 16 // below the ~31-word corpus vocabulary, so states
                 // TRUNCATE and the estimator branch is the one hashed
      val lvl1 = spark.table("documents")
        .select(col("source"), col("lang"),
          explode(call_function("word_window_hashes",
            TextAnalysis.wsTokens(col("text")), lit(1))).as("h"))
        .groupBy("source", "lang")
        .agg(call_function("kmv_sketch", col("h"), lit(k)).as("sk"))
      val rolled = lvl1.groupBy("source")
        .agg(call_function("kmv_merge", col("sk"), lit(k)).as("sk"))
      rolled.select(col("source"),
        round(when(size(col("sk")) < k, size(col("sk")).cast("double"))
          .otherwise(lit((k - 1).toDouble * math.pow(2, 60)) /
            element_at(col("sk"), k).cast("double")), 2)
          .as("est_distinct_words"))
    }),
    // HyperLogLog register sketch: per-source distinct-vocabulary sketch
    // in 64 bytes of state (vs KMV's 8 KB above). The gate pins the
    // EXACT register content twice over — the 2^55-scaled harmonic sum
    // (pure integer arithmetic, order-free) and the raw harmonic
    // estimate whose only roundings are one multiply and one divide,
    // identically associated in the oracle. The ln-bearing
    // linear-counting branch stays in Sketches.hllEstimate (spec-gated).
    "q_hll_distinct" -> ((spark, dir) => {
      init(spark, dir)
      spark.table("documents")
        .select(col("source"),
          explode(call_function("word_window_hashes",
            TextAnalysis.wsTokens(col("text")), lit(1))).as("h"))
        .groupBy("source")
        .agg(call_function("hll_sketch", col("h"), lit(6)).as("regs"))
        .select(col("source"),
          aggregate(col("regs"), lit(0L), (acc, x) =>
            acc + call_function("shiftleft", lit(1L), lit(55) - x))
            .as("harmonic_s"))
        .withColumn("est_distinct_words",
          round(lit(0.709) * lit(4096.0) * lit((1L << 55).toDouble)
            / col("harmonic_s").cast("double"), 2))
    }),
    // Skew-aware join: events (5 event types over 10k+ rows — every key
    // is hot) joined to a per-type threshold dimension through the
    // salted hot path (hotK=10 flags all five types), then filtered and
    // re-aggregated. The oracle is the PLAIN join — the gate proves the
    // salt split is invisible in the result. The threshold is max/2
    // (max of doubles is exact — no summation-order hazard in the
    // comparison).
    "q_skew_join" -> ((spark, dir) => {
      init(spark, dir)
      val ev = spark.table("events")
      val left = ev.select(col("event_id"), col("event_type"), col("value"))
      val right = ev.groupBy(col("event_type").as("typ"))
        .agg(max(col("value")).as("typ_max"))
      SkewJoin.join(left, right, "event_type", "typ", "inner",
          hotK = 10, salt = 8)
        .where(col("value") > col("typ_max") / 2)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_above"), round(sum("value"), 2).as("sum_above"))
    }),
    // Forward as-of: each signup gets the NEXT click by the same user
    // within 2 h (time-to-first-action analytics); smallest (t, id) wins.
    "q_asof_forward" -> ((spark, dir) => {
      init(spark, dir)
      val ev = spark.table("events")
      val signups = ev.where(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("st"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id").as("cu"), unix_timestamp(col("ts")).as("ct"),
          col("event_id").as("click_id"))
      Temporal.asofJoin(signups, clicks, Seq("user_id"), Seq("cu"), "st", "ct",
          payloadCols = Seq("click_id", "ct"), direction = "forward",
          tolerance = Some(7200L), tieCols = Seq("click_id"))
        .select(col("event_id"), col("user_id"), col("st"), col("click_id"),
          (col("ct") - col("st")).as("lag_sec"))
    }),
    // Binned range join: suppliers' account-balance bands [s_acctbal,
    // s_acctbal + 500] collect the customers whose balance falls inside —
    // an interval join Spark would otherwise plan as a nested loop.
    "q_range_join" -> ((spark, dir) => {
      init(spark, dir)
      val bands = spark.table("supplier")
        .select(col("s_suppkey"), col("s_acctbal").as("lo"),
          (col("s_acctbal") + 500).as("hi"))
      val cust = spark.table("customer").select("c_custkey", "c_acctbal")
      Temporal.rangeJoin(cust, "c_acctbal", bands, "lo", "hi")
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("sum_bal"))
    }),
  )

  /** DuckDB-runnable oracle per query (driver's correctness gate).
    *
    * Text-hashing oracles (minhash/simhash/fingerprints) assume an
    * ASCII/BMP corpus: Java string ops work on UTF-16 code units while
    * DuckDB's work on codepoints with RE2 ASCII `\s`, so non-BMP chars,
    * exotic Unicode whitespace, or locale-special casing would make both
    * sides diverge on semantics (not correctness). The generated testdata
    * is ASCII; OraclePreconditionsSpec asserts the corpus-side
    * preconditions these oracles rest on (ASCII text + the Jaccard gap
    * that makes LSH recall lossless). */
  /** The BM25 oracle CTE block, shared verbatim by q_bm25 and
    * q_rrf_fusion — ONE definition so the two gates cannot drift (the
    * wsTokens single-source lesson). Yields a `bm(doc_id, score)`
    * relation; associativity is parenthesized to match the engine's
    * expression tree exactly (only ln is ulp-divergent, absorbed by the
    * 4-dp round). */
  private val Bm25OracleCtes =
    """WITH ws AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), w -> w <> '') AS ws FROM documents),
      |toks AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS t FROM ws),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(len(ws)) AS avgdl FROM ws),
      |tf AS (SELECT doc_id, t, count(*) AS tf, min(dl) AS dl FROM toks
      |       WHERE t IN ('hash', 'join', 'vector', 'stream') GROUP BY 1, 2),
      |dfq AS (SELECT t, CAST(count(*) AS DOUBLE) AS nt FROM tf GROUP BY t),
      |bm AS (SELECT tf.doc_id, round(sum(
      |  ln(((SELECT n FROM stats) - dfq.nt + 0.5) / (dfq.nt + 0.5) + 1.0) *
      |  (tf.tf * (1.2 + 1.0) / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * tf.dl / (SELECT avgdl FROM stats))))
      |), 4) AS score FROM tf JOIN dfq ON tf.t = dfq.t GROUP BY tf.doc_id)""".stripMargin

  def oracleSql: Map[String, String] = ListMap(
    "q_select_filter" ->
      "SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal FROM customer WHERE c_acctbal > 1000 AND c_mktsegment = 'BUILDING' AND c_nationkey <> 3",
    "q_filter_in" ->
      "SELECT p_partkey, p_size, p_brand FROM part WHERE p_size IN (5, 10, 15, 20) AND p_partkey NOT IN (1, 2, 3)",
    "q_filter_isnull" ->
      "SELECT o_orderkey, o_orderstatus FROM orders WHERE nullif(o_orderstatus, 'F') IS NOT NULL AND o_totalprice IS NOT NULL",
    "q_groupby_agg" ->
      "SELECT l_returnflag, l_linestatus, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty, round(avg(l_extendedprice), 2) AS avg_price, round(min(l_discount), 4) AS min_disc, round(max(l_tax), 4) AS max_tax FROM lineitem GROUP BY l_returnflag, l_linestatus",
    "q_join_inner" ->
      "SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY r_name, n_name",
    "q_join_left" ->
      "SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey",
    "q_join_full" ->
      "SELECT coalesce(a.k, b.k) AS k, coalesce(a.cnt_a, 0) AS cnt_a, coalesce(b.cnt_b, 0) AS cnt_b FROM (SELECT c_nationkey AS k, count(*) AS cnt_a FROM customer GROUP BY 1) a FULL JOIN (SELECT s_nationkey AS k, count(*) AS cnt_b FROM supplier GROUP BY 1) b ON a.k = b.k",
    "q_subquery_from" ->
      "SELECT mkt, round(avg(total), 2) AS avg_total FROM (SELECT c_mktsegment AS mkt, o_totalprice AS total FROM customer JOIN orders ON o_custkey = c_custkey) t GROUP BY mkt",
    "q_subquery_in_where" ->
      "SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 500)",
    "q_mod_filter" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE mod(l_orderkey, 7) = 0 AND l_quantity > 25",
    "q_date_filter" ->
      "SELECT l_orderkey, l_linenumber, CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_d FROM lineitem WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'",
    "q_orderby_limit" ->
      "SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q_distinct" ->
      "SELECT DISTINCT c_mktsegment AS seg, c_nationkey AS nk FROM customer",
    "q_expr_project" ->
      "SELECT l_orderkey, l_linenumber, floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100 AS charge, CASE WHEN l_quantity > 30 THEN 'bulk' ELSE 'small' END AS qclass FROM lineitem WHERE l_linenumber = 1",

    "q_like" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_name LIKE 'Customer#0000001%' AND c_name NOT LIKE '%9'",
    "q_having" ->
      "SELECT c_nationkey, count(*) AS n, round(sum(c_acctbal), 2) AS bal FROM customer GROUP BY c_nationkey HAVING count(*) > 20",
    "q_union" ->
      "SELECT c_nationkey AS k, 'cust' AS side FROM customer WHERE c_acctbal > 9000 UNION ALL SELECT s_nationkey AS k, 'supp' AS side FROM supplier WHERE s_acctbal > 9000",
    "q_intersect" ->
      "SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey AS k FROM supplier",
    "q_except" ->
      "SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING' EXCEPT SELECT c_custkey AS k FROM customer WHERE c_acctbal < 5000",
    "q_exists" ->
      "SELECT p_partkey, p_name FROM part p WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)",
    "q_window_rank" ->
      "SELECT c_custkey, c_nationkey, rnk FROM (SELECT c_custkey, c_nationkey, rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk FROM customer) t WHERE rnk <= 3",
    "q_st_point_xy" ->
      s"SELECT c_custkey, $CX AS x, $CY AS y, 4326 AS srid FROM customer",
    "q_st_distance" ->
      s"SELECT c_custkey, round(sqrt(($CX - 30.0)*($CX - 30.0) + ($CY - 50.0)*($CY - 50.0)), 4) AS dist FROM customer WHERE sqrt(($CX - 30.0)*($CX - 30.0) + ($CY - 50.0)*($CY - 50.0)) <= 40.0",
    // same haversine closed form (dLat/dLon ordering and association match
    // GeoOps.haversineMeters exactly so both sides agree at cm rounding)
    "q_st_distance_sphere" ->
      s"""SELECT c_custkey,
         | floor(2 * 6371008.771415059 * asin(least(1.0, sqrt(
         |   sin(radians(20.0 - lat) / 2) * sin(radians(20.0 - lat) / 2) +
         |   cos(radians(lat)) * cos(radians(20.0)) *
         |     sin(radians(30.0 - lon) / 2) * sin(radians(30.0 - lon) / 2)
         | ))) * 100 + 0.5) / 100 AS dist_m
         |FROM (SELECT c_custkey, $CX AS lon,
         |        CAST(c_custkey % 97 AS DOUBLE) / 2.0 - 10.0 AS lat
         |      FROM customer) t""".stripMargin,
    // same spherical forward closed form as GeoOps.stProject, term order
    // preserved so both engines agree at 1e-6° rounding (incl. the
    // [-180, 180) longitude wrap: (x + 540) % 360 - 180, fmod is exact)
    "q_st_project" ->
      s"""SELECT c_custkey,
         |  floor(((degrees(lon1 + atan2(sin(az)*sin(delta)*cos(lat1),
         |                               cos(delta) - sin(lat1)*sin(lat2))) + 540) % 360 - 180) * 1000000 + 0.5) / 1000000 AS lon2,
         |  floor(degrees(lat2) * 1000000 + 0.5) / 1000000 AS lat2
         |FROM (
         |  SELECT c_custkey, lon1, lat1, az, delta,
         |    asin(sin(lat1)*cos(delta) + cos(lat1)*sin(delta)*cos(az)) AS lat2
         |  FROM (
         |    SELECT c_custkey,
         |      radians($CX) AS lon1,
         |      radians(CAST(c_custkey % 97 AS DOUBLE) / 2.0 - 10.0) AS lat1,
         |      radians(CAST(c_custkey % 360 AS DOUBLE)) AS az,
         |      (1000.0 + CAST(c_custkey % 5 AS DOUBLE) * 500.0) / 6371008.771415059 AS delta
         |    FROM customer) base) t""".stripMargin,
    // geohash precision 5: 13 lon bits + 12 lat bits interleaved MSB-first,
    // 5-bit groups through the base-32 alphabet. floor-scale cell indexing
    // is exactly the kernel's bisection: cell boundaries 45k/1024 are dyadic
    // (IEEE-exact on both engines) and the 4-decimal/0.5-step test
    // coordinates sit ≥ 1e-7 from any non-coincident boundary.
    "q_st_geohash" ->
      s"""SELECT c_custkey,
         |  list_aggregate([
         |    substring('0123456789bcdefghjkmnpqrstuvwxyz',
         |              CAST(((v >> (5 * (4 - k))) & 31) AS INT) + 1, 1)
         |    for k in range(0, 5)], 'string_agg', '') AS gh5
         |FROM (
         |  SELECT c_custkey,
         |    list_sum([((lx >> (12 - i)) & 1) * (CAST(1 AS BIGINT) << (24 - 2*i)) for i in range(0, 13)])
         |    + list_sum([((ly >> (11 - j)) & 1) * (CAST(1 AS BIGINT) << (23 - 2*j)) for j in range(0, 12)]) AS v
         |  FROM (
         |    SELECT c_custkey,
         |      CAST(floor((lon + 180.0) / 360.0 * 8192.0) AS BIGINT) AS lx,
         |      CAST(floor((lat + 90.0) / 180.0 * 4096.0) AS BIGINT) AS ly
         |    FROM (SELECT c_custkey, $CX AS lon,
         |            CAST(c_custkey % 97 AS DOUBLE) / 2.0 - 10.0 AS lat
         |          FROM customer))) t""".stripMargin,
    "q_st_dwithin" ->
      s"SELECT count(*) AS n_close FROM customer WHERE sqrt(($CX - 30.0)*($CX - 30.0) + ($CY - 50.0)*($CY - 50.0)) <= 25.0",
    "q_st_within" ->
      s"SELECT c_custkey FROM customer WHERE $CX > 10.37 AND $CX < 60.93 AND $CY > 20.11 AND $CY < 77.21",
    "q_st_contains" ->
      s"SELECT count(*) AS n_inside FROM customer WHERE $CX > 5.13 AND $CX < 55.99 AND $CY > 3.07 AND $CY < 66.5",
    "q_st_intersects" ->
      s"SELECT c_custkey FROM customer WHERE $CX <= 40.5 AND $CX + 5.0 >= 20.5 AND $CY <= 60.5 AND $CY + 5.0 >= 30.5",
    "q_st_geomtype_dim" ->
      "SELECT c_custkey, CASE c_custkey % 3 WHEN 0 THEN 'ST_Point' WHEN 1 THEN 'ST_Polygon' ELSE 'ST_LineString' END AS gtype, CASE c_custkey % 3 WHEN 0 THEN 0 WHEN 1 THEN 2 ELSE 1 END AS gdim FROM customer",
    "q_st_area_length_centroid" ->
      s"""SELECT c_custkey,
         | round((1.0 + CAST(c_custkey % 5 AS DOUBLE)) * (2.0 + CAST(c_custkey % 7 AS DOUBLE)), 4) AS area,
         | round(2 * ((1.0 + CAST(c_custkey % 5 AS DOUBLE)) + (2.0 + CAST(c_custkey % 7 AS DOUBLE))), 4) AS perim,
         | round($CX + (1.0 + CAST(c_custkey % 5 AS DOUBLE)) / 2, 4) AS cx0,
         | round($CY + (2.0 + CAST(c_custkey % 7 AS DOUBLE)) / 2, 4) AS cy0
         |FROM customer""".stripMargin,
    "q_st_extent" ->
      s"SELECT round(min($CX), 4) AS xmin, round(min($CY), 4) AS ymin, round(max($CX), 4) AS xmax, round(max($CY), 4) AS ymax, count(*) AS n FROM customer",
    "q_st_union_agg" ->
      "SELECT c_nationkey, round(CAST(count(DISTINCT (c_custkey % 50) * 1000 + (c_custkey % 23)) AS DOUBLE), 2) AS area FROM customer GROUP BY c_nationkey",
    "q_st_buffer_union" ->
      "SELECT count(*) AS n_buffer_ok, round(count(*) * 6.0, 2) AS sum_union_area, round(count(*) * 2.0, 2) AS sum_hull_area FROM customer",
    // forward Snyder transverse-Mercator series (USGS PP 1395 eq. 8-9) in
    // plain SQL; round trip echoes the inputs (the engine's inverse must
    // undo its forward to 1e-6°, which the easting/northing columns pin)
    "q_st_transform" ->
      """SELECT c_custkey,
        | floor((500000.0 + 0.9996*nn*(aa + (1-tt+cc)*aa*aa*aa/6 + (5-18*tt+tt*tt+72*cc-58*ep2)*aa*aa*aa*aa*aa/120))*100 + 0.5)/100 AS easting,
        | floor((10000000.0 + 0.9996*(mm + nn*tan(phi)*(aa*aa/2 + (5-tt+9*cc+4*cc*cc)*aa*aa*aa*aa/24 + (61-58*tt+tt*tt+600*cc-330*ep2)*aa*aa*aa*aa*aa*aa/720)))*100 + 0.5)/100 AS northing,
        | floor(lon*1000000 + 0.5)/1000000 AS lon_rt,
        | floor(lat*1000000 + 0.5)/1000000 AS lat_rt
        |FROM (
        | SELECT c_custkey, lon, lat, phi, e2, ep2,
        |   6378137.0/sqrt(1 - e2*sin(phi)*sin(phi)) AS nn,
        |   tan(phi)*tan(phi) AS tt,
        |   ep2*cos(phi)*cos(phi) AS cc,
        |   (radians(lon) - radians(105.0))*cos(phi) AS aa,
        |   6378137.0*((1 - e2/4 - 3*e2*e2/64 - 5*e2*e2*e2/256)*phi
        |     - (3*e2/8 + 3*e2*e2/32 + 45*e2*e2*e2/1024)*sin(2*phi)
        |     + (15*e2*e2/256 + 45*e2*e2*e2/1024)*sin(4*phi)
        |     - (35*e2*e2*e2/3072)*sin(6*phi)) AS mm
        | FROM (
        |   SELECT c_custkey, lon, lat, radians(lat) AS phi, e2, e2/(1-e2) AS ep2
        |   FROM (
        |     SELECT c_custkey,
        |       105.0 + CAST(c_custkey % 300 AS DOUBLE)/100.0 AS lon,
        |       -7.0 + CAST(c_custkey % 500 AS DOUBLE)/100.0 AS lat,
        |       (1.0/298.257223563)*(2.0 - 1.0/298.257223563) AS e2
        |     FROM customer)))""".stripMargin,
    "q_wkt_roundtrip" ->
      s"SELECT c_custkey, round($CX, 4) AS x2, concat('POINT (', c_custkey % 10, ' 0)') AS wkt FROM customer",
    "q_geojson_io" ->
      s"""SELECT c_custkey, round($CX, 4) AS x2, round($CY, 4) AS y2, concat('{"type":"Point","coordinates":[', c_custkey % 5, '.0,1.0]}') AS gj FROM customer""",
    "q_gml_io" ->
      s"SELECT c_custkey, round($CX, 4) AS gx FROM customer",
    // writer→parser identity: the oracle is the coordinate itself
    "q_gml2_roundtrip" ->
      s"SELECT c_custkey, round($CX, 4) AS gx FROM customer",
    "q_kml_io" ->
      s"SELECT c_custkey, round($CY, 4) AS gy FROM customer",
    // DBSCAN replay: symmetric eps-pairs (self included), core test,
    // recursive core-core closure (min reachable = min of component,
    // edges are symmetric), border = min cluster among core neighbors
    "q_dbscan" ->
      """WITH RECURSIVE p AS (SELECT s_suppkey AS id, s_acctbal / 100.0 AS x, CAST(s_suppkey % 97 AS DOUBLE) AS y FROM supplier),
        |e AS (SELECT a.id AS ida, b.id AS idb FROM p a, p b
        |      WHERE sqrt((a.x - b.x)*(a.x - b.x) + (a.y - b.y)*(a.y - b.y)) <= 6.0),
        |n AS (SELECT ida, count(*) AS cnt FROM e GROUP BY 1),
        |core AS (SELECT ida AS id FROM n WHERE cnt >= 3),
        |ce AS (SELECT e.ida, e.idb FROM e JOIN core ca ON e.ida = ca.id JOIN core cb ON e.idb = cb.id),
        |reach(a, b) AS (SELECT ida, idb FROM ce
        |                UNION
        |                SELECT reach.a, ce.idb FROM reach JOIN ce ON reach.b = ce.ida),
        |r AS (SELECT a, min(b) AS cluster FROM reach GROUP BY a),
        |b AS (SELECT e.ida AS id, min(r.cluster) AS cluster
        |      FROM e JOIN core c ON e.idb = c.id JOIN r ON r.a = e.idb
        |      WHERE e.ida NOT IN (SELECT id FROM core)
        |      GROUP BY 1)
        |SELECT p.id AS s_suppkey,
        |       CASE WHEN r.a IS NOT NULL THEN 'core'
        |            WHEN b.id IS NOT NULL THEN 'border' ELSE 'noise' END AS role,
        |       coalesce(r.cluster, b.cluster) AS cluster
        |FROM p LEFT JOIN r ON r.a = p.id LEFT JOIN b ON b.id = p.id""".stripMargin,
    "q_spatial_join" ->
      s"""SELECT c_custkey, s_suppkey,
         | round(sqrt((($CX) - (s_acctbal / 100.0))*(($CX) - (s_acctbal / 100.0))
         |          + (($CY) - CAST(s_suppkey % 97 AS DOUBLE))*(($CY) - CAST(s_suppkey % 97 AS DOUBLE))), 4) AS dist
         |FROM customer, supplier
         |WHERE sqrt((($CX) - (s_acctbal / 100.0))*(($CX) - (s_acctbal / 100.0))
         |         + (($CY) - CAST(s_suppkey % 97 AS DOUBLE))*(($CY) - CAST(s_suppkey % 97 AS DOUBLE))) <= 5.0""".stripMargin,
    "q_knn_spatial" ->
      s"""SELECT c_custkey, s_suppkey, round(d, 4) AS dist, CAST(rk AS INTEGER) AS knn_rank
         |FROM (SELECT c_custkey, s_suppkey, d,
         |             row_number() OVER (PARTITION BY c_custkey ORDER BY d, s_suppkey) AS rk
         |      FROM (SELECT c_custkey, s_suppkey,
         |                   sqrt((($CX) - (s_acctbal / 100.0))*(($CX) - (s_acctbal / 100.0))
         |                      + (($CY) - CAST(s_suppkey % 97 AS DOUBLE))*(($CY) - CAST(s_suppkey % 97 AS DOUBLE))) AS d
         |            FROM customer, supplier))
         |WHERE rk <= 3""".stripMargin,
    "q_xml_flatten" ->
      s"SELECT c_name AS name, CAST(c_nationkey AS VARCHAR) AS nation_str, CAST(c_acctbal AS VARCHAR) AS bal_str, round($CX, 4) AS gx FROM customer",

    "q_warc" ->
      """SELECT concat('http://c', c_custkey, '.example/') AS target_uri,
        |       200 AS http_status, c_name AS name,
        |       CAST(45 + length(c_name) AS BIGINT) AS content_length
        |FROM customer""".stripMargin,
    "q_xml_dsv2" ->
      "SELECT c_name AS name, CAST(c_nationkey AS VARCHAR) AS nk FROM customer WHERE c_nationkey = 3",
    "q_geojson_dsv2" ->
      s"SELECT c_name AS name, CAST(c_nationkey AS VARCHAR) AS nk, round($CX, 4) AS gx FROM customer WHERE c_nationkey = 3",
    "q_geojson_export" ->
      s"SELECT c_name AS name, CAST(c_nationkey AS VARCHAR) AS nk, round($CX, 4) AS gx FROM customer WHERE c_nationkey = 11",
    "q_geojson_v2write" ->
      s"SELECT c_name AS name, CAST(c_nationkey AS VARCHAR) AS nk, round($CX, 4) AS gx FROM customer WHERE c_nationkey = 13",
    "q_xml_server" ->
      "SELECT c_name AS name, CAST(c_nationkey AS VARCHAR) AS nk FROM customer WHERE c_nationkey = 7",
    "q_xml_agg_server" ->
      """SELECT CAST(c_custkey % 7 AS VARCHAR) AS m, count(*) AS cnt, count(c_name) AS n_names
        |FROM customer WHERE c_nationkey = 5 GROUP BY 1""".stripMargin,
    // unique names → the top-10 SET is deterministic, so the sorted-rows
    // hash compare is exact
    "q_xml_topn_server" ->
      "SELECT c_name AS name, CAST(c_nationkey AS VARCHAR) AS nk FROM customer ORDER BY c_name DESC LIMIT 10",
    "q_xml_runtime_filter" ->
      """SELECT c_name AS name, CAST(c_nationkey AS VARCHAR) AS nk, n_name AS nname
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name = 'NATION_7'""".stripMargin,
    "q_geojson_topn" ->
      s"SELECT c_name AS name, CAST(c_nationkey AS VARCHAR) AS nk, round($CX, 4) AS gx FROM customer ORDER BY c_name LIMIT 15",
    "q_xml_join_server" ->
      """SELECT c_name AS name, CAST(c_nationkey AS VARCHAR) AS nk, n_name AS nname
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE starts_with(n_name, 'NATION_1')""".stripMargin,
    // live LEFT join: the right side holds only nations 0..9, so
    // customers of nations 10+ must come back null-extended
    "q_xml_join_left_server" ->
      """SELECT c_name AS name, CAST(c_nationkey AS VARCHAR) AS nk, n_name AS nname
        |FROM customer LEFT JOIN nation
        |  ON c_nationkey = n_nationkey AND n_nationkey < 10""".stripMargin,
    "q_geojson_couch" ->
      s"SELECT c_name AS name, CAST(c_nationkey AS VARCHAR) AS nk, round($CX, 4) AS gx FROM customer WHERE c_nationkey = 7",
    "q_geojson_mongo" ->
      s"SELECT c_name AS name, CAST(c_nationkey AS VARCHAR) AS nk, round($CX, 4) AS gx FROM customer WHERE c_nationkey = 7",
    // The in-database aggregation: per-group partials summed by Spark
    // must equal the plain GROUP BY.
    "q_geojson_mongo_agg" ->
      "SELECT CAST(c_nationkey AS VARCHAR) AS nk, count(*) AS cnt FROM customer GROUP BY 1",
    "q_geojson_mongo_agg_filtered" ->
      "SELECT CAST(c_nationkey AS VARCHAR) AS nk, count(*) AS cnt FROM customer WHERE c_nationkey = 5 GROUP BY 1",
    "q_dedup_exact" ->
      "SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS dup_count FROM documents GROUP BY md5(text)",
    // Exact all-pairs 5-shingle Jaccard ≥ 0.5. Equals the LSH+refine result
    // because (a) refine is exact and (b) at 128 hashes / 32 bands the
    // S-curve catch probability at j ≥ 0.9 is 1-(1-0.9^4)^32 ≈ 1-1e-15 and
    // this corpus has no pairs in (0.45, 0.9) to sit on the S-curve's slope.
    // The least/greatest length prefilter is lossless: J ≤ min|sh|/max|sh|.
    "q_dedup_minhash" ->
      """WITH sh AS (SELECT doc_id, CASE WHEN length(s) >= 5 THEN list_distinct([substring(s, i, 5) for i in range(1, length(s) - 3)]) ELSE [s] END sh
        |            FROM (SELECT doc_id, lower(text) s FROM documents) d)
        |SELECT id_a, id_b, round(inter / (la + lb - inter), 4) AS jaccard
        |FROM (SELECT a.doc_id id_a, b.doc_id id_b, len(list_intersect(a.sh, b.sh))::DOUBLE inter, len(a.sh)::DOUBLE la, len(b.sh)::DOUBLE lb
        |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND least(len(a.sh), len(b.sh))::DOUBLE / greatest(len(a.sh), len(b.sh)) >= 0.5) p
        |WHERE inter / (la + lb - inter) >= 0.5""".stripMargin,
    "q_dedup_drop" ->
      """WITH planted AS (SELECT doc_id, text FROM documents
        |                 UNION ALL
        |                 SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50),
        |keepers AS (SELECT min(doc_id) AS doc_id FROM planted GROUP BY md5(text))
        |SELECT doc_id FROM keepers""".stripMargin,
    // Cross pairs only (incoming × corpus), exact 5-shingle Jaccard ≥ 0.5;
    // the same S-curve/no-mid-band argument as q_dedup_minhash applies
    // (planted pairs sit at j ≥ 0.9, unrelated pairs below 0.45). The
    // least/greatest length prefilter is lossless: J ≤ min|sh|/max|sh|.
    "q_dedup_index" ->
      """WITH incoming AS (
        |  SELECT doc_id + 800000 AS doc_id, text FROM documents WHERE doc_id < 25
        |  UNION ALL
        |  SELECT doc_id + 850000 AS doc_id, text || ' zz' AS text FROM documents WHERE doc_id < 25),
        |shc AS (SELECT doc_id, CASE WHEN length(s) >= 5 THEN list_distinct([substring(s, i, 5) for i in range(1, length(s) - 3)]) ELSE [s] END sh
        |        FROM (SELECT doc_id, lower(text) s FROM documents) d),
        |shi AS (SELECT doc_id, CASE WHEN length(s) >= 5 THEN list_distinct([substring(s, i, 5) for i in range(1, length(s) - 3)]) ELSE [s] END sh
        |        FROM (SELECT doc_id, lower(text) s FROM incoming) d)
        |SELECT id_a, id_b, round(inter / (la + lb - inter), 4) AS jaccard
        |FROM (SELECT i.doc_id id_a, c.doc_id id_b, len(list_intersect(i.sh, c.sh))::DOUBLE inter, len(i.sh)::DOUBLE la, len(c.sh)::DOUBLE lb
        |      FROM shi i JOIN shc c ON least(len(i.sh), len(c.sh))::DOUBLE / greatest(len(i.sh), len(c.sh)) >= 0.5) p
        |WHERE inter / (la + lb - inter) >= 0.5""".stripMargin,
    // Incremental dedup reduces to exact anti-membership of the frozen
    // corpus's text set — the Bloom filter is pure routing.
    "q_dedup_incremental" ->
      """WITH incoming AS (
        |  SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id < 50
        |  UNION ALL
        |  SELECT doc_id + 300000 AS doc_id, text || ' fresh-' || CAST(doc_id AS VARCHAR) AS text
        |  FROM documents WHERE doc_id < 50)
        |SELECT doc_id FROM incoming i
        |WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.text = i.text)""".stripMargin,
    // Salted candidate generation must produce the identical pair set —
    // same oracle as q_dedup_minhash.
    // exhaustive containment over the SAME 60-bit token hashes the
    // engine shuffles (bit-exact, collisions included); threshold test
    // BEFORE the 4-dp round on both sides
    "q_containment_join" ->
      """WITH ws AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), w -> w <> '') AS ws FROM documents),
        |p AS (SELECT doc_id + 1000000 AS probe_id, list_slice(ws, 1, greatest(len(ws) // 2, 1)) AS pw
        |      FROM ws WHERE doc_id % 50 = 0),
        |ph AS (SELECT DISTINCT probe_id, CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h
        |       FROM (SELECT probe_id, unnest(pw) AS w FROM p)),
        |bh AS (SELECT DISTINCT doc_id AS full_id, CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h
        |       FROM (SELECT doc_id, unnest(ws) AS w FROM ws)),
        |pn AS (SELECT probe_id, count(*) AS n FROM ph GROUP BY 1),
        |i AS (SELECT ph.probe_id, bh.full_id, count(*) AS o FROM ph JOIN bh USING (h) GROUP BY 1, 2)
        |SELECT i.probe_id, i.full_id, round(o * 1.0 / pn.n, 4) AS containment
        |FROM i JOIN pn USING (probe_id)
        |WHERE o * 1.0 / pn.n >= 0.9""".stripMargin,
    "q_dedup_minhash_salted" ->
      """WITH sh AS (SELECT doc_id, CASE WHEN length(s) >= 5 THEN list_distinct([substring(s, i, 5) for i in range(1, length(s) - 3)]) ELSE [s] END sh
        |            FROM (SELECT doc_id, lower(text) s FROM documents) d)
        |SELECT id_a, id_b, round(inter / (la + lb - inter), 4) AS jaccard
        |FROM (SELECT a.doc_id id_a, b.doc_id id_b, len(list_intersect(a.sh, b.sh))::DOUBLE inter, len(a.sh)::DOUBLE la, len(b.sh)::DOUBLE lb
        |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND least(len(a.sh), len(b.sh))::DOUBLE / greatest(len(a.sh), len(b.sh)) >= 0.5) p
        |WHERE inter / (la + lb - inter) >= 0.5""".stripMargin,
    // Connected components over the same exact pair set, via transitive
    // closure (recursive CTE); cluster label = min reachable id.
    "q_dedup_cluster" ->
      """WITH RECURSIVE sh AS (SELECT doc_id, CASE WHEN length(s) >= 5 THEN list_distinct([substring(s, i, 5) for i in range(1, length(s) - 3)]) ELSE [s] END sh
        |            FROM (SELECT doc_id, lower(text) s FROM documents) d),
        |pairs AS (SELECT a.doc_id ia, b.doc_id ib
        |          FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND least(len(a.sh), len(b.sh))::DOUBLE / greatest(len(a.sh), len(b.sh)) >= 0.5
        |          WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
        |edges AS (SELECT ia s, ib d FROM pairs UNION SELECT ib, ia FROM pairs),
        |reach AS (SELECT s, d FROM edges UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
        |SELECT s AS id, least(s, min(d)) AS cluster FROM reach GROUP BY s""".stripMargin,
    // Distributed label-propagation path must label identically.
    "q_dedup_cluster_distributed" ->
      """WITH RECURSIVE sh AS (SELECT doc_id, CASE WHEN length(s) >= 5 THEN list_distinct([substring(s, i, 5) for i in range(1, length(s) - 3)]) ELSE [s] END sh
        |            FROM (SELECT doc_id, lower(text) s FROM documents) d),
        |pairs AS (SELECT a.doc_id ia, b.doc_id ib
        |          FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND least(len(a.sh), len(b.sh))::DOUBLE / greatest(len(a.sh), len(b.sh)) >= 0.5
        |          WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
        |edges AS (SELECT ia s, ib d FROM pairs UNION SELECT ib, ia FROM pairs),
        |reach AS (SELECT s, d FROM edges UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
        |SELECT s AS id, least(s, min(d)) AS cluster FROM reach GROUP BY s""".stripMargin,
    // SimHash rebuilt in SQL: md5-prefix word hash, occurrence-weighted ±1
    // per bit, then exact all-pairs hamming ≤ 3 (the Spark side's 4×16-bit
    // block LSH is exhaustive for hamming ≤ 3 by pigeonhole).
    // The LEFT JOIN + COALESCE keeps zero-token (empty/whitespace-only) docs
    // in the pair space with simhash 0, matching the Scala kernel — without
    // it such docs would silently vanish from the oracle's all-pairs.
    "q_dedup_simhash" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') ws FROM documents),
        |wordbits AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT h FROM (SELECT doc_id, unnest(ws) w FROM toks) u),
        |bitcnt AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) c
        |           FROM wordbits, (SELECT unnest(range(64)) b) bits GROUP BY doc_id, b),
        |sim0 AS (SELECT doc_id, CAST(sum(CASE WHEN c > 0 THEN (1::UBIGINT << b) ELSE 0::UBIGINT END) AS UBIGINT) s FROM bitcnt GROUP BY doc_id),
        |sim AS (SELECT d.doc_id, COALESCE(s0.s, 0::UBIGINT) s FROM documents d LEFT JOIN sim0 s0 ON d.doc_id = s0.doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
        |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.s, b.s)) <= 3""".stripMargin,
    // Exact all-pairs cosine ≥ 0.95 over the same planted-near-dup corpus
    // (DuckDB list_transform index is 1-based where Spark transform's is
    // 0-based; the +0.05 shift is computed in double and cast to REAL on both
    // sides so the float inputs to the cosine are bit-identical).
    // identical IEEE double ops both sides: x(float)→double, /scale,
    // +0.5, floor — no round() whose tie mode could differ
    "q_embed_quantize" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |         CASE WHEN mx = 0 THEN 1.0 ELSE CAST(mx AS DOUBLE) / 127.0 END AS scale
        |  FROM (SELECT vec_id, embedding,
        |               list_max(list_transform(embedding, x -> abs(x))) AS mx
        |        FROM embeddings))
        |SELECT vec_id, round(scale, 6) AS scale,
        |       CAST(list_sum(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))) AS BIGINT) AS q_sum,
        |       CAST(list_max(list_transform(embedding, x -> abs(floor(CAST(x AS DOUBLE) / scale + 0.5)))) AS INTEGER) AS q_absmax,
        |       len(embedding) AS n_dims
        |FROM q""".stripMargin,
    "q_embed_dedup" ->
      """WITH aug AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id,
        |         list_transform(embedding, (x, i) -> CASE WHEN i = 1 THEN CAST(CAST(x AS DOUBLE) + 0.05 AS REAL) ELSE x END) AS embedding
        |  FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cosine
        |FROM aug a JOIN aug b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.95""".stripMargin,
    // Stopword-count language ID replicated in SQL; CASE order = the Scala
    // kernel's first-strictly-greater tie-break.
    "q_lang_id" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\p{L}+') t FROM documents),
        |sc AS (SELECT doc_id,
        |  len(list_filter(t, w -> w IN ('the','and','of','to','in','is','that','it','was','for','with','are','this','not'))) s_en,
        |  len(list_filter(t, w -> w IN ('der','die','das','und','ist','nicht','ein','eine','mit','für','von','auf','dem','den'))) s_de,
        |  len(list_filter(t, w -> w IN ('le','la','les','et','est','pas','une','des','dans','pour','que','qui','sur','avec'))) s_fr,
        |  len(list_filter(t, w -> w IN ('el','la','los','las','y','es','no','una','en','por','para','con','del','se'))) s_es,
        |  len(list_filter(t, w -> w IN ('il','la','di','e','che','non','per','una','con','del','gli','nel','sono','come'))) s_it,
        |  len(list_filter(t, w -> w IN ('o','a','os','as','de','que','não','uma','em','por','para','com','do','da'))) s_pt,
        |  len(list_filter(t, w -> w IN ('yang','dan','di','itu','dengan','untuk','tidak','ini','dari','dalam','akan','pada','juga','ke'))) s_id,
        |  len(list_filter(t, w -> w IN ('de','het','een','en','van','is','dat','op','te','zijn','met','voor','niet','aan'))) s_nl
        | FROM toks)
        |SELECT doc_id, CASE WHEN m = 0 THEN 'und' WHEN s_en = m THEN 'en' WHEN s_de = m THEN 'de' WHEN s_fr = m THEN 'fr' WHEN s_es = m THEN 'es' WHEN s_it = m THEN 'it' WHEN s_pt = m THEN 'pt' WHEN s_id = m THEN 'id' ELSE 'nl' END AS lang_pred
        |FROM (SELECT *, greatest(s_en, s_de, s_fr, s_es, s_it, s_pt, s_id, s_nl) m FROM sc) x""".stripMargin,
    // Winnowing fingerprint: min md5-prefix (16 lowercase hex chars — string
    // min ≡ unsigned numeric min) over all 16-char windows.
    "q_fingerprint_rolling" ->
      """SELECT doc_id, CASE WHEN length(text) < 16 THEN substr(md5(text), 1, 16)
        |  ELSE list_aggregate([substr(md5(substring(text, i, 16)), 1, 16) for i in range(1, length(text) - 14)], 'min') END AS fp
        |FROM documents""".stripMargin,
    "q_ngram_jaccard" ->
      "SELECT a.doc_id AS id_a, b.doc_id AS id_b, round(CAST(len(list_intersect(string_split(a.text, ' '), string_split(b.text, ' '))) AS DOUBLE) / len(list_distinct(list_concat(string_split(a.text, ' '), string_split(b.text, ' ')))), 4) AS jac FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1",
    "q_ann_bruteforce" ->
      "SELECT e.vec_id AS id, round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 4) AS cosine FROM embeddings e ORDER BY cosine DESC, id LIMIT 10",
    // exact squared L2 to the vec_id=0 query over the pinned sub-corpus:
    // what the degenerate IVF-PQ configuration computes through the
    // centroid-partitioned store + ADC table (1-based lambda index in
    // DuckDB list_transform matches the 1-based list element access)
    "q_ivf_pq" ->
      """SELECT e.vec_id AS id,
        |       round(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]),
        |             (x, i) -> (x - q.emb[i]) * (x - q.emb[i]))), 6) AS adc_dist
        |FROM embeddings e
        |CROSS JOIN (SELECT CAST(embedding AS DOUBLE[]) AS emb
        |            FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id < 200
        |ORDER BY adc_dist, id LIMIT 10""".stripMargin,
    // IVF-OPQ: the exact-rescore top-10 — identical arithmetic to the
    // q_ivf_pq replay; the OPQ store only has to SELECT a candidate
    // superset, which the degenerate-exact ADC guarantees
    "q_ivf_opq" ->
      """SELECT e.vec_id AS id,
        |       round(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]),
        |             (x, i) -> (x - q.emb[i]) * (x - q.emb[i]))), 6) AS l2_dist
        |FROM embeddings e
        |CROSS JOIN (SELECT CAST(embedding AS DOUBLE[]) AS emb
        |            FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id < 200
        |ORDER BY l2_dist, id LIMIT 10""".stripMargin,
    // Brute-force top-10 over the planted-neighbor corpus — equals the LSH
    // result because every true top-10 member is a planted near-copy of the
    // query (cosine ≥ 0.9998) whose bucket lies within one probe of the
    // query bucket (deterministic; asserted in PipelineOpsSpec too).
    "q_ann_lsh" ->
      """WITH aug AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT 200000 + j AS vec_id,
        |         list_transform(embedding, (x, i) -> CASE WHEN i = j + 1 THEN CAST(CAST(x AS DOUBLE) + CAST(0.002 AS DOUBLE) * (j + 1) AS REAL) ELSE x END) AS embedding
        |  FROM embeddings, range(16) t(j) WHERE vec_id = 0)
        |SELECT vec_id AS id,
        |       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 4) AS cosine
        |FROM aug ORDER BY cosine DESC, id LIMIT 10""".stripMargin,
    "q_knn_join" ->
      "SELECT qid, id, cosine FROM (SELECT qid, id, cosine, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, id) AS rn FROM (SELECT q.vec_id AS qid, c.vec_id AS id, round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 4) AS cosine FROM embeddings q, embeddings c WHERE q.vec_id < 10) p) t WHERE rn <= 5",
    "q_text_quality" ->
      """SELECT doc_id, length(text) AS n_chars2, len(string_split(trim(text), ' ')) AS n_tokens_ws, round(CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / length(text), 4) AS punct_ratio, round(CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN ('the', 'and', 'of', 'to', 'in', 'is'))) AS DOUBLE) / len(string_split(text, ' ')), 4) AS stop_ratio FROM documents""",
    "q_token_count" ->
      """SELECT doc_id, len(string_split(trim(text), ' ')) AS n_ws, len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+')) AS n_bpe FROM documents""",
    // duplicate-line fraction over trimmed non-blank lines; top-token share
    // over lowercased single-space tokens — list math mirrors the kernels
    "q_repetition" ->
      """SELECT doc_id,
        |  floor((CASE WHEN nlines = 0 THEN 0.0 ELSE 1.0 - ndistinct / nlines END) * 10000 + 0.5) / 10000 AS dup_line_frac,
        |  floor((CASE WHEN ntok = 0 THEN 0.0 ELSE maxcnt / ntok END) * 10000 + 0.5) / 10000 AS top_tok_frac
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(lines) AS DOUBLE) AS nlines,
        |    CAST(len(list_distinct(lines)) AS DOUBLE) AS ndistinct,
        |    CAST(len(toks) AS DOUBLE) AS ntok,
        |    CAST(coalesce(list_max(list_transform(list_distinct(toks),
        |           w -> len(list_filter(toks, x -> x = w)))), 0) AS DOUBLE) AS maxcnt
        |  FROM (
        |    SELECT doc_id,
        |      list_filter(list_transform(string_split(replace(text, ' a ', chr(10)), chr(10)), l -> trim(l)), l -> l <> '') AS lines,
        |      list_filter(string_split(lower(text), ' '), w -> w <> '') AS toks
        |    FROM documents) raw) agg""".stripMargin,
    "q_redact_pii" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    text || ' contact user' || CAST(doc_id % 7 AS VARCHAR) || '@mail.example.com or 555-123-4567 via https://ex.com/p/' || CAST(doc_id AS VARCHAR),
        |    'https?://[^\s]+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS clean
        |FROM documents""".stripMargin,
    "q_token_topk" ->
      "SELECT token, count(*) AS freq FROM (SELECT unnest(string_split(lower(trim(text)), ' ')) AS token FROM documents) t WHERE token <> '' GROUP BY token ORDER BY freq DESC, token LIMIT 20",
    "q_bigrams" ->
      "SELECT bigram, count(*) AS freq FROM (SELECT unnest(ws[1:len(ws)-1]) || ' ' || unnest(ws[2:len(ws)]) AS bigram FROM (SELECT string_split(lower(trim(text)), ' ') AS ws FROM documents) s) t GROUP BY bigram ORDER BY freq DESC, bigram LIMIT 20",
    "q_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp FROM documents""",
    // same tokenization as q_lm_score's ws CTE; ws[i:i+3] is DuckDB's
    // 1-based INCLUSIVE slice = 4 words; range(1, len-2) is empty for
    // docs shorter than 4 words, mirroring wordNgrams' guard
    // the engine compares 60-bit md5 window hashes (never the n-gram
    // strings); the oracle reproduces the identical hash, so even a
    // collision would be seen identically on both sides
    "q_decontaminate" ->
      """WITH ws AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), w -> w <> '') ws FROM documents),
        |ng AS (SELECT DISTINCT doc_id, CAST(concat('0x', substr(md5(array_to_string(ws[i:i+3], ' ')), 1, 15)) AS BIGINT) AS h
        |       FROM (SELECT doc_id, ws, unnest(range(1, greatest(len(ws) - 2, 1))) AS i FROM ws)),
        |bench AS (SELECT DISTINCT h FROM ng WHERE doc_id % 20 = 0)
        |SELECT g.doc_id, count(*) AS hit_ngrams
        |FROM ng g JOIN bench b ON g.h = b.h
        |WHERE g.doc_id % 20 <> 0
        |GROUP BY g.doc_id""".stripMargin,
    "q_url_normalize" ->
      """SELECT c_custkey,
        |       concat('http://c', c_custkey, '.example.com/p/', c_custkey % 7,
        |              '?a=1&z=', c_custkey) AS url_norm,
        |       'example.com' AS domain
        |FROM customer""".stripMargin,
    // the identical extraction chain in DuckDB: same patterns (inline
    // (?is) flags + 'g'), same entity order, same whitespace class
    "q_html_text" ->
      """WITH h AS (SELECT doc_id,
        |  concat('<html><head><title>d</title><style>p { color: red; }</style>',
        |         '<script>if (1 < 2) { alert("x"); }</script></head>',
        |         '<body><!-- boilerplate --><h1>Doc&nbsp;', doc_id,
        |         '</h1><p class="main">', text, '</p></body></html>') AS html
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g') x FROM h),
        |s2 AS (SELECT doc_id, regexp_replace(x, '(?is)<style[^>]*>.*?</style>', ' ', 'g') x FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(x, '(?s)<!--.*?-->', ' ', 'g') x FROM s2),
        |s4 AS (SELECT doc_id, regexp_replace(x, '<[^>]+>', ' ', 'g') x FROM s3),
        |s5 AS (SELECT doc_id, replace(replace(replace(replace(replace(replace(replace(x,
        |         '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |         '&#39;', ''''), '&apos;', ''''), '&amp;', '&') x FROM s4)
        |SELECT doc_id, trim(regexp_replace(x, '[ \t\r\n\f]+', ' ', 'g')) AS clean FROM s5""".stripMargin,
    // DSIR weights rebuilt in SQL: identical md5 gram hashing (unigram =
    // md5(word), bigram = md5('w1 w2') — the kernel's space-joined
    // windows), identical add-one smoothing, and per-(doc, bucket)
    // counts × log-ratio so both engines sum the same terms
    "q_dsir" ->
      """WITH ws AS (SELECT doc_id, lang, list_filter(string_split_regex(lower(trim(text)), '\s+'), w -> w <> '') ws FROM documents),
        |g1 AS (SELECT doc_id, lang, CAST(concat('0x', substr(md5(ws[i]), 1, 15)) AS BIGINT) % 10000 AS b
        |       FROM (SELECT doc_id, lang, ws, unnest(range(1, len(ws) + 1)) AS i FROM ws)),
        |g2 AS (SELECT doc_id, lang, CAST(concat('0x', substr(md5(concat(ws[i], ' ', ws[i+1])), 1, 15)) AS BIGINT) % 10000 AS b
        |       FROM (SELECT doc_id, lang, ws, unnest(range(1, greatest(len(ws), 1))) AS i FROM ws)),
        |g AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2),
        |tc AS (SELECT b, count(*) c FROM g WHERE lang = 'en' GROUP BY b),
        |rc AS (SELECT b, count(*) c FROM g GROUP BY b),
        |tt AS (SELECT count(*) t FROM g WHERE lang = 'en'),
        |rt AS (SELECT count(*) t FROM g),
        |lr AS (SELECT rc.b, ln((COALESCE(tc.c, 0) + 1.0) / ((SELECT t FROM tt) + 10000)) -
        |              ln((rc.c + 1.0) / ((SELECT t FROM rt) + 10000)) AS lr
        |       FROM rc LEFT JOIN tc ON rc.b = tc.b),
        |db AS (SELECT doc_id, b, count(*) c FROM g GROUP BY doc_id, b),
        |sc AS (SELECT db.doc_id, sum(db.c * lr.lr) w FROM db JOIN lr ON db.b = lr.b GROUP BY db.doc_id)
        |SELECT d.doc_id, round(COALESCE(sc.w, 0.0), 4) + 0.0 AS dsir_w
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin,
    "q_quality_filter" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars2 FROM documents
        |WHERE length(text) BETWEEN 200 AND 1000000
        |  AND len(string_split_regex(trim(text), '\s+')) >= 5
        |  AND CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE) / length(text) <= 0.3
        |  AND CAST(list_aggregate(list_transform(string_split_regex(trim(text), '\s+'), w -> length(w)), 'sum') AS DOUBLE)
        |      / len(string_split_regex(trim(text), '\s+')) BETWEEN 2.0 AND 12.0""".stripMargin,
    // Bigram LM rebuilt in SQL: same tokenization, same deterministic top-K
    // cutoff, add-one-smoothed mean log-prob; docs with < 2 tokens score 0.
    "q_lm_score" ->
      """WITH ws AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), w -> w <> '') ws FROM documents),
        |uni AS (SELECT w, count(*) n FROM (SELECT unnest(ws) w FROM ws) GROUP BY w ORDER BY n DESC, w LIMIT 20000),
        |bg AS (SELECT w1, w2, count(*) n FROM (SELECT unnest(ws[1:len(ws)-1]) w1, unnest(ws[2:len(ws)]) w2 FROM ws) GROUP BY w1, w2 ORDER BY n DESC, w1, w2 LIMIT 20000),
        |v AS (SELECT count(*) v FROM uni),
        |docbg AS (SELECT doc_id, unnest(ws[1:len(ws)-1]) w1, unnest(ws[2:len(ws)]) w2 FROM ws WHERE len(ws) >= 2),
        |sc AS (SELECT doc_id, avg(ln((COALESCE(b.n, 0) + 1.0) / (COALESCE(u.n, 0) + (SELECT v FROM v)))) s
        |       FROM docbg LEFT JOIN bg b ON docbg.w1 = b.w1 AND docbg.w2 = b.w2
        |                  LEFT JOIN uni u ON docbg.w1 = u.w
        |       GROUP BY doc_id)
        |SELECT d.doc_id, round(COALESCE(sc.s, 0.0), 4) AS lm
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin,
    // q_lm_score's scoring CTEs + the textbook single-node ntile window —
    // the distributed ntileByGroup must reproduce it exactly
    "q_ccnet_buckets" ->
      """WITH ws AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), w -> w <> '') ws FROM documents),
        |uni AS (SELECT w, count(*) n FROM (SELECT unnest(ws) w FROM ws) GROUP BY w ORDER BY n DESC, w LIMIT 20000),
        |bg AS (SELECT w1, w2, count(*) n FROM (SELECT unnest(ws[1:len(ws)-1]) w1, unnest(ws[2:len(ws)]) w2 FROM ws) GROUP BY w1, w2 ORDER BY n DESC, w1, w2 LIMIT 20000),
        |v AS (SELECT count(*) v FROM uni),
        |docbg AS (SELECT doc_id, unnest(ws[1:len(ws)-1]) w1, unnest(ws[2:len(ws)]) w2 FROM ws WHERE len(ws) >= 2),
        |sc AS (SELECT doc_id, avg(ln((COALESCE(b.n, 0) + 1.0) / (COALESCE(u.n, 0) + (SELECT v FROM v)))) s
        |       FROM docbg LEFT JOIN bg b ON docbg.w1 = b.w1 AND docbg.w2 = b.w2
        |                  LEFT JOIN uni u ON docbg.w1 = u.w
        |       GROUP BY doc_id),
        |scored AS (SELECT d.doc_id, d.lang, round(COALESCE(sc.s, 0.0), 4) AS lm
        |           FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id)
        |SELECT doc_id, lang,
        |       CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM (SELECT doc_id, lang,
        |             ntile(3) OVER (PARTITION BY lang ORDER BY lm DESC, doc_id) AS t
        |      FROM scored)""".stripMargin,
    // hashUniform replayed in DuckDB: first 8 md5 hex chars as u32 / 2^32
    "q_sample_hash" ->
      """SELECT doc_id, source FROM documents
        |WHERE CAST(concat('0x', substr(md5(concat('s1', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 < 0.25""".stripMargin,
    // A-ES weighted sample replay: ln(u)/w keys, n largest per group,
    // ties by id desc (the topk_agg struct order)
    "q_weighted_sample" ->
      """WITH k AS (SELECT doc_id, source,
        |                  ln(CAST(concat('0x', substr(md5(concat('wsample', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0)
        |                    / CAST(n_chars AS DOUBLE) AS key
        |           FROM documents
        |           WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0),
        |r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source ORDER BY key DESC, doc_id DESC) AS rn FROM k)
        |SELECT doc_id, source FROM r WHERE rn <= 10""".stripMargin,
    "q_docmix" ->
      """WITH dom AS (SELECT source, CAST(sum(n_chars) AS DOUBLE) AS dom_tokens FROM documents GROUP BY source),
        |rates AS (SELECT source, least(1.0, 6000.0 * (CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 2.0 ELSE 1.0 END) / dom_tokens) AS accept_rate FROM dom)
        |SELECT d.doc_id, d.source FROM documents d JOIN rates r ON d.source = r.source
        |WHERE CAST(concat('0x', substr(md5(concat('mix', CAST(d.doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 < r.accept_rate""".stripMargin,
    // greedy packing replayed as a lockstep recursive CTE: one recursion
    // step advances every source by one document (idx ordering = doc_id)
    "q_pack_sequences" ->
      """WITH RECURSIVE t AS (
        |  SELECT source, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS idx
        |  FROM documents),
        |pack AS (
        |  SELECT source, doc_id, n_chars, idx, n_chars AS running, CAST(0 AS BIGINT) AS bin
        |  FROM t WHERE idx = 1
        |  UNION ALL
        |  SELECT t.source, t.doc_id, t.n_chars, t.idx,
        |         CASE WHEN p.running + t.n_chars > 2000 THEN t.n_chars ELSE p.running + t.n_chars END,
        |         CASE WHEN p.running + t.n_chars > 2000 THEN p.bin + 1 ELSE p.bin END
        |  FROM pack p JOIN t ON t.source = p.source AND t.idx = p.idx + 1)
        |SELECT source, doc_id, n_chars, bin FROM pack""".stripMargin,
    // list_slice(ws, s, s+9) is 1-based inclusive = Spark slice(ws, s, 10);
    // the appended greatest(1, len-9) start is the end-anchored window that
    // guarantees tail coverage (deduplicated when the stride already hits it)
    "q_chunk_overlap" ->
      """SELECT doc_id, CAST(s.start AS BIGINT) AS start,
        |       array_to_string(list_slice(string_split(text, ' '), s.start, s.start + 9), ' ') AS chunk
        |FROM documents, LATERAL (
        |  SELECT unnest(list_distinct(list_append(
        |    generate_series(1, greatest(1, len(string_split(text, ' ')) - 9), 5),
        |    greatest(1, len(string_split(text, ' ')) - 9)))) AS start) s""".stripMargin,
    "q_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token FROM documents) t
        |  WHERE token <> '' GROUP BY doc_id, token)
        |SELECT token, round(sum(tf) * ln((SELECT CAST(count(*) AS DOUBLE) FROM documents) / count(*)), 4) AS tfidf
        |FROM tf GROUP BY token ORDER BY tfidf DESC, token LIMIT 25""".stripMargin,
    "q_split" ->
      """SELECT doc_id,
        |  CASE WHEN u < 0.75 THEN 'train' WHEN u < 0.875 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        CAST(concat('0x', substr(md5(concat('split', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 AS u
        |      FROM documents) t""".stripMargin,
    // same tokenization as q_lm_score; range(1, len-6) = 8-token windows;
    // the 60-bit md5-prefix fingerprint matches the engine's shuffle key
    "q_dup_spans" ->
      """WITH ws AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), w -> w <> '') ws FROM documents),
        |win AS (SELECT doc_id, CAST(concat('0x', substr(md5(array_to_string(ws[i:i+7], ' ')), 1, 15)) AS BIGINT) AS h
        |        FROM (SELECT doc_id, ws, unnest(range(1, greatest(len(ws) - 6, 1))) AS i FROM ws)),
        |dup AS (SELECT h FROM win GROUP BY h HAVING count(*) > 1)
        |SELECT w.doc_id, count(*) AS n_windows,
        |       CAST(sum(CASE WHEN d.h IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_dup_windows,
        |       round(CAST(sum(CASE WHEN d.h IS NULL THEN 0 ELSE 1 END) AS DOUBLE) / count(*), 4) AS dup_frac
        |FROM win w LEFT JOIN dup d ON w.h = d.h
        |GROUP BY w.doc_id""".stripMargin,
    // ExactSubstr removal: same 60-bit window fingerprints as q_dup_spans
    // (tokens split from the ORIGINAL text, lowercased per token for
    // hashing — reassembly keeps original case), keep-first = rn 1 over
    // (doc, pos), covered positions anti-join the token stream
    "q_dedup_spans_remove" ->
      """WITH ws AS (SELECT doc_id, list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'), w -> w <> '') AS ws FROM documents),
        |win AS (SELECT doc_id, i AS pos,
        |               CAST(concat('0x', substr(md5(array_to_string(list_transform(ws[i:i+7], t -> lower(t)), ' ')), 1, 15)) AS BIGINT) AS h
        |        FROM (SELECT doc_id, ws, unnest(range(1, greatest(len(ws) - 6, 1))) AS i FROM ws)),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn FROM win),
        |covered AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS i FROM ranked WHERE rn > 1),
        |toks AS (SELECT doc_id, unnest(ws) AS t, generate_subscripts(ws, 1) AS i FROM ws),
        |kept AS (SELECT t.doc_id, string_agg(t.t, ' ' ORDER BY t.i) AS txt, count(*) AS c
        |         FROM toks t LEFT JOIN covered cv ON t.doc_id = cv.doc_id AND t.i = cv.i
        |         WHERE cv.i IS NULL GROUP BY t.doc_id)
        |SELECT w.doc_id, coalesce(k.txt, '') AS text,
        |       len(w.ws) AS n_tokens, len(w.ws) - coalesce(k.c, 0) AS n_removed
        |FROM ws w LEFT JOIN kept k ON w.doc_id = k.doc_id""".stripMargin,
    // keep-first paragraph dedup over synthesized multi-paragraph pages:
    // rn=1 in (gid, pos) corpus order IS "the corpus-minimal occurrence"
    "q_paragraph_dedup" ->
      """WITH docs AS (SELECT doc_id % 50 AS gid,
        |                     string_agg(text, chr(10)||chr(10) ORDER BY doc_id)
        |                       || chr(10)||chr(10)
        |                       || (SELECT text FROM documents WHERE doc_id = 0) AS txt
        |              FROM documents GROUP BY 1),
        |paras AS (SELECT gid, unnest(ps) AS p, generate_subscripts(ps, 1) AS pos, len(ps) AS n
        |          FROM (SELECT gid, string_split(txt, chr(10)||chr(10)) AS ps FROM docs)),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY p ORDER BY gid, pos) AS rn FROM paras)
        |SELECT gid, string_agg(p, chr(10)||chr(10) ORDER BY pos) AS text,
        |       max(n) AS n_paras, max(n) - count(*) AS n_dropped
        |FROM ranked WHERE rn = 1 GROUP BY gid""".stripMargin,
    "q_stats_quantiles" ->
      """SELECT source, round(quantile_cont(n_chars, 0.5), 4) AS q50,
        |       round(quantile_cont(n_chars, 0.9), 4) AS q90,
        |       round(quantile_cont(n_chars, 0.99), 4) AS q99
        |FROM documents GROUP BY source""".stripMargin,
    "q_multimodal" ->
      "SELECT doc_id, CASE WHEN ascii(substr(text, 1, 1)) % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS mime, CAST(16 + (length(text) % 640) AS INTEGER) AS width, CAST(16 + ((length(text) // 7) % 480) AS INTEGER) AS height, CAST(length(text) AS BIGINT) AS n_bytes FROM documents",
    "q_video_meta" ->
      "SELECT doc_id, 'video/mp4' AS mime, CAST(160 + (doc_id % 8) * 160 AS INTEGER) AS width, CAST(90 + (doc_id % 8) * 90 AS INTEGER) AS height, CAST((doc_id % 300) + 0.5 AS DOUBLE) AS duration_sec FROM documents",
    "q_events_window" ->
      "SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n_events, round(sum(value), 3) AS sum_value FROM events GROUP BY 1, 2",
    // CAST(sum(..) AS BIGINT): DuckDB's integer sum returns HUGEINT, which
    // its client API surfaces as float64 → hash mismatch vs Spark's int64.
    "q_events_json" ->
      "SELECT event_type, CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, count(*) AS n FROM events GROUP BY event_type",
    "q_retention" ->
      """WITH e AS (SELECT DISTINCT user_id, CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS d
        |           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |f AS (SELECT user_id, min(d) AS cohort FROM e GROUP BY 1)
        |SELECT f.cohort, e.d - f.cohort AS period_index, count(*) AS active_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q_sessionize" ->
      "SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_ev FROM (SELECT user_id, CASE WHEN lag(ts) OVER w IS NULL OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800 THEN 1 ELSE 0 END AS new_session FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t GROUP BY user_id",
    "q_funnel" ->
      """WITH s1 AS (SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t2 FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND CAST(floor(epoch(e.ts)) AS BIGINT) > s1.t1
        |         AND CAST(floor(epoch(e.ts)) AS BIGINT) <= s1.t1 + 86400
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t3 FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND CAST(floor(epoch(e.ts)) AS BIGINT) > s2.t2
        |         AND CAST(floor(epoch(e.ts)) AS BIGINT) <= s2.t2 + 86400
        |       GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM s1) AS n_signup,
        |       (SELECT count(*) FROM s2) AS n_signup_click,
        |       (SELECT count(*) FROM s3) AS n_full_funnel""".stripMargin,
    "q_interval_join" ->
      """SELECT p.event_id, count(*) AS n_clicks, round(sum(c.value), 3) AS sum_v
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND CAST(floor(epoch(c.ts)) AS BIGINT)
        |     BETWEEN CAST(floor(epoch(p.ts)) AS BIGINT) - 3600 AND CAST(floor(epoch(p.ts)) AS BIGINT)
        |GROUP BY p.event_id""".stripMargin,
    // As-of join: correlated ORDER BY ... LIMIT 1 picks the same (second-
    // floored time, event_id) maximum the operator's tie ordering carries
    "q_asof_join" ->
      """SELECT p.event_id, p.user_id, CAST(floor(epoch(p.ts)) AS BIGINT) AS pt,
        |  (SELECT c.event_id FROM events c
        |    WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |      AND CAST(floor(epoch(c.ts)) AS BIGINT) <= CAST(floor(epoch(p.ts)) AS BIGINT)
        |      AND CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(c.ts)) AS BIGINT) <= 3600
        |    ORDER BY CAST(floor(epoch(c.ts)) AS BIGINT) DESC, c.event_id DESC LIMIT 1) AS click_id,
        |  (SELECT round(c.value, 3) FROM events c
        |    WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |      AND CAST(floor(epoch(c.ts)) AS BIGINT) <= CAST(floor(epoch(p.ts)) AS BIGINT)
        |      AND CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(c.ts)) AS BIGINT) <= 3600
        |    ORDER BY CAST(floor(epoch(c.ts)) AS BIGINT) DESC, c.event_id DESC LIMIT 1) AS click_value
        |FROM events p WHERE p.event_type = 'purchase'""".stripMargin,
    // nearest replay: min (|d|, side backward-first, and inside one side
    // at fixed d the click time is fixed, so the tie is click_id — max
    // for backward, min for forward (one negated ORDER BY key)
    "q_asof_nearest" ->
      """SELECT p.event_id, p.user_id, CAST(floor(epoch(p.ts)) AS BIGINT) AS pt,
        |  (SELECT c.event_id FROM events c
        |    WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |      AND abs(CAST(floor(epoch(c.ts)) AS BIGINT) - CAST(floor(epoch(p.ts)) AS BIGINT)) <= 3600
        |    ORDER BY abs(CAST(floor(epoch(c.ts)) AS BIGINT) - CAST(floor(epoch(p.ts)) AS BIGINT)),
        |      (CAST(floor(epoch(c.ts)) AS BIGINT) > CAST(floor(epoch(p.ts)) AS BIGINT)),
        |      CASE WHEN CAST(floor(epoch(c.ts)) AS BIGINT) <= CAST(floor(epoch(p.ts)) AS BIGINT)
        |           THEN -c.event_id ELSE c.event_id END
        |    LIMIT 1) AS click_id,
        |  (SELECT round(c.value, 3) FROM events c
        |    WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |      AND abs(CAST(floor(epoch(c.ts)) AS BIGINT) - CAST(floor(epoch(p.ts)) AS BIGINT)) <= 3600
        |    ORDER BY abs(CAST(floor(epoch(c.ts)) AS BIGINT) - CAST(floor(epoch(p.ts)) AS BIGINT)),
        |      (CAST(floor(epoch(c.ts)) AS BIGINT) > CAST(floor(epoch(p.ts)) AS BIGINT)),
        |      CASE WHEN CAST(floor(epoch(c.ts)) AS BIGINT) <= CAST(floor(epoch(p.ts)) AS BIGINT)
        |           THEN -c.event_id ELSE c.event_id END
        |    LIMIT 1) AS click_value
        |FROM events p WHERE p.event_type = 'purchase'""".stripMargin,
    "q_asof_forward" ->
      """SELECT s.event_id, s.user_id, CAST(floor(epoch(s.ts)) AS BIGINT) AS st,
        |  (SELECT c.event_id FROM events c
        |    WHERE c.event_type = 'click' AND c.user_id = s.user_id
        |      AND CAST(floor(epoch(c.ts)) AS BIGINT) >= CAST(floor(epoch(s.ts)) AS BIGINT)
        |      AND CAST(floor(epoch(c.ts)) AS BIGINT) - CAST(floor(epoch(s.ts)) AS BIGINT) <= 7200
        |    ORDER BY CAST(floor(epoch(c.ts)) AS BIGINT) ASC, c.event_id ASC LIMIT 1) AS click_id,
        |  (SELECT CAST(floor(epoch(c.ts)) AS BIGINT) - CAST(floor(epoch(s.ts)) AS BIGINT) FROM events c
        |    WHERE c.event_type = 'click' AND c.user_id = s.user_id
        |      AND CAST(floor(epoch(c.ts)) AS BIGINT) >= CAST(floor(epoch(s.ts)) AS BIGINT)
        |      AND CAST(floor(epoch(c.ts)) AS BIGINT) - CAST(floor(epoch(s.ts)) AS BIGINT) <= 7200
        |    ORDER BY CAST(floor(epoch(c.ts)) AS BIGINT) ASC, c.event_id ASC LIMIT 1) AS lag_sec
        |FROM events s WHERE s.event_type = 'signup'""".stripMargin,
    "q_range_join" ->
      """SELECT s_suppkey, count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
        |FROM supplier JOIN customer
        |  ON c_acctbal >= s_acctbal AND c_acctbal <= s_acctbal + 500
        |GROUP BY s_suppkey""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
        |       coalesce(l_linestatus, '(all)') AS ls,
        |       CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |       CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |       count(*) AS cnt, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
        |       coalesce(l_linestatus, '(all)') AS ls,
        |       CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |       CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |       count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
        |       coalesce(l_linestatus, '(all)') AS ls,
        |       CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |       CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |       count(*) AS cnt, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderstatus,
        |       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p_urgent,
        |       CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p_high,
        |       CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p_medium,
        |       round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END), 2) AS urgent_value
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_moving_avg" ->
      """SELECT d, n, round(avg(v) OVER w, 2) AS ma7,
        |       CAST(sum(n) OVER w AS BIGINT) AS n7
        |FROM (SELECT date_trunc('day', o_orderdate) AS d, count(*) AS n,
        |             sum(o_totalprice) AS v
        |      FROM orders GROUP BY 1) t
        |WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)""".stripMargin,
    "q_string_funcs" ->
      """SELECT c_custkey,
        |       upper(c_mktsegment) AS seg_u,
        |       length(c_name) AS name_len,
        |       substr(c_name, 1, 8) AS name_pre,
        |       replace(c_name, '0', '#') AS name_rep,
        |       lpad(CAST(c_nationkey AS STRING), 4, '0') AS nk_pad,
        |       reverse(c_mktsegment) AS seg_rev,
        |       levenshtein(c_mktsegment, 'MACHINERY') AS lev,
        |       concat(upper(substr(lower(c_mktsegment), 1, 1)),
        |              substr(lower(c_mktsegment), 2)) AS seg_cap,
        |       ascii(c_name) AS first_code
        |FROM customer""".stripMargin,
    "q_window_percentile" ->
      """SELECT o_orderkey AS okey,
        |       round(percent_rank() OVER w, 6) AS pr,
        |       round(cume_dist() OVER w, 6) AS cd,
        |       dense_rank() OVER w AS drnk,
        |       round(sum(o_totalprice) OVER
        |         (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |          RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 2) AS rng_sum
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""".stripMargin,
    "q_recursive_cte" ->
      """WITH RECURSIVE months(mon) AS (
        |  SELECT CAST('1995-01-01' AS DATE)
        |  UNION ALL
        |  SELECT CAST(mon + INTERVAL '1' MONTH AS DATE) FROM months
        |  WHERE mon < CAST('2001-08-01' AS DATE))
        |SELECT CAST(mon AS STRING) AS mon_s, count(o_orderkey) AS n_orders,
        |       round(coalesce(sum(o_totalprice), 0), 2) AS revenue
        |FROM months LEFT JOIN orders
        |  ON CAST(date_trunc('month', o_orderdate) AS DATE) = mon
        |GROUP BY mon""".stripMargin,
    "q_window_lag" ->
      """SELECT o_orderkey AS okey, o_custkey AS ckey,
        |       round(o_totalprice - lag(o_totalprice) OVER w, 2) AS delta_prev,
        |       round(lead(o_totalprice) OVER w, 2) AS next_price,
        |       round(first_value(o_totalprice) OVER w, 2) AS first_price,
        |       ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    // gap-fill: the declarative replay — grid via generate_series, fill
    // via IGNORE NULLS running last_value over the grid join
    "q_gap_fill" ->
      """WITH obs AS (SELECT event_type AS k,
        |         CAST(floor(epoch(ts)) AS BIGINT) // 300 * 300 AS t,
        |         sum(value) AS v
        |       FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |b AS (SELECT k, min(t) AS lo, max(t) AS hi FROM obs GROUP BY k),
        |grid AS (SELECT k, unnest(generate_series(lo, hi, 300)) AS t FROM b),
        |f AS (SELECT g.k, g.t,
        |        last_value(o.v IGNORE NULLS) OVER w AS v,
        |        last_value(o.t IGNORE NULLS) OVER w AS src_t
        |      FROM grid g LEFT JOIN obs o ON g.k = o.k AND g.t = o.t
        |      WINDOW w AS (PARTITION BY g.k ORDER BY g.t))
        |SELECT k, t, src_t, round(v, 3) AS v_fill, (t = src_t) AS observed
        |FROM f""".stripMargin,
    // SCD2: lag collapses no-op changes, lead closes the intervals; both
    // windows share one (key × (date, orderkey)) ordering
    "q_scd2" ->
      """WITH log AS (SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS t,
        |         o_orderpriority AS prio, o_orderkey AS tie FROM orders),
        |m AS (SELECT k, t, prio, tie,
        |        lag(prio) OVER (PARTITION BY k ORDER BY t, tie) AS pp FROM log),
        |c AS (SELECT k, t, prio, tie FROM m
        |      WHERE pp IS NULL OR prio IS DISTINCT FROM pp)
        |SELECT k, prio, CAST(t AS VARCHAR) AS valid_from,
        |       CAST(lead(t) OVER (PARTITION BY k ORDER BY t, tie) AS VARCHAR) AS valid_to,
        |       (lead(t) OVER (PARTITION BY k ORDER BY t, tie) IS NULL) AS is_current
        |FROM c""".stripMargin,
    // CDC merge: winner per key by (seq, op, payloads) descending with
    // nulls low — the same total order Spark's max(struct(...)) applies
    "q_merge_upsert" ->
      """WITH changes AS (
        |  SELECT doc_id, CAST(2 AS BIGINT) AS seq, 'U' AS op,
        |         text || ' [rev2]' AS text, lang
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END, 'D',
        |         NULL, NULL
        |  FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, 1, 'I',
        |         'new doc ' || CAST(doc_id AS VARCHAR), 'en'
        |  FROM documents WHERE doc_id < 50),
        |w AS (SELECT doc_id, op, text, lang,
        |        row_number() OVER (PARTITION BY doc_id
        |          ORDER BY seq DESC NULLS LAST, op DESC NULLS LAST,
        |                   text DESC NULLS LAST, lang DESC NULLS LAST) AS rn
        |      FROM changes),
        |win AS (SELECT * FROM w WHERE rn = 1)
        |SELECT coalesce(s.doc_id, win.doc_id) AS doc_id,
        |       CASE WHEN win.op IS NOT NULL THEN win.text ELSE s.text END AS text,
        |       CASE WHEN win.op IS NOT NULL THEN win.lang ELSE s.lang END AS lang
        |FROM documents s FULL OUTER JOIN win ON s.doc_id = win.doc_id
        |WHERE win.op IS NULL OR win.op <> 'D'""".stripMargin,
    // compaction identity: the compacted read must equal the source
    "q_compact" ->
      """SELECT doc_id, text, lang, CAST(doc_id % 4 AS INTEGER) AS p
        |FROM documents""".stripMargin,
    // sink-layout compaction identity: the three bucket-split insert
    // batches cover every document exactly once, so the compacted +
    // vacuumed snapshot must equal the plain table (the bucket routing
    // is Spark-side only — no xxhash64 needed here)
    "q_compact_sink" -> "SELECT doc_id, text, lang FROM documents",
    // time travel AS OF batch 1 = the two-batch fold: state after the
    // even inserts with the %6 updates and %10 deletes applied (%30 keys
    // carry both at equal seq — op 'U' > 'D' in the winner order); the
    // batch-2 wipe-out must be invisible at version 1
    "q_upsert_time_travel" ->
      """WITH s0 AS (SELECT doc_id, text, lang FROM documents WHERE doc_id % 2 = 0),
        |b1 AS (SELECT doc_id, 2 AS seq, 'U' AS op,
        |              text || ' [v2]' AS text, lang
        |       FROM documents WHERE doc_id % 6 = 0
        |       UNION ALL
        |       SELECT doc_id, 2, 'D', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |       FROM documents WHERE doc_id % 10 = 0),
        |w1 AS (SELECT doc_id, op, text, lang,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY seq DESC NULLS LAST, op DESC NULLS LAST,
        |                    text DESC NULLS LAST, lang DESC NULLS LAST) AS rn
        |       FROM b1),
        |w AS (SELECT doc_id, op, text, lang FROM w1 WHERE rn = 1)
        |SELECT coalesce(s0.doc_id, w.doc_id) AS doc_id,
        |       CASE WHEN w.op IS NOT NULL THEN w.text ELSE s0.text END AS text,
        |       CASE WHEN w.op IS NOT NULL THEN w.lang ELSE s0.lang END AS lang
        |FROM s0 FULL OUTER JOIN w ON s0.doc_id = w.doc_id
        |WHERE w.op IS NULL OR w.op <> 'D'""".stripMargin,
    // the SQL-front-door time travel reads the same version-1 state, so
    // it shares the API gate's oracle verbatim
    "q_time_travel_sql" ->
      """WITH s0 AS (SELECT doc_id, text, lang FROM documents WHERE doc_id % 2 = 0),
        |b1 AS (SELECT doc_id, 2 AS seq, 'U' AS op,
        |              text || ' [v2]' AS text, lang
        |       FROM documents WHERE doc_id % 6 = 0
        |       UNION ALL
        |       SELECT doc_id, 2, 'D', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |       FROM documents WHERE doc_id % 10 = 0),
        |w1 AS (SELECT doc_id, op, text, lang,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY seq DESC NULLS LAST, op DESC NULLS LAST,
        |                    text DESC NULLS LAST, lang DESC NULLS LAST) AS rn
        |       FROM b1),
        |w AS (SELECT doc_id, op, text, lang FROM w1 WHERE rn = 1)
        |SELECT coalesce(s0.doc_id, w.doc_id) AS doc_id,
        |       CASE WHEN w.op IS NOT NULL THEN w.text ELSE s0.text END AS text,
        |       CASE WHEN w.op IS NOT NULL THEN w.lang ELSE s0.lang END AS lang
        |FROM s0 FULL OUTER JOIN w ON s0.doc_id = w.doc_id
        |WHERE w.op IS NULL OR w.op <> 'D'""".stripMargin,
    // point lookup = the two-batch fold (same state the time-travel
    // oracle reads at version 1 — here it IS the current state, no b2)
    // restricted to the probed keys: 2 lives, 6 carries [v2], 10 was
    // deleted, 123456789 never existed
    "q_upsert_point_lookup" ->
      """WITH s0 AS (SELECT doc_id, text, lang FROM documents WHERE doc_id % 2 = 0),
        |b1 AS (SELECT doc_id, 2 AS seq, 'U' AS op,
        |              text || ' [v2]' AS text, lang
        |       FROM documents WHERE doc_id % 6 = 0
        |       UNION ALL
        |       SELECT doc_id, 2, 'D', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |       FROM documents WHERE doc_id % 10 = 0),
        |w1 AS (SELECT doc_id, op, text, lang,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY seq DESC NULLS LAST, op DESC NULLS LAST,
        |                    text DESC NULLS LAST, lang DESC NULLS LAST) AS rn
        |       FROM b1),
        |w AS (SELECT doc_id, op, text, lang FROM w1 WHERE rn = 1)
        |SELECT coalesce(s0.doc_id, w.doc_id) AS doc_id,
        |       CASE WHEN w.op IS NOT NULL THEN w.text ELSE s0.text END AS text,
        |       CASE WHEN w.op IS NOT NULL THEN w.lang ELSE s0.lang END AS lang
        |FROM s0 FULL OUTER JOIN w ON s0.doc_id = w.doc_id
        |WHERE (w.op IS NULL OR w.op <> 'D')
        |  AND coalesce(s0.doc_id, w.doc_id) IN (2, 6, 10, 123456789)""".stripMargin,
    // table scan = the same two-batch fold restricted to the view
    // query's WHERE: 4 lives untouched, 12 carries [v2], 30 is the
    // equal-seq D/U tie (update wins), 123456789 never existed; the
    // residual lang IS NOT NULL re-applies above the pruned scan
    "q_upsert_table_scan" ->
      """WITH s0 AS (SELECT doc_id, text, lang FROM documents WHERE doc_id % 2 = 0),
        |b1 AS (SELECT doc_id, 2 AS seq, 'U' AS op,
        |              text || ' [v2]' AS text, lang
        |       FROM documents WHERE doc_id % 6 = 0
        |       UNION ALL
        |       SELECT doc_id, 2, 'D', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |       FROM documents WHERE doc_id % 10 = 0),
        |w1 AS (SELECT doc_id, op, text, lang,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY seq DESC NULLS LAST, op DESC NULLS LAST,
        |                    text DESC NULLS LAST, lang DESC NULLS LAST) AS rn
        |       FROM b1),
        |w AS (SELECT doc_id, op, text, lang FROM w1 WHERE rn = 1)
        |SELECT coalesce(s0.doc_id, w.doc_id) AS doc_id,
        |       CASE WHEN w.op IS NOT NULL THEN w.text ELSE s0.text END AS text,
        |       CASE WHEN w.op IS NOT NULL THEN w.lang ELSE s0.lang END AS lang
        |FROM s0 FULL OUTER JOIN w ON s0.doc_id = w.doc_id
        |WHERE (w.op IS NULL OR w.op <> 'D')
        |  AND coalesce(s0.doc_id, w.doc_id) IN (4, 12, 30, 123456789)
        |  AND (CASE WHEN w.op IS NOT NULL THEN w.lang ELSE s0.lang END)
        |      IS NOT NULL""".stripMargin,
    // changefeed v0→v1 = the v1 fold full-outer-diffed against the v0
    // state: fresh +3000000 keys classify insert, %10 losers delete
    // (post-image NULLs), %6 winners (incl. the %30 tie) update
    "q_upsert_changefeed" ->
      """WITH s0 AS (SELECT doc_id, text, lang FROM documents WHERE doc_id % 2 = 0),
        |b1 AS (SELECT doc_id, 2 AS seq, 'U' AS op,
        |              text || ' [v2]' AS text, lang
        |       FROM documents WHERE doc_id % 6 = 0
        |       UNION ALL
        |       SELECT doc_id, 2, 'D', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |       FROM documents WHERE doc_id % 10 = 0
        |       UNION ALL
        |       SELECT doc_id + 3000000, 2, 'I', 'cf ' || text, lang
        |       FROM documents WHERE doc_id < 40),
        |w1 AS (SELECT doc_id, op, text, lang,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY seq DESC NULLS LAST, op DESC NULLS LAST,
        |                    text DESC NULLS LAST, lang DESC NULLS LAST) AS rn
        |       FROM b1),
        |w AS (SELECT doc_id, op, text, lang FROM w1 WHERE rn = 1),
        |v1 AS (SELECT coalesce(s0.doc_id, w.doc_id) AS doc_id,
        |         CASE WHEN w.op IS NOT NULL THEN w.text ELSE s0.text END AS text,
        |         CASE WHEN w.op IS NOT NULL THEN w.lang ELSE s0.lang END AS lang
        |       FROM s0 FULL OUTER JOIN w ON s0.doc_id = w.doc_id
        |       WHERE w.op IS NULL OR w.op <> 'D')
        |SELECT coalesce(v1.doc_id, s0.doc_id) AS doc_id,
        |       CASE WHEN s0.doc_id IS NULL THEN 'insert'
        |            WHEN v1.doc_id IS NULL THEN 'delete'
        |            ELSE 'update' END AS _change_type,
        |       v1.text AS text, v1.lang AS lang
        |FROM s0 FULL OUTER JOIN v1 ON s0.doc_id = v1.doc_id
        |WHERE s0.doc_id IS NULL OR v1.doc_id IS NULL
        |   OR s0.text IS DISTINCT FROM v1.text
        |   OR s0.lang IS DISTINCT FROM v1.lang""".stripMargin,
    // schema evolution: the evens with lang NULL except where the
    // widening %6 update batch set it
    "q_upsert_schema_evolution" ->
      """SELECT doc_id, text,
        |       CASE WHEN doc_id % 6 = 0 THEN lang END AS lang
        |FROM documents WHERE doc_id % 2 = 0""".stripMargin,
    // incremental matview = GROUP BY over the two-batch fold (winner
    // per key by the same (seq, op, payloads) DESC NULLS LAST order;
    // payload order lang, tlen); the %30 equal-seq D/U tie resolves U
    "q_incremental_matview" ->
      """WITH s0 AS (SELECT doc_id, lang,
        |              CAST(length(text) AS BIGINT) AS tlen
        |            FROM documents WHERE doc_id % 2 = 0),
        |b1 AS (SELECT doc_id, 2 AS seq, 'U' AS op, lang,
        |              CAST(length(text) + 5 AS BIGINT) AS tlen
        |       FROM documents WHERE doc_id % 6 = 0
        |       UNION ALL
        |       SELECT doc_id, 2, 'D', CAST(NULL AS VARCHAR),
        |              CAST(NULL AS BIGINT)
        |       FROM documents WHERE doc_id % 10 = 0
        |       UNION ALL
        |       SELECT doc_id + 3000000, 2, 'I', 'x' || lang,
        |              CAST(length(text) AS BIGINT)
        |       FROM documents WHERE doc_id < 40),
        |w1 AS (SELECT doc_id, op, lang, tlen,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY seq DESC NULLS LAST, op DESC NULLS LAST,
        |                    lang DESC NULLS LAST, tlen DESC NULLS LAST) AS rn
        |       FROM b1),
        |w AS (SELECT doc_id, op, lang, tlen FROM w1 WHERE rn = 1),
        |v1 AS (SELECT
        |         CASE WHEN w.op IS NOT NULL THEN w.lang ELSE s0.lang END AS lang,
        |         CASE WHEN w.op IS NOT NULL THEN w.tlen ELSE s0.tlen END AS tlen
        |       FROM s0 FULL OUTER JOIN w ON s0.doc_id = w.doc_id
        |       WHERE w.op IS NULL OR w.op <> 'D')
        |SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(tlen) AS BIGINT) AS tlen
        |FROM v1 GROUP BY lang""".stripMargin,
    // CDC stream parity: the three micro-batches folded declaratively —
    // per batch, winner per key by the same (seq, op, payloads) DESC
    // NULLS LAST order, applied by full-outer join onto the prior state
    "q_upsert_stream_parity" ->
      """WITH b0 AS (
        |  SELECT doc_id, CAST(1 AS BIGINT) AS seq, 'I' AS op, text, lang
        |  FROM documents WHERE doc_id % 2 = 0),
        |w0 AS (SELECT doc_id, op, text, lang,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY seq DESC NULLS LAST, op DESC NULLS LAST,
        |                    text DESC NULLS LAST, lang DESC NULLS LAST) AS rn
        |       FROM b0),
        |s0 AS (SELECT doc_id, text, lang FROM w0 WHERE rn = 1 AND op <> 'D'),
        |b1 AS (
        |  SELECT doc_id, CAST(2 AS BIGINT) AS seq, 'U' AS op,
        |         text || ' [u1]' AS text, lang
        |  FROM documents WHERE doc_id % 6 = 0
        |  UNION ALL
        |  SELECT doc_id, 2, 'I', text, lang
        |  FROM documents WHERE doc_id % 2 = 1 AND doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id, CASE WHEN doc_id % 20 = 0 THEN 3 ELSE 1 END, 'D',
        |         NULL, NULL
        |  FROM documents WHERE doc_id % 10 = 0),
        |w1 AS (SELECT doc_id, op, text, lang,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY seq DESC NULLS LAST, op DESC NULLS LAST,
        |                    text DESC NULLS LAST, lang DESC NULLS LAST) AS rn
        |       FROM b1),
        |s1 AS (SELECT coalesce(s.doc_id, w.doc_id) AS doc_id,
        |         CASE WHEN w.op IS NOT NULL THEN w.text ELSE s.text END AS text,
        |         CASE WHEN w.op IS NOT NULL THEN w.lang ELSE s.lang END AS lang
        |       FROM s0 s FULL OUTER JOIN (SELECT * FROM w1 WHERE rn = 1) w
        |         ON s.doc_id = w.doc_id
        |       WHERE w.op IS NULL OR w.op <> 'D'),
        |b2 AS (
        |  SELECT doc_id, CAST(4 AS BIGINT) AS seq, 'D' AS op,
        |         CAST(NULL AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS lang
        |  FROM documents WHERE doc_id % 9 = 0
        |  UNION ALL
        |  SELECT doc_id, 4, 'U', 'final ' || CAST(doc_id AS VARCHAR), 'xx'
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, 1, 'I', 'new ' || CAST(doc_id AS VARCHAR), 'en'
        |  FROM documents WHERE doc_id < 30),
        |w2 AS (SELECT doc_id, op, text, lang,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY seq DESC NULLS LAST, op DESC NULLS LAST,
        |                    text DESC NULLS LAST, lang DESC NULLS LAST) AS rn
        |       FROM b2),
        |s2 AS (SELECT coalesce(s.doc_id, w.doc_id) AS doc_id,
        |         CASE WHEN w.op IS NOT NULL THEN w.text ELSE s.text END AS text,
        |         CASE WHEN w.op IS NOT NULL THEN w.lang ELSE s.lang END AS lang
        |       FROM s1 s FULL OUTER JOIN (SELECT * FROM w2 WHERE rn = 1) w
        |         ON s.doc_id = w.doc_id
        |       WHERE w.op IS NULL OR w.op <> 'D')
        |SELECT doc_id, text, lang FROM s2""".stripMargin,
    // label propagation: the same two synchronous rounds unrolled —
    // per-round neighbor-label counts, argmax by (count DESC, label ASC)
    "q_label_prop" ->
      """WITH eb AS (
        |  SELECT DISTINCT concat('c', CAST(o_custkey AS VARCHAR)) AS src,
        |         concat('s', CAST(l_suppkey AS VARCHAR)) AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM eb UNION SELECT dst, src FROM eb),
        |n AS (SELECT DISTINCT src AS node FROM e),
        |l0 AS (SELECT node, node AS lab FROM n),
        |c1 AS (SELECT e.dst AS node, l0.lab, count(*) AS c
        |       FROM e JOIN l0 ON e.src = l0.node GROUP BY 1, 2),
        |b1 AS (SELECT node, lab FROM (
        |         SELECT node, lab,
        |                row_number() OVER (PARTITION BY node
        |                                   ORDER BY c DESC, lab ASC) AS rn
        |         FROM c1) t WHERE rn = 1),
        |l1 AS (SELECT n.node, coalesce(b1.lab, n.node) AS lab
        |       FROM n LEFT JOIN b1 ON n.node = b1.node),
        |c2 AS (SELECT e.dst AS node, l1.lab, count(*) AS c
        |       FROM e JOIN l1 ON e.src = l1.node GROUP BY 1, 2),
        |b2 AS (SELECT node, lab FROM (
        |         SELECT node, lab,
        |                row_number() OVER (PARTITION BY node
        |                                   ORDER BY c DESC, lab ASC) AS rn
        |         FROM c2) t WHERE rn = 1),
        |l2 AS (SELECT n.node, coalesce(b2.lab, n.node) AS lab
        |       FROM n LEFT JOIN b2 ON n.node = b2.node)
        |SELECT node, lab AS label FROM l2""".stripMargin,
    // BFS: the recursive-CTE fixpoint capped at 4 hops; UNION dedups
    // (node, dist) pairs so the walk terminates, min() projects BFS level
    "q_graph_bfs" ->
      """WITH RECURSIVE eb AS (
        |  SELECT DISTINCT concat('c', CAST(o_custkey AS VARCHAR)) AS src,
        |         concat('s', CAST(l_suppkey AS VARCHAR)) AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM eb UNION ALL SELECT dst, src FROM eb),
        |seeds AS (SELECT DISTINCT concat('c', CAST(c_custkey AS VARCHAR)) AS node
        |          FROM customer WHERE c_custkey % 1000 = 0),
        |walk(node, dist) AS (
        |  SELECT node, 0 FROM seeds
        |  UNION
        |  SELECT e.dst, walk.dist + 1 FROM walk JOIN e ON walk.node = e.src
        |  WHERE walk.dist < 4)
        |SELECT node, CAST(min(dist) AS INT) AS dist FROM walk GROUP BY node""".stripMargin,
    // weighted shortest paths: the hop-capped weighted walk — UNION
    // dedups (node, d, hops) triples (bounded on the planted DAG), min(d)
    // projects the Bellman-Ford answer "min path weight within 8 edges"
    "q_shortest_paths" ->
      """WITH RECURSIVE
        |e AS (SELECT CAST(c_custkey AS VARCHAR) AS src,
        |             CAST(c_custkey + d AS VARCHAR) AS dst,
        |             CAST(1 + (c_custkey * 31 + d * 17) % 7 AS DOUBLE) AS w
        |      FROM customer CROSS JOIN (VALUES (1), (2), (3)) t(d)
        |      WHERE c_custkey + d <= (SELECT max(c_custkey) FROM customer)),
        |seeds AS (SELECT CAST(c_custkey AS VARCHAR) AS node
        |          FROM customer WHERE c_custkey % 20 = 0),
        |walk(node, d, hops) AS (
        |  SELECT node, CAST(0 AS DOUBLE), 0 FROM seeds
        |  UNION
        |  SELECT e.dst, walk.d + e.w, walk.hops + 1
        |  FROM walk JOIN e ON walk.node = e.src
        |  WHERE walk.hops < 8)
        |SELECT node, min(d) AS dist FROM walk GROUP BY node""".stripMargin,
    // PageRank: the oracle unrolls the same three power iterations; the
    // base term is written (1.0 - 0.85) on BOTH sides so the IEEE value
    // matches bit-for-bit (a 0.15 literal is one ulp away)
    "q_pagerank" ->
      """WITH e AS (SELECT concat('c', CAST(o_custkey AS VARCHAR)) AS src,
        |                  concat('s', CAST(l_suppkey AS VARCHAR)) AS dst,
        |                  sum(l_quantity) AS w
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |           GROUP BY 1, 2),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |ow AS (SELECT src, sum(w) AS ow FROM e GROUP BY src),
        |ne AS (SELECT e.src, e.dst, e.w / ow.ow AS share FROM e JOIN ow ON e.src = ow.src),
        |r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
        |r1 AS (SELECT nodes.node, (1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * coalesce(c.s, 0) AS r
        |       FROM nodes LEFT JOIN (SELECT ne.dst AS node, sum(r0.r * ne.share) AS s
        |                             FROM ne JOIN r0 ON ne.src = r0.node GROUP BY ne.dst) c
        |       ON nodes.node = c.node),
        |r2 AS (SELECT nodes.node, (1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * coalesce(c.s, 0) AS r
        |       FROM nodes LEFT JOIN (SELECT ne.dst AS node, sum(r1.r * ne.share) AS s
        |                             FROM ne JOIN r1 ON ne.src = r1.node GROUP BY ne.dst) c
        |       ON nodes.node = c.node),
        |r3 AS (SELECT nodes.node, (1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * coalesce(c.s, 0) AS r
        |       FROM nodes LEFT JOIN (SELECT ne.dst AS node, sum(r2.r * ne.share) AS s
        |                             FROM ne JOIN r2 ON ne.src = r2.node GROUP BY ne.dst) c
        |       ON nodes.node = c.node)
        |SELECT node, round(r * 1000, 6) AS rank_k FROM r3""".stripMargin,
    // snapshot diff: the oracle compares text directly (IS DISTINCT FROM)
    // where the engine compares md5 hashes — equivalent classification
    "q_snapshot_diff" ->
      """WITH b AS (
        |  SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN concat(text, ' v2') ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 100
        |)
        |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |  CASE WHEN a.doc_id IS NULL THEN 'added'
        |       WHEN b.doc_id IS NULL THEN 'removed'
        |       WHEN a.text IS DISTINCT FROM b.text THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id""".stripMargin,
    // group-top-k replayed as the window it replaces; DESC, DESC mirrors
    // "largest (price, okey) struct wins"
    "q_topk_per_group" ->
      """SELECT o_orderpriority, round(o_totalprice, 2) AS price, o_orderkey AS okey
        |FROM (SELECT o_orderpriority, o_totalprice, o_orderkey,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |                           ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |      FROM orders) t WHERE rn <= 3""".stripMargin,
    // stratified sample: rank by the shared hashUniform primitive
    // (md5-first-8-hex / 2^32), doc_id pins ties (it can't tie anyway)
    "q_stratified_sample" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (PARTITION BY source ORDER BY u, doc_id) AS rn
        |  FROM (SELECT doc_id, source,
        |          CAST(concat('0x', substr(md5(concat('strat', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 AS u
        |        FROM documents) t) r
        |WHERE rn <= 20""".stripMargin,
    // profile: per-column stats as a union, min/max compared in the
    // column's own type THEN rendered
    "q_profile" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      cols.map(c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min, CAST(max($c) AS VARCHAR) AS max
           |FROM documents""".stripMargin).mkString("\nUNION ALL\n")
    },
    // z-order: same normalize-bucket-interleave arithmetic; the bit
    // terms are generated to mirror position i*k + j exactly
    "q_zorder" -> {
      // every term fully parenthesized: Postgres-family grammars give
      // user operators (<<, &, |) ONE shared precedence, left-assoc
      val terms = (for (i <- 0 until 8; j <- 0 until 2) yield
        s"(((b$j >> $i) & 1) << ${i * 2 + j})").mkString(" | ")
      s"""WITH s AS (SELECT min(c_acctbal) AS mn0, max(c_acctbal) AS mx0,
         |                  min(CAST(c_custkey % 97 AS DOUBLE)) AS mn1,
         |                  max(CAST(c_custkey % 97 AS DOUBLE)) AS mx1 FROM customer),
         |b AS (SELECT c_custkey,
         |        CASE WHEN c_acctbal IS NULL OR s.mx0 = s.mn0 THEN 0
         |             ELSE CAST(least(floor((c_acctbal - s.mn0) / (s.mx0 - s.mn0) * 255), 255) AS BIGINT) END AS b0,
         |        CASE WHEN c_custkey IS NULL OR s.mx1 = s.mn1 THEN 0
         |             ELSE CAST(least(floor((CAST(c_custkey % 97 AS DOUBLE) - s.mn1) / (s.mx1 - s.mn1) * 255), 255) AS BIGINT) END AS b1
         |      FROM customer, s)
         |SELECT c_custkey, $terms AS z FROM b""".stripMargin
    },
    // bucketed join: the layout changes the PLAN, never the result —
    // plain SQL replays it
    "q_bucketed_join" ->
      """SELECT c_custkey, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey""".stripMargin,
    // BM25: identical arithmetic, associativity parenthesized to match
    // the engine's expression tree exactly (only ln is ulp-divergent)
    "q_bm25" ->
      s"""$Bm25OracleCtes
        |SELECT doc_id, score FROM bm""".stripMargin,
    "q_rrf_fusion" ->
      s"""$Bm25OracleCtes,
        |lex AS (SELECT doc_id, score AS s FROM bm ORDER BY s DESC, doc_id ASC LIMIT 50),
        |lexr AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS r FROM lex),
        |lng AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS s FROM documents ORDER BY s DESC, doc_id ASC LIMIT 50),
        |lngr AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS r FROM lng),
        |u AS (SELECT doc_id, 1.0 / (60.0 + r) AS c FROM lexr
        |      UNION ALL SELECT doc_id, 1.0 / (60.0 + r) AS c FROM lngr)
        |SELECT doc_id, round(sum(c), 6) AS rrf FROM u GROUP BY doc_id""".stripMargin,
    // CMS: rebuild the counter matrix as exact grouped counts per
    // (row, cell), estimate = min over rows at each probe's cells
    "q_cms_sketch" ->
      """WITH w AS (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS w FROM documents),
        |probes AS (SELECT DISTINCT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS probe FROM documents WHERE doc_id = 1),
        |rows_ AS (SELECT unnest(range(0, 4)) AS i),
        |cnt AS (SELECT i, CAST(concat('0x', substr(md5(concat('cms', i, ':', w)), 1, 15)) AS BIGINT) % 1024 AS pos, count(*) AS c
        |        FROM w CROSS JOIN rows_ GROUP BY 1, 2)
        |SELECT p.probe, CAST(min(coalesce(cnt.c, 0)) AS BIGINT) AS est
        |FROM probes p CROSS JOIN rows_ r
        |LEFT JOIN cnt ON cnt.i = r.i
        |  AND cnt.pos = CAST(concat('0x', substr(md5(concat('cms', r.i, ':', p.probe)), 1, 15)) AS BIGINT) % 1024
        |GROUP BY p.probe""".stripMargin,
    // heavy hitters: the sketch is a pruning device only — the RESULT is
    // the plain exact group-count-threshold, which is what this verifies
    "q_heavy_hitters" ->
      """WITH w AS (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS word FROM documents)
        |SELECT word, count(*) AS cnt FROM w GROUP BY word
        |HAVING count(*) * 200 > (SELECT count(*) FROM w)""".stripMargin,
    // KMV sketch: sort each source's distinct 60-bit word hashes, take the
    // 1024-th smallest, apply the same closed form the aggregate evaluates
    "q_distinct_sketch" ->
      """WITH ws AS (SELECT source, list_filter(string_split_regex(lower(trim(text)), '\s+'), w -> w <> '') AS ws FROM documents),
        |hs AS (SELECT DISTINCT source, CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h
        |       FROM (SELECT source, unnest(ws) AS w FROM ws)),
        |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hs),
        |a AS (SELECT source, count(*) AS nd, max(CASE WHEN rn <= 1024 THEN h END) AS kth FROM r GROUP BY source)
        |SELECT source, round(CASE WHEN nd < 1024 THEN CAST(nd AS DOUBLE)
        |                          ELSE (1024 - 1) * power(2, 60) / kth END, 2) AS est_distinct_words
        |FROM a""".stripMargin,
    // sketch rollup: the single-pass replay — if the engine's two-level
    // state merge is lossless this is the same number
    "q_sketch_rollup" ->
      """WITH ws AS (SELECT source, list_filter(string_split_regex(lower(trim(text)), '\s+'), w -> w <> '') AS ws FROM documents),
        |hs AS (SELECT DISTINCT source, CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h
        |       FROM (SELECT source, unnest(ws) AS w FROM ws)),
        |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hs),
        |a AS (SELECT source, count(*) AS nd, max(CASE WHEN rn <= 16 THEN h END) AS kth FROM r GROUP BY source)
        |SELECT source, round(CASE WHEN nd < 16 THEN CAST(nd AS DOUBLE)
        |                          ELSE (16 - 1) * power(2, 60) / kth END, 2) AS est_distinct_words
        |FROM a""".stripMargin,
    // triangles: canonical undirected simple edges, then the 3-way join
    "q_triangles" ->
      """WITH raw AS (SELECT CAST(user_id % 300 AS VARCHAR) AS a,
        |                    CAST((user_id * 7 + event_id) % 300 AS VARCHAR) AS b
        |             FROM events),
        |e0 AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM raw WHERE a <> b)
        |SELECT count(*) AS n_triangles
        |FROM e0 ab JOIN e0 bc ON ab.v = bc.u
        |           JOIN e0 ac ON ac.u = ab.u AND ac.v = bc.v""".stripMargin,
    // fuzzy join: ground truth by exhaustive levenshtein (the cross
    // join the segment scheme avoids), same threshold
    "q_fuzzy_join" ->
      """WITH base AS (SELECT p_partkey, p_name FROM part WHERE p_partkey % 4 = 0),
        |var AS (SELECT p_partkey + 1000000 AS r_key, concat(substr(p_name, 1, 3), substr(p_name, 5)) AS r_name FROM base),
        |right_ AS (SELECT p_partkey AS r_key, p_name AS r_name FROM base UNION ALL SELECT r_key, r_name FROM var)
        |SELECT b.p_partkey, r.r_key, levenshtein(b.p_name, r.r_name) AS edit_dist
        |FROM base b CROSS JOIN right_ r
        |WHERE abs(length(b.p_name) - length(r.r_name)) <= 1
        |  AND levenshtein(b.p_name, r.r_name) <= 1""".stripMargin,
    // row ids: the one-task window the operator replaces
    "q_row_ids" ->
      """SELECT doc_id, source,
        |       row_number() OVER (ORDER BY doc_id) - 1 AS row_id
        |FROM documents""".stripMargin,
    // NFC: identical decomposed construction (chr = codepoint), then
    // DuckDB's utf8proc composes — stability guarantees byte equality
    "q_text_normalize" ->
      """SELECT doc_id,
        |       nfc_normalize(concat('Cafe', chr(769), ' nai', chr(776), 've: ', text)) AS nfc,
        |       CAST(length(nfc_normalize(concat('Cafe', chr(769), ' nai', chr(776), 've: ', text))) AS INT) AS n_chars_nfc
        |FROM documents""".stripMargin,
    // url filter: the oracle constructs the expected survivors directly
    // (custkey % 4 ∈ {2, 3} — the unblocked domains)
    "q_url_filter" ->
      """SELECT c_custkey,
        |       concat('https://www.', CASE c_custkey % 4 WHEN 2 THEN 'good.com' ELSE 'news.org' END,
        |              '/p/', c_custkey) AS url,
        |       CASE c_custkey % 4 WHEN 2 THEN 'good.com' ELSE 'news.org' END AS domain
        |FROM customer WHERE c_custkey % 4 IN (2, 3)""".stripMargin,
    // histogram quantiles: identical bin clamping, rank convention, and
    // interpolation association — bit-exact without rounding
    "q_hist_quantile" ->
      """WITH v AS (SELECT l_extendedprice AS x FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |b AS (SELECT CAST(least(greatest(floor((x - 900.0) / 104.1), 0), 999) AS INT) AS bin, count(*) AS cnt FROM v GROUP BY 1),
        |c AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum, sum(cnt) OVER () AS total FROM b),
        |q AS (SELECT unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS q),
        |j AS (SELECT q.q, c.bin, c.cnt, c.cum, greatest(ceil(q.q * c.total), 1) AS rnk FROM q CROSS JOIN c),
        |e AS (SELECT q, bin, 900.0 + 104.1 * (bin + (rnk - (cum - cnt)) / cnt) AS est FROM j WHERE cum >= rnk)
        |SELECT q, min_by(est, bin) AS est FROM e GROUP BY q""".stripMargin,
    // deterministic bottom-k-by-hash sample quantiles: the identical k
    // smallest md5(salt||key) rows, values sorted, rank max(1, ceil(q*m))
    "q_sample_quantiles" ->
      """WITH v AS (SELECT concat(CAST(l_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR)) AS rk,
        |                  CAST(l_extendedprice AS DOUBLE) AS x
        |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |s AS (SELECT x FROM (SELECT x, row_number() OVER (ORDER BY md5(concat('sq', rk)), x) AS rn FROM v)
        |      WHERE rn <= 4096),
        |o AS (SELECT x, row_number() OVER (ORDER BY x) AS r, count(*) OVER () AS m FROM s),
        |q AS (SELECT unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS q)
        |SELECT q.q, o.x AS est
        |FROM q JOIN o ON o.r = greatest(CAST(ceil(q.q * o.m) AS BIGINT), 1)""".stripMargin,
    // skew join: the oracle is the plain join the salted split must
    // exactly reproduce
    "q_skew_join" ->
      """WITH r AS (SELECT event_type AS typ, max(value) AS typ_max FROM events GROUP BY 1)
        |SELECT e.event_type, count(*) AS n_above, round(sum(e.value), 2) AS sum_above
        |FROM events e JOIN r ON e.event_type = r.typ
        |WHERE e.value > r.typ_max / 2
        |GROUP BY e.event_type""".stripMargin,
    // HLL: rebuild the 64 max-rho registers per source (reg = top 6 hash
    // bits, rho = 55 - highest-bit-position of the 54-bit tail), then the
    // exact integer harmonic sum and the identically-associated estimate
    "q_hll_distinct" ->
      """WITH ws AS (SELECT source, list_filter(string_split_regex(lower(trim(text)), '\s+'), w -> w <> '') AS ws FROM documents),
        |hs AS (SELECT source, CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h
        |       FROM (SELECT source, unnest(ws) AS w FROM ws)),
        |r AS (SELECT source, CAST(h >> 54 AS INT) AS reg,
        |             max(CASE WHEN h % (1::BIGINT << 54) = 0 THEN 55
        |                      ELSE 55 - length(bin(h % (1::BIGINT << 54))) END) AS rho
        |      FROM hs GROUP BY 1, 2),
        |full_ AS (SELECT s.source, g.reg, coalesce(r.rho, 0) AS rho
        |          FROM (SELECT DISTINCT source FROM hs) s
        |          CROSS JOIN (SELECT unnest(range(0, 64)) AS reg) g
        |          LEFT JOIN r ON r.source = s.source AND r.reg = g.reg),
        |a AS (SELECT source, CAST(sum(1::BIGINT << (55 - rho)) AS BIGINT) AS harmonic_s FROM full_ GROUP BY source)
        |SELECT source, harmonic_s,
        |       round(CAST(0.709 AS DOUBLE) * 4096.0 * CAST(1::BIGINT << 55 AS DOUBLE) / CAST(harmonic_s AS DOUBLE), 2) AS est_distinct_words
        |FROM a""".stripMargin,
  )
}
