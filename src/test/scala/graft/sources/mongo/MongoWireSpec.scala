package graft.sources.mongo

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.{ByteBuffer, ByteOrder}
import scala.jdk.CollectionConverters._

/** An in-process MongoDB speaking the REAL wire protocol — OP_MSG frames
  * over TCP, BSON bodies — with an honest evaluator for the selector
  * subset MongoFindGen generates. The client under test is the same
  * MongoWire the graft-geojson source uses against a real deployment;
  * nothing in the path knows it is talking to a fake. */
object FakeMongod {
  private val mapper = new ObjectMapper()

  final class Server(docsJson: Seq[String]) {
    val received = new java.util.concurrent.CopyOnWriteArrayList[String]()
    /** Live client connections — lets specs assert the cursor's socket
      * hygiene (early stop must close, not leak). */
    val activeConnections = new java.util.concurrent.atomic.AtomicInteger(0)
    def awaitNoConnections(timeoutMs: Long = 5000): Boolean = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (activeConnections.get() != 0 && System.nanoTime() < deadline)
        Thread.sleep(20)
      activeConnections.get() == 0
    }
    private val docs = docsJson.map(mapper.readTree)
    private val cursors =
      new java.util.concurrent.ConcurrentHashMap[Long, scala.collection.mutable.Queue[JsonNode]]()
    private val nextCursor = new java.util.concurrent.atomic.AtomicLong(1000L)
    private val server = new ServerSocket(0, 16, java.net.InetAddress.getByName("127.0.0.1"))
    def port: Int = server.getLocalPort

    private val acceptThread = new Thread(() => {
      try while (true) {
        val sock = server.accept()
        activeConnections.incrementAndGet()
        new Thread(() => try serve(sock) catch { case _: Throwable => () }
          finally activeConnections.decrementAndGet()).start()
      } catch { case _: Throwable => () }
    })
    acceptThread.setDaemon(true)
    acceptThread.start()

    def stop(): Unit = server.close()

    private def serve(sock: java.net.Socket): Unit = {
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      while (true) {
        val lenB = new Array[Byte](4)
        in.readFully(lenB)
        val total = ByteBuffer.wrap(lenB).order(ByteOrder.LITTLE_ENDIAN).getInt()
        val rest = new Array[Byte](total - 4)
        in.readFully(rest)
        val buf = ByteBuffer.wrap(rest).order(ByteOrder.LITTLE_ENDIAN)
        val requestId = buf.getInt(); buf.getInt()
        val opCode = buf.getInt()
        require(opCode == 2013, s"fake mongod only speaks OP_MSG, got $opCode")
        buf.getInt() // flags
        require(buf.get() == 0, "expected kind-0 section")
        val cmd = mapper.readTree(Bson.toJson(buf))
        received.add(cmd.toString)
        val reply = handle(cmd)
        val body = Bson.fromJson(reply)
        val frame = ByteBuffer.allocate(16 + 4 + 1 + body.length).order(ByteOrder.LITTLE_ENDIAN)
        frame.putInt(16 + 4 + 1 + body.length).putInt(1).putInt(requestId).putInt(2013)
        frame.putInt(0).put(0.toByte).put(body)
        out.write(frame.array()); out.flush()
      }
    }

    private def handle(cmd: JsonNode): String = {
      if (cmd.has("find")) {
        val batchSize = cmd.path("batchSize").asInt(101)
        val matched = docs.filter(Selector.matches(cmd.path("filter"), _))
          .map(project(cmd.path("projection"), _))
        val q = scala.collection.mutable.Queue(matched: _*)
        val first = (0 until math.min(batchSize, q.size)).map(_ => q.dequeue())
        val id = if (q.nonEmpty) { val c = nextCursor.getAndIncrement(); cursors.put(c, q); c }
                 else 0L
        s"""{"cursor":{"firstBatch":[${first.map(_.toString).mkString(",")}],""" +
          s""""id":$id,"ns":"${cmd.path("$db").asText}.${cmd.path("find").asText}"},"ok":1.0}"""
      } else if (cmd.has("getMore")) {
        val id = cmd.path("getMore").asLong()
        val batchSize = cmd.path("batchSize").asInt(101)
        val q = cursors.get(id)
        val batch = if (q == null) Seq.empty
          else (0 until math.min(batchSize, q.size)).map(_ => q.dequeue())
        val more = q != null && q.nonEmpty
        if (!more) cursors.remove(id)
        s"""{"cursor":{"nextBatch":[${batch.map(_.toString).mkString(",")}],""" +
          s""""id":${if (more) id else 0L},"ns":"x.y"},"ok":1.0}"""
      } else if (cmd.has("killCursors")) {
        val killed = scala.collection.mutable.ArrayBuffer.empty[Long]
        cmd.path("cursors").forEach(n => { killed += n.asLong(); cursors.remove(n.asLong()) })
        s"""{"cursorsKilled":[${killed.mkString(",")}],"ok":1.0}"""
      } else s"""{"ok":0.0,"errmsg":"unknown command"}"""
    }

    /** The reference's projection shape ({"_id":0, "geometry":1,
      * "properties.c": {"$ifNull": …}}) applied with inclusion
      * semantics, like a real server. */
    private def project(proj: JsonNode, doc: JsonNode): JsonNode = {
      if (proj == null || proj.isMissingNode || !proj.isObject || proj.size() == 0) return doc
      val paths = proj.fields().asScala.collect {
        case e if e.getKey != "_id" && !(e.getValue.isNumber && e.getValue.asInt == 0) => e.getKey
      }.toSeq
      if (paths.isEmpty) return doc
      val out = mapper.createObjectNode()
      // keep "type" so the client's Feature flattening still recognizes it
      if (doc.has("type")) out.set[ObjectNode]("type", doc.get("type"))
      paths.foreach { p =>
        val parts = p.split("\\.")
        if (parts.length == 1) {
          if (doc.has(p)) out.set[ObjectNode](p, doc.get(p))
        } else {
          val sub = doc.path(parts(0))
          if (sub.isObject && sub.has(parts(1))) {
            val tgt = out.`with`(parts(0))
            tgt.set[ObjectNode](parts(1), sub.get(parts(1)))
          }
        }
      }
      out
    }
  }

  /** Honest evaluation of the MongoFindGen selector subset, with Mongo's
    * type-sensitive matching (numbers never equal their string forms). */
  object Selector {
    def matches(sel: JsonNode, doc: JsonNode): Boolean = {
      if (sel == null || sel.isMissingNode || !sel.isObject) return true
      sel.fields().asScala.forall { e =>
        e.getKey match {
          case "$and" => e.getValue.elements().asScala.forall(matches(_, doc))
          case "$or"  => e.getValue.elements().asScala.exists(matches(_, doc))
          case path   => leaf(resolve(doc, path), e.getValue)
        }
      }
    }

    private def resolve(doc: JsonNode, path: String): JsonNode =
      path.split("\\.").foldLeft(doc) { (n, seg) =>
        if (n.isArray && seg.forall(_.isDigit)) n.path(seg.toInt)
        else n.path(seg)
      }

    private def leaf(v: JsonNode, cond: JsonNode): Boolean =
      if (cond.isObject && cond.fieldNames().asScala.exists(_.startsWith("$")))
        cond.fields().asScala.forall { op =>
          op.getKey match {
            case "$eq"  => veq(v, op.getValue)
            case "$ne"  => !veq(v, op.getValue)
            case "$gt"  => cmp(v, op.getValue).exists(_ > 0)
            case "$gte" => cmp(v, op.getValue).exists(_ >= 0)
            case "$lt"  => cmp(v, op.getValue).exists(_ < 0)
            case "$lte" => cmp(v, op.getValue).exists(_ <= 0)
            case "$in"  => op.getValue.elements().asScala.exists(veq(v, _))
            case "$nin" => !op.getValue.elements().asScala.exists(veq(v, _))
            case "$exists" => op.getValue.asBoolean() == !v.isMissingNode
            case "$mod" =>
              v.isNumber && v.asLong() % op.getValue.get(0).asLong() == op.getValue.get(1).asLong()
            case other => throw new IllegalArgumentException(s"fake mongod: $other")
          }
        }
      else veq(v, cond)

    private def veq(a: JsonNode, b: JsonNode): Boolean =
      if (a.isMissingNode) b.isNull && false // missing matches nothing but $exists
      else if (a.isNumber && b.isNumber) a.doubleValue() == b.doubleValue()
      else a == b

    private def cmp(a: JsonNode, b: JsonNode): Option[Int] =
      if (a.isNumber && b.isNumber) Some(java.lang.Double.compare(a.doubleValue(), b.doubleValue()))
      else if (a.isTextual && b.isTextual) Some(a.textValue().compareTo(b.textValue()))
      else None // cross-type range never matches (Mongo type bracketing)
  }
}

class MongoWireSpec extends SparkTestBase {

  private def featureDocs: Seq[String] = (0 until 260).map { i =>
    s"""{"_id":"d$i","type":"Feature","properties":{"name":"p$i","grp":"${i % 4}","num":$i},"geometry":{"type":"Point","coordinates":[$i,1]}}"""
  }

  test("find + getMore cursor paging over real OP_MSG frames") {
    val srv = new FakeMongod.Server(featureDocs)
    try {
      val url = s"mongodb://127.0.0.1:${srv.port}/db/features"
      val all = MongoWire.docs(url, "{}", Nil, 5000).toSeq
      assert(all.size == 260)
      // 260 docs at batchSize 101 = find + 2 getMore
      val cmds = srv.received.asScala.toSeq
      assert(cmds.count(_.contains("\"find\"")) == 1, cmds)
      assert(cmds.count(_.contains("\"getMore\"")) == 2, cmds)
      // a transfer hint caps the first batch; an early stop sends nothing more
      srv.received.clear()
      val few = MongoWire.docs(url, "{}", Nil, 5000, maxDocs = Some(7)).take(7).toSeq
      assert(few.size == 7)
      assert(srv.received.asScala.count(_.contains("\"getMore\"")) == 0)
      assert(srv.received.asScala.head.contains("\"batchSize\":7"), srv.received.asScala.head)
    } finally srv.stop()
  }

  test("serverPushdown: selector executes inside MongoDB over the wire") {
    val srv = new FakeMongod.Server(featureDocs)
    try {
      graft.Graft.register(spark)
      val url = s"mongodb://127.0.0.1:${srv.port}/db/features"
      val df = spark.read.format("graft-geojson")
        .option("serverPushdown", "true").load(url)
      // schema inferred from a first-batch sample over the wire
      assert(df.columns.toSet == Set("name", "grp", "num", "geometry"))
      assert(df.count() == 260)
      // pushed predicate → evaluated inside the database; the widened
      // (string OR number) selector matches the typed document
      srv.received.clear()
      val f = df.where(col("num") === "7")
      assert(f.queryExecution.executedPlan.toString.contains("ServerExec: mongodb-find"))
      val got = f.collect().map(_.getAs[String]("name")).toSeq
      assert(got == Seq("p7"),
        s"got=$got received=${srv.received.asScala.mkString("\n")}")
      val sent = srv.received.asScala.filter(_.contains("\"find\"")).last
      assert(sent.contains(""""properties.num":{"$eq":"7"}"""), sent)
      assert(sent.contains(""""properties.num":{"$eq":7}"""), sent)
      // Mango fields → Mongo projection (the reference's $ifNull shape)
      assert(sent.contains(""""projection":{"_id":0"""), sent)
      assert(sent.contains("$ifNull"), sent)
      // spatial WHERE travels as the coordinate-range clause; only the
      // in-range points cross the wire (single small batch, no getMore)
      srv.received.clear()
      val sel = df.where(expr(
        "st_intersects(geometry, st_geomfromtext('POLYGON((10 0, 15 0, 15 2, 10 2, 10 0))'))"))
      assert(sel.count() == 6)
      val spatial = srv.received.asScala.filter(_.contains("\"find\"")).last
      assert(spatial.contains(""""geometry.coordinates.0":{"$gte":10}"""), spatial)
      assert(spatial.contains(""""geometry.type":{"$ne":"Point"}"""), spatial)
      assert(!srv.received.asScala.exists(_.contains("getMore")))
      // a predicate Mongo cannot express re-applies locally on the
      // transferred documents — exactness does not depend on the server
      assert(df.where(col("name").startsWith("p25")).count() == 11) // p25, p250..p259
      // geometry survives the BSON wire
      assert(df.where(call_function("st_x", col("geometry")) === 5.0).count() == 1)
    } finally srv.stop()
  }

  test("an early stop closes the socket and a drained cursor self-closes") {
    val srv = new FakeMongod.Server(featureDocs)
    try {
      val url = s"mongodb://127.0.0.1:${srv.port}/db/features"
      // early stop: fewer docs than the cursor holds, then close() — the
      // socket must not outlive the consumer (the PartitionReader close
      // path), and the SERVER cursor must be reclaimed via killCursors
      // (mongod cursors are not connection-bound)
      val cur = MongoWire.docs(url, "{}", Nil, 5000)
      assert(cur.take(7).size == 7)
      cur.close()
      assert(srv.received.asScala.exists(_.contains("\"killCursors\"")),
        srv.received.asScala.mkString("\n"))
      // drained cursor: closes itself when hasNext answers false, and no
      // killCursors is needed (the server already ended the cursor)
      srv.received.clear()
      val all = MongoWire.docs(url, "{}", Nil, 5000)
      assert(all.size == 260)
      assert(!srv.received.asScala.exists(_.contains("\"killCursors\"")))
      assert(srv.awaitNoConnections(), "leaked connections")
    } finally srv.stop()
  }

  test("the batch backstop fires instead of paging forever") {
    val srv = new FakeMongod.Server(featureDocs)
    try {
      val url = s"mongodb://127.0.0.1:${srv.port}/db/features"
      // cap of 2 batches < the 3 these 260 docs need: the guard fires on
      // the third pull — the same guard that stops a misbehaving server
      // answering non-zero cursor ids with empty batches forever
      val e = intercept[IllegalArgumentException] {
        MongoWire.docs(url, "{}", Nil, 5000, maxBatches = 2).size
      }
      assert(e.getMessage.contains("batches"), e.getMessage)
      assert(srv.awaitNoConnections(), "backstop failure must still close")
    } finally srv.stop()
  }

  test("anatomy parses collection URLs and rejects malformed ones") {
    assert(MongoWire.anatomy("mongodb://h:27017/db/coll") == Some(("h", 27017, "db", "coll")))
    assert(MongoWire.anatomy("mongodb://h/db/coll") == Some(("h", 27017, "db", "coll")))
    assert(MongoWire.anatomy("mongodb://h:27017/dbonly").isEmpty)
    assert(MongoWire.anatomy("http://h:1/db/coll").isEmpty)
    // out-of-range ports are malformed, not deferred connect errors
    assert(MongoWire.anatomy("mongodb://h:99999999999/db/coll").isEmpty)
    assert(MongoWire.anatomy("mongodb://h:0/db/coll").isEmpty)
  }
}
