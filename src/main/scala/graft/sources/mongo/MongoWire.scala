package graft.sources.mongo

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.{ByteBuffer, ByteOrder}

/** MongoDB wire-protocol execution (OP_MSG, opcode 2013 — the only
  * request opcode modern MongoDB speaks) — the live half of the
  * reference's MongoDB integration, which drives a real `MongoClient`
  * (reference: extension/mongodb/mongo_extension.ts:90
  * `col.find(JSON.parse(where), {projection}).toArray()`). Mongo has no
  * HTTP surface, so unlike the CouchDB `_find` path this speaks the
  * binary protocol directly: a find command per collection, lazy
  * `getMore` paging on the server cursor, [[Bson]] for the document
  * codec. Implemented against the public wire-protocol spec
  * (OP_MSG: header + flagBits + one kind-0 section carrying the command
  * document; replies mirror the framing).
  *
  * The graft-geojson source uses this when `serverPushdown=true` on a
  * `mongodb://host:port/db/collection` path: the pushed predicates
  * travel as the [[MongoFindGen]] selector — the same construction the
  * reference parses into `col.find` — and only matching documents cross
  * the wire. The scan re-applies every pushed filter locally afterwards,
  * so a server that ignores the filter degrades to transfer cost, never
  * to a wrong result (the CouchDB/BaseX trust model).
  */
object MongoWire {

  /** Matches the driver-default find batch size granularity; small enough
    * that a pushed LIMIT's early stop saves wire traffic. */
  val BatchSize = 101

  /** Backstop against a misbehaving server that answers non-zero cursor
    * ids with empty batches forever — the [[CouchFind.MaxPages]] analog
    * (4M batches ≈ 400M documents through one cursor, far past the point
    * where the data belongs in a bulk snapshot). */
  val MaxBatches = 4 * 1000 * 1000

  /** Parses `mongodb://host[:port]/db/collection` (exactly one database
    * and one collection segment — the graft document model's table
    * address; port defaults to MongoDB's standard 27017 and must be a
    * valid TCP port — an overflowing or zero port is malformed, not a
    * deferred connect error). */
  def anatomy(url: String): Option[(String, Int, String, String)] = {
    val m = "^mongodb://([^/:]+)(?::(\\d+))?/([^/]+)/([^/?#]+)$".r
    url match {
      case m(host, port, db, coll) =>
        Option(port).map(_.toIntOption) match {
          case None => Some((host, 27017, db, coll))
          case Some(Some(p)) if p >= 1 && p <= 65535 => Some((host, p, db, coll))
          case _ => None
        }
      case _ => None
    }
  }

  def isMongoUrl(url: String): Boolean = url.startsWith("mongodb://")

  private val requestCounter = new java.util.concurrent.atomic.AtomicInteger(1)

  /** One OP_MSG round-trip over an open socket: sends the command
    * document (JSON text), answers the reply's kind-0 document as JSON.
    * `longFields` forces named integral fields to BSON int64 — a real
    * mongod REQUIRES `getMore`'s cursor id to be int64, and a small id
    * would otherwise round-trip through JSON as int32. */
  private def command(in: DataInputStream, out: DataOutputStream, commandJson: String,
                      longFields: Set[String] = Set.empty): String = {
    val body = Bson.fromJson(commandJson, longFields)
    val requestId = requestCounter.getAndIncrement()
    val len = 16 + 4 + 1 + body.length // header + flagBits + section kind + doc
    val buf = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(len).putInt(requestId).putInt(0).putInt(2013) // OP_MSG
    buf.putInt(0)      // flagBits
    buf.put(0.toByte)  // section kind 0: body
    buf.put(body)
    out.write(buf.array()); out.flush()

    // reply: same framing; read length-prefixed, then parse
    val lenBytes = new Array[Byte](4)
    in.readFully(lenBytes)
    val totalLen = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getInt()
    require(totalLen >= 16 + 4 + 1 + 5 && totalLen < 64 * 1024 * 1024,
      s"implausible OP_MSG reply length $totalLen")
    val rest = new Array[Byte](totalLen - 4)
    in.readFully(rest)
    val reply = ByteBuffer.wrap(rest).order(ByteOrder.LITTLE_ENDIAN)
    reply.getInt() // requestID
    reply.getInt() // responseTo
    val opCode = reply.getInt()
    require(opCode == 2013, s"expected OP_MSG (2013) reply, got opcode $opCode")
    reply.getInt() // flagBits
    val kind = reply.get()
    require(kind == 0, s"expected kind-0 body section, got $kind")
    Bson.toJson(reply)
  }

  /** The lazily-paged document cursor [[docs]] answers: also
    * [[AutoCloseable]], because an early stop (a pushed LIMIT, a
    * consumer exception) leaves the socket and the server cursor open —
    * the scan's `PartitionReader.close()` must call [[close]]. A fully
    * drained cursor closes itself. */
  final class DocCursor private[MongoWire] (host: String, port: Int, db: String,
                                            coll: String, selectorJson: String,
                                            projection: String, timeoutMs: Int,
                                            maxDocs: Option[Int], maxBatches: Int)
    extends scala.collection.AbstractIterator[String] with AutoCloseable {
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private var socket: Socket = _
    private var in: DataInputStream = _
    private var out: DataOutputStream = _
    private var batch: Iterator[String] = Iterator.empty
    private var findSent = false
    private var cursorId = 0L
    private var served = 0
    private var batches = 0

    private def ask: Int =
      maxDocs.filter(_ > served).map(m => math.min(BatchSize, m - served))
        .getOrElse(BatchSize)

    private def open(): Unit = {
      socket = new Socket()
      socket.connect(new InetSocketAddress(host, port), timeoutMs)
      socket.setSoTimeout(timeoutMs)
      in = new DataInputStream(socket.getInputStream)
      out = new DataOutputStream(socket.getOutputStream)
    }

    private def parseCursor(replyJson: String): Unit = {
      val root = mapper.readTree(replyJson)
      require(root.path("ok").asDouble(0.0) == 1.0,
        s"mongodb command failed: $replyJson")
      val cursor = root.path("cursor")
      val docsNode =
        if (cursor.has("firstBatch")) cursor.path("firstBatch")
        else cursor.path("nextBatch")
      val items = scala.collection.mutable.ArrayBuffer.empty[String]
      docsNode.forEach(d => items += mapper.writeValueAsString(d))
      batch = items.iterator
      // opaque int64 per the wire spec — only 0 means "cursor exhausted";
      // negative ids are legitimate (FerretDB-style proxies use them)
      cursorId = cursor.path("id").asLong(0L)
      served += items.length
      batches += 1
      require(batches <= maxBatches,
        s"cursor exceeded $maxBatches batches — misbehaving server?")
    }

    private def pull(): Unit = {
      // phase 1 — the wire round-trip: a failure here (connect, timeout,
      // mid-frame IO) leaves the stream possibly desynced, so skip the
      // killCursors courtesy (cursorId = 0) and just release the socket
      val replyJson =
        try {
          if (!findSent) {
            open()
            findSent = true
            command(in, out,
              s"""{"find": ${graft.JsonText.str(coll)}, "filter": $selectorJson,""" +
                s""" "projection": $projection, "batchSize": $ask,""" +
                s""" "$$db": ${graft.JsonText.str(db)}}""")
          } else if (cursorId != 0L) {
            command(in, out,
              s"""{"getMore": $cursorId, "collection": ${graft.JsonText.str(coll)},""" +
                s""" "batchSize": $ask, "$$db": ${graft.JsonText.str(db)}}""",
              longFields = Set("getMore"))
          } else null
        } catch { case t: Throwable => cursorId = 0L; close(); throw t }
      // phase 2 — parsing: the reply frame was fully consumed, so the
      // stream sits at a clean boundary and close() can still reclaim
      // the live cursor (ok:0 replies, the maxBatches backstop)
      if (replyJson != null)
        try parseCursor(replyJson)
        catch { case t: Throwable => close(); throw t }
    }

    override def close(): Unit = if (socket != null) {
      // early stop with a live server cursor: best-effort killCursors so
      // the server reclaims it now instead of at cursorTimeoutMillis —
      // mongod cursors are NOT connection-bound, so closing the socket
      // alone would leave them idling server-side. The cursors array
      // element (BSON name "0") must be int64, like getMore.
      if (findSent && cursorId != 0L)
        try command(in, out,
          s"""{"killCursors": ${graft.JsonText.str(coll)}, "cursors": [$cursorId],""" +
            s""" "$$db": ${graft.JsonText.str(db)}}""",
          longFields = Set("0"))
        catch { case _: Throwable => () } // reclaim is advisory; close regardless
      cursorId = 0L
      try socket.close() catch { case _: java.io.IOException => () }
      socket = null
    }

    override def hasNext: Boolean = {
      while (!batch.hasNext && (!findSent || cursorId != 0L)) pull()
      val more = batch.hasNext
      if (!more) close()
      more
    }

    override def next(): String =
      if (hasNext) batch.next() else Iterator.empty.next()
  }

  /** All documents matching `selectorJson`, lazily paged: the find
    * command's `firstBatch`, then `getMore` on the server cursor as the
    * consumer pulls. The cursor is [[AutoCloseable]] — call `close()`
    * when stopping early. `fields` projects server-side via the
    * reference's projection construction ([[MongoFindGen.projection]]).
    * Documents come back as JSON text for the shared flattening layer. */
  def docs(url: String, selectorJson: String, fields: Seq[String],
           timeoutMs: Int, maxDocs: Option[Int] = None,
           maxBatches: Int = MaxBatches): DocCursor = {
    val (host, port, db, coll) = anatomy(url).getOrElse(
      throw new IllegalArgumentException(
        s"mongodb pushdown needs mongodb://host[:port]/db/collection; got $url"))
    new DocCursor(host, port, db, coll, selectorJson,
      MongoFindGen.projection(fields), timeoutMs, maxDocs, maxBatches)
  }

  /** First-page sample for schema inference (the CouchDB first-page
    * analog): up to `n` unselected documents, cursor closed. */
  def sample(url: String, n: Int, timeoutMs: Int): Seq[String] = {
    val cur = docs(url, "{}", Nil, timeoutMs, maxDocs = Some(n))
    try cur.take(n).toSeq finally cur.close()
  }
}
