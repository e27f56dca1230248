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

  /** Parses `mongodb://host:port/db/collection` (exactly one database and
    * one collection segment — the graft document model's table address). */
  def anatomy(url: String): Option[(String, Int, String, String)] = {
    val m = "^mongodb://([^/:]+):(\\d+)/([^/]+)/([^/?#]+)$".r
    url match {
      case m(host, port, db, coll) => Some((host, port.toInt, db, coll))
      case _ => None
    }
  }

  def isMongoUrl(url: String): Boolean = url.startsWith("mongodb://")

  private val requestCounter = new java.util.concurrent.atomic.AtomicInteger(1)

  /** One OP_MSG round-trip over an open socket: sends the command
    * document (JSON text), answers the reply's kind-0 document as JSON. */
  private def command(in: DataInputStream, out: DataOutputStream, commandJson: String): String = {
    val body = Bson.fromJson(commandJson)
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

  /** All documents matching `selectorJson`, lazily paged: the find
    * command's `firstBatch`, then `getMore` on the server cursor as the
    * consumer pulls — an early stop (pushed LIMIT) kills the traffic and
    * the cursor is closed. `fields` projects server-side via the
    * reference's projection construction ([[MongoFindGen.projection]]).
    * Documents come back as JSON text for the shared flattening layer. */
  def docs(url: String, selectorJson: String, fields: Seq[String],
           timeoutMs: Int, maxDocs: Option[Int] = None): Iterator[String] = {
    val (host, port, db, coll) = anatomy(url).getOrElse(
      throw new IllegalArgumentException(
        s"mongodb pushdown needs mongodb://host:port/db/collection; got $url"))
    val projection = MongoFindGen.projection(fields)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

    new scala.collection.AbstractIterator[String] {
      private var socket: Socket = _
      private var in: DataInputStream = _
      private var out: DataOutputStream = _
      private var batch: Iterator[String] = Iterator.empty
      private var cursorId: Long = -1L // -1 = find not sent yet
      private var served = 0

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
        cursorId = cursor.path("id").asLong(0L)
        served += items.length
      }

      private def pull(): Unit = {
        if (cursorId == -1L) {
          open()
          parseCursor(command(in, out,
            s"""{"find": ${graft.JsonText.str(coll)}, "filter": $selectorJson,""" +
              s""" "projection": $projection, "batchSize": $ask,""" +
              s""" "$$db": ${graft.JsonText.str(db)}}"""))
        } else if (cursorId != 0L) {
          parseCursor(command(in, out,
            s"""{"getMore": $cursorId, "collection": ${graft.JsonText.str(coll)},""" +
              s""" "batchSize": $ask, "$$db": ${graft.JsonText.str(db)}}"""))
        }
      }

      private def close(): Unit = if (socket != null) {
        try socket.close() catch { case _: java.io.IOException => () }
        socket = null
      }

      override def hasNext: Boolean = {
        while (!batch.hasNext && cursorId != 0L) pull()
        val more = batch.hasNext
        if (!more) close()
        more
      }

      override def next(): String =
        if (hasNext) batch.next() else Iterator.empty.next()
    }
  }

  /** First-page sample for schema inference (the CouchDB first-page
    * analog): up to `n` unselected documents. */
  def sample(url: String, n: Int, timeoutMs: Int): Seq[String] =
    docs(url, "{}", Nil, timeoutMs, maxDocs = Some(n)).take(n).toSeq
}
