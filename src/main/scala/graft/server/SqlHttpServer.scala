package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.Graft
import org.apache.spark.sql.SparkSession

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Minimal SQL-over-HTTP endpoint — the analog of the reference's demo
  * server (reference: demo/app.ts, demo/routes.ts): POST a PostGIS-flavored
  * SQL string, get JSON rows back, plus a GeoJSON FeatureCollection when
  * the query projects `ST_AsGeoJSON` (reference: src/index.ts:323
  * convertRestoGeoJSON). JDK-only (com.sun.net.httpserver) — no framework
  * dependency.
  *
  * {{{
  *   val srv = SqlHttpServer.start(spark, port = 8080)
  *   // POST /query   body = SQL text   → {"columns":[…],"rows":[[…]…]}
  *   // GET  /health                    → {"status":"ok"}
  *   srv.stop(0)
  * }}}
  *
  * Serving is driver-side by nature (it collects the result), so `maxRows`
  * caps every response — this is a query API for reduced/final results,
  * not a bulk export path.
  *
  * Security: binds to loopback by default (the endpoint executes arbitrary
  * SQL against every registered table). Pass `bindAddress = "0.0.0.0"` to
  * expose it wider — then set `authToken` (checked as `Authorization:
  * Bearer <token>` on /query) and front it with a real auth layer for
  * anything beyond a demo.
  */
object SqlHttpServer {

  def start(spark: SparkSession, port: Int = 0, maxRows: Int = 1000,
            bindAddress: String = "127.0.0.1",
            authToken: Option[String] = None): HttpServer = {
    Graft.register(spark)
    val server = HttpServer.create(new InetSocketAddress(bindAddress, port), 0)

    server.createContext("/health", (ex: HttpExchange) =>
      respond(ex, 200, """{"status":"ok"}"""))

    server.createContext("/query", (ex: HttpExchange) => {
      try {
        val sql = ex.getRequestMethod match {
          case "POST" =>
            new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          case "GET" =>
            Option(ex.getRequestURI.getRawQuery).toSeq
              .flatMap(_.split("&").toSeq)
              .collectFirst { case kv if kv.startsWith("sql=") =>
                java.net.URLDecoder.decode(kv.drop(4), StandardCharsets.UTF_8)
              }.getOrElse("")
          case _ => ""
        }
        if (!authorized(ex, authToken)) respond(ex, 401, """{"error":"unauthorized"}""")
        else if (sql.trim.isEmpty) respond(ex, 400, """{"error":"empty sql"}""")
        else {
          val result = Graft.processQuery(spark, sql)
          val rows = result.df.limit(maxRows).collect()
          val cols = result.df.schema.fieldNames
          val sb = new StringBuilder("""{"columns":[""")
          sb.append(cols.map(jstr).mkString(","))
          sb.append("],\"rows\":[")
          rows.zipWithIndex.foreach { case (row, i) =>
            if (i > 0) sb.append(',')
            sb.append('[')
            var f = 0
            while (f < cols.length) {
              if (f > 0) sb.append(',')
              sb.append(jval(row.get(f)))
              f += 1
            }
            sb.append(']')
          }
          sb.append(']')
          result.geoJson.foreach { g => sb.append(",\"geojson\":").append(g) }
          sb.append('}')
          respond(ex, 200, sb.toString)
        }
      } catch {
        case e: Throwable =>
          respond(ex, 400, s"""{"error":${jstr(String.valueOf(e.getMessage))}}""")
      }
    })

    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    server
  }

  /** Constant-time bearer-token check (no token configured = open). */
  private def authorized(ex: HttpExchange, token: Option[String]): Boolean =
    token.forall { t =>
      Option(ex.getRequestHeaders.getFirst("Authorization")).exists { h =>
        java.security.MessageDigest.isEqual(
          h.getBytes(StandardCharsets.UTF_8),
          s"Bearer $t".getBytes(StandardCharsets.UTF_8))
      }
    }

  private def jstr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  private def jval(v: Any): String = v match {
    case null                => "null"
    case n: Number           => n.toString
    case b: Boolean          => b.toString
    case bytes: Array[Byte]  => jstr(java.util.Base64.getEncoder.encodeToString(bytes))
    case other               => jstr(other.toString)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}
