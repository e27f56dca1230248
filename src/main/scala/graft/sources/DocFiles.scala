package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Shared path handling for the graft-xml / graft-geojson DSv2 sources. */
private[sources] object DocFiles {

  /** Expands directories and glob patterns to concrete data files.
    * Glob-first (`globStatus` also resolves literal paths), so
    * `.load("/data/&#42;.xml")` works and a literal missing path still
    * fails with a clear error. Hidden/metadata files (`_SUCCESS`,
    * `.crc`) are skipped so directories written by Spark itself read
    * cleanly. `http(s)://` paths are network collections — see
    * [[listHttpCollection]]; the per-document readers are URL-streams
    * already, so executors fetch their own documents (no driver fan-in). */
  def listFiles(paths: Seq[String]): Seq[String] = {
    val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    paths.flatMap { p =>
      if (p.startsWith("http://") || p.startsWith("https://")) listHttpCollection(p)
      else {
        val path = new Path(p)
        val fs = path.getFileSystem(conf)
        val matched = fs.globStatus(path) match {
          case null => throw new java.io.FileNotFoundException(s"Path does not exist: $p")
          case arr  => arr.toSeq
        }
        val stats = matched.flatMap { s =>
          if (s.isDirectory) fs.listStatus(s.getPath).toSeq else Seq(s)
        }
        stats.filter(s => s.isFile &&
            !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
          .map(_.getPath.toString)
      }
    }
  }

  /** Total on-disk bytes of the listed documents, or empty when any of
    * them is a network URL (no measurable size) or the filesystem cannot
    * answer — the caller falls back to Spark's conservative default.
    * Statistics are best-effort by contract, so ANY failure (including
    * the RuntimeExceptions some Hadoop connectors wrap auth/config
    * errors in) degrades to "unknown" rather than failing planning.
    * One listStatus per parent directory, not one RPC per file — a
    * 10k-document collection costs a handful of driver round-trips. */
  def bytesOf(files: Seq[String]): java.util.OptionalLong =
    if (files.exists(f => f.startsWith("http://") || f.startsWith("https://")))
      java.util.OptionalLong.empty()
    else try {
      val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
      var total = 0L
      files.map(new Path(_)).groupBy(_.getParent).foreach { case (parent, ps) =>
        val fs = parent.getFileSystem(conf)
        if (ps.size <= 2) total += ps.map(fs.getFileStatus(_).getLen).sum
        else {
          // one listing amortizes the whole sibling group; per-file
          // status only when the group is too small to pay for it
          val wanted = ps.map(_.getName).toSet
          total += fs.listStatus(parent)
            .filter(s => wanted(s.getPath.getName)).map(_.getLen).sum
        }
      }
      java.util.OptionalLong.of(total)
    } catch { case scala.util.control.NonFatal(_) => java.util.OptionalLong.empty() }

  private val DocExtensions =
    Seq(".xml", ".kml", ".gml", ".geojson", ".json", ".ndjson")

  /** Resolves an HTTP collection URL to document URLs, the way the
    * reference drives a running BaseX's REST surface (GET `/rest/<db>`
    * answers an XML listing of `<rest:resource>` entries; GET
    * `/rest/<db>/<doc>` answers the document — reference
    * extension/basex/basex_extension.ts). A URL already naming a document
    * (by extension) is returned as-is without a round-trip; a URL whose
    * response is not a resource listing is treated as a single document. */
  private[sources] def listHttpCollection(url: String): Seq[String] = {
    val lower = url.toLowerCase
    if (DocExtensions.exists(lower.endsWith)) return Seq(url)
    val body =
      try {
        val conn = new java.net.URI(url).toURL.openConnection()
        // a hung endpoint must fail, not block driver-side planning forever
        conn.setConnectTimeout(HttpTimeoutMs)
        conn.setReadTimeout(HttpTimeoutMs)
        val in = conn.getInputStream
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      } catch {
        case e: Exception =>
          throw new java.io.FileNotFoundException(s"HTTP collection $url: $e")
      }
    // SecureXml.strict: the listing body is untrusted network content.
    // BaseX names resources in element text (<rest:resource>a.xml</…>),
    // eXist in a name attribute (<exist:resource name="a.xml"/>).
    val resources =
      try (graft.geo.SecureXml.strict.loadString(body) \\ "resource")
        .flatMap { r =>
          Some(r.text.trim).filter(_.nonEmpty)
            .orElse(r.attribute("name").map(_.text.trim).filter(_.nonEmpty))
        }
      catch { case _: Exception => Seq.empty }
    if (resources.nonEmpty) {
      val base = if (url.endsWith("/")) url else url + "/"
      resources.map(base + _)
    } else Seq(url) // the endpoint served a document, not a listing
  }

  /** Connect/read timeout for HTTP collection traffic (listing and
    * per-document fetches), overridable via the `graft.http.timeout.ms`
    * JVM property. Resolved where EVALUATED: driver-side for planning
    * (listing, schema inference), and at reader-factory CONSTRUCTION for
    * scans — the factories capture the value on the driver and serialize
    * it to executors, so a driver-set property governs executor fetches
    * too (executor JVMs don't inherit driver sys.props). */
  private[sources] def HttpTimeoutMs: Int =
    sys.props.get("graft.http.timeout.ms").flatMap(_.toIntOption).getOrElse(60000)

  /** Opens a document URL with timeouts set — shared by the DSv2 readers so
    * an executor task on a stalled server fails instead of hanging.
    * Executor-side callers must pass the driver-captured timeout. */
  private[sources] def openDocStream(url: String,
                                     timeoutMs: Int = HttpTimeoutMs): java.io.InputStream = {
    val conn = new java.net.URI(url).toURL.openConnection()
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn.getInputStream
  }

  /** POSTs a request body and returns the response text — the transport for
    * server-side query execution (BaseX `rest:query`, CouchDB `_find`).
    * Timeouts as in [[openDocStream]]; an HTTP error status raises with the
    * response head so a rejected query fails the task with the server's
    * diagnostic instead of a parse error downstream. */
  private[sources] def post(url: String, body: String, contentType: String,
                            timeoutMs: Int): String = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", contentType)
    conn.setDoOutput(true)
    val out = conn.getOutputStream
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val code = conn.getResponseCode
    val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text =
      if (in == null) ""
      else try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    if (code >= 400)
      throw new java.io.IOException(s"POST $url: HTTP $code ${text.take(500)}")
    text
  }

  /** Spark encodes `.load(p1, p2, …)` as a JSON array under "paths". */
  def pathsOf(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map { js =>
      js.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
    }
    multi.getOrElse(Option(options.get("path")).toSeq)
  }
}

/** Marker: a DSv2 table whose scan supports envelope (bbox) pruning of
  * records at parse time. Lets [[graft.plans.SpatialFilterPushdown]]
  * recognize graft document sources before the scan is built. */
trait GraftSpatialTable extends Table

/** A built scan that can tighten its bbox prune after the fact — the
  * post-pushdown hook for [[graft.plans.SpatialFilterPushdown]] (the
  * `Graft.register` path runs optimizer rules after V2 scan planning,
  * so the rule rewrites the already-built scan). */
trait GraftSpatialScan extends Scan {
  /** Current bbox spec ("x0,y0,x1,y1" or "empty"), if any. */
  def bboxSpec: Option[String]
  /** Same scan with the bbox prune replaced by `spec`. */
  def withBbox(spec: String): Scan
}

/** Real input-size statistics for the optimizer. Without these a DSv2
  * relation weighs in at `spark.sql.defaultSizeInBytes` (Long.MaxValue),
  * so a join between a small document collection and a large fact table
  * can never plan a broadcast-hash join statically — AQE only converts
  * it AFTER the small side has paid a full shuffle write. Raw document
  * bytes are the estimate: XML/JSON markup overhead makes that an upper
  * bound on the flattened row data, so a broadcast decision based on it
  * is safe. HTTP collections answer "unknown" (empty), keeping the
  * conservative default — claiming a size we never measured could
  * broadcast an unbounded network collection. */
trait GraftDocStatistics
  extends org.apache.spark.sql.connector.read.SupportsReportStatistics {
  def files: Seq[String]
  // computed once per scan: one driver-side getFileStatus per document
  private lazy val bytes = DocFiles.bytesOf(files)
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong = bytes
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
    }
}
