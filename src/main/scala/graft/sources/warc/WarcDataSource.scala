package graft.sources.warc

import graft.sources.{DocFiles, StringFilterEval}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.io.{EOFException, InputStream}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** DataSource V2 for WARC web-archive files (ISO 28500) — the Common
  * Crawl container format, i.e. the raw-ingest end of a web-scale
  * training-data pipeline:
  *
  * {{{
  *   spark.read.format("graft-warc")
  *     .load("/crawl/segments")            // or a "….warc.gz" glob
  *     .where(col("warc_type") === "response")
  *     .select("target_uri", "http_status", "body")
  * }}}
  *
  * Fixed schema: `warc_type`, `target_uri`, `warc_date`, `record_id`,
  * `content_type`, `content_length`, and — for `application/http`
  * blocks — `http_status`, `http_content_type`, plus the payload `body`
  * (the HTTP message body for http blocks, the raw block otherwise).
  *
  * Scale shape (100 TB): ONE input partition per file — exactly the
  * Common Crawl layout (~1 GB `.warc.gz` per file, tens of thousands of
  * files per crawl), because per-record-gzip members are not
  * byte-splittable without an external index. Filters over the RECORD
  * HEADER fields (`warc_type`, `target_uri`, `warc_date`, `record_id`,
  * `content_type`) push down and evaluate BEFORE the block is read, so
  * a `warc_type = 'response'` scan skips every request/metadata payload
  * (`InputStream.skip` over uncompressed bytes; decompress-and-discard
  * on gzip, the format's floor). Column pruning skips all block reads
  * when neither `body` nor the http fields are selected. Concatenated
  * gzip members (Common Crawl writes one member per record) decompress
  * transparently.
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-warc"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new WarcTable(properties.asScala.toMap)
}

object WarcDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("record_id", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("http_status", IntegerType),
    StructField("http_content_type", StringType),
    StructField("body", BinaryType)))

  /** Header fields decided before the record block is read — the only
    * ones eligible for pre-block filter pushdown. */
  val HeaderFields: Set[String] =
    Set("warc_type", "target_uri", "warc_date", "record_id", "content_type")
}

private class WarcTable(properties: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-warc(${properties.getOrElse("path", properties.getOrElse("paths", "?"))})"
  override def schema(): StructType = WarcDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  // listed lazily AND per scan build for streaming: each micro-batch
  // must see newly-landed files
  private def listNow(): Seq[String] =
    DocFiles.listFiles(DocFiles.pathsOf(new CaseInsensitiveStringMap(properties.asJava)))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(listNow(), () => listNow())
}

private class WarcScanBuilder(files: Seq[String], listNow: () => Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = WarcDataSource.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** Accepted = string filters whose every reference is a pre-block
    * header field; they evaluate before the block, skipping its bytes. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, unsupported) = filters.partition(f =>
      StringFilterEval.supports(f) &&
        f.references.forall(WarcDataSource.HeaderFields.contains))
    pushed = supported
    unsupported
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = WarcScan(required, files, pushed, listNow)
}

private[graft] case class WarcScan(required: StructType, files: Seq[String],
                                   pushed: Array[Filter],
                                   listNow: () => Seq[String] = () => Nil)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-warc ${files.length} files, PushedFilters: [${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => WarcInputPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(required, pushed, DocFiles.HttpTimeoutMs)

  /** Streaming ingest: each micro-batch reads the files that LANDED
    * since the last batch (a crawl segment directory filling up). The
    * offset is the set of seen file paths — monotone under re-listing
    * (deleted files stay in the offset), serialized as a sorted JSON
    * array; a production source would compact this log, a cut documented
    * here. Files must be written atomically (rename-in), the standard
    * file-stream contract. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WarcMicroBatchStream(this)
}

private class WarcMicroBatchStream(scan: WarcScan)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset}
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  @volatile private var seen: Set[String] = Set.empty

  private case class WarcOffset(files: Set[String]) extends SOffset {
    override def json(): String =
      mapper.writeValueAsString(files.toArray.sorted)
  }

  private def parse(o: SOffset): Set[String] = o match {
    case WarcOffset(fs) => fs
    case other =>
      val arr = mapper.readTree(other.json())
      val b = Set.newBuilder[String]
      arr.forEach(n => b += n.asText())
      b.result()
  }

  override def initialOffset(): SOffset = WarcOffset(Set.empty)
  override def deserializeOffset(json: String): SOffset = {
    val arr = mapper.readTree(json)
    val b = Set.newBuilder[String]
    arr.forEach(n => b += n.asText())
    WarcOffset(b.result())
  }
  override def latestOffset(): SOffset = {
    seen = seen ++ scan.listNow()
    WarcOffset(seen)
  }
  override def planInputPartitions(start: SOffset, end: SOffset): Array[InputPartition] = {
    val fresh = (parse(end) -- parse(start)).toArray.sorted
    fresh.map(f => WarcInputPartition(f): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(scan.readSchema(), scan.pushed, DocFiles.HttpTimeoutMs)
  override def commit(end: SOffset): Unit = ()
  override def stop(): Unit = ()
}

private case class WarcInputPartition(file: String) extends InputPartition

private case class WarcReaderFactory(schema: StructType, filters: Array[Filter],
                                     httpTimeoutMs: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[WarcInputPartition].file
    new PartitionReader[InternalRow] {
      // the http/body fields live inside the block; header-only
      // projections skip every block's bytes
      private val needBlock = schema.fieldNames.exists(
        n => n == "body" || n == "http_status" || n == "http_content_type")
      private val raw = DocFiles.openDocStream(file, httpTimeoutMs)
      private val in: InputStream =
        if (file.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw, 64 * 1024)
        else raw
      private val records = WarcParser.records(in, file, filters.toIndexedSeq, needBlock)
      private var current: WarcParser.Record = _

      override def next(): Boolean = {
        val more = records.hasNext
        if (more) current = records.next()
        more
      }

      override def get(): InternalRow = {
        val r = current
        InternalRow.fromSeq(schema.fieldNames.toSeq.map {
          case "warc_type"      => r.headers.get("warc-type").map(UTF8String.fromString).orNull
          case "target_uri"     => r.headers.get("warc-target-uri").map(UTF8String.fromString).orNull
          case "warc_date"      => r.headers.get("warc-date").map(UTF8String.fromString).orNull
          case "record_id"      => r.headers.get("warc-record-id")
            .map(v => UTF8String.fromString(v.stripPrefix("<").stripSuffix(">"))).orNull
          case "content_type"   => r.headers.get("content-type").map(UTF8String.fromString).orNull
          case "content_length" => r.contentLength
          case "http_status"       => r.httpStatus.map(Int.box).orNull
          case "http_content_type" => r.httpContentType.map(UTF8String.fromString).orNull
          case "body"              => r.body.orNull
          case other => throw new IllegalArgumentException(s"unknown warc column $other")
        })
      }

      override def close(): Unit = in.close()
    }
  }
}

/** Streaming WARC record parser — plain InputStream in, so it is
  * unit-testable without Spark and runs identically from any stream
  * source. Implements the ISO 28500 framing: a version line
  * (`WARC/1.x`), CRLF header lines (with obs-fold continuation) up to a
  * blank line, `Content-Length` block bytes, then the CRLFCRLF record
  * separator. Truncated files fail loudly — a silent tail-drop in a
  * training-data ingest is corrupted data, not resilience. */
private[warc] object WarcParser {

  final case class Record(headers: Map[String, String], contentLength: Long,
                          httpStatus: Option[Int], httpContentType: Option[String],
                          body: Option[Array[Byte]])

  /** Records of one stream, pushed `filters` evaluated on the header
    * fields BEFORE the block is read; `needBlock=false` skips every
    * accepted record's block too (header-only projections). */
  def records(raw: InputStream, file: String, filters: Seq[Filter],
              needBlock: Boolean): Iterator[Record] = new Iterator[Record] {
    // one pushback byte: skipFully's post-skip EOF probe (see there)
    private val in = new java.io.PushbackInputStream(raw, 1)
    private var nextRecord: Record = _
    private var done = false

    private def fieldMap(h: Map[String, String]): Map[String, String] = Map(
      "warc_type" -> h.getOrElse("warc-type", null),
      "target_uri" -> h.getOrElse("warc-target-uri", null),
      "warc_date" -> h.getOrElse("warc-date", null),
      "record_id" -> h.get("warc-record-id")
        .map(_.stripPrefix("<").stripSuffix(">")).orNull,
      "content_type" -> h.getOrElse("content-type", null))

    private def advance(): Unit = {
      nextRecord = null
      while (nextRecord == null && !done) {
        readHeaders(in, file) match {
          case None => done = true
          case Some(headers) =>
            val len = headers.get("content-length").flatMap(_.toLongOption).getOrElse(
              throw new java.io.IOException(
                s"$file: WARC record without a numeric Content-Length"))
            if (len < 0) throw new java.io.IOException(
              s"$file: negative WARC Content-Length $len")
            val fields = fieldMap(headers)
            if (!filters.forall(StringFilterEval.passes(_, fields))) {
              skipFully(in, len, file)
            } else if (!needBlock) {
              skipFully(in, len, file)
              nextRecord = Record(headers, len, None, None, None)
            } else {
              if (len > Int.MaxValue - 16) throw new java.io.IOException(
                s"$file: WARC block of $len bytes exceeds the 2 GiB " +
                  "materialization limit — project header fields only")
              val block = new Array[Byte](len.toInt)
              readFully(in, block, file)
              val isHttp = headers.get("content-type")
                .exists(_.toLowerCase(java.util.Locale.ROOT).startsWith("application/http"))
              if (isHttp) {
                val (status, ctype, body) = parseHttp(block)
                nextRecord = Record(headers, len, status, ctype, Some(body))
              } else nextRecord = Record(headers, len, None, None, Some(block))
            }
        }
      }
    }

    override def hasNext: Boolean = {
      if (nextRecord == null && !done) advance()
      nextRecord != null
    }

    override def next(): Record =
      if (hasNext) { val r = nextRecord; nextRecord = null; r }
      else Iterator.empty.next()
  }

  /** Reads one record's version + header lines. None = clean EOF before
    * a version line (the end of the file). */
  private def readHeaders(in: InputStream, file: String): Option[Map[String, String]] = {
    // skip the inter-record CRLFs; EOF here is a clean end
    var line = readLine(in)
    while (line != null && line.isEmpty) line = readLine(in)
    if (line == null) return None
    if (!line.startsWith("WARC/"))
      throw new java.io.IOException(s"$file: expected WARC version line, got: $line")
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var lastKey: String = null
    var h = readLine(in)
    while (h != null && h.nonEmpty) {
      if ((h.startsWith(" ") || h.startsWith("\t")) && lastKey != null) {
        headers.update(lastKey, headers(lastKey) + " " + h.trim) // obs-fold
      } else {
        val i = h.indexOf(':')
        if (i <= 0) throw new java.io.IOException(s"$file: malformed WARC header: $h")
        lastKey = h.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
        headers.update(lastKey, h.substring(i + 1).trim)
      }
      h = readLine(in)
    }
    if (h == null) throw new EOFException(s"$file: truncated WARC header block")
    Some(headers.toMap)
  }

  /** An `application/http` block: status line, headers, CRLFCRLF, body. */
  private def parseHttp(block: Array[Byte]): (Option[Int], Option[String], Array[Byte]) = {
    val sep = indexOfCrlfCrlf(block)
    if (sep < 0) return (None, None, block) // headerless http payload: keep raw
    val head = new String(block, 0, sep, java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n")
    val status = lines.headOption.filter(_.startsWith("HTTP/"))
      .flatMap(_.split(" ", 3).lift(1)).flatMap(_.toIntOption)
    val ctype = lines.drop(1).collectFirst {
      case l if l.toLowerCase(java.util.Locale.ROOT).startsWith("content-type:") =>
        l.substring(l.indexOf(':') + 1).trim
    }
    (status, ctype, java.util.Arrays.copyOfRange(block, sep + 4, block.length))
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** One CRLF/LF-terminated line as ISO-8859-1 (WARC headers are ASCII;
    * URIs percent-encode). null = EOF before any byte. */
  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(128)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
    val s = buf.toString(java.nio.charset.StandardCharsets.ISO_8859_1)
    if (s.endsWith("\r")) s.substring(0, s.length - 1) else s
  }

  private def readFully(in: InputStream, out: Array[Byte], file: String): Unit = {
    var off = 0
    while (off < out.length) {
      val n = in.read(out, off, out.length - off)
      if (n < 0) throw new EOFException(
        s"$file: truncated WARC block (got $off of ${out.length} bytes)")
      off += n
    }
  }

  /** Skips exactly `n` block bytes, failing loudly on truncation.
    * `InputStream.skip` cannot be trusted for that: a FileInputStream
    * seeks PAST EOF and reports the full count, which would turn a
    * truncated tail into a silent partial scan — the exact corruption
    * this parser promises to refuse. So: skip() for speed, then verify
    * the stream still has a byte (every ISO 28500 record is followed by
    * its CRLFCRLF separator, so mid-file block ends always have one) and
    * push it back; a post-skip EOF is truncation. */
  private def skipFully(in: java.io.PushbackInputStream, n: Long, file: String): Unit = {
    var left = n
    val buf = new Array[Byte](64 * 1024)
    while (left > 0) {
      val skipped = in.skip(left)
      if (skipped > 0) left -= skipped
      else {
        // streams that cannot seek (gzip at EOF boundary) answer 0: fall
        // back to a draining read so truncation is detected, not looped
        val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
        if (r < 0) throw new EOFException(
          s"$file: truncated WARC block (while skipping, $left bytes short)")
        left -= r
      }
    }
    val probe = in.read()
    if (probe < 0) throw new EOFException(
      s"$file: truncated WARC block (skip ran past end of file)")
    in.unread(probe)
  }
}
