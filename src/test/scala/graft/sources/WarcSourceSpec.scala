package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

class WarcSourceSpec extends SparkTestBase {

  private def warcRecord(tpe: String, uri: String, id: String,
                         contentType: String, block: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: $tpe\r\n")
      .append(if (uri != null) s"WARC-Target-URI: $uri\r\n" else "")
      .append("WARC-Date: 2024-01-15T08:30:00Z\r\n")
      .append(s"WARC-Record-ID: <urn:uuid:$id>\r\n")
      .append(s"Content-Type: $contentType\r\n")
      .append(s"Content-Length: ${block.length}\r\n")
      .append("\r\n").toString.getBytes(UTF_8)
    head ++ block ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def httpResponse(status: Int, ctype: String, body: String): Array[Byte] =
    (s"HTTP/1.1 $status OK\r\nContent-Type: $ctype\r\n" +
      s"Content-Length: ${body.getBytes(UTF_8).length}\r\n\r\n").getBytes(UTF_8) ++
      body.getBytes(UTF_8)

  /** warcinfo + request + two responses — the Common Crawl record mix. */
  private def sampleWarc: Array[Byte] =
    warcRecord("warcinfo", null, "aaa", "application/warc-fields",
      "software: graft-test\r\n".getBytes(UTF_8)) ++
    warcRecord("request", "http://a.example/", "bbb", "application/http; msgtype=request",
      "GET / HTTP/1.1\r\nHost: a.example\r\n\r\n".getBytes(UTF_8)) ++
    warcRecord("response", "http://a.example/", "ccc", "application/http; msgtype=response",
      httpResponse(200, "text/html; charset=utf-8", "<html>hello a</html>")) ++
    warcRecord("response", "http://b.example/", "ddd", "application/http; msgtype=response",
      httpResponse(404, "text/plain", "not here"))

  private def writePlain(dir: Path): Unit =
    Files.write(dir.resolve("part-0.warc"), sampleWarc)

  test("parses the Common Crawl record mix with http fields and exact bodies") {
    val dir = Files.createTempDirectory("warc-spec")
    writePlain(dir)
    val df = spark.read.format("graft-warc").load(dir.toString)
    assert(df.count() == 4)
    val resp = df.where(col("warc_type") === "response")
      .orderBy("target_uri")
      .select("target_uri", "record_id", "http_status", "http_content_type", "body")
      .collect()
    assert(resp.map(_.getString(0)).toSeq == Seq("http://a.example/", "http://b.example/"))
    assert(resp.map(_.getString(1)).toSeq == Seq("urn:uuid:ccc", "urn:uuid:ddd"))
    assert(resp.map(_.getInt(2)).toSeq == Seq(200, 404))
    assert(resp.map(_.getString(3)).toSeq ==
      Seq("text/html; charset=utf-8", "text/plain"))
    assert(resp.map(r => new String(r.getAs[Array[Byte]](4), UTF_8)).toSeq ==
      Seq("<html>hello a</html>", "not here"))
    // non-http records carry the raw block and null http fields
    val info = df.where(col("warc_type") === "warcinfo").head()
    assert(info.isNullAt(info.fieldIndex("http_status")))
    assert(new String(info.getAs[Array[Byte]]("body"), UTF_8) == "software: graft-test\r\n")
  }

  test("concatenated per-record gzip members decompress transparently") {
    val dir = Files.createTempDirectory("warc-gz")
    def gz(b: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(b); g.close()
      out.toByteArray
    }
    // one gzip member per record — the Common Crawl layout
    val members = Seq(
      warcRecord("response", "http://x.example/", "eee", "application/http; msgtype=response",
        httpResponse(200, "text/plain", "x body")),
      warcRecord("response", "http://y.example/", "fff", "application/http; msgtype=response",
        httpResponse(200, "text/plain", "y body"))).map(gz)
    Files.write(dir.resolve("part-0.warc.gz"), members.flatten.toArray)
    val df = spark.read.format("graft-warc").load(dir.toString)
    assert(df.count() == 2)
    assert(df.select("target_uri").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("http://x.example/", "http://y.example/"))
  }

  test("header filters push down and block bytes are skipped for rejected records") {
    val dir = Files.createTempDirectory("warc-push")
    writePlain(dir)
    val f = spark.read.format("graft-warc").load(dir.toString)
      .where(col("warc_type") === "response" && col("target_uri").startsWith("http://a"))
    assert(f.queryExecution.executedPlan.toString.contains("PushedFilters: ["), f.queryExecution.executedPlan.toString)
    assert(f.queryExecution.executedPlan.toString.contains("EqualTo(warc_type,response)"))
    assert(f.count() == 1)
    assert(new String(f.head().getAs[Array[Byte]]("body"), UTF_8) == "<html>hello a</html>")
    // http_status filters are NOT header-decidable → stay with Spark
    val plan2 = spark.read.format("graft-warc").load(dir.toString)
      .where(col("http_status") === 200).queryExecution.executedPlan.toString
    assert(!plan2.contains("PushedFilters: [EqualTo(http_status"), plan2)
  }

  test("column pruning: header-only projections read no blocks") {
    val dir = Files.createTempDirectory("warc-prune")
    writePlain(dir)
    val df = spark.read.format("graft-warc").load(dir.toString)
      .select("warc_type", "target_uri", "content_length")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("[warc_type#") && !plan.contains("body#"), plan)
    assert(df.count() == 4)
    // content_length still reports the block size the scan skipped
    assert(df.where(col("warc_type") === "warcinfo").head().getLong(2) ==
      "software: graft-test\r\n".getBytes(UTF_8).length)
  }

  test("streaming ingest: each micro-batch reads only the files that landed") {
    val dir = Files.createTempDirectory("warc-stream")
    def respOnly(uri: String, id: String, body: String): Array[Byte] =
      warcRecord("response", uri, id, "application/http; msgtype=response",
        httpResponse(200, "text/html", body))
    Files.write(dir.resolve("seg-0.warc"), respOnly("http://a.example/", "aa", "<p>alpha</p>"))
    val q = spark.readStream.format("graft-warc").load(dir.toString)
      .where(col("warc_type") === "response")
      .select(col("target_uri"),
        graft.operators.TextAnalysis.htmlToText(col("body").cast("string")).as("text"))
      .writeStream.format("memory").queryName("warc_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("warc-stream-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val batch1 = spark.table("warc_stream").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(batch1 == Set(("http://a.example/", "alpha")))
      // a new segment lands: the next batch reads ONLY it
      Files.write(dir.resolve("seg-1.warc"), respOnly("http://b.example/", "bb", "<p>beta</p>"))
      q.processAllAvailable()
      val all = spark.table("warc_stream").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(all == Set(("http://a.example/", "alpha"), ("http://b.example/", "beta")))
    } finally q.stop()
  }

  test("a truncated block fails loudly even on the SKIP path (seek past EOF)") {
    // file ends mid-block of a record whose block is only SKIPPED
    // (header-only projection): FileInputStream.skip seeks past EOF and
    // claims success, so the parser must probe — a silent partial scan
    // here would be corrupted training data
    val dir = Files.createTempDirectory("warc-trunc-skip")
    val bytes = sampleWarc
    Files.write(dir.resolve("part-0.warc"), bytes.take(bytes.length - 30))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-warc").load(dir.toString)
        .select("warc_type").collect() // no body → skip path
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("truncated")), messages(e))
  }

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)

  private def expectFail(name: String, bytes: Array[Byte], gzipped: Boolean,
                         needles: Seq[String], cols: Seq[String]): Unit = {
    val dir = Files.createTempDirectory(s"warc-fuzz-$name")
    Files.write(dir.resolve(if (gzipped) "part-0.warc.gz" else "part-0.warc"),
      bytes)
    val e = intercept[Exception] {
      spark.read.format("graft-warc").load(dir.toString)
        .select(cols.head, cols.tail: _*).collect()
    }
    val ms = messages(e).mkString(" | ").toLowerCase(java.util.Locale.ROOT)
    assert(needles.exists(n => ms.contains(n.toLowerCase(java.util.Locale.ROOT))),
      s"$name: got [$ms], wanted one of $needles")
  }

  test("hostile inputs fuzz: truncated gzip members, lying Content-Length, " +
      "2 GiB declared blocks, malformed headers — every case rejects " +
      "LOUDLY, never a silent partial scan (the VideoMetaSpec discipline)") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(b); g.close()
      out.toByteArray
    }
    def record(contentLength: String, block: Array[Byte]): Array[Byte] =
      ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:z>\r\n" +
        s"Content-Length: $contentLength\r\n\r\n").getBytes(UTF_8) ++
        block ++ "\r\n\r\n".getBytes(UTF_8)

    // a gzip member cut mid-DEFLATE: the decompressor's own loud EOF
    val member = gz(sampleWarc)
    expectFail("gz-truncated", member.take(member.length / 2), gzipped = true,
      Seq("zlib", "truncated", "unexpected end", "eof", "corrupt", "premature"),
      Seq("body"))
    // a VALID gzip member whose record lies: Content-Length 5000, 20 bytes
    // present — the truncation must surface through the decompressed view
    expectFail("gz-lying-length", gz(record("5000", new Array[Byte](20))),
      gzipped = true, Seq("truncated warc block"), Seq("body"))
    // ~2 GiB declared with the body projected: the materialization guard
    expectFail("declared-2gib", record("2147483647", new Array[Byte](8)),
      gzipped = false, Seq("2 gib materialization limit"), Seq("body"))
    // same declaration on the header-only SKIP path: seek-past-EOF probe
    expectFail("declared-2gib-skip", record("2147483647", new Array[Byte](8)),
      gzipped = false, Seq("truncated warc block"), Seq("warc_type"))
    // negative and non-numeric Content-Length
    expectFail("negative-length", record("-5", Array.empty), gzipped = false,
      Seq("negative warc content-length"), Seq("warc_type"))
    expectFail("nan-length", record("xyz", Array.empty), gzipped = false,
      Seq("without a numeric content-length"), Seq("warc_type"))
    // header line without a colon
    expectFail("no-colon",
      "WARC/1.0\r\nThisIsNotAHeader\r\n\r\n".getBytes(UTF_8), gzipped = false,
      Seq("malformed warc header"), Seq("warc_type"))
    // garbage instead of a version line
    expectFail("no-version",
      "HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8), gzipped = false,
      Seq("expected warc version line"), Seq("warc_type"))
    // EOF inside the header block (no terminating blank line)
    expectFail("eof-in-headers",
      "WARC/1.0\r\nWARC-Type: response\r\n".getBytes(UTF_8), gzipped = false,
      Seq("truncated warc header block"), Seq("warc_type"))

    // sanity: a well-formed file still parses after all the guards
    val ok = Files.createTempDirectory("warc-fuzz-ok")
    Files.write(ok.resolve("part-0.warc"), sampleWarc)
    assert(spark.read.format("graft-warc").load(ok.toString).count() == 4)
  }

  test("a truncated record fails loudly instead of silently dropping the tail") {
    val dir = Files.createTempDirectory("warc-trunc")
    val bytes = sampleWarc
    Files.write(dir.resolve("part-0.warc"), bytes.take(bytes.length - 40))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-warc").load(dir.toString)
        .select("body").collect()
    }
    assert(e.getMessage.contains("truncated") ||
      Option(e.getCause).exists(_.getMessage.contains("truncated")), e.getMessage)
  }
}
