package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("htmlToText strips markup, decodes entities, and keeps word boundaries") {
    import spark.implicits._
    val rows = Seq(
      ("<html><head><script>if (a < b) { x = \"</p>\"; }</script>" +
        "<style>h1 { font: x; }</style></head>" +
        "<body><!-- ad --><h1>Title</h1><p>one</p><p>two &amp;amp; three</p>" +
        "<span>a&nbsp;b</span> &lt;tag&gt; &#39;q&#39;</body></html>",
       "Title one two &amp; three a b <tag> 'q'"),
      ("plain text, no markup", "plain text, no markup"),
      ("  spaced\n\nout\ttext  ", "spaced out text"))
    val got = rows.map(_._1).toDF("h")
      .select(TextAnalysis.htmlToText(col("h")).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(got == rows.map(_._2), got)
    // null in, null out (expression semantics)
    assert(Seq((null: String)).toDF("h")
      .select(TextAnalysis.htmlToText(col("h"))).head.isNullAt(0))
    // composition: WARC response bodies -> extracted text (the ingest
    // pipeline's first two stages chained)
    val dir = java.nio.file.Files.createTempDirectory("warc-html")
    val body = "<html><body><p>hello&nbsp;crawl</p></body></html>"
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$body").getBytes("UTF-8")
    val rec = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://w.example/\r\n" +
      s"WARC-Record-ID: <urn:uuid:x>\r\nContent-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++ http ++ "\r\n\r\n".getBytes("UTF-8")
    java.nio.file.Files.write(dir.resolve("a.warc"), rec)
    val text = spark.read.format("graft-warc").load(dir.toString)
      .where(col("warc_type") === "response")
      .select(TextAnalysis.htmlToText(col("body").cast("string")).as("t"))
      .head.getString(0)
    assert(text == "hello crawl")
  }

  test("normalizeUrl canonicalizes and urlDomain extracts the registered domain") {
    import spark.implicits._
    val cases = Seq(
      ("HTTP://WWW.X.COM:80/a?b=2&a=1#f", "http://www.x.com/a?a=1&b=2", "x.com"),
      ("https://Api.Sub.Example.ORG:443", "https://api.sub.example.org/", "example.org"),
      ("https://h.io:8443/p", "https://h.io:8443/p", "h.io"), // non-default port kept
      // PSL multi-label suffixes (bundled snapshot)
      ("http://one.two.co.uk/", "http://one.two.co.uk/", "two.co.uk"),
      ("https://news.BBC.co.uk/sport", "https://news.bbc.co.uk/sport", "bbc.co.uk"),
      ("http://a.com.au/", "http://a.com.au/", "a.com.au"),
      ("https://x.y.blogspot.com/p", "https://x.y.blogspot.com/p", "y.blogspot.com"),
      ("https://user.github.io/repo", "https://user.github.io/repo", "user.github.io"),
      // wildcard registry *.ck: every label under ck is a suffix...
      ("http://shop.acme.ck/", "http://shop.acme.ck/", "shop.acme.ck"),
      // ...EXCEPT the !www.ck exception, which is itself registrable
      ("http://pages.www.ck/", "http://pages.www.ck/", "www.ck"),
      // host that IS a public suffix has no registered domain
      ("http://co.uk/", "http://co.uk/", null),
      ("http://x.com/path", "http://x.com/path", "x.com"),
      ("ftp://x.com/a", "ftp://x.com/a", "x.com"), // non-http passes through
      ("not a url", "not a url", null))
    val got = cases.map(_._1).toDF("u")
      .select(TextAnalysis.normalizeUrl(col("u")), TextAnalysis.urlDomain(col("u")))
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
    assert(got.toSeq == cases.map(c => (c._2, c._3)), got.toSeq)
  }

  test("default matcher compiles the full bundled publicsuffix.org snapshot") {
    import graft.functions.PublicSuffix
    // the resource loaded (not the curated fallback): ~9.5k entries, plus
    // punycode expansions of the Unicode IDN rules
    assert(PublicSuffix.fullRules.size > 9000, PublicSuffix.fullRules.size)
    val m = PublicSuffix.default
    // ICANN rules ABSENT from the curated fallback set
    assert(m.registeredDomain("shop.acme.com.gh") == "acme.com.gh")
    assert(m.registeredDomain("a.b.co.zw") == "b.co.zw")
    // *.jp geographic wildcard + its city exception
    assert(m.registeredDomain("www.x.chuo.kobe.jp") == "x.chuo.kobe.jp")
    assert(m.registeredDomain("www.city.kobe.jp") == "city.kobe.jp")
    // private-section rules absent from the fallback: each CDN/tenant
    // host is its own registrable domain
    assert(m.registeredDomain("d1111.cloudfront.net") == "d1111.cloudfront.net")
    assert(m.registeredDomain("a.d1111.cloudfront.net") == "d1111.cloudfront.net")
    // Unicode IDN rule matched through its punycode form (公司.cn =
    // xn--55qx5d.cn — wire-form hosts are punycoded)
    assert(m.registeredDomain("shop.foo.xn--55qx5d.cn") == "foo.xn--55qx5d.cn")
    // ...and through its Unicode form for callers that didn't punycode
    assert(m.registeredDomain("shop.foo.公司.cn") == "foo.公司.cn")
    // last-two-labels fallback still applies to suffixes the list lacks
    assert(m.registeredDomain("a.b.madeup-tld") == "b.madeup-tld")
  }

  test("urlDomain custom PSL rules and the registered_domain SQL surface") {
    import spark.implicits._
    graft.Graft.register(spark)
    // caller-supplied rules override the snapshot: a full publicsuffix.org
    // file's lines go through the same path
    val rules = Seq("// comment", "", "co.example", "*.wild", "!ok.wild")
    val got = Seq("http://a.b.co.example/", "http://deep.x.wild/",
        "http://sub.ok.wild/", "http://plain.org/")
      .toDF("u")
      .select(TextAnalysis.urlDomain(col("u"), rules))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    // co.example is a suffix; *.wild makes x.wild a suffix; !ok.wild is
    // registrable; plain.org falls back to the default rule
    assert(got == Seq("b.co.example", "deep.x.wild", "ok.wild", "plain.org"), got)
    // SQL: bare-host lookup, mixed case tolerated, suffix-only host -> ''
    val sql = spark.sql(
      "SELECT registered_domain('News.BBC.co.uk'), registered_domain('co.uk'), " +
      "registered_domain('a.b.co.example', 'co.example')")
      .head
    assert(sql.getString(0) == "bbc.co.uk" && sql.getString(1) == "" &&
      sql.getString(2) == "b.co.example", sql.toString)
    // non-foldable rules argument is rejected with a clear message
    val e = intercept[Exception] {
      Seq("h").toDF("h").selectExpr("registered_domain(h, h)").collect()
    }
    assert(e.getMessage.contains("foldable"), e.getMessage)
  }

  test("domainFilter blocks by registered domain, keeps unparseable, both shapes agree") {
    import spark.implicits._
    val rows = Seq(
      (1, "https://www.spam.net/x"),       // blocked via subdomain collapse
      (2, "http://SPAM.NET:80/y"),         // blocked case-insensitively
      (3, "https://deep.cdn.spam.net/z"),  // blocked: any depth collapses
      (4, "https://good.com/a"),           // kept
      (5, "not a url"),                    // kept: no domain to veto
      (6, null.asInstanceOf[String]),      // kept: null URL
      (7, "https://spam.network/b"))       // kept: different domain, no prefix match
    val df = rows.toDF("id", "url")
    val bySeq = TextAnalysis.domainFilter(df, "url", Seq("Spam.net"))
    assert(bySeq.select("id").as[Int].collect().sorted.toSeq === Seq(4, 5, 6, 7))
    // the DataFrame (broadcast anti-join) shape answers identically
    val byDf = TextAnalysis.domainFilter(df, "url", Seq("SPAM.NET").toDF("d"), "d")
    assert(byDf.select("id").as[Int].collect().sorted.toSeq === Seq(4, 5, 6, 7))
    assert(byDf.columns.toSeq === Seq("id", "url")) // helper column never escapes
    // literal shape stays join-free (a scan predicate, not a shuffle)
    val plan = bySeq.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    intercept[IllegalArgumentException] { TextAnalysis.domainFilter(df, "url", Seq.empty) }
  }

  test("exact dedup finds planted duplicates") {
    val planted = docs.select($"doc_id", $"text")
      .union(docs.select($"doc_id" + 100000, $"text").limit(5))
    val out = Dedup.exact(planted, "doc_id", "text").where($"dup_count" > 1)
    assert(out.count() == 5)
    // representative is the min id → the original doc
    assert(out.agg(max("keep_id")).head().getLong(0) < 100000)
  }

  test("minhash finds planted near-duplicates") {
    val mutated = docs.limit(3)
      .select(($"doc_id" + 100000).as("doc_id"),
        concat($"text", lit(" tiny edit")).as("text"))
    val planted = docs.select($"doc_id", $"text").union(mutated)
    val pairs = Dedup.minhashPairs(planted, "doc_id", "text",
      shingleK = 5, numHashes = 128, bands = 32, threshold = 0.8)
    val planted3 = pairs.where($"id_b" - $"id_a" === 100000)
    assert(planted3.count() == 3)
    assert(pairs.where($"jaccard" < 0.8).count() == 0)
  }

  test("simhash hamming refine is exact") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 10).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Int]("hamming") <= 10))
  }

  test("embedding pairs refine by true cosine") {
    val pairs = Dedup.embeddingPairs(embs, "vec_id", "embedding", minCosine = 0.1, planes = 4)
    val rows = pairs.collect()
    assert(rows.forall(_.getAs[Double]("cosine") >= 0.1))
  }

  test("brute-force ANN returns the query itself first") {
    val q = embs.where($"vec_id" === 0).select("embedding").head().getSeq[Float](0).toArray
    val top = Ann.bruteForceTopK(embs, "vec_id", "embedding", q, 5).collect()
    assert(top.length == 5)
    assert(top.head.getAs[Long]("id") == 0L)
    assert(math.abs(top.head.getAs[Double]("cosine") - 1.0) < 1e-9)
    // descending
    val sims = top.map(_.getAs[Double]("cosine")).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("kNN join: each query's nearest neighbor is itself") {
    val out = Ann.knnJoin(embs, "vec_id", "embedding",
      embs.where($"vec_id" < 5), "vec_id", "embedding", k = 3)
    assert(out.count() == 15)
    val top1 = out.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy($"cosine".desc, $"id".asc)))
      .where($"rn" === 1)
    top1.collect().foreach(r => assert(r.getAs[Long]("qid") == r.getAs[Long]("id")))
  }

  test("LSH ANN recall: query bucket contains the query") {
    val q = embs.where($"vec_id" === 0).select("embedding").head().getSeq[Float](0).toArray
    val top = Ann.lshTopK(embs, "vec_id", "embedding", q, 5, planes = 8, probes = 1).collect()
    assert(top.nonEmpty)
    assert(top.head.getAs[Long]("id") == 0L)
  }

  test("LSH top-k equals brute-force top-k on a planted-neighbor corpus") {
    // the q_ann_lsh oracle precondition: when every true top-10 member is a
    // near-copy of the query (cosine ≥ 0.9998), probes=1 recall is total and
    // the LSH result must equal the exact scan
    val planted = embs.where($"vec_id" === 0)
      .select(explode(sequence(lit(0), lit(15))).as("j"), $"embedding")
      .select(($"j" + 200000).cast("long").as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i = j, CAST(CAST(x AS DOUBLE) + CAST(0.002 AS DOUBLE) * (j + 1) AS FLOAT), x))")
          .as("embedding"))
    val aug = embs.select($"vec_id".cast("long").as("vec_id"), $"embedding").union(planted)
    val q = embs.where($"vec_id" === 0).select("embedding").head().getSeq[Float](0).toArray
    val lsh = Ann.lshTopK(aug, "vec_id", "embedding", q, 10, planes = 8, probes = 1).collect()
    val bf = Ann.bruteForceTopK(aug, "vec_id", "embedding", q, 10).collect()
    assert(lsh.map(_.getLong(0)).toSeq == bf.map(_.getLong(0)).toSeq)
    lsh.zip(bf).foreach { case (l, b) =>
      assert(math.abs(l.getDouble(1) - b.getDouble(1)) < 1e-12)
    }
  }

  test("kNN join guards the driver-side query collect") {
    val e = intercept[IllegalArgumentException] {
      Ann.knnJoin(embs, "vec_id", "embedding", embs, "vec_id", "embedding",
        k = 3, maxBroadcastQueries = 10)
    }
    assert(e.getMessage.contains("knnJoinLsh"))
  }

  test("kNN LSH join: distributed large-Q path finds each query itself first") {
    // corpus joined against itself: |Q| = |corpus|, nothing collected to the
    // driver; each query's own bucket always contains the query vector
    val out = Ann.knnJoinLsh(embs, "vec_id", "embedding",
      embs, "vec_id", "embedding", k = 3, planes = 8, tables = 4)
    val top1 = out.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy($"cosine".desc, $"id".asc)))
      .where($"rn" === 1)
    assert(top1.count() == embs.count())
    top1.collect().foreach(r => assert(r.getAs[Long]("qid") == r.getAs[Long]("id")))
    // ranking contract matches the exact path where candidates overlap
    assert(out.columns.toSeq == Seq("qid", "id", "cosine"))
  }

  test("clusters: connected components over pair chains") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dropNearDuplicates keeps one representative per near-dup cluster") {
    val base = docs.limit(30).select($"doc_id", $"text")
    val clones = base.limit(4).select(($"doc_id" + 100000).as("doc_id"),
      concat($"text", lit(" x")).as("text"))
    val chain = base.limit(1).select(($"doc_id" + 200000).as("doc_id"),
      concat($"text", lit(" y")).as("text")) // 2nd mutation of doc 0 → 3-cluster
    val planted = base.union(clones).union(chain)
    val kept = Dedup.dropNearDuplicates(planted, "doc_id", "text", threshold = 0.8)
    // every mutant (higher id than its original) is dropped…
    assert(kept.agg(org.apache.spark.sql.functions.max("doc_id")).head().getLong(0) < 100000)
    // …and the kept set matches dedup of the originals alone
    val baseline = Dedup.dropNearDuplicates(base, "doc_id", "text", threshold = 0.8)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet ==
      baseline.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("dropExactDuplicates keeps one row per identical text") {
    val planted = docs.select($"doc_id", $"text")
      .union(docs.select(($"doc_id" + 100000).as("doc_id"), $"text").limit(5))
    val kept = Dedup.dropExactDuplicates(planted, "doc_id", "text")
    assert(kept.count() == docs.count())
    assert(kept.agg(max("doc_id")).head().getLong(0) < 100000) // originals kept
  }

  test("qualityFilter applies all bounds as scan-level predicates") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then keeps going for a while " * 4),
      (2L, "x"), // too short
      (3L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) " * 10), // punct-heavy
      (4L, ("a" * 500) + " " + ("b" * 500)) // mean word length too high
    ).toDF("doc_id", "text")
    val kept = TextAnalysis.qualityFilter(corpus, "text",
      minChars = 50, minTokens = 5, maxPunctRatio = 0.2).collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("decontaminate flags n-gram overlap with the benchmark, broadcast-planned") {
    val benchmark = Seq(
      (100L, "What is the capital of France Paris is the answer")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // leaked: shares the 8-gram "what is the capital of france paris is"
      (1L, "trivia dump: what is the capital of France Paris is where it ends up"),
      // clean: overlapping words but no shared 8-gram
      (2L, "the capital of Germany is Berlin and France is elsewhere entirely"),
      // shorter than 8 words: no n-grams at all
      (3L, "capital of France")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(corpus, benchmark, "doc_id", "text")
    // the benchmark n-gram set must broadcast — the corpus side stays
    // map-side with no shuffle before the hit count
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.keySet == Set(1L), rows)
    assert(rows(1L) >= 1)
    // case-insensitivity: the leak is detected across casing differences
    val shouted = corpus.withColumn("text", upper($"text"))
    assert(TextAnalysis.decontaminate(shouted, benchmark, "doc_id", "text")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // minOverlap raises the bar past a single shared n-gram
    assert(TextAnalysis.decontaminate(corpus, benchmark, "doc_id", "text",
      minOverlap = 100).count() == 0)
  }

  test("prepared benchmark handle matches one-shot decontaminate and reuses its cache") {
    val benchmark = Seq(
      (100L, "What is the capital of France Paris is the answer")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "trivia dump: what is the capital of France Paris is where it ends up"),
      (2L, "the capital of Germany is Berlin and France is elsewhere entirely")
    ).toDF("doc_id", "text")
    val oneShot = TextAnalysis.decontaminate(corpus, benchmark, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prepared = TextAnalysis.prepareBenchmark(benchmark, "text")
    try {
      val viaHandle = TextAnalysis.decontaminate(corpus, prepared, "doc_id", "text", 1)
      assert(viaHandle.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == oneShot)
      // the handle's eval side is cached: the second call's plan reads it
      val plan = TextAnalysis.decontaminate(corpus, prepared, "doc_id", "text", 1)
        .queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), plan)
    } finally prepared.release()
  }

  test("decontaminate composes with Structured Streaming via the prepared probe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val benchmark = Seq(
      (100L, "What is the capital of France Paris is the answer")
    ).toDF("doc_id", "text")
    // the prepared probe is a cached batch frame joined by broadcast —
    // stream-compatible by construction (stateless per micro-batch)
    val prepared = TextAnalysis.prepareBenchmark(benchmark, "text")
    val ms = MemoryStream[(Long, String)]
    val stream = TextAnalysis.decontaminate(
      ms.toDF().toDF("doc_id", "text"), prepared, "doc_id", "text", 1)
    val q = stream.writeStream.format("memory").queryName("decon_stream")
      .outputMode("complete").start() // aggregation → complete mode
    try {
      ms.addData(
        (1L, "trivia dump: what is the capital of France Paris is where it ends up"),
        (2L, "the capital of Germany is Berlin and France is elsewhere entirely"))
      q.processAllAvailable()
      val hits = spark.table("decon_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(hits.keySet == Set(1L) && hits(1L) >= 1)
    } finally { q.stop(); prepared.release() }
  }

  test("bigram LM score ranks in-domain text above gibberish") {
    val model = TextAnalysis.bigramModel(docs, "text", topK = 20000)
    assert(model.bigrams.nonEmpty && model.unigrams.nonEmpty)
    val probe = Seq(
      // stitched from the corpus' own most frequent bigrams → in-domain
      (1L, model.bigrams.toSeq.sortBy(-_._2).take(20)
        .map { case ((a, b), _) => s"$a $b" }.mkString(" ")),
      (2L, "zq xv qq kjh wpl zzz vbn mmq lop qwe rty uio")).toDF("doc_id", "text")
    val scores = TextAnalysis.lmScore(probe, "text", model)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("lm_logprob")).toMap
    assert(scores(1L) > scores(2L),
      s"in-domain ${scores(1L)} should beat gibberish ${scores(2L)}")
  }

  test("corpusStats one-pass sketch percentiles") {
    val s = TextAnalysis.corpusStats(docs, "text").head()
    assert(s.getAs[Long]("n_docs") == docs.count())
    assert(s.getAs[Long]("total_tokens") > 0)
    val p = s.getSeq[Long](s.fieldIndex("chars_p10_50_90_99"))
    assert(p.length == 4 && p(0) <= p(1) && p(1) <= p(2) && p(2) <= p(3))
  }

  test("text quality report computes sane ranges") {
    val rep = TextAnalysis.qualityReport(docs.limit(50), "doc_id", "text").collect()
    assert(rep.length == 50)
    rep.foreach { r =>
      assert(r.getAs[Double]("punct_ratio") >= 0.0 && r.getAs[Double]("punct_ratio") <= 1.0)
      assert(r.getAs[Double]("stopword_ratio") >= 0.0 && r.getAs[Double]("stopword_ratio") <= 1.0)
      assert(r.getAs[Int]("n_tokens_ws") > 0)
      assert(r.getAs[String]("fp_md5").length == 32)
    }
  }

  test("lang_id detects stopword-bearing languages") {
    val samples = Seq(
      ("the cat is on the mat and it is warm", "en"),
      ("der Hund ist nicht mit der Katze", "de"),
      ("le chat est dans la maison avec les souris", "fr"),
      ("el perro es una mascota y no es gato", "es"),
      ("yang penting adalah dengan tidak untuk itu", "id")).toDF("text", "expected")
    val out = samples.select($"expected", TextAnalysis.langId($"text").as("got")).collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("multimodal decode is deterministic and preserves rows") {
    val media = docs.limit(20).select($"doc_id", encode($"text", "UTF-8").as("media"))
    val out = Multimodal.decodeMeta(media, "media")
    assert(out.count() == 20)
    val r = out.orderBy("doc_id").head()
    val meta = r.getStruct(r.fieldIndex("media_meta"))
    assert(meta.getAs[String]("mime").startsWith("image/"))
    assert(meta.getAs[Long]("n_bytes") > 0)
  }

  test("ImageIoDecoder reads real PNG/JPEG headers, falls back on non-images") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      (1L, png(17, 23)),
      (2L, png(640, 480)),
      (3L, "definitely not an image".getBytes("UTF-8"))).toDF("doc_id", "media")
    val out = Multimodal.decodeMeta(media, "media", Multimodal.ImageIoDecoder)
      .select($"doc_id", $"media_meta.mime", $"media_meta.width", $"media_meta.height")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) == (("image/png", 17, 23)))
    assert(out(2L) == (("image/png", 640, 480)))
    assert(out(3L)._1.startsWith("image/")) // deterministic stub fallback
  }

  test("decodeAudioMeta reads real WAV/AIFF headers, sentinel zeros otherwise") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def audio(kind: AudioFileFormat.Type, rate: Float, channels: Int, frames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, channels, true, kind == AudioFileFormat.Type.AIFF)
      val pcm = new Array[Byte](frames * fmt.getFrameSize)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, kind, out)
      out.toByteArray
    }
    val media = Seq(
      (1L, audio(AudioFileFormat.Type.WAVE, 44100f, 2, 4410)), // 0.1 s stereo
      (2L, audio(AudioFileFormat.Type.AIFF, 8000f, 1, 16000)), // 2 s mono
      (3L, "definitely not audio".getBytes("UTF-8"))).toDF("doc_id", "media")
    val out = Multimodal.decodeAudioMeta(media, "media")
      .select($"doc_id", $"audio_meta.mime", $"audio_meta.sample_rate",
        $"audio_meta.channels", $"audio_meta.frames", $"audio_meta.duration_sec")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), r.getInt(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(1L)._1 == "audio/wav")
    assert(out(1L)._2 == 44100.0 && out(1L)._3 == 2 && out(1L)._4 == 4410L)
    assert(math.abs(out(1L)._5 - 0.1) < 1e-6)
    assert(out(2L)._1 == "audio/aiff")
    assert(out(2L)._2 == 8000.0 && out(2L)._3 == 1)
    assert(math.abs(out(2L)._5 - 2.0) < 1e-6)
    // non-audio payload: total operator, all-zero sentinel
    assert(out(3L) == (("application/octet-stream", 0.0, 0, 0L, 0.0)))
  }

  test("hostile image/audio headers fuzz: truncated files, lying chunk " +
      "sizes, ~2 GiB declared payloads — decoders stay total and " +
      "header-bounded (the VideoMetaSpec discipline)") {
    // ---- images ----
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val whole = png(40, 30)
    def img(b: Array[Byte]) = Multimodal.ImageIoDecoder.decode(b)
    // signature-only and mid-IHDR truncations: no escape, stub fallback
    // (mime still image/* — the decoder's totality contract)
    for (cut <- Seq(0, 1, 8, 12, 20)) {
      val (m, w, h) = img(whole.take(cut))
      assert(m.startsWith("image/"), s"cut=$cut -> $m ($w x $h)")
    }
    // IHDR lying about width (2^30 pixels): header-only decode must
    // return WITHOUT allocating pixel rows — either the parsed huge
    // header or the stub fallback (if the reader rejects the CRC), never
    // an OOM or escaped exception. IHDR width = bytes 16..19.
    val lying = whole.clone()
    lying(16) = 0x40.toByte; lying(17) = 0; lying(18) = 0; lying(19) = 0
    val (lm, lw, _) = img(lying)
    assert(lm.startsWith("image/") && (lw == (1 << 30) || lw < 1024),
      s"$lm $lw")

    // ---- audio ----
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def ascii(s: String) = s.getBytes("US-ASCII")
    /** PCM WAV header declaring `dataLen` payload bytes, carrying none. */
    def wavHeader(dataLen: Int): Array[Byte] =
      ascii("RIFF") ++ le32(36 + dataLen) ++ ascii("WAVE") ++
        ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
        le32(44100 * 4) ++ le16(4) ++ le16(16) ++
        ascii("data") ++ le32(dataLen)
    def aud(b: Array[Byte]) = Multimodal.AudioHeaderDecoder.decode(b)
    val S = ("application/octet-stream", 0.0, 0, 0L, 0.0)

    // ~2 GiB declared data with ZERO bytes present: the header parse must
    // report the declared frames (header math only — nothing allocates,
    // nothing reads past the header) and return promptly
    val lyingWav = wavHeader(0x7ffffff0)
    val (am, rate, ch, frames, dur) = aud(lyingWav)
    assert(am == "audio/wav" && rate == 44100.0 && ch == 2)
    assert(frames == 0x7ffffff0L / 4)
    assert(math.abs(dur - frames / 44100.0) < 1e-6)
    // truncations at every boundary: RIFF tag only, mid-fmt, before data
    for (cut <- Seq(2, 4, 10, 16, 25, 40)) {
      assert(aud(wavHeader(100).take(cut)) == S, s"cut=$cut")
    }
    // fmt chunk lying about its own size (3 bytes: shorter than any PCM
    // header) and a RIFF size smaller than its children
    assert(aud(ascii("RIFF") ++ le32(8) ++ ascii("WAVE") ++ ascii("fmt ") ++
      le32(3) ++ Array[Byte](1, 0, 2)) == S)
    // zero-channel / zero-rate PCM header: division guards must hold
    val zeroFmt = ascii("RIFF") ++ le32(36) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(0) ++ le32(0) ++
      le32(0) ++ le16(0) ++ le16(16) ++ ascii("data") ++ le32(0)
    val z = aud(zeroFmt)
    assert(z == S || (z._1 == "audio/wav" && z._5 == 0.0), z.toString)
  }

  test("resizeImage scales real images and passes through non-images") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      (1L, png(100, 60)), // downscale to 50x30
      (2L, png(20, 10)),  // already under maxDim: untouched bytes
      (3L, "plain text".getBytes("UTF-8"))).toDF("doc_id", "media")
    val out = Multimodal.resizeImage(media, "media", maxDim = 50)
    val meta = Multimodal.decodeMeta(
        out.select($"doc_id", $"media_resized".as("media")), "media",
        Multimodal.ImageIoDecoder)
      .select($"doc_id", $"media_meta.width", $"media_meta.height")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(meta(1L) == ((50, 30)))
    assert(meta(2L) == ((20, 10)))
    val passthrough = out.where($"doc_id" === 3).select("media_resized")
      .head().getAs[Array[Byte]](0)
    assert(new String(passthrough, "UTF-8") == "plain text")
  }

  test("multimodal resize and feature extraction plumbing") {
    val media = docs.limit(10).select($"doc_id", encode($"text", "UTF-8").as("media"))
    val resized = Multimodal.resizeStub(media, "media", targetBytes = 32)
    assert(resized.where(length($"media_resized") > 0).count() == 10)
    val feats = Multimodal.extractFeatures(media, "media", dim = 8)
    val v = feats.head().getSeq[Float](2)
    assert(v.length == 8)
    assert(math.abs(v.map(x => x * x).sum - 1.0f) < 1e-3) // normalized
    // features feed the ANN kernel directly
    val sim = feats.select(graft.dsl.cosine_similarity($"features", $"features").as("s"))
      .head().getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-9)
  }

  test("multimodal frame sampling emits n frames per blob") {
    val media = docs.limit(4).select($"doc_id", encode($"text", "UTF-8").as("media"))
    val frames = Multimodal.sampleFrames(media, "doc_id", "media", 3)
    assert(frames.count() == 12)
    assert(frames.where(length($"frame_bytes") > 0).count() == 12)
  }
}
