package graft

import graft.geo.GeomSerde
import graft.sources.{GeoJsonSource, Xml}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class EdgeCasesSpec extends SparkTestBase {
  import spark.implicits._

  test("GeoJSON features: missing properties, null geometry, numeric values") {
    val docs = Seq(
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[1.0,2.0]}}""",
      """{"type":"Feature","properties":{"a":1,"b":2.5,"c":null},"geometry":null}""")
    val df = GeoJsonSource.fromDocuments(docs.toDF("json"), "json")
    assert(df.count() == 2)
    val rows = df.orderBy(col("a").asc_nulls_last).collect()
    assert(rows(0).getAs[String]("a") == "1")
    assert(rows(0).getAs[String]("b") == "2.5")
    assert(rows(0).isNullAt(rows(0).fieldIndex("geometry")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("a")))
    assert(rows(1).getAs[Array[Byte]]("geometry") != null)
  }

  test("Xml.read loads a directory of files (one doc per file)") {
    val d = java.nio.file.Files.createTempDirectory("graft-xmlread")
    for (i <- 0 until 3) {
      java.nio.file.Files.writeString(d.resolve(s"f$i.xml"),
        s"<col><rec><name>n$i</name></rec></col>")
    }
    val df = Xml.read(spark, d.toString)
    assert(df.count() == 3)
    assert(df.select("name").collect().map(_.getString(0)).sorted.toSeq == Seq("n0", "n1", "n2"))
  }

  test("rewrite guard: equi + spatial conjunct join is NOT rewritten") {
    SparkEntry.init(spark, sfDir)
    spark.sql("SELECT c_custkey, c_nationkey, ST_Point(c_acctbal / 100.0, 0.0) AS g1 FROM customer")
      .createOrReplaceTempView("eq_a")
    spark.sql("SELECT s_suppkey, s_nationkey, ST_Point(s_acctbal / 100.0, 0.0) AS g2 FROM supplier")
      .createOrReplaceTempView("eq_b")
    val df = spark.sql(
      """SELECT c_custkey, s_suppkey FROM eq_a JOIN eq_b
        |ON c_nationkey = s_nationkey AND ST_DWithin(g1, g2, 5.0)""".stripMargin)
    val p = df.queryExecution.executedPlan.toString
    // hash join on the equi key carries the spatial refine; no grid generate
    assert(!p.contains("Generate explode(gridcells"), p)
    assert(df.count() > 0)
  }

  test("simhash: near-identical texts have small hamming distance") {
    import graft.functions.TextOps
    val a = "spark makes distributed queries fast and scalable for everyone today"
    val b = a + " ok" // small edit
    val ha = TextOps.simhash64(UTF8String.fromString(a))
    val hb = TextOps.simhash64(UTF8String.fromString(b))
    assert(java.lang.Long.bitCount(ha ^ hb) <= 12)
    val c = "completely different content about cats dogs birds and gardening tools"
    val hc = TextOps.simhash64(UTF8String.fromString(c))
    assert(java.lang.Long.bitCount(ha ^ hc) > 12)
  }

  test("rolling fingerprint is robust to prefix edits, md5 is not") {
    import graft.functions.TextOps
    val a = UTF8String.fromString("x" + ("the quick brown fox jumps over the lazy dog " * 4))
    val b = UTF8String.fromString("y" + ("the quick brown fox jumps over the lazy dog " * 4))
    assert(TextOps.rollingFingerprint(a, 16) == TextOps.rollingFingerprint(b, 16))
  }

  test("WKB of empty geometries round-trips") {
    for (wkt <- Seq("POINT EMPTY", "LINESTRING EMPTY", "POLYGON EMPTY", "MULTIPOLYGON EMPTY")) {
      val g = GeomSerde.fromWkt(wkt)
      assert(GeomSerde.fromWkb(GeomSerde.toWkb(g)).isEmpty)
    }
  }

  test("malformed bbox option fails with a clear message") {
    val d = java.nio.file.Files.createTempDirectory("graft-badbbox").toFile
    d.deleteOnExit()
    java.nio.file.Files.writeString(new java.io.File(d, "f.geojson").toPath,
      """{"type":"Feature","properties":{"a":"1"},"geometry":{"type":"Point","coordinates":[0.0,0.0]}}""")
    val e = intercept[Exception] {
      spark.read.format("graft-geojson").option("bbox", "1,2,3")
        .load(d.getAbsolutePath).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("bbox")), e.toString)
  }

  test("quality filter and exact-dup dropper handle empty input") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(operators.TextAnalysis.qualityFilter(empty, "text").count() == 0)
    assert(operators.Dedup.dropExactDuplicates(empty, "doc_id", "text").count() == 0)
  }

  test("knnJoinLsh with empty query side returns no rows") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val out = operators.Ann.knnJoinLsh(embs, "vec_id", "embedding",
      embs.where(lit(false)), "vec_id", "embedding", k = 3)
    assert(out.count() == 0)
  }
}
