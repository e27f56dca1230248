package graft.sources.mongo

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

/** Generated selectors must match the reference's construction templates
  * (extension/mongodb/mongo_extension.ts, extension/json_extension.ts,
  * extension/couchdb/couchdb_extension.ts) so a live-store deployment
  * pushes identical server-side queries. */
class MongoFindGenSpec extends SparkTestBase {

  test("comparison shapes match json_extension's operator table") {
    // reference: json_extension.ts:312
    //   `{"properties.${column}": { "${translation}": ${value} }}`
    assert(MongoFindGen.comparison("nama", "=", "Masjid Raya") ==
      """{"properties.nama": { "$eq": "Masjid Raya" }}""")
    assert(MongoFindGen.comparison("pop", ">", 1000) ==
      """{"properties.pop": { "$gt": 1000 }}""")
    assert(MongoFindGen.comparison("pop", "<=", 2.5) ==
      """{"properties.pop": { "$lte": 2.5 }}""")
  }

  test("mod and $near match mongo_extension's constructors") {
    // reference: mongo_extension.ts:123
    assert(MongoFindGen.modFunction("custkey", 2, 0) ==
      """{ "properties.custkey": { "$mod": [ 2, 0 ] } }""")
    // reference: mongo_extension.ts:129 — degrees × 111.32 km. The float
    // artifact is faithful: JS `5 * 111.32 * 1000` is 556599.9999999999
    // under the same IEEE arithmetic and shortest-round-trip printing
    val gj = """{"type":"Point","coordinates":[106.8,-6.2]}"""
    assert(MongoFindGen.stDistanceNear(gj, "<=", 5.0) ==
      s"""{"geometry" : {"$$near": {"$$geometry": $gj , "$$maxDistance": 556599.9999999999}}}""")
    assert(MongoFindGen.stDistanceNear(gj, ">=", 5.0) ==
      s"""{"geometry" : {"$$near": {"$$geometry": $gj , "$$minDistance": 556599.9999999999}}}""")
    assert(MongoFindGen.stDistanceNear(gj, "=", 1.0).contains("\"$maxDistance\": 111320") &&
      MongoFindGen.stDistanceNear(gj, "=", 1.0).contains("\"$minDistance\": 111320"))
    intercept[IllegalArgumentException](MongoFindGen.stDistanceNear(gj, "<", 5.0))
  }

  test("projection matches constructProjectionQuery") {
    // reference: mongo_extension.ts:154 — _id suppressed, geometry verbatim,
    // properties.* behind $ifNull
    assert(MongoFindGen.projection(Nil) == "{}")
    assert(MongoFindGen.projection(Seq("geometry", "nama")) ==
      """{"_id": 0,"geometry": 1,"properties.nama": { "$ifNull": [ "$properties.nama", null ] }}""")
  }

  test("Spark pushdown filters translate and the selector is valid JSON") {
    val sel = MongoFindGen.selector(Seq(
      EqualTo("kind", "mosque"),
      GreaterThan("capacity", 500),
      In("city", Array("manado", "jakarta"))))
    // parses as strict JSON with the expected operator nesting
    val parsed = spark.range(1).select(
      from_json(lit(sel), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType))).head().getMap[String, String](0)
    assert(parsed.contains("$and"), sel)
    assert(sel.contains("""{"properties.kind": { "$eq": "mosque" }}"""))
    assert(sel.contains("""{"properties.city": {"$in": ["manado", "jakarta"]}}"""))
    // null-handling: strict-JSON version of the reference's IS/IS NOT shapes
    assert(MongoFindGen.fromSparkFilter(IsNull("x")).get.contains("\"$exists\": false"))
    assert(MongoFindGen.fromSparkFilter(EqualNullSafe("x", "y")).isEmpty)
  }

  test("values with quotes/backslashes and large bounds stay parseable JSON") {
    // the deployment's own JSON.parse(where) must survive ANY value
    val sel = MongoFindGen.selector(Seq(EqualTo("name", """Masjid "Raya" C:\x""")))
    val parsed = spark.range(1).select(
      get_json_object(lit(sel), "$['properties.name'].$eq")).head().getString(0)
    assert(parsed == """Masjid "Raya" C:\x""", sel)
    // JS never prints scientific notation below 1e21; Scala's Double
    // switches at 1e7 — a 123.456-degree bound (13743121.92 m, fractional
    // and ≥ 1e7) must print plain, exactly as JSON.stringify does
    val near = MongoFindGen.stDistanceNear("{}", "<=", 123.456)
    assert(near.contains("\"$maxDistance\": 13743121.92"), near)
    assert(!near.contains("E"), near)
  }

  test("CouchDB Mango body paginates the same selector in 25-doc batches") {
    // reference: couchdb_extension.ts:84 — {selector, skip, fields} where
    // the stride walks 25 docs per batch; skip here is the absolute offset
    val sel = MongoFindGen.selector(Seq(EqualTo("kind", "mosque")))
    assert(MongoFindGen.couchQuery(sel, Seq("geometry", "kind"), skip = 0) ==
      s"""{"selector": $sel, "skip": 0, "fields": ["geometry", "kind"]}""")
    assert(MongoFindGen.couchQuery(sel, Nil, skip = 75) ==
      s"""{"selector": $sel, "skip": 75}""")
    // a shrunk capped page must NOT perturb the offset of the next one:
    // the remainder page at offset 25 asks {"skip": 25, "limit": 5}
    assert(MongoFindGen.couchQuery(sel, Nil, skip = 25, limit = Some(5)) ==
      s"""{"selector": $sel, "skip": 25, "limit": 5}""")
  }

  test("the DSv2 scan's pushed filters are exactly what the selector compiles") {
    // graft-geojson fixture: the filters Spark pushes into the scan are the
    // ones a live-Mongo deployment would compile into find()'s first arg
    val d = java.nio.file.Files.createTempDirectory("mongo-gen").toFile
    java.nio.file.Files.writeString(new java.io.File(d, "pts.geojson").toPath,
      Seq(
        """{"type":"Feature","properties":{"kind":"mosque","name":"a"},"geometry":{"type":"Point","coordinates":[1,2]}}""",
        """{"type":"Feature","properties":{"kind":"church","name":"b"},"geometry":{"type":"Point","coordinates":[3,4]}}"""
      ).mkString("\n"))
    val df = spark.read.format("graft-geojson").option("multiLine", "false")
      .load(d.getAbsolutePath).where(col("kind") === "mosque")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(kind,mosque)"), plan)
    assert(df.count() == 1)
    assert(MongoFindGen.selector(Seq(EqualTo("kind", "mosque"))) ==
      """{"properties.kind": { "$eq": "mosque" }}""")
  }
}
