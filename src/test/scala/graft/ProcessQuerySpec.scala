package graft

class ProcessQuerySpec extends SparkTestBase {

  test("processQuery mirrors the reference's SQL-in, GeoJSON-out flow") {
    SparkEntry.init(spark, sfDir)
    val res = Graft.processQuery(spark,
      """SELECT c_name, ST_AsGeoJSON(ST_Point(c_acctbal / 100.0, 1.0)) AS st_asgeojson
        |FROM customer ORDER BY c_custkey LIMIT 3""".stripMargin)
    assert(res.df.count() == 3)
    assert(res.geoJson.isDefined)
    val fc = res.geoJson.get
    assert(fc.startsWith("""{"type":"FeatureCollection""""))
    assert(fc.contains(""""type":"Point""""))
    assert(fc.contains(""""c_name""""))
  }

  test("processQuery without geojson projection returns no FeatureCollection") {
    SparkEntry.init(spark, sfDir)
    val res = Graft.processQuery(spark, "SELECT count(*) AS n FROM customer")
    assert(res.geoJson.isEmpty && res.df.head().getLong(0) > 0)
  }

  test("reference workflow end-to-end: GeoJSON files -> spatial SQL -> FeatureCollection") {
    // the full reference pipeline in one pass: a GeoJSON document lake read
    // as a DSv2 table, PostGIS-flavored SQL with a spatial predicate, and
    // the result re-emitted as a FeatureCollection (src/index.ts:349 -> :323)
    val d = java.nio.file.Files.createTempDirectory("graft-e2e").toFile
    d.deleteOnExit()
    java.nio.file.Files.writeString(new java.io.File(d, "pois.geojson").toPath,
      """{"type":"FeatureCollection","features":[
        |  {"type":"Feature","properties":{"name":"museum","city":"bandung"},"geometry":{"type":"Point","coordinates":[107.61,-6.90]}},
        |  {"type":"Feature","properties":{"name":"harbor","city":"jakarta"},"geometry":{"type":"Point","coordinates":[106.81,-6.10]}},
        |  {"type":"Feature","properties":{"name":"park","city":"bandung"},"geometry":{"type":"Point","coordinates":[107.60,-6.91]}}
        |]}""".stripMargin)
    spark.read.format("graft-geojson").load(d.getAbsolutePath)
      .createOrReplaceTempView("pois")
    val res = Graft.processQuery(spark,
      """SELECT name, city, ST_AsGeoJSON(geometry) AS st_asgeojson
        |FROM pois
        |WHERE ST_DWithin(geometry, ST_Point(107.6, -6.9), 0.1)
        |ORDER BY name""".stripMargin)
    assert(res.df.count() == 2) // museum + park; harbor is ~1 degree away
    val fc = res.geoJson.get
    assert(fc.contains(""""name":"museum"""") && fc.contains(""""name":"park""""))
    assert(!fc.contains("harbor"))
    // round-trips through the GeoJSON reader
    assert(graft.sources.GeoJsonSource.flattenFeature(fc).length == 2)
  }
}
