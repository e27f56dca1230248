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
}
