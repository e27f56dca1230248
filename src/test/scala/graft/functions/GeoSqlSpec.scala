package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** End-to-end SQL interface tests: every registered ST_* function callable
  * from spark.sql — the reference's user-facing surface. */
class GeoSqlSpec extends SparkTestBase {

  private def one(sql: String): Any = spark.sql(s"SELECT $sql").head().get(0)

  test("constructors and accessors") {
    assert(one("ST_X(ST_Point(3.5, 4.5))") == 3.5)
    assert(one("ST_Y(ST_MakePoint(3, 4))") == 4.0)
    assert(one("ST_AsText(ST_Point(1, 2))") == "POINT (1 2)")
    assert(one("ST_AsText(ST_GeomFromText('LINESTRING (0 0, 1 1)'))") == "LINESTRING (0 0, 1 1)")
    assert(one("ST_SRID(ST_SetSRID(ST_Point(1, 2), 4326))") == 4326)
    assert(one("ST_GeometryType(ST_Point(0, 0))") == "ST_Point")
    assert(one("ST_GeometryType(ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 0))'))") == "ST_Polygon")
    assert(one("ST_Dimension(ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 0))'))") == 2)
    assert(one("ST_Dimension(ST_Point(1, 1))") == 0)
    assert(one("ST_NPoints(ST_GeomFromText('LINESTRING (0 0, 1 1, 2 2)'))") == 3)
    assert(one("ST_NumGeometries(ST_GeomFromText('MULTIPOINT ((1 1), (2 2))'))") == 2)
    assert(one("ST_AsText(ST_GeometryN(ST_GeomFromText('MULTIPOINT ((1 1), (2 2))'), 2))") == "POINT (2 2)")
    assert(one("ST_IsValid(ST_Point(1, 1))") == true)
    assert(one("ST_IsEmpty(ST_GeomFromText('POLYGON EMPTY'))") == true)
  }

  test("measures") {
    assert(one("ST_Distance(ST_Point(0, 0), ST_Point(3, 4))") == 5.0)
    assert(one("ST_Area(ST_MakeEnvelope(0, 0, 4, 4))") == 16.0)
    assert(one("ST_Length(ST_GeomFromText('LINESTRING (0 0, 3 4)'))") == 5.0)
    assert(one("ST_DWithin(ST_Point(0, 0), ST_Point(3, 4), 5.1)") == true)
    assert(one("ST_DWithin(ST_Point(0, 0), ST_Point(3, 4), 4.9)") == false)
  }

  test("predicates") {
    val box = "ST_MakeEnvelope(0, 0, 10, 10)"
    assert(one(s"ST_Within(ST_Point(5, 5), $box)") == true)
    assert(one(s"ST_Within(ST_Point(15, 5), $box)") == false)
    assert(one(s"ST_Contains($box, ST_Point(5, 5))") == true)
    assert(one(s"ST_Intersects($box, ST_MakeEnvelope(5, 5, 15, 15))") == true)
    assert(one(s"ST_Disjoint($box, ST_MakeEnvelope(20, 20, 30, 30))") == true)
    assert(one(s"ST_Touches($box, ST_MakeEnvelope(10, 0, 20, 10))") == true)
    assert(one(s"ST_Overlaps($box, ST_MakeEnvelope(5, 5, 15, 15))") == true)
    assert(one(s"ST_Crosses(ST_GeomFromText('LINESTRING (-1 5, 11 5)'), $box)") == true)
    assert(one(s"ST_Equals($box, ST_MakeEnvelope(0, 0, 10, 10))") == true)
    assert(one(s"ST_Covers($box, ST_Point(0, 0))") == true)
    assert(one(s"ST_CoveredBy(ST_Point(0, 0), $box)") == true)
  }

  test("geometry processing") {
    assert(one("ST_AsText(ST_Centroid(ST_MakeEnvelope(0, 0, 4, 4)))") == "POINT (2 2)")
    assert(one("ST_Area(ST_Envelope(ST_GeomFromText('LINESTRING (0 0, 4 4)')))") == 16.0)
    assert(one("ST_Area(ST_Buffer(ST_Point(0, 0), 1)) > 3.1") == true)
    assert(one("ST_Area(ST_Union(ST_MakeEnvelope(0, 0, 2, 2), ST_MakeEnvelope(2, 0, 4, 2)))") == 8.0)
    assert(one("ST_Area(ST_Intersection(ST_MakeEnvelope(0, 0, 4, 4), ST_MakeEnvelope(2, 2, 6, 6)))") == 4.0)
    assert(one("ST_Area(ST_Difference(ST_MakeEnvelope(0, 0, 4, 4), ST_MakeEnvelope(2, 0, 4, 4)))") == 8.0)
    assert(one("ST_Area(ST_SymDifference(ST_MakeEnvelope(0, 0, 4, 4), ST_MakeEnvelope(2, 0, 6, 4)))") == 16.0)
    assert(one("ST_Area(ST_ConvexHull(ST_GeomFromText('MULTIPOINT ((0 0), (4 0), (0 4), (4 4))')))") == 16.0)
    assert(one("ST_NPoints(ST_Simplify(ST_GeomFromText('LINESTRING (0 0, 1 0.01, 2 0)'), 0.1))") == 2)
  }

  test("boundary, envelope accessors, wkb io, simplicity") {
    assert(one("ST_Length(ST_Boundary(ST_MakeEnvelope(0, 0, 4, 4)))") == 16.0)
    assert(one("ST_XMin(ST_MakeEnvelope(1, 2, 3, 4))") == 1.0)
    assert(one("ST_YMin(ST_MakeEnvelope(1, 2, 3, 4))") == 2.0)
    assert(one("ST_XMax(ST_MakeEnvelope(1, 2, 3, 4))") == 3.0)
    assert(one("ST_YMax(ST_MakeEnvelope(1, 2, 3, 4))") == 4.0)
    assert(one("ST_AsText(ST_GeomFromWKB(ST_AsBinary(ST_Point(7, 8))))") == "POINT (7 8)")
    assert(one("ST_IsSimple(ST_GeomFromText('LINESTRING (0 0, 1 1)'))") == true)
    assert(one("ST_IsSimple(ST_GeomFromText('LINESTRING (0 0, 2 2, 2 0, 0 2)'))") == false)
    assert(one("ST_Area(ST_GeomFromText('POLYGON EMPTY'))") == 0.0)
    assert(one("size(grid_cells(ST_MakeEnvelope(0.5, 0.5, 2.5, 1.5), 0.0, 1.0))") == 6)
    assert(one("grid_cell_id(1.5, 2.5, 1.0)") == ((1L << 32) | 2L))
  }

  test("format io: GeoJSON, GML, KML") {
    assert(one("""ST_AsGeoJSON(ST_Point(1, 2))""") == """{"type":"Point","coordinates":[1.0,2.0]}""")
    assert(one("""ST_X(ST_GeomFromGeoJSON('{"type":"Point","coordinates":[7.0,8.0]}'))""") == 7.0)
    assert(one("""ST_AsText(ST_GeomFromGML('<gml:Point xmlns:gml="http://www.opengis.net/gml"><gml:coordinates>1,2</gml:coordinates></gml:Point>'))""") == "POINT (1 2)")
    assert(one("""ST_AsText(ST_GeomFromKML('<Point><coordinates>3,4</coordinates></Point>'))""") == "POINT (3 4)")
  }

  test("GML/KML writers round-trip through their parsers") {
    for (wkt <- Seq("POINT (1 2)", "LINESTRING (0 0, 1 1, 2 0)",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
      "MULTIPOINT ((1 1), (2 2))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))",
      "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 2 2))")) {
      val gml = one(s"ST_AsText(ST_GeomFromGML(ST_AsGML(ST_GeomFromText('$wkt'))))")
      assert(gml == wkt, s"GML roundtrip of $wkt gave $gml")
    }
    for (wkt <- Seq("POINT (3 4)", "LINESTRING (0 0, 1 1)",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")) {
      val kml = one(s"ST_AsText(ST_GeomFromKML(ST_AsKML(ST_GeomFromText('$wkt'))))")
      assert(kml == wkt, s"KML roundtrip of $wkt gave $kml")
    }
    assert(one("ST_AsGML(ST_Point(1, 2))").toString.contains("<gml:pos>1 2</gml:pos>"))
    assert(one("ST_AsKML(ST_Point(1, 2))") == "<Point><coordinates>1,2</coordinates></Point>")
  }

  test("ST_AsGML(version, geom) emits GML2 that round-trips (PostGIS 2-arg form)") {
    // GML2 = gml:coordinates tuples + outerBoundaryIs/innerBoundaryIs — the
    // encoding of the reference's GML2 corpora (basex97_gml2.json runs)
    assert(one("ST_AsGML(2, ST_Point(1, 2))") ==
      """<gml:Point xmlns:gml="http://www.opengis.net/gml"><gml:coordinates>1,2</gml:coordinates></gml:Point>""")
    val poly = one(
      "ST_AsGML(2, ST_GeomFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))'))").toString
    assert(poly.contains("<gml:outerBoundaryIs>") && poly.contains("<gml:innerBoundaryIs>"), poly)
    assert(poly.contains("<gml:coordinates>0,0 4,0 4,4 0,4 0,0</gml:coordinates>"), poly)
    assert(!poly.contains("posList"), s"GML2 output must not use GML3 posList: $poly")
    // the parser reads both versions, so every GML2 document round-trips
    for (wkt <- Seq("POINT (1 2)", "LINESTRING (0 0, 1 1, 2 0)",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
      "MULTIPOINT ((1 1), (2 2))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))",
      "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 2 2))")) {
      val rt = one(s"ST_AsText(ST_GeomFromGML(ST_AsGML(2, ST_GeomFromText('$wkt'))))")
      assert(rt == wkt, s"GML2 roundtrip of $wkt gave $rt")
    }
    // 3-arg version selector: 3 = GML3 (same as the 1-arg form)
    assert(one("ST_AsGML(3, ST_Point(1, 2))") == one("ST_AsGML(ST_Point(1, 2))"))
    // invalid version fails fast with a clear message
    val e = intercept[Exception](one("ST_AsGML(4, ST_Point(1, 2))"))
    assert(e.getMessage != null)
  }

  test("null propagation") {
    assert(spark.sql("SELECT ST_X(CAST(NULL AS BINARY))").head().isNullAt(0))
    assert(spark.sql("SELECT ST_Distance(ST_Point(0, 0), CAST(NULL AS BINARY))").head().isNullAt(0))
  }

  test("line/ring accessors and closest-point operations") {
    def one(e: String) = spark.sql(s"SELECT $e").head().get(0)
    val line = "ST_GeomFromText('LINESTRING (0 0, 10 0, 10 10)')"
    assert(one(s"ST_AsText(ST_StartPoint($line))") == "POINT (0 0)")
    assert(one(s"ST_AsText(ST_EndPoint($line))") == "POINT (10 10)")
    assert(one(s"ST_AsText(ST_PointN($line, 2))") == "POINT (10 0)")
    assert(one(s"ST_AsText(ST_StartPoint(ST_Reverse($line)))") == "POINT (10 10)")
    val poly = "ST_GeomFromText('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))')"
    assert(one(s"ST_NumInteriorRings($poly)") == 1)
    assert(one(s"ST_NumPoints(ST_ExteriorRing($poly))") == 5)
    assert(one(s"ST_NumPoints(ST_InteriorRingN($poly, 1))") == 5)
    // closest point on a segment to an off-line point
    assert(one(s"ST_AsText(ST_ClosestPoint(ST_GeomFromText('LINESTRING (0 0, 10 0)'), ST_Point(3, 5)))")
      == "POINT (3 0)")
    assert(one(s"round(ST_Length(ST_ShortestLine(ST_GeomFromText('LINESTRING (0 0, 10 0)'), ST_Point(3, 5))), 6)")
      == 5.0)
    // azimuth: due east = pi/2; coincident points = NULL (PostGIS contract)
    assert(math.abs(one("ST_Azimuth(ST_Point(0, 0), ST_Point(1, 0))").asInstanceOf[Double] - math.Pi / 2) < 1e-12)
    assert(one("ST_Azimuth(ST_Point(2, 3), ST_Point(2, 3))") == null)
    // interpolation: halfway along a 20-unit L-shaped line
    assert(one(s"ST_AsText(ST_LineInterpolatePoint($line, 0.5))") == "POINT (10 0)")
  }

  test("ST_Transform: UTM zones (4326 <-> 32748), 3395, and projected->projected") {
    def one(sql: String): Any = spark.sql(s"SELECT $sql AS v").head().get(0)
    // Bandung, Indonesia — UTM zone 48S (the reference's own data region).
    // Truth from the standard TM series: sub-mm agreement expected.
    val (lon, lat) = (107.6, -6.9)
    val e = one(s"ST_X(ST_Transform(ST_SetSRID(ST_Point($lon, $lat), 4326), 32748))").asInstanceOf[Double]
    val n = one(s"ST_Y(ST_Transform(ST_SetSRID(ST_Point($lon, $lat), 4326), 32748))").asInstanceOf[Double]
    assert(e > 160000 && e < 840000, s"easting $e outside zone range")
    assert(n > 9000000 && n < 10000000, s"southern-hemisphere northing $n")
    // round trip within 1e-6 degrees
    val lonRt = one(s"ST_X(ST_Transform(ST_Transform(ST_SetSRID(ST_Point($lon, $lat), 4326), 32748), 4326))").asInstanceOf[Double]
    val latRt = one(s"ST_Y(ST_Transform(ST_Transform(ST_SetSRID(ST_Point($lon, $lat), 4326), 32748), 4326))").asInstanceOf[Double]
    assert(math.abs(lonRt - lon) < 1e-6 && math.abs(latRt - lat) < 1e-6, s"($lonRt, $latRt)")
    // northern zone: central-meridian point lands on the 500km false easting
    val ce = one("ST_X(ST_Transform(ST_SetSRID(ST_Point(9.0, 48.0), 4326), 32632))").asInstanceOf[Double]
    assert(math.abs(ce - 500000.0) < 1e-6, s"central meridian easting $ce")
    // ellipsoidal World Mercator differs from spherical 3857 in y, not x
    val y3395 = one("ST_Y(ST_Transform(ST_SetSRID(ST_Point(0.0, 45.0), 4326), 3395))").asInstanceOf[Double]
    val y3857 = one("ST_Y(ST_Transform(ST_SetSRID(ST_Point(0.0, 45.0), 4326), 3857))").asInstanceOf[Double]
    assert(math.abs(y3395 - y3857) > 10000, "ellipsoidal vs spherical mercator must differ")
    assert(math.abs(one("ST_Y(ST_Transform(ST_Transform(ST_SetSRID(ST_Point(12.5, -33.25), 4326), 3395), 4326))").asInstanceOf[Double] + 33.25) < 1e-9)
    // projected -> projected routes through lon/lat: 32748 -> 3857 -> 4326
    val viaLon = one(
      s"ST_X(ST_Transform(ST_Transform(ST_Transform(ST_SetSRID(ST_Point($lon, $lat), 4326), 32748), 3857), 4326))").asInstanceOf[Double]
    assert(math.abs(viaLon - lon) < 1e-6, s"$viaLon")
    // unsupported SRID: clear error
    val err = intercept[Exception](one("ST_Transform(ST_SetSRID(ST_Point(0.0, 0.0), 4326), 27700)"))
    assert(err.getMessage != null)
  }

  test("ST_Transform reprojects between 4326 and 3857") {
    // known anchor: lon 180 -> x = pi*R = 20037508.342789244; lat 0 -> y 0
    val x = spark.sql(
      "SELECT ST_X(ST_Transform(ST_SetSRID(ST_Point(180.0, 0.0), 4326), 3857))")
      .head().getDouble(0)
    assert(math.abs(x - 20037508.342789244) < 1e-6, x.toString)
    // round trip preserves coordinates and sets the SRID
    val r = spark.sql(
      """SELECT ST_X(g2) AS x, ST_Y(g2) AS y, ST_SRID(g2) AS srid FROM (
        |  SELECT ST_Transform(ST_Transform(ST_SetSRID(ST_Point(107.6, -6.9), 4326), 3857), 4326) AS g2)"""
        .stripMargin).head()
    assert(math.abs(r.getDouble(0) - 107.6) < 1e-9)
    assert(math.abs(r.getDouble(1) + 6.9) < 1e-9)
    assert(r.getInt(2) == 4326)
    // unsupported CRS pair fails with a clear message
    val e = intercept[Exception] {
      spark.sql("SELECT ST_Transform(ST_SetSRID(ST_Point(0, 0), 2154), 3857)").collect()
    }
    assert(e.getMessage.contains("4326") || e.getCause != null)
  }

  test("geodesic distances") {
    // sphere: 1° of longitude on the equator is exactly R·π/180 under the
    // haversine closed form
    val oneDeg = one("ST_DistanceSphere(ST_Point(0, 0), ST_Point(1, 0))").asInstanceOf[Double]
    assert(math.abs(oneDeg - 6371008.771415059 * math.Pi / 180) < 1e-6, oneDeg.toString)
    // Vincenty's classic published fixture (GDA technical manual):
    // Flinders Peak -> Buninyong, ellipsoidal distance 54 972.271 m
    val lat1 = -(37 + 57 / 60.0 + 3.72030 / 3600.0)
    val lon1 = 144 + 25 / 60.0 + 29.52440 / 3600.0
    val lat2 = -(37 + 39 / 60.0 + 10.15610 / 3600.0)
    val lon2 = 143 + 55 / 60.0 + 35.38390 / 3600.0
    val fl = s"ST_Point($lon1, $lat1)"
    val bu = s"ST_Point($lon2, $lat2)"
    val d = one(s"ST_DistanceSpheroid($fl, $bu)").asInstanceOf[Double]
    assert(math.abs(d - 54972.271) < 0.01, d.toString)
    // both PostGIS spellings resolve to the same kernel
    assert(one(s"ST_Distance_Spheroid($fl, $bu)") == d)
    assert(one("ST_Distance_Sphere(ST_Point(3, 4), ST_Point(3, 4))") == 0.0)
    assert(one("ST_DistanceSpheroid(ST_Point(3, 4), ST_Point(3, 4))") == 0.0)
    // sphere vs spheroid agree to ~0.5% at mid-latitudes
    val s = one(s"ST_DistanceSphere($fl, $bu)").asInstanceOf[Double]
    assert(math.abs(s - d) / d < 0.005, s"sphere $s vs spheroid $d")
    // antipodal-ish pair where Vincenty famously fails to converge still
    // returns a sane (spherical-fallback) value instead of looping/NaN
    val anti = one("ST_DistanceSpheroid(ST_Point(0, 0), ST_Point(179.7, 0))").asInstanceOf[Double]
    assert(anti > 1.9e7 && anti < 2.1e7, anti.toString)
  }

  test("ST_Project solves the spherical forward problem") {
    // one mean-radius degree of arc = R * π/180 ≈ 111195.08 m
    val arcDeg = 6371008.771415059 * math.Pi / 180.0
    val north = one(s"ST_Y(ST_Project(ST_Point(0.0, 0.0), $arcDeg, 0.0))").asInstanceOf[Double]
    assert(math.abs(north - 1.0) < 1e-9, north)
    val east = one(s"ST_X(ST_Project(ST_Point(0.0, 0.0), $arcDeg, radians(90.0)))").asInstanceOf[Double]
    assert(math.abs(east - 1.0) < 1e-9, east)
    // forward then inverse: distance back to the start equals the input
    val d = one(
      s"ST_DistanceSphere(ST_Point(10.0, 50.0), ST_Project(ST_Point(10.0, 50.0), 5000.0, radians(37.0)))"
    ).asInstanceOf[Double]
    assert(math.abs(d - 5000.0) < 1e-6, d)
    // antimeridian: projecting east from lon 179.9 wraps into [-180, 180)
    // like PostGIS (raw forward solution would exceed 180 and be rejected
    // by SRID-bounds checks, e.g. ST_GeoHash)
    val wrapped = one(s"ST_X(ST_Project(ST_Point(179.9, 0.0), $arcDeg, radians(90.0)))")
      .asInstanceOf[Double]
    assert(math.abs(wrapped - (-179.1)) < 1e-9, s"expected -179.1, got $wrapped")
    assert(one(s"ST_GeoHash(ST_Project(ST_Point(179.9, 0.0), $arcDeg, radians(90.0)), 5)")
      .toString.nonEmpty)
  }

  test("ST_GeoHash matches the published base-32 vectors, round-trips via ST_PointFromGeoHash") {
    // classic vectors (Wikipedia/geohash.org): ezs42 ↔ (-5.6, 42.6),
    // u4pruydqqvj ↔ (10.40744, 57.64911)
    assert(one("ST_GeoHash(ST_Point(-5.6, 42.6), 5)") == "ezs42")
    assert(one("ST_GeoHash(ST_Point(10.40744, 57.64911), 11)") == "u4pruydqqvj")
    // 1-arg auto precision: a point gets the 20-char maximum
    assert(one("ST_GeoHash(ST_Point(10.40744, 57.64911))").asInstanceOf[String].length == 20)
    // a 2°-wide envelope stops at the cell that still contains it
    val boxHash = one("ST_GeoHash(ST_MakeEnvelope(10.0, 57.0, 12.0, 58.0))").asInstanceOf[String]
    assert(boxHash.nonEmpty && boxHash.length <= 2, boxHash)
    // decode = cell center: within half a cell of the original point
    val x = one("ST_X(ST_PointFromGeoHash('u4pruydqqvj'))").asInstanceOf[Double]
    val y = one("ST_Y(ST_PointFromGeoHash('u4pruydqqvj'))").asInstanceOf[Double]
    assert(math.abs(x - 10.40744) < 1e-4 && math.abs(y - 57.64911) < 1e-4)
    // non-lon/lat coordinates are rejected like PostGIS
    intercept[Exception] { spark.sql("SELECT ST_GeoHash(ST_Point(500.0, 0.0), 5)").collect() }
  }

  test("functions work over a table with codegen") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sfDir/customer.parquet")
    df.createOrReplaceTempView("customer_geo_test")
    val rows = spark.sql(
      """SELECT c_custkey,
        |       ST_Distance(ST_Point(c_acctbal / 100.0, c_custkey % 100),
        |                   ST_Point(0, 0)) AS d
        |FROM customer_geo_test
        |WHERE ST_DWithin(ST_Point(c_acctbal / 100.0, c_custkey % 100), ST_Point(0, 0), 50.0)
        |""".stripMargin)
    assert(rows.count() > 0)
  }
}
