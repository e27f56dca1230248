package graft.sources

import graft.SparkTestBase
import graft.geo.GeomSerde
import org.apache.spark.sql.functions._

class XmlSpec extends SparkTestBase {
  import spark.implicits._

  private val gmlDoc =
    """<collection>
      |  <feature code="A1" group="g1">
      |    <name>alpha</name>
      |    <address city="Bandung"><street>Main</street><zip>40111</zip></address>
      |    <gml:Point xmlns:gml="http://www.opengis.net/gml"><gml:coordinates>107.6,-6.9</gml:coordinates></gml:Point>
      |  </feature>
      |  <feature code="B2">
      |    <name>beta</name>
      |    <address city="Jakarta"><zip>10110</zip></address>
      |    <gml:Polygon xmlns:gml="http://www.opengis.net/gml">
      |      <gml:outerBoundaryIs><gml:LinearRing><gml:coordinates>0,0 4,0 4,4 0,4 0,0</gml:coordinates></gml:LinearRing></gml:outerBoundaryIs>
      |    </gml:Polygon>
      |  </feature>
      |</collection>""".stripMargin

  private val kmlDoc =
    """<kml xmlns="http://www.opengis.net/kml/2.2">
      |  <Placemark>
      |    <name>spot</name>
      |    <Point><coordinates>106.8,-6.2</coordinates></Point>
      |  </Placemark>
      |</kml>""".stripMargin

  test("flattening: nested columns, attributes, geometry") {
    val df = Xml.fromDocuments(Seq(gmlDoc).toDF("xml"), "xml")
    val rows = df.orderBy("name").collect()
    assert(rows.length == 2)
    val cols = df.columns.toSet
    assert(cols.contains("name"))
    assert(cols.contains("address__street"))
    assert(cols.contains("address__zip"))
    assert(cols.contains("_attribute__code"))
    assert(cols.contains("_attribute__address__city"))
    assert(cols.contains("geometry"))

    val alpha = rows(0)
    assert(alpha.getAs[String]("name") == "alpha")
    assert(alpha.getAs[String]("address__zip") == "40111")
    assert(alpha.getAs[String]("_attribute__code") == "A1")
    assert(alpha.getAs[String]("_attribute__address__city") == "Bandung")
    val pt = GeomSerde.fromWkb(alpha.getAs[Array[Byte]]("geometry"))
    assert(pt.getGeometryType == "Point" && pt.getCoordinate.x == 107.6)

    val beta = rows(1)
    assert(beta.getAs[String]("address__street") == null) // missing element → null
    val poly = GeomSerde.fromWkb(beta.getAs[Array[Byte]]("geometry"))
    assert(poly.getGeometryType == "Polygon" && poly.getArea == 16.0)
  }

  test("KML documents flatten with Placemark geometry") {
    val df = Xml.fromDocuments(Seq(kmlDoc).toDF("xml"), "xml", recordTag = Some("Placemark"))
    val row = df.head()
    assert(row.getAs[String]("name") == "spot")
    val pt = GeomSerde.fromWkb(row.getAs[Array[Byte]]("geometry"))
    assert(pt.getCoordinate.y == -6.2)
  }

  test("explicit column list skips inference and projects in order") {
    val df = Xml.fromDocuments(Seq(gmlDoc).toDF("xml"), "xml",
      columns = Some(Seq("name", "address__zip")))
    assert(df.columns.toSeq == Seq("name", "address__zip", "geometry"))
    assert(df.count() == 2)
  }

  test("_undef__ grouped members flatten by group attribute") {
    val doc =
      """<col><rec><name>x</name><item group="extras">v1</item></rec></col>"""
    val df = Xml.fromDocuments(Seq(doc).toDF("xml"), "xml")
    assert(df.columns.contains("_undef__extras"))
    assert(df.head().getAs[String]("_undef__extras") == "v1")
  }

  test("spatial predicates work on the flattened geometry column") {
    val df = Xml.fromDocuments(Seq(gmlDoc).toDF("xml"), "xml")
    val n = df.where(call_function("st_intersects", col("geometry"),
      call_function("st_makeenvelope", lit(100.0), lit(-10.0), lit(110.0), lit(0.0)))).count()
    assert(n == 1) // only the Bandung point falls in the west-Java box
  }
}
