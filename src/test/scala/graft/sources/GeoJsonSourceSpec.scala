package graft.sources

import graft.SparkTestBase
import graft.geo.GeomSerde
import org.apache.spark.sql.functions._

class GeoJsonSourceSpec extends SparkTestBase {
  import spark.implicits._

  private val fc =
    """{"type":"FeatureCollection","features":[
      |  {"type":"Feature","properties":{"name":"alpha","pop":1200},"geometry":{"type":"Point","coordinates":[107.6,-6.9]}},
      |  {"type":"Feature","properties":{"name":"beta","pop":800},"geometry":{"type":"Polygon","coordinates":[[[0.0,0.0],[4.0,0.0],[4.0,4.0],[0.0,4.0],[0.0,0.0]]]}}
      |]}""".stripMargin

  test("FeatureCollection explodes to rows with properties.* + geometry") {
    val df = GeoJsonSource.fromDocuments(Seq(fc).toDF("json"), "json")
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("name", "pop", "geometry"))
    val alpha = df.where($"name" === "alpha").head()
    assert(alpha.getAs[String]("pop") == "1200")
    val g = GeomSerde.fromWkb(alpha.getAs[Array[Byte]]("geometry"))
    assert(g.getGeometryType == "Point" && g.getCoordinate.x == 107.6)
  }

  test("spatial SQL works over the flattened frame") {
    val df = GeoJsonSource.fromDocuments(Seq(fc).toDF("json"), "json")
    val n = df.where(call_function("st_area", col("geometry")) > 10.0).count()
    assert(n == 1)
  }

  test("round trip back to a FeatureCollection") {
    val df = GeoJsonSource.fromDocuments(Seq(fc).toDF("json"), "json")
    val out = GeoJsonSource.toFeatureCollection(df.orderBy("name"), "geometry")
    assert(out.startsWith("""{"type":"FeatureCollection","features":["""))
    assert(out.contains(""""name":"alpha""""))
    assert(out.contains(""""type":"Polygon""""))
    // parse back: still two features
    assert(GeoJsonSource.flattenFeature(out).length == 2)
  }
}
