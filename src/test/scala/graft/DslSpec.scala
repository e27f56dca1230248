package graft

import graft.dsl._
import org.apache.spark.sql.functions._

class DslSpec extends SparkTestBase {
  import spark.implicits._

  test("Column DSL composes with DataFrame API") {
    val df = Seq((0.0, 0.0), (3.0, 4.0), (30.0, 40.0)).toDF("x", "y")
      .withColumn("pt", st_point($"x", $"y"))
    val near = df.where(st_dwithin($"pt", st_point(lit(0.0), lit(0.0)), 6.0))
    assert(near.count() == 2)
    val d = df.select(st_distance($"pt", st_point(lit(0.0), lit(0.0))).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(d == 50.0)
    assert(df.select(st_asGeoJSON($"pt")).head().getString(0).contains("Point"))
  }

  test("GeometryUDT: readable show, Dataset[Geometry] round trip, same wire bytes") {
    Graft.register(spark)
    val df = Seq((1L, 2.5, 3.5)).toDF("id", "x", "y")
      .withColumn("g", as_geometry(st_point($"x", $"y")))
    // the UDT deserializes to JTS, whose toString is WKT → readable rows
    // (show() renders exactly these deserialized values)
    assert(df.schema("g").dataType == graft.types.GeometryUDT)
    assert(df.select("g").head().get(0).toString == "POINT (2.5 3.5)")
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out))(df.select("g").show(false))
    assert(out.toString.contains("POINT (2.5 3.5)"), out.toString)
    // typed Dataset with a JTS field round-trips through the encoder
    val ds = df.select($"id", $"g").as[(Long, org.locationtech.jts.geom.Geometry)]
    val (id, geom) = ds.head()
    assert(id == 1L && geom.isInstanceOf[org.locationtech.jts.geom.Point])
    assert(geom.asInstanceOf[org.locationtech.jts.geom.Point].getX == 2.5)
    // every ST_* function takes the UDT column directly, and to_wkb is the
    // byte-identical inverse
    assert(df.select(st_x($"g")).head().getDouble(0) == 2.5)
    val bytes = df.select(to_wkb($"g"), st_point($"x", $"y")).head()
    assert(java.util.Arrays.equals(bytes.getAs[Array[Byte]](0), bytes.getAs[Array[Byte]](1)))
    // SQL spelling works too
    df.createOrReplaceTempView("udt_v")
    assert(spark.sql("SELECT ST_Y(g) FROM udt_v").head().getDouble(0) == 3.5)
  }
}
