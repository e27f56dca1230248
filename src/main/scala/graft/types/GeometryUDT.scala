package graft.types

import graft.geo.GeomSerde
import org.apache.spark.sql.types.{BinaryType, DataType, UserDefinedType}
import org.locationtech.jts.geom.Geometry

/** Geometry as a first-class Spark SQL type — presentation/Dataset sugar
  * over the engine's wire format, which stays WKB in `BinaryType`
  * unchanged (sqlType below IS BinaryType, so a UDT column's storage is
  * byte-identical to a plain geometry column).
  *
  * What it buys:
  *  - `df.withColumn("g", as_geometry($"g")).show()` prints WKT instead of
  *    byte garbage (show deserializes UDT values and JTS `toString` is WKT);
  *  - `Dataset[T]` with JTS [[Geometry]] fields works via the registered
  *    encoders ([[GraftUdt.register]]);
  *  - every ST_* function accepts UDT-typed geometry columns directly (the
  *    arg coercion unwraps to WKB at zero cost).
  */
class GeometryUDT extends UserDefinedType[Geometry] {
  override def sqlType: DataType = BinaryType
  override def serialize(obj: Geometry): Array[Byte] = GeomSerde.toWkb(obj)
  override def deserialize(datum: Any): Geometry =
    GeomSerde.fromWkb(datum.asInstanceOf[Array[Byte]])
  override def userClass: Class[Geometry] = classOf[Geometry]
  override def typeName: String = "geometry"
  override def equals(o: Any): Boolean = o.isInstanceOf[GeometryUDT]
  override def hashCode(): Int = classOf[GeometryUDT].getName.hashCode
}

case object GeometryUDT extends GeometryUDT

object GraftUdt {
  /** JTS classes whose Dataset encoders route through [[GeometryUDT]]. */
  private val jtsClasses = Seq(
    classOf[org.locationtech.jts.geom.Geometry],
    classOf[org.locationtech.jts.geom.Point],
    classOf[org.locationtech.jts.geom.LineString],
    classOf[org.locationtech.jts.geom.LinearRing],
    classOf[org.locationtech.jts.geom.Polygon],
    classOf[org.locationtech.jts.geom.MultiPoint],
    classOf[org.locationtech.jts.geom.MultiLineString],
    classOf[org.locationtech.jts.geom.MultiPolygon],
    classOf[org.locationtech.jts.geom.GeometryCollection])

  /** Idempotent ([[org.apache.spark.sql.types.UDTRegistration]] keeps the
    * first registration and warns on repeats, so guard with exists). */
  def register(): Unit = jtsClasses.foreach { c =>
    if (!org.apache.spark.sql.types.UDTRegistration.exists(c.getName))
      org.apache.spark.sql.types.UDTRegistration.register(c.getName, classOf[GeometryUDT].getName)
  }
}
