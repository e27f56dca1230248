package graft.geo

import org.locationtech.jts.geom._
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

/** Geometry serialization core.
  *
  * Geometries travel through Spark plans as WKB bytes in `BinaryType`
  * columns (EWKB flavor: SRID embedded when non-zero) — compact,
  * shuffle-friendly, and parse-once. All functions in
  * [[graft.functions.GeoOps]] operate WKB-in/WKB-out.
  *
  * Mirrors the geometry surface of the reference engine
  * (reference: extension/basex/basex_extension.ts:110-128 — GML/KML
  * types Point, LineString, LinearRing, Polygon, Multi*, MultiGeometry).
  */
object GeomSerde {

  /** JTS readers/writers are stateful and not thread-safe → thread-local. */
  private val factories = new ThreadLocal[GeometryFactory] {
    override def initialValue(): GeometryFactory = new GeometryFactory()
  }
  private val wkbReaders = new ThreadLocal[WKBReader] {
    override def initialValue(): WKBReader = new WKBReader(factories.get())
  }
  private val wktReaders = new ThreadLocal[WKTReader] {
    override def initialValue(): WKTReader = new WKTReader(factories.get())
  }
  private val wktWriters = new ThreadLocal[WKTWriter] {
    override def initialValue(): WKTWriter = new WKTWriter()
  }

  def factory: GeometryFactory = factories.get()

  def fromWkb(bytes: Array[Byte]): Geometry = wkbReaders.get().read(bytes)

  def toWkb(g: Geometry): Array[Byte] = {
    // include SRID only when set: keeps the common (srid=0) encoding minimal
    val writer = new WKBWriter(2, g.getSRID != 0)
    writer.write(g)
  }

  def fromWkt(s: String): Geometry = wktReaders.get().read(s)

  def toWkt(g: Geometry): String = wktWriters.get().write(g)

  /** Make a point fast (hot path for derived-coordinate queries). */
  def point(x: Double, y: Double): Point =
    factories.get().createPoint(new Coordinate(x, y))
}
