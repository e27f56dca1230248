package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, lit}

/** Scala Column DSL over the registered functions — `import graft.dsl._`
  * for typed DataFrame-side use; requires `Graft.register(spark)` (or the
  * extensions config) on the session. */
object dsl {
  private def fn(name: String, cols: Column*): Column = call_function(name, cols: _*)

  // constructors / io
  def st_point(x: Column, y: Column): Column = fn("st_point", x, y)
  def st_makeEnvelope(xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column =
    fn("st_makeenvelope", xmin, ymin, xmax, ymax)
  def st_geomFromText(wkt: Column): Column = fn("st_geomfromtext", wkt)
  def st_geomFromGeoJSON(json: Column): Column = fn("st_geomfromgeojson", json)
  def st_geomFromGML(xml: Column): Column = fn("st_geomfromgml", xml)
  def st_geomFromKML(xml: Column): Column = fn("st_geomfromkml", xml)
  def st_asText(g: Column): Column = fn("st_astext", g)
  def st_asGeoJSON(g: Column): Column = fn("st_asgeojson", g)
  def st_asGML(g: Column): Column = fn("st_asgml", g)
  def st_asKML(g: Column): Column = fn("st_askml", g)

  // accessors / measures
  def st_x(g: Column): Column = fn("st_x", g)
  def st_y(g: Column): Column = fn("st_y", g)
  def st_area(g: Column): Column = fn("st_area", g)
  def st_length(g: Column): Column = fn("st_length", g)
  def st_centroid(g: Column): Column = fn("st_centroid", g)
  def st_envelope(g: Column): Column = fn("st_envelope", g)
  def st_buffer(g: Column, d: Double): Column = fn("st_buffer", g, lit(d))
  def st_distance(a: Column, b: Column): Column = fn("st_distance", a, b)

  // predicates
  def st_dwithin(a: Column, b: Column, d: Double): Column = fn("st_dwithin", a, b, lit(d))
  def st_within(a: Column, b: Column): Column = fn("st_within", a, b)
  def st_contains(a: Column, b: Column): Column = fn("st_contains", a, b)
  def st_intersects(a: Column, b: Column): Column = fn("st_intersects", a, b)

  // aggregates
  def st_union_agg(g: Column): Column = fn("st_union_agg", g)
  def st_extent_agg(g: Column): Column = fn("st_extent_agg", g)

  // UDT sugar: as_geometry(g) makes show() print WKT and lets Dataset[T]
  // carry JTS Geometry fields; to_wkb(g) goes back. Both are identities
  // over the WKB storage.
  def as_geometry(g: Column): Column = fn("as_geometry", g)
  def to_wkb(g: Column): Column = fn("to_wkb", g)

  // pipeline kernels
  def cosine_similarity(a: Column, b: Column): Column = fn("cosine_similarity", a, b)
  def minhash_signature(text: Column, k: Int, n: Int): Column =
    fn("minhash_signature", text, lit(k), lit(n))
  def simhash64(text: Column): Column = fn("simhash64", text)
  def lang_id(text: Column): Column = fn("lang_id", text)
  def st_transform(g: Column, targetSrid: Int): Column =
    fn("st_transform", g, lit(targetSrid))
  def st_setSRID(g: Column, srid: Int): Column = fn("st_setsrid", g, lit(srid))
  def st_srid(g: Column): Column = fn("st_srid", g)
  def rolling_fingerprint(text: Column, window: Int = 16): Column =
    fn("rolling_fingerprint", text, lit(window))
  def rolling_fingerprint_fast(text: Column, window: Int = 16): Column =
    fn("rolling_fingerprint_fast", text, lit(window))
  def hyperplane_bucket(vec: Column, planes: Int): Column =
    fn("hyperplane_bucket", vec, lit(planes))
}
