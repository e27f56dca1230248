package graft.sources

import graft.geo.{GeomSerde, GmlKml}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.mutable.LinkedHashMap
import scala.xml.{Elem, Node}

/** Distributed XML document source with the reference's row-flattening
  * conventions (reference: extension/xml_extension.ts:500-660):
  *
  *   - record = child element of the document root (or `recordTag`);
  *   - simple child element           → column `<name>` (text value);
  *   - nested element                 → column `<parent>__<child>`;
  *   - attribute on the record        → column `_attribute__<name>`;
  *   - attribute on a child element   → column `_attribute__<elem>__<name>`;
  *   - recognized GML/KML geometry    → column `geometry` (WKB bytes)
  *     (types per reference basex_extension.ts:110-128).
  *
  * Parsing is fully distributed: one task per file/document, schema united
  * from per-record keys. At 100 TB, pass an explicit `columns` list to skip
  * the inference job (the two-pass default is for exploration).
  */
object Xml {

  private val SpatialTypes = Set(
    "Point", "LineString", "LinearRing", "Polygon",
    "MultiPoint", "MultiLineString", "MultiPolygon", "MultiGeometry")

  /** Flattens one record element to (column → string value) plus optional
    * geometry WKB. */
  def flattenRecord(rec: Node, kml: Boolean): (Map[String, String], Option[Array[Byte]]) = {
    val out = LinkedHashMap.empty[String, String]
    var geom: Option[Array[Byte]] = None

    rec.attributes.foreach { a => out(s"_attribute__${a.key}") = a.value.text }

    rec.child.collect { case e: Elem => e }.foreach { c =>
      if (SpatialTypes(c.label)) {
        val g = if (kml) GmlKml.parseKml(c.toString) else GmlKml.parseGml(c.toString)
        geom = Some(GeomSerde.toWkb(g))
      } else if (c.attribute("group").isDefined) {
        // un-named grouped member → `_undef__<group>` (reference:
        // extension/xml_extension.ts:119,653 `*[@group=…]` → `_undef__`)
        out(s"_undef__${c.attribute("group").get.text}") = c.text
      } else {
        c.attributes.foreach { a => out(s"_attribute__${c.label}__${a.key}") = a.value.text }
        val grandchildren = c.child.collect { case e: Elem => e }
        if (grandchildren.isEmpty) {
          out(c.label) = c.text
        } else {
          grandchildren.foreach { gc =>
            if (SpatialTypes(gc.label)) {
              val g = if (kml) GmlKml.parseKml(gc.toString) else GmlKml.parseGml(gc.toString)
              geom = Some(GeomSerde.toWkb(g))
            } else {
              out(s"${c.label}__${gc.label}") = gc.text
            }
          }
        }
      }
    }
    (out.toMap, geom)
  }

  /** Record elements of a parsed document: `recordTag` descendants, or all
    * children of the root when no tag is given. */
  def records(doc: Elem, recordTag: Option[String]): Seq[Node] = recordTag match {
    case Some(tag) => (doc \\ tag).toList
    case None      => doc.child.collect { case e: Elem => e }.toList
  }

  /** Reads a directory/glob of XML files (one document per file). */
  def read(spark: SparkSession, path: String,
           recordTag: Option[String] = None,
           columns: Option[Seq[String]] = None): DataFrame = {
    import spark.implicits._
    val docs = spark.read.option("wholetext", "true").textFile(path)
    fromDocuments(docs.toDF("xml"), "xml", recordTag, columns)
  }

  /** Flattens a DataFrame column of XML document strings (e.g. loaded from
    * parquet, Kafka, or one-doc-per-line files). */
  def fromDocuments(df: DataFrame, xmlCol: String,
                    recordTag: Option[String] = None,
                    columns: Option[Seq[String]] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idx = df.schema.fieldIndex(xmlCol)

    val flattened = df.mapPartitions { rows =>
      rows.flatMap { row =>
        val doc = graft.geo.SecureXml.document.loadString(row.getString(idx))
        val kml = doc.label.equalsIgnoreCase("kml") ||
          doc.namespace != null && doc.namespace.contains("kml")
        records(doc, recordTag).map(r => flattenRecord(r, kml))
      }
    }(org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.kryo[Map[String, String]],
      org.apache.spark.sql.Encoders.kryo[Option[Array[Byte]]]))

    // explicit columns skip the inference pass (the 100 TB path)
    val cols: Seq[String] = columns.getOrElse {
      flattened.flatMap(_._1.keys).distinct().collect().sorted.toSeq
    }

    val schema = StructType(
      cols.map(StructField(_, StringType, nullable = true)) :+
        StructField("geometry", BinaryType, nullable = true))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    flattened.map { case (m, g) =>
      Row.fromSeq(cols.map(m.get(_).orNull) :+ g.orNull)
    }(encoder)
  }
}
