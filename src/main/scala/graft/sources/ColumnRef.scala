package graft.sources

import org.apache.spark.sql.connector.expressions.NamedReference

/** A SINGLE-PART column reference for DSv2 interfaces
  * (`filterAttributes` etc.). Deliberately not `Expressions.column`,
  * which PARSES its argument as a multipart identifier — a flattened
  * column whose name contains a dot (legal in XML element names and
  * GeoJSON property keys) would resolve as a nested-field path and fail
  * planning; Spark's non-parsing `FieldReference.column` is
  * `private[sql]`. */
private[sources] final case class ColumnRef(name: String) extends NamedReference {
  override def fieldNames(): Array[String] = Array(name)
  override def toString: String = name
}
