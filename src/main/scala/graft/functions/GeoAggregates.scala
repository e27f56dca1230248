package graft.functions

import graft.geo.GeomSerde
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.locationtech.jts.geom.{Envelope, Geometry}
import org.locationtech.jts.operation.union.UnaryUnionOp

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Geometry aggregates (PostGIS ST_Union(geom set) / ST_Extent).
  *
  * The reference finishes aggregation on the PostGIS side of its rebuilt
  * query (reference: src/sqlrebuilder.ts rebuildTree); here they are native
  * Spark aggregate expressions with map-side partial aggregation — each
  * partition unions/extends locally, only partial buffers shuffle.
  */

/** ST_Union over a group. Geometries accumulate into a buffer that is
  * collapsed with cascaded union every `FlushAt` items (bounds buffer
  * memory; cascaded union is O(n log n) vs naive O(n²) pairwise). Union is
  * idempotent, so byte-identical WKB inputs are deduped on arrival —
  * grid-snapped envelopes and repeated features skip JTS entirely. */
case class StUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[StUnionAgg.Buffer] {
  import StUnionAgg.Buffer

  // Collapse threshold: UnaryUnionOp builds a spatial index and unions
  // bottom-up, so it is far cheaper to union ONE batch of 2048 geometries
  // than 32 batches of 64 that each re-union the (increasingly complex)
  // accumulated result. 2048 small geometries ≈ a few MB of buffer — safe
  // per aggregation slot; lower it only for very vertex-heavy inputs.
  private val FlushAt = 2048

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_union_agg expects WKB binary geometry")

  override def createAggregationBuffer(): Buffer = new Buffer

  private def collapse(buf: Buffer): Unit = {
    if (buf.geoms.length > 1) {
      val u = UnaryUnionOp.union(buf.geoms.asJava)
      buf.geoms.clear()
      buf.geoms += u
    }
    // collapsed result is a new geometry; seen-set only serves raw inputs
    // between collapses, and clearing it bounds its memory
    buf.seen.clear()
  }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val wkb = v.asInstanceOf[Array[Byte]]
      if (buf.seen.add(java.nio.ByteBuffer.wrap(wkb.clone()))) {
        buf.geoms += GeomSerde.fromWkb(wkb)
        if (buf.geoms.length >= FlushAt) collapse(buf)
      }
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    buf.geoms ++= other.geoms
    if (buf.geoms.length >= FlushAt) collapse(buf)
    buf
  }

  override def eval(buf: Buffer): Any =
    if (buf.geoms.isEmpty) null
    else {
      collapse(buf)
      GeomSerde.toWkb(buf.geoms.head)
    }

  override def serialize(buf: Buffer): Array[Byte] = {
    collapse(buf)
    if (buf.geoms.isEmpty) Array.emptyByteArray else GeomSerde.toWkb(buf.geoms.head)
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val b = new Buffer
    if (bytes.nonEmpty) b.geoms += GeomSerde.fromWkb(bytes)
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): StUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): StUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): StUnionAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "st_union_agg"
}

object StUnionAgg {
  /** Aggregation state: pending geometries plus the content-keyed set of
    * raw WKB inputs seen since the last collapse (ByteBuffer wraps compare
    * by content, unlike bare byte arrays). */
  final class Buffer {
    val geoms: ArrayBuffer[Geometry] = ArrayBuffer.empty
    val seen: java.util.HashSet[java.nio.ByteBuffer] = new java.util.HashSet()
  }
}

/** ST_Extent: bounding box of a geometry set, returned as an envelope
  * polygon (WKB). Buffer is a 4-double envelope — constant size, so the
  * shuffle payload per group is ~50 bytes regardless of group size. */
case class StExtentAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Envelope] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_extent_agg expects WKB binary geometry")

  override def createAggregationBuffer(): Envelope = new Envelope() // starts null/empty

  override def update(env: Envelope, input: InternalRow): Envelope = {
    val v = child.eval(input)
    if (v != null) {
      env.expandToInclude(
        GeomSerde.fromWkb(v.asInstanceOf[Array[Byte]]).getEnvelopeInternal)
    }
    env
  }

  override def merge(a: Envelope, b: Envelope): Envelope = { a.expandToInclude(b); a }

  override def eval(env: Envelope): Any =
    if (env.isNull) null
    else GeomSerde.toWkb(GeomSerde.factory.toGeometry(env))

  override def serialize(env: Envelope): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33)
    bb.put(if (env.isNull) 1.toByte else 0.toByte)
    bb.putDouble(env.getMinX).putDouble(env.getMinY)
    bb.putDouble(env.getMaxX).putDouble(env.getMaxY)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Envelope = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val isNull = bb.get() == 1.toByte
    val (x0, y0, x1, y1) = (bb.getDouble, bb.getDouble, bb.getDouble, bb.getDouble)
    if (isNull) new Envelope() else new Envelope(x0, x1, y0, y1)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): StExtentAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): StExtentAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): StExtentAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "st_extent_agg"
}
