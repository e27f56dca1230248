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

/** ST_Union over a group. Raw inputs accumulate content-deduped (union is
  * idempotent — byte-identical WKB skips JTS entirely) and are collapsed
  * with cascaded union every `FlushAt` items (bounds buffer memory;
  * cascaded union is O(n log n) vs naive O(n²) pairwise).
  *
  * Two arrival fast paths:
  *  - exact-duplicate skip (content set), cleared on collapse;
  *  - covered-rectangle skip: a rectangle whose envelope is covered by an
  *    already-accepted rectangle cannot change the union (sound ONLY for
  *    rectangles, where geometry == envelope; general geometries never
  *    take this path). The tracked set keeps the largest rectangles seen.
  *
  * Partial buffers below `RawShip` items serialize as the RAW deduped WKB
  * list instead of a pre-unioned polygon: the final merge then dedupes
  * ACROSS partitions and runs one cascaded union over distinct inputs,
  * instead of re-dissolving 32 partial polygons that mostly repeat each
  * other (grid-snapped workloads). Buffers past the threshold still ship
  * as a single unioned geometry, so shuffle size stays bounded either way. */
case class StUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[StUnionAgg.Buffer] {
  import StUnionAgg.{Buffer, FlushAt, RawShip, TrackedRects}

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_union_agg expects WKB binary geometry")

  override def createAggregationBuffer(): Buffer = new Buffer

  /** Unions everything pending into a single geometry. */
  private def collapse(buf: Buffer): Unit = {
    if (buf.raws.nonEmpty) {
      buf.geoms ++= buf.raws.map(GeomSerde.fromWkb)
      buf.raws.clear()
    }
    if (buf.geoms.length > 1) {
      val u = UnaryUnionOp.union(buf.geoms.asJava)
      buf.geoms.clear()
      buf.geoms += u
    }
    // collapsed result is a new geometry; seen-set only serves raw inputs
    // between collapses, and clearing it bounds its memory
    buf.seen.clear()
  }

  private def pending(buf: Buffer): Int = buf.geoms.length + buf.raws.length

  /** Accepts one raw WKB into the buffer (dedup + covered-rect fast paths). */
  private def accept(buf: Buffer, wkb: Array[Byte]): Unit = {
    if (!buf.seen.add(java.nio.ByteBuffer.wrap(wkb))) return
    // a 5-point polygon WKB is <= ~97 bytes: only candidates that small can
    // be rectangles, so larger inputs skip the parse entirely
    if (wkb.length <= 100) {
      val g = GeomSerde.fromWkb(wkb)
      if (g.isRectangle) {
        val env = g.getEnvelopeInternal
        var i = 0
        while (i < buf.rects.length) {
          if (buf.rects(i).covers(env)) return // union cannot change
          i += 1
        }
        // track the largest rectangles as future covers
        if (buf.rects.length < TrackedRects) buf.rects += env
        else {
          var smallest = 0
          i = 1
          while (i < buf.rects.length) {
            if (buf.rects(i).getArea < buf.rects(smallest).getArea) smallest = i
            i += 1
          }
          if (env.getArea > buf.rects(smallest).getArea) buf.rects(smallest) = env
        }
      }
    }
    buf.raws += wkb
    if (pending(buf) >= FlushAt) collapse(buf)
  }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) accept(buf, v.asInstanceOf[Array[Byte]].clone())
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    other.raws.foreach(accept(buf, _)) // cross-partition content dedup
    buf.geoms ++= other.geoms
    if (pending(buf) >= FlushAt) collapse(buf)
    buf
  }

  override def eval(buf: Buffer): Any =
    if (pending(buf) == 0) null
    else {
      collapse(buf)
      GeomSerde.toWkb(buf.geoms.head)
    }

  override def serialize(buf: Buffer): Array[Byte] = {
    if (buf.geoms.isEmpty && buf.raws.length <= RawShip) {
      // raw list: 1-byte tag, count, length-prefixed WKBs
      var size = 1 + 4
      buf.raws.foreach(size += 4 + _.length)
      val bb = java.nio.ByteBuffer.allocate(size)
      bb.put(1.toByte).putInt(buf.raws.length)
      buf.raws.foreach { w => bb.putInt(w.length).put(w) }
      bb.array()
    } else {
      collapse(buf)
      if (buf.geoms.isEmpty) Array.emptyByteArray
      else {
        val w = GeomSerde.toWkb(buf.geoms.head)
        val bb = java.nio.ByteBuffer.allocate(1 + w.length)
        bb.put(0.toByte).put(w)
        bb.array()
      }
    }
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val b = new Buffer
    if (bytes.nonEmpty) {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      bb.get() match {
        case 1 =>
          val n = bb.getInt
          var i = 0
          while (i < n) {
            val w = new Array[Byte](bb.getInt)
            bb.get(w)
            b.raws += w
            i += 1
          }
        case _ =>
          val w = new Array[Byte](bytes.length - 1)
          bb.get(w)
          b.geoms += GeomSerde.fromWkb(w)
      }
    }
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
  // Collapse threshold: UnaryUnionOp builds a spatial index and unions
  // bottom-up, so it is far cheaper to union ONE batch of 2048 geometries
  // than 32 batches of 64 that each re-union the (increasingly complex)
  // accumulated result. 2048 small geometries ≈ a few MB of buffer — safe
  // per aggregation slot; lower it only for very vertex-heavy inputs.
  private[functions] val FlushAt = 2048
  // Partial buffers up to this many raw inputs ship un-unioned so the
  // merge side can dedupe across partitions before the one final union.
  private[functions] val RawShip = 1024
  // Covered-rectangle fast path: how many (largest) rectangle envelopes to
  // keep as covers. Linear probe per rectangle arrival — keep small.
  private[functions] val TrackedRects = 32

  /** Aggregation state: deduped raw WKB inputs + already-unioned partial
    * geometries, the content set since the last collapse (ByteBuffer wraps
    * compare by content, unlike bare byte arrays), and the tracked
    * rectangle covers. */
  final class Buffer {
    val raws: ArrayBuffer[Array[Byte]] = ArrayBuffer.empty
    val geoms: ArrayBuffer[Geometry] = ArrayBuffer.empty
    val seen: java.util.HashSet[java.nio.ByteBuffer] = new java.util.HashSet()
    val rects: ArrayBuffer[Envelope] = ArrayBuffer.empty
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
