package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StructType}

/** Bounded top-k aggregate — `topk_agg(v, k)` / `bottomk_agg(v, k)`:
  * the k largest (smallest) values of any orderable column per group,
  * returned as an array sorted best-first.
  *
  * This is the group-top-k shape every ranking pipeline needs (top
  * documents per domain, nearest candidates per probe, exact
  * deterministic per-group samples) without either of Spark's two bad
  * plans for it:
  *   - `row_number() OVER (PARTITION BY g ORDER BY v)` sorts and buffers
  *     every group IN FULL in one task — a hot group is a straggler and
  *     an OOM risk at 100 TB (the dup-spans lesson);
  *   - `slice(sort_array(collect_list(v)), 1, k)` holds the whole group
  *     in the aggregation buffer before truncating.
  * Here the buffer is a k-bounded binary heap at every stage: map-side
  * partials are already capped at k values, the shuffle carries ≤ k
  * values per (partition, group), and merge is O(k log k). Pass a
  * struct to rank by a compound key and carry payload fields along —
  * struct ordering is lexicographic by field position, so put sort keys
  * first (append a unique id to pin ties and the result is fully
  * deterministic).
  *
  * Values order with Catalyst's native null-first semantics (a null
  * struct FIELD sorts below any value; null top-level inputs are
  * skipped, the usual aggregate contract). `k` must be a foldable
  * literal ≥ 1.
  */
case class TopKAgg(
    child: Expression,
    kExpr: Expression,
    reverse: Boolean, // false = keep largest, true = keep smallest
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer] {
  import TopKAgg.Buffer

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (!RowOrdering.isOrderable(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"${prettyName} expects an orderable value, got ${child.dataType}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"${prettyName} expects a literal INT k")
    else if (kExpr.eval(InternalRow.empty).asInstanceOf[Int] < 1)
      // foldable k: fail the bound at analysis time, not in a retried task
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName k must be >= 1, got ${kExpr.eval(InternalRow.empty)}")
    else TypeCheckResult.TypeCheckSuccess
  override def prettyName: String = if (reverse) "bottomk_agg" else "topk_agg"

  private lazy val k: Int = {
    val v = kExpr.eval(InternalRow.empty).asInstanceOf[Int]
    require(v >= 1, s"$prettyName k must be >= 1, got $v")
    v
  }

  /** Worst-kept-value-first heap order: base ordering for topk (smallest
    * kept value at the root), reversed for bottomk. */
  private lazy val heapOrd: Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(child.dataType)
    if (reverse) base.reverse else base
  }

  // value <-> bytes for partial-buffer shuffle: each value rides as a
  // single-field UnsafeRow
  private lazy val toUnsafe = UnsafeProjection.create(Array(child.dataType))
  private lazy val holder = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  private def insert(buf: Buffer, v: Any): Unit = {
    if (buf.heap.size < buf.k) buf.heap.add(v)
    else if (heapOrd.compare(v, buf.heap.peek()) > 0) {
      buf.heap.poll()
      buf.heap.add(v)
    }
  }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    if (buf.heap.comparator() == null) buf.init(heapOrd)
    val v = child.eval(input)
    // defensive copy: Catalyst reuses the row/value backing buffers
    if (v != null) insert(buf, copyValue(v))
    buf
  }

  private def copyValue(v: Any): Any = v match {
    case r: InternalRow => r.copy()
    case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
    case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
    case other => other
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    if (buf.heap.comparator() == null) buf.init(heapOrd)
    val it = other.heap.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: Buffer): Any = {
    val arr = buf.heap.toArray
    java.util.Arrays.sort(arr, heapOrd.asInstanceOf[Ordering[AnyRef]]
      .asInstanceOf[java.util.Comparator[AnyRef]])
    // heap order puts the WORST kept value first; the result reads best-first
    val out = new Array[Any](arr.length)
    var i = 0
    while (i < arr.length) { out(i) = arr(arr.length - 1 - i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val rows = new Array[Array[Byte]](buf.heap.size)
    val it = buf.heap.iterator()
    var i = 0
    var total = 0
    while (it.hasNext) {
      holder.update(0, it.next())
      // the projection reuses one output buffer — clone while the content
      // is this value's (getBytes may alias the backing array)
      val bytes = toUnsafe(holder).getBytes.clone()
      rows(i) = bytes
      total += 4 + bytes.length
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(8 + total)
    bb.putInt(buf.k).putInt(rows.length)
    rows.foreach { r => bb.putInt(r.length).put(r) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Buffer(bb.getInt)
    buf.init(heapOrd)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val row = new UnsafeRow(1)
      val rb = new Array[Byte](bb.getInt)
      bb.get(rb)
      row.pointTo(rb, rb.length)
      insert(buf, copyValue(row.get(0, child.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object TopKAgg {
  /** k-bounded binary heap, worst kept value at the root. The comparator
    * is injected on first use (it derives from the expression's child
    * type, which a freshly-deserialized buffer doesn't know yet). */
  final class Buffer(val k: Int) {
    var heap: java.util.PriorityQueue[Any] = new java.util.PriorityQueue[Any]()
    def init(ord: Ordering[Any]): Unit = {
      val fresh = new java.util.PriorityQueue[Any](k,
        ord.asInstanceOf[java.util.Comparator[Any]])
      fresh.addAll(heap)
      heap = fresh
    }
  }
}
