package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** KMV ("k minimum values" / bottom-k theta) distinct-count sketch over
  * 60-bit hash values — `kmv_distinct(h, k)`.
  *
  * The classic mergeable distinct-count sketch (Bar-Yossef et al. 2002;
  * the architecture behind theta sketches): keep the k smallest DISTINCT
  * hash values seen; if fewer than k exist the count is exact, otherwise
  * the k-th smallest hash h₍ₖ₎ estimates the density of a uniform
  * [0, 2⁶⁰) hash stream and the distinct count is `(k-1)·2⁶⁰ / h₍ₖ₎`
  * (the unbiased form — `k·2⁶⁰/h₍ₖ₎` overshoots).
  *
  * Why this shape at 100 TB: `count(DISTINCT x)` shuffles every distinct
  * value; this aggregate's partial state is ≤ k longs per partition
  * regardless of cardinality, merges in O(k log k), and is DETERMINISTIC —
  * the estimate is a pure function of the input SET, independent of
  * partitioning and row order, so the same expression replayed by another
  * engine (the DuckDB oracle sorts distinct hashes and applies the same
  * formula to the k-th) reproduces it bit-for-bit. That determinism is
  * what HyperLogLog-style register sketches can't give an exactness gate.
  *
  * Inputs are expected to be 60-bit non-negative hashes — the
  * `word_window_hashes` md5 kernel's output domain (TextOps.scala), the
  * same fingerprint family every dedup operator here rides. `k` must be a
  * foldable literal ≥ 2.
  */
case class KmvDistinctAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvDistinctAgg.Buffer] {
  import KmvDistinctAgg.{Buffer, HashSpace}

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("kmv_distinct expects a LONG hash column")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("kmv_distinct expects a literal INT k")
    else if (kExpr.eval(InternalRow.empty).asInstanceOf[Int] < 2)
      // k is foldable, so the bound can fail at ANALYSIS time with a clean
      // message instead of as a retried executor-task failure
      TypeCheckResult.TypeCheckFailure(
        s"kmv_distinct k must be >= 2, got ${kExpr.eval(InternalRow.empty)}")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val k: Int = {
    val v = kExpr.eval(InternalRow.empty).asInstanceOf[Int]
    require(v >= 2, s"kmv_distinct k must be >= 2, got $v") // defense in depth
    v
  }

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  private def insert(buf: Buffer, v: Long): Unit = {
    val s = buf.set
    if (s.size < buf.k) { s.add(v); () }
    else if (v < s.last) {
      if (s.add(v)) s.pollLast() // cap: drop the now-(k+1)-th smallest
    }
  }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    val it = other.set.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: Buffer): Any =
    if (buf.set.size < buf.k) buf.set.size.toDouble // not full: count is exact
    else {
      // left-associated exactly as the oracle SQL writes it:
      // ((k-1) * 2^60) / kth — FP association matters for the hash proof
      val kth = buf.set.last.longValue()
      (buf.k - 1).toDouble * HashSpace / kth.toDouble
    }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * buf.set.size)
    bb.putInt(buf.k).putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Buffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.set.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvDistinctAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** Count-Min sketch aggregate — `cms_sketch(item, depth, width)`: a
  * `depth × width` counter matrix over the item stream, returned as one
  * flat `array<long>` (row-major).
  *
  * The mergeable frequency sketch (Cormode & Muthukrishnan 2005): each
  * item increments one counter per row at `md5("cms{i}:" ++ item) mod
  * width`; a point estimate for any item is the MIN of its counters
  * (biased high by collisions, never low). Partial state is a fixed
  * `depth·width` long array no matter how many items or how many
  * DISTINCT items flow through — the property that matters at 100 TB,
  * where exact per-item counting shuffles a dictionary. Merge is
  * element-wise addition, so the sketch is a pure deterministic function
  * of the input multiset (partitioning- and order-invariant), and the
  * row hashes are the engine's standard md5 kernel — both facts together
  * let the DuckDB oracle rebuild the identical matrix and estimates.
  *
  * Null items are skipped. `depth`/`width` must be foldable literals
  * with `depth ≥ 1`, `width ≥ 2`, and `depth·width ≤ 2²²` (a 32 MB
  * buffer cap).
  */
case class CmsAgg(
    child: Expression,
    depthExpr: Expression,
    widthExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child, depthExpr, widthExpr)
  override def nullable: Boolean = false
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  private def foldableInt(e: Expression): Option[Int] =
    if (e.dataType == IntegerType && e.foldable)
      Option(e.eval(InternalRow.empty)).map(_.asInstanceOf[Int])
    else None

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckFailure("cms_sketch expects a STRING item column")
    else (foldableInt(depthExpr), foldableInt(widthExpr)) match {
      case (Some(d), Some(w)) =>
        if (d < 1 || w < 2) TypeCheckResult.TypeCheckFailure(
          s"cms_sketch needs depth >= 1 and width >= 2, got ($d, $w)")
        else if (d.toLong * w > (1 << 22)) TypeCheckResult.TypeCheckFailure(
          s"cms_sketch depth*width must be <= 2^22, got ${d.toLong * w}")
        else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "cms_sketch expects literal INT depth and width")
    }

  private lazy val depth: Int = foldableInt(depthExpr).get
  private lazy val width: Int = foldableInt(widthExpr).get
  // row-salt prefixes "cms0:", "cms1:", ... as UTF-8 bytes
  private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(depth)(i => s"cms$i:".getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private lazy val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      val md = digest.get()
      val out = new Array[Byte](16)
      var i = 0
      while (i < depth) {
        md.reset()
        md.update(prefixes(i))
        md.update(bytes)
        md.digest(out, 0, 16)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (out(b) & 0xffL); b += 1 }
        // top 60 bits — the same CONV(SUBSTR(md5,1,15),16,10) the oracle uses
        buf(i * width + ((h >>> 4) % width).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsAgg =
    copy(child = newChildren(0), depthExpr = newChildren(1), widthExpr = newChildren(2))
}

/** HyperLogLog register sketch over 60-bit hashes — `hll_sketch(h, p)`:
  * the m = 2^p max-rho registers as an `array<int>` (index order).
  *
  * Flajolet et al. 2007: each hash routes to register `h >> (60-p)` (its
  * top p bits) and the register keeps the MAXIMUM of `rho(w)` = 1 +
  * leading-zero count of the remaining 60-p bits. Partial state is a
  * fixed m bytes per partition regardless of cardinality, merge is
  * element-wise max, so the register array is a pure deterministic
  * function of the input SET — partitioning- and order-invariant, which
  * is what lets the DuckDB oracle rebuild the identical array (group
  * max of `(60-p) - length(bin(w)) + 1` per register) and estimate.
  *
  * Returning the REGISTERS rather than a baked-in estimate keeps every
  * downstream choice open and exact: the raw harmonic estimate is a
  * closed form over the array (see [[graft.operators.Sketches.hllEstimate]]
  * and the q_hll_distinct gate, where the 2^55-scaled harmonic sum is
  * EXACT integer arithmetic for p ≥ 6 — the term for an empty register
  * is 2^55, 2^p of them stay under 2^63); the full estimator with the
  * small-range linear-counting branch (ln, ulp-divergent across libms)
  * lives in Scala where no hash gate depends on it.
  *
  * vs [[KmvDistinctAgg]]: KMV state is k longs (8k bytes) and its
  * estimate uses only the k-th order statistic; HLL state is 2^p bytes
  * and uses every hash, so at equal state size HLL's standard error
  * (1.04/√m) beats KMV's (≈1/√k) — the sketch you'd actually ship per
  * group at 100 TB. Both are kept: KMV's estimate is reproducible with
  * ZERO transcendentals, HLL is the compact one.
  *
  * Inputs are 60-bit non-negative hashes (the `word_window_hashes` md5
  * kernel domain); bits above 60 are masked defensively. `p` must be a
  * foldable literal in [4, 16] (16 → 64 KB registers). Nulls skipped.
  */
case class HllSketchAgg(
    child: Expression,
    pExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child, pExpr)
  override def nullable: Boolean = false
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("hll_sketch expects a LONG hash column")
    else if (pExpr.dataType != IntegerType || !pExpr.foldable)
      TypeCheckResult.TypeCheckFailure("hll_sketch expects a literal INT p")
    else {
      val p = Option(pExpr.eval(InternalRow.empty)).map(_.asInstanceOf[Int])
      if (p.exists(v => v >= 4 && v <= 16)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"hll_sketch p must be in [4, 16], got ${p.orNull}")
    }

  private lazy val p: Int = pExpr.eval(InternalRow.empty).asInstanceOf[Int]
  private lazy val m: Int = 1 << p
  private lazy val tailBits: Int = 60 - p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] & ((1L << 60) - 1)
      val idx = (h >>> tailBits).toInt
      val w = h & ((1L << tailBits) - 1)
      // rho = 1 + leading zeros of the tail; empty tail = tailBits + 1
      val rho =
        if (w == 0L) tailBits + 1
        else tailBits - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rho > buf(idx)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](buf.length)
    var i = 0
    while (i < buf.length) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren(0), pExpr = newChildren(1))
}

object KmvDistinctAgg {
  /** 2⁶⁰ — the size of the `word_window_hashes` hash space. */
  val HashSpace: Double = math.pow(2, 60)

  /** ≤ k smallest distinct hashes; TreeSet gives dedup + ordered access. */
  final class Buffer(val k: Int) {
    val set = new java.util.TreeSet[java.lang.Long]()
  }

  private[functions] def insert(buf: Buffer, v: Long): Unit = {
    val s = buf.set
    if (s.size < buf.k) { s.add(v); () }
    else if (v < s.last) {
      if (s.add(v)) s.pollLast()
    }
  }

  private[functions] def serializeBuf(buf: Buffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * buf.set.size)
    bb.putInt(buf.k).putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  private[functions] def deserializeBuf(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Buffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.set.add(bb.getLong); i += 1 }
    buf
  }
}

/** Shared shape of the two sketch-STATE aggregates: the same bottom-k
  * buffer as [[KmvDistinctAgg]], but `eval` returns the state itself —
  * the k smallest distinct hashes, sorted ascending, as `array<long>` —
  * instead of collapsing to the estimate. Materialized states are what
  * make the 100 TB rollup pattern work: aggregate once at the finest
  * grain (per day / per partition / per source-shard), STORE the
  * states, then re-aggregate to any coarser grain by merging states —
  * no rescan of the raw data, and `bottomK(A ∪ B) =
  * bottomK(bottomK(A) ∪ bottomK(B))` makes the merged state IDENTICAL
  * to the single-pass state (spec-pinned), so estimates off rolled-up
  * states carry the same oracle-reproducible determinism. */
sealed trait KmvStateLike extends TypedImperativeAggregate[KmvDistinctAgg.Buffer] {
  import KmvDistinctAgg.Buffer
  def kExpr: Expression

  override def nullable: Boolean = false
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  protected lazy val k: Int = {
    val v = kExpr.eval(InternalRow.empty).asInstanceOf[Int]
    require(v >= 2, s"kmv state k must be >= 2, got $v")
    v
  }
  override def createAggregationBuffer(): Buffer = new Buffer(k)
  override def merge(buf: Buffer, other: Buffer): Buffer = {
    val it = other.set.iterator()
    while (it.hasNext) KmvDistinctAgg.insert(buf, it.next())
    buf
  }
  override def eval(buf: Buffer): Any = {
    val out = new Array[Any](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }
  override def serialize(buf: Buffer): Array[Byte] = KmvDistinctAgg.serializeBuf(buf)
  override def deserialize(bytes: Array[Byte]): Buffer = KmvDistinctAgg.deserializeBuf(bytes)

  protected def checkK: TypeCheckResult =
    if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("expects a literal INT k")
    else if (kExpr.eval(InternalRow.empty).asInstanceOf[Int] < 2)
      TypeCheckResult.TypeCheckFailure(
        s"k must be >= 2, got ${kExpr.eval(InternalRow.empty)}")
    else TypeCheckResult.TypeCheckSuccess
}

/** `kmv_sketch(h, k)` — build the KMV state from raw 60-bit hashes. */
case class KmvStateAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KmvStateLike {
  import KmvDistinctAgg.Buffer

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("kmv_sketch expects a LONG hash column")
    else checkK

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) KmvDistinctAgg.insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvStateAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvStateAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvStateAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** `kmv_merge(state, k)` — roll up materialized KMV states (each an
  * `array<long>` from [[KmvStateAgg]] or a previous merge) into the
  * state of the union. Null states are skipped. */
case class KmvMergeAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KmvStateLike {
  import KmvDistinctAgg.Buffer

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(LongType, _) => checkK
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_merge expects an ARRAY<LONG> state column, got $other")
  }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        KmvDistinctAgg.insert(buf, arr.getLong(i)); i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvMergeAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
