package graft.sources

import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection, SortOrder}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Pushed ORDER BY + LIMIT (TopN) shared by the graft document sources
  * (`SupportsPushDownTopN`, PARTIAL pushdown): each partition answers its
  * own top-n — a bounded heap over the locally re-applied records — and
  * Spark's TakeOrderedAndProject still merges partitions globally, so a
  * `SELECT … ORDER BY col LIMIT n` over a million-document collection
  * hands Spark n rows per partition instead of every record the filters
  * keep. The per-key comparison is UTF8String binary order — exactly
  * Spark's `StringType` ordering — so the partition-local reduction can
  * never disagree with the global merge.
  *
  * The BaseX/eXist wire additionally CAPS the query itself
  * ([[graft.sources.xquery.BaseXRest]] appends the FLWOR `order by` +
  * `subsequence`): XQuery's default codepoint collation equals UTF-8
  * byte order equals `UTF8String` binary order, so a conforming server's
  * first-n is the engine's first-n. The Mongo/CouchDB wire deliberately
  * does NOT cap: the flattened columns compare as strings here, but the
  * stored JSON values may be numbers, and BSON sorts numbers before
  * strings and `9 < 10` — a provable divergence (not a misbehaving
  * server), so capping could under-deliver. Those scans transfer the
  * selector's matches and reduce locally.
  */
object TopNPushdown {

  /** One pushed sort key over a string column of the scan schema. */
  final case class SortKey(col: String, descending: Boolean, nullsLast: Boolean) {
    override def toString: String =
      s"$col ${if (descending) "DESC" else "ASC"} NULLS ${if (nullsLast) "LAST" else "FIRST"}"
  }

  /** Accepts an ordering only when EVERY key is a direct single-part
    * reference to a `StringType` column of the scan schema — the value
    * the flattened record map carries verbatim, so the local comparison
    * is exactly what Spark's global sort re-compares. Anything else
    * (expressions, casts, the binary `geometry` column) stays in Spark. */
  def translate(orders: Array[SortOrder], schema: StructType): Option[Seq[SortKey]] = {
    val keys = orders.toSeq.map { o =>
      o.expression() match {
        case ref: NamedReference if ref.fieldNames().length == 1 =>
          val c = ref.fieldNames().head
          if (schema.fieldNames.contains(c) &&
              schema.fields(schema.fieldIndex(c)).dataType == StringType)
            Some(SortKey(c,
              o.direction() == SortDirection.DESCENDING,
              o.nullOrdering() == NullOrdering.NULLS_LAST))
          else None
        case _ => None
      }
    }
    if (keys.nonEmpty && keys.forall(_.isDefined)) Some(keys.flatten) else None
  }

  /** The record's key vector: the flattened map's value per sort column,
    * null when the column is absent (SQL NULL). */
  def keyVec(keys: Seq[SortKey], m: scala.collection.Map[String, String]): Array[UTF8String] = {
    val out = new Array[UTF8String](keys.length)
    var i = 0
    while (i < keys.length) {
      out(i) = m.get(keys(i).col).map(UTF8String.fromString).orNull
      i += 1
    }
    out
  }

  /** Lexicographic comparison of two key vectors under the spec:
    * UTF8String binary order per key, direction and null position
    * applied per key (null = missing column = SQL NULL). */
  def compareKeys(keys: Seq[SortKey], a: Array[UTF8String], b: Array[UTF8String]): Int = {
    var i = 0
    while (i < keys.length) {
      val k = keys(i)
      val x = a(i)
      val y = b(i)
      val c =
        if (x == null && y == null) 0
        else if (x == null) { if (k.nullsLast) 1 else -1 }
        else if (y == null) { if (k.nullsLast) -1 else 1 }
        else {
          val r = x.compareTo(y)
          if (k.descending) -r else r
        }
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** The n first records under the spec, in ARBITRARY order (the global
    * merge re-sorts): a bounded max-heap — head = worst kept — so one
    * pass costs O(records · log n) with O(n) memory however large the
    * partition. No discarded record sorts strictly before a kept one,
    * which is the whole contract partial TopN pushdown needs. */
  def topN[T](records: Iterator[T], keys: Seq[SortKey], n: Int)
             (keyOf: T => Array[UTF8String]): Iterator[T] = {
    if (n <= 0) return Iterator.empty
    val heap = new java.util.PriorityQueue[(Array[UTF8String], T)](
      math.max(1, math.min(n, 1 << 16)), // grow past 64k lazily, not up front
      new java.util.Comparator[(Array[UTF8String], T)] {
        override def compare(p1: (Array[UTF8String], T), p2: (Array[UTF8String], T)): Int =
          compareKeys(keys, p2._1, p1._1) // reversed: max-heap
      })
    records.foreach { r =>
      val kv = keyOf(r)
      if (heap.size < n) heap.add((kv, r))
      else if (compareKeys(keys, kv, heap.peek()._1) < 0) {
        heap.poll()
        heap.add((kv, r))
      }
    }
    val out = new scala.collection.mutable.ArrayBuffer[T](heap.size)
    val it = heap.iterator()
    while (it.hasNext) out += it.next()._2
    out.iterator
  }
}
