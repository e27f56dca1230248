package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aggregate pushdown (COUNT / COUNT(col) / MIN / MAX, with GROUP BY) for
  * the graft document sources — the Spark-side analog of the reference
  * pushing COUNT + GROUP BY into BaseX (reference: src/getdata.ts:71-156,
  * extension/basex/basex_extension.ts:16-30 supportedProjectionFunctions).
  *
  * Partial pushdown: each file partition emits its local per-group states
  * and Spark's final aggregate combines them (count → sum, min → min,
  * max → max), so correctness is independent of how records are split
  * across files. A count-only probe over a document lake thus reads and
  * flattens each record once but never builds or shuffles full rows.
  */
private[sources] object AggPushdown {

  sealed trait Spec
  case object CountStarSpec extends Spec { override def toString = "COUNT(*)" }
  final case class CountSpec(col: String) extends Spec { override def toString = s"COUNT($col)" }
  final case class MinSpec(col: String) extends Spec { override def toString = s"MIN($col)" }
  final case class MaxSpec(col: String) extends Spec { override def toString = s"MAX($col)" }

  /** (groupBy column names, aggregate specs) when every piece is computable
    * on the flattened string map; None rejects the pushdown. */
  def translate(agg: Aggregation): Option[(Seq[String], Seq[Spec])] = {
    def name(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] = e match {
      case r: NamedReference if r.fieldNames.length == 1 && r.fieldNames()(0) != "geometry" =>
        Some(r.fieldNames()(0))
      case _ => None
    }
    val groups = agg.groupByExpressions.toSeq.map(name)
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar                       => Some(CountStarSpec)
      case c: Count if !c.isDistinct          => name(c.column).map(CountSpec)
      case m: Min                             => name(m.column).map(MinSpec)
      case m: Max                             => name(m.column).map(MaxSpec)
      case _                                  => None
    }
    if (groups.forall(_.isDefined) && specs.forall(_.isDefined))
      Some((groups.flatten, specs.flatten))
    else None
  }

  /** Scan schema contract for partial aggregate pushdown: groupBy columns
    * first (string), then one column per aggregate (count → long). */
  def schemaFor(groups: Seq[String], specs: Seq[Spec]): StructType = StructType(
    groups.map(StructField(_, StringType, nullable = true)) ++
      specs.zipWithIndex.map {
        case (CountStarSpec, i)  => StructField(s"count_star_$i", LongType, nullable = false)
        case (CountSpec(c), i)   => StructField(s"count_${c}_$i", LongType, nullable = false)
        case (MinSpec(c), i)     => StructField(s"min_${c}_$i", StringType, nullable = true)
        case (MaxSpec(c), i)     => StructField(s"max_${c}_$i", StringType, nullable = true)
      })

  /** Aggregates one partition's flattened records into per-group rows.
    * String min/max compare in UTF8String binary order = Spark's
    * StringType ordering. A global aggregation (no grouping) always emits
    * exactly one row, so empty partitions still contribute count 0. */
  def aggregate(records: Iterator[scala.collection.Map[String, String]],
                groups: Seq[String], specs: Seq[Spec]): Iterator[InternalRow] = {
    final class State {
      val counts = new Array[Long](specs.length)
      val minmax = new Array[String](specs.length)
      def update(m: scala.collection.Map[String, String]): Unit = {
        var i = 0
        specs.foreach { s =>
          s match {
            case CountStarSpec => counts(i) += 1
            case CountSpec(c)  => if (valueOf(m, c) != null) counts(i) += 1
            case MinSpec(c) =>
              val v = valueOf(m, c)
              if (v != null && (minmax(i) == null || cmp(v, minmax(i)) < 0)) minmax(i) = v
            case MaxSpec(c) =>
              val v = valueOf(m, c)
              if (v != null && (minmax(i) == null || cmp(v, minmax(i)) > 0)) minmax(i) = v
          }
          i += 1
        }
      }
      def row(key: List[String]): InternalRow = InternalRow.fromSeq(
        key.map(v => if (v == null) null else UTF8String.fromString(v)) ++
          specs.zipWithIndex.map {
            case (CountStarSpec, i) => counts(i)
            case (CountSpec(_), i)  => counts(i)
            case (_, i) => if (minmax(i) == null) null else UTF8String.fromString(minmax(i))
          })
    }
    val states = new java.util.LinkedHashMap[List[String], State]()
    if (groups.isEmpty) states.put(Nil, new State) // global agg: one row always
    records.foreach { m =>
      val key = groups.map(g => valueOf(m, g)).toList
      var st = states.get(key)
      if (st == null) { st = new State; states.put(key, st) }
      st.update(m)
    }
    import scala.jdk.CollectionConverters._
    states.entrySet().iterator().asScala.map(e => e.getValue.row(e.getKey))
  }

  /** Explicit JSON nulls and missing keys are both SQL NULL. */
  private def valueOf(m: scala.collection.Map[String, String], c: String): String =
    m.get(c).orNull

  private def cmp(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
}
