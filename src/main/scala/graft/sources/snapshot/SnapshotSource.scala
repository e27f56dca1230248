package graft.sources.snapshot

import graft.streaming.UpsertSink
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** The [[graft.streaming.UpsertSink]] store as a REGISTERED TABLE — the
  * front door that makes the lakehouse read path declarative:
  *
  * {{{
  *   CREATE TEMPORARY VIEW store USING `graft-snapshot`
  *     OPTIONS (path '/data/store')        -- [, versionAsOf '41']
  *   SELECT text FROM store WHERE doc_id IN (2, 6, 10)
  * }}}
  *
  * (equivalently `spark.read.format("graft-snapshot").load(path)`).
  * Unlike the `graft_snapshot_lookup` TVF — where the CALLER routes the
  * keys — here the OPTIMIZER does: Catalyst pushes the WHERE clause into
  * [[SnapshotRelation.buildScan]] as data-source [[Filter]]s, key
  * equality/IN conjuncts translate to bucket ids through the sink's own
  * routing hash ([[UpsertSink.bucketOfLiteral]] — the exact expression
  * the writer bucketed with), and only those buckets' files enter the
  * plan. Any query shape gets the pruning for free; non-key predicates
  * simply ride along as residuals. At production scale (thousands of
  * buckets, 100 TB) a `WHERE key = x` through this table opens a handful
  * of files instead of scanning the snapshot — data skipping that file
  * min/max stats can never provide for hash-distributed keys.
  *
  * A V1 `PrunedFilteredScan` by design: the relation's scan IS a
  * DataFrame plan over the manifest's parquet dirs (the same conformed
  * union every API read uses), so the V1 hook — "here are the filters,
  * give me an RDD" — is the exact seam; a DSv2 Batch would re-implement
  * the parquet reader for no new capability (the
  * [[graft.streaming.ChangeFeedSource]] precedent). Column pruning
  * reaches the parquet scan through the inner plan's select; every
  * filter is declared unhandled so Spark re-applies them all above the
  * scan — pruning here is an IO-level optimization, never a correctness
  * dependency (a filter the translation misses costs reading, not
  * wrong rows).
  *
  * The manifest binds at RELATION CREATION (schema and bucket map), so
  * a view reads one committed version consistently for its lifetime —
  * re-create the view (or `spark.read` again) to see later commits;
  * `versionAsOf` pins a historical version explicitly
  * ([[UpsertSink.readSnapshotAt]] selection rules).
  */
class SnapshotDataSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshot"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snapshot: 'path' option is required (the UpsertSink store root)"))
    val version = parameters.get("versionasof").orElse(parameters.get("versionAsOf"))
      .map(v => v.trim.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"graft-snapshot: versionAsOf must be an integer batch id, got '$v'")))
    SnapshotRelation(sqlContext.sparkSession, path, version)
  }
}

case class SnapshotRelation(spark: SparkSession, path: String,
                            versionAsOf: Option[Long])
    extends BaseRelation with PrunedFilteredScan {

  // the version this relation reads, fixed at creation: schema AND scan
  // resolve from this one manifest, so a concurrent writer's swaps never
  // tear a query (readers of the superseded manifest stay valid per the
  // store's retention contract)
  private val manifest = UpsertSink.manifestForScan(path, versionAsOf)

  override def sqlContext: SQLContext = spark.sqlContext
  override val schema: StructType = StructType.fromDDL(manifest.schemaDdl)

  /** All filters re-apply above the scan: the translation below prunes
    * IO, it never claims evaluation. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] =
    scanFrame(requiredColumns, filters).rdd

  /** The inner DataFrame plan `buildScan` wraps — package-visible so
    * specs can witness the pruning on `inputFiles` (the file set IS the
    * contract; the RDD boundary above it hides nothing else).
    *
    * Translatable filters ALSO apply inside, as Column predicates: the
    * V1 boundary would otherwise strand them above the RDD, where the
    * parquet scan never sees them — applied here, the inner plan's
    * optimizer pushes them into the scan (`PushedFilters`), so parquet
    * row-group min/max stats skip non-matching groups and rows drop
    * before crossing the boundary. Exact predicates, so the engine's
    * re-application above is an idempotent no-op; a filter the
    * translation can't express simply stays outer-only. */
  private[graft] def scanFrame(requiredColumns: Array[String],
                               filters: Array[Filter]): DataFrame = {
    // conjunctive filter list: intersect whatever key-routing each
    // conjunct yields (None = that conjunct can't prune)
    val wanted = filters.flatMap(keyBuckets)
      .reduceOption(_ intersect _)
    val base = UpsertSink.scanBuckets(spark, path, manifest, wanted)
    val filtered = filters.flatMap(conjuncts)
      .reduceOption(_ && _).map(base.filter).getOrElse(base)
    filtered.select(requiredColumns.map(col).toIndexedSeq: _*)
  }

  /** `f` split into independently-applicable Column conjuncts: in a
    * conjunctive context an AND's sides narrow independently, so a side
    * the translation can't express just drops (sound — the engine still
    * applies it above). Everything else must translate EXACTLY or not
    * at all ([[toColumn]]). */
  private def conjuncts(f: Filter): Seq[org.apache.spark.sql.Column] = f match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => toColumn(other).toSeq
  }

  /** `f` as a Column predicate over the snapshot schema, or None when
    * it has no EXACT Column spelling. Semantics must match Spark's own
    * filter evaluation exactly (these run in addition to, not instead
    * of, the engine's re-application — a mistranslation here would
    * silently DROP rows the outer filter would keep). Exactness is why
    * AND here needs BOTH sides even though [[conjuncts]] narrows
    * partially: under a NOT or an OR a partial AND would flip from a
    * sound narrowing into an unsound one. */
  private def toColumn(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isInCollection(vs.toSeq.map(lit)))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case StringEndsWith(a, s) => Some(col(a).endsWith(s))
    case StringContains(a, s) => Some(col(a).contains(s))
    case And(l, r) =>
      for { x <- toColumn(l); y <- toColumn(r) } yield x && y
    case Or(l, r) =>
      for { x <- toColumn(l); y <- toColumn(r) } yield x || y
    case Not(c) => toColumn(c).map(!_)
    case _ => None
  }

  /** Buckets that could satisfy `f`, or None when `f` can't route.
    * Key equality and IN translate through the writer's own hash;
    * AND narrows (either side alone suffices — a superset read is
    * always safe), OR widens (BOTH sides must route, else full scan).
    * NULL comparisons never match a stored key (`=`/`IN` on NULL is
    * never TRUE), so NULL values drop from the routing set — an
    * all-NULL IN list prunes to zero buckets, correctly reading
    * nothing. */
  private def keyBuckets(f: Filter): Option[Set[Int]] = f match {
    case EqualTo(k, v) if k == manifest.key =>
      Some(Option(v).map(bucketOf).toSet)
    case EqualNullSafe(k, v) if k == manifest.key && v != null =>
      Some(Set(bucketOf(v)))
    case In(k, vs) if k == manifest.key =>
      Some(vs.iterator.filter(_ != null).map(bucketOf).toSet)
    case And(a, b) => (keyBuckets(a), keyBuckets(b)) match {
      case (Some(x), Some(y)) => Some(x intersect y)
      case (x, y) => x.orElse(y)
    }
    case Or(a, b) =>
      for { x <- keyBuckets(a); y <- keyBuckets(b) } yield x union y
    case _ => None
  }

  private def bucketOf(v: Any): Int = UpsertSink.bucketOfLiteral(manifest, v)
}
