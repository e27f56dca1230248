package graft.sources.xml

import graft.sources.{DocFiles, Xml}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._


/** DataSource V2 for XML document collections:
  *
  * {{{
  *   spark.read.format("graft-xml")
  *     .option("recordTag", "feature")       // optional
  *     .option("columns", "name,addr__zip")  // optional: skip inference
  *     .load("/data/xml")                    // one document per file
  * }}}
  *
  * Produces the reference's flattening (`parent__child`,
  * `_attribute__elem[__attr]`, `_undef__group`, `geometry` WKB — see
  * [[graft.sources.Xml.flattenRecord]]). One input partition per file;
  * schema inferred from a bounded sample of files unless `columns` is
  * given (always pass it at 100 TB).
  */
class XmlDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-xml"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    Option(options.get("columns")) match {
      case Some(cols) =>
        XmlDataSource.schemaFor(cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      case None =>
        val recordTag = Option(options.get("recordTag"))
        val sample = DocFiles.listFiles(DocFiles.pathsOf(options)).take(8) // bounded inference
        val keys = scala.collection.mutable.SortedSet.empty[String]
        sample.foreach { f =>
          val doc = XmlDataSource.loadDoc(f)
          val kml = XmlDataSource.isKml(doc)
          Xml.records(doc, recordTag).foreach { r =>
            keys ++= Xml.flattenRecord(r, kml)._1.keys
          }
        }
        XmlDataSource.schemaFor(keys.toSeq)
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new XmlTable(schema, properties.asScala.toMap,
      DocFiles.listFiles(DocFiles.pathsOf(new CaseInsensitiveStringMap(properties))))
}

object XmlDataSource {
  def schemaFor(cols: Seq[String]): StructType = StructType(
    cols.map(StructField(_, StringType, nullable = true)) :+
      StructField("geometry", BinaryType, nullable = true))

  def isKml(doc: scala.xml.Elem): Boolean =
    doc.label.equalsIgnoreCase("kml") ||
      (doc.namespace != null && doc.namespace.contains("kml"))

  /** KML heuristic for a bare record element (no document root in sight):
    * its own namespace, or — for a server-side projected record, which is
    * a namespace-less `result` wrapper — any child's. */
  private[sources] def kmlish(e: scala.xml.Elem): Boolean =
    (e.namespace != null && e.namespace.contains("kml")) ||
      e.child.exists(c => c.namespace != null && c.namespace.contains("kml"))

  /** Parses one document by path/URL: XXE-hardened parser, and HTTP(S)
    * fetches carry connect/read timeouts so a stalled server fails the
    * task instead of hanging it. */
  private[sources] def loadDoc(file: String,
      timeoutMs: Int = graft.sources.DocFiles.HttpTimeoutMs): scala.xml.Elem = {
    val in = graft.sources.DocFiles.openDocStream(file, timeoutMs)
    try graft.geo.SecureXml.document.load(in)
    finally in.close()
  }
}

private class XmlTable(schema: StructType, properties: Map[String, String],
                       files: Seq[String]) extends Table with SupportsRead
    with graft.sources.GraftSpatialTable {
  override def name(): String = s"graft-xml(${files.length} files)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  // per-scan options win: SpatialFilterPushdown injects a derived `bbox`
  // into the relation options, which must not be clobbered by the
  // table-creation copy of the user options
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new XmlScanBuilder(schema, properties ++ options.asScala.toMap, files)
}

private class XmlScanBuilder(schema: StructType, options: Map[String, String],
                             files: Seq[String])
  extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  private var required: StructType = schema
  private var pushed: Array[Filter] = Array.empty
  private var agg: Option[(Seq[String], Seq[graft.sources.AggPushdown.Spec])] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT / COUNT(col) / MIN / MAX (+ GROUP BY) computed on the flattened
    * map per file — partial pushdown, Spark combines partition states
    * (reference pushes COUNT + GROUP BY into BaseX: src/getdata.ts:71-156,
    * basex_extension.ts:16-30). */
  override def pushAggregation(aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    val t = graft.sources.AggPushdown.translate(aggregation)
    agg = t
    t.isDefined
  }

  /** Accept string-column predicates we can decide on the flattened record
    * map (the reference pushes the same selections into its backend XQuery
    * — extension/basex/basex_extension.ts:130 supportedSelectionFunctions,
    * extension/xml_extension.ts:1313 constructXQuery). Accepted filters are
    * FULLY handled at parse time: non-matching records are dropped before an
    * InternalRow is ever built, and string comparison uses UTF8String binary
    * order, i.e. exactly Spark's StringType ordering. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, unsupported) = filters.partition(graft.sources.StringFilterEval.supports)
    pushed = supported
    unsupported
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = XmlScan(required, options, files, pushed, agg)
}

private[graft] case class XmlScan(required: StructType, options: Map[String, String],
                                  files: Seq[String], pushed: Array[Filter],
                                  agg: Option[(Seq[String], Seq[graft.sources.AggPushdown.Spec])] = None)
  extends Scan with Batch with graft.sources.GraftSpatialScan {
  override def readSchema(): StructType =
    agg.map { case (g, s) => graft.sources.AggPushdown.schemaFor(g, s) }.getOrElse(required)
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-xml ${files.length} files, PushedFilters: [${pushed.mkString(", ")}]" +
      options.get("bbox").map(b => s", bbox: [$b]").getOrElse("") +
      agg.map { case (g, s) =>
        s", PushedAggregation: [${s.mkString(", ")}], PushedGroupBy: [${g.mkString(", ")}]"
      }.getOrElse("") + xqueryPreview +
      (if (options.get("serverPushdown").orElse(options.get("serverpushdown"))
             .exists(_.toBoolean))
        if (options.get("dialect").contains("existdb")) ", ServerExec: existdb-rest"
        else ", ServerExec: basex-rest"
      else "")

  /** The pushed predicates as the XQuery a live BaseX deployment would
    * receive — surfaced in `explain` for observability (the engine
    * evaluates them at the scan here; [[graft.sources.xquery.XQueryGen]]
    * covers the server-side construction). */
  private def xqueryPreview: String = {
    val preds = pushed.toSeq.flatMap(graft.sources.xquery.XQueryGen.fromSparkFilter)
    if (preds.isEmpty) ""
    else s", XQueryPredicates: [${preds.mkString(" and ")}]"
  }

  override def bboxSpec: Option[String] = options.get("bbox")
  override def withBbox(spec: String): Scan = copy(options = options + ("bbox" -> spec))

  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => XmlInputPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val dialect = options.get("dialect")
    val basexVersion = options.get("basexVersion").orElse(options.get("basexversion"))
    // validate the dialect choice at planning time, not inside a task
    graft.sources.xquery.BaseXRest.versionOf(dialect, basexVersion)
    XmlReaderFactory(readSchema(), options.get("recordTag"), pushed, options.get("bbox"), agg,
      graft.sources.DocFiles.HttpTimeoutMs, // driver capture: executors don't see driver sys.props
      options.get("serverPushdown").orElse(options.get("serverpushdown")).exists(_.toBoolean),
      dialect, basexVersion)
  }
}

private case class XmlInputPartition(file: String) extends InputPartition

private case class XmlReaderFactory(schema: StructType, recordTag: Option[String],
                                    filters: Array[Filter], bbox: Option[String],
                                    agg: Option[(Seq[String], Seq[graft.sources.AggPushdown.Spec])],
                                    httpTimeoutMs: Int,
                                    serverPushdown: Boolean = false,
                                    dialect: Option[String] = None,
                                    basexVersion: Option[String] = None)
  extends PartitionReaderFactory {

  /** Columns the reader genuinely needs from each record: the output
    * schema (or, under an aggregate, the aggregate's source columns),
    * whatever the pushed filters re-check, and the geometry when a bbox
    * prunes. Server mode projects the record to these when expressible. */
  private def neededColumns: Seq[String] = {
    val base = agg match {
      case Some((groups, specs)) => groups ++ specs.collect {
        case graft.sources.AggPushdown.CountSpec(c) => c
        case graft.sources.AggPushdown.MinSpec(c)   => c
        case graft.sources.AggPushdown.MaxSpec(c)   => c
      }
      case None => schema.fieldNames.toSeq
    }
    (base ++ filters.toSeq.flatMap(_.references.toSeq) ++
      (if (bbox.isDefined) Seq("geometry") else Nil)).distinct
  }

  /** Record elements of one partition's document. Local mode parses the
    * whole document; server mode ([[graft.sources.xquery.BaseXRest]]) runs
    * the pushed predicates INSIDE the database and receives only matching
    * records (projected to [[neededColumns]] when expressible) — but the
    * caller still re-applies every filter, so the two modes agree even
    * against a server that ignored the query. */
  private def recordElems(file: String): Seq[(scala.xml.Node, Boolean)] =
    if (serverPushdown && file.startsWith("http")) {
      if (bbox.contains("empty")) Nil // provably-unsatisfiable prune: no query
      else graft.sources.xquery.BaseXRest.fetchRecords(file,
          graft.sources.xquery.BaseXRest.versionOf(dialect, basexVersion),
          recordTag, filters.toIndexedSeq, bbox, httpTimeoutMs,
          Some(neededColumns))
        // kml-ness is per record here (no document root to inspect); a
        // projected record carries it only on the copied spatial children
        .map(r => (r, XmlDataSource.kmlish(r)))
    } else {
      val doc = XmlDataSource.loadDoc(file, httpTimeoutMs)
      val kml = XmlDataSource.isKml(doc)
      Xml.records(doc, recordTag).map(r => (r, kml))
    }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[XmlInputPartition].file
    new PartitionReader[InternalRow] {
      // may be pruned away (e.g. count(*) requires no columns)
      private val geomIdx =
        if (schema.fieldNames.contains("geometry")) schema.fieldIndex("geometry") else -1
      private val bboxKeep = bbox.map(graft.sources.StringFilterEval.bboxPredicate)
      private val rows: Iterator[InternalRow] = {
        // COUNT(+GROUP BY) can aggregate INSIDE the database when every
        // pushed piece is XQuery-expressible — only per-group partials
        // cross the wire then (the reference's COUNT pushdown into BaseX)
        val serverAgg = agg.filter { case (groups, specs) =>
          serverPushdown && file.startsWith("http") && !bbox.contains("empty") &&
            graft.sources.xquery.BaseXRest.supportsServerAgg(
              graft.sources.xquery.BaseXRest.versionOf(dialect, basexVersion),
              filters.toIndexedSeq, bbox, groups, specs)
        }
        if (serverAgg.isDefined) {
          val (groups, specs) = serverAgg.get
          graft.sources.xquery.BaseXRest.fetchAggRows(file,
            graft.sources.xquery.BaseXRest.versionOf(dialect, basexVersion),
            recordTag, filters.toIndexedSeq, groups, specs, httpTimeoutMs).iterator
        } else {
          val records = recordElems(file).iterator.flatMap { case (r, kml) =>
            val (m, g) = Xml.flattenRecord(r, kml)
            // pushed filters run on the FULL flattened map (they may reference
            // columns pruned from the output schema) before any row is built
            if (bboxKeep.forall(_(g)) &&
                filters.forall(graft.sources.StringFilterEval.passes(_, m))) Some((m, g))
            else None
          }
          agg match {
            case Some((groups, specs)) =>
              graft.sources.AggPushdown.aggregate(records.map(_._1), groups, specs)
            case None => records.map { case (m, g) =>
              InternalRow.fromSeq(schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
                if (i == geomIdx) g.orNull
                else m.get(f.name).map(UTF8String.fromString).orNull
              })
            }
          }
        }
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
