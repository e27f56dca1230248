package graft.sources.xquery

import org.apache.spark.sql.sources.Filter

/** BaseX REST query execution — the live half of the reference's BaseX
  * integration (reference: extension/basex/basex_extension.ts drives a
  * running BaseX session; the REST protocol is BaseX's documented HTTP
  * surface: `POST /rest` with a `<rest:query>` body runs the enclosed
  * XQuery and answers its serialized result).
  *
  * The graft-xml source uses this when `serverPushdown=true` on an
  * `http(s)://` collection: each partition POSTs the
  * [[XQueryGen.selection]] for ITS document — predicates evaluate inside
  * the database and only matching records cross the wire, while Spark
  * keeps one task per document (the reference runs the session query
  * single-threaded; here the same construction fans out per resource).
  * The scan re-applies every pushed filter locally afterwards, so a
  * server that ignores the query degrades to transfer cost, never to a
  * wrong result.
  */
object BaseXRest {

  /** Splits a listed document URL `<rest-root>/<db>/<doc>` into
    * (POST endpoint, database, document) — the inverse of the listing in
    * [[graft.sources.DocFiles.listHttpCollection]] (GET `/rest/<db>`
    * names resources; documents live one level below). None when the URL
    * is not HTTP or too shallow to name a database. */
  def anatomy(docUrl: String): Option[(String, String, String)] = {
    if (!docUrl.startsWith("http://") && !docUrl.startsWith("https://")) None
    else {
      val clean = docUrl.takeWhile(c => c != '?' && c != '#')
      val segs = clean.split("/")
      // ["http:", "", host, ..., db, doc] — need at least a root segment
      if (segs.length < 6) None
      else Some((segs.dropRight(2).mkString("/"), segs(segs.length - 2), segs.last))
    }
  }

  /** The `<rest:query>` POST body. The XQuery travels in CDATA; a literal
    * `]]>` inside it (possible via filter values) splits the section, the
    * standard CDATA escape. */
  def queryBody(xquery: String): String = {
    val safe = xquery.replace("]]>", "]]]]><![CDATA[>")
    "<rest:query xmlns:rest=\"http://basex.org/rest\">" +
      s"<rest:text><![CDATA[$safe]]></rest:text></rest:query>"
  }

  /** eXist-db's REST query body — the protocol differs from BaseX: the
    * query POSTs to the collection URL itself inside a `<query>` element
    * in the eXist namespace, and the response arrives wrapped in
    * `<exist:result>` (eXist REST API; the reference's second live
    * backend — extension/existdb_extension/existdb_extension.ts). */
  def existQueryBody(xquery: String): String = {
    val safe = xquery.replace("]]>", "]]]]><![CDATA[>")
    "<query xmlns=\"http://exist.sourceforge.net/NS/exist\">" +
      s"<text><![CDATA[$safe]]></text></query>"
  }

  /** A bbox prune as the `geo:intersects` predicate a live BaseX evaluates
    * with its EXPath geo module — the spatial half of the reference's
    * pushdown (basex_extension.ts:385 constructSpatialFunctionTwoArgs;
    * the envelope travels as a GML2 polygon literal, the reference's GML
    * corpus dialect). */
  def bboxPredicate(spec: String): Option[String] =
    if (spec == "empty") None // unsatisfiable: the caller skips the query
    else {
      val p = spec.split(",").map(_.trim.toDouble)
      require(p.length == 4, s"bbox must be 'x0,y0,x1,y1', got: $spec")
      val env = new org.locationtech.jts.geom.Envelope(p(0), p(2), p(1), p(3))
      val gml = graft.geo.GmlKml.writeGml2(
        new org.locationtech.jts.geom.GeometryFactory().toGeometry(env))
      Some(XQueryGen.spatialFunctionTwoArgs("ST_Intersects", gml, "=", "true"))
    }

  /** The XQuery one partition sends for one document: the reference's
    * selection FLWOR, for BaseX wrapped in a single result element so the
    * response is one well-formed document whatever the match count (eXist
    * wraps responses in `exist:result` itself). The record path honors
    * the source's `recordTag` option (`/&#42;` = children of the document
    * root, the tag-less default of [[graft.sources.Xml.records]]). A bbox
    * prune joins the predicates as `geo:intersects` on BaseX; eXist gets
    * no spatial predicate, matching the reference's empty eXist module
    * config (existdb_extension.ts:36) — the scan's local prune covers it. */
  def documentQuery(db: String, doc: String, version: XQueryGen.Version,
                    recordTag: Option[String], filters: Seq[Filter],
                    bbox: Option[String] = None): String = {
    val recordPath = recordTag.map(t => s"//*:$t").getOrElse("/*")
    val varName = doc.replaceAll("[^A-Za-z0-9]", "") + "i"
    val spatial =
      if (version == XQueryGen.ExistDb601) Nil
      else bbox.flatMap(bboxPredicate).toSeq
    val sel = XQueryGen.selection(db, doc, version, filters, spatial,
      recordPath = recordPath, varName = varName)
    if (version == XQueryGen.ExistDb601) sel else s"element{'rest-results'}{$sel}"
  }

  /** `dialect` + `basexVersion` options → dialect (default BaseX 9.7, the
    * reference's primary target — basex_extension.ts:32 moduleConfig). */
  def versionOf(dialect: Option[String], basexVersion: Option[String]): XQueryGen.Version =
    dialect match {
      case Some("existdb") => XQueryGen.ExistDb601
      case None | Some("basex") => basexVersion match {
        case None | Some("9.7") => XQueryGen.BaseX97
        case Some("7.6")        => XQueryGen.BaseX76
        case Some("10.5")       => XQueryGen.BaseX105
        case Some(other) => throw new IllegalArgumentException(
          s"basexVersion '$other' not supported (7.6, 9.7, 10.5)")
      }
      case Some(other) => throw new IllegalArgumentException(
        s"dialect '$other' not supported (basex, existdb)")
    }

  /** Whether a pushed aggregation can run INSIDE the database instead of
    * transferring matching records (the reference pushes COUNT + GROUP BY
    * into BaseX — src/getdata.ts:71-156). Server aggregation forfeits the
    * local filter re-apply (there are no records to re-check — the same
    * trust model as any federated COUNT pushdown), so it only applies
    * when every pushed piece is faithfully expressible: all filters
    * compile to XQuery, no bbox (its local envelope-prune semantics
    * differ from geo:intersects), COUNT-only specs, simple column names
    * (the reference's count wrapper paths — no `parent__child` /
    * `_attribute__` forms), and a BaseX dialect. */
  private[sources] def supportsServerAgg(version: XQueryGen.Version, filters: Seq[Filter],
                        bbox: Option[String],
                        groups: Seq[String],
                        specs: Seq[graft.sources.AggPushdown.Spec]): Boolean = {
    import graft.sources.AggPushdown._
    def simple(c: String) = c.matches("[A-Za-z][A-Za-z0-9]*")
    version != XQueryGen.ExistDb601 && bbox.isEmpty &&
      filters.forall(f => XQueryGen.fromSparkFilter(f).isDefined) &&
      groups.forall(simple) &&
      specs.forall { case CountStarSpec => true
                     case CountSpec(c)  => simple(c)
                     case _             => false }
  }

  /** The aggregation XQuery for one document: the filtered record sequence
    * bound to `$doc`, the reference's aggregation FLWOR
    * ([[XQueryGen.aggregation]] / [[XQueryGen.countProjection]]) over it,
    * and one `result` element per group in the response wrapper. Group
    * keys travel as elements named after the column (a `null='true'`
    * attribute marks a group whose records lack the element, keeping SQL
    * NULL distinct from empty text); `COUNT(*)` uses a `star` wrapper
    * (the reference's literal `_func__count__*` is not a legal element
    * name to construct). */
  private[sources] def aggregateQuery(db: String, doc: String, version: XQueryGen.Version,
                     recordTag: Option[String], filters: Seq[Filter],
                     groups: Seq[String],
                     specs: Seq[graft.sources.AggPushdown.Spec]): String = {
    import graft.sources.AggPushdown._
    val recordPath = recordTag.map(t => s"//*:$t").getOrElse("/*")
    val preds = filters.flatMap(XQueryGen.fromSparkFilter)
    val where = if (preds.isEmpty) "" else preds.mkString("[", " and ", "]")
    val projections = groups.map { g =>
      s"element{'$g'}{let $$v := ($$aggregaterow/*:$g)[1] " +
        s"return if (exists($$v)) then data($$v) else attribute{'null'}{'true'}}"
    } ++ specs.map {
      case CountStarSpec => "element{'_func__count__star'}{count($aggregaterow)}"
      case CountSpec(c)  => XQueryGen.countProjection(c)
      case other => throw new IllegalArgumentException(s"not server-pushable: $other")
    }
    s"""let $$doc := ${version.docFunc(db, doc)}$recordPath$where
       |${XQueryGen.aggregation(groups, projections)}
       |return element{'rest-results'}{$$aggregated}""".stripMargin
  }

  /** Runs the aggregation query and answers PARTIAL per-group rows in the
    * [[graft.sources.AggPushdown.schemaFor]] layout (groups first, then
    * counts) — Spark sums the per-document partials exactly as it does
    * the local per-partition ones. Result children parse positionally:
    * the projection order above is the document order of the response. */
  private[sources] def fetchAggRows(docUrl: String, version: XQueryGen.Version,
                   recordTag: Option[String], filters: Seq[Filter],
                   groups: Seq[String],
                   specs: Seq[graft.sources.AggPushdown.Spec],
                   timeoutMs: Int): Seq[org.apache.spark.sql.catalyst.InternalRow] = {
    val (root, db, doc) = anatomy(docUrl).getOrElse(
      throw new IllegalArgumentException(
        s"serverPushdown needs <rest-root>/<db>/<doc> URLs; got $docUrl"))
    val xq = aggregateQuery(db, doc, version, recordTag, filters, groups, specs)
    val resp = graft.sources.DocFiles.post(root, queryBody(xq), "application/xml", timeoutMs)
    graft.geo.SecureXml.strict.loadString(resp)
      .child.collect { case e: scala.xml.Elem => e }
      .map { result =>
        val cells = result.child.collect { case e: scala.xml.Elem => e }
        require(cells.length == groups.length + specs.length,
          s"aggregation result arity ${cells.length} != ${groups.length + specs.length}")
        val groupVals = cells.take(groups.length).map { e =>
          if (e.attribute("null").isDefined) null
          else org.apache.spark.unsafe.types.UTF8String.fromString(e.text)
        }
        val countVals = cells.drop(groups.length).map(e => e.text.trim.toLong)
        org.apache.spark.sql.catalyst.InternalRow.fromSeq(groupVals ++ countVals)
      }
  }

  /** Runs the document query and answers the matched record elements —
    * the element children of the response root (the `rest-results`
    * wrapper on BaseX, `exist:result` on eXist). */
  def fetchRecords(docUrl: String, version: XQueryGen.Version,
                   recordTag: Option[String], filters: Seq[Filter],
                   bbox: Option[String], timeoutMs: Int): Seq[scala.xml.Elem] = {
    val (root, db, doc) = anatomy(docUrl).getOrElse(
      throw new IllegalArgumentException(
        s"serverPushdown needs <rest-root>/<db>/<doc> URLs; got $docUrl"))
    val xquery = documentQuery(db, doc, version, recordTag, filters, bbox)
    // eXist POSTs to the collection URL; BaseX to the REST root
    val (postUrl, body) =
      if (version == XQueryGen.ExistDb601) (s"$root/$db", existQueryBody(xquery))
      else (root, queryBody(xquery))
    val resp = graft.sources.DocFiles.post(postUrl, body, "application/xml", timeoutMs)
    // SecureXml.strict: the response is untrusted network content
    graft.geo.SecureXml.strict.loadString(resp)
      .child.collect { case e: scala.xml.Elem => e }
  }
}
