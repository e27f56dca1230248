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

  /** One predicate matching any supported GML spatial element — shared by
    * the bbox prune and the projection so the projection always copies
    * exactly the element set the server-side prune tested. */
  private val SpatialGuard =
    XQueryGen.GmlSpatialTypes.map(t => s"local-name()='$t'").mkString(" or ")

  /** A column that maps to one simple `*:c` child — the only shape the
    * server-side projection, aggregation, and order-by paths can
    * rebuild. */
  private[sources] def simpleName(c: String): Boolean = c.matches("[A-Za-z][A-Za-z0-9]*")

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

  /** eXist's REST result-chunk size for one `<query>` POST. Without an
    * explicit `max` eXist applies its OWN default (10), silently
    * truncating; [[fetchRecords]] pages with `start`/`max` until a short
    * chunk arrives. */
  val ExistPageSize = 1000

  /** eXist-db's REST query body — the protocol differs from BaseX: the
    * query POSTs to the collection URL itself inside a `<query>` element
    * in the eXist namespace with explicit `start`/`max` paging attributes
    * (1-based), and the response arrives wrapped in `<exist:result>`
    * (eXist REST API; the reference's second live backend —
    * extension/existdb_extension/existdb_extension.ts). */
  def existQueryBody(xquery: String, start: Int = 1, max: Int = ExistPageSize): String = {
    val safe = xquery.replace("]]>", "]]]]><![CDATA[>")
    "<query xmlns=\"http://exist.sourceforge.net/NS/exist\" " +
      s"""start="$start" max="$max">""" +
      s"<text><![CDATA[$safe]]></text></query>"
  }

  /** A bbox prune as a `geo:intersects` predicate a live BaseX evaluates
    * with its EXPath geo module — the spatial half of the reference's
    * pushdown (basex_extension.ts:385 constructSpatialFunctionTwoArgs;
    * the box travels as a GML2 polygon literal, the reference's GML
    * corpus dialect). The shape deliberately differs from the reference's
    * two-arg template to stay a SUPERSET of the scan's local prune (which
    * re-applies afterwards): `geo:envelope($g)` tests envelope
    * intersection exactly like [[graft.sources.StringFilterEval
    * .bboxPredicate]] (exact `geo:intersects` would drop envelope-only
    * matches the local prune keeps), the `(*|*&#47;*)` step finds spatial
    * elements both as direct children and under a wrapper (both shapes
    * [[graft.sources.Xml.flattenRecord]] accepts), and `some … satisfies`
    * keeps any record with at least one intersecting geometry (⊇ the
    * local last-geometry test) without erroring on geometry-less records. */
  def bboxPredicate(spec: String): Option[String] =
    if (spec == "empty") None // unsatisfiable: the caller skips the query
    else {
      val p = spec.split(",").map(_.trim.toDouble)
      require(p.length == 4, s"bbox must be 'x0,y0,x1,y1', got: $spec")
      val env = new org.locationtech.jts.geom.Envelope(p(0), p(2), p(1), p(3))
      val gml = graft.geo.GmlKml.writeGml2(
        new org.locationtech.jts.geom.GeometryFactory().toGeometry(env))
      Some(s"(some $$g in (*|*/*)[$SpatialGuard] satisfies " +
        s"geo:intersects($gml, geo:envelope($$g)))")
    }

  /** Server-side column projection: a return expression copying only the
    * needed child elements (plus the spatial children when geometry or a
    * bbox prune is needed) — the engine-side analog of the reference
    * projecting its backend queries (extension/xml_extension.ts
    * getFieldsData; mongo_extension.ts:154 constructProjectionQuery).
    * Only SIMPLE columns project faithfully (copied `*:c` children
    * flatten to the same map entries, duplicates preserved in document
    * order for the last-wins rule); any needed `parent__child`,
    * `_attribute__`, or `_undef__` column makes this None and the whole
    * record travels instead. */
  private[sources] def projectionExpr(varName: String, columns: Seq[String],
                                      wantGeometry: Boolean,
                                      as: String = "result"): Option[String] = {
    val simple = columns.filterNot(_ == "geometry").distinct
    if (!simple.forall(simpleName)) None
    else {
      val parts = simple.map(c => s"$$$varName/*:$c") ++
        (if (wantGeometry) Seq(s"$$$varName/(*|*/*)[$SpatialGuard]") else Nil)
      Some(s"element{'$as'}{${parts.mkString(",")}}")
    }
  }

  /** The XQuery one partition sends for one document: the reference's
    * selection FLWOR, for BaseX wrapped in a single result element so the
    * response is one well-formed document whatever the match count (eXist
    * wraps responses in `exist:result` itself). The record path honors
    * the source's `recordTag` option ([[recordPath]]); `needed` columns
    * project server-side when expressible ([[projectionExpr]]). A bbox
    * prune joins the predicates as `geo:intersects` on BaseX; eXist gets
    * no spatial predicate, matching the reference's empty eXist module
    * config (existdb_extension.ts:36) — the scan's local prune covers it. */
  def documentQuery(db: String, doc: String, version: XQueryGen.Version,
                    recordTag: Option[String], filters: Seq[Filter],
                    bbox: Option[String] = None,
                    needed: Option[Seq[String]] = None,
                    limit: Option[Int] = None,
                    sort: Option[(Seq[graft.sources.TopNPushdown.SortKey], Int)] = None): String = {
    val recordPath = BaseXRest.recordPath(recordTag)
    val varName = BaseXRest.varName(doc)
    val spatial =
      if (version == XQueryGen.ExistDb601) Nil
      else bbox.flatMap(bboxPredicate).toSeq
    val wantGeometry = needed.exists(_.contains("geometry")) || bbox.isDefined
    val returnExpr = needed
      .flatMap(cols => projectionExpr(varName, cols, wantGeometry)).orNull
    val sel = XQueryGen.selection(db, doc, version, filters, spatial,
      recordPath = recordPath, varName = varName, returnExpr = returnExpr,
      orderBy = sort.map(s => orderByClause(varName, s._1)).orNull)
    // a pushed LIMIT caps the wire: subsequence keeps the first n records
    // (the caller only passes it when no filter/bbox re-applies — any n
    // records satisfy an unordered LIMIT, so first-n is exact). A pushed
    // TopN caps the same way over the ORDERED sequence; see
    // [[orderByClause]] for why a conforming server's first-n is exact.
    val capped = limit.orElse(sort.map(_._2))
      .map(n => s"subsequence($sel, 1, $n)").getOrElse(sel)
    if (version == XQueryGen.ExistDb601) capped
    else s"element{'rest-results'}{$capped}"
  }

  /** The FLWOR `order by` clause for a pushed TopN
    * ([[graft.sources.TopNPushdown]]). Per key: the record's LAST
    * simple-valued, un-grouped element — exactly the value
    * [[graft.sources.Xml.flattenRecord]] maps to the column, so the
    * server orders by what the engine compares — with `/string()`
    * dropping absent elements to the empty sequence, which the
    * `empty least`/`empty greatest` modifier then places where Spark
    * puts NULLs. The unstated collation is XQuery's default codepoint
    * collation: codepoint order == UTF-8 byte order == `UTF8String`
    * binary order, the engine's `StringType` comparison — so a
    * conforming server's first-n equals the local first-n and the
    * `subsequence` cap is exact. Same residual trust caveat as the
    * in-database aggregation ([[supportsServerAgg]]): the caller only
    * caps when no filter/bbox re-applies locally, and a server that
    * ignored the `order by` would under-deliver like one that
    * miscounts a pushed COUNT. */
  private[sources] def orderByClause(varName: String,
                                     keys: Seq[graft.sources.TopNPushdown.SortKey]): String =
    "order by " + keys.map { k =>
      val dir = if (k.descending) "descending" else "ascending"
      // empty least ⟺ (ASC NULLS FIRST | DESC NULLS LAST); the other two
      // combinations need the empties at the sequence's greatest end
      val empty = if (k.descending == k.nullsLast) "least" else "greatest"
      s"($$$varName/*:${k.col}[not(*)][not(@group)])[last()]/string() $dir empty $empty"
    }.mkString(", ")

  /** Descendant `*:tag` steps for a recordTag; two child steps (children
    * of the document's ROOT element — `db:open` answers a document node,
    * so a single step would select the root itself) for the tag-less
    * default, matching [[graft.sources.Xml.records]]. */
  private def recordPath(recordTag: Option[String]): String =
    recordTag.map(t => s"//*:$t").getOrElse("/*/*")

  /** A valid XQuery variable name for a document: non-NCName characters
    * drop, and a leading digit (or empty remainder) gains a letter prefix
    * (`2024.xml` must not generate `$2024xmli`). */
  private def varName(doc: String): String = {
    val cleaned = doc.replaceAll("[^A-Za-z0-9]", "")
    (if (cleaned.isEmpty || cleaned.head.isDigit) "d" + cleaned else cleaned) + "i"
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
    * compile to XQuery, no bbox (its local envelope-prune semantics are
    * a record-level test, not a predicate the count query can share),
    * COUNT / MIN / MAX specs (MIN/MAX compare as strings under the
    * codepoint collation, which equals the local UTF8String binary
    * order — UTF-8 byte order preserves codepoints), any number of
    * group columns (multi-key grouping binds one variable per column —
    * [[XQueryGen.aggregation]]), simple column names (no
    * `parent__child` / `_attribute__` forms), and a BaseX dialect.
    *
    * Residual trust caveat (documented, inherent to aggregating inside
    * the store): records whose filter column repeats or nests diverge —
    * pushed predicates match existentially server-side while local
    * flattening compares the last simple value. */
  private[sources] def supportsServerAgg(version: XQueryGen.Version, filters: Seq[Filter],
                        bbox: Option[String],
                        groups: Seq[String],
                        specs: Seq[graft.sources.AggPushdown.Spec]): Boolean = {
    import graft.sources.AggPushdown._
    version != XQueryGen.ExistDb601 && bbox.isEmpty &&
      filters.forall(f => XQueryGen.fromSparkFilter(f).isDefined) &&
      groups.forall(simpleName) &&
      specs.forall { case CountStarSpec => true
                     case CountSpec(c)  => simpleName(c)
                     case MinSpec(c)    => simpleName(c)
                     case MaxSpec(c)    => simpleName(c) }
  }

  /** The aggregation XQuery for one document: the filtered record sequence
    * bound to `$doc`, the reference's aggregation FLWOR
    * ([[XQueryGen.aggregation]]) over it, and one `result` element per
    * group in the response wrapper. Three deliberate deviations from the
    * reference's projection templates keep the counts equal to the local
    * [[graft.sources.AggPushdown.aggregate]] semantics: `COUNT(col)`
    * counts RECORDS carrying a simple-valued column
    * (`$aggregaterow[*:c[not(*)]]`) rather than column elements (a record
    * with two `<c>` children counts once, like the flattened map);
    * group keys read the LAST simple-valued element (`[not(*)][last()]`,
    * the flattening's last-wins rule) and atomize safely when elements
    * repeat; `COUNT(*)` uses a `star` wrapper (the reference's literal
    * `_func__count__*` is not a legal element name to construct). A
    * `null='true'` attribute marks a group whose records lack the
    * element, keeping SQL NULL distinct from empty text. */
  private[sources] def aggregateQuery(db: String, doc: String, version: XQueryGen.Version,
                     recordTag: Option[String], filters: Seq[Filter],
                     groups: Seq[String],
                     specs: Seq[graft.sources.AggPushdown.Spec]): String = {
    import graft.sources.AggPushdown._
    def keyOf(c: String) = s"($$aggregaterow/*:$c[not(*)])[last()]"
    val preds = filters.flatMap(XQueryGen.fromSparkFilter)
    val where = if (preds.isEmpty) "" else preds.mkString("[", " and ", "]")
    val projections = groups.map { g =>
      s"element{'$g'}{let $$v := ${keyOf(g)} " +
        s"return if (exists($$v)) then data($$v) else attribute{'null'}{'true'}}"
    } ++ specs.map {
      case CountStarSpec => "element{'_func__count__star'}{count($aggregaterow)}"
      case CountSpec(c) =>
        s"element{'_func__count__$c'}{count($$aggregaterow[*:$c[not(*)]])}"
      // MIN/MAX over the per-record last-wins value, FORCED to xs:string:
      // fn:min/max cast untypedAtomic to double, which would order "10"
      // before "9" differently from the local string comparison. The
      // trailing /string() also drops records without the element (where
      // string($empty) would inject "") so absence never becomes the
      // minimum; an all-absent group answers the null marker.
      case MinSpec(c) =>
        s"element{'_func__min__$c'}{let $$v := min(for $$r in $$aggregaterow " +
          s"return ($$r/*:$c[not(*)])[last()]/string()) " +
          s"return if (exists($$v)) then $$v else attribute{'null'}{'true'}}"
      case MaxSpec(c) =>
        s"element{'_func__max__$c'}{let $$v := max(for $$r in $$aggregaterow " +
          s"return ($$r/*:$c[not(*)])[last()]/string()) " +
          s"return if (exists($$v)) then $$v else attribute{'null'}{'true'}}"
    }
    s"""let $$doc := ${version.docFunc(db, doc)}${recordPath(recordTag)}$where
       |${XQueryGen.aggregation(groups, projections, keyOf, multiVarSpecs = true)}
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
        val aggVals = cells.drop(groups.length).zip(specs).map {
          case (e, graft.sources.AggPushdown.CountStarSpec |
                   graft.sources.AggPushdown.CountSpec(_)) => e.text.trim.toLong
          case (e, _) => // MIN/MAX: nullable string partials
            if (e.attribute("null").isDefined) null
            else org.apache.spark.unsafe.types.UTF8String.fromString(e.text)
        }
        org.apache.spark.sql.catalyst.InternalRow.fromSeq(groupVals ++ aggVals)
      }
  }

  /** Runs the document query and answers the matched record elements —
    * the element children of the response root (the `rest-results`
    * wrapper on BaseX, `exist:result` on eXist). BaseX answers everything
    * in the one wrapper; eXist chunks, so its branch pages with
    * `start`/`max` until a short chunk arrives. */
  def fetchRecords(docUrl: String, version: XQueryGen.Version,
                   recordTag: Option[String], filters: Seq[Filter],
                   bbox: Option[String], timeoutMs: Int,
                   needed: Option[Seq[String]] = None,
                   limit: Option[Int] = None,
                   sort: Option[(Seq[graft.sources.TopNPushdown.SortKey], Int)] = None)
      : Iterator[scala.xml.Elem] = {
    val (root, db, doc) = anatomy(docUrl).getOrElse(
      throw new IllegalArgumentException(
        s"serverPushdown needs <rest-root>/<db>/<doc> URLs; got $docUrl"))
    val xquery = documentQuery(db, doc, version, recordTag, filters, bbox, needed, limit, sort)
    runQuery(root, s"$root/$db", version, xquery, timeoutMs)
  }

  /** POSTs one XQuery and answers the response root's element children.
    * BaseX answers everything in one response; the eXist dialect chunks
    * at [[ExistPageSize]] (and truncates at its OWN default without
    * explicit `start`/`max`), so its branch pages LAZILY — the caller
    * pulls pages as it consumes records, and a pushed LIMIT (or any
    * early stop) ends the HTTP traffic, like the CouchDB `_find`
    * cursor. */
  private def runQuery(root: String, existUrl: String, version: XQueryGen.Version,
                       xquery: String, timeoutMs: Int): Iterator[scala.xml.Elem] = {
    // SecureXml.strict everywhere: responses are untrusted network content
    def elems(resp: String): Seq[scala.xml.Elem] =
      graft.geo.SecureXml.strict.loadString(resp)
        .child.collect { case e: scala.xml.Elem => e }
    if (version == XQueryGen.ExistDb601) {
      // eXist POSTs to the collection URL and pages; `start` is the
      // 1-based absolute record offset (= served + 1). 100k pages of
      // [[ExistPageSize]] = the old 100M-record backstop.
      graft.sources.Paged.pull(100 * 1000, existUrl,
        ask = _ => ExistPageSize,
        fetch = (served, ask) => elems(graft.sources.DocFiles.post(existUrl,
          existQueryBody(xquery, served + 1, ask), "application/xml", timeoutMs)))
    } else
      elems(graft.sources.DocFiles.post(root, queryBody(xquery),
        "application/xml", timeoutMs)).iterator
  }

  /** The per-document-pair join XQuery the live path sends — the
    * reference's 2-collection join pushdown (src/getdata.ts:110,
    * xml_extension.ts:712 INNER branch; [[XQueryGen.joinQuery]] carries
    * the verbatim template). Two deliberate deviations keep the server
    * result a SUPERSET of local evaluation, which the scan's local
    * re-apply then reduces to exactness:
    *
    *  - the ON comparison reads ELEMENT paths (`$r&#47;*:col = $l&#47;*:col`),
    *    not the reference's `/text()` — a general comparison over
    *    elements atomizes each occurrence's full string value, so a
    *    record whose key element carries mixed content (several text
    *    nodes) still matches the concatenated value local flattening
    *    compares, where per-text-node comparison would silently DROP the
    *    pair (the unrecoverable direction); repeated key elements match
    *    existentially, a superset of the flattening's last-wins value;
    *  - each surviving pair returns BOTH records re-wrapped whole
    *    (`element{'l'}{$l/@*, $l&#47;*}`), not the merged first-wins dedup —
    *    the two sides flatten independently on the engine side, so
    *    same-named columns never shadow each other and every pushed
    *    filter re-checks against exactly the values the local path
    *    would have produced. */
  private[sources] def joinDocumentQuery(
      dbL: String, docL: String, recordTagL: Option[String], filtersL: Seq[Filter],
      dbR: String, docR: String, recordTagR: Option[String], filtersR: Seq[Filter],
      on: Seq[(String, String)], version: XQueryGen.Version,
      neededL: Option[Seq[String]] = None,
      neededR: Option[Seq[String]] = None): String = {
    // reference operand order: the right side leads (xml_extension.ts:770)
    val onClause = on.map { case (lc, rc) =>
      s"$$r/${XQueryGen.columnPath(rc)} = $$l/${XQueryGen.columnPath(lc)}"
    }.mkString(" and ")
    // each side projects server-side when its needed columns are simple
    // (the single-table path's projectionExpr contract — the needed set
    // already includes ON keys and filter references so the local
    // re-apply still sees every value it checks); otherwise the whole
    // record travels, attributes included
    def wrapper(as: String): String = {
      val needed = if (as == "l") neededL else neededR
      needed.flatMap(cols =>
        projectionExpr(as, cols, cols.contains("geometry"), as))
        .getOrElse(s"element{'$as'}{$$$as/@*,$$$as/*}")
    }
    val body =
      s"""for $$l in ${version.docFunc(dbL, docL)}${recordPath(recordTagL)}${XQueryGen.predBracket(filtersL)}, $$r in ${version.docFunc(dbR, docR)}${recordPath(recordTagR)}${XQueryGen.predBracket(filtersR)}
         |where $onClause
         |return element{'result'}{${wrapper("l")},${wrapper("r")}}""".stripMargin
    if (version == XQueryGen.ExistDb601) body
    else s"element{'rest-results'}{$body}"
  }

  /** Runs the join query for one (left document, right document) pair and
    * answers the surviving record pairs. Both documents must live under
    * ONE REST root (the compatibility gate checks this at planning time);
    * eXist pages pair-results like any other query. */
  private[sources] def fetchJoinRecords(
      leftDocUrl: String, rightDocUrl: String, version: XQueryGen.Version,
      recordTagL: Option[String], filtersL: Seq[Filter],
      recordTagR: Option[String], filtersR: Seq[Filter],
      on: Seq[(String, String)],
      timeoutMs: Int,
      neededL: Option[Seq[String]] = None,
      neededR: Option[Seq[String]] = None): Iterator[(scala.xml.Elem, scala.xml.Elem)] = {
    val (rootL, dbL, docL) = anatomy(leftDocUrl).getOrElse(
      throw new IllegalArgumentException(s"join pushdown needs REST URLs; got $leftDocUrl"))
    val (rootR, dbR, docR) = anatomy(rightDocUrl).getOrElse(
      throw new IllegalArgumentException(s"join pushdown needs REST URLs; got $rightDocUrl"))
    require(rootL == rootR, s"join pushdown spans one server; got $rootL vs $rootR")
    val xq = joinDocumentQuery(dbL, docL, recordTagL, filtersL,
      dbR, docR, recordTagR, filtersR, on, version, neededL, neededR)
    runQuery(rootL, s"$rootL/$dbL", version, xq, timeoutMs).map { pair =>
      val sides = pair.child.collect { case e: scala.xml.Elem => e }
      require(sides.length == 2 && sides.head.label == "l" && sides(1).label == "r",
        s"join result must pair <l> and <r> wrappers, got: $pair")
      (sides.head, sides(1))
    }
  }
}
