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

  /** The XQuery one partition sends for one document: the reference's
    * selection FLWOR wrapped in a single result element so the response
    * is one well-formed document whatever the match count. The record
    * path honors the source's `recordTag` option (`/&#42;` = children of
    * the document root, the tag-less default of
    * [[graft.sources.Xml.records]]). */
  def documentQuery(db: String, doc: String, version: XQueryGen.Version,
                    recordTag: Option[String], filters: Seq[Filter]): String = {
    val recordPath = recordTag.map(t => s"//*:$t").getOrElse("/*")
    val varName = doc.replaceAll("[^A-Za-z0-9]", "") + "i"
    val sel = XQueryGen.selection(db, doc, version, filters,
      recordPath = recordPath, varName = varName)
    s"element{'rest-results'}{$sel}"
  }

  /** `basexVersion` option value → dialect (default 9.7, the reference's
    * primary target — basex_extension.ts:32 moduleConfig). */
  def versionOf(name: Option[String]): XQueryGen.Version = name match {
    case None | Some("9.7") => XQueryGen.BaseX97
    case Some("7.6")        => XQueryGen.BaseX76
    case Some("10.5")       => XQueryGen.BaseX105
    case Some(other) => throw new IllegalArgumentException(
      s"basexVersion '$other' not supported (7.6, 9.7, 10.5)")
  }

  /** Runs the document query and answers the matched record elements.
    * The response root is the `rest-results` wrapper from
    * [[documentQuery]]; its element children are the records. */
  def fetchRecords(docUrl: String, version: XQueryGen.Version,
                   recordTag: Option[String], filters: Seq[Filter],
                   timeoutMs: Int): Seq[scala.xml.Elem] = {
    val (root, db, doc) = anatomy(docUrl).getOrElse(
      throw new IllegalArgumentException(
        s"serverPushdown needs <rest-root>/<db>/<doc> URLs; got $docUrl"))
    val body = queryBody(documentQuery(db, doc, version, recordTag, filters))
    val resp = graft.sources.DocFiles.post(root, body, "application/xml", timeoutMs)
    // SecureXml.strict: the response is untrusted network content
    graft.geo.SecureXml.strict.loadString(resp)
      .child.collect { case e: scala.xml.Elem => e }
  }
}
