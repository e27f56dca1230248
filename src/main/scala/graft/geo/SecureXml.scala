package graft.geo

import javax.xml.parsers.{SAXParser, SAXParserFactory}

import scala.xml.Elem
import scala.xml.factory.XMLLoader

/** XML loaders hardened against XXE/SSRF. Document text reaching these
  * parsers is DATA (column values, network responses), so default SAX
  * settings — which resolve `<!ENTITY … SYSTEM "file://…">` and external
  * DTDs at parse time — would let a crafted document read local files or
  * probe internal URLs from whichever node parses it.
  *
  *  - [[strict]] additionally rejects any DOCTYPE declaration — right for
  *    formats that never legitimately carry one (GML/KML snippets, BaseX
  *    REST listings);
  *  - [[document]] keeps DOCTYPE parseable (real-world XML corpora carry
  *    them) but never resolves external entities or DTDs; internal entity
  *    expansion stays bounded by the JDK's entity-expansion limit.
  *
  * SAXParser instances are not thread-safe, so each loader is per-thread
  * (executor tasks parse concurrently).
  */
object SecureXml {

  private def newParser(allowDoctype: Boolean): SAXParser = {
    val f = SAXParserFactory.newInstance()
    if (!allowDoctype)
      f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    f.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
    f.setXIncludeAware(false)
    f.newSAXParser()
  }

  private def loaderPool(allowDoctype: Boolean): ThreadLocal[XMLLoader[Elem]] =
    ThreadLocal.withInitial { () =>
      new XMLLoader[Elem] { override val parser: SAXParser = newParser(allowDoctype) }
    }

  private val strictPool = loaderPool(allowDoctype = false)
  private val documentPool = loaderPool(allowDoctype = true)

  /** No DOCTYPE, no external anything. */
  def strict: XMLLoader[Elem] = strictPool.get()

  /** DOCTYPE allowed, externals never resolved. */
  def document: XMLLoader[Elem] = documentPool.get()
}
