package graft

/** The one JSON string escaper (RFC 8259 §7: quote, backslash, and
  * control characters). Shared by every hand-built JSON emitter in the
  * codebase — the HTTP server, the Mango selector generator, and the
  * oracle dump — so an escaping fix lands everywhere at once. */
private[graft] object JsonText {
  def str(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'          => sb.append("\\\"")
      case '\\'         => sb.append("\\\\")
      case '\n'         => sb.append("\\n")
      case '\r'         => sb.append("\\r")
      case '\t'         => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c            => sb.append(c)
    }
    sb.append('"').toString
  }
}
