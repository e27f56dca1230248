package graft.sources

/** Pull-driven pagination shared by the server cursors (the eXist
  * `start`/`max` pager and the CouchDB `_find` cursor): each page is
  * fetched only as the consumer drains the previous one, so a pushed
  * LIMIT — or any early stop — ends the HTTP traffic mid-stream.
  *
  * The two load-bearing invariants live HERE so the cursors cannot
  * drift apart:
  *  - `served` (documents already consumed) is the absolute offset of
  *    the next request — a page whose ask shrank (a capped cursor's
  *    remainder) still resumes exactly where the previous one ended;
  *  - a page SHORTER than what was asked for means the server is
  *    exhausted, while a full page (even a shrunk capped one) may have
  *    more — so a cap can under-ask without ever terminating early. A
  *    page LARGER than asked (a server ignoring the limit parameter)
  *    also counts as "may have more": stopping there could drop the
  *    tail, and the extra documents already served keep the offset
  *    accounting exact either way.
  */
object Paged {

  /** `ask(served)` decides the next request size (constant for eXist;
    * the capped remainder for a predicate-free `_find` cursor) and
    * `fetch(served, ask)` performs it, answering the page's items. */
  def pull[T](backstopPages: Int, what: String, ask: Int => Int,
              fetch: (Int, Int) => Seq[T]): Iterator[T] =
    new Iterator[Seq[T]] {
      private var pages = 0
      private var served = 0
      private var lastAsked = -1
      private var last: Seq[T] = null
      override def hasNext: Boolean = last == null || last.size >= lastAsked
      override def next(): Seq[T] = {
        // backstop against a misbehaving server that answers full pages
        // forever
        require(pages < backstopPages, s"$what exceeded $backstopPages pages")
        lastAsked = ask(served)
        // an ask of 0 would make every empty page look continuable
        // (0 >= 0) and spin no-op fetches into the backstop — pin the
        // invariant here so no future cursor can drift into it
        require(lastAsked > 0, s"$what: page ask must be positive, got $lastAsked")
        last = fetch(served, lastAsked)
        pages += 1
        served += last.size
        last
      }
    }.flatten
}
