package graft.functions

import java.util.Locale

import org.apache.spark.unsafe.types.UTF8String

/** Public-suffix-list lookup for registered-domain extraction — the key
  * under which crawl pipelines group, deduplicate, and blocklist URLs.
  * The naive "last two host labels" heuristic mis-groups every ccTLD
  * registrant (`bbc.co.uk` → `co.uk` lumps ALL .co.uk sites into one
  * "domain"); the PSL algorithm (publicsuffix.org/list/) fixes that.
  *
  * Rule grammar and matching follow the published PSL algorithm:
  *  - a rule matches when its labels are a suffix of the host's labels;
  *  - `*.foo` (wildcard) matches any single label in the starred slot;
  *  - `!bar.foo` (exception) prevails over every other match and names a
  *    REGISTRABLE domain — its public suffix is the rule minus its
  *    leftmost label;
  *  - otherwise the prevailing rule is the matching rule with the most
  *    labels; if nothing matches, the implicit default rule `*` applies
  *    (the bare TLD is the suffix);
  *  - registered domain = public suffix plus ONE more label; a host that
  *    IS a public suffix has no registered domain.
  *
  * The DEFAULT matcher compiles the FULL publicsuffix.org snapshot
  * bundled at `graft/public_suffix_list.dat` (~9.5k rules, MPL 2.0
  * public data — the OS `publicsuffix` package's copy, checked in as a
  * resource because this build has no network egress). Unicode IDN
  * rules are expanded with their punycode (`xn--`) forms at load so
  * wire-form hosts match them. [[snapshotRules]] — the former default,
  * a ~200-rule curated subset — remains only as the fallback when the
  * resource is absent from a repackaged jar. Deployments tracking a
  * NEWER list than the bundled snapshot construct a
  * [[PublicSuffix.Matcher]] from its lines and pass it to
  * [[graft.operators.TextAnalysis.urlDomain]]'s rules overload; the
  * matcher is a few string-interned hash sets, broadcast implicitly
  * inside the serialized expression.
  *
  * KEY STABILITY: the registered domain is a GROUPING KEY. Hosts under
  * suffixes the compiled list doesn't know fall back to last-two-labels,
  * so swapping rule sets (curated → full, or bundled → newer snapshot)
  * silently migrates the keys of affected hosts. Long-lived per-domain
  * artifacts (dedup indexes, blocklists, per-domain stats) must pin the
  * rules they were built with — pass that pinned set to the `rules`
  * overload rather than relying on the library default across upgrades.
  *
  * Punycode note: matching is exact on the byte form of the host —
  * IDN hosts must be punycoded (as they are on the wire and in the
  * PSL's own ICANN entries) before lookup.
  */
object PublicSuffix {

  /** Curated snapshot (see object doc). Lowercase; `//` comments and
    * blank entries tolerated so a verbatim PSL file can be spliced in. */
  val snapshotRules: Seq[String] = Seq(
    // ---- ICANN section (ccTLD second-level registries) ----
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz",
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "nom.za", "org.za", "school.za", "web.za",
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar",
    "mil.ar", "tur.ar",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "mil.tr",
    "gen.tr", "web.tr", "k12.tr", "name.tr", "biz.tr", "info.tr",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "game.tw", "club.tw", "ebiz.tw", "mil.tw",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my", "name.my",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "ac.id", "biz.id", "co.id", "go.id", "mil.id", "my.id", "net.id",
    "or.id", "sch.id", "web.id",
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il",
    "net.il", "org.il",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
    "net.eg", "org.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "med.sa", "pub.sa",
    "edu.sa", "sch.sa",
    "com.ng", "edu.ng", "gov.ng", "mil.ng", "net.ng", "org.ng", "sch.ng",
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    "gob.cl", "gov.cl", "co.cl", "mil.cl",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe", "mil.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "gob.ve", "edu.ve", "mil.ve",
    "co.ru", "com.ru", "net.ru", "org.ru", // private-registry legacy
    // wildcard registries + the canonical exception
    "*.ck", "!www.ck",
    "*.bd",
    "*.kh",
    // ---- private section (shared-hosting platforms: each tenant is an
    // independent site for dedup/blocklist purposes) ----
    "github.io", "githubusercontent.com", "gitlab.io",
    "blogspot.com", "wordpress.com",
    "herokuapp.com", "appspot.com",
    "netlify.app", "vercel.app", "pages.dev", "surge.sh",
    "web.app", "firebaseapp.com",
    "azurewebsites.net", "cloudapp.net",
    "s3.amazonaws.com", "compute.amazonaws.com", "elb.amazonaws.com",
    "fly.dev", "onrender.com", "readthedocs.io", "neocities.org")

  type Matcher = PslMatcher

  /** The bundled full-list snapshot's rule lines (comments pre-stripped,
    * entries cut at the first whitespace per the PSL format spec), each
    * Unicode IDN rule followed by its punycode form. Empty when the
    * resource is missing (a repackaged jar) — [[default]] then falls
    * back to [[snapshotRules]]. */
  lazy val fullRules: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    if (in == null) Seq.empty
    else try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.takeWhile(!_.isWhitespace)) // PSL spec: entry ends at first whitespace
        .filter(l => l.nonEmpty && !l.startsWith("//"))
        .flatMap(punycodeForms)
        .toVector
    } finally in.close()
  }

  /** The rule plus its punycoded form when they differ — hosts arrive
    * punycoded on the wire while the PSL lists IDN rules in Unicode. */
  private def punycodeForms(rule: String): Seq[String] = {
    val (prefix, name) =
      if (rule.startsWith("!")) ("!", rule.substring(1))
      else if (rule.startsWith("*.")) ("*.", rule.substring(2))
      else ("", rule)
    val ascii =
      try java.net.IDN.toASCII(name) catch { case _: IllegalArgumentException => name }
    if (ascii == name) Seq(rule) else Seq(rule, prefix + ascii)
  }

  val default: PslMatcher =
    new PslMatcher(if (fullRules.nonEmpty) fullRules else snapshotRules)

  /** Static kernel behind the `registered_domain` expression (codegen
    * dispatch — see [[GeoKernel]] and [[RegisteredDomain]]'s
    * addReferenceObj for the custom-rules variant). ASCII-lowercases
    * first so direct SQL calls with mixed-case hosts match; returns ""
    * for "no registrable domain" (the Column wrapper NULLIFs it). */
  def registeredDomain(host: UTF8String): UTF8String =
    registeredDomainWith(default, host)

  def registeredDomainWith(m: PslMatcher, host: UTF8String): UTF8String = {
    var s = host.toString
    var i = 0
    var upper = false
    while (i < s.length && !upper) { // cheap scan; hosts are ASCII on the wire
      val c = s.charAt(i); if (c >= 'A' && c <= 'Z') upper = true; i += 1
    }
    if (upper) s = s.toLowerCase(Locale.ROOT)
    UTF8String.fromString(m.registeredDomain(s))
  }
}

/** Compiled PSL rule set (see [[PublicSuffix]]); build one from a full
  * PSL file's lines for the complete list. Serializable — ships inside
  * the expression and is codegen-referenced via addReferenceObj (which
  * is why it is a top-level class: nested-class JVM names are not valid
  * Java source for the generated cast). */
final class PslMatcher(rules: Seq[String]) extends Serializable {
    private val exact = new java.util.HashSet[String]()
    private val wildcard = new java.util.HashSet[String]() // X of "*.X"
    private val excepted = new java.util.HashSet[String]() // Y of "!Y"
    rules.foreach { raw =>
      val r = raw.trim.toLowerCase(Locale.ROOT)
      if (r.nonEmpty && !r.startsWith("//")) {
        if (r.startsWith("!")) excepted.add(r.substring(1))
        else if (r.startsWith("*.")) wildcard.add(r.substring(2))
        else exact.add(r)
      }
    }

    /** Labels in the public suffix of `labels` (host split on '.'),
      * per the PSL prevailing-rule algorithm. Never 0; may equal
      * labels.length (host IS a suffix). */
    private def publicSuffixLabels(labels: Array[String]): Int = {
      val n = labels.length
      var suffixLen = 1 // implicit default rule "*"
      var cand = labels(n - 1)
      var k = 1
      while (k <= n) {
        if (excepted.contains(cand)) return k - 1 // exception prevails
        if (exact.contains(cand) && k > suffixLen) suffixLen = k
        if (k < n && wildcard.contains(cand) && k + 1 > suffixLen) suffixLen = k + 1
        k += 1
        if (k <= n) cand = labels(n - k) + "." + cand
      }
      suffixLen
    }

    /** Registered (registrable) domain of a bare lowercase host, or ""
      * when none exists (empty/malformed host, or the host is itself a
      * public suffix). */
    def registeredDomain(host: String): String = {
      if (host.isEmpty || host.charAt(0) == '.' ||
          host.charAt(host.length - 1) == '.') return ""
      val labels = host.split('.')
      if (labels.length == 0 || labels.exists(_.isEmpty)) return ""
      val sl = publicSuffixLabels(labels)
      if (sl >= labels.length) ""
      else labels.slice(labels.length - sl - 1, labels.length).mkString(".")
    }
}
