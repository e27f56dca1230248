package graft.sources.mongo

import javax.naming.Context
import javax.naming.directory.InitialDirContext

/** `mongodb+srv://` initial DNS seedlist discovery — the MongoDB
  * connection-string extension where the URL names ONE hostname and the
  * actual replica-set seed list comes from DNS:
  *
  *   - SRV records at `_mongodb._tcp.<fqdn>` supply the member
  *     host:port seeds (what Atlas publishes);
  *   - at most ONE TXT record at `<fqdn>` may supply default options,
  *     restricted to `authSource` and `replicaSet` — any other key is
  *     an error, and explicit URL options override TXT;
  *   - TLS defaults ON (the spec's posture: SRV implies a managed,
  *     internet-reachable deployment) unless the URL says `tls=false`;
  *   - every SRV target must live under the query hostname's PARENT
  *     domain (fqdn minus its first label, which must leave ≥ 2
  *     labels) — the spec's defense against a poisoned SRV answer
  *     redirecting the driver to an attacker's host.
  *
  * Resolution is pluggable through [[SrvResolver]]: production uses
  * [[SrvResolver.Jndi]] (the JDK's built-in DNS provider — no extra
  * dependency, works on any executor that can resolve names), and specs
  * inject a fake to prove the validation and the end-to-end path
  * without a live DNS zone. Seeds order deterministically by
  * (priority asc, weight desc, target, port) — the RFC 2782 selection
  * collapsed to a stable total order (no random weighted shuffle: a
  * Spark task retry must walk the same list).
  */
object SrvDiscovery {

  trait SrvResolver {
    /** SRV answers for `name` as (priority, weight, port, target). */
    def srv(name: String): Seq[(Int, Int, Int, String)]
    /** TXT answers for `name` (one string per record). */
    def txt(name: String): Seq[String]
  }

  object SrvResolver {
    /** JDK JNDI DNS provider — queries the system's configured
      * nameservers. */
    object Jndi extends SrvResolver {
      private def ctx = {
        val env = new java.util.Hashtable[String, String]()
        env.put(Context.INITIAL_CONTEXT_FACTORY, "com.sun.jndi.dns.DnsContextFactory")
        env.put(Context.PROVIDER_URL, "dns:")
        new InitialDirContext(env)
      }
      private def records(name: String, rrType: String): Seq[String] = {
        val c = ctx
        try {
          val attr = c.getAttributes(name, Array(rrType)).get(rrType)
          if (attr == null) Seq.empty
          else (0 until attr.size).map(i => String.valueOf(attr.get(i)))
        } catch {
          // JNDI raises NameNotFoundException on NXDOMAIN — which is a
          // NORMAL answer here: TXT is optional per the discovery spec
          // (a deployment with SRV records and no TXT at the fqdn must
          // resolve), and an absent SRV name should surface as
          // resolve()'s clean "no SRV records" message, not a raw
          // javax.naming stack
          case _: javax.naming.NameNotFoundException => Seq.empty
        } finally c.close()
      }
      override def srv(name: String): Seq[(Int, Int, Int, String)] =
        records(name, "SRV").flatMap { r =>
          // "priority weight port target." per RFC 2782 presentation
          r.trim.split("\\s+") match {
            case Array(p, w, pt, t) =>
              for {
                pi <- p.toIntOption; wi <- w.toIntOption; pti <- pt.toIntOption
              } yield (pi, wi, pti, t.stripSuffix("."))
            case _ => None
          }
        }
      override def txt(name: String): Seq[String] =
        records(name, "TXT").map(_.stripPrefix("\"").stripSuffix("\""))
    }
  }

  private val SrvUrl =
    "^mongodb\\+srv://(?:([^@/]+)@)?([^/?#@:,]+)/([^/?#]+)/([^/?#]+)(?:\\?([^#]*))?$".r

  def isSrvUrl(url: String): Boolean = url.startsWith("mongodb+srv://")

  /** Resolves a `mongodb+srv://` URL to the `mongodb://`-equivalent
    * parts: (userinfo-or-null, seed list, db, coll, merged query
    * string). Answers None when the URL doesn't match the SRV grammar
    * (one hostname, no port, no comma list); throws
    * IllegalArgumentException — with the reason — when the grammar is
    * fine but DNS answers violate the discovery spec, so the user sees
    * "SRV target x.y outside parent domain" rather than a generic
    * bad-URL message. */
  def resolve(url: String, resolver: SrvResolver)
      : Option[(String, Seq[(String, Int)], String, String, String)] = url match {
    case SrvUrl(userinfo, fqdn, db, coll, query) =>
      val labels = fqdn.split("\\.", -1).toSeq
      require(labels.length >= 3 && labels.forall(_.nonEmpty),
        s"mongodb+srv hostname must have >= 3 labels (host.domain.tld), got $fqdn")
      // DNS names are case-insensitive and resolvers may preserve answer
      // case: compare (and emit seeds) lowercased, or a legal SRV answer
      // differing only in case would be rejected as poisoned
      val parentDomain =
        labels.tail.mkString(".").toLowerCase(java.util.Locale.ROOT)

      // normalize presentation-form targets (trailing root dot, case)
      // HERE, so every resolver implementation gets the same validation
      // semantics
      val answers = resolver.srv(s"_mongodb._tcp.$fqdn")
        .map { case (p, w, port, target) =>
          (p, w, port,
            target.stripSuffix(".").toLowerCase(java.util.Locale.ROOT))
        }
      require(answers.nonEmpty, s"no SRV records at _mongodb._tcp.$fqdn")
      answers.foreach { case (_, _, port, target) =>
        require(target == parentDomain || target.endsWith(s".$parentDomain"),
          s"SRV target $target outside parent domain $parentDomain (poisoned answer?)")
        require(port >= 1 && port <= 65535, s"SRV port $port out of range for $target")
      }
      val seeds = answers
        .sortBy { case (prio, weight, port, target) => (prio, -weight, target, port) }
        .map { case (_, _, port, target) => (target, port) }.distinct

      val txts = resolver.txt(fqdn)
      require(txts.length <= 1,
        s"${txts.length} TXT records at $fqdn — the discovery spec allows at most one")
      val txtOpts: Seq[(String, String)] = txts.headOption.toSeq.flatMap { t =>
        t.split("&").iterator.filter(_.nonEmpty).map { kv =>
          val i = kv.indexOf('=')
          require(i > 0, s"malformed TXT option '$kv' at $fqdn")
          val key = kv.substring(0, i)
          require(Set("authsource", "replicaset")(key.toLowerCase(java.util.Locale.ROOT)),
            s"TXT option '$key' at $fqdn — only authSource/replicaSet may come from DNS")
          key -> kv.substring(i + 1)
        }.toSeq
      }
      // merged query: TXT defaults first, then URL options (the later
      // duplicate wins in ConnSpec's param map, so the URL overrides);
      // tls defaults ON for SRV unless the URL explicitly turns it off
      val urlQuery = Option(query).getOrElse("")
      val hasTlsOpt = urlQuery.toLowerCase(java.util.Locale.ROOT).split("&")
        .exists(kv => kv.startsWith("tls=") || kv.startsWith("ssl="))
      val merged = (txtOpts.map { case (k, v) => s"$k=$v" } ++
        (if (hasTlsOpt) Seq.empty else Seq("tls=true")) ++
        Option(query).filter(_.nonEmpty).toSeq).mkString("&")
      Some((userinfo, seeds, db, coll, merged))
    case _ => None
  }
}
