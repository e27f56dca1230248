package graft.sources.xquery

import org.apache.spark.sql.sources._

/** BaseX-flavored XQuery generation for the pushdown subset the graft
  * document sources support — the engine-side analog of the reference
  * driving a live BaseX by constructing XQuery against its session API
  * (reference: extension/xml_extension.ts:1313 `constructXQuery`,
  * extension/basex/basex_extension.ts:385
  * `constructSpatialFunctionTwoArgs` / :415 `...OneArgs` / :379
  * `constructModFunction`; version table at basex_extension.ts:32
  * `moduleConfig`).
  *
  * No live server is spoken to here (none exists in this environment);
  * the generator covers the reference's construction shapes so a
  * deployment with a real BaseX can push the same selections server-side:
  * per-version document access (`db:open` / `db:get`), `*:column`
  * selection paths, attribute (`_attribute__`) access, `mod` arithmetic,
  * and the `geo:*` EXPath module calls guarded by the supported spatial
  * type list. Strings are compared verbatim against the reference's
  * templates in XQueryGenSpec.
  */
object XQueryGen {

  /** BaseX version dialects (reference: basex_extension.ts:32 moduleConfig
    * — 7.6 and 9.7 open documents with db:open, 10.5 renamed it db:get and
    * db:list-details to db:list). */
  sealed abstract class Version(
      val name: String,
      val docFunc: (String, String) => String,
      val collectionNamesFunc: String => String)
  case object BaseX76 extends Version("7.6",
    (db, col) => s"""db:open("$db","$col")""",
    db => s"""db:list-details("$db")/text()""")
  case object BaseX97 extends Version("9.7",
    (db, col) => s"""db:open("$db","$col")""",
    db => s"""db:list-details("$db")/text()""")
  case object BaseX105 extends Version("10.5",
    (db, col) => s"""db:get("$db","$col")""",
    db => s"""db:list("$db")""")
  /** eXist-db opens collections by hierarchical path and pushes no spatial
    * or selection functions (reference:
    * extension/existdb_extension/existdb_extension.ts:36 moduleConfig —
    * modules and supportedSelectionFunctions are empty), so only the plain
    * predicate subset composes with this dialect. */
  case object ExistDb601 extends Version("6.0.1",
    (db, col) => s"""collection("/db/$db/$col")""",
    db => s"/db/$db")

  /** PostGIS name → EXPath geo module name, with arity (reference:
    * basex_extension.ts:75 supportedSpatialFunctionPrefix for 9.7). */
  val SpatialFunctions: Map[String, (String, Int)] = Map(
    "ST_Distance"     -> ("distance", 2),
    "ST_Intersects"   -> ("intersects", 2),
    "ST_Within"       -> ("within", 2),
    "ST_Dimension"    -> ("dimension", 1),
    "ST_GeometryType" -> ("geometry-type", 1),
    "ST_SRID"         -> ("srid", 1))

  /** GML spatial element names, reference order (basex_extension.ts:112
    * supportedSpatialType). */
  val GmlSpatialTypes: Seq[String] = Seq("MultiPoint", "Point", "LineString",
    "LinearRing", "Polygon", "MultiLineString", "MultiPolygon", "MultiGeometry")

  /** GML record path under the collection root (reference:
    * xml_extension.ts:497 constructExtensionQuery, case "gml"). */
  val GmlRecordPath = "gml:featureMember/*"

  private def spatialTypeGuard: String =
    GmlSpatialTypes.map(t => s"*/local-name()='$t'").mkString(" or ")

  /** `geo:fn(constant, <spatial child>) op constant2` — the reference's
    * two-arg shape (basex_extension.ts:385). `ST_Intersects` drops the
    * comparison and negates for false, as the reference does. */
  def spatialFunctionTwoArgs(postGISName: String, constant1: String,
                             operator: String, constant2: String): String = {
    val (fn, arity) = SpatialFunctions(postGISName)
    require(arity == 2, s"$postGISName is not a two-arg spatial function")
    if (fn == "intersects") {
      val call = s"geo:$fn($constant1, *[$spatialTypeGuard]/*)"
      if (constant2 == "false" || constant2 == "0") s"not($call)" else call
    } else
      s"geo:$fn($constant1, *[$spatialTypeGuard]/*) $operator $constant2"
  }

  /** `geo:fn(<spatial child>) op constant` — the reference's one-arg shape
    * (basex_extension.ts:415); `geometry-type` answers a QName, so its
    * comparison goes through local-name(). */
  def spatialFunctionOneArg(postGISName: String, operator: String,
                            constant: String): String = {
    val (fn, arity) = SpatialFunctions(postGISName)
    require(arity == 1, s"$postGISName is not a one-arg spatial function")
    val call = s"geo:$fn(*[$spatialTypeGuard]/*)"
    if (fn == "geometry-type") s"local-name($call) $operator $constant"
    else s"$call $operator $constant"
  }

  /** `*:col mod k op c` (reference: basex_extension.ts:379). */
  def modFunction(column: String, k: Long, operator: String, c: Long): String =
    s"*:$column mod $k $operator $c"

  /** Column selection path in the GML dialect: `*:col`, with the flattened
    * `_attribute__…` forms routed to `@attr` access (reference:
    * xml_extension.ts:1667-1706 — the same `parent__child` / `_attribute__`
    * convention the graft-xml reader flattens). */
  def columnPath(column: String): String =
    if (column.startsWith("_undef__"))
      throw new IllegalArgumentException(
        s"$column has no single document path — un-named group members " +
          "match in several positions; use the comparison filters, which " +
          "expand to the reference's disjunction")
    else if (column.startsWith("_attribute__")) {
      column.split("__").filter(_.nonEmpty) match {
        case Array("_attribute", attr)         => s"@$attr"
        case Array("_attribute", parent, attr) => s"*:$parent/@$attr"
        case _ => s"@${column.stripPrefix("_attribute__")}"
      }
    } else if (column.contains("__")) {
      val Array(parent, child) = column.split("__", 2)
      s"*:$parent/*:$child"
    } else s"*:$column"

  /** XQuery single-quoted string literal: an embedded apostrophe escapes
    * by doubling (XQuery 3.1 §2.4.4) — without it any value containing
    * `'` generates a syntax error (and an injection vector). */
  private def quote(s: String): String = s"'${s.replace("'", "''")}'"

  private def literal(v: Any): String = v match {
    case s: String => quote(s)
    case other     => String.valueOf(other)
  }

  /** An `_undef__<name>` column matches in SEVERAL document positions
    * (reference: xml_extension.ts:1712-1738, gml branch) — a child
    * element, an attribute at either level, or a member of a nested
    * collection group; the predicate is their disjunction. */
  private def undefPredicate(name: String, op: String, value: String): String =
    s"(*:$name $op $value or @$name $op $value or */@$name $op $value or " +
      s"*[@_is_collection='true']/*/*:$name $op $value or " +
      s"*[@_is_collection='true']/*/@$name $op $value)"

  private def compare(c: String, op: String, v: Any): String =
    if (c.startsWith("_undef__"))
      undefPredicate(c.stripPrefix("_undef__"), op, literal(v))
    else s"${columnPath(c)} $op ${literal(v)}"

  /** Existence path for IS [NOT] NULL. A simple column exists only when
    * a SIMPLE-valued, un-grouped element does (`*:c[not(*)][not(@group)]`):
    * the flattening maps an element with element children to `c__<child>`
    * keys and a `group`-attributed one to `_undef__<group>`, never `c`,
    * so a plain `exists(*:c)` would declare non-null — and a live server
    * would then DROP `IS NULL` rows the engine keeps (a subset divergence
    * the local re-apply cannot recover). Nested and attribute paths
    * already match the flattening's existence rule. */
  private def nullTestPath(c: String): String =
    if (!c.contains("__")) s"*:$c[not(*)][not(@group)]" else columnPath(c)

  /** The pushdown subset the graft-xml source accepts, as XQuery predicate
    * text. None for filters the source would not push either (including
    * the function-style forms on `_undef__` columns, whose multi-position
    * semantics only the comparison shape covers). */
  def fromSparkFilter(f: Filter): Option[String] = f match {
    case EqualTo(c, v)            => Some(compare(c, "=", v))
    case GreaterThan(c, v)        => Some(compare(c, ">", v))
    case GreaterThanOrEqual(c, v) => Some(compare(c, ">=", v))
    case LessThan(c, v)           => Some(compare(c, "<", v))
    case LessThanOrEqual(c, v)    => Some(compare(c, "<=", v))
    case Not(EqualTo(c, v))       => Some(compare(c, "!=", v))
    // XQuery's general `=` against a sequence IS the existential IN, and
    // its empty-sequence result (false) matches SQL's NULL IN (...) being
    // unknown → dropped. NOT IN stays unpushed: not(c = (...)) answers
    // TRUE on a missing element where SQL answers unknown.
    case In(c, vs) if !c.startsWith("_undef__") && vs.forall(_ != null) =>
      Some(s"${columnPath(c)} = (${vs.map(literal).mkString(", ")})")
    case IsNotNull(c) if !c.startsWith("_undef__") =>
      Some(s"exists(${nullTestPath(c)})")
    case IsNull(c) if !c.startsWith("_undef__") =>
      Some(s"not(exists(${nullTestPath(c)}))")
    case StringStartsWith(c, v) if !c.startsWith("_undef__") =>
      Some(s"starts-with(${columnPath(c)}, ${quote(v)})")
    case StringEndsWith(c, v) if !c.startsWith("_undef__") =>
      Some(s"ends-with(${columnPath(c)}, ${quote(v)})")
    case StringContains(c, v) if !c.startsWith("_undef__") =>
      Some(s"contains(${columnPath(c)}, ${quote(v)})")
    case And(l, r) =>
      for (a <- fromSparkFilter(l); b <- fromSparkFilter(r)) yield s"($a and $b)"
    case Or(l, r) =>
      for (a <- fromSparkFilter(l); b <- fromSparkFilter(r)) yield s"($a or $b)"
    case _ => None
  }

  /** COUNT projection element, the reference's aggregation shape
    * (xml_extension.ts:1913 funcArr push — a `_func__count__<col>` wrapper
    * element around the star-namespace count of the column; `*` counts
    * whole rows). The
    * engine-side counterpart is the DSv2 aggregate pushdown
    * (graft.sources.AggPushdown), which evaluates the same COUNT/GROUP BY
    * at the scan. */
  def countProjection(column: String): String = {
    val path = if (column == "*") "" else s"/*:$column"
    s"element{'_func__count__$column'}{attribute{'order'}{'1'}," +
      s"attribute{'group'}{'_func__count__$column'},count($$aggregaterow$path)}"
  }

  /** The aggregation FLWOR (xml_extension.ts:697): without GROUP BY the
    * whole `$doc` is one aggregate row; with it, rows group by the
    * star-namespace column paths (xml_extension.ts:2045
    * constructGroupByQuery). The default `keyOf` reproduces the
    * reference's key paths verbatim; the live execution path
    * ([[BaseXRest]]) overrides it with a single-item last-wins path so
    * multi-valued elements atomize instead of erroring.
    *
    * Multi-key grouping has two emissions. The default reproduces the
    * reference verbatim: the key list comma-joins into ONE grouping spec
    * (constructGroupByQuery) — which is NOT a valid XQuery
    * GroupingSpecList for more than one key, so the reference's own
    * multi-key construction could never execute as generated.
    * `multiVarSpecs=true` (the live execution path, [[BaseXRest]]) binds
    * one variable per column instead (`$group0 := k0, $group1 := k1`),
    * the form a real server accepts. */
  def aggregation(groupBy: Seq[String], projections: Seq[String],
                  keyOf: String => String = c => s"$$aggregaterow/*:$c",
                  multiVarSpecs: Boolean = false): String =
    if (groupBy.isEmpty)
      s"""let $$aggregaterow := $$doc
         |let $$aggregated:=element{'result'}{(${projections.mkString(",")})}""".stripMargin
    else {
      val specList =
        if (groupBy.length == 1) s"$$group := ${keyOf(groupBy.head)}"
        else if (multiVarSpecs) groupBy.zipWithIndex
          .map { case (c, i) => s"$$group$i := ${keyOf(c)}" }.mkString(", ")
        else s"$$group := ${groupBy.map(keyOf).mkString(",")}"
      s"""let $$aggregated :=for $$aggregaterow in $$doc
         |group by $specList
         |return element{'result'}{(${projections.mkString(",")})}""".stripMargin
    }

  /** One side of a two-collection join: the collection name and its pushed
    * per-table predicates (the reference splits WHERE per table before
    * constructing — src/preprocessing.ts:8 filterWhereStatement). */
  case class JoinSide(collection: String, filters: Seq[Filter] = Nil)

  /** Join-key access inside the ON comparison — the reference's
    * constructColumnOn (xml_extension.ts:745, gml branch): element paths
    * read `…/text()`, attribute forms `…/data()`. Routing through
    * [[columnPath]] extends the reference's simple/attribute handling to
    * `parent__child` keys (which would otherwise emit a never-matching
    * `*:parent__child` step) and REFUSES `_undef__` keys rather than
    * silently joining nothing. */
  private def onAccess(column: String): String =
    columnPath(column) + (if (column.startsWith("_attribute__")) "/data()" else "/text()")

  /** The FLWOR `where` for the ON conjunction, reference operand order —
    * the RIGHT side's column leads each comparison
    * (xml_extension.ts:770: `$<right>/<rightCol> = $<left>/<leftCol>`),
    * leaves carry a trailing space and AND composes without one
    * (:724 `${resultLeft}${translation} ${resultRight}`). */
  def joinOnClause(leftVar: String, rightVar: String,
                   on: Seq[(String, String)]): String =
    on.map { case (l, r) =>
      s"$$$rightVar/${onAccess(r)} = $$$leftVar/${onAccess(l)} "
    }.mkString("and ")

  /** The first-wins duplicate-name dedup applied to every merged record
    * (xml_extension.ts:644 getUniqueColumnOnly, verbatim — both
    * collections' children share one namespace, the first occurrence of
    * each local-name survives). */
  val UniqueColumnOnly: String =
    "return element {'result'}{for $node in distinct-values($joinedCol/*/" +
      "local-name()) return $joinedCol/*[local-name() eq $node][1]}"

  /** The null-column skeleton for outer joins (xml_extension.ts:1101
    * constructColumnNull): the unmatched side contributes its first
    * record's element NAMES with empty content, so the merged row keeps
    * the full column set. */
  private def nullColumn(collection: String, doc: String): String = {
    val v = collection
    s"""let $$nullCol$collection := for $$${v}i in $doc[1]
       |let $$element$collection:=for $$${v}j in $$${v}i/*
       |return element{$$${v}j/local-name()}{attribute{'order'}{$$${v}j/@order},attribute{'group'}{$$${v}j/@group}}
       |return $$element$collection""".stripMargin
  }

  /** Two-collection join compiled to ONE backend query — the reference
    * pushes exactly-two-collection non-FULL joins into BaseX
    * (src/getdata.ts:110 dispatch; extension/xml_extension.ts:614
    * constructJoinQuery), reduced here to the simple-record case (nested
    * `@_is_collection` branches omitted — the graft flattening carries
    * nested data in-record; projections ride the whole record, the
    * reference's `columnAs == "*"` arm).
    *
    * INNER (xml_extension.ts:712): both collections iterate in one `for`,
    * the ON conjunction compiles into the FLWOR `where`
    * ([[joinOnClause]]), and each surviving pair merges both records
    * first-wins by local-name ([[UniqueColumnOnly]]) behind the
    * any-columns-exist guard (:658 constructNoMatchedProjection).
    * LEFT (:1052): the right side iterates in a per-left subquery; an
    * unmatched left record instead merges the right collection's
    * null-column skeleton (:1101, :1180). RIGHT (:1245) swaps the roles.
    * An optional GROUP BY/aggregate tail reuses [[aggregation]], the
    * shape the reference appends as `aggregationQuery` (:697). */
  def joinQuery(db: String, left: JoinSide, right: JoinSide,
                on: Seq[(String, String)], joinType: String = "INNER",
                version: Version = BaseX97,
                recordPath: String = "//" + GmlRecordPath,
                groupBy: Seq[String] = Nil,
                aggProjections: Seq[String] = Nil): String = {
    require(on.nonEmpty, "join pushdown needs at least one ON equality")
    def preds(s: JoinSide): String = predBracket(s.filters)
    val tail =
      if (aggProjections.isEmpty) "return $doc"
      else aggregation(groupBy, aggProjections) + "\nreturn $aggregated"
    joinType match {
      case "INNER" =>
        val (lv, rv) = (left.collection + "i", right.collection + "i")
        s"""let $$doc:= for $$$lv in ${version.docFunc(db, left.collection)}$recordPath${preds(left)}, $$$rv in ${version.docFunc(db, right.collection)}$recordPath${preds(right)}
           |where ${joinOnClause(lv, rv, on)}
           |return if(exists($$$lv/*) or exists($$$rv/*)) then(
           |let $$joinedCol := element{'result'}{($$$lv/*,$$$rv/*)}
           |$UniqueColumnOnly
           |) else()
           |$tail""".stripMargin
      case "LEFT" | "RIGHT" =>
        // RIGHT swaps the iteration roles (outer loop walks the right
        // collection, the left side null-extends) but keeps the ON
        // operand order (xml_extension.ts:1245)
        val (outer, inner) = if (joinType == "LEFT") (left, right) else (right, left)
        val onClause =
          if (joinType == "LEFT") joinOnClause("left", "right", on)
          else joinOnClause("right", "left", on)
        val docOf = (s: JoinSide) =>
          s"let $$doc${s.collection} := " + selection(db, s.collection, version,
            s.filters, recordPath = recordPath, varName = s.collection + "i")
        s"""${docOf(outer)}
           |${docOf(inner)}
           |${nullColumn(inner.collection, s"$$doc${inner.collection}")}
           |let $$doc:= for $$left in $$doc${outer.collection}
           |let $$element${outer.collection} :=$$left/*
           |let $$matchedRow := for $$right in $$doc${inner.collection}
           |where $onClause
           |let $$element${inner.collection}:=$$right/*
           |let $$joinedCol :=  element{'result'}{($$left/*,$$right/*)}
           |$UniqueColumnOnly
           |return if(empty($$matchedRow)) then(
           |let $$element${inner.collection}:=$$nullCol${inner.collection}
           |let $$joinedCol :=  element{'result'}{($$left/*,$$nullCol${inner.collection})}
           |$UniqueColumnOnly
           |)else(
           |$$matchedRow
           |)
           |$tail""".stripMargin
      case other =>
        throw new IllegalArgumentException(
          s"join type '$other' not pushable (reference pushes INNER/LEFT/RIGHT " +
            "2-collection joins — src/getdata.ts:95 excludes FULL)")
    }
  }

  /** Every pushable filter (plus any pre-compiled predicate text) as ONE
    * root predicate bracket — the `[…and…]` the reference appends to its
    * collection iteration lines. Shared by the selection, the generator
    * join, and the live join so the three paths cannot diverge. */
  def predBracket(filters: Seq[Filter], extra: Seq[String] = Nil): String = {
    val ps = filters.flatMap(fromSparkFilter) ++ extra
    if (ps.isEmpty) "" else ps.mkString("[", " and ", "]")
  }

  /** A full selection over one collection, the reference's root FLWOR line:
    * `for $<col>i in <docFunc>//<path>[<where>]` + a return of the matched
    * record (xml_extension.ts:1380 buildNestedCollectionQuery root). The
    * predicates are the conjunction of every pushable filter plus any
    * spatial predicate text from the helpers above.
    *
    * The defaults reproduce the reference's GML construction verbatim
    * (spec-pinned). The live execution path ([[BaseXRest]]) overrides
    * `recordPath` for non-GML record tags, `varName` when the collection
    * name is not a valid XQuery NCName (e.g. `a.xml`), and `returnExpr`
    * to project the record server-side. */
  def selection(db: String, collection: String, version: Version,
                filters: Seq[Filter] = Nil,
                spatialPredicates: Seq[String] = Nil,
                recordPath: String = "//" + GmlRecordPath,
                varName: String = null,
                returnExpr: String = null,
                orderBy: String = null): String = {
    val v = Option(varName).getOrElse(collection + "i")
    val ret = Option(returnExpr).getOrElse(s"$$$v")
    val whereRoot = predBracket(filters, spatialPredicates)
    // an `order by` clause (a pushed TopN — BaseXRest.orderByClause)
    // slots between the iteration line and the return, the FLWOR grammar
    val ob = Option(orderBy).map(_ + "\n").getOrElse("")
    s"for $$$v in ${version.docFunc(db, collection)}$recordPath$whereRoot\n${ob}return $ret"
  }
}
