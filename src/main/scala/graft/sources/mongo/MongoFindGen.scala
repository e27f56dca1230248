package graft.sources.mongo

import org.apache.spark.sql.sources._

/** MongoDB `find` / CouchDB Mango selector generation for the pushdown
  * subset the graft document sources support — the engine-side analog of
  * the reference pushing selector JSON into live document stores
  * (reference: extension/mongodb/mongo_extension.ts:96 `col.find(
  * JSON.parse(where), {projection: …})`, :123 `constructModFunction`,
  * :129 `constructSTDistanceFunction`, :154 `constructProjectionQuery`;
  * extension/json_extension.ts:42 operator table / :312 comparison
  * shapes; extension/couchdb/couchdb_extension.ts:84 paginated
  * `db.find({selector, skip, fields})`).
  *
  * No live MongoDB/CouchDB exists in this environment; the generator
  * covers the reference's construction shapes verbatim (spec-pinned) so
  * a deployment with a real store can push the same selections
  * server-side. Deviation: the reference's IS NULL / IS NOT NULL
  * branches emit unquoted object keys, which its own
  * `JSON.parse(where)` would reject — here they are emitted as strict
  * JSON (quoted keys, same operators).
  */
object MongoFindGen {

  /** SQL operator → Mongo operator (reference: json_extension.ts:42). */
  val Operators: Map[String, String] = Map(
    "AND" -> "$and", "OR" -> "$or",
    "="  -> "$eq", "<" -> "$lt", ">" -> "$gt", "<=" -> "$lte", ">=" -> "$gte",
    "IN" -> "$in", "NOT IN" -> "$nin")

  /** JSON string escaping (quotes, backslashes, control chars) — the
    * emitted selector must survive the deployment's own
    * `JSON.parse(where)` (mongo_extension.ts:96) for ANY value. */
  private def jstr(s: String): String = graft.JsonText.str(s)

  private def jval(v: Any): String = v match {
    case s: String => jstr(s)
    case d: Double => num(d)
    case f: Float  => num(f.toDouble)
    case other     => String.valueOf(other)
  }

  /** JS number printing: integral without a fraction part, and never
    * scientific notation below 1e21 — Scala's Double.toString switches to
    * exponent form at 1e7, which would diverge from the reference's
    * template for large distance bounds. */
  private def num(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString
    else {
      val s = d.toString
      if (s.contains('E')) new java.math.BigDecimal(s).toPlainString else s
    }

  /** A `properties.`-prefixed key, escaped like every other JSON string
    * (schema-derived column names are still arbitrary text). */
  private def key(column: String): String = jstr("properties." + column)

  /** `{"properties.col": { "$op": value }}` (json_extension.ts:312). */
  def comparison(column: String, sqlOperator: String, value: Any): String =
    s"""{${key(column)}: { "${Operators(sqlOperator)}": ${jval(value)} }}"""

  /** `{ "properties.col": { "$mod": [ k, c ] } }`
    * (mongo_extension.ts:123). */
  def modFunction(column: String, k: Long, c: Long): String =
    s"""{ ${key(column)}: { "$$mod": [ $k, $c ] } }"""

  /** ST_Distance(geojsonLiteral, geometry) op degrees → `$near` with
    * min/max distance in meters (reference converts degrees at
    * 111.32 km/degree — mongo_extension.ts:129: `<=` caps, `>=` floors,
    * `=` pins both). */
  def stDistanceNear(geoJson: String, operator: String, degrees: Double): String = {
    val meters = num(degrees * 111.32 * 1000)
    val bounds = operator match {
      case "<=" => s""", "$$maxDistance": $meters"""
      case ">=" => s""", "$$minDistance": $meters"""
      case "="  => s""", "$$maxDistance": $meters, "$$minDistance": $meters"""
      case other => throw new IllegalArgumentException(
        s"ST_Distance pushdown supports <=, >=, =; got $other")
    }
    s"""{"geometry" : {"$$near": {"$$geometry": $geoJson $bounds}}}"""
  }

  /** The engine's envelope (bbox) prune as a Mango range clause over
    * GeoJSON Point coordinates — the document-store analog of the
    * `geo:intersects` constraint the XML path ships to BaseX. Mango has
    * no geo operator (the reference's `$near` is MongoDB-only,
    * mongo_extension.ts:129), but dotted paths index arrays, so a Point's
    * x/y are addressable as `geometry.coordinates.0/1` and range-compare
    * as JSON numbers.
    *
    * Soundness: a Point's envelope is the point itself, so the ranges
    * equal the local prune exactly for Points; every NON-Point geometry
    * passes via the `$ne` branch (its envelope cannot be derived by a
    * range clause), and documents without a geometry fail both branches —
    * which matches the local re-apply, whose bbox predicate drops
    * null-geometry rows too. The transferred set is therefore always a
    * superset of the local result, never a truncation. */
  def bboxClause(x0: Double, y0: Double, x1: Double, y1: Double): String =
    s"""{ "$$or" : [{"geometry.type": { "$$ne": "Point" }}, { "$$and" : [""" +
      s"""{"geometry.coordinates.0": { "$$gte": ${num(x0)} }}, """ +
      s"""{"geometry.coordinates.0": { "$$lte": ${num(x1)} }}, """ +
      s"""{"geometry.coordinates.1": { "$$gte": ${num(y0)} }}, """ +
      s"""{"geometry.coordinates.1": { "$$lte": ${num(y1)} }}]}]}"""

  /** The pushdown subset the graft sources accept, as a Mongo selector.
    * None for filters the source would not push either. */
  def fromSparkFilter(f: Filter): Option[String] = f match {
    case EqualTo(c, v)            => Some(comparison(c, "=", v))
    case LessThan(c, v)           => Some(comparison(c, "<", v))
    case GreaterThan(c, v)        => Some(comparison(c, ">", v))
    case LessThanOrEqual(c, v)    => Some(comparison(c, "<=", v))
    case GreaterThanOrEqual(c, v) => Some(comparison(c, ">=", v))
    case In(c, vs) =>
      Some(s"""{${key(c)}: {"$$in": [${vs.map(jval).mkString(", ")}]}}""")
    case Not(In(c, vs)) =>
      Some(s"""{${key(c)}: {"$$nin": [${vs.map(jval).mkString(", ")}]}}""")
    case Not(EqualTo(c, v)) =>
      Some(s"""{${key(c)}: { "$$ne": ${jval(v)} }}""")
    case IsNull(c) => Some(
      s"""{"$$or" : [{ ${key(c)} : { "$$exists": false } }, { ${key(c)} : null }] }""")
    case IsNotNull(c) => Some(
      s"""{"$$and" : [{ ${key(c)} : { "$$exists": true } }, { ${key(c)} :  { "$$ne": null } }] }""")
    case And(l, r) =>
      for (a <- fromSparkFilter(l); b <- fromSparkFilter(r))
        yield s"""{ "$$and" : [$a, $b]}"""
    case Or(l, r) =>
      for (a <- fromSparkFilter(l); b <- fromSparkFilter(r))
        yield s"""{ "$$or" : [$a, $b]}"""
    case _ => None
  }

  /** `{"_id": 0, geometry verbatim, properties.* behind $ifNull}` —
    * the reference's projection (mongo_extension.ts:154). */
  def projection(columns: Seq[String],
                 featuresPassthrough: Boolean = false): String =
    if (columns.isEmpty) "{}"
    else (columns.map {
      case "geometry" => ""","geometry": 1"""
      // a PROPERTY named "features" is an ordinary property — the
      // collection passthrough below is a separate top-level path
      case c => s""",${key(c)}: { "$$ifNull": [ ${jstr("$properties." + c)}, null ] }"""
    } ++ (if (featuresPassthrough) Seq(""","features": 1""") else Nil))
      .mkString("""{"_id": 0""", "", "}")

  /** One conjunction selector from every pushable filter plus literal
    * selector fragments (mod / $near) — the `where` argument of
    * `col.find(where, {projection})`. */
  def selector(filters: Seq[Filter], extra: Seq[String] = Nil): String = {
    val parts = filters.flatMap(fromSparkFilter) ++ extra
    parts match {
      case Seq()    => "{}"
      case Seq(one) => one
      case many     => many.mkString("""{ "$and" : [""", ", ", "]}")
    }
  }

  /** CouchDB Mango request body: the SAME selector, paginated like the
    * reference's recursive fetch
    * (couchdb_extension.ts:84 `{selector, skip, fields}`). The reference
    * relies on CouchDB's default `_find` limit being 25 and strides by
    * batch*25; here `skip` is the ABSOLUTE document offset (the count of
    * documents the cursor has already served) so a page whose `limit`
    * shrank — the capped cursor's remainder page — still resumes exactly
    * where the previous one ended instead of re-deriving the offset from
    * the shrunk limit (which would re-read early rows and drop the
    * tail). */
  def couchQuery(selectorJson: String, fields: Seq[String], skip: Int,
                 limit: Option[Int] = None,
                 bookmark: Option[String] = None): String = {
    val f = if (fields.isEmpty) ""
            else s""", "fields": [${fields.map(jstr).mkString(", ")}]"""
    val l = limit.map(n => s""", "limit": $n""").getOrElse("")
    // A bookmark REPLACES the skip: CouchDB resumes the cursor at the
    // bookmark's position, so a skip on top would drop rows relative to
    // it. Bookmark pagination is O(page) server work where skip-stride is
    // O(offset) — the cursor prefers it whenever the server offers one
    // (CouchFind.docs); skip-stride stays the fallback for servers that
    // omit bookmarks (the reference's protocol, couchdb_extension.ts:84).
    bookmark match {
      case Some(b) => s"""{"selector": $selectorJson, "bookmark": ${jstr(b)}$f$l}"""
      case None    => s"""{"selector": $selectorJson, "skip": $skip$f$l}"""
    }
  }

  /** Aggregation pipeline for the server-side COUNT(+GROUP BY) pushdown —
    * the Mongo analog of the XQuery aggregation FLWOR (the reference
    * pushes COUNT+GROUP BY into BaseX, getdata.ts:71-156; its Mongo
    * driver stops at find, so this closes the same local/live asymmetry
    * r8 closed for BaseX). Counts evaluate INSIDE the database; only one
    * partial document per group crosses the wire.
    *
    * Row-identity contract with the local flattening
    * (`GeoJsonSource.flattenFeature`: every non-collection document is
    * ONE row — whatever its `type` — and a FeatureCollection is one row
    * per element): the `$project`+`$unwind` prefix normalizes each stored
    * document to its feature rows (`f` = the `features` array when
    * present, else `[$$ROOT]`) before grouping, so server counts equal
    * local row counts. Group keys pass through `$toString` after an
    * `$ifNull`, so missing and explicit-null keys both group under null
    * and typed keys collapse to their string rendering the way the local
    * string map does (caveat mirroring the BaseX min/max forcing: Mongo
    * renders whole doubles without the trailing `.0`, so a DOUBLE-typed
    * group key can label its group differently than the local path —
    * integer and string keys agree exactly). COUNT(col) counts rows
    * whose property is present and non-null, like the local map.
    * Not faithful for a FeatureCollection NESTED inside another
    * collection's `features` (the local parse recurses; `$unwind` counts
    * it once) — GeoJSON does not nest collections. Output docs:
    * `{_id: {g0: …}, a0: n, a1: n}`. */
  def aggregationPipeline(groups: Seq[String], countCols: Seq[Option[String]],
                          matchExpr: Option[String] = None): String = {
    def prop(c: String) = jstr("$f.properties." + c)
    val id =
      if (groups.isEmpty) "null"
      else groups.zipWithIndex.map { case (g, i) =>
        s""""g$i": {"$$toString": {"$$ifNull": [${prop(g)}, null]}}"""
      }.mkString("{", ", ", "}")
    val accs = countCols.zipWithIndex.map {
      case (None, i) => s""""a$i": {"$$sum": 1}"""
      case (Some(c), i) =>
        s""""a$i": {"$$sum": {"$$cond": [{"$$eq": [{"$$ifNull": [${prop(c)}, null]}, null]}, 0, 1]}}"""
    }
    val matchStage = matchExpr.map(e => s""" {"$$match": {"$$expr": $e}},""").getOrElse("")
    s"""[{"$$project": {"f": {"$$cond": [{"$$isArray": ["$$features"]}, "$$features", ["$$$$ROOT"]]}}},""" +
      s""" {"$$unwind": "$$f"},""" +
      matchStage +
      s""" {"$$group": {"_id": $id, ${accs.mkString(", ")}}}]"""
  }

  /** EXACT typed `$match` expression for the aggregation pushdown —
    * or None when the filters leave the provably-exact subset.
    *
    * Unlike the find path's WIDENED selector (a superset the reader
    * re-applies locally), nothing re-applies after a server-side
    * `$group`: the `$match` must accept EXACTLY the feature rows
    * [[graft.sources.StringFilterEval.passes]] would keep on the
    * transferred documents. The local contract compares the flattened
    * STRING RENDERING of each property (the JSON text this engine's own
    * BSON decoder emits), so each string literal inverse-maps to the
    * BSON values that render to it, as an `$or` of TYPE-GUARDED
    * branches (a bare `$eq` would let int 1 match "1.0" through Mongo's
    * cross-numeric equality):
    *
    *   - string: direct equality;
    *   - int32/int64: canonical-decimal literals, compared numerically
    *     (type-faithful on the wire: Bson.fromJson encodes integral
    *     pipeline numbers as int32/int64, so the comparison is exact at
    *     any magnitude);
    *   - double: literals that survive `Double.toString` round-trip
    *     (the decoder's rendering — "1.0" matches double 1.0, never
    *     int 1, and "1" never matches double 1.0);
    *   - date: rendered as epoch millis by the decoder → `$toLong`
    *     comparison under the int64 conditions;
    *   - bool / objectId: "true"/"false" / 24-hex via `$toString`.
    *
    * Missing, null, and object/array-valued properties are all SQL NULL
    * locally (the flattener skips non-scalars), mirrored by the
    * `$type ∈ [missing, null, object, array]` guard. Supported filter
    * shapes: AND-composed EqualTo / EqualNullSafe / In / IsNull /
    * IsNotNull — the equality family, where TRUE never depends on
    * three-valued logic.
    *
    * DOCUMENTED CUTS — binData and decimal128 property values: a
    * binData's base64 rendering has no aggregation-expression
    * equivalent, and decimal128 has no local rendering contract AT ALL
    * (the BSON decoder rejects type 0x13, so the record-transfer path
    * fails loudly on such collections). Filters here treat both as
    * never-equal to any literal: on a third-party collection storing
    * e.g. decimal128 1.5, a filtered aggregation SILENTLY omits those
    * rows where the equivalent transferred scan would error — the one
    * place the two paths' failure modes differ. GeoJSON properties are
    * JSON scalars, which this engine's own writer stores without either
    * type, so the cut is reachable only through collections written by
    * other tools; route those through the transfer path (or add a
    * decimal `$toString` branch once the decoder learns 0x13). */
  def aggMatchExpr(filters: Seq[Filter]): Option[String] = {
    def path(c: String): Option[String] =
      // dots/dollars would change the field-path meaning server-side
      if (c.isEmpty || c.contains('.') || c.contains('$') || c.contains('\u0000')) None
      else Some("$f.properties." + c)
    def typeOf(p: String) = s"""{"$$type": ${jstr(p)}}"""
    def nullish(p: String) =
      s"""{"$$in": [${typeOf(p)}, ["missing", "null", "object", "array"]]}"""
    // all BSON values whose flattened rendering equals the literal `v`
    def valueBranches(p: String, v: String): Option[String] = {
      val ref = jstr(p)
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      b += s"""{"$$and": [{"$$eq": [${typeOf(p)}, "string"]}, {"$$eq": [$ref, ${jstr(v)}]}]}"""
      if (v.matches("-?(0|[1-9][0-9]*)") && v.toLongOption.isDefined) {
        // canonical decimal inside int64 range: int/long/date renderings.
        // The literal travels type-faithfully (Bson.fromJson encodes
        // integral JSON numbers as int32/int64, never doubles), so the
        // comparison is exact at any magnitude; beyond int64 no stored
        // integer can render the literal and no branch is needed.
        b += s"""{"$$and": [{"$$in": [${typeOf(p)}, ["int", "long"]]}, {"$$eq": [$ref, $v]}]}"""
        b += s"""{"$$and": [{"$$eq": [${typeOf(p)}, "date"]}, {"$$eq": [{"$$toLong": $ref}, $v]}]}"""
      }
      val d = v.toDoubleOption
      if (d.exists(x => !x.isNaN && !x.isInfinite && java.lang.Double.toString(x) == v)) {
        // signed zero: Mongo's numeric $eq cannot separate 0.0 from -0.0,
        // but the local rendering contract distinguishes "0.0"/"-0.0" —
        // no exact branch exists, so the whole filter falls back
        if (d.contains(0.0)) return None
        b += s"""{"$$and": [{"$$eq": [${typeOf(p)}, "double"]}, {"$$eq": [$ref, $v]}]}"""
      }
      if (v == "true" || v == "false")
        b += s"""{"$$and": [{"$$eq": [${typeOf(p)}, "bool"]}, {"$$eq": [$ref, $v]}]}"""
      if (v.matches("[0-9a-f]{24}"))
        b += s"""{"$$and": [{"$$eq": [${typeOf(p)}, "objectId"]}, {"$$eq": [{"$$toString": $ref}, ${jstr(v)}]}]}"""
      Some(if (b.size == 1) b.head else s"""{"$$or": [${b.mkString(", ")}]}""")
    }
    def conv(f: Filter): Option[String] = f match {
      case EqualTo(a, v: String)       => path(a).flatMap(valueBranches(_, v))
      case EqualNullSafe(a, null)      => path(a).map(nullish)
      case EqualNullSafe(a, v: String) => path(a).flatMap(valueBranches(_, v))
      case In(a, vs) if vs.forall(x => x == null || x.isInstanceOf[String]) =>
        // null elements only turn FALSE into UNKNOWN locally — both drop
        val nonNull = vs.toIndexedSeq.collect { case s: String => s }
        if (nonNull.isEmpty) Some("false")
        else path(a).flatMap { p =>
          val parts = nonNull.map(valueBranches(p, _))
          if (parts.exists(_.isEmpty)) None
          else Some(if (parts.size == 1) parts.head.get
                    else s"""{"$$or": [${parts.map(_.get).mkString(", ")}]}""")
        }
      case IsNull(a)    => path(a).map(nullish)
      case IsNotNull(a) => path(a).map(p => s"""{"$$not": [${nullish(p)}]}""")
      case And(l, r) =>
        for (le <- conv(l); re <- conv(r))
          yield s"""{"$$and": [$le, $re]}"""
      // Kleene-sound compositions of the is-TRUE encodings: every leaf
      // above computes exactly "eval = TRUE" (never unknown), and
      // OR is TRUE iff either side is TRUE (T∨U = T, U∨F = U ≠ T),
      // so is-TRUE(Or) = is-TRUE(l) ∨ is-TRUE(r) holds exactly
      case Or(l, r) =>
        for (le <- conv(l); re <- conv(r))
          yield s"""{"$$or": [$le, $re]}"""
      // NOT(x) is TRUE iff x is FALSE — not "not TRUE" (unknown negates
      // to unknown, which still drops the row) — so each negation needs
      // the value to be PRESENT as well as non-matching
      case Not(EqualTo(a, v: String)) =>
        for (p <- path(a); b <- valueBranches(p, v))
          yield s"""{"$$and": [{"$$not": [${nullish(p)}]}, {"$$not": [$b]}]}"""
      case Not(EqualNullSafe(a, null)) => conv(IsNotNull(a))
      case Not(EqualNullSafe(a, v: String)) =>
        // <=> never answers unknown: NOT(<=>) is TRUE when the value is
        // NULL too, so no presence guard here
        for (p <- path(a); b <- valueBranches(p, v))
          yield s"""{"$$or": [${nullish(p)}, {"$$not": [$b]}]}"""
      case Not(In(a, vs)) if vs.forall(x => x == null || x.isInstanceOf[String]) =>
        // a null element makes every unmatched row UNKNOWN (x <> NULL),
        // and NOT(unknown) stays unknown: nothing can ever pass
        if (vs.contains(null)) Some("false")
        else {
          val parts = path(a).map(p =>
            vs.toIndexedSeq.collect { case s: String => s }.map(valueBranches(p, _)))
          for {
            p <- path(a)
            bs <- parts if bs.forall(_.isDefined)
          } yield {
            val eqAny =
              if (bs.isEmpty) "false"
              else if (bs.size == 1) bs.head.get
              else s"""{"$$or": [${bs.map(_.get).mkString(", ")}]}"""
            s"""{"$$and": [{"$$not": [${nullish(p)}]}, {"$$not": [$eqAny]}]}"""
          }
        }
      case Not(IsNull(a))    => conv(IsNotNull(a))
      case Not(IsNotNull(a)) => conv(IsNull(a))
      case Not(And(l, r))    => conv(Or(Not(l), Not(r)))  // De Morgan, Kleene-valid
      case Not(Or(l, r))     => conv(And(Not(l), Not(r)))
      case Not(Not(x))       => conv(x)
      case _ => None // order/substring predicates: rendering-bound (see scaladoc)
    }
    if (filters.isEmpty) Some("true")
    else {
      val parts = filters.map(conv)
      if (parts.exists(_.isEmpty)) None
      else Some(if (parts.size == 1) parts.head.get
                else s"""{"$$and": [${parts.map(_.get).mkString(", ")}]}""")
    }
  }
}
