package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal / ordered-join operators Spark's built-in join surface lacks:
  * the as-of join (attach the most recent prior — or next upcoming —
  * right-side row to each left row) and the binned range join (point ∈
  * [lo, hi] interval joins as an equi-join instead of a nested-loop).
  *
  * Both are built for the 100 TB case:
  *   - the as-of join is the secondary-sort pattern ([[Corpus.packSequences]]
  *     precedent): one hash exchange on the key columns, a sort within
  *     partitions, then a single sequential pass with O(1) carried state —
  *     no window function (a `last_value OVER (PARTITION BY key)` buffers
  *     each key's partition whole; a hot key would land in one task), no
  *     driver state, and row BODIES shuffle exactly once;
  *   - the range join turns Spark's only native plan for
  *     `point BETWEEN lo AND hi` (BroadcastNestedLoopJoin — quadratic) into
  *     a bucketed equi-join: intervals explode to the fixed-width buckets
  *     they cover, points map to exactly one bucket, and the shuffle joins
  *     on bucket id. Each matching pair meets in exactly ONE bucket (the
  *     point's), so no post-join dedup is needed.
  */
object Temporal {

  /** As-of join: for each `left` row attach the payload of the `right` row
    * with the greatest right time ≤ the left row's time (direction
    * `"backward"`, the default), the smallest right time ≥ it
    * (`"forward"`), or whichever of the two is CLOSER (`"nearest"`,
    * the pandas merge_asof third direction; an exact-distance tie takes
    * the backward row — deterministic, documented), matching on equal
    * key columns.
    *
    * This is the standard event-enrichment / slowly-changing-dimension
    * lookup (each trade gets the latest quote at or before it; each
    * purchase gets the most recent prior click). Semantics follow the
    * common dataframe-library contract: exact time matches are included,
    * and `tolerance` (in units of the derived time key — microseconds for
    * timestamp columns, the column's own units for integral columns)
    * drops matches farther away than the bound.
    *
    * Determinism among equal right times is pinned by `tieCols` (right-side
    * columns): backward carries the LARGEST `(time, ties)` right row,
    * forward the SMALLEST — so reruns and repartitions produce identical
    * output, which is what lets a DuckDB oracle hash-match this operator.
    *
    * Mechanics: both sides project to `(keys, time, tag, ties, payload)`,
    * union, hash-partition by key, sort within partitions by
    * `(keys, time, tag, ties)` (right rows sort before left rows at equal
    * time, so exact matches are visible when the left row streams past),
    * then one `mapPartitions` pass carries the last-seen right payload per
    * key — O(1) state, no window buffering, one shuffle of the unioned
    * rows. `"nearest"` needs one look AHEAD as well, so its pass buffers
    * the left rows between two consecutive right rows (resolved the
    * moment the next right arrives, flushed backward-only at key end):
    * state is O(left rows between adjacent right rows of one key) — the
    * gap density of real enrichment data (quotes denser than trades),
    * never the partition, and still no window. A finite tolerance
    * additionally drains the buffer as soon as a left row's forward
    * window closes, bounding state by the tolerance span even on keys
    * with sparse or absent rights (without a tolerance, a rights-free
    * key semantically requires its left side buffered — every answer
    * can depend on a right at the key's very end). Left rows with a null time and keys with no eligible right row
    * emit null payload columns (left-outer semantics). Right rows with a
    * null time are dropped (they cannot be ordered). A null KEY is a group
    * of its own (the [[Corpus.packSequences]] convention). Key columns
    * must be atomic (their values are compared with `Objects.equals` in
    * the sequential pass).
    *
    * @param payloadCols right-side columns to attach (names must not
    *                    collide with left's); other right columns are
    *                    dropped
    */
  def asofJoin(left: DataFrame, right: DataFrame, leftKeys: Seq[String],
               rightKeys: Seq[String], leftTime: String, rightTime: String,
               payloadCols: Seq[String], direction: String = "backward",
               tolerance: Option[Long] = None,
               tieCols: Seq[String] = Nil): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      "leftKeys and rightKeys must be non-empty and the same length")
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be 'backward', 'forward', or 'nearest', got '$direction'")
    require(tolerance.forall(_ >= 0), "tolerance must be non-negative")
    val collisions = payloadCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"payload columns collide with left columns: ${collisions.mkString(", ")}")

    // normalize the time column to a totally-ordered long: µs for
    // timestamps/dates, the column's own value for integral types.
    // Doubles/decimals are rejected (a lossy cast would silently change
    // which row is "most recent").
    def timeKey(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case _: TimestampNTZType => unix_micros(col(c).cast(TimestampType))
      case DateType => unix_micros(col(c).cast(TimestampType))
      case ByteType | ShortType | IntegerType | LongType => col(c).cast(LongType)
      case other => throw new IllegalArgumentException(
        s"as-of time column '$c' must be a timestamp, date, or integral type, got $other")
    }

    val payloadFields = payloadCols.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true))
    val payloadType = StructType(payloadFields)
    val tieTypes = tieCols.map(c => right.schema(c).dataType)
    val nKeys = leftKeys.size

    val leftPrep = left.select(
      leftKeys.map(col) ++
        Seq(timeKey(left, leftTime).as("__t"), lit(1).as("__tag")) ++
        tieTypes.zipWithIndex.map { case (t, i) => lit(null).cast(t).as(s"__tie$i") } ++
        Seq(struct(left.columns.toSeq.map(col): _*).as("__l"),
          lit(null).cast(payloadType).as("__r")): _*)
    val rightPrep = right
      .where(col(rightTime).isNotNull)
      .select(
        rightKeys.map(col) ++
          Seq(timeKey(right, rightTime).as("__t"), lit(0).as("__tag")) ++
          tieCols.zipWithIndex.map { case (c, i) => col(c).as(s"__tie$i") } ++
          Seq(lit(null).cast(left.schema).as("__l"),
            struct(payloadCols.map(col): _*).as("__r")): _*)
    // positional union: the two selects above have identical shapes but
    // different key column names (left's names win)
    val unioned = leftPrep.union(rightPrep)

    val keyExprs = leftKeys.map(col)
    // nearest shares backward's sort layout (time asc, rights first at
    // equal time — a zero-distance match is unbeatable either way, and
    // the FIRST right of a time group carries forward's smallest-tie
    // pick while the LAST carries backward's largest-tie pick)
    val backward = direction != "forward"
    // nulls FIRST in both directions: a null-time left row must sort
    // before every right row so it streams past with nothing carried
    // (desc's default nulls-last would hand it the final right payload)
    val timeOrd = if (backward) col("__t").asc_nulls_first else col("__t").desc_nulls_first
    val tieOrds = tieCols.indices.map(i =>
      if (backward) col(s"__tie$i").asc_nulls_first else col(s"__tie$i").desc_nulls_first)
    val sorted = unioned
      .repartition(keyExprs: _*)
      .sortWithinPartitions(
        keyExprs.map(_.asc_nulls_first) ++ Seq(timeOrd, col("__tag").asc) ++ tieOrds: _*)

    val tIdx = nKeys
    val tagIdx = nKeys + 1
    val lIdx = nKeys + 2 + tieCols.size
    val rIdx = lIdx + 1
    val nPayload = payloadFields.size
    val tol = tolerance.getOrElse(Long.MaxValue)
    val outSchema = StructType(left.schema.fields ++ payloadFields)

    val outRdd = if (direction == "nearest")
      nearestPass(sorted, nKeys, tIdx, tagIdx, lIdx, rIdx, nPayload, tol)
    else sorted.rdd.mapPartitions { it =>
      // keys are clustered by the sort; carried state resets on key change.
      // `started` is the no-previous-key sentinel — a null key is a valid
      // group and must not re-trigger the reset on every row
      var started = false
      var curKey: Array[Any] = null
      var carried: Row = null
      var carriedT = 0L
      def sameKey(k: Array[Any]): Boolean = keysEqual(curKey, k)
      it.flatMap { row =>
        val key = Array.tabulate[Any](nKeys)(row.get)
        if (!started || !sameKey(key)) {
          started = true; curKey = key; carried = null
        }
        if (row.getInt(tagIdx) == 0) { // right row: becomes the carried state
          carried = row.getStruct(rIdx)
          carriedT = row.getLong(tIdx)
          Iterator.empty
        } else { // left row: emit with the carried payload if eligible
          val lRow = row.getStruct(lIdx)
          val matched = carried != null && !row.isNullAt(tIdx) && {
            val lt = row.getLong(tIdx)
            val delta = if (backward) lt - carriedT else carriedT - lt
            delta <= tol
          }
          val rVals =
            if (matched) carried.toSeq
            else Seq.fill[Any](nPayload)(null)
          Iterator(Row.fromSeq(lRow.toSeq ++ rVals))
        }
      }
    }
    left.sparkSession.createDataFrame(outRdd, outSchema)
  }

  /** Key-tuple equality for the sequential passes. Binary keys surface
    * as Array[Byte], where Objects.equals is reference identity —
    * compare content like the shuffle did. */
  private def keysEqual(cur: Array[Any], k: Array[Any]): Boolean = {
    var i = 0
    while (i < k.length) {
      val ok = (cur(i), k(i)) match {
        case (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.equals(a, b)
        case (a, b) => java.util.Objects.equals(a, b)
      }
      if (!ok) return false
      i += 1
    }
    true
  }

  /** The `"nearest"` sequential pass: carries the previous right payload
    * AND buffers pending left rows until the next right row resolves
    * them (closer side wins, exact tie → backward); key end flushes the
    * buffer backward-only. Zero-distance lefts resolve immediately —
    * nothing can beat them. */
  private def nearestPass(sorted: DataFrame, nKeys: Int, tIdx: Int, tagIdx: Int,
                          lIdx: Int, rIdx: Int, nPayload: Int,
                          tol: Long): org.apache.spark.rdd.RDD[Row] =
    sorted.rdd.mapPartitions { it =>
      var started = false
      var curKey: Array[Any] = null
      var prev: Row = null
      var prevT = 0L
      // (left struct, left time, prev payload at push, prev time at push)
      val pending = scala.collection.mutable.ArrayBuffer.empty[(Row, Long, Row, Long)]
      def sameKey(k: Array[Any]): Boolean = keysEqual(curKey, k)
      // resolve (backward-only) the buffer PREFIX whose forward window
      // closed before tNow: entries are in lt-ascending push order
      def drainPast(tNow: Long): Seq[Row] =
        if (tol == Long.MaxValue || pending.isEmpty ||
            tNow - pending.head._2 <= tol) Seq.empty
        else {
          val (expired, live) = pending.partition(e => tNow - e._2 > tol)
          pending.clear(); pending ++= live
          expired.map { case (lRow, lt, p, pT) =>
            val pick = if (p != null && lt - pT <= tol) p else null
            Row.fromSeq(lRow.toSeq ++
              (if (pick == null) Seq.fill[Any](nPayload)(null) else pick.toSeq))
          }.toSeq
        }
      def resolveWith(nextPayload: Row, nextT: Long): Seq[Row] = {
        val out = pending.map { case (lRow, lt, p, pT) =>
          val bd = if (p != null) lt - pT else Long.MaxValue
          val fd = if (nextPayload != null) nextT - lt else Long.MaxValue
          val backOk = p != null && bd <= tol
          val fwdOk = nextPayload != null && fd <= tol
          val pick =
            if (backOk && (!fwdOk || bd <= fd)) p
            else if (fwdOk) nextPayload
            else null
          Row.fromSeq(lRow.toSeq ++
            (if (pick == null) Seq.fill[Any](nPayload)(null) else pick.toSeq))
        }.toSeq
        pending.clear()
        out
      }
      val main = it.flatMap { row =>
        val key = Array.tabulate[Any](nKeys)(row.get)
        val keyFlush: Seq[Row] =
          if (!started || !sameKey(key)) {
            val f = resolveWith(null, 0L) // key end: backward-only
            started = true; curKey = key; prev = null
            f
          } else Seq.empty
        val emitted: Seq[Row] =
          if (row.getInt(tagIdx) == 0) { // right row
            val payload = row.getStruct(rIdx)
            val t = row.getLong(tIdx)
            // the FIRST right of this time group resolves the buffer
            // (forward = smallest ties); later equal-time rights only
            // update the carried prev (backward = largest ties)
            val f = resolveWith(payload, t)
            prev = payload; prevT = t
            f
          } else { // left row
            val lRow = row.getStruct(lIdx)
            if (row.isNullAt(tIdx))
              Seq(Row.fromSeq(lRow.toSeq ++ Seq.fill[Any](nPayload)(null)))
            else {
              val lt = row.getLong(tIdx)
              // tolerance drain: pending lefts whose forward window has
              // closed (any later right is > tol away) resolve backward-
              // only NOW — this keeps the buffer bounded by the tolerance
              // window on a key with sparse rights
              val drained = drainPast(lt)
              val own: Seq[Row] =
                if (prev != null && lt == prevT) // distance 0: unbeatable
                  Seq(Row.fromSeq(lRow.toSeq ++ prev.toSeq))
                else { pending += ((lRow, lt, prev, prevT)); Seq.empty }
              drained ++ own
            }
          }
        keyFlush.iterator ++ emitted.iterator
      }
      main ++ resolveWith(null, 0L).iterator // partition end: backward-only
    }

  /** Binned range join: rows of `left` joined to rows of `right` where
    * `left(pointCol)` ∈ `[right(loCol), right(hiCol)]` (inclusive both
    * ends), optionally under additional equi-conditions `extraKeys`
    * (left-name → right-name).
    *
    * Spark's native plan for an interval predicate with no equality is
    * BroadcastNestedLoopJoin — every (left, right) pair is tested, which
    * is quadratic and caps the right side at broadcast size. Here each
    * interval explodes map-side to the fixed-width buckets it covers,
    * each point maps to exactly one bucket, and the join is a plain
    * equi-join on `(bucket, extraKeys)` with the interval predicate
    * re-applied — hash-partitioned, AQE-skew-splittable, no size cap on
    * either side. A matching pair meets in exactly one bucket, so the
    * output needs no dedup.
    *
    * `binWidth` trades replication for selectivity: an interval produces
    * `len/binWidth + 1` bucket rows, a bucket collects every interval
    * overlapping it. Pass 0 (the default) to auto-size from one tiny
    * aggregate over the interval lengths (`max(avg, maxLen/1024)`, so no
    * single interval explodes into more than ~1k buckets and the average
    * interval covers ~2). Intervals with `lo > hi` and rows with a null
    * point / bound are dropped (they can match nothing).
    *
    * Column names of `left` and `right` must be disjoint (standard join
    * hygiene — rename upfront).
    */
  def rangeJoin(left: DataFrame, pointCol: String, right: DataFrame,
                loCol: String, hiCol: String, binWidth: Double = 0.0,
                extraKeys: Seq[(String, String)] = Nil): DataFrame = {
    require(binWidth >= 0.0, s"binWidth must be non-negative, got $binWidth")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left and right column names must be disjoint, overlapping: ${overlap.mkString(", ")}")

    val valid = right.where(col(loCol).isNotNull && col(hiCol).isNotNull &&
      col(loCol) <= col(hiCol))
    val w: Double =
      if (binWidth > 0.0) binWidth
      else {
        // ONE tiny aggregate (a single driver row — bounded by
        // construction): average and max interval length
        val row = valid.agg(
          avg(col(hiCol) - col(loCol)).cast(DoubleType),
          max(col(hiCol) - col(loCol)).cast(DoubleType)).head()
        if (row.isNullAt(0)) 1.0 // empty right side: any width joins nothing
        // all-zero-length intervals (point lookups): every interval covers
        // exactly one bucket under ANY width, so use 1.0 — a denormal width
        // would saturate the bucket cast and collapse the join to one task
        else if (row.getDouble(1) == 0.0) 1.0
        else math.max(row.getDouble(0), row.getDouble(1) / 1024.0)
      }

    val bin = "__graft_bin"
    val leftB = left
      .where(col(pointCol).isNotNull)
      .withColumn(bin, floor(col(pointCol).cast(DoubleType) / w).cast(LongType))
    val rightB = valid.withColumn(bin,
      explode(sequence(floor(col(loCol).cast(DoubleType) / w).cast(LongType),
        floor(col(hiCol).cast(DoubleType) / w).cast(LongType))))
    val cond = extraKeys.foldLeft(
      leftB(bin) === rightB(bin) &&
        col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol)) {
      case (acc, (lc, rc)) => acc && col(lc) === col(rc)
    }
    leftB.join(rightB, cond).drop(leftB(bin)).drop(rightB(bin))
  }

  /** Gap-fill (time-series resample): given one observation row per
    * `(keyCols, timeCol)` bin — `timeCol` integral, bins `step` apart —
    * emit EVERY bin between each key's first and last observation,
    * carrying the most recent observed `valueCols` forward into the
    * missing bins (the standard gauge/metric densify before joins or
    * window math over a regular grid).
    *
    * Mechanics: one bounded aggregate derives each key's `[min, max]`
    * span; `sequence` + `explode` lays down the grid (per-key grid size
    * = span/step — rows are generated in the scan task, never collected);
    * the fill is [[asofJoin]] `backward` with the grid as the left side,
    * so it inherits the secondary-sort shape — ONE hash exchange on the
    * keys, O(1) carried state, no window buffering. An exact-bin
    * observation is its own "most recent ≤" match, so observed bins pass
    * through unchanged. The output adds `srcTimeCol`: the time bin the
    * values were carried FROM (equal to the bin itself on observed rows
    * — `col(srcTimeCol) === col(timeCol)` is the "observed" flag; fill
    * staleness is their difference).
    *
    * Like any per-entity series operator, one key's timeline streams
    * through one task — choose the key granularity so a single series
    * is task-sized (entity/metric ids, not a global key). Callers with
    * several rows per bin aggregate first; with equal-bin duplicates the
    * largest `(valueCols…)` tuple wins (the payloads ride as [[asofJoin]]
    * backward tie columns, so the rule is enforced, not just assumed),
    * which keeps reruns deterministic but usually isn't the aggregation
    * you meant. Non-orderable payload types (e.g. `MapType`) can't join
    * the tie-break and keep the older arbitrary-winner behavior; the
    * orderable columns still tie-break deterministically around them.
    *
    * @param step grid pitch in the units of `timeCol` (must divide the
    *             observation bins' spacing for observed bins to align)
    */
  def gapFill(df: DataFrame, keyCols: Seq[String], timeCol: String, step: Long,
              valueCols: Seq[String], srcTimeCol: String = "src_t"): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(step > 0, s"step must be positive, got $step")
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    require(!df.columns.contains(srcTimeCol),
      s"srcTimeCol '$srcTimeCol' collides with an input column")
    df.schema(timeCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"gapFill time column '$timeCol' must be integral (pre-binned), got $other")
    }

    val keyed = df.select(
      (keyCols.map(col) :+ col(timeCol).cast(LongType).as(timeCol)) ++
        valueCols.map(col): _*)
    // one key-partial aggregate: |keys| rows, never the grid
    val bounds = keyed.groupBy(keyCols.map(col): _*)
      .agg(min(col(timeCol)).as("__lo"), max(col(timeCol)).as("__hi"))
    val grid = bounds.select(
      keyCols.map(col) :+
        explode(sequence(col("__lo"), col("__hi"), lit(step))).as(timeCol): _*)

    // rename the right side so nothing collides with the grid's columns
    val obs = keyed.select(
      keyCols.map(c => col(c).as(s"__k_$c")) ++
        Seq(col(timeCol).as("__ot"), col(timeCol).as(srcTimeCol)) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    // equal-bin duplicate observations: the payload columns ride as
    // as-of TIE columns, so backward mode carries the largest
    // (valueCols…) tuple — the documented "largest payload struct wins"
    // rule, made real. Ties only extend the within-partition sort: no
    // extra exchange, and reruns/repartitions stay bit-identical.
    // Non-orderable payload types (MapType, …) cannot sort and are left
    // out of the tie-break rather than failing analysis — among those
    // columns an equal-bin winner is arbitrary (the pre-tie behavior);
    // among orderable ones the rule still holds.
    val orderableVals = valueCols.filter(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        keyed.schema(c).dataType))
    asofJoin(grid, obs, keyCols, keyCols.map(c => s"__k_$c"), timeCol, "__ot",
        payloadCols = srcTimeCol +: valueCols.map(c => s"__v_$c"),
        tieCols = orderableVals.map(c => s"__v_$c"))
      .select(
        (keyCols.map(col) :+ col(timeCol) :+ col(srcTimeCol)) ++
          valueCols.map(c => col(s"__v_$c").as(c)): _*)
  }

  /** Build a type-2 slowly-changing dimension from a change log: one
    * validity interval per distinct consecutive `attrCols` state of each
    * key, ordered by `(timeCol, tieCols)`. No-op changes (a row whose
    * attributes equal the key's previous state) collapse into the open
    * interval. Output = keys ++ attrs ++ `valid_from` / `valid_to` /
    * `is_current`, with `valid_to` the NEXT version's `valid_from`
    * (half-open intervals, the warehouse convention) and null on the
    * current version.
    *
    * Shape: two ranked windows over the same `(keys × (time, ties))`
    * ordering — one Exchange, one sort, both window passes stream over
    * it. Per-key window state is the key's CHANGE COUNT (versions per
    * entity — tens, not the event scale that rules windows out for
    * [[asofJoin]]), so buffering a key's partition is bounded by
    * construction. Ties must be pinned by `tieCols` for determinism;
    * equal-`(time, ties)` duplicates are a caller bug (order undefined).
    * Null times are dropped (they cannot be ordered into a timeline).
    */
  def scd2(df: DataFrame, keyCols: Seq[String], timeCol: String,
           attrCols: Seq[String], tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    val reserved = Seq("valid_from", "valid_to", "is_current")
    val clash = (keyCols ++ attrCols).toSet.intersect(reserved.toSet)
    require(clash.isEmpty, s"key/attr columns collide with output columns: ${clash.mkString(", ")}")

    import org.apache.spark.sql.expressions.Window
    val order = (col(timeCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val state = struct(attrCols.map(col): _*)
    val withPrev = df
      .where(col(timeCol).isNotNull)
      .withColumn("__prev", lag(state, 1).over(w))
    // first row per key: lag is null; <=> makes attr-level nulls compare
    // as states, not as unknowns
    val changes = withPrev
      .where(col("__prev").isNull || !(state <=> col("__prev")))
      .drop("__prev")
    changes
      .withColumn("valid_from", col(timeCol))
      .withColumn("valid_to", lead(col(timeCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keyCols.map(col) ++ attrCols.map(col) ++ reserved.map(col): _*)
  }
}
