package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured-Streaming event analytics. The same transformations run in
  * batch mode (watermark is a no-op there), so the batch parity query in
  * SparkEntry and the streaming pipeline share one definition. */
object EventStreams {

  /** Tumbling-window per-event-type stats. On a stream: watermarked state,
    * append-mode compatible. On a batch frame: a plain windowed aggregate. */
  def windowedStats(events: DataFrame,
                    windowLength: String = "1 hour",
                    watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           round(sum("value"), 3).as("sum_value"),
           approx_count_distinct("user_id").as("approx_users"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("approx_users"))
  }

  /** Stream-stream (or batch) interval join: each left row joins the
    * right rows matching on `keys` whose event time lies in
    * `[leftTime - beforeSec, leftTime + afterSec]` (inclusive).
    *
    * On two streams this is the canonical Structured Streaming
    * stream-stream join: both sides carry a watermark and the time-range
    * condition is what lets Spark BOUND the join state — buffered rows
    * age out as soon as the other side's watermark passes their
    * eligibility window, so state never grows with stream length. On
    * batch frames the same expression is a plain range-condition join
    * (one definition, batch parity for free — for large BATCH interval
    * joins with no equality key prefer
    * [[graft.operators.Temporal.rangeJoin]], which buckets instead of
    * nested-looping).
    *
    * Column names must be disjoint across the two sides (rename
    * upfront, standard join hygiene).
    */
  def intervalJoin(left: DataFrame, leftTime: String,
                   right: DataFrame, rightTime: String,
                   keys: Seq[(String, String)],
                   beforeSec: Long, afterSec: Long,
                   watermark: String = "2 hours"): DataFrame = {
    require(keys.nonEmpty, "interval join needs at least one equality key")
    require(beforeSec >= 0 && afterSec >= 0,
      "beforeSec/afterSec must be non-negative")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left and right column names must be disjoint, overlapping: ${overlap.mkString(", ")}")
    val l = if (left.isStreaming) left.withWatermark(leftTime, watermark) else left
    val r = if (right.isStreaming) right.withWatermark(rightTime, watermark) else right
    val cond = keys.map { case (a, b) => l(a) === r(b) }.reduce(_ && _) &&
      r(rightTime) >= l(leftTime) - expr(s"INTERVAL $beforeSec SECOND") &&
      r(rightTime) <= l(leftTime) + expr(s"INTERVAL $afterSec SECOND")
    l.join(r, cond)
  }

  case class AsofUnionEvent(key: Long, ts: Timestamp, tag: Int,
                            left_id: Long, value: Double)
  case class AsofJoinState(rights: List[(Long, Double)],
                           pend: List[(Long, Long)])
  case class AsofEnriched(key: Long, left_id: Long, ts: Timestamp,
                          right_ts: Option[Timestamp], value: Option[Double])

  /** Streaming as-of join: enrich a left event stream with the most
    * recent prior right event per key (the streaming form of
    * [[graft.operators.Temporal.asofJoin]] backward mode, which also
    * serves as the batch path — batch frames delegate to it, so the two
    * modes share one semantics definition).
    *
    * `left` needs columns `(key, ts, left_id)`, `right` `(key, ts,
    * value)`; each left row is emitted EXACTLY ONCE, when the watermark
    * reaches its event time — at that point no right row at or before it
    * can still arrive (Spark's late filter drops rows at-or-behind the
    * watermark), so the match is final. Exact-time matches
    * included; ties at equal right time resolve to the largest value
    * (deterministic); `toleranceMs` drops matches further back than the
    * bound. Output is append-mode compatible.
    *
    * State per key is PROVABLY bounded, watermark-pruned on every
    * invocation:
    *   - pending lefts: only those newer than the watermark (older ones
    *     have emitted), so ≤ one watermark-delay of left events;
    *   - right buffer: with finite tolerance, only rights within one
    *     tolerance horizon of the watermark — anything older is out of
    *     range for EVERY unfinalized left (their times exceed the
    *     watermark). With `toleranceMs = None`, additionally the single
    *     newest right at or below the watermark (dominated pruning: a
    *     newer eligible right always wins), which by the as-of semantics
    *     must persist indefinitely — any future left may still need it.
    *     With finite tolerance, a quiesced key's state clears fully via
    *     event-time timeout.
    * Late rows (event time already behind the watermark) are DROPPED
    * before the state function runs — Spark's standard late-data
    * contract under event-time timeouts — so "exactly once" is a
    * promise about on-time rows. Rows with a null event time are
    * dropped on the streaming path (they cannot be watermark-ordered);
    * the batch path follows [[graft.operators.Temporal.asofJoin]]'s
    * null taxonomy. Both inputs carry the watermark and the query
    * watermark is the MIN across them: a stalled input holds back
    * finalization (standard multi-input semantics — feed heartbeats if
    * one side can go quiet). Mixing one streaming and one batch input
    * is rejected.
    */
  def streamingAsofJoin(left: DataFrame, right: DataFrame,
                        toleranceMs: Option[Long] = None,
                        watermarkDelay: String = "1 hour"): Dataset[AsofEnriched] = {
    val spark = left.sparkSession
    import spark.implicits._
    require(toleranceMs.forall(_ >= 0), "toleranceMs must be non-negative")

    if (!left.isStreaming && !right.isStreaming) {
      // batch path: same semantics via the batch operator (tie on value)
      return graft.operators.Temporal.asofJoin(
        left.selectExpr("key", "ts", "left_id"),
        right.selectExpr("key AS rkey", "ts AS rts", "value"),
        Seq("key"), Seq("rkey"), "ts", "rts", Seq("rts", "value"),
        tolerance = toleranceMs.map(_ * 1000L), // µs in the batch operator
        tieCols = Seq("value"))
        .select(col("key"), col("left_id"), col("ts"),
          col("rts").as("right_ts"), col("value"))
        .as[AsofEnriched]
    }

    require(left.isStreaming && right.isStreaming,
      "streamingAsofJoin needs both inputs streaming or both batch — " +
        "mixing modes cannot union (enrich a stream against a static " +
        "frame with a stream-static join instead)")

    val l = left.selectExpr("key", "ts", "left_id")
      .where(col("ts").isNotNull) // null times cannot be watermark-ordered
      .withColumn("tag", lit(1)).withColumn("value", lit(0.0))
      .withWatermark("ts", watermarkDelay)
    val r = right.selectExpr("key", "ts", "value")
      .where(col("ts").isNotNull)
      .withColumn("tag", lit(0)).withColumn("left_id", lit(0L))
      .withWatermark("ts", watermarkDelay)
    val unioned = l.select("key", "ts", "tag", "left_id", "value")
      .unionByName(r.select("key", "ts", "tag", "left_id", "value"))
      .as[AsofUnionEvent]

    unioned.groupByKey(_.key)
      .flatMapGroupsWithState[AsofJoinState, AsofEnriched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, evs: Iterator[AsofUnionEvent], state: GroupState[AsofJoinState]) =>
          var s = state.getOption.getOrElse(AsofJoinState(Nil, Nil))
          evs.foreach { e =>
            val t = e.ts.getTime
            if (e.tag == 0) s = s.copy(rights = (t, e.value) :: s.rights)
            else s = s.copy(pend = (t, e.left_id) :: s.pend)
          }
          val wm = state.getCurrentWatermarkMs()
          // Finalize at <= wm: Spark's late filter already drops incoming
          // rows whose event time is at or behind the watermark
          // (spec-pinned at ms equality in EventStreamsSpec), so no right
          // that could match a left at t <= wm can still arrive — waiting
          // past the watermark would delay emission for nothing.
          val (ready, stillPending) = s.pend.partition(_._1 <= wm)
          val out = ready.sortBy(identity).map { case (t, id) =>
            val best = s.rights.iterator
              .filter(rv => rv._1 <= t && toleranceMs.forall(tl => t - rv._1 <= tl))
              .maxOption
            AsofEnriched(key, id, new Timestamp(t),
              best.map(b => new Timestamp(b._1)), best.map(_._2))
          }
          val keptRights = toleranceMs match {
            case Some(tl) => s.rights.filter(_._1 >= wm - tl)
            case None =>
              // dominated pruning: keep everything past the watermark plus
              // the single newest right at or below it
              val newestLe = s.rights.filter(_._1 <= wm).maxOption
              s.rights.filter(_._1 > wm) ++ newestLe
          }
          val ns = AsofJoinState(keptRights, stillPending)
          if (ns.rights.isEmpty && ns.pend.isEmpty) state.remove()
          else {
            state.update(ns)
            // wake when the earliest pending left finalizes; else (finite
            // tolerance) when the whole right buffer ages out of range
            val target = ns.pend.map(_._1 + 1).minOption.orElse(
              toleranceMs.map(tl => ns.rights.map(_._1 + tl + 1).max))
            target.foreach(t => state.setTimeoutTimestamp(math.max(t, wm + 1)))
          }
          out.iterator
      }
  }

  case class SessionEvent(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  /** True streaming sessionization: per-user custom state via
    * flatMapGroupsWithState with event-time timeout. A session closes (and
    * is emitted, append-mode) when the watermark passes its last event +
    * gap. State per user is 3 longs — bounded regardless of stream length. */
  def streamingSessionize(events: DataFrame, gapMinutes: Int = 30): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    events.selectExpr("user_id", "ts").as[SessionEvent]
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, events: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          def emit(s: SessionState): Session =
            Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
          if (state.hasTimedOut) {
            val out = state.getOption.map(emit).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = events.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // a late event above the watermark may precede the
                  // session's current start — the merged session starts
                  // at the earliest event, as batch sessionize would
                  cur = Some(s.copy(start = math.min(s.start, t),
                    last = math.max(s.last, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= emit(s)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  case class FunnelEvent(user_id: Long, event_type: String, ts: Timestamp)
  case class FunnelState(minSignup: Long, clicks: List[Long], purchases: List[Long],
                         emitted: Boolean = false)
  case class FunnelUser(user_id: Long, signup_ts: Timestamp,
                        click_ts: Option[Timestamp], purchase_ts: Option[Timestamp])

  /** True streaming funnel — the batch `q_funnel` semantics (first stage-1
    * event, then the first stage-2 event within `stageWindowHours` after
    * it, then stage 3 within the window after that) as per-user custom
    * state with event-time timeouts.
    *
    * Emits one [[FunnelUser]] row per user who signed up, with the stage-2
    * / stage-3 timestamps when reached — exactly the batch CTE's answer on
    * the same events, because a user finalizes only once the watermark
    * passes `t1 + 2·window` (no event that could still arrive can change
    * the outcome: earlier-than-watermark events never arrive, later ones
    * are outside the funnel horizon and cannot lower the stage-1 min).
    *
    * State per user is bounded by the events inside one funnel horizon:
    * stage-1 keeps only the running min; stage-2/3 candidates outside
    * `(min stage-1, +horizon]` — or no longer reachable given the
    * watermark — are pruned every batch. Users with no stage-1 event keep
    * nothing older than the watermark and time out quietly.
    *
    * After a user's row is emitted, a three-field TOMBSTONE survives for
    * `tombstoneHours` of event time so a repeat stage-1 event cannot
    * produce a second row for the same user (batch emits one row per
    * user). Past the tombstone a repeat signup starts a fresh funnel row
    * — the bounded-state trade: remembering every emitted user forever
    * is exactly the unbounded state this operator is designed to avoid,
    * so the parity guarantee is "one row per user per `tombstoneHours`". */
  def streamingFunnel(events: DataFrame,
                      stages: (String, String, String) = ("signup", "click", "purchase"),
                      stageWindowHours: Int = 24,
                      tombstoneHours: Int = 7 * 24): Dataset[FunnelUser] = {
    val spark = events.sparkSession
    import spark.implicits._
    val windowSec = stageWindowHours * 3600L
    val (s1, s2, s3) = stages

    // batch q_funnel compares unix_timestamp values — SECOND-floored —
    // so every stage comparison here floors the same way; comparing raw
    // milliseconds would disagree with the batch CTE at sub-second
    // boundaries (its own window bounds are in whole seconds too)
    def sec(tMs: Long): Long = Math.floorDiv(tMs, 1000L)

    def finish(uid: Long, s: FunnelState): FunnelUser = {
      val t1s = sec(s.minSignup)
      val t2 = s.clicks.filter(t => sec(t) > t1s && sec(t) <= t1s + windowSec)
        .minOption
      val t3 = t2.flatMap { c =>
        val t2s = sec(c)
        s.purchases.filter(t => sec(t) > t2s && sec(t) <= t2s + windowSec).minOption
      }
      FunnelUser(uid, new Timestamp(s.minSignup),
        t2.map(new Timestamp(_)), t3.map(new Timestamp(_)))
    }

    events.selectExpr("user_id", "event_type", "ts").as[FunnelEvent]
      .withWatermark("ts", s"$stageWindowHours hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUser](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          val tombstoneMs = tombstoneHours * 3600000L
          // emit + leave a tombstone: the row is final, but the key must
          // stay known for tombstoneMs so a repeat stage-1 event cannot
          // emit the same user twice
          def emitOnce(s: FunnelState, wm: Long): Iterator[FunnelUser] = {
            state.update(FunnelState(s.minSignup, Nil, Nil, emitted = true))
            state.setTimeoutTimestamp(wm + tombstoneMs)
            Iterator.single(finish(uid, s))
          }
          if (state.hasTimedOut) {
            state.getOption match {
              case Some(s) if s.emitted || s.minSignup == Long.MaxValue =>
                state.remove(); Iterator.empty
              case Some(s) => emitOnce(s, state.getCurrentWatermarkMs())
              case None => Iterator.empty
            }
          } else if (state.getOption.exists(_.emitted)) {
            // row already out: swallow late/repeat events; the tombstone
            // timeout set at emission still stands and will clear it
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(FunnelState(Long.MaxValue, Nil, Nil))
            evs.foreach { e =>
              val t = e.ts.getTime
              e.event_type match {
                case `s1` => if (t < s.minSignup) s = s.copy(minSignup = t)
                case `s2` => s = s.copy(clicks = t :: s.clicks)
                case `s3` => s = s.copy(purchases = t :: s.purchases)
                case _    => ()
              }
            }
            val wm = state.getCurrentWatermarkMs()
            val t1 = s.minSignup
            val t1s = sec(t1)
            val hasS1 = t1 != Long.MaxValue
            // first ms of the first SECOND past the funnel horizon: any
            // event at or past it floors strictly outside every stage
            // bound (stage-2 <= t1s+window, stage-3 <= t2s+window <=
            // t1s+2*window)
            val horizonEndMs = (t1s + 2 * windowSec + 1) * 1000L
            if (hasS1 && wm >= horizonEndMs) {
              // outcome already immutable: finalize without waiting for the
              // timeout to fire
              emitOnce(s, wm)
            } else {
              // prune candidates that can never participate (all bounds in
              // floored seconds, matching finish):
              //  - with a stage-1 min: outside (t1s, t1s+window] for stage
              //    2 / (t1s, t1s+2*window] for stage 3. A candidate with
              //    sec <= t1s AND ts <= wm stays dead even if a late
              //    stage-1 event lowers t1, because late events all carry
              //    ts > wm (so their floor can never drop below this
              //    candidate's).
              //  - without one: any candidate <= wm (a future stage-1 event
              //    has ts > wm, and stages 2/3 must floor strictly after it)
              val keep: (Long, Long) => Boolean =
                if (hasS1) (t, hiSec) => (sec(t) > t1s || t > wm) && sec(t) <= hiSec
                else (t, _) => t > wm
              val pruned = s.copy(
                clicks = s.clicks.filter(keep(_, t1s + windowSec)),
                purchases = s.purchases.filter(keep(_, t1s + 2 * windowSec)))
              state.update(pruned)
              // finalize when nothing can change: the horizon end for
              // funnels in flight, one quiet window past the newest data
              // otherwise
              val lastSeen = (pruned.clicks ++ pruned.purchases ++
                (if (hasS1) List(t1) else Nil)).maxOption.getOrElse(wm)
              val target = if (hasS1) horizonEndMs
                           else math.max(lastSeen, wm) + windowSec * 1000L
              state.setTimeoutTimestamp(math.max(target, wm + 1))
              Iterator.empty
            }
          }
      }
  }

  /** Cohort retention matrix — the standard product-analytics view of an
    * event stream: users grouped by their ACQUISITION period (the period
    * of their first event), counted in every later period they were
    * active. Returns `(cohort, period_index, active_users)` where
    * `cohort` is the user's first period (epoch time ÷ periodSeconds,
    * floored) and `period_index` its offset (0 = the acquisition period
    * itself, so every cohort's index-0 count is its size).
    *
    * Pure relational shape, deterministic, 100 TB-ready: one partial-agg
    * groupBy per user for the first-event period (|users| rows), a
    * hash join back onto the per-(user, period) DISTINCT activity set
    * (collapsed map-side before the join — bodies/events never join
    * twice), and a final count per (cohort, index). No window function
    * (a `min OVER (PARTITION BY user)` would buffer each user's events
    * in one task); null users/timestamps are dropped. */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
                       periodSeconds: Long = 86400L): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    val e = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        floor(unix_timestamp(col(tsCol)) / periodSeconds).as("__d"))
      .distinct() // one row per (user, active period)
    val first = e.groupBy("__u").agg(min("__d").as("cohort"))
    e.join(first, "__u")
      .select(col("cohort"), (col("__d") - col("cohort")).as("period_index"))
      .groupBy("cohort", "period_index")
      .agg(count(lit(1)).as("active_users"))
  }

  case class RetentionEvent(user_id: Long, ts: Timestamp)
  case class RetentionState(cohort: Long, pending: List[Long])
  case class RetentionEmit(cohort: Long, period_index: Long)

  /** Streaming cohort retention — the [[retentionCohorts]] matrix's
    * emission layer on a live stream: one `(cohort, period_index)` row
    * per (user, active period), append mode, emitted exactly once when
    * the watermark finalizes that period. `SUM(active_users) GROUP BY
    * cohort, period_index` over these rows (or a collect in a test
    * sink) IS the batch matrix — the one-definition discipline of
    * streamingSessionize/streamingFunnel.
    *
    * Finality argument: the watermark filter drops any event with
    * `ts < wm`, so every arriving event has period ≥ ⌊wm/period⌋
    * (`wmPeriod`). A pending period `p < wmPeriod` can therefore never
    * gain earlier company — and the user's cohort (min period seen,
    * cohort ≤ p) is equally frozen — so `(cohort, p - cohort)` is final
    * and emits. Pending periods ≥ wmPeriod wait on a timeout at the
    * next period boundary past the earliest of them.
    *
    * State per user: one long (the cohort — retained for the stream's
    * lifetime by design: a user active in month 12 must still index off
    * month 0) plus the pending set, bounded by the watermark horizon ÷
    * periodSeconds. */
  def streamingRetention(events: DataFrame,
                         watermarkDelay: String = "1 hour",
                         periodSeconds: Long = 86400L): Dataset[RetentionEmit] = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    val spark = events.sparkSession
    import spark.implicits._
    def periodOf(tMs: Long): Long =
      Math.floorDiv(Math.floorDiv(tMs, 1000L), periodSeconds)
    events.select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"))
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .as[RetentionEvent]
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetentionState, RetentionEmit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, evs: Iterator[RetentionEvent], state: GroupState[RetentionState]) =>
          var s = state.getOption.getOrElse(RetentionState(Long.MaxValue, Nil))
          evs.foreach { e =>
            val p = periodOf(e.ts.getTime)
            if (p < s.cohort) s = s.copy(cohort = p)
            if (!s.pending.contains(p)) s = s.copy(pending = p :: s.pending)
          }
          val wm = state.getCurrentWatermarkMs()
          val wmPeriod = periodOf(wm)
          val (ready, rest) = s.pending.partition(_ < wmPeriod)
          state.update(s.copy(pending = rest))
          if (rest.nonEmpty) {
            // fire when the earliest open period's boundary passes the
            // watermark, so quiescent streams still flush
            val target = (rest.min + 1) * periodSeconds * 1000L
            state.setTimeoutTimestamp(math.max(target, wm + 1))
          }
          ready.sorted.map(p => RetentionEmit(s.cohort, p - s.cohort)).iterator
      }
  }

  case class GapObs(k: String, ts: Timestamp, v: Double)
  case class GapFillState(lastBin: Long, lastVal: Double,
                          pending: List[(Long, Double)])
  case class GapFillEmit(k: String, t: Long, src_t: Long, v: Double)

  /** Streaming gap-fill: the watermark-finalized counterpart of
    * [[graft.operators.Temporal.gapFill]]. Observations `(k, ts, v)` bin
    * to `floor(epochSec / stepSeconds)`; once the watermark passes a
    * bin, that bin is FINAL (no more observations can arrive for it —
    * the watermark contract), so the operator emits it plus forward-fill
    * rows for every empty bin since the key's previous emission,
    * carrying the last observed value and its source bin. Emission is
    * append-mode, exactly once per `(k, t)`: `lastBin` only moves
    * forward, so replays and late triggers can never re-emit a bin.
    *
    * Parity contract with the batch operator: when every observation is
    * below the final watermark, the emitted set EQUALS
    * `gapFill(obs, Seq(k), bin, 1, Seq(v))` on the binned frame (grid
    * from each key's first to last bin, observed bins pass through,
    * `src_t = t` flags them) — spec-asserted against out-of-order input.
    * Bins after a key's LAST finalized observation stay open (a later
    * observation may extend the series; batch, which sees the closed
    * set, grids exactly to max bin — same rows either way).
    *
    * State per key: the fill cursor (one bin + one value) plus the
    * pending observations still above the watermark — bounded by
    * watermark-horizon / step, never the stream. Equal-bin duplicates
    * keep the MAX value (deterministic; pre-aggregate upstream if you
    * mean a different combine — the batch operator's contract). An
    * event-time timer fires when the earliest pending bin's boundary
    * passes the watermark, so keys flush even when quiescent.
    */
  def streamingGapFill(obs: DataFrame, stepSeconds: Long,
                       watermarkDelay: String = "1 hour"): Dataset[GapFillEmit] = {
    require(stepSeconds >= 1, s"stepSeconds must be >= 1, got $stepSeconds")
    val spark = obs.sparkSession
    import spark.implicits._
    def binOf(tMs: Long): Long =
      Math.floorDiv(Math.floorDiv(tMs, 1000L), stepSeconds)
    obs.select(col("k").cast("string").as("k"),
        col("ts").cast("timestamp").as("ts"), col("v").cast("double").as("v"))
      .where(col("k").isNotNull && col("ts").isNotNull && col("v").isNotNull)
      .as[GapObs]
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.k)
      .flatMapGroupsWithState[GapFillState, GapFillEmit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, evs: Iterator[GapObs], state: GroupState[GapFillState]) =>
          var s = state.getOption.getOrElse(GapFillState(Long.MinValue, 0.0, Nil))
          evs.foreach { e =>
            val b = binOf(e.ts.getTime)
            // bins at or below the cursor are already emitted — the
            // watermark admitted this event, so b can only trail lastBin
            // on a replayed trigger; drop rather than double-emit
            if (b > s.lastBin) {
              val (same, rest) = s.pending.partition(_._1 == b)
              val v = (e.v :: same.map(_._2)).max
              s = s.copy(pending = (b, v) :: rest)
            }
          }
          val wmBin = binOf(state.getCurrentWatermarkMs())
          val (ready, rest) = s.pending.partition(_._1 < wmBin)
          val out = scala.collection.mutable.ArrayBuffer.empty[GapFillEmit]
          var (cur, curV) = (s.lastBin, s.lastVal)
          ready.sortBy(_._1).foreach { case (b, v) =>
            if (cur != Long.MinValue) {
              var t = cur + 1
              while (t < b) { out += GapFillEmit(key, t, cur, curV); t += 1 }
            }
            out += GapFillEmit(key, b, b, v)
            cur = b; curV = v
          }
          state.update(GapFillState(cur, curV, rest))
          if (rest.nonEmpty) {
            val target = (rest.map(_._1).min + 1) * stepSeconds * 1000L
            state.setTimeoutTimestamp(
              math.max(target, state.getCurrentWatermarkMs() + 1))
          }
          out.iterator
      }
  }

  /** Sessionize: per-user session ids from gaps > `gapMinutes` (batch
    * analytics variant using a window function; the streaming variant above
    * uses identical gap logic). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 orderCols: Seq[String] = Seq("ts")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // secondary order columns (e.g. an event id) make lag() deterministic
    // when timestamps tie
    val byUser = Window.partitionBy("user_id").orderBy(orderCols.map(col): _*)
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > gapMinutes * 60L, 1L)
          .otherwise(0L))
      // ROWS frame: the default RANGE frame includes ORDER BY peers, so
      // a new_session flag on one of two tied rows would leak its
      // increment into the other; with the tiebreaker orderCols the ROWS
      // cumulative sum is deterministic and assigns the break to exactly
      // the flagged row
      .withColumn("session_seq", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts", "new_session")
  }
}
