package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming exact deduplication with bounded state.
  *
  * Spark's built-in `dropDuplicates` on a stream keeps whole rows in state;
  * here state per key is a single boolean keyed by a 128-bit content hash,
  * expiring `ttl` past the last sighting in EVENT time — bounded state,
  * deterministic on replay, and no processing-time busy-loop (an
  * event-time timeout only fires as the watermark advances).
  *
  * Emits only the first occurrence of each distinct content hash.
  */
object StreamingDedup {

  case class Keyed(key: String, id: Long, ts: Timestamp)
  case class Hit(key: String, id: Long)

  /** `df` must be a streaming frame with `idCol` (long), `textCol`
    * (string) and an event-time column `tsCol`. `delayThreshold` is the
    * watermark lateness bound; `ttl` how long a seen-hash stays in state
    * beyond the watermark. */
  def firstOccurrences(df: DataFrame, idCol: String, textCol: String, tsCol: String,
                       delayThreshold: String = "10 minutes",
                       ttlMs: Long = 24L * 3600 * 1000): Dataset[Hit] =
    dedupByKey(df, md5(col(textCol).cast("binary")), idCol, tsCol,
      delayThreshold, ttlMs)

  /** Streaming NEAR-duplicate suppression with the same bounded state: the
    * key is the winnowing fingerprint ([[graft.functions.TextOps
    * .rollingFingerprint]]) instead of the exact content hash, so documents
    * differing by small edits that leave the minimal window intact share a
    * key and collapse to their first occurrence. Recall is heuristic — an
    * edit that lands inside (or introduces a smaller) minimal window changes
    * the key — which is the right trade for unbounded streams: state stays
    * one boolean per fingerprint, no pairwise comparison, no growth with
    * corpus size. For exhaustive near-dup detection run the batch
    * MinHash-LSH path over closed windows. */
  def firstOccurrencesNearDup(df: DataFrame, idCol: String, textCol: String, tsCol: String,
                              window: Int = 16,
                              delayThreshold: String = "10 minutes",
                              ttlMs: Long = 24L * 3600 * 1000): Dataset[Hit] = {
    graft.Graft.register(df.sparkSession)
    dedupByKey(df, call_function("rolling_fingerprint", col(textCol), lit(window)),
      idCol, tsCol, delayThreshold, ttlMs)
  }

  /** Streaming admission against a FROZEN corpus — [[graft.operators
    * .Dedup.dropSeen]]'s semantics on an unbounded stream: emit only the
    * stream rows whose text does not exist in the static snapshot.
    * Stateless (unlike [[firstOccurrences]] there is no growing state —
    * membership is against a frozen set, so nothing accumulates):
    *
    *  - the corpus reduces ONCE to a broadcast Bloom filter (one static
    *    scan) + a persisted distinct-hash frame;
    *  - per micro-batch, bloom misses pass with no join (no false
    *    negatives), and the rare bloom hits are confirmed by a
    *    stream-static left-outer join against the cached hash frame
    *    (left ANTI is not supported stream-static; outer + null-check is
    *    its supported equivalent).
    *
    * Exact for any fpp, like the batch operator. The returned frame is
    * streaming; compose with watermarks/sinks as usual. Note the cached
    * corpus-hash frame and the broadcast live until
    * `Dedup.releaseCaches()` — per the batch operator's contract. */
  def dropSeenStream(incoming: DataFrame, corpus: DataFrame, textCol: String,
                     expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    require(incoming.isStreaming, "dropSeenStream wants a streaming incoming frame")
    require(!corpus.isStreaming, "the frozen corpus must be a static frame")
    graft.operators.Dedup.dropSeenStreamImpl(incoming, corpus, textCol, expectedItems, fpp)
  }

  private def dedupByKey(df: DataFrame, keyCol: org.apache.spark.sql.Column,
                         idCol: String, tsCol: String,
                         delayThreshold: String, ttlMs: Long): Dataset[Hit] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(keyCol.as("key"),
        col(idCol).cast("long").as("id"), col(tsCol).cast("timestamp").as("ts"))
      // a null id/ts would kill the query at the non-nullable Keyed
      // encoder (and a null key — null text — would collapse all null
      // rows into one "duplicate"): drop them instead of dying
      .where(col("key").isNotNull && col("id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", delayThreshold)
      .as[Keyed]
      .groupByKey(_.key)
      .flatMapGroupsWithState[Boolean, Hit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[Keyed], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val isNew = !state.exists
            state.update(true)
            val maxTs = batch.map(_.ts.getTime).max
            state.setTimeoutTimestamp(math.max(maxTs, state.getCurrentWatermarkMs()) + ttlMs)
            if (isNew) Iterator.single(Hit(key, batch.minBy(r => (r.ts.getTime, r.id)).id))
            else Iterator.empty
          }
      }
  }
}
