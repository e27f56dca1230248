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
