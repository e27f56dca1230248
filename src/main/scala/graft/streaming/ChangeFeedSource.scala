package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** STREAMING changefeed over an [[UpsertSink]] store — tail the table's
  * CDC log as a Structured Streaming source (the Delta-CDF read shape):
  *
  * {{{
  *   spark.readStream.format("graft-changefeed")
  *     .option("path", "/data/store")
  *     .option("startingVersion", "earliest")   // or a version id
  *     .load()                           // (key, _change_type, payloads…)
  * }}}
  *
  * Offsets are the store's committed batch ids — already durable,
  * totally ordered, and exactly-once by the sink's manifest protocol,
  * so the stream needs no extra bookkeeping: each micro-batch is
  * `readChanges(lastSeenVersion, currentVersion)`, which reads ONLY
  * the buckets the intervening commits touched (never O(table); see
  * [[UpsertSink.readChanges]]).
  *
  * `startingVersion`: `"earliest"` opens with the full current
  * snapshot as `insert` rows then tails (initial-load-then-CDC);
  * a NUMBER `n` starts with the changes SINCE version n (exclusive);
  * absent, the stream tails only changes committed after it starts.
  * The store must already exist (the schema rides in its manifest).
  *
  * `preImages = true` switches every micro-batch to the FOUR-type
  * classification ([[UpsertSink.readChanges]]'s `preImages`): updates
  * emit pre- and post-image row pairs, deletes carry deleted values —
  * what a SUBTRACTIVE consumer needs, e.g. a live
  * [[MatView.applyDelta]] in `foreachBatch` maintaining a grouped
  * aggregate incrementally off this stream.
  *
  * Retention contract: [[UpsertSink.vacuum]] must retain at least the
  * versions between a restarting stream's checkpointed offset and the
  * head (`retainVersions` ≥ the stream's worst-case downtime in
  * commits) — a vacuumed-away `from` version fails the batch LOUDLY
  * with the vacuum message rather than silently skipping changes.
  *
  * V1 `Source` by design: the per-batch relation is a manifest-driven
  * pruned diff that [[UpsertSink.readChanges]] already plans as
  * DataFrame ops; a DSv2 `MicroBatchStream` would have to re-implement
  * parquet reading + the hash-diff join inside a `PartitionReader`.
  * The only internal touched is the `isStreaming` plan flag
  * ([[org.apache.spark.sql.graft.StreamingShim]]).
  */
class ChangeFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-changefeed"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-changefeed requires .option(\"path\", <UpsertSink store>)"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft-changefeed derives its schema from the store's manifest; " +
        "a user-supplied schema is not accepted")
    (shortName(), UpsertSink.changeSchema(pathOf(parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val path = pathOf(parameters)
    val current = UpsertSink.readManifest(path).getOrElse(
      throw new IllegalStateException(
        s"no snapshot at $path yet — the changefeed needs an existing " +
          "store (its manifest carries the schema)")).batchId
    val startFrom = parameters.get("startingversion")
      .orElse(parameters.get("startingVersion")) match {
      case Some("earliest") => -1L // empty prehistory: snapshot-as-inserts
      case Some(n) =>
        val v = n.toLongOption.getOrElse(
          throw new IllegalArgumentException(
            s"startingVersion must be 'earliest' or a version id, got '$n'"))
        // validate against the store NOW, where the message can name the
        // option: a negative typo would otherwise silently replay the
        // whole snapshot (empty-prehistory semantics), and an
        // above-head value would crash the first trigger with a
        // readChanges message that never mentions startingVersion
        require(v >= 0, s"startingVersion must be >= 0, got $v " +
          "(use 'earliest' for the full-snapshot opening)")
        require(v <= current, s"startingVersion $v is above the store's " +
          s"committed head $current")
        v
      case None => current // tail: only changes committed after start
    }
    val preImages = parameters.get("preimages")
      .orElse(parameters.get("preImages")) match {
      case Some(s) if s.equalsIgnoreCase("true") => true
      case Some(s) if s.equalsIgnoreCase("false") => false
      case Some(s) => throw new IllegalArgumentException(
        s"preImages must be true or false, got '$s'")
      case None => false
    }
    new ChangeFeedSource(sqlContext, path, startFrom, preImages)
  }
}

private class ChangeFeedSource(sqlContext: SQLContext, path: String,
                               startFrom: Long,
                               preImages: Boolean) extends Source {
  override val schema: StructType = UpsertSink.changeSchema(path)

  private def ver(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  /** Latest available = the store's committed head, unconditionally —
    * a tail-mode stream's first batch is then an EMPTY head→head diff
    * rather than a stall, and a restart whose checkpoint trails the
    * head delivers the gap immediately instead of waiting for the
    * next commit. */
  override def getOffset: Option[Offset] =
    UpsertSink.readManifest(path).map(m => LongOffset(m.batchId))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver).getOrElse(startFrom)
    val batch = UpsertSink.readChanges(
      sqlContext.sparkSession, path, from, ver(end), preImages)
    // conform to the schema DECLARED at stream start (the readers'
    // shared conform projection): a mid-stream additive evolution would
    // otherwise widen the batch and fail the engine's schema check. The
    // stream keeps flowing on the old columns; restart it to pick up
    // the widened schema.
    val conformed = batch.select(UpsertSink.conformCols(batch, schema): _*)
    org.apache.spark.sql.graft.StreamingShim.streamingDataFrame(
      sqlContext.sparkSession, conformed.queryExecution.toRdd,
      conformed.schema)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"ChangeFeedSource[$path from $startFrom]"
}
