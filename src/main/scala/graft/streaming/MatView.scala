package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTALLY MAINTAINED MATERIALIZED VIEW: a grouped
  * count/sum aggregate of a base [[UpsertSink]] store, kept in a
  * DERIVED UpsertSink store and advanced by changefeed DELTAS instead
  * of recomputation — the composition the CDC surface exists for:
  *
  *   base store --readChanges(preImages = true)--> [[applyDelta]]
  *     --applyBatch--> view store
  *
  * Per maintenance step the cost is proportional to the groups the
  * batch TOUCHED, never to the view or the base:
  *
  *   - the feed reads only the buckets the intervening batches wrote
  *     ([[UpsertSink.readChanges]]'s manifest-diff pruning);
  *   - pre-images make the aggregate SUBTRACTIVE — post-images add,
  *     pre-images subtract, so an update/delete adjusts its group
  *     without touching the base;
  *   - current view values read through the bucket-pruned
  *     [[UpsertSink.readSnapshotKeys]] (only the touched groups'
  *     buckets open);
  *   - the write-back is an ordinary bucket-pruned [[UpsertSink.applyBatch]],
  *     which also provides exactly-once: a replayed feed batch skips
  *     by id, so the delta can never double-apply.
  *
  * At 100 TB this is the difference between "the nightly GROUP BY over
  * the table" and "a few bucket reads per micro-batch" — the same
  * maintenance-∝-change economics the sink's own compaction follows.
  *
  * The view schema is `groupCol, cnt BIGINT, <sumCols…>` with COUNT(*) /
  * SUM(col) semantics over the base snapshot: `cnt` counts live base
  * rows per group, each sum ignores NULL addends, and a group whose
  * count reaches zero is DELETED from the view (recomputation parity:
  * GROUP BY emits no row for an empty group). NULL groups are refused
  * loudly — the sink's key semi-join cannot probe a NULL key, and a
  * silent drop would diverge from recomputation; filter or coalesce
  * them upstream.
  */
object MatView {

  /** Fold one pre-image changefeed batch into the view store at
    * `viewPath`. `feed` must carry `groupCol`, the four-type
    * [[UpsertSink.ChangeTypeCol]], and `sumCols` (numeric); feeds are
    * consumed in version order, each spanning exactly the base versions
    * since the previous call (`readChanges(prev, cur, preImages =
    * true)`; the first call spans from -1, the empty prehistory).
    * Returns what [[UpsertSink.applyBatch]] returns: true when applied,
    * false when skipped (replayed id, or a feed that touches nothing).
    *
    * A NEGATIVE interim count means the feed does not match the base
    * history (skipped a version, replayed one out of order, or was
    * built post-only) — refused loudly rather than persisting a wrong
    * aggregate. */
  def applyDelta(spark: SparkSession, viewPath: String, groupCol: String,
                 sumCols: Seq[String], numBuckets: Int)
                (feed: DataFrame, batchId: Long): Boolean =
    applyDelta(spark, viewPath, Seq(groupCol), sumCols, numBuckets)(
      feed, batchId)

  /** Multi-column grouping: a SINGLE group column keys the view store
    * directly; several key it on a synthesized `__grp` STRUCT of the
    * group columns (xxhash64 routes structs like any other type), with
    * the FLAT group columns stored alongside as payloads — so the view
    * reads flat either way ([[readView]] drops the internal key). A
    * 64-bit hash of the tuple would be smaller but could silently MERGE
    * two colliding groups; the struct key keeps equality exact. */
  def applyDelta(spark: SparkSession, viewPath: String,
                 groupCols: Seq[String], sumCols: Seq[String],
                 numBuckets: Int)
                (feed: DataFrame, batchId: Long): Boolean = {
    require(groupCols.nonEmpty, "MatView needs at least one group column")
    val clash = (groupCols ++ sumCols)
      .filter(c => c == "cnt" || c.startsWith("__"))
    require(clash.isEmpty,
      s"MatView reserves 'cnt' and the '__' prefix: ${clash.mkString(", ")}")
    val missing = (groupCols ++ Seq(UpsertSink.ChangeTypeCol) ++ sumCols)
      .filterNot(feed.columns.contains)
    require(missing.isEmpty,
      s"feed is missing columns: ${missing.mkString(", ")} " +
        s"(have: ${feed.columns.mkString(", ")})")

    // post-images add, pre-images subtract — the subtractive fold
    val w = when(col(UpsertSink.ChangeTypeCol)
        .isin("insert", "update_postimage"), 1)
      .when(col(UpsertSink.ChangeTypeCol)
        .isin("delete", "update_preimage"), -1)
      .otherwise(raise_error(concat(
        lit("MatView: feed has a post-only change type '"),
        col(UpsertSink.ChangeTypeCol),
        lit("' — build it with readChanges(…, preImages = true)"))))
    val multi = groupCols.size > 1
    val keyCol = if (multi) "__grp" else groupCols.head
    def nCol(c: String) = s"__n_$c"
    // checkpointed: read three times below (null guard, probe set for
    // the pruned current-value read, and the merge itself). Per sum
    // column the view ALSO maintains a hidden non-null-addend count
    // (`__n_<c>`, subtractive like everything else): SQL's SUM over a
    // group with no non-null addends is NULL, not 0, and without the
    // count the fold cannot tell "sums to zero" from "nothing to sum" —
    // the view would diverge from recomputation exactly there.
    val aggs = sum(w).cast("long").as("__dcnt") +:
      (sumCols.map(c => sum(w * col(c)).as(c)) ++
        sumCols.map(c => sum(when(col(c).isNotNull, w).otherwise(0))
          .cast("long").as(nCol(c))))
    val deltas0 = feed.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    // LAZY checkpoint: the guard aggregate below is the first action and
    // scans every partition, so it fills the checkpoint in the same job
    // (eager paid one extra job per delta for the same bytes)
    val deltas = (if (multi)
        deltas0.withColumn(keyCol, struct(groupCols.map(col): _*))
      else deltas0).localCheckpoint(false)
    try {
      // ONE pass answers both guards (row count and NULL-group count) —
      // separately they were two jobs per delta
      val guard = deltas.select(count(lit(1)).as("n"),
        count(when(groupCols.map(col(_).isNull).reduce(_ || _), 1))
          .as("nulls")).first()
      require(guard.getLong(1) == 0L,
        "MatView: NULL group values are not maintainable (the view " +
          "store's key probe cannot match NULL) — filter or coalesce " +
          "them upstream")
      if (guard.getLong(0) == 0L) {
        // an empty state diff (a base version that re-upserted identical
        // values, or deleted absent keys) still ADVANCES the view's
        // high-water mark — otherwise every later catchUp would re-read
        // and re-skip this version's feed forever
        UpsertSink.bumpBatchId(viewPath, batchId)
        return false
      }

      val payloads = (if (multi) groupCols else Nil) ++
        ("cnt" +: sumCols) ++ sumCols.map(nCol)
      // current values for JUST the touched groups (bucket-pruned);
      // before the view's first batch there is no store to read — a
      // FRESH empty frame, never a projection of `deltas` (shared
      // attribute ids would make the merge below read delta values
      // through the current-side references and double-count)
      val current = UpsertSink.readManifest(viewPath) match {
        case Some(_) =>
          // the grouped delta frame is distinct on the key by
          // construction and checkpointed above — the pre-distinct read
          // skips a shuffle and a second checkpoint per delta
          UpsertSink.readSnapshotKeysPreDistinct(spark, viewPath,
            deltas.select(keyCol))
        case None =>
          import org.apache.spark.sql.types.{LongType, StructField, StructType}
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(
              StructField(keyCol, deltas.schema(keyCol).dataType) +:
              payloads.map(c =>
                if (c == "cnt" || c.startsWith("__n_"))
                  StructField(c, LongType)
                else StructField(c, deltas.schema(c).dataType))))
      }

      // merge as a UNION + one aggregation (round 15): the current view
      // values and the deltas sum per group — a full-outer join said
      // the same thing with two exchanges and a sort-merge join, where
      // one groupBy says it with one exchange. Every current row
      // matched a probe that CAME from deltas, so each group holds one
      // or two rows; SUM over them reproduces the old
      // coalesce(cur, 0) + coalesce(delta, 0) arithmetic exactly (SUM
      // skips NULL addends, and the per-column coalesce keeps the "one
      // side NULL, other side set" case identical).
      def side(df: DataFrame, cntFrom: String) = df.select(
        col(keyCol) +: col(cntFrom).as("cnt") +:
          ((if (multi) groupCols else Nil).map(col) ++
            sumCols.map(c => coalesce(col(c),
              lit(0).cast(deltas.schema(c).dataType)).as(c)) ++
            sumCols.map(c => col(nCol(c)))): _*)
      val merged = side(current, "cnt")
        .unionByName(side(deltas, "__dcnt"))
        .groupBy(col(keyCol))
        .agg(sum(col("cnt")).as("cnt"),
          ((if (multi) groupCols.map(g => max(col(g)).as(g)) else Nil) ++
            sumCols.map(c => sum(col(c)).as(c)) ++
            sumCols.map(c => sum(col(nCol(c))).as(nCol(c)))): _*)
        .select(Seq(col(keyCol), lit(batchId).as("__seq"), col("cnt")) ++
          (if (multi) groupCols.map(col) else Nil) ++
          sumCols.map(c =>
            // SQL parity: a group with zero non-null addends sums NULL
            when(col(nCol(c)) === 0,
              lit(null).cast(deltas.schema(c).dataType))
              .otherwise(col(c)).as(c)) ++
          sumCols.map(c => col(nCol(c))): _*)
        .withColumn("__op", when(col("cnt") === 0, "D").otherwise("U"))
        .withColumn("cnt", when(col("cnt") < 0, raise_error(concat(
            lit("MatView: group count went negative for group '"),
            // the flat group columns survive the projection above
            // (single: the key IS the group column; multi: payloads)
            concat_ws(",", groupCols.map(col(_).cast("string")): _*),
            lit("' — the feed does not match the base history")))
          .cast("long")).otherwise(col("cnt")))
      UpsertSink.applyBatch(spark, viewPath, keyCol, "__seq", "__op",
        payloads, numBuckets)(merged, batchId)
    } finally graft.operators.Dedup.releaseFrame(deltas)
  }

  /** The view, FLAT: the internal `__grp` struct key (multi-column
    * groupings) and the hidden `__n_*` non-null counts dropped —
    * `groupCols…, cnt, sums…` either way. */
  def readView(spark: SparkSession, viewPath: String): DataFrame = {
    val df = UpsertSink.readSnapshot(spark, viewPath)
    df.drop(df.columns.filter(c =>
      c == "__grp" || c.startsWith("__n_")).toIndexedSeq: _*)
  }

  /** The view advanced through EVERY base version still on disk — the
    * catch-up/bootstrap path: folds `readChanges(prev, v, preImages =
    * true)` for each committed version after the view's high-water
    * mark (the view store's own last applied batchId, so catch-up is
    * idempotent and restartable). Returns the number of versions
    * applied. */
  def catchUp(spark: SparkSession, basePath: String, viewPath: String,
              groupCol: String, sumCols: Seq[String],
              numBuckets: Int): Int =
    catchUp(spark, basePath, viewPath, Seq(groupCol), sumCols, numBuckets)

  /** [[catchUp]] with a multi-column grouping (see the
    * `groupCols` [[applyDelta]]). */
  def catchUp(spark: SparkSession, basePath: String, viewPath: String,
              groupCols: Seq[String], sumCols: Seq[String],
              numBuckets: Int): Int = {
    val done = UpsertSink.readManifest(viewPath).map(_.batchId)
    val versions = UpsertSink.snapshotVersions(basePath)
      .filter(v => done.forall(v > _))
    var prev = done.getOrElse(-1L)
    var applied = 0
    versions.foreach { v =>
      val feed = UpsertSink.readChanges(spark, basePath, prev, v,
        preImages = true)
      if (applyDelta(spark, viewPath, groupCols, sumCols, numBuckets)(
          feed, v)) applied += 1
      prev = v
    }
    applied
  }
}
