package graft.streaming

import graft.sources.GraftCatalog
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.G Structured Streaming over the `events` table.
  *
  * Each operator exists twice with shared semantics:
  *  - a batch form (driver-verifiable against the DuckDB oracle);
  *  - a streaming form over an arbitrary streaming Dataset (exercised
  *    in specs with MemoryStream + processAllAvailable).
  * At scale the streaming forms are the real deployment: watermarked
  * windowed aggregation state and per-key session state are bounded
  * by the watermark, so state size tracks the window/gap, not the
  * stream length.
  */
object Events {

  /** events.parquet has carried `ts` as TIMESTAMP(NANOS) (arrives as
    * long nanoseconds under spark.sql.legacy.parquet.nanosAsLong) and as
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (arrives as TimestampNTZ).
    * Normalize both to TimestampType: the session timezone is pinned to
    * UTC, so the NTZ→TZ cast preserves the wall clock exactly, and every
    * downstream consumer (watermarks, java.sql.Timestamp encoders, the
    * DuckDB oracle compare) sees one stable type. Nanos path uses integer
    * `div`, not `/`: double division loses precision above 2^53.
    */
  private[graft] def eventsTable(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = new GraftCatalog(s, dir).table("events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  // ── G1: windowed counts ──

  /** Batch-equivalent: hourly tumbling window per event type. */
  def windowedCountsBatch(s: SparkSession, dir: String): DataFrame =
    eventsTable(s, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(28,6)")).cast("double"), 2).as("total"))
      .orderBy("hour", "event_type")

  /** Streaming form: tumbling 1-hour window + 2-hour watermark. */
  def windowedCountsStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(28,6)")).cast("double"), 2).as("total"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("total"))

  // ── G3: stream-static enrichment join ──

  /** Batch-equivalent: events enriched with the static customer dim. */
  def enrichedCountsBatch(s: SparkSession, dir: String): DataFrame =
    eventsTable(s, dir)
      .join(new GraftCatalog(s, dir).table("customer"),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(28,6)")).cast("double"), 2).as("total"))
      .orderBy("c_mktsegment")

  /** Streaming form: stream-static join (dim broadcast per micro-
    * batch) + running counts per segment.
    */
  def enrichedCountsStream(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .join(customers, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(28,6)")).cast("double"), 2).as("total"))

  /** Streaming dedup: first occurrence per event_id within the
    * watermark horizon.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicates("event_id")

  // ── G6: ingestion dedup (at-most-one event per user/type/hour) ──

  /** Batch-equivalent: the telemetry-style collapse rule — keep the
    * FIRST event (earliest ts, event_id tie-break) per (user_id,
    * event_type, hour). One window shuffle on the dedup key; at scale
    * this is the standard pre-ingestion pass before sessionization.
    */
  def dedupFirstBatch(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"), col("event_type"), date_trunc("hour", col("ts")))
      .orderBy(col("ts"), col("event_id"))
    eventsTable(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_in_group", count(lit(1)).over(
        Window.partitionBy(col("user_id"), col("event_type"), date_trunc("hour", col("ts")))))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_id").as("kept_event_id"), col("n_in_group").cast("long").as("n_in_group"))
      .orderBy("user_id", "event_type", "hour")
  }

  /** Streaming form: `dropDuplicatesWithinWatermark` on the same key —
    * unlike plain dropDuplicates (whose key state lives forever), the
    * within-watermark variant evicts each key's state once the
    * watermark passes it, so state size tracks the horizon, not the
    * stream length. First-arrival wins within the horizon, matching
    * the batch rule whenever each key's duplicates arrive inside one
    * watermark window.
    */
  def dedupFirstStream(events: DataFrame): DataFrame =
    events
      .withColumn("hour", date_trunc("hour", col("ts")))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "hour")

  // ── G5: stream-stream join ──

  /** Watermarked stream-stream inner join: purchases matched to the
    * same user's click within the preceding hour. Both sides buffer
    * bounded state (watermark + time-range condition lets Spark evict).
    */
  def clickToPurchaseStream(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("click_ts", "2 hours")
    val p = purchases.withWatermark("purchase_ts", "2 hours")
    // end-INCLUSIVE window (<= +1h) is intentional for this operator
    // (and its batch twin below): "within the hour" attribution counts
    // a purchase landing exactly on the boundary. B30's interval join
    // is half-open (< end) by design — the two are NOT meant to agree.
    c.join(p,
      col("click_user") === col("purchase_user") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
  }

  /** G5 (LEFT OUTER form): clicks that never convert within the hour
    * must still emit, with null purchase columns. Streaming outer
    * joins only emit the null-padded row once the WATERMARK passes
    * the click's join window (state eviction proves no match can
    * arrive) — so results trail the watermark by design; the spec
    * advances event time to flush them.
    */
  def clickToPurchaseStreamOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("click_ts", "2 hours")
    val p = purchases.withWatermark("purchase_ts", "2 hours")
    c.join(p,
      col("click_user") === col("purchase_user") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
  }

  /** Batch twin of the LEFT OUTER form — the time-range condition
    * lives in the join ON clause (a WHERE would silently drop the
    * null-padded rows and turn it back into an inner join).
    */
  def clickToPurchaseOuterBatch(s: SparkSession, dir: String): DataFrame =
    clickPurchaseBatch(s, dir, "left_outer")

  /** Batch-equivalent of the G5 stream-stream join, over the events
    * table itself: purchases matched to the same user's clicks in the
    * preceding hour. Plans as a hash join keyed on user_id with the
    * time range as a residual filter — the same shape the streaming
    * form's state matching uses, and the scale-correct plan (equi-key
    * shuffle, never a cross product).
    */
  def clickToPurchaseBatch(s: SparkSession, dir: String): DataFrame =
    clickPurchaseBatch(s, dir, "inner")

  /** Shared body of the inner/outer batch twins: ONE definition of
    * the click/purchase sub-selects and the user + end-inclusive
    * hour-window condition, so the two forms cannot drift apart.
    */
  private def clickPurchaseBatch(s: SparkSession, dir: String,
      joinType: String): DataFrame = {
    val ev = eventsTable(s, dir)
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    c.join(p,
        col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
        joinType)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_time"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_time"))
      .orderBy("click_id", "purchase_id")
  }

  // ── G4: streaming sink — foreachBatch into a partitioned layout ──

  /** Stream → hive-partitioned parquet via foreachBatch: each micro-
    * batch appends to the same partitioned layout the batch sink uses,
    * so downstream partition-pruned readers see streaming output
    * identically.
    */
  def streamToPartitionedSink(events: DataFrame, path: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.withColumn("day", to_date(col("ts")))
          .write.mode("append").partitionBy("event_type").parquet(path)
      }
      .start()

  /** G4 (exactly-once form): each micro-batch commits its rows under
    * an isolated `batch_id=N` directory with OVERWRITE semantics, so
    * an at-least-once REPLAY of a batch rewrites its own directory
    * instead of appending duplicates — the file-sink twin of G8's
    * applied-batch ledger, with no ledger needed: the batch id IS the
    * partition. Readers see `batch_id` as one more partition column
    * over the same prune-readable layout (event_type subdirs), and a
    * downstream compaction (A14) can fold batch dirs together once a
    * retention window closes.
    */
  def streamToIdempotentPartitionedSink(events: DataFrame, path: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applyPartitionedBatch(batch, batchId, path)
      }
      .start()

  /** One micro-batch's commit (factored out so idempotence is directly
    * testable: re-applying a batchId leaves the table identical).
    */
  private[graft] def applyPartitionedBatch(
      batch: Dataset[org.apache.spark.sql.Row], batchId: Long, path: String): Unit =
    batch.withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_type")
      .parquet(s"$path/batch_id=$batchId")

  // ── G8: exactly-once incremental summary via foreachBatch ──

  /** Stream → persisted per-type summary maintained incrementally:
    * each micro-batch's PARTIAL aggregate merges into the summary
    * under A20's mergeability rule (unrounded DECIMAL partials, so
    * merge order never matters), and an applied-batch ledger makes
    * the merge IDEMPOTENT: foreachBatch is at-least-once after
    * recovery, and batchIds are monotone per query, so a single
    * max-applied marker (one tiny file, overwritten per batch — O(1)
    * per trigger, never a growing ledger) detects a replayed batchId
    * and skips it; the summary carries exactly-once semantics. The
    * marker lives INSIDE the summary directory and the whole directory
    * commits via stage-then-rename, so summary and marker can never be
    * observed out of step (see applySummaryBatch for the crash-window
    * analysis).
    */
  def incrementalSummarySink(events: DataFrame, root: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applySummaryBatch(batch, batchId, root)
      }
      .start()

  /** One micro-batch's merge step (factored out so the idempotence is
    * directly testable: calling it twice with one batchId is a no-op).
    *
    * Commit protocol (two-phase at directory grain — a naive
    * `overwrite` of the summary path is itself delete-then-write, so a
    * crash mid-overwrite would destroy the WHOLE accumulated summary
    * and the next replayed batch would silently seed a fresh one):
    *  1. write the merged summary to a STAGING directory;
    *  2. write the applied-batchId marker INSIDE the staging dir (its
    *     presence certifies the staged parquet write completed, and it
    *     travels with the data — summary and marker can never be
    *     observed out of step);
    *  3. swap: delete the live dir, rename staging over it.
    * The delete→rename pair is the one non-atomic step left on a raw
    * filesystem; a crash between them leaves no live dir and a FULLY
    * COMMITTED staging dir, which the adoption step at the top of the
    * next call renames into place before reading — no history is lost
    * at any crash point.
    */
  private[graft] def applySummaryBatch(
      batch: Dataset[org.apache.spark.sql.Row], batchId: Long, root: String): Unit = {
    val s = batch.sparkSession
    val sumPath = s"$root/summary.parquet"
    val stagePath = s"$root/summary.staging"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sessionState.newHadoopConf())
    def path(p: String) = new org.apache.hadoop.fs.Path(p)
    def marker(dir: String) = path(s"$dir/_applied_batch")
    def exists(p: String) = fs.exists(path(p))
    // crash recovery: a committed staging dir (marker present) with no
    // live dir means the previous swap died between delete and rename —
    // finish it before reading.
    if (!exists(sumPath) && fs.exists(marker(stagePath)) &&
        !fs.rename(path(stagePath), path(sumPath)))
      throw new IllegalStateException(
        s"[GRAFT] summary swap adoption failed: rename($stagePath -> $sumPath)")
    val maxApplied: Long =
      if (!fs.exists(marker(sumPath))) -1L
      else {
        val in = fs.open(marker(sumPath))
        try in.readLong() finally in.close()
      }
    if (batchId <= maxApplied) return // replayed batch: already applied
    val partial = batch
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).as("total_d"))
    val merged =
      (if (exists(sumPath)) graft.sources.GraftIO.readParquet(s, sumPath).unionByName(partial) else partial)
        .groupBy("event_type")
        .agg(sum(col("n")).as("n"), sum(col("total_d")).cast("decimal(28,6)").as("total_d"))
        .localCheckpoint(true) // the swap deletes the path it reads
    try {
      merged.write.mode("overwrite").parquet(stagePath)
      val out = fs.create(marker(stagePath), true)
      try out.writeLong(batchId) finally out.close()
      fs.delete(path(sumPath), true)
      if (!fs.rename(path(stagePath), path(sumPath)))
        throw new IllegalStateException(
          s"[GRAFT] summary swap commit failed: rename($stagePath -> $sumPath)")
    } finally graft.GraftSession.releaseCheckpoint(merged)
  }

  // ── G29: streaming CDC fold (A50's consumer as a live stream) ──

  /** A `graft-feed` stream maintains a persisted rollup of a MUTATING
    * merge-on-read table: each micro-batch's I images ADD their
    * partials and its D images SUBTRACT (GraftMor's signed-delta fold
    * — order-free SET semantics, so segment/batch boundaries never
    * matter), under G8's exactly-once commit protocol verbatim (stage
    * → in-staging batchId marker → delete+rename swap, crashed-swap
    * adoption, max-applied replay skip). The closing of the A49 loop:
    * a table mutated by SQL DML becomes a SUBSCRIBABLE stream whose
    * downstream rollup is at most one trigger behind, at churn cost —
    * the Delta-CDF-streaming shape. `partialAgg` must emit a row count
    * named `n` (the A46/A50 additive-partial contract).
    */
  def morFeedFoldSink(feedStream: DataFrame, root: String,
      groupCols: Seq[String], partialAgg: DataFrame => DataFrame)
      : org.apache.spark.sql.streaming.StreamingQuery =
    feedStream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applyMorFeedFoldBatch(batch, batchId, root, groupCols, partialAgg)
      }
      .start()

  /** One batch's signed merge (factored out so idempotence is directly
    * testable); the rollup lives at `<root>/rollup.parquet`.
    */
  private[graft] def applyMorFeedFoldBatch(
      batch: Dataset[org.apache.spark.sql.Row], batchId: Long, root: String,
      groupCols: Seq[String], partialAgg: DataFrame => DataFrame): Unit = {
    val s = batch.sparkSession
    val livePath = s"$root/rollup.parquet"
    val stagePath = s"$root/rollup.staging"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sessionState.newHadoopConf())
    def path(p: String) = new org.apache.hadoop.fs.Path(p)
    def marker(dir: String) = path(s"$dir/_applied_batch")
    if (!fs.exists(path(livePath)) && fs.exists(marker(stagePath)) &&
        !fs.rename(path(stagePath), path(livePath)))
      throw new IllegalStateException(
        s"[GRAFT] feed-fold swap adoption failed: rename($stagePath -> $livePath)")
    val maxApplied: Long =
      if (!fs.exists(marker(livePath))) -1L
      else {
        val in = fs.open(marker(livePath))
        try in.readLong() finally in.close()
      }
    if (batchId <= maxApplied) return // replayed batch: already applied
    val parts = Seq.newBuilder[DataFrame]
    if (fs.exists(path(livePath))) parts += graft.sources.GraftIO.readParquet(s, livePath)
    parts += partialAgg(batch.where(col("change_type") === "I")
      .drop("change_type"))
    parts += graft.sources.GraftMor.negatePartials(
      partialAgg(batch.where(col("change_type") === "D")
        .drop("change_type")),
      groupCols)
    val merged = graft.sources.GraftMor.foldPartials(parts.result(), groupCols)
      .localCheckpoint(true) // the swap deletes the path this read
    try {
      merged.write.mode("overwrite").parquet(stagePath)
      val out = fs.create(marker(stagePath), true)
      try out.writeLong(batchId) finally out.close()
      fs.delete(path(livePath), true)
      if (!fs.rename(path(stagePath), path(livePath)))
        throw new IllegalStateException(
          s"[GRAFT] feed-fold swap commit failed: rename($stagePath -> $livePath)")
    } finally graft.GraftSession.releaseCheckpoint(merged)
  }

  // ── G17: streaming MV maintenance (B69's rollup fed by a stream) ──

  /** A micro-batch stream maintains a B69 MATERIALIZED VIEW: each
    * batch's partial rollup (`GraftMv.mvFrameOf` — the same
    * expressions the rewrite rule assumes, so stream and batch can
    * never drift) merges into the persisted MV via
    * `GraftMv.mergeRollups`, under G8's exactly-once commit protocol
    * verbatim (stage → in-staging batchId marker → delete+rename
    * swap, crashed-swap adoption, max-applied replay skip — summed
    * partials NEED the ledger, unlike G13's absolute upserts). The
    * closing of the loop: A30 feeds changes, B69 serves rewrites,
    * and this keeps the rollup current against a LIVE stream — a
    * dashboard query written against the base table reads an MV that
    * is at most one trigger behind, and the fact scan never happens.
    */
  def mvMaintenanceSink(stream: DataFrame, d: graft.plans.GraftMv.MvDef,
      root: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applyMvBatch(batch, batchId, d, root)
      }
      .start()

  /** One batch's merge (factored out for direct replay/crash tests);
    * the MV lives at `<root>/mv.parquet`.
    */
  private[graft] def applyMvBatch(batch: Dataset[org.apache.spark.sql.Row],
      batchId: Long, d: graft.plans.GraftMv.MvDef, root: String): Unit = {
    val s = batch.sparkSession
    val mvPath = s"$root/mv.parquet"
    val stagePath = s"$root/mv.staging"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sessionState.newHadoopConf())
    def path(p: String) = new org.apache.hadoop.fs.Path(p)
    def marker(dir: String) = path(s"$dir/_applied_batch")
    if (!fs.exists(path(mvPath)) && fs.exists(marker(stagePath)) &&
        !fs.rename(path(stagePath), path(mvPath)))
      throw new IllegalStateException(
        s"[GRAFT] MV swap adoption failed: rename($stagePath -> $mvPath)")
    val maxApplied: Long =
      if (!fs.exists(marker(mvPath))) -1L
      else {
        val in = fs.open(marker(mvPath))
        try in.readLong() finally in.close()
      }
    if (batchId <= maxApplied) return
    val partial = graft.plans.GraftMv.mvFrameOf(batch.toDF(), d)
    val merged =
      (if (fs.exists(path(mvPath)))
        graft.plans.GraftMv.mergeRollups(graft.sources.GraftIO.readParquet(s, mvPath), partial, d)
      else partial)
        .localCheckpoint(true) // the swap deletes the path it reads
    try {
      merged.write.mode("overwrite").parquet(stagePath)
      val out = fs.create(marker(stagePath), true)
      try out.writeLong(batchId) finally out.close()
      fs.delete(path(mvPath), true)
      if (!fs.rename(path(stagePath), path(mvPath)))
        throw new IllegalStateException(
          s"[GRAFT] MV swap commit failed: rename($stagePath -> $mvPath)")
    } finally graft.GraftSession.releaseCheckpoint(merged)
  }

  // ── G18: streaming WRITE-AUDIT-PUBLISH ingest ──

  /** A38's staged-commit gate as a STREAMING sink: every micro-batch
    * lands in its own `batch_id=N` dir inside the catalog table
    * (G9's idempotent-overwrite file layout), then
    * `GraftCatalog.publishAudited` audits EVERYTHING unpublished and
    * publishes iff clean. A dirty batch is DIVERTED: its quarantine
    * manifest (violating rows + fired-rule csv) is persisted for
    * review and the batch dir moves to `<root>/_quarantine/<name>/`,
    * so the published log never sees it AND the stream keeps flowing
    * (a poison batch must not wedge the pipeline — unlike the batch
    * gate's sticky-rejection, which is the right semantics when a
    * human drives the retry).
    *
    * Exactly-once: the batch write is a deterministic per-batchId
    * overwrite; a replay of a published batch finds nothing staged
    * (publishAudited returns the existing tip, no duplicate epoch);
    * a replay of a quarantined batch sees its quarantine dir and
    * no-ops. A crash between land and publish leaves the batch
    * staged — the NEXT batch's audit covers it and both publish
    * together (audit scope is everything unpublished, A38's rule).
    */
  def auditedIngestSink(stream: DataFrame, root: String, name: String,
      rules: Seq[graft.sources.GraftCatalog.AuditRule])
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applyAuditedBatch(batch, batchId, root, name, rules)
      }
      .start()

  private[graft] def applyAuditedBatch(
      batch: Dataset[org.apache.spark.sql.Row], batchId: Long, root: String,
      name: String, rules: Seq[graft.sources.GraftCatalog.AuditRule]): Unit = {
    val s = batch.sparkSession
    val tableDir = s"$root/$name.parquet"
    val batchDir = s"$tableDir/batch_id=$batchId"
    val qRoot = s"$root/_quarantine/$name"
    val qDir = s"$qRoot/batch_id=$batchId"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sessionState.newHadoopConf())
    def path(p: String) = new org.apache.hadoop.fs.Path(p)
    if (fs.exists(path(qDir))) return // replayed quarantined batch
    // replayed PUBLISHED batch: its dir's files are pinned by the tip
    // manifest — rewriting them (fresh part-file names) would orphan
    // the manifest; recognize and no-op instead
    val cat0 = new graft.sources.GraftCatalog(s, root)
    val published: Set[String] = cat0.snapshotIds(name).lastOption
      .map(id => cat0.snapshotFilesAsOf(name, id).toSet).getOrElse(Set.empty)
    if (fs.exists(path(batchDir))) {
      val files = fs.listStatus(path(batchDir)).toSeq.map(_.getPath.toString)
        .filter(_.endsWith(".parquet"))
      if (files.nonEmpty && files.forall(published.contains)) return
    }
    batch.write.mode(SaveMode.Overwrite).parquet(batchDir)
    new graft.sources.GraftCatalog(s, root).publishAudited(name, rules) match {
      case Right(_) => ()
      case Left(quarantine) =>
        // manifest FIRST (it reads from the staged files), then divert
        quarantine.write.mode(SaveMode.Overwrite)
          .parquet(s"$qRoot/manifest_batch_$batchId.parquet")
        fs.mkdirs(path(qRoot))
        // rename returns FALSE on failure without throwing: swallowing
        // it would leave the dirty batch staged after offsets commit,
        // and every later publish would audit-fail on it — the exact
        // poison-batch wedge this sink exists to prevent. Throw so the
        // batch replays (offsets uncommitted) and tries the diversion
        // again.
        if (!fs.rename(path(batchDir), path(qDir)))
          throw new IllegalStateException(
            s"[GRAFT] quarantine diversion failed: rename($batchDir -> $qDir) " +
              "returned false; failing the batch so it replays")
    }
  }

  // ── G21: streaming ingestion DRIFT monitor ──

  /** The corpus-wide drift baseline as a one-row driver artifact —
    * trained in batch on the historical corpus (the same class as
    * broadcast centroids / eval span hashes), shipped to the sink.
    */
  def driftBaseline(s: org.apache.spark.sql.SparkSession, dir: String): Long =
    graft.operators.TextAnalysis.ingestDrift(s, dir)
      .select("base_mean_micro").head().getLong(0)

  /** G21: E19's drift profile as an INGESTION ALARM — each
    * micro-batch's mean-token stat (the identical floor-micro integer
    * arithmetic as the batch twin) is checked against the historical
    * baseline; a batch deviating more than 30% writes ONE alert row
    * into `$root/alerts/batch_id=N` — exactly-once by the G4 rule
    * (the batch id IS the partition; a replay overwrites, never
    * duplicates) — and clean batches pass silently. This is the
    * monitor that pages a crawl operator the HOUR a parser breaks or
    * a source floods boilerplate, instead of a training run later.
    * Map-side per-doc stats + one count/sum aggregate per batch: no
    * state store, no watermark, no shuffle beyond the tiny aggregate.
    */
  def driftMonitorSink(docs: DataFrame, root: String, baseMeanMicro: Long)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyDriftBatch(b, id, root, baseMeanMicro)
      }
      .start()

  private[graft] def applyDriftBatch(
      batch: Dataset[org.apache.spark.sql.Row], batchId: Long,
      root: String, baseMeanMicro: Long): Unit = {
    import graft.functions.TextFns
    val agg = batch.toDF()
      .select(size(TextFns.tokensLower(col("text"))).cast("long").as("nt"))
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("tokens"),
        expr("(sum(nt) * 1000000L) div greatest(count(1), 1L)")
          .as("mean_tokens_micro"))
      .head()
    if (agg.getLong(0) == 0L) return // empty batch: nothing to judge
    val mean = agg.getLong(2)
    if (math.abs(mean - baseMeanMicro) * 10L > baseMeanMicro * 3L) {
      val s = batch.sparkSession
      import s.implicits._
      Seq((agg.getLong(0), agg.getLong(1), mean, baseMeanMicro))
        .toDF("n_docs", "tokens", "mean_tokens_micro", "base_mean_micro")
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$root/alerts/batch_id=$batchId")
    }
  }

  // ── G23: streaming perplexity filter (the CCNet gate, online) ──

  /** E21's persisted perplexity model as an INGESTION FILTER — the
    * online form of CCNet's head/middle/tail cut: each micro-batch's
    * docs are scored against the FROZEN model artifact (word table +
    * pinned OOV penalty + pinned tercile cutoffs — train-time state,
    * the G22 baseline rule: the filter's notion of "head" must not
    * drift with what flows through it), head+middle docs land in
    * `accepted/batch_id=N`, tail docs — including wordless docs and
    * out-of-domain docs driven tailward by the OOV penalty — in
    * `rejected/batch_id=N`, both carrying their scores for audit.
    * Exactly-once by the G4 rule (the batch id IS the partition;
    * replay overwrites, never duplicates). Per-batch cost is one
    * tokenize of the batch + one join against the model words — the
    * training corpus never re-enters; no state store, no watermark.
    */
  def perplexityGateSink(docs: DataFrame, modelPath: String, root: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyPerplexityGateBatch(b, id, modelPath, root)
      }
      .start()

  private[graft] def applyPerplexityGateBatch(
      batch: Dataset[org.apache.spark.sql.Row], batchId: Long,
      modelPath: String, root: String): Unit = {
    val s = batch.sparkSession
    val b = batch.toDF().localCheckpoint(true) // scored twice below
    try if (!b.isEmpty) {
      val scored = graft.operators.TextAnalysis
        .perplexityModelScore(s, modelPath, b.select("doc_id", "text"))
      val tagged = b.join(scored, Seq("doc_id"), "left")
        .select(b.columns.map(col) ++ Seq(
          coalesce(col("n_words"), lit(0L)).as("n_words"),
          coalesce(col("avg_lp_micro"), lit(0L)).as("avg_lp_micro"),
          coalesce(col("ppl_bucket"), lit(2L)).as("ppl_bucket")): _*)
      tagged.where(col("ppl_bucket") <= 1L)
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$root/accepted/batch_id=$batchId")
      tagged.where(col("ppl_bucket") === 2L || col("n_words") === 0L)
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$root/rejected/batch_id=$batchId")
    } finally graft.GraftSession.releaseCheckpoint(b)
  }

  // ── G24: streaming merge-on-read upsert (the CDC fast path) ──

  /** A43's merge-on-read upsert as a STREAMING sink — the
    * high-frequency half of the CDC-apply story. A39's durable
    * consumer applies segments with a staged COW swap (right for
    * low-frequency, large deltas); this sink applies each micro-batch
    * as two O(batch) writes (tombstone epoch + append), so a
    * per-minute correction stream cannot wedge a 100 TB table in
    * rewrite churn — compaction is deferred to the A34 advisor's
    * `mor-compact` signal. Exactly-once via applied-batch markers
    * (`_dv_applied/batch_id=N`, underscore-hidden from data scans): a
    * replayed marked batch is a PHYSICAL no-op. The marker lands
    * AFTER the apply; a crash inside the window makes the replay
    * re-apply, which is CONTENT-idempotent by A43's chaining rule
    * (the retry tombstones the first attempt's appended versions and
    * appends identical rows) — the failure window degrades to
    * physical churn, never to duplicates served. In-batch duplicate
    * keys keep one deterministic struct-min survivor (the G19 rule).
    */
  def morUpsertSink(updates: DataFrame, tablePath: String,
      keyCols: Seq[String]): org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyMorUpsertBatch(b, id, tablePath, keyCols)
      }
      .start()

  private[graft] def applyMorUpsertBatch(
      batch: Dataset[org.apache.spark.sql.Row], batchId: Long,
      tablePath: String, keyCols: Seq[String]): Unit = {
    val s = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(tablePath)
      .getFileSystem(s.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(
      s"$tablePath/_dv_applied/batch_id=$batchId")
    if (fs.exists(marker)) return // replay of an applied batch: no-op
    val b = batch.toDF().localCheckpoint(true) // keys + append below
    try if (!b.isEmpty) {
      val rest = b.columns.filterNot(keyCols.contains)
      val deduped = b.groupBy(keyCols.map(col): _*)
        .agg(min(struct(rest.map(col): _*)).as("__rest"))
        .select(keyCols.map(col) ++
          rest.map(c => col(s"__rest.$c").as(c)): _*)
      graft.sources.GraftMor.morUpsert(s, tablePath, deduped, keyCols)
    } finally graft.GraftSession.releaseCheckpoint(b)
    if (!fs.mkdirs(marker)) throw new IllegalStateException(
      s"[GRAFT] morUpsertSink failed to record applied marker $marker")
  }

  // ── G25: streaming sequence-numbered equality upsert (zero-read CDC) ──

  /** A45's equality upsert as a STREAMING sink — the Flink-CDC-into-
    * Iceberg ingestion shape, and the only CDC apply whose per-batch
    * cost reads ZERO table bytes: each micro-batch writes a key
    * tombstone at the commit's sequence number plus the new versions
    * as manifest-sequenced appends (two O(batch) writes + an O(files)
    * listing — G24's position sink still pays a discovery scan per
    * batch). Exactly-once via applied-batch markers
    * (`_eq_applied/batch_id=N`): a replayed marked batch is a PHYSICAL
    * no-op. A crash inside the marker window makes the replay
    * re-apply, which is CONTENT-idempotent by the sequence rule: the
    * retry's higher sequence masks every row the crashed attempt
    * appended — including orphans that died before their manifest
    * write landed, which sequence as base files (0) and are masked by
    * any finite tombstone. In-batch duplicate keys keep one
    * deterministic struct-min survivor (the G19 rule).
    */
  def morUpsertEqSink(updates: DataFrame, tablePath: String,
      keyCols: Seq[String], compactDebtBudget: Long = 0L,
      partitionCols: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyMorUpsertEqBatch(b, id, tablePath, keyCols,
          compactDebtBudget, partitionCols)
      }
      .start()

  private[graft] def applyMorUpsertEqBatch(
      batch: Dataset[org.apache.spark.sql.Row], batchId: Long,
      tablePath: String, keyCols: Seq[String],
      compactDebtBudget: Long = 0L, partitionCols: Seq[String] = Nil)
      : Unit = {
    val s = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(tablePath)
      .getFileSystem(s.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(
      s"$tablePath/_eq_applied/batch_id=$batchId")
    if (fs.exists(marker)) return // replay of an applied batch: no-op
    val b = batch.toDF().localCheckpoint(true) // keys + append below
    try if (!b.isEmpty) {
      val rest = b.columns.filterNot(keyCols.contains)
      val deduped = b.groupBy(keyCols.map(col): _*)
        .agg(min(struct(rest.map(col): _*)).as("__rest"))
        .select(keyCols.map(col) ++
          rest.map(c => col(s"__rest.$c").as(c)): _*)
      graft.sources.GraftMor.morUpsertEq(s, tablePath, deduped, keyCols)
    } finally graft.GraftSession.releaseCheckpoint(b)
    if (!fs.mkdirs(marker)) throw new IllegalStateException(
      s"[GRAFT] morUpsertEqSink failed to record applied marker $marker")
    // G26: MAINTENANCE IN THE LOOP — the A34 mor-compact signal acted
    // on between batches instead of waiting for an operator: once the
    // footer-metered tombstone debt passes the budget, fold the
    // sidecars right here. AFTER the marker on purpose (maintenance
    // is orthogonal to exactly-once: a crash mid-compact replays into
    // a marked no-op apply and the debt re-triggers on a later
    // batch), and SKIPPED while a reader lease is live (the A24
    // contract: compaction is the one MOR op that unlinks files) —
    // the debt simply carries to the next batch.
    if (compactDebtBudget > 0L &&
        graft.sources.GraftMor.tombstoneDebt(s, tablePath) > compactDebtBudget &&
        graft.sources.GraftLease.activeHolders(s, tablePath).isEmpty)
      graft.sources.GraftMor.morCompact(s, tablePath, partitionCols)
  }

  // ── G9: ingestion-time curation gate (quality + decontamination) ──

  /** The C7 quality + C9 decontamination gates applied to a DOCUMENT
    * STREAM at ingestion — entirely MAP-SIDE: quality metrics are
    * per-row expressions, and the eval-set membership probe runs
    * against a broadcast sorted span-hash array inside a native
    * expression (`ArrayOverlapCountExpr`), so the gate needs NO
    * watermark, NO state store, and NO shuffle — the only shape that
    * keeps an ingestion pipeline at line rate. (The batch path's
    * broadcast semi join is the scale form for huge eval sets; an
    * eval set is by nature small — the same class of driver artifact
    * as k-means centroids.) Gates mirror the batch pipeline exactly:
    * ≥10 tokens, ≥30% distinct, and <10% span overlap with the eval
    * set — an eval doc itself streams in at 100% overlap and is
    * dropped, matching the batch pipeline's exclusion of bench docs.
    */
  def curationGateStream(docs: DataFrame, evalSpanHashes: Array[Long]): DataFrame = {
    import graft.functions.TextFns
    val qToks = split(trim(col("text")), "\\s+")
    docs
      .withColumn("n_toks", size(qToks))
      .withColumn("n_distinct", size(array_distinct(qToks)))
      .where(col("n_toks") >= 10 && col("n_distinct") * 10 >= col("n_toks") * 3)
      .withColumn("ghs", TextFns.wordSpanHashes(
        expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)"),
        graft.operators.Dedup.SpanWords))
      .withColumn("n_spans", size(col("ghs")).cast("long"))
      .withColumn("n_overlap", TextFns.spanOverlapCount(col("ghs"), evalSpanHashes))
      .where(!(col("n_spans") > 0 && col("n_overlap") * 10 >= col("n_spans")))
      .drop("ghs", "n_distinct")
  }

  /** G9 + E9: the curation gate ALSO emitting each surviving doc's
    * BPE token count, so the ingest path produces counts consistent
    * with the batch tokenizer feeding H1's packing. The codec is a
    * driver artifact trained in BATCH on the hash sample (same class
    * as the eval span hashes: small, deterministic, shipped with the
    * plan), and the count is E9's native memoized expression — so the
    * extended gate stays map-only, zero state, zero shuffle, and its
    * counts are BYTE-IDENTICAL to `text_bpe_tokens` (parity spec).
    */
  def curationGateWithTokens(docs: DataFrame, evalSpanHashes: Array[Long],
      codec: graft.functions.BpeCodec): DataFrame = {
    import graft.operators.BpeTokenizer
    curationGateStream(docs, evalSpanHashes)
      .withColumn("bpe_tokens",
        BpeTokenizer.bpeTokenCount(BpeTokenizer.words(col("text")), codec))
  }

  // ── G13: streaming heavy hitters ──

  /** Batch twin: top-k users by event count (TakeOrdered — the
    * tree-reduced top-k, never a SinglePartition sort).
    */
  def topUsersBatch(s: SparkSession, dir: String, k: Int = 10): DataFrame =
    eventsTable(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).limit(k)

  /** G13: streaming heavy hitters — a continuously-maintained top-k
    * leaderboard over the event stream. The per-user counts live in
    * the ENGINE's aggregation state (update mode emits each changed
    * user's new ABSOLUTE total per micro-batch); the sink mirrors
    * those totals into a durable counts table and re-derives the
    * top-k from the full mirror — never from the previous top-k, so a
    * user RISING from outside the leaderboard is handled correctly
    * (the failure mode of naive top-k-only maintenance; spec plants
    * exactly this). Exactly-once falls out of the algebra: the merge
    * is an absolute-value UPSERT keyed by user, so a replayed batch
    * overwrites identical values — idempotent with no batch ledger
    * (contrast G8, whose summed partials NEED the applied-batch
    * marker). Scale: per batch the sink touches |changed users| +
    * |mirror| rows — the mirror is the same compaction-style artifact
    * as A14's, partitionable by user hash; the engine state is
    * RocksDB-backed per-key counts, O(users), no watermark needed
    * (counts are monotone, nothing is evicted).
    */
  def heavyHittersSink(events: DataFrame, root: String, k: Int = 10)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        applyHeavyHitterBatch(batch, root, k)
      }
      .start()

  /** One micro-batch's upsert + re-publish (factored out so replay
    * idempotence is directly testable). Same stage-then-rename commit
    * as G8 (marker certifies the staged write; adoption finishes a
    * swap that died between delete and rename) — but the marker
    * carries no batchId: replays are harmless by construction.
    */
  private[graft] def applyHeavyHitterBatch(
      batch: Dataset[org.apache.spark.sql.Row], root: String, k: Int): Unit = {
    val s = batch.sparkSession
    val cntPath = s"$root/counts.parquet"
    val stagePath = s"$root/counts.staging"
    val topPath = s"$root/topk.parquet"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sessionState.newHadoopConf())
    def path(p: String) = new org.apache.hadoop.fs.Path(p)
    def marker(dir: String) = path(s"$dir/_committed")
    if (!fs.exists(path(cntPath)) && fs.exists(marker(stagePath)) &&
        !fs.rename(path(stagePath), path(cntPath)))
      throw new IllegalStateException(
        s"[GRAFT] counts swap adoption failed: rename($stagePath -> $cntPath)")
    val changed = batch.select(col("user_id"), col("n"))
    val merged =
      (if (fs.exists(path(cntPath)))
        graft.sources.GraftIO.readParquet(s, cntPath)
          .join(changed.select(col("user_id").as("cu")),
            col("user_id") === col("cu"), "left_anti")
          .unionByName(changed)
      else changed)
        .localCheckpoint(true) // the swap deletes the path it reads
    try {
      merged.write.mode("overwrite").parquet(stagePath)
      val out = fs.create(marker(stagePath), true)
      try out.writeLong(0L) finally out.close()
      fs.delete(path(cntPath), true)
      if (!fs.rename(path(stagePath), path(cntPath)))
        throw new IllegalStateException(
          s"[GRAFT] counts swap commit failed: rename($stagePath -> $cntPath)")
      merged.orderBy(col("n").desc, col("user_id")).limit(k)
        .write.mode("overwrite").parquet(topPath)
    } finally graft.GraftSession.releaseCheckpoint(merged)
  }

  // ── G16: exactly-once streaming upsert into an EXTERNAL system ──

  /** G16: the G13 leaderboard semantics pointed at an external JDBC
    * database (the A23 entry: embedded Derby by default, any
    * configured `spark.graft.jdbc.url` in production) — the shape a
    * pipeline uses to keep a serving store in sync with a stream.
    * Exactly-once to a system that offers only transactions, no
    * file-swap tricks: update mode emits each changed user's new
    * ABSOLUTE total; the sink upserts per key (DELETE+INSERT inside
    * one transaction per partition). Replayed batches rewrite
    * identical absolute values — idempotent with no batch ledger
    * (G13's algebra); a crash mid-batch leaves some partitions
    * committed and some not, and the at-least-once replay completes
    * exactly the missing ones. Per batch the store sees |changed
    * keys| row operations, never a full mirror rewrite.
    */
  def jdbcCountsSink(events: DataFrame, table: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val s = events.sparkSession
    ensureCountsTable(s, table)
    events
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        applyJdbcCountsBatch(batch, table)
      }
      .start()
  }

  private[graft] def ensureCountsTable(s: SparkSession, table: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(
      graft.sources.GraftJdbc.url(s), graft.sources.GraftJdbc.connectionProperties(s))
    try {
      // probe via DatabaseMetaData instead of swallowing a
      // backend-specific "already exists" SQLState (Derby X0Y32,
      // Postgres 42P07, ...) — the sink restarts against any backend
      // the configured JDBC url names. Table names surface in
      // metadata in backend case (Derby upper-cases unquoted
      // identifiers), so match case-insensitively.
      val exists = {
        val rs = conn.getMetaData.getTables(null, null, null,
          Array("TABLE"))
        try {
          var found = false
          while (!found && rs.next())
            found = rs.getString("TABLE_NAME").equalsIgnoreCase(table)
          found
        } finally rs.close()
      }
      if (!exists) {
        val st = conn.createStatement()
        try st.executeUpdate(
          s"CREATE TABLE $table (user_id BIGINT PRIMARY KEY, n BIGINT NOT NULL)")
        finally st.close()
      }
    } finally conn.close()
  }

  /** One micro-batch's transactional per-key upsert (factored out so
    * replay idempotence is directly testable). The JDBC url string is
    * captured OUTSIDE the executor closure — a SparkSession doesn't
    * serialize.
    */
  private[graft] def applyJdbcCountsBatch(
      batch: Dataset[org.apache.spark.sql.Row], table: String): Unit = {
    val url = graft.sources.GraftJdbc.url(batch.sparkSession)
    val props = graft.sources.GraftJdbc.connectionProperties(batch.sparkSession)
    batch.select(col("user_id").cast("long"), col("n").cast("long"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val conn = java.sql.DriverManager.getConnection(url, props)
          try {
            conn.setAutoCommit(false)
            val del = conn.prepareStatement(s"DELETE FROM $table WHERE user_id = ?")
            val ins = conn.prepareStatement(s"INSERT INTO $table VALUES (?, ?)")
            try {
              rows.foreach { r =>
                del.setLong(1, r.getLong(0)); del.executeUpdate()
                ins.setLong(1, r.getLong(0)); ins.setLong(2, r.getLong(1))
                ins.executeUpdate()
              }
              conn.commit()
            } catch {
              case t: Throwable => conn.rollback(); throw t
            } finally { del.close(); ins.close() }
          } finally conn.close()
        }
      }
  }

  // ── G10: file-stream source end to end ──

  /** G10: the source→gate→sink loop on REAL FILES, no MemoryStream —
    * `readStream` over the hive-partitioned document layout the batch
    * sink (A7) writes, through the G9 zero-state curation gate, into
    * the G4-style exactly-once `batch_id=N` sink. `maxFilesPerTrigger`
    * bounds each micro-batch, so a landed corpus replays incrementally
    * exactly as a live feed would; the checkpoint makes the SOURCE
    * exactly-once (each file consumed once across restarts) and the
    * per-batch overwrite dir makes the SINK idempotent under
    * at-least-once foreachBatch replay — together, end-to-end
    * exactly-once from directory listing to curated table. At scale
    * this is the shape that ingests a continuously-landing 100 TB
    * corpus drop by drop, with the gate running map-only at line rate.
    */
  def fileStreamCuration(s: SparkSession, layoutDir: String,
      evalSpanHashes: Array[Long], sinkDir: String, filesPerTrigger: Int = 2)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // one driver-side batch peek for the schema (incl. partition cols)
    val schema = graft.sources.GraftIO.readParquet(s, layoutDir).schema
    val docs = s.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(layoutDir)
    curationGateStream(docs, evalSpanHashes)
      .writeStream
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applyCuratedDocBatch(batch, batchId, sinkDir)
      }
      .start()
  }

  /** One curated micro-batch's commit — same exactly-once rule as
    * applyPartitionedBatch (the batch id IS the partition; replay
    * overwrites instead of duplicating), doc-shaped: curated docs
    * land partitioned by source under their batch dir.
    */
  private[graft] def applyCuratedDocBatch(
      batch: Dataset[org.apache.spark.sql.Row], batchId: Long, path: String): Unit =
    batch.write.mode("overwrite").partitionBy("source")
      .parquet(s"$path/batch_id=$batchId")

  // ── G12: streaming sequence packing ──

  case class PackEv(source: String, bucket: Long, doc_id: Long, tokens: Long)
  case class PackedDoc(source: String, bucket: Long, doc_id: Long, seq_no: Long)

  /** G12: H1's sequence packing at INGEST — each (source, bucket)
    * keeps one Long of state (the running token count) and every
    * arriving doc is assigned its training window `running div
    * SeqLen` the moment it lands, exactly the batch rule
    * `(running − tokens) div SeqLen`. State is O(buckets) — a counter
    * per parallelism unit, not per doc — and never evicted (a bucket
    * is an append-only packing lane; the counter IS its durable
    * cursor). Within a micro-batch the group's docs sort by doc_id;
    * cross-batch determinism needs per-bucket in-order delivery, the
    * same contract the batch form's doc_id window encodes (parity
    * spec replays the corpus in order across several batches and
    * matches the batch packing per doc).
    */
  def packingStream(docs: Dataset[PackEv]): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(e => (e.source, e.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (String, Long), evs: Iterator[PackEv], state: GroupState[Long]) => {
          var cum = state.getOption.getOrElse(0L)
          val out = evs.toSeq.sortBy(_.doc_id).map { e =>
            val assigned = PackedDoc(e.source, e.bucket, e.doc_id, cum / graft.operators.Assembly.SeqLen)
            cum += e.tokens
            assigned
          }
          state.update(cum)
          out.iterator
        })
  }

  // ── G2: sessionization (30-minute inactivity gap) ──

  val GapSeconds = 1800L

  /** Batch-equivalent: lag-based session starts, counted per user. */
  def sessionizeBatch(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    eventsTable(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             col("ts") > col("prev_ts") + expr(s"INTERVAL $GapSeconds SECONDS"), 1)
          .otherwise(0))
      .groupBy("user_id")
      .agg(sum("new_session").cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** G2 (native form): Spark's built-in `session_window` — one row per
    * (user, session) with the window bounds. Boundary semantics differ
    * from the lag-based form by one instant: session_window merges
    * events whose [ts, ts+gap) intervals OVERLAP, so a gap of exactly
    * `GapSeconds` starts a new session (end-exclusive), where the
    * lag form keeps it (`>` test). The oracle mirrors the
    * session_window semantics (`>=` on the gap test).
    */
  def sessionWindowBatch(s: SparkSession, dir: String): DataFrame =
    eventsTable(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), s"$GapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  /** Streaming form of the native session window: watermark bounds the
    * open-session state; Spark emits a session once the watermark
    * passes its end (append mode). This is the declarative twin of
    * `sessionizeStream` — no user state class, merge logic inside the
    * engine's session-window exec.
    */
  def sessionWindowStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), s"$GapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  case class Ev(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Long, nSessions: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Watermark delay shared by the stateful per-user operators: how
    * long after its event time a record may still arrive.
    */
  val StateWatermarkDelay = "2 hours"

  /** Streaming form: per-user session state via mapGroupsWithState.
    * Emits the running (n_sessions, n_events) per user on every
    * trigger; state is one small struct per active user.
    */
  case class FunnelEv(user_id: Long, event_type: String, ts: java.sql.Timestamp)
  case class FunnelState(t1: Long, t2: Long, t3: Long)
  case class UserFunnel(user_id: Long, funnel_level: Int)

  private val FunnelWindowMicros = 24L * 3600 * 1000000L
  private val FunnelUnset = Long.MinValue
  private val FunnelStepRank = Map("view" -> 0, "click" -> 1, "purchase" -> 2)

  private def micros(t: java.sql.Timestamp): Long =
    (t.getTime / 1000) * 1000000L + t.getNanos / 1000

  private def funnelLevel(st: FunnelState): Int =
    if (st.t3 != FunnelUnset) 3 else if (st.t2 != FunnelUnset) 2
    else if (st.t1 != FunnelUnset) 1 else 0

  /** Advance one user's greedy funnel state by a batch of events
    * (shared by the Update-mode and the append-only final forms so the
    * two cannot drift).
    */
  private def advanceFunnel(st0: FunnelState, evs: Iterator[FunnelEv]): FunnelState = {
    var st = st0
    evs.toSeq
      .filter(e => FunnelStepRank.contains(e.event_type))
      .sortBy(e => (micros(e.ts), FunnelStepRank(e.event_type)))
      .foreach { e =>
        val t = micros(e.ts)
        if (e.event_type == "view" && st.t1 == FunnelUnset)
          st = st.copy(t1 = t)
        else if (e.event_type == "click" && st.t1 != FunnelUnset &&
                 st.t2 == FunnelUnset && t >= st.t1 && t <= st.t1 + FunnelWindowMicros)
          st = st.copy(t2 = t)
        else if (e.event_type == "purchase" && st.t2 != FunnelUnset &&
                 st.t3 == FunnelUnset && t >= st.t2 && t <= st.t1 + FunnelWindowMicros)
          st = st.copy(t3 = t)
      }
    st
  }

  /** State-eviction deadline for a funnel state: once the WATERMARK
    * passes the anchor's 24h window the state can never change again
    * (every transition requires t <= t1+24h), so it is final — emit
    * and drop. An un-anchored state (events but no view yet) gets the
    * same horizon measured from the current watermark so it cannot
    * linger forever. `max(_, wm+1)` keeps the timestamp legal when the
    * anchor's window already closed behind the watermark.
    */
  private def funnelDeadlineMs(st: FunnelState, wmMs: Long): Long = {
    val base = if (st.t1 != FunnelUnset) st.t1 / 1000 else wmMs
    math.max(base + FunnelWindowMicros / 1000, wmMs + 1)
  }

  /** G7: streaming twin of Behavioral.qFunnelConversion — per-user
    * greedy earliest-anchor funnel state (three timestamps) advanced
    * by mapGroupsWithState. Emits the user's current funnel level on
    * every trigger (Update mode). State is O(1) per active user AND
    * bounded in COUNT: with `EventTimeTimeout`, a state whose 24h
    * anchor window has passed the watermark is emitted one final time
    * and dropped — on a continuous stream the store holds only users
    * whose windows are still open, not every user ever seen. After
    * eviction a returning user starts a NEW funnel journey (the
    * batch twin measures the first journey only; full-replay parity
    * holds whenever the replay arrives within one watermark horizon,
    * which the parity spec exercises). Within a micro-batch, events
    * sort by (ts, step precedence) so same-instant step pairs resolve
    * exactly as the batch form's window minima do; out-of-order
    * arrivals can only under-count, never corrupt state — transitions
    * are monotone.
    */
  def funnelStream(events: Dataset[FunnelEv]): Dataset[UserFunnel] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", StateWatermarkDelay)
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, UserFunnel](GroupStateTimeout.EventTimeTimeout) {
        (userId, evs, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val level = funnelLevel(state.get)
            state.remove() // final: the 24h window is behind the watermark
            UserFunnel(userId, level)
          } else {
            val st = advanceFunnel(
              state.getOption.getOrElse(FunnelState(FunnelUnset, FunnelUnset, FunnelUnset)), evs)
            state.update(st)
            state.setTimeoutTimestamp(funnelDeadlineMs(st, state.getCurrentWatermarkMs()))
            UserFunnel(userId, funnelLevel(st))
          }
      }
  }

  /** G7 (append-only final form — the production shape): emits each
    * user's funnel level exactly ONCE, when the watermark proves the
    * journey final, via flatMapGroupsWithState in Append mode (data
    * triggers only advance state and emit nothing). The output is a
    * plain append stream of (user_id, funnel_level) facts, so the same
    * `groupBy(funnel_level).count()` the batch funnel (B55) ends with
    * runs downstream without Update-mode merge logic — and the state
    * store shrinks as journeys close.
    */
  def funnelFinalStream(events: Dataset[FunnelEv]): Dataset[UserFunnel] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", StateWatermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, UserFunnel](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, evs, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val level = funnelLevel(state.get)
            state.remove()
            Iterator.single(UserFunnel(userId, level))
          } else {
            val st = advanceFunnel(
              state.getOption.getOrElse(FunnelState(FunnelUnset, FunnelUnset, FunnelUnset)), evs)
            state.update(st)
            state.setTimeoutTimestamp(funnelDeadlineMs(st, state.getCurrentWatermarkMs()))
            Iterator.empty
          }
      }
  }

  /** G2 (state form): per-user session counts via mapGroupsWithState
    * with `EventTimeTimeout` eviction: once the watermark passes
    * lastTs+gap no event can extend the user's current session (any
    * later arrival is > gap away in event time, i.e. a NEW session by
    * definition), so the accumulated counts are final — emitted once
    * more, then dropped. The eviction boundary therefore coincides
    * exactly with a session boundary: a returning user starts a fresh
    * counting epoch, and per-user TOTALS are the SUM of epoch-final
    * emissions (plus the last open-epoch row) — which is what a
    * downstream consumer aggregates at 100 TB, instead of the state
    * store holding every user ever seen.
    */
  def sessionizeStream(events: Dataset[Ev]): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    val gapMs = GapSeconds * 1000
    events
      .withWatermark("ts", StateWatermarkDelay)
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](GroupStateTimeout.EventTimeTimeout) {
        (userId, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove() // epoch final: watermark passed lastTs+gap
            UserSessions(userId, st.nSessions, st.nEvents)
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0L))
            sorted.foreach { e =>
              val t = e.ts.getTime
              val newSession = st.lastTs == Long.MinValue || t - st.lastTs > gapMs
              st = SessionState(
                if (newSession) t else st.sessionStart,
                math.max(t, st.lastTs),
                st.nEvents + 1,
                st.nSessions + (if (newSession) 1 else 0))
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(st.lastTs + gapMs, state.getCurrentWatermarkMs() + 1))
            UserSessions(userId, st.nSessions, st.nEvents)
          }
      }
  }
}
