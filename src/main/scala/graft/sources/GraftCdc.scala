package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A39: CDC APPLY from an external store — the inverse of the G16
  * exactly-once JDBC sink: an OLTP system keeps a monotonically
  * sequenced change log (`seq`, `change_type` 'insert'|'delete', full
  * row image — an update is the delete of the old image plus the
  * insert of the new one, the Debezium/DMS envelope shape), and graft
  * ingests log segments and applies them to a maintained rollup via
  * B69's signed-delta `applyFeed` — so a warehouse-side aggregate
  * tracks an external table WITHOUT ever scanning it.
  *
  * Scale shape: each segment is read with the A23 stride discipline —
  * `spark.read.jdbc` over the seq range with N partitions, so N
  * executors each pull their own key range (no single-connection
  * funnel); the apply cost is O(segment) — the rollup is merged with
  * a segment-grain delta, never rebuilt. The consumer tracks the last
  * applied `seq` (exactly-once by range: segments are half-open
  * (from, to], so replaying a crashed segment re-reads exactly the
  * same rows and `applyFeed`'s merge is deterministic).
  */
object GraftCdc {

  /** A41 (outbound — the other half of the CDC loop): PUBLISH a
    * change feed as a durable, seq-stamped log segment that any
    * downstream consumer — graft's own `applyFeed`, or a foreign
    * system speaking the same Debezium-style envelope — can replay in
    * order. Input is exactly what the COW merge emits at write time
    * (`GraftSink.mergeUpsertCdf`: row images + `change_type`), so a
    * table's mutations stream OUT of the warehouse with no second
    * scan of anything.
    *
    * Layout: parquet under `logDir`, hive-partitioned by `epoch` (the
    * caller's batch/epoch id), each row stamped with a monotone `seq`.
    * Seq assignment: base = max seq over OTHER epochs (column-pruned
    * scan of the tiny seq column), new rows numbered base+1… in a
    * deterministic order (all image columns, then change_type) — so a
    * REPLAYED publish of the same epoch recomputes the SAME base and
    * the same stamps, and the per-epoch dynamic overwrite makes the
    * replay idempotent (the G4 batch-id-is-the-partition rule).
    * Cost is O(feed): the log is append-shaped, history never
    * rewritten. Returns the (fromSeq, toSeq] bounds of the published
    * segment — the consumer's watermark advance.
    */
  def publishFeed(feed: DataFrame, logDir: String, epoch: Long): (Long, Long) = {
    val s = feed.sparkSession
    val fs = new org.apache.hadoop.fs.Path(logDir)
      .getFileSystem(s.sessionState.newHadoopConf())
    val base: Long =
      if (!fs.exists(new org.apache.hadoop.fs.Path(logDir))) 0L
      else {
        val r = graft.sources.GraftIO.readParquet(s, logDir)
          .where(col("epoch") =!= epoch)
          .agg(max("seq")).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
    val n = feed.count()
    if (n == 0) return (base, base) // a no-change merge publishes nothing
    val imageCols = feed.columns.filter(_ != "change_type").toSeq
    // total order over the CHURN via the range-partitioned GlobalOrder
    // index (a monotone log NEEDS a total order; GlobalOrder gives it
    // without a SinglePartition window — the B62/C14 discipline)
    val indexed = graft.operators.GlobalOrder.index(
      feed, (imageCols :+ "change_type").map(col): _*)
    val stamped = indexed
      .withColumn("seq", col("rn") + 1L + base).drop("rn")
      .withColumn("epoch", lit(epoch))
      .localCheckpoint(true) // the overwrite below replaces this epoch's dir
    try stamped.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("epoch").parquet(logDir)
    finally graft.GraftSession.releaseCheckpoint(stamped)
    (base, base + n)
  }

  /** Read a published log segment with `seq` in (fromSeq, toSeq] back
    * as a B69 feed frame — the consumer half of `publishFeed`, shaped
    * exactly like `readFeedSegment`'s JDBC envelope so `applySegment`
    * logic composes unchanged. Epoch partitions prune the scan when
    * the caller tracks epochs; the seq predicate is pushed down.
    */
  def readPublishedSegment(s: SparkSession, logDir: String,
      fromSeq: Long, toSeq: Long): DataFrame =
    graft.sources.GraftIO.readParquet(s, logDir)
      .where(col("seq") > fromSeq && col("seq") <= toSeq)
      .drop("seq", "epoch")

  /** Read the change-log segment with `seq` in (fromSeq, toSeq] as a
    * B69 feed frame, stride-partitioned N ways over the seq range.
    */
  def readFeedSegment(s: SparkSession, table: String, fromSeq: Long,
      toSeq: Long, numPartitions: Int = 4): DataFrame = {
    require(toSeq > fromSeq, s"[GRAFT] empty CDC segment ($fromSeq, $toSeq]")
    val segment =
      s"(SELECT * FROM $table WHERE seq > $fromSeq AND seq <= $toSeq) cdc_seg"
    s.read.jdbc(GraftJdbc.url(s), segment, "seq", fromSeq + 1, toSeq,
      numPartitions, GraftJdbc.connectionProperties(s))
      .drop("seq") // the feed frame carries row images + change_type only
  }

  /** The newest sequence number present in the log (the consumer's
    * target watermark); -1 for an empty log.
    */
  def maxSeq(s: SparkSession, table: String): Long = {
    val r = s.read.jdbc(GraftJdbc.url(s),
      s"(SELECT max(seq) AS mx FROM $table) cdc_mx",
      GraftJdbc.connectionProperties(s)).head()
    if (r.isNullAt(0)) -1L else r.getLong(0)
  }

  /** Apply one log segment to a maintained rollup: ingest the range
    * and merge it through B69's signed-delta path. Returns the new
    * rollup (the caller persists it and advances its seq watermark).
    */
  def applySegment(s: SparkSession, mv: DataFrame, d: graft.plans.GraftMv.MvDef,
      table: String, fromSeq: Long, toSeq: Long,
      numPartitions: Int = 4): DataFrame =
    graft.plans.GraftMv.applyFeed(mv,
      readFeedSegment(s, table, fromSeq, toSeq, numPartitions), d)

  /** The DURABLE consumer loop step: resume from the stored
    * watermark, apply everything the log has past it to the rollup
    * under `root`, and commit rollup + watermark ATOMICALLY with
    * G8's staged-dir protocol (write staging, watermark marker
    * INSIDE the staging dir, delete+rename swap; a crash between
    * delete and rename is finished by the next call). Calling it
    * again with no new log entries — or replaying after a crash —
    * is a no-op, so a cron/stream driver needs no state of its own.
    * Returns the new watermark (-1 while the log is empty).
    */
  def applyNext(s: SparkSession, d: graft.plans.GraftMv.MvDef,
      table: String, root: String, numPartitions: Int = 4): Long = {
    val mvPath = s"$root/rollup.parquet"
    val stagePath = s"$root/rollup.staging"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sessionState.newHadoopConf())
    def path(p: String) = new org.apache.hadoop.fs.Path(p)
    def marker(dir: String) = path(s"$dir/_applied_seq")
    // crash recovery: committed staging with no live dir → finish the swap
    // (rename reports failure as FALSE, not an exception — check it, or
    // a failed adoption reads an empty rollup and silently rebuilds)
    if (!fs.exists(path(mvPath)) && fs.exists(marker(stagePath)) &&
        !fs.rename(path(stagePath), path(mvPath)))
      throw new IllegalStateException(
        s"[GRAFT] CDC crash-recovery swap failed: rename($stagePath -> $mvPath) returned false")
    val watermark: Long =
      if (!fs.exists(marker(mvPath))) -1L
      else {
        val in = fs.open(marker(mvPath))
        try in.readLong() finally in.close()
      }
    val tip = maxSeq(s, table)
    if (tip <= watermark) return watermark
    val mv =
      if (fs.exists(path(mvPath))) graft.sources.GraftIO.readParquet(s, mvPath)
      else graft.plans.GraftMv.mvFrameOf(
        readFeedSegment(s, table, watermark, tip, numPartitions)
          .drop("change_type").limit(0), d)
    val merged = applySegment(s, mv, d, table, watermark, tip, numPartitions)
      .localCheckpoint(true) // the swap deletes the files this read
    try {
      merged.write.mode("overwrite").parquet(stagePath)
      val out = fs.create(marker(stagePath), true)
      try out.writeLong(tip) finally out.close()
      fs.delete(path(mvPath), true)
      // the marker is already inside staging, so a FALSE here must
      // surface: the next call's crash-recovery can then finish the
      // swap, but only if this caller doesn't report success first
      if (!fs.rename(path(stagePath), path(mvPath)))
        throw new IllegalStateException(
          s"[GRAFT] CDC commit swap failed: rename($stagePath -> $mvPath) returned false")
    } finally graft.GraftSession.releaseCheckpoint(merged)
    tip
  }
}
