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
      if (fs.exists(path(mvPath))) s.read.parquet(mvPath)
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
