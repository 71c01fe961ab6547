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
}
