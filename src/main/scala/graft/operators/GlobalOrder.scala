package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Dense global ordering WITHOUT a SinglePartition window — the
  * scalable replacement for `row_number() OVER (ORDER BY …)` when the
  * frame is large: a global window funnels every row through ONE task,
  * while this shape is the classic two-phase total order:
  *
  *  1. `repartitionByRange` on the sort key (sampling-based balanced
  *     boundaries; ties split across tasks by the caller's tiebreak
  *     column, so even a 100%-hot key cannot create a straggler);
  *  2. per-partition sort;
  *  3. a dense index from per-partition counts + prefix offsets
  *     (`zipWithIndex` — one lightweight counting job; range
  *     partitions are emitted in boundary order, so the index follows
  *     the total order exactly).
  *
  * The resulting `rn` is the exact 0-based rank of the total order —
  * independent of partition count or boundary placement (the sort must
  * be total: include a unique tiebreaker). Used by C14's
  * sorted-neighborhood run and B62's PageRank ranking.
  */
object GlobalOrder {

  /** The range-partitioned, within-partition-sorted run — exposed so
    * plan specs can assert the RangePartitioning exchange directly.
    */
  def sorted(df: DataFrame, sort: Column*): DataFrame =
    df.repartitionByRange(sort: _*).sortWithinPartitions(sort: _*)

  /** All of `df`'s columns plus `rn`: the dense 0-based global index
    * of the row under the given total order.
    */
  def index(df: DataFrame, sort: Column*): DataFrame = {
    val st = sorted(df, sort: _*)
    val schema = st.schema.add("rn", LongType, nullable = false)
    val rdd = st.rdd.zipWithIndex().map { case (row, i) => Row.fromSeq(row.toSeq :+ i) }
    st.sparkSession.createDataFrame(rdd, schema)
  }
}
