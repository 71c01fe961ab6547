package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** B70: stats-driven join planning — the CBO-lite that picks the join
  * strategy from the TABLE'S OWN metadata instead of a global
  * threshold.
  *
  * Production clusters routinely run with
  * `spark.sql.autoBroadcastJoinThreshold=-1` (one mis-estimated
  * broadcast OOMs a 1000-executor job, so operators disable the
  * blanket heuristic). That turns every star join into a shuffled
  * sort-merge join — the exact regression B1-B10's plans avoid. This
  * helper restores per-join broadcasting from evidence: the dim
  * table's LISTING size (one namenode round trip, the A25
  * metadata-only discipline — no footer opened, no row read). Below
  * the byte budget → explicit `broadcast()` hint; above → plain join
  * and let the shuffle happen, which is the right call for a
  * fact-fact join no hint should force.
  */
object GraftPlanner {

  /** On-disk bytes of a table path, from the file listing alone. */
  def tableBytes(s: SparkSession, path: String): Long =
    graft.sources.v2.GraftV2
      .dataFileSizes(path, s.sessionState.newHadoopConf()).map(_._2).sum

  /** Join `fact` to the table at `dimPath`, broadcasting the dim iff
    * its listed size fits the budget. The budget compares COMPRESSED
    * parquet bytes against a driver/executor memory allowance —
    * callers should size it with the usual ~4-8× decode expansion in
    * mind (the 32 MB default assumes ~256 MB in-memory, inside a
    * typical 64 MB-threshold comfort zone).
    */
  def joinWithStats(s: SparkSession, fact: DataFrame, dimPath: String,
      keys: Seq[String], budgetBytes: Long = 32L * 1024 * 1024,
      joinType: String = "inner"): DataFrame = {
    val dim = s.read.parquet(dimPath)
    if (tableBytes(s, dimPath) <= budgetBytes)
      fact.join(broadcast(dim), keys, joinType)
    else fact.join(dim, keys, joinType)
  }
}
