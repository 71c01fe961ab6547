package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** B71: stats-driven join planning — the CBO-lite that picks the join
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

  /** B72: the B68 skew-profile rule as a planning decision — the salt
    * factor that levels the hottest key to the mean key load,
    * ⌈top_cnt · n_keys / n_rows⌉, capped (a salt of s multiplies the
    * build side s×, so the cap bounds that amplification). 1 means
    * "don't salt": uniform keys must not pay the explode tax. One
    * map-combinable aggregate pass over the fact's key column.
    */
  def suggestedSalt(fact: DataFrame, keyCol: String, cap: Int = 64): Int = {
    import org.apache.spark.sql.functions.{count, lit, max, sum}
    val rows = fact.groupBy(keyCol)
      .agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_keys"), sum("cnt").as("n_rows"),
        max("cnt").as("top"))
      .collect()
    if (rows.isEmpty || rows.head.isNullAt(1) || rows.head.getLong(0) == 0L) 1
    else {
      val r = rows.head
      val salt = (r.getLong(2) * r.getLong(0) + r.getLong(1) - 1L) / r.getLong(1)
      math.min(cap.toLong, math.max(1L, salt)).toInt
    }
  }

  /** B72: auto-salted equi join — profiles the fact key, salts only
    * when the profile says a key is hot (B27's mechanics: the fact
    * side carries a deterministic per-row salt hashed from the whole
    * row, the build side explodes ×salt), and stays a plain join on
    * uniform keys. Result is identical either way; only the shuffle
    * layout changes.
    */
  def saltedJoinAuto(fact: DataFrame, build: DataFrame,
      factKey: String, buildKey: String, cap: Int = 64): DataFrame = {
    import org.apache.spark.sql.functions.{col, explode, lit, pmod, sequence, struct, xxhash64}
    val salt = suggestedSalt(fact, factKey, cap)
    if (salt <= 1) fact.join(build, col(factKey) === col(buildKey))
    else {
      val saltedFact = fact.withColumn("_salt",
        pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(salt)))
      val explodedBuild = build.withColumn("_salt",
        explode(sequence(lit(0L), lit(salt - 1L))))
      saltedFact
        .join(explodedBuild,
          col(factKey) === col(buildKey) &&
            saltedFact("_salt") === explodedBuild("_salt"))
        .drop("_salt")
    }
  }

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
    val dim = graft.sources.GraftIO.readParquet(s, dimPath)
    if (tableBytes(s, dimPath) <= budgetBytes)
      fact.join(broadcast(dim), keys, joinType)
    else fact.join(dim, keys, joinType)
  }
}
