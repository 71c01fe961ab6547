package graft.sources.v2

import graft.sources.GraftCatalog
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, concat_ws, lit, when}
import org.apache.spark.sql.sources.InsertableRelation

import scala.collection.concurrent.TrieMap

/** SQL DML for the graft catalog: `INSERT INTO graft.db.t ...` routed
  * through the A38 WRITE-AUDIT-PUBLISH gate — the write surface the
  * reference's consumers imply (jobs writing back through the same
  * named entry they read from; the reference connector itself is
  * read-only, ArgodbMapreduceInputFormat.java:52-279, so the write
  * side is engine-added and must carry the engine's gate discipline).
  *
  * Shape: the DSv2 V1Write fallback (the JDBC-connector pattern) —
  * Spark resolves/casts the INSERT by position against the table
  * schema, hands this builder the query's DataFrame, and the insert:
  *
  *   1. APPENDS the batch as parquet files (the WAP stage — invisible
  *      to every pinned/SQL reader until REFRESH re-pins);
  *   2. AUDITS exactly this batch's files against the table's
  *      registered [[GraftCatalog.AuditRule]]s; a DIRTY batch is
  *      quarantine-DIVERTED — the staged files are MOVED (checked
  *      renames) under `_quarantine/batch_<n>/` with a `reasons`
  *      manifest, the INSERT fails BY NAME, and the served table is
  *      byte-identical to before;
  *   3. PUBLISHES the clean state as a numbered snapshot epoch via
  *      `publishAudited` (the A38 staged-scope rule: an OLDER
  *      unpublished dirty batch still blocks — a violation can never
  *      ride in on a later clean batch's publish).
  *
  * Append-only by design: `INSERT OVERWRITE` refuses by name (the
  * mutation surfaces are the COW/MOR paths with their own contracts).
  * Cost at scale: one listing diff + an O(batch) audit scan + one
  * manifest write — never O(table) after the first publish.
  */
object GraftSqlWrite {

  /** Audit rules per scheme-less table path — registered once by the
    * pipeline owner; inserts into unregistered tables publish through
    * the gate with no row rules (schema gate still applies).
    */
  private val rules = TrieMap.empty[String, Seq[GraftCatalog.AuditRule]]

  private def norm(p: String): String = GraftMorMask.norm(p)

  def setAuditRules(tablePath: String,
      auditRules: Seq[GraftCatalog.AuditRule]): Unit =
    rules.put(norm(tablePath), auditRules)

  def clearAuditRules(tablePath: String): Unit = rules.remove(norm(tablePath))

  /** The WriteBuilder `GraftTable.newWriteBuilder` hands Spark. */
  def builder(tablePath: String, partCols: Seq[String],
      info: LogicalWriteInfo): WriteBuilder = new WriteBuilder {
    override def build(): Write = new V1Write {
      override def toInsertableRelation: InsertableRelation =
        new InsertableRelation {
          override def insert(data: DataFrame, overwrite: Boolean): Unit =
            insertAudited(data, tablePath, partCols, overwrite)
        }
    }
  }

  private def listFiles(s: org.apache.spark.sql.SparkSession,
      tablePath: String): Set[String] =
    GraftCatalog.listDataFiles(s, tablePath).files.map(_._1).toSet

  private[v2] def insertAudited(data: DataFrame, tablePath: String,
      partCols: Seq[String], overwrite: Boolean): Unit = {
    if (overwrite)
      throw new UnsupportedOperationException(
        s"[GRAFT] INSERT OVERWRITE is not supported on $tablePath " +
          "(append-only SQL DML by design; use the COW merge or MOR " +
          "mutation APIs for rewrites)")
    val s = data.sparkSession
    val fs = new org.apache.hadoop.fs.Path(tablePath)
      .getFileSystem(s.sessionState.newHadoopConf())
    // 1. STAGE: land the batch (hive layout preserved); capture the
    // file delta so audit + quarantine scope to exactly this batch
    val before = listFiles(s, tablePath)
    val w = data.write.mode(SaveMode.Append)
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
      .parquet(tablePath)
    val fresh = (listFiles(s, tablePath) -- before).toSeq.sorted
    if (fresh.isEmpty) return // empty insert: nothing staged, nothing owed
    // 2. AUDIT this batch's rows
    val tableRules = rules.getOrElse(norm(tablePath), Seq.empty)
    if (tableRules.nonEmpty) {
      val reader = s.read
      reader.option("basePath", tablePath)
      val batch = reader.parquet(fresh: _*)
      val fired = tableRules.map(r => when(r.violation, lit(r.name)))
      val quarantine = batch
        .withColumn("reasons", concat_ws(",", fired: _*))
        .where(fired.map(f => when(f.isNotNull, 1L).otherwise(0L))
          .reduce(_ + _) > 0L)
        .localCheckpoint(true) // the divert below unlinks what this reads
      try {
        val nBad = quarantine.count()
        if (nBad > 0L) {
          // DIVERT: move the staged files out so the served table is
          // byte-identical to before the insert, persist the reasons
          val qDir = s"$tablePath/_quarantine/batch_${System.nanoTime()}"
          fs.mkdirs(new org.apache.hadoop.fs.Path(qDir))
          fresh.foreach { f =>
            val src = new org.apache.hadoop.fs.Path(f)
            if (!fs.rename(src,
                new org.apache.hadoop.fs.Path(qDir, src.getName)))
              throw new IllegalStateException(
                s"[GRAFT] INSERT quarantine divert failed: rename($f -> " +
                  s"$qDir) returned false")
          }
          quarantine.write.mode(SaveMode.Overwrite)
            .parquet(s"$qDir/_reasons")
          throw new IllegalStateException(
            s"[GRAFT] INSERT INTO $tablePath refused: $nBad row(s) violate " +
              s"audit rule(s) [${tableRules.map(_.name).mkString(",")}] - " +
              s"batch diverted to $qDir (reasons manifest inside); the " +
              "served table is unchanged")
        }
      } finally graft.GraftSession.releaseCheckpoint(quarantine)
    }
    // 2b. SEQUENCE the clean batch (only needed when the table carries
    // an equality sidecar): the inserted files record at the CURRENT
    // epoch sequence, so they outrank every existing finite eq
    // tombstone — a fresh insert serves even for a previously
    // upserted key — while erases (sequence ∞) still mask them: an
    // INSERT cannot resurrect a GDPR-erased key.
    graft.sources.GraftMor.sequenceAppendedFiles(s, tablePath, fresh)
    // 3. PUBLISH through the A38 gate (staged scope: everything
    // unpublished — an older dirty batch still blocks, by design)
    val nsDir = new org.apache.hadoop.fs.Path(tablePath).getParent.toString
    val name = new org.apache.hadoop.fs.Path(tablePath).getName
      .stripSuffix(".parquet")
    val gateRules =
      if (tableRules.nonEmpty) tableRules
      else Seq(GraftCatalog.AuditRule("none", lit(false)))
    new GraftCatalog(s, nsDir).publishAudited(name, gateRules) match {
      case Right(_) => ()
      case Left(q) =>
        val n = q.count()
        throw new IllegalStateException(
          s"[GRAFT] INSERT INTO $tablePath staged cleanly but the publish " +
            s"gate found $n violating row(s) among OLDER unpublished files " +
            "- fix or vacuum the earlier staged batch (A38 scope rule)")
    }
  }
}
