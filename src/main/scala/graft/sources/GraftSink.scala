package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sink layer: the write-side analog of the reference's
  * `ArgoDBSinkTable`/partition machinery
  * (reference: ArgodbMapreduceInputFormat.java:117-118 partitions,
  * io.transwarp.holodesk.sink.* imports) re-expressed as Spark-native
  * layouts:
  *  - hive-style partitioned parquet → directory-level partition
  *    pruning on read (the single-value-partition scheme);
  *  - bucketed tables → co-located, shuffle-free equi-joins (the
  *    section/tablet bucketing scheme).
  */
object GraftSink {

  def scratchDir: String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_warehouse"

  /** Hive-style partitioned write. At 100 TB this is the layout that
    * makes `col=value` scans touch one directory instead of the table.
    */
  def writePartitioned(df: DataFrame, name: String, partitionCols: Seq[String]): String = {
    val path = s"$scratchDir/$name"
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)
    path
  }

  /** Read back a partitioned table (partition columns become readable
    * from directory names; pruning shows as PartitionFilters in the
    * scan).
    */
  def readPartitioned(s: SparkSession, name: String): DataFrame =
    graft.sources.GraftIO.readParquet(s, s"$scratchDir/$name")

  /** Copy-on-write MERGE (upsert) into a hive-partitioned parquet
    * table — the key-level analog of the partition-level dynamic
    * overwrite backfill. `updates` rows carry the full target schema;
    * a key match replaces the target row (including a changed
    * partition value — the stale copy in the OLD partition is
    * dropped), a non-match inserts. As in SQL MERGE, `updates` must
    * carry at most one row per key — duplicate update keys would
    * both survive the union (the standard multiple-matches error
    * case, left to the caller's contract).
    *
    * Scale shape (100 TB target, small update batch — the common
    * case):
    *  - `updates` is broadcast; the target is scanned once with a
    *    broadcast semi-join to find which partitions hold matched
    *    rows — no shuffle of the target, and the scan reads only the
    *    key + partition columns (column pruning).
    *  - Only AFFECTED partitions are rewritten (anti-join out the
    *    matched keys, union the updates, `partitionOverwriteMode=
    *    dynamic`); untouched partitions keep their files byte-for-
    *    byte — at 100 TB the difference between rewriting one day
    *    and rewriting the archive.
    *  - The affected-partition list is a driver artifact the size of
    *    the partition-value set (same class as the IVF centroid
    *    list). The rewrite is staged through an eager
    *    localCheckpoint so the plan no longer reads the path it is
    *    about to overwrite (a production impl would stage new files
    *    and swap a manifest, as the reference's section-file commit
    *    does — this is the same two-phase idea at partition grain).
    */
  def mergeUpsert(s: SparkSession, targetPath: String, updates: DataFrame,
                  keyCols: Seq[String], partitionCol: String): Unit = {
    mergeCore(s, targetPath, updates, keyCols, partitionCol, wantFeed = false)
    ()
  }

  /** A30 write-time change capture: the same copy-on-write MERGE, but
    * it also RETURNS the row-level change feed — every deleted old
    * row version and inserted new one, tagged `change_type`. The feed
    * is computed from the affected partitions' PRE-image, pinned with
    * `localCheckpoint` while the old files still exist; a feed
    * reconstructed afterwards is impossible, because the COW rewrite
    * physically deletes the pre-image (that destruction is exactly
    * why Delta/Iceberg capture CDF at write time too). Unchanged rows
    * of the rewritten partitions cancel via `exceptAll` (multiset
    * difference), so the feed is the true delta. Cost is O(affected
    * partitions) — the same data the merge already materializes to
    * stage — never O(table).
    */
  def mergeUpsertCdf(s: SparkSession, targetPath: String, updates: DataFrame,
                     keyCols: Seq[String], partitionCol: String): DataFrame =
    mergeCore(s, targetPath, updates, keyCols, partitionCol, wantFeed = true).get

  private def mergeCore(s: SparkSession, targetPath: String, updates: DataFrame,
                        keyCols: Seq[String], partitionCol: String,
                        wantFeed: Boolean): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    // share-lease gate: rewriting deletes files a pinned reader still
    // references — fail fast while any reader lease is live (the
    // reference's share-lock conflict, GraftLease doc)
    GraftLease.failIfLeased(s, targetPath, "mergeUpsert")
    GraftMor.failIfMutationSidecars(s, targetPath, "mergeUpsert")
    val target = graft.sources.GraftIO.readParquet(s, targetPath)
    val keys = updates.select(keyCols.map(col): _*)
    val affected = target
      .join(broadcast(keys), keyCols, "left_semi")
      .select(partitionCol)
      .union(updates.select(partitionCol))
      .distinct().collect().map(_.get(0))
    val affectedRows = target.where(partitionIn(partitionCol, affected.toSeq))
    val survivors = affectedRows.join(broadcast(keys), keyCols, "left_anti")
    val staged = survivors.unionByName(updates).localCheckpoint(true)
    // pre-image pinned BEFORE the rewrite deletes its files; both
    // sides of the feed live in checkpoint blocks, so the frame stays
    // valid after the swap (blocks are freed when the frames are GC'd
    // — the caller owns the feed's lifetime, so no release here)
    val feed = if (wantFeed) {
      val pre = affectedRows.localCheckpoint(true)
      Some(staged.exceptAll(pre).withColumn("change_type", lit("insert"))
        .unionByName(pre.exceptAll(staged).withColumn("change_type", lit("delete"))))
    } else None
    try {
      // a partition can be DRAINED by a merge that moves every one of
      // its rows elsewhere: no survivors, no update rows carry its
      // value, so dynamic overwrite writes nothing for it and its
      // stale files would survive — same pitfall as a full-partition
      // delete. Drop affected-minus-written explicitly.
      val written = staged.select(partitionCol).distinct()
        .collect().map(_.get(0)).toSet
      staged.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCol).parquet(targetPath)
      dropDrainedPartitions(s, targetPath, partitionCol,
        affected.filterNot(written).toSeq)
    } finally {
      if (!wantFeed) graft.GraftSession.releaseCheckpoint(staged) // free staged blocks
    }
    feed
  }

  /** Null-safe membership test on the partition column. A plain
    * `isin(affected)` never matches NULL (SQL IN three-valued logic),
    * so when a null-partition row is affected its SURVIVORS would be
    * excluded from the rewrite while dropDrainedPartitions (which does
    * support null via the Hive sentinel) deletes the null partition's
    * directory — silent loss of the surviving rows. An OR-chain of
    * `<=>` keeps every value, null included, in the survivor scan.
    */
  private def partitionIn(partitionCol: String, values: Seq[Any])
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit}
    values.map(v => col(partitionCol) <=> lit(v))
      .reduceOption(_ || _).getOrElse(lit(false))
  }

  /** Removes partition directories whose every row a merge/delete
    * eliminated — `partitionOverwriteMode=dynamic` only replaces
    * partitions PRESENT in the written data, so an absent partition's
    * old files survive unless dropped here. Values are escaped
    * exactly as Spark's writer escapes them (spaces, colons, '%', '='
    * become %XX; null becomes the Hive default-partition sentinel) so
    * the path names the real directory.
    */
  private def dropDrainedPartitions(s: SparkSession, targetPath: String,
      partitionCol: String, values: Seq[Any]): Unit = if (values.nonEmpty) {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val fs = new org.apache.hadoop.fs.Path(targetPath)
      .getFileSystem(s.sessionState.newHadoopConf())
    values.foreach { v =>
      val escaped =
        if (v == null) "__HIVE_DEFAULT_PARTITION__"
        else ExternalCatalogUtils.escapePathName(String.valueOf(v))
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$targetPath/$partitionCol=$escaped"), true)
    }
  }

  /** Copy-on-write key DELETE — the GDPR / retention-purge pass. Same
    * affected-partition discovery as mergeUpsert (broadcast semi-join,
    * no shuffle of the target) and the same drained-partition
    * handling: a partition whose every row is deleted produces no
    * output rows, dynamic overwrite writes nothing for it, and its
    * directory must be removed explicitly.
    */
  def mergeDelete(s: SparkSession, targetPath: String, deleteKeys: DataFrame,
                  keyCols: Seq[String], partitionCol: String): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col}
    GraftLease.failIfLeased(s, targetPath, "mergeDelete")
    GraftMor.failIfMutationSidecars(s, targetPath, "mergeDelete")
    val target = graft.sources.GraftIO.readParquet(s, targetPath)
    val keys = deleteKeys.select(keyCols.map(col): _*)
    val affected = target
      .join(broadcast(keys), keyCols, "left_semi")
      .select(partitionCol).distinct().collect().map(_.get(0))
    if (affected.nonEmpty) {
      val survivors = target
        .where(partitionIn(partitionCol, affected.toSeq))
        .join(broadcast(keys), keyCols, "left_anti")
        .localCheckpoint(true)
      try {
        val stillThere = survivors.select(partitionCol).distinct()
          .collect().map(_.get(0)).toSet
        survivors
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(partitionCol).parquet(targetPath)
        dropDrainedPartitions(s, targetPath, partitionCol,
          affected.filterNot(stillThere).toSeq)
      } finally graft.GraftSession.releaseCheckpoint(survivors) // free staged blocks
    }
  }

  /** A13 as a reusable maintenance ACTION — the target of the
    * advisor's `compact` advice: rewrite a fragmented table in place.
    * Partitioned layout → hash-repartition on the partition columns
    * (one task and one file per partition, partitions rewritten in
    * parallel); flat layout → repartition to ⌈bytes/target⌉ balanced
    * files. Content-identical by construction (localCheckpoint pins
    * the rows before the overwrite deletes what it read). Same
    * in-place-rewrite contract as the COW merge: live readers are
    * protected by the lease layer (fail-fast here), and previously
    * published snapshot manifests dangle — publish a fresh epoch
    * after compacting.
    */
  def compactTable(s: SparkSession, tablePath: String,
      partitionCols: Seq[String] = Nil,
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    import org.apache.spark.sql.functions.col
    GraftLease.failIfLeased(s, tablePath, "compactTable")
    GraftMor.failIfMutationSidecars(s, tablePath, "compactTable")
    val df = graft.sources.GraftIO.readParquet(s, tablePath)
    val staged = (if (partitionCols.nonEmpty)
        df.repartition(partitionCols.map(col): _*)
      else {
        val bytes = GraftCatalog.listDataFiles(s, tablePath).files.map(_._2).sum
        df.repartition(math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt)
      }).localCheckpoint(true)
    try {
      val w = staged.write.mode(SaveMode.Overwrite)
      if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*).parquet(tablePath)
      else w.parquet(tablePath)
    } finally graft.GraftSession.releaseCheckpoint(staged)
  }

  /** Bucketed + sorted managed table: both sides of a repeated join
    * pre-shuffled once at write time; subsequent joins on the bucket
    * key plan with zero Exchange.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", s"$scratchDir/tbl_$table")
      .format("parquet")
      .saveAsTable(table)
}
