package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** A34: table-maintenance advisor — the nightly health sweep that
  * decides WHICH maintenance job (A14 compaction, A27 snapshot
  * expiry / vacuum, A31 bloom reindex) each table actually needs,
  * from METADATA ONLY: one recursive listing per table plus the
  * snapshot-manifest files. No parquet footer is opened and no row is
  * read — at 100 TB the sweep costs what `ls -R` costs, which is why
  * it can run every night over every table.
  *
  * Rules (each maps to an existing, tested engine action):
  *  - `compact` (A14): the table is mostly small files — many files
  *    AND the majority under the small-file bar. Scan startup cost is
  *    per-file; a million 1 MB files is the classic silent killer.
  *  - `expire-snapshots` (A27): the published log outgrew the
  *    retention budget — every manifest pins files against vacuum.
  *  - `vacuum` (A27): listed data files referenced by NO published
  *    manifest (crashed writers, unpublished appends) are holding
  *    bytes the log says are dead.
  *  - `reindex-bloom` (A31): a `_bloom_<col>` index exists but some
  *    data file has no sidecar — lookups still work (unindexed files
  *    scan conservatively) but pruning degrades until a rebuild.
  */
object GraftAdvisor {

  case class Advice(table: String, rule: String, metric: Long, detail: String)

  def advise(s: SparkSession, root: String,
      smallFileBytes: Long = 32L * 1024 * 1024,
      minFilesForCompaction: Int = 8,
      keepLast: Int = 10,
      morTombstoneBudget: Long = 100000): Seq[Advice] = {
    val cat = new GraftCatalog(s, root)
    val conf = s.sessionState.newHadoopConf()
    val out = Seq.newBuilder[Advice]
    cat.tableNames().foreach { name =>
      val tableDir = s"$root/$name.parquet"
      val files = cat.snapshotFiles(name)
      // compact: many files, mostly small
      val small = files.count(_._2 < smallFileBytes)
      if (files.length >= minFilesForCompaction && small * 2 > files.length)
        out += Advice(name, "compact", small.toLong,
          s"$small of ${files.length} data files under ${smallFileBytes / (1024 * 1024)} MB - run compactTable")
      // snapshot log growth
      val ids = cat.snapshotIds(name)
      if (ids.length > keepLast)
        out += Advice(name, "expire-snapshots", ids.length.toLong,
          s"${ids.length} published epochs (budget $keepLast) - run expireSnapshots")
      // orphans vs the published log
      if (ids.nonEmpty) {
        val live = ids.flatMap(cat.snapshotFilesAsOf(name, _)).toSet
        val orphans = files.map(_._1).filterNot(live)
        if (orphans.nonEmpty)
          out += Advice(name, "vacuum", orphans.length.toLong,
            s"${orphans.length} listed files referenced by no published epoch - run vacuum")
      }
      // A69: a many-file table with no stats-bearing manifest plans
      // every scan through the footer pool — one publish records the
      // per-row-group stats and planning drops to one manifest read.
      // Act-clears-it (CALL graft.system.publish_snapshot).
      if (files.length >= minFilesForCompaction &&
          graft.sources.v2.GraftPlanStats.rawForTable(tableDir, conf).isEmpty)
        out += Advice(name, "publish-stats", files.length.toLong,
          s"${files.length} data files and no stats-bearing snapshot " +
            "manifest: every scan plans through footer reads - run " +
            "publishSnapshot to record planning stats")
      // bloom sidecar coverage
      val dir = new Path(tableDir)
      val fs = dir.getFileSystem(conf)
      if (fs.exists(dir) && fs.getFileStatus(dir).isDirectory) {
        fs.listStatus(dir).filter(st =>
            st.isDirectory && st.getPath.getName.startsWith("_bloom_")).foreach { idx =>
          val sidecars = fs.listStatus(idx.getPath)
            .map(_.getPath.getName.stripSuffix(".bloom")).toSet
          val rootPath = dir.toUri.getPath
          val uncovered = files.map(_._1).count { f =>
            val rel = new Path(f).toUri.getPath
              .stripPrefix(rootPath).stripPrefix("/").replace("/", "%2F")
            !sidecars.contains(rel)
          }
          if (uncovered > 0)
            out += Advice(name, "reindex-bloom", uncovered.toLong,
              s"$uncovered data files lack ${idx.getPath.getName} sidecars - rebuild the index")
        }
        // merge-on-read tombstone debt (A42): every accumulated
        // deletion-vector row is an anti-join probe each read pays —
        // metric from sidecar FOOTERS only (the A25 discipline,
        // distributed), never a row scan. morCompact clears it.
        // both sidecar flavors count: position vectors (_dv) and
        // equality erasures (_eq, A44) each cost an anti-join probe
        // per read; morCompact folds and clears both
        val morRows = Seq(GraftMor.DvDir, GraftMor.EqDir).map { d =>
          val sub = new Path(dir, d)
          if (!fs.exists(sub)) 0L
          else {
            val fsFiles = GraftIO.walkFiles(fs, sub)
              .collect { case f if f.getPath.getName.endsWith(".parquet") =>
                f.getPath.toString }
            GraftBloomIndex.footerRowCounts(s, fsFiles).values.sum
          }
        }.sum
        if (morRows > morTombstoneBudget)
          out += Advice(name, "mor-compact", morRows,
            s"$morRows merge-on-read tombstones pending across _dv/_eq (budget $morTombstoneBudget) - run morCompact")
        // A47: ANY live equality sidecar is a serving split, whatever
        // its volume — the SQL catalog refuses the table by name, raw
        // parquet readers silently bypass the GDPR mask, and only
        // morCompact reunifies the surfaces. Act-clears-it.
        val eqLive = fs.exists(new Path(dir, GraftMor.EqDir))
        if (eqLive)
          out += Advice(name, "mor-unserved", 1L,
            s"equality mutation epochs (${GraftMor.EqDir}) pending: engine " +
              "surfaces compose the mask per read, but raw parquet reads " +
              "bypass it entirely and COW rewrites are refused - run " +
              "morCompact to fold the erasure physically")
        // A65: a declared bucket layout with stray files (a morUpsert
        // append, a delta-DML insert outside the bucket=N dirs) has
        // silently lost its zero-exchange joins — the scan degrades to
        // UnknownPartitioning honestly, but only a rebucket rewrite
        // brings the co-location back. Act-clears-it.
        graft.sources.v2.GraftLayout.readMarker(fs, tableDir) match {
          case Some(l) if l.kind == "bucket" =>
            // SAME parse as the scan's co-location gate — shared rule
            // in GraftLayout.bucketIdOf so the two can never drift
            val cells = graft.sources.v2.GraftLayout.totalBuckets(l)
            val stray = files.map(_._1).count { f =>
              !graft.sources.v2.GraftLayout.bucketIdOf(tableDir, f)
                .exists(_ < cells)
            }
            if (stray > 0)
              out += Advice(name, "rebucket", stray.toLong,
                s"$stray data files sit outside the declared " +
                  s"bucket(${l.cols.mkString(",")},${l.buckets}) layout - joins " +
                  "shuffle again until GraftLayout.rebucket restores " +
                  "co-location (morCompact first if masks are live)")
          case _ => ()
        }
      }
    }
    out.result().sortBy(a => (a.table, a.rule))
  }

  /** A37: clustering depth of a column, from footers only — for each
    * row group's [min,max] on `col`, how many row groups' ranges
    * overlap it, averaged. 1.0 = perfectly clustered (disjoint
    * ranges: every range predicate prunes to ~one group); ≈ the
    * group count = random layout (min/max pruning is useless, every
    * scan opens everything). The Delta/Iceberg OPTIMIZE metric, and
    * the signal that decides between leaving a table alone and a
    * sort/Z-order rewrite (A15). Cost: O(row groups) footer reads +
    * an O(n²) driver comparison over row-group COUNT — metadata
    * scale, never rows.
    */
  def clusteringDepth(s: SparkSession, tablePath: String, col: String): Double = {
    val c = s.sessionState.newHadoopConf()
    val dt = graft.sources.GraftIO.readParquet(s, tablePath).schema(col).dataType
    val v2 = graft.sources.v2.GraftV2
    val bounds = v2.dataFiles(tablePath, c).flatMap { f =>
      import scala.jdk.CollectionConverters._
      v2.withReader(f, c)(_.getFooter.getBlocks.asScala.toList).flatMap { b =>
        for {
          mn <- v2.statBound(b, col, dt, f, min = true)
          mx <- v2.statBound(b, col, dt, f, min = false)
        } yield (mn, mx)
      }
    }
    val n = bounds.length
    if (n <= 1) 1.0
    else {
      val total = bounds.map { case (mn, mx) =>
        bounds.count { case (mn2, mx2) =>
          v2.cmpCatalyst(dt, mn, mx2) <= 0 && v2.cmpCatalyst(dt, mn2, mx) <= 0
        }
      }.sum
      total.toDouble / n
    }
  }

  /** The A37 metric as advice: recommend a sort/Z-order rewrite when
    * ranges overlap more than `maxDepth`-fold on average.
    */
  def adviseClustering(s: SparkSession, tablePath: String, col: String,
      maxDepth: Double = 2.0): Option[Advice] = {
    val d = clusteringDepth(s, tablePath, col)
    if (d > maxDepth)
      Some(Advice(new Path(tablePath).getName.stripSuffix(".parquet"),
        "cluster", math.round(d),
        f"row-group ranges on '$col' overlap $d%.1f-fold on average - " +
          "sort or Z-order rewrite (A15) to restore min/max pruning"))
    else None
  }

  /** A34 extended to VECTOR INDEXES: a metadata-only sweep of a
    * persisted ANN layout — no vectors read. Covers BOTH stores: the
    * IVF layout (`$idx/lists`, `centroid_id=` partitions) and, since
    * r11, the HNSW layout (`$idx/shards`, `entry_id=` partitions) —
    * the D15 absorb cadence fragments entry shards exactly as G19
    * fragments IVF lists. Rules per layout:
    *  - `compact-lists` / `compact-shards` (D14/D16): an absorb
    *    cadence leaves one file per batch per touched partition —
    *    past `maxFilesPerList`, probe open-cost grows with batch
    *    count, not data; `ivfCompact` / `hnswCompact` clears it.
    *  - `rebalance-lists` / `rebalance-shards` (D2/D11): file-BYTE
    *    skew beyond `maxListSkew`× the mean says the trained
    *    artifact (centroids / routing nodes) no longer fits the data
    *    distribution — probes against the hot partition do that
    *    multiple of the average work; a retrain/rebuild restores
    *    balance.
    * Acting on the advice clears it (the A34 contract).
    */
  def adviseVectorIndex(s: SparkSession, indexPath: String,
      maxFilesPerList: Int = 4, maxListSkew: Double = 4.0): Seq[Advice] = {
    val conf = s.sessionState.newHadoopConf()
    val idxName = new Path(indexPath).getName
    def sweep(sub: String, prefix: String): Seq[(String, Int, Long)] = {
      val d = new Path(s"$indexPath/$sub")
      val fs = d.getFileSystem(conf)
      if (!fs.exists(d)) Seq.empty
      else fs.listStatus(d).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
        .map { st =>
          val files = fs.listStatus(st.getPath)
            .filter(_.getPath.getName.endsWith(".parquet"))
          (st.getPath.getName, files.length, files.map(_.getLen).sum)
        }
    }
    def layoutAdvice(parts: Seq[(String, Int, Long)], what: String,
        compactRule: String, rebalanceRule: String,
        compactAction: String, drift: String): Seq[Advice] = {
      if (parts.isEmpty) return Seq.empty
      val out = Seq.newBuilder[Advice]
      val fragmented = parts.filter(_._2 > maxFilesPerList)
      if (fragmented.nonEmpty)
        out += Advice(idxName, compactRule, fragmented.length.toLong,
          s"${fragmented.length} of ${parts.length} $what carry more than " +
            s"$maxFilesPerList files (max ${parts.map(_._2).max}) - run $compactAction")
      val meanBytes = parts.map(_._3).sum.toDouble / parts.length
      val hot = parts.maxBy(_._3)
      if (meanBytes > 0 && hot._3 > meanBytes * maxListSkew)
        out += Advice(idxName, rebalanceRule, math.round(hot._3 / meanBytes),
          f"${hot._1} holds ${hot._3 / meanBytes}%.1fx the mean $what bytes - " +
            s"$drift; retrain/rebuild the index")
      out.result()
    }
    layoutAdvice(sweep("lists", "centroid_id="), "lists",
      "compact-lists", "rebalance-lists", "ivfCompact", "centroids drifted") ++
    layoutAdvice(sweep("shards", "entry_id="), "shards",
      "compact-shards", "rebalance-shards", "hnswCompact", "routing drifted")
  }

  /** `retrain-centroids` (D17): the QUALITY drift signal next to the
    * layout signals above — `adviseVectorIndex` sees byte skew (a
    * distribution shift big enough to bend the layout), this sees the
    * shift BEFORE absorbing it: the candidate batch's centroid
    * alignment (mean cosine to its assigned centroids) is compared
    * per list against the index's own corpus alignment
    * (`Similarity.ivfDrift`); any drifted list means the batch should
    * trigger a retrain, not an absorb.
    * Unlike the metadata-only A34 sweep this reads vectors (one
    * corpus-linear pass) — it runs at absorb decision points, not
    * nightly over every table. Acting on the advice (retraining the
    * index with the batch's distribution represented) clears it — the
    * A34 contract.
    */
  def adviseVectorDrift(s: SparkSession, indexPath: String,
      batch: DataFrame, thresholdPct: Int = 30): Seq[Advice] = {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val idxName = new Path(indexPath).getName
    val d = graft.operators.Similarity.ivfDrift(s, indexPath, batch, thresholdPct)
      .where(col("drifted") === 1L)
      .agg(count(lit(1)).as("n"), sum("n_batch").as("nv")).head()
    val nLists = d.getLong(0)
    if (nLists == 0L) Seq.empty
    else Seq(Advice(idxName, "retrain-centroids", nLists,
      s"$nLists list(s) carrying ${d.getLong(1)} batch vectors align " +
        s">$thresholdPct% worse with the trained centroids than the " +
        "corpus does - retrain with this distribution represented " +
        "before absorbing"))
  }

  /** D18's advisor leg: read the persisted recall measurement
    * (one-row `_recall/` sidecar — metadata-grain, no corpus touch)
    * and turn it into advice. No measurement on record is itself a
    * finding: an unaudited approximate index is a hope, not a number.
    * Act-clears-it both ways — running `ivfRecallAudit` writes the
    * meter, and a retrain + re-audit above the floor silences the
    * rebuild signal.
    */
  def adviseVectorRecall(s: SparkSession, indexPath: String,
      minRecallMicro: Long = 900000L): Seq[Advice] = {
    val idxName = new Path(indexPath).getName
    val fs = new Path(indexPath)
      .getFileSystem(s.sessionState.newHadoopConf())
    // name the audit that fits the LAYOUT: centroid lists → IVF,
    // entry shards → the HNSW graph index (r12 — both stores carry
    // the same one-row `_recall/` meter)
    val audit =
      if (fs.exists(new Path(s"$indexPath/shards"))) "hnswRecallAudit"
      else "ivfRecallAudit"
    val p = new Path(s"$indexPath/_recall")
    if (!fs.exists(p))
      Seq(Advice(idxName, "audit-recall", 0L,
        s"no recall measurement on record - run $audit so " +
          "serving quality is a measured number"))
    else {
      val r = graft.sources.GraftIO.readParquet(s, s"$indexPath/_recall").head()
      val rm = r.getAs[Long]("recall_micro")
      if (rm >= minRecallMicro) Seq.empty
      else Seq(Advice(idxName, "rebuild-index", rm,
        s"measured recall@k is $rm micro at n_probe=${r.getAs[Int]("n_probe")}, " +
          s"under the $minRecallMicro floor - retrain/rebuild the index " +
          "or raise the probe breadth, then re-audit"))
    }
  }

  /** A48's advisor leg: how much of the table is WHOLLY past the
    * retention cutoff, priced from parquet footers alone (the A25
    * one-task-per-footer pass — no row is read). Fires when whole
    * files are droppable; acting (`GraftMor.retentionSweep`) unlinks
    * them and clears the signal. Straddling files are mentioned in
    * the detail but don't fire it — their expired rows tombstone at
    * sweep time and fold at compaction, and their footers keep the
    * old min until then.
    */
  def adviseRetention(s: SparkSession, tablePath: String, tsCol: String,
      cutoff: java.time.LocalDateTime): Seq[Advice] = {
    val cutoffMicros = GraftMor.toMicros(cutoff)
    val stats = GraftMor.footerTsStats(s, tablePath, tsCol)
    val wholly = stats.count {
      case (_, Some((_, mx))) => mx < cutoffMicros
      case _ => false
    }
    val straddling = stats.count {
      case (_, Some((mn, mx))) => mn < cutoffMicros && mx >= cutoffMicros
      case (_, None) => true
    }
    if (wholly == 0) Seq.empty
    else Seq(Advice(new Path(tablePath).getName, "retention-due", wholly.toLong,
      s"$wholly of ${stats.length} data files lie wholly before " +
        s"$cutoff by footer stats (plus $straddling straddling) - " +
        "run retentionSweep: the whole files unlink with zero rows read"))
  }

  /** The advice as a small driver-local DataFrame for display. */
  def adviseReport(s: SparkSession, root: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = advise(s, root).map(a => Row(a.table, a.rule, a.metric, a.detail)).asJava
    s.createDataFrame(rows, StructType(Seq(
      StructField("table", StringType), StructField("rule", StringType),
      StructField("metric", LongType), StructField("detail", StringType))))
  }
}
