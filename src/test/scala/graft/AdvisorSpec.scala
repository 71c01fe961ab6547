package graft

import graft.sources.{GraftAdvisor, GraftBloomIndex, GraftCatalog}
import org.apache.spark.sql.functions._

/** A34: maintenance advisor — each rule fires on its planted
  * condition and stays silent on a healthy table.
  */
class AdvisorSpec extends SparkSpecBase {

  test("each maintenance rule fires on its planted condition only") {
    val root = graft.sources.GraftSink.scratchDir + "/spec_advisor"
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")

    // healthy: few, well-sized (for this corpus) files, no log, no index
    orders.coalesce(1).write.mode("overwrite").parquet(s"$root/healthy.parquet")
    // fragmented: many tiny files
    orders.repartition(16).write.mode("overwrite").parquet(s"$root/fragged.parquet")
    // bloat: a long published log + an unpublished orphan append
    orders.coalesce(1).write.mode("overwrite").parquet(s"$root/bloat.parquet")
    (1 to 4).foreach(_ => new GraftCatalog(spark, root).publishSnapshot("bloat"))
    import spark.implicits._
    Seq((1L, 2L, 3.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
      .coalesce(1).write.mode("append").parquet(s"$root/bloat.parquet")
    // stale index: bloom built, then a file appended without reindex
    orders.repartition(2).write.mode("overwrite").parquet(s"$root/stale.parquet")
    GraftBloomIndex.build(spark, s"$root/stale.parquet", "o_orderkey")
    Seq((9L, 9L, 9.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
      .coalesce(1).write.mode("append").parquet(s"$root/stale.parquet")

    val advice = GraftAdvisor.advise(spark, root,
      smallFileBytes = 32L * 1024 * 1024, minFilesForCompaction = 8, keepLast = 3)
    val byTable = advice.groupBy(_.table).view.mapValues(_.map(_.rule).toSet).toMap

    assert(!byTable.contains("healthy"), advice.toString)
    // 16 unpublished files also flag A69 footer-planning (no
    // stats-bearing manifest) — cleared by publishSnapshot
    assert(byTable("fragged") === Set("compact", "publish-stats"))
    assert(byTable("bloat") === Set("expire-snapshots", "vacuum"))
    assert(byTable("stale") === Set("reindex-bloom"))

    // acting on the advice clears it
    GraftBloomIndex.build(spark, s"$root/stale.parquet", "o_orderkey")
    val c = new GraftCatalog(spark, root)
    c.expireSnapshots("bloat", keepLast = 2)
    c.vacuum("bloat")
    val after = GraftAdvisor.advise(spark, root, keepLast = 3)
      .filter(a => a.table == "stale" || a.table == "bloat")
    assert(after.isEmpty, after.toString)
  }

  test("A42: tombstone-debt advice fires past the budget and morCompact clears it") {
    val root = graft.sources.GraftSink.scratchDir + "/adv_mor_root"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val tbl = s"$root/orders.parquet"
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .coalesce(2).write.mode("overwrite").parquet(tbl)
    // below budget: silent
    graft.sources.GraftMor.morDelete(spark, tbl, col("o_orderkey") % 97 === 0)
    def morAdvice(budget: Long) =
      GraftAdvisor.advise(spark, root, morTombstoneBudget = budget)
        .filter(_.rule == "mor-compact")
    val doomed = spark.read.parquet(s"$sfDir/orders.parquet")
      .where(col("o_orderkey") % 97 === 0).count()
    assert(morAdvice(budget = doomed + 1).isEmpty)
    // past budget: fires, metric = footer-exact tombstone rows
    val fired = morAdvice(budget = doomed - 1)
    assert(fired.map(_.metric) === Seq(doomed), fired.toString)
    // acting clears it
    graft.sources.GraftMor.morCompact(spark, tbl)
    assert(morAdvice(budget = 0).isEmpty)
    // the A44 equality flavor meters into the same debt signal
    import spark.implicits._
    graft.sources.GraftMor.morErase(spark, tbl,
      Seq(1L, 2L, 3L).toDF("o_orderkey"), Seq("o_orderkey"))
    val eqFired = morAdvice(budget = 2)
    assert(eqFired.map(_.metric) === Seq(3L), eqFired.toString)
    graft.sources.GraftMor.morCompact(spark, tbl)
    assert(morAdvice(budget = 0).isEmpty)
  }

  test("A37: clustering depth separates sorted from shuffled layouts; advice fires on overlap") {
    val root = graft.sources.GraftSink.scratchDir + "/spec_cluster"
    // sf0.01 for enough rows to split into many row groups at a 16 KB
    // block size — sf0.001's 1500 rows fit in ~2 groups, where a
    // shuffled layout can only reach depth 2
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    // sorted layout: many row groups with disjoint key ranges
    val sorted = s"$root/sorted.parquet"
    orders.orderBy("o_orderkey").coalesce(1)
      .write.option("parquet.block.size", "16384")
      .mode("overwrite").parquet(sorted)
    // shuffled layout: the same rows hash-scattered across row groups
    val messy = s"$root/messy.parquet"
    orders.orderBy(pmod(col("o_orderkey") * 2654435761L, lit(997)))
      .coalesce(1)
      .write.option("parquet.block.size", "16384")
      .mode("overwrite").parquet(messy)
    val dSorted = GraftAdvisor.clusteringDepth(spark, sorted, "o_orderkey")
    val dMessy = GraftAdvisor.clusteringDepth(spark, messy, "o_orderkey")
    assert(dSorted < 1.5, s"sorted layout must be near depth 1, got $dSorted")
    assert(dMessy > dSorted * 2, s"shuffled must overlap: $dMessy vs $dSorted")
    assert(GraftAdvisor.adviseClustering(spark, sorted, "o_orderkey").isEmpty)
    val adv = GraftAdvisor.adviseClustering(spark, messy, "o_orderkey")
    assert(adv.exists(_.rule == "cluster"), adv.toString)
  }

  test("compactTable folds fragmented layouts content-identically and clears the compact advice") {
    import org.apache.spark.sql.functions._
    val root = graft.sources.GraftSink.scratchDir + "/adv_compact_root"
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    val tbl = s"$root/orders.parquet"
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .repartition(16).write.mode("overwrite").parquet(tbl)
    val before = spark.read.parquet(tbl).collect().map(_.toString).sorted
    // the metadata sweep flags the fragmentation
    val adv = GraftAdvisor.advise(spark, root, minFilesForCompaction = 8)
    assert(adv.exists(_.rule == "compact"), adv.toString)
    // flat compaction: tiny table folds to one balanced file
    graft.sources.GraftSink.compactTable(spark, tbl)
    val files = new java.io.File(tbl).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files === 1, s"expected 1 file, got $files")
    assert(spark.read.parquet(tbl).collect().map(_.toString).sorted
      === before, "compaction must be content-identical")
    assert(GraftAdvisor.advise(spark, root, minFilesForCompaction = 8)
      .forall(_.rule != "compact"), "acting on the advice must clear it")
    // partitioned compaction: one file per partition dir
    val ptbl = s"$root/orders_part.parquet"
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .repartition(16).write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(ptbl)
    graft.sources.GraftSink.compactTable(spark, ptbl, Seq("o_orderstatus"))
    new java.io.File(ptbl).listFiles().filter(_.getName.startsWith("o_orderstatus="))
      .foreach { d =>
        val n = d.listFiles().count(_.getName.endsWith(".parquet"))
        assert(n === 1, s"partition ${d.getName}: $n files")
      }
    assert(spark.read.parquet(ptbl)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .collect().map(_.toString).sorted === before)
  }

  test("vector-index advice flags fragmented lists; acting on it clears the advice") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions._
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_adv").toString
    Similarity.ivfIncrementalTopk(spark, sfDir, indexPath = Some(idx)).count()
    // freshly built: no fragmentation advice
    assert(GraftAdvisor.adviseVectorIndex(spark, idx, maxFilesPerList = 4)
      .forall(_.rule != "compact-lists"))
    // absorb a batch per 'day' → lists fragment past the threshold
    (0 until 6).foreach { b =>
      val fresh = spark.range(600000L + b * 8, 600000L + b * 8 + 8)
        .select(col("id").as("vec_id"),
          expr("transform(sequence(1, 64), i -> CAST(pmod(id * i, 71) AS DOUBLE) / 71.0)")
            .as("emb"))
      Similarity.ivfAppend(spark, idx, fresh)
    }
    val adv = GraftAdvisor.adviseVectorIndex(spark, idx, maxFilesPerList = 4)
    assert(adv.exists(_.rule == "compact-lists"), adv.toString)
    // the metadata sweep never reads vectors: advice is file-count math
    Similarity.ivfCompact(spark, idx, maxFiles = 4)
    assert(GraftAdvisor.adviseVectorIndex(spark, idx, maxFilesPerList = 4)
      .forall(_.rule != "compact-lists"),
      "acting on the advice must clear it")
  }

  test("vector-index advice covers the HNSW shard layout; hnswCompact clears it") {
    import graft.operators.Hnsw
    import org.apache.spark.sql.functions._
    val idx = java.nio.file.Files.createTempDirectory("graft_hnsw_adv").toString
    Hnsw.hnswPersistedTopk(spark, sfDir, indexPath = Some(idx)).count()
    assert(GraftAdvisor.adviseVectorIndex(spark, idx, maxFilesPerList = 4)
      .forall(_.rule != "compact-shards"), "fresh build must not be fragmented")
    // an absorb per 'day' → entry shards fragment past the threshold
    (0 until 6).foreach { b =>
      val fresh = spark.range(700000L + b * 8, 700000L + b * 8 + 8)
        .select(col("id").as("vec_id"),
          expr("transform(sequence(1, 64), i -> CAST(pmod(id * i, 71) AS DOUBLE) / 71.0)")
            .as("emb"))
      Hnsw.hnswAbsorb(spark, idx, fresh)
    }
    val adv = GraftAdvisor.adviseVectorIndex(spark, idx, maxFilesPerList = 4)
    assert(adv.exists(_.rule == "compact-shards"), adv.toString)
    Hnsw.hnswCompact(spark, idx, maxFiles = 4)
    assert(GraftAdvisor.adviseVectorIndex(spark, idx, maxFilesPerList = 4)
      .forall(_.rule != "compact-shards"),
      "acting on the advice must clear it")
  }

  test("D18: recall audit — unaudited index flags, full-probe measures exactly 1.0, a below-floor measurement advises rebuild") {
    import graft.operators.Similarity
    val idx = graft.sources.GraftSink.scratchDir + "/advisor_recall_idx"
    new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(idx), true)
    Similarity.ivfIncrementalTopk(spark, sfDir, indexPath = Some(idx)).count()
    // no measurement on record: the advisor asks for one
    val unaudited = GraftAdvisor.adviseVectorRecall(spark, idx)
    assert(unaudited.exists(_.rule === "audit-recall"), unaudited.toString)
    // probing EVERY list is the exact search: recall must be exactly 1.0
    val rAll = Similarity.ivfRecallAudit(spark, sfDir, idx, nProbe = 16)
    assert(rAll === 1000000L, s"full-probe recall must be exact, got $rAll")
    assert(GraftAdvisor.adviseVectorRecall(spark, idx, 999999L).isEmpty,
      "an above-floor measurement is silent")
    // a starved probe measures lower (or equal); the floor decides
    val r1 = Similarity.ivfRecallAudit(spark, sfDir, idx, nProbe = 1)
    assert(r1 <= rAll)
    val fired = GraftAdvisor.adviseVectorRecall(spark, idx, r1 + 1)
    assert(fired.exists(a => a.rule === "rebuild-index" && a.metric === r1),
      fired.toString)
    assert(GraftAdvisor.adviseVectorRecall(spark, idx, r1).isEmpty,
      "a measurement meeting the floor is silent")
    // act-clears-it: re-auditing at a healthy probe width refreshes
    // the meter and silences the rebuild signal
    Similarity.ivfRecallAudit(spark, sfDir, idx, nProbe = 16)
    assert(GraftAdvisor.adviseVectorRecall(spark, idx, 999999L).isEmpty)
  }

  test("D18 (HNSW): graph-index recall audit — layout-aware advice, full-probe calibrates to exactly 1.0, delete + re-home keeps coverage exact") {
    import graft.operators.Hnsw
    val idx = graft.sources.GraftSink.scratchDir + "/advisor_hnsw_recall"
    new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(idx), true)
    Hnsw.hnswPersistedTopk(spark, sfDir, indexPath = Some(idx)).count()
    // the advisor names the GRAPH audit for a shard layout
    val unaudited = GraftAdvisor.adviseVectorRecall(spark, idx)
    assert(unaudited.exists(a => a.rule === "audit-recall" &&
      a.detail.contains("hnswRecallAudit")), unaudited.toString)
    // probing EVERY shard is the exact search (each vector lives in
    // >=1 shard): the calibration must measure exactly 1.0
    val rAll = Hnsw.hnswRecallAudit(spark, sfDir, idx, probeAll = true)
    assert(rAll === 1000000L, s"full-probe recall must be exact, got $rAll")
    assert(GraftAdvisor.adviseVectorRecall(spark, idx, 999999L).isEmpty)
    // the beam path is the serving approximation: measured, banded
    val rBeam = Hnsw.hnswRecallAudit(spark, sfDir, idx)
    assert(rBeam <= 1000000L && rBeam >= 600000L,
      s"beam recall out of band: $rBeam")
    // floor semantics: a measurement under the floor advises rebuild
    val fired = GraftAdvisor.adviseVectorRecall(spark, idx, rBeam + 1)
    assert(fired.exists(a => a.rule === "rebuild-index" && a.metric === rBeam),
      fired.toString)
    // DELETE + RE-HOME (the D13 coverage repair): purge keys including
    // a ROUTED node, then the full-probe audit must STILL measure
    // exactly 1.0 — no surviving vector went unreachable
    val routed = spark.read.parquet(s"$idx/routing")
      .select("vec_id").orderBy("vec_id")
      .collect().map(_.getLong(0)).take(2).toSeq
    // victims above the query sample (query_ids are vec_id < 5)
    val victims = (routed ++ Seq(101L, 202L)).distinct.filter(_ >= 5L)
    graft.operators.Hnsw.hnswDelete(spark, idx, victims)
    val postAll = Hnsw.hnswRecallAudit(spark, sfDir, idx, probeAll = true)
    // brute force still ranks the purged keys; the index RIGHTLY lost
    // them — so the only pairs allowed to go missing are (query,
    // victim) ones: at most |victims| x NQueries(=5). Anything beyond
    // that is a surviving vector the delete made unreachable.
    val meter = spark.read.parquet(s"$idx/_recall").head()
    assert(meter.getAs[Long]("n_expected") - meter.getAs[Long]("n_matched")
      <= victims.length.toLong * 5L,
      s"only the purged keys may go missing after delete+re-home: $meter")
    assert(postAll >= 600000L, s"post-delete coverage collapsed: $postAll")
  }

  test("A65: rebucket advice fires on stray files outside a declared bucket layout; GraftLayout.rebucket clears it") {
    import graft.sources.v2.GraftLayout
    val root = graft.sources.GraftSink.scratchDir + "/spec_adv_bucket"
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(rp, true)
    val tbl = s"$root/bkt.parquet"
    // a shaped insert's state: files in bucket=N dirs...
    val df = spark.range(1000).selectExpr("id AS k", "id * 2 AS v")
    GraftLayout.shape(df,
        GraftLayout.Layout("bucket", Seq("k"), 4))
      .write.partitionBy(GraftLayout.BucketDirCol).parquet(tbl)
    GraftLayout.writeMarker(fs, tbl, GraftLayout.Layout("bucket", Seq("k"), 4))
    assert(!GraftAdvisor.advise(spark, root).exists(_.rule == "rebucket"),
      "a clean bucket layout must not advise")
    // ...then a stray append outside the bucket dirs (the delta-DML /
    // morUpsert shape)
    import spark.implicits._
    Seq((5000L, 1L)).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(tbl)
    val fired = GraftAdvisor.advise(spark, root).filter(_.rule == "rebucket")
    assert(fired.nonEmpty && fired.head.metric >= 1L, fired.toString)
    // acting on it clears it, and the values survive
    GraftLayout.rebucket(spark, tbl)
    assert(!GraftAdvisor.advise(spark, root).exists(_.rule == "rebucket"),
      "rebucket must clear the advice")
    assert(spark.read.parquet(tbl).where(col("k") === 5000L).count() === 1L,
      "the stray row must survive the rebucket")
    assert(spark.read.parquet(tbl).count() === 1001L)
  }
}
