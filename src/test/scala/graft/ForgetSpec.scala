package graft

import org.apache.spark.sql.functions._
import graft.sources.{GraftForget, GraftMor}
import graft.operators.{Bm25, Hnsw, Similarity}

/** A47: one forget call must erase a doc-id set from the table AND
  * every derived store that learned it — the composition the per-leg
  * specs (A44, D13, BM25 tombstones) cannot see.
  */
class ForgetSpec extends SparkSpecBase {

  private def hfs(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def wipe(p: String): String = {
    hfs(p).delete(new org.apache.hadoop.fs.Path(p), true); p
  }

  test("A47: forgetDocs erases across table, BM25 index, IVF and HNSW; reruns converge; compaction folds the BM25 tombstones") {
    val scratch = graft.sources.GraftSink.scratchDir
    val tbl = wipe(s"$scratch/forget_tbl")
    val bm = wipe(s"$scratch/forget_bm25")
    val ivf = wipe(s"$scratch/forget_ivf")
    val hn = wipe(s"$scratch/forget_hnsw")
    val docs = new graft.sources.GraftCatalog(spark, sfDir)
      .table("documents").select("doc_id", "text")
    docs.write.parquet(tbl)
    Bm25.applyIndexBatch(docs, 0L, bm)
    Similarity.ivfIncrementalTopk(spark, sfDir, indexPath = Some(ivf)).count()
    Hnsw.hnswPersistedTopk(spark, sfDir, indexPath = Some(hn)).count()
    // victims: one doc each store demonstrably SERVES right now
    val bmVictim = Bm25.serveIndexedBm25(spark, bm)
      .head().getAs[Long]("doc_id")
    val ivfVictim = Similarity.serveIvf(spark, sfDir, ivf, 4)
      .head().getAs[Long]("neighbor_id")
    val hnVictim = Hnsw.serveHnsw(spark, sfDir, hn)
      .head().getAs[Long]("neighbor_id")
    val victims = Seq(bmVictim, ivfVictim, hnVictim).distinct
    val vAny = victims.map(x => x: Any)
    val report = GraftForget.forgetDocs(spark, victims,
      tablePath = Some(tbl), bm25Root = Some(bm),
      ivfIndex = Some(ivf), hnswIndex = Some(hn))
    assert(report.map(_._1) === Seq("table", "bm25", "ivf", "hnsw"))
    // every store forgot
    assert(GraftMor.morRead(spark, tbl)
      .where(col("doc_id").isin(vAny: _*)).count() === 0, "table leg")
    val bmPost = Bm25.serveIndexedBm25(spark, bm).localCheckpoint(true)
    assert(bmPost.where(col("doc_id").isin(vAny: _*)).count() === 0, "bm25 leg")
    assert(Similarity.serveIvf(spark, sfDir, ivf, 4)
      .where(col("neighbor_id").isin(vAny: _*)).count() === 0, "ivf leg")
    assert(Hnsw.serveHnsw(spark, sfDir, hn)
      .where(col("neighbor_id").isin(vAny: _*)).count() === 0, "hnsw leg")
    // the BM25 stats are the purged corpus's own: the masked sidecar
    // lost exactly the victims present in it
    val nDocs = spark.read.parquet(s"$bm/doclen").count()
    val nVictimsInSidecar = spark.read.parquet(s"$bm/doclen")
      .where(col("doc_id").isin(vAny: _*)).count()
    assert(nVictimsInSidecar > 0, "victims were indexed pre-forget")
    // a rerun (crashed compliance job's retry) converges
    val report2 = GraftForget.forgetDocs(spark, victims,
      tablePath = Some(tbl), bm25Root = Some(bm),
      ivfIndex = Some(ivf), hnswIndex = Some(hn))
    assert(report2.length === 4)
    assert(Bm25.serveIndexedBm25(spark, bm).collect().map(_.toSeq).toSeq
      === bmPost.collect().map(_.toSeq).toSeq, "rerun is serve-identical")
    // compaction folds the BM25 tombstones physically: sidecar gone,
    // serve identical, the purged docs absent from raw segment bytes
    Bm25.compactStreamedIndex(spark, bm)
    assert(!hfs(bm).exists(new org.apache.hadoop.fs.Path(s"$bm/_deleted")))
    assert(Bm25.serveIndexedBm25(spark, bm).collect().map(_.toSeq).toSeq
      === bmPost.collect().map(_.toSeq).toSeq, "fold is serve-identical")
    assert(spark.read.parquet(s"$bm/doclen")
      .where(col("doc_id").isin(vAny: _*)).count() === 0,
      "the folded segments physically forgot")
    assert(spark.read.parquet(s"$bm/doclen").count()
      === nDocs - nVictimsInSidecar)
    graft.GraftSession.releaseCheckpoint(bmPost)
  }
}
