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

  test("A47: forgetDocs erases across table, BM25 index, IVF, HNSW and PQ; reruns converge; compaction folds the BM25 tombstones") {
    val scratch = graft.sources.GraftSink.scratchDir
    val tbl = wipe(s"$scratch/forget_tbl")
    val bm = wipe(s"$scratch/forget_bm25")
    val ivf = wipe(s"$scratch/forget_ivf")
    val hn = wipe(s"$scratch/forget_hnsw")
    val pq = wipe(s"$scratch/forget_pq")
    val docs = new graft.sources.GraftCatalog(spark, sfDir)
      .table("documents").select("doc_id", "text")
    docs.write.parquet(tbl)
    Bm25.applyIndexBatch(docs, 0L, bm)
    Similarity.ivfIncrementalTopk(spark, sfDir, indexPath = Some(ivf)).count()
    Hnsw.hnswPersistedTopk(spark, sfDir, indexPath = Some(hn)).count()
    Similarity.buildPqIndex(spark, sfDir, pq)
    val q0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id") === 0).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble)
    // victims: one doc each store demonstrably SERVES right now
    val bmVictim = Bm25.serveIndexedBm25(spark, bm)
      .head().getAs[Long]("doc_id")
    val ivfVictim = Similarity.serveIvf(spark, sfDir, ivf, 4)
      .head().getAs[Long]("neighbor_id")
    val hnVictim = Hnsw.serveHnsw(spark, sfDir, hn)
      .head().getAs[Long]("neighbor_id")
    val pqVictim = Similarity.pqPersistedTopk(spark, pq, q0, 2)
      .where(col("neighbor_id") =!= 0L).head().getAs[Long]("neighbor_id")
    val victims = Seq(bmVictim, ivfVictim, hnVictim, pqVictim).distinct
    val vAny = victims.map(x => x: Any)
    val report = GraftForget.forgetDocs(spark, victims,
      tablePath = Some(tbl), bm25Root = Some(bm),
      ivfIndex = Some(ivf), hnswIndex = Some(hn), pqIndex = Some(pq))
    assert(report.map(_._1) ===
      Seq("table", "table-residual", "bm25", "ivf", "hnsw", "pq"))
    assert(report.find(_._1 == "table-residual").get._2.contains("morCompact"),
      "the audit trail must name the raw-read residual surface")
    // every store forgot
    assert(GraftMor.morRead(spark, tbl)
      .where(col("doc_id").isin(vAny: _*)).count() === 0, "table leg")
    val bmPost = Bm25.serveIndexedBm25(spark, bm).localCheckpoint(true)
    assert(bmPost.where(col("doc_id").isin(vAny: _*)).count() === 0, "bm25 leg")
    assert(Similarity.serveIvf(spark, sfDir, ivf, 4)
      .where(col("neighbor_id").isin(vAny: _*)).count() === 0, "ivf leg")
    assert(Hnsw.serveHnsw(spark, sfDir, hn)
      .where(col("neighbor_id").isin(vAny: _*)).count() === 0, "hnsw leg")
    assert(Similarity.pqPersistedTopk(spark, pq, q0, 10)
      .where(col("neighbor_id").isin(vAny: _*)).count() === 0, "pq leg")
    assert(spark.read.parquet(s"$pq/codes")
      .where(col("vec_id").isin(vAny: _*)).count() === 0,
      "the code table physically forgot")
    // the BM25 stats are the purged corpus's own: the masked sidecar
    // lost exactly the victims present in it
    val nDocs = spark.read.parquet(s"$bm/doclen").count()
    val nVictimsInSidecar = spark.read.parquet(s"$bm/doclen")
      .where(col("doc_id").isin(vAny: _*)).count()
    assert(nVictimsInSidecar > 0, "victims were indexed pre-forget")
    // a rerun (crashed compliance job's retry) converges
    val report2 = GraftForget.forgetDocs(spark, victims,
      tablePath = Some(tbl), bm25Root = Some(bm),
      ivfIndex = Some(ivf), hnswIndex = Some(hn), pqIndex = Some(pq))
    assert(report2.length === 6)
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

  test("A47: an erased key serves from NO engine read surface — catalog masks, SQL refuses by name, compaction reunifies") {
    val scratch = graft.sources.GraftSink.scratchDir
    val wh = wipe(s"$scratch/forget_sql")
    val tbl = s"$wh/db/docs_fg.parquet"
    val docs = new graft.sources.GraftCatalog(spark, sfDir)
      .table("documents").select("doc_id", "text")
    docs.write.parquet(tbl)
    val victim = docs.orderBy("doc_id").head().getLong(0)
    val report = GraftForget.forgetDocs(spark, Seq(victim),
      tablePath = Some(tbl))
    assert(report.map(_._1) === Seq("table", "table-residual"))
    def gone(df: org.apache.spark.sql.DataFrame) =
      df.where(col("doc_id") === victim).count() === 0L
    // surface 1: morRead
    assert(gone(GraftMor.morRead(spark, tbl)), "morRead leg")
    // surface 2: the programmatic catalog (pinned AND fresh)
    val cat = new graft.sources.GraftCatalog(spark, s"$wh/db")
    assert(gone(cat.table("docs_fg")), "GraftCatalog.table leg")
    assert(gone(cat.scan("docs_fg")), "GraftCatalog.scan leg")
    // surface 3: the SQL catalog COMPOSES the equality mask
    // split-locally (r12 late: refusal upgraded to composition) —
    // SELECT serves the erased-free table immediately
    graft.sources.v2.GraftTableCatalog.register(spark, wh, "graftfg")
    spark.sql("REFRESH TABLE graftfg.db.docs_fg")
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graftfg.db.docs_fg WHERE doc_id = $victim")
      .head().getLong(0) === 0L, "SQL must mask the erased key")
    assert(spark.sql("SELECT count(*) AS n FROM graftfg.db.docs_fg")
      .head().getLong(0) ===
      GraftMor.morRead(spark, tbl).count(), "SQL == morRead on the eq table")
    // surface 4: the v2 provider path composes identically
    assert(gone(spark.read.format("graft").load(tbl)), "v2 provider leg")
    // the advisor still flags the raw-read residual until the fold
    val advice = graft.sources.GraftAdvisor.advise(spark, s"$wh/db")
    assert(advice.exists(_.rule == "mor-unserved"),
      "mor-unserved must fire while _eq is live")
    // a sidecar CHANGE after the pin refuses at scan time (erasure
    // outranks snapshot stability) until REFRESH re-pins
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " || " + chain(t.getCause)
    GraftMor.morCompact(spark, tbl)
    val e = intercept[Throwable](
      spark.sql("SELECT count(*) FROM graftfg.db.docs_fg").collect())
    assert(chain(e).contains("REFRESH"), chain(e))
    // the fold + REFRESH reunifies every surface, physically
    spark.sql("REFRESH TABLE graftfg.db.docs_fg")
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graftfg.db.docs_fg WHERE doc_id = $victim")
      .head().getLong(0) === 0L, "SQL serves the erased-free table post-fold")
    assert(gone(spark.read.parquet(tbl)), "raw reads physically forgot")
    assert(!graft.sources.GraftAdvisor.advise(spark, s"$wh/db")
      .exists(_.rule == "mor-unserved"), "acting on the advice clears it")
  }
}
