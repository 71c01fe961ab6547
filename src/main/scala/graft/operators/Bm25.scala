package graft.operators

import graft.GraftSession.GrainOps
import graft.sources.GraftCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.E13: BM25 keyword retrieval over `documents` — the classic
  * inverted-index ranking function (Robertson & Zaragoza 2009,
  * "The Probabilistic Relevance Framework: BM25 and Beyond"), the
  * standard first-stage retriever a training-data pipeline uses for
  * targeted corpus search (and the lexical half of hybrid
  * lexical+vector retrieval next to D9's hash-embedding kNN).
  *
  * score(q, d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  * with k1 = 1.2, b = 0.75, idf(t) = ln((N+1)/(df+0.5)).
  *
  * Exactness: with k1 = 6/5 and b = 3/4, the tf-normalization is the
  * exact rational 44·tf·L / (20·tf·L + 6·L + 18·dl·N) (multiply
  * num/den by 20·L where avgdl = L/N), evaluated micro-scaled in
  * DECIMAL(38,0) integer arithmetic — at 100 TB, L ≈ 10^13 tokens
  * puts the numerator near 10^22, past BIGINT but comfortably inside
  * 128-bit — and integer-div'd back to a BIGINT micro value, so it is
  * bit-identical in any exact-decimal engine. idf(t) =
  * ln((2N+2)/(2·df+1)) is a ratio of exact integers micro-floored
  * under E8's documented ln-ULP assumption (per-term idf values are
  * spec-asserted against driver-side Math.log for diagnosability).
  * Per-term score = (idf_micro · tfnorm_micro) div 1e6 and the
  * per-doc sum stay in exact BIGINT.
  *
  * Scale shape: ONE tokenize pass → per-(doc, word) pre-aggregate
  * (map-side partial; the E8 distinct-pair convention), from which
  * doc lengths, corpus totals, and the query-term postings all
  * derive. The query-term filter is a BROADCAST semi-shaped join
  * applied directly to the pair table, so only postings of queried
  * terms flow further (at 100 TB: |postings| rows, not |corpus|).
  * df is a |terms|-key aggregate; N/L one broadcast single-row
  * aggregate. Top-k per query runs TWO-LEVEL — local top-k within
  * (query, pmod(doc_id, 32)) salt cells, then top-k of the ≤ 32·k
  * survivors — so no task ever materializes one query's full
  * candidate set (every doc containing a stopword-ish term is a
  * candidate; a single-window rank would funnel the corpus through
  * |queries| tasks). The two stages provably return the global
  * top-k because the (score desc, doc_id) order is total.
  */
object Bm25 {

  private def docs(s: SparkSession, dir: String): DataFrame =
    new GraftCatalog(s, dir).table("documents")

  /** Fixed keyword queries (corpus-vocabulary terms; `zebra` exercises
    * the df = 0 path — a term matching nothing contributes no rows).
    */
  private[graft] val Queries: Seq[(Long, String)] = Seq(
    0L -> "hash", 0L -> "join",
    1L -> "window", 1L -> "agg", 1L -> "spark",
    2L -> "customer", 2L -> "order", 2L -> "line",
    3L -> "slow", 3L -> "scan", 3L -> "filter", 3L -> "zebra",
    4L -> "vector", 4L -> "stream", 4L -> "batch", 4L -> "merge")

  private[graft] val K = 10

  /** The per-(doc_id, word) tf table plus corpus stats, shared by the
    * scoring join. Tokenization is E8's: lower, whitespace-split,
    * empties dropped.
    */
  def retrieve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    // ONE tokenize (the E14/H5 rule): the (doc, word, tf) grain feeds
    // THREE consumers (doc lengths, corpus token total, the queried
    // postings) — cached, so the corpus is tokenized and pair-counted
    // exactly once; uncached, each consumer re-derived it from files
    val pair = docs(s, dir)
      .select(col("doc_id"), explode(words).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .grainCache()
    val dls = pair.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      .crossJoin(pair.agg(sum("tf").as("l_tokens")))
    val qterms = Queries.toDF("query_id", "term")
    val terms = qterms.select(col("term").as("word")).distinct()
    // postings of queried terms only — the broadcast filter runs
    // BEFORE df/dl joins so downstream row counts are |postings|
    val matched = pair.join(broadcast(terms), Seq("word"))
    scoreAndRank(matched, dls, stats, qterms)
  }

  /** The scoring + ranking stage, shared by the scan-time form above
    * and the index-served form (E15): `matched` carries the queried
    * terms' postings (word, doc_id, tf), however they were produced.
    */
  private[operators] def scoreAndRank(matched: DataFrame, dls: DataFrame,
      stats: DataFrame, qterms: DataFrame): DataFrame = {
    val dfs = matched.groupBy("word").agg(count(lit(1)).as("df"))
    val scored = matched
      .join(dls, Seq("doc_id"))
      .join(broadcast(dfs), Seq("word"))
      .crossJoin(broadcast(stats))
      .select(col("word"), col("doc_id"),
        floor(log((col("n_docs") * 2L + 2L).cast("double") /
                  (col("df") * 2L + 1L).cast("double")) * 1000000.0)
          .cast("long").as("idf_micro"),
        expr("""CAST(44 AS DECIMAL(38,0)) * tf * l_tokens * 1000000 div
                (CAST(20 AS DECIMAL(38,0)) * tf * l_tokens
                 + CAST(6 AS DECIMAL(38,0)) * l_tokens
                 + CAST(18 AS DECIMAL(38,0)) * dl * n_docs)""").as("tfn_micro"))
      .select(col("word"), col("doc_id"),
        expr("(idf_micro * tfn_micro) div 1000000").as("term_score"))
    val perQueryDoc = scored
      .join(broadcast(qterms), col("word") === col("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum("term_score").as("score_micro"), count(lit(1)).as("n_terms"))
    // two-level deterministic top-k (see scale note above)
    val local = Window.partitionBy(col("query_id"), pmod(col("doc_id"), lit(32)))
      .orderBy(col("score_micro").desc, col("doc_id"))
    val global = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id"))
    perQueryDoc
      .withColumn("lrn", row_number().over(local)).where(col("lrn") <= K)
      .withColumn("rank", row_number().over(global).cast("long"))
      .where(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro"), col("n_terms"))
      .orderBy("query_id", "rank")
  }

  /** E15: persisted inverted index + index-served BM25 with
    * INCREMENTAL maintenance — the production IR shape (what Lucene
    * segments are to a search tier): postings (word, doc_id, tf) live
    * in a parquet table BUCKETED BY word, a doc-length sidecar rides
    * next to it, and queries never touch the raw corpus again. The
    * corpus is epoch-split like C12's span index: the historical
    * 4/5 builds the index once, the "new batch" (every 5th doc) is
    * absorbed APPEND-ONLY — batch postings append into the same
    * bucket layout (doc sets are disjoint, so postings merge is pure
    * append), the sidecar appends, and the corpus stats re-derive
    * from the sidecar (|docs| rows, not |tokens|). Serving filters
    * the postings table by the query terms — bucket pruning keeps the
    * scan to the terms' buckets (spec-asserted SelectedBucketsCount)
    * and the documents table is NEVER read (spec-asserted).
    *
    * Correctness gate: the result must be IDENTICAL to E13's
    * scan-time BM25 — same oracle SQL — which proves the incremental
    * index equals a from-scratch build, through the driver's hash
    * compare.
    */
  def indexServedBm25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.sources.GraftSink
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    val all = docs(s, dir)
    val isNewEpoch = pmod(col("doc_id"), lit(5L)) === 0L
    // ONE tokenize per epoch (the E14/H5 rule, applied to the BUILD):
    // an explode_outer grain keeps zero-word docs (their null-word row
    // contributes dl = 0 but still counts toward n_docs — E13's exact
    // stats), and BOTH artifacts — postings and the doc-length
    // sidecar — derive from the cached grain, so the corpus epoch is
    // read and tokenized once, not once per artifact.
    def artifacts(d: DataFrame): (DataFrame, DataFrame) = {
      val g = d.select(col("doc_id"), explode_outer(words).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        .grainCache()
      val post = g.where(col("word").isNotNull)
        .select(col("word"), col("doc_id"), col("tf"))
      val dl = g.groupBy("doc_id")
        .agg(sum(when(col("word").isNotNull, col("tf")).otherwise(0L)).as("dl"))
      (post, dl)
    }
    val dlPath = GraftSink.scratchDir + "/graft_doclen"
    // epoch-0 build (in production this already exists on disk)
    val (post0, dl0) = artifacts(all.where(!isNewEpoch))
    GraftSink.writeBucketed(post0, "graft_postings", "word")
    dl0.write.mode("overwrite").parquet(dlPath)
    // incremental absorb: append-only on both artifacts, bucket
    // layout preserved — no historical posting is rewritten
    val (post1, dl1) = artifacts(all.where(isNewEpoch))
    post1.write.mode("append")
      .bucketBy(8, "word").sortBy("word")
      .option("path", GraftSink.scratchDir + "/tbl_graft_postings")
      .format("parquet").saveAsTable("graft_postings")
    dl1.write.mode("append").parquet(dlPath)
    // serve from the index alone: postings ⋈ query terms is a
    // bucket-pruned scan; dl/stats come from the sidecar
    val qterms = Queries.toDF("query_id", "term")
    val terms = qterms.select(col("term").as("word")).distinct()
    val matched = s.table("graft_postings").join(broadcast(terms), Seq("word"))
    val sidecar = graft.sources.GraftIO.readParquet(s, dlPath)
    val dls = sidecar.where(col("dl") > 0L)
    val stats = sidecar.agg(count(lit(1)).as("n_docs"))
      .crossJoin(sidecar.agg(sum("dl").as("l_tokens")))
    scoreAndRank(matched, dls, stats, qterms)
  }

  /** G14 (E15's streaming completion): the inverted index absorbs a
    * DOCUMENT STREAM. Each micro-batch's postings and doc-lengths land
    * append-only in a batch-addressed directory (`batch_id=N`,
    * mode=overwrite) — G4's exactly-once file-sink rule: foreachBatch
    * is at-least-once after recovery, and a replayed batchId
    * OVERWRITES its own directory instead of appending duplicates, so
    * no marker ledger is needed for an additive artifact. Doc sets
    * across batches are disjoint (a doc streams once), so the union of
    * batch directories IS the postings merge — the same pure-append
    * property E15's batch increment relies on. Serving reads the
    * directory tree exactly like E15 reads its table, and the parity
    * spec proves streamed-index BM25 ≡ scan-time BM25 on the same
    * corpus.
    *
    * Scale: per trigger the sink writes |batch postings| rows and
    * never rewrites history; `batch_id` is a partition column the
    * term-filtered serve prunes nothing by (terms cut across batches),
    * but periodic compaction (A14) can fold old batch dirs into the
    * bucketed base table without changing the serve path.
    */
  def applyIndexBatch(batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      batchId: Long, root: String): Unit = {
    val words = expr("filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    // ONE tokenize per micro-batch (the E14/H5 rule): postings AND the
    // doc-length sidecar derive from a single pinned explode_outer
    // grain (a zero-word doc keeps its dl = 0 row — it counts toward
    // n_docs, E13's exact stats)
    val g = batch.select(col("doc_id"), explode_outer(words).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    try {
      g.where(col("word").isNotNull)
        .select(col("word"), col("doc_id"), col("tf"))
        .write.mode("overwrite").parquet(s"$root/postings/batch_id=$batchId")
      g.groupBy("doc_id")
        .agg(sum(when(col("word").isNotNull, col("tf")).otherwise(0L)).as("dl"))
        .write.mode("overwrite").parquet(s"$root/doclen/batch_id=$batchId")
    } finally graft.GraftSession.releaseCheckpoint(g)
  }

  /** The streaming entry: docs(doc_id, text) → incremental index. */
  def indexMaintenanceSink(docs: DataFrame, root: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          applyIndexBatch(b, id, root)
      }
      .start()

  /** A47 (BM25 leg): purge documents from the streamed index by
    * TOMBSTONE — the MOR discipline applied to the retrieval store: a
    * GDPR erasure cannot wait for a segment rewrite, and rewriting a
    * purged doc's postings eagerly touches every term it ever used.
    * The delete writes only the doc-id set under `_deleted/epoch=N`
    * (O(keys), zero index reads); serving anti-joins BOTH artifacts
    * against the broadcast tombstones — postings rows drop AND the
    * doc-length sidecar masks BEFORE the corpus stats aggregate, so
    * served scores are exactly the purged corpus's scores, not a
    * filtered view of stale statistics. `compactStreamedIndex` folds
    * the tombstones physically and clears the sidecar.
    */
  def bm25Delete(s: SparkSession, root: String, docIds: Seq[Long]): Unit = {
    import s.implicits._
    val dir = new org.apache.hadoop.fs.Path(s"$root/_deleted")
    val fs = dir.getFileSystem(s.sessionState.newHadoopConf())
    val epoch =
      if (!fs.exists(dir)) 0
      else fs.listStatus(dir).map(_.getPath.getName)
        .collect { case n if n.startsWith("epoch=") => n.drop(6).toInt }
        .foldLeft(-1)(math.max) + 1
    docIds.distinct.toDF("doc_id")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$root/_deleted/epoch=$epoch")
  }

  private def deletedFrame(s: SparkSession, root: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/_deleted")
    if (!p.getFileSystem(s.sessionState.newHadoopConf()).exists(p)) None
    else Some(graft.sources.GraftIO.readParquet(s, s"$root/_deleted").select("doc_id").distinct())
  }

  /** G14 compaction — the Lucene segment-merge analog: fold the
    * accumulated `batch_id=N` directories into ONE consolidated
    * segment per artifact (postings re-clustered by word so a term's
    * postings colocate; A14's small-file rule applied to the index).
    * Commits via G8's stage-then-rename: the staged tree is fully
    * written before the live tree is swapped, and a swap that died
    * between delete and rename is adopted at the next call. Serving
    * is untouched — it reads the directory tree either way
    * (parity spec) — and absorbing further stream batches continues
    * as before (new `batch_id=N` dirs beside the compacted segment;
    * ids restart safely because the segment consolidated under
    * batch_id=0 and a replayed PRE-compaction batch id would
    * double-apply — so compact only at a stream checkpoint boundary,
    * the same rule Lucene applies to segment merges vs live writers).
    */
  def compactStreamedIndex(s: SparkSession, root: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sessionState.newHadoopConf())
    def path(p: String) = new org.apache.hadoop.fs.Path(p)
    for (sub <- Seq("postings", "doclen")) {
      val live = s"$root/$sub"
      val stage = s"$root/$sub.staging"
      // adoption: a previous swap that died between delete and rename
      // (rename reports failure as FALSE — check it, or a failed
      // adoption/commit silently serves an empty index)
      if (!fs.exists(path(live)) && fs.exists(path(stage)) &&
          !fs.rename(path(stage), path(live)))
        throw new IllegalStateException(
          s"[GRAFT] index-compaction adoption failed: rename($stage -> $live)")
      val df0 = graft.sources.GraftIO.readParquet(s, live).drop("batch_id")
      // A47: fold doc tombstones physically while the segments merge
      val df = deletedFrame(s, root) match {
        case None      => df0
        case Some(del) => df0.join(broadcast(del), Seq("doc_id"), "left_anti")
      }
      val out =
        if (sub == "postings") df.repartition(col("word"))
        else df.coalesce(1)
      out.write.mode("overwrite").parquet(s"$stage/batch_id=0")
      fs.delete(path(live), true)
      if (!fs.rename(path(stage), path(live)))
        throw new IllegalStateException(
          s"[GRAFT] index-compaction commit failed: rename($stage -> $live)")
    }
    val delDir = path(s"$root/_deleted")
    if (fs.exists(delDir) && !fs.delete(delDir, true))
      throw new IllegalStateException(
        s"[GRAFT] index-compaction failed to clear $root/_deleted")
  }

  /** Serve BM25 from a streamed index root — the corpus is NEVER read;
    * postings, doc lengths, and corpus stats all come from the index
    * artifacts (E15's serve shape over the batch-dir layout).
    */
  def serveIndexedBm25(s: SparkSession, root: String): DataFrame = {
    import s.implicits._
    val qterms = Queries.toDF("query_id", "term")
    val terms = qterms.select(col("term").as("word")).distinct()
    // A47 doc tombstones mask BOTH artifacts — the sidecar before its
    // stats aggregate, so n_docs/l_tokens are the purged corpus's own
    val del = deletedFrame(s, root)
    def masked(df: DataFrame): DataFrame = del match {
      case None    => df
      case Some(d) => df.join(broadcast(d), Seq("doc_id"), "left_anti")
    }
    val matched = masked(graft.sources.GraftIO.readParquet(s, s"$root/postings")
      .join(broadcast(terms), Seq("word"))
      .select("word", "doc_id", "tf"))
    val sidecar = masked(graft.sources.GraftIO.readParquet(s, s"$root/doclen").select("doc_id", "dl"))
    val dls = sidecar.where(col("dl") > 0L)
    val stats = sidecar.agg(count(lit(1)).as("n_docs"))
      .crossJoin(sidecar.agg(sum("dl").as("l_tokens")))
    scoreAndRank(matched, dls, stats, qterms)
  }

  /** The fixed query set as a SQL VALUES list — single source of
    * truth for every oracle that ranks these queries.
    */
  private[operators] def queriesValuesSql: String =
    Queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")

  /** DuckDB CTE chain ending in `lexr(query_id, doc_id, score_micro,
    * n_terms, rank)` — the single-window form of the engine's
    * two-level top-k (equal because the order is total). HUGEINT
    * arithmetic mirrors Spark's DECIMAL(38,0).
    */
  private[operators] def lexSql: String = s"""
      WITH w AS (
        SELECT doc_id, unnest(list_filter(
          string_split_regex(trim(lower(text)), '\\s+'), x -> length(x) > 0)) AS word
        FROM documents
      ), pair AS (
        SELECT doc_id, word, count(*) AS tf FROM w GROUP BY doc_id, word
      ), dls AS (
        SELECT doc_id, sum(tf) AS dl FROM pair GROUP BY doc_id
      ), stats AS (
        SELECT (SELECT count(*) FROM documents) AS n_docs,
               (SELECT count(*) FROM w) AS l_tokens
      ), q(query_id, term) AS (
        VALUES $queriesValuesSql
      ), terms AS (SELECT DISTINCT term AS word FROM q),
      matched AS (SELECT p.* FROM pair p JOIN terms USING (word)),
      dfs AS (SELECT word, count(*) AS df FROM matched GROUP BY word),
      scored AS (
        SELECT m.word, m.doc_id,
          CAST(floor(ln((2 * s.n_docs + 2) / CAST(2 * d.df + 1 AS DOUBLE))
                     * 1000000.0) AS BIGINT) AS idf_micro,
          CAST((CAST(44 AS HUGEINT) * m.tf * s.l_tokens * 1000000)
             // (CAST(20 AS HUGEINT) * m.tf * s.l_tokens
               + CAST(6 AS HUGEINT) * s.l_tokens
               + CAST(18 AS HUGEINT) * l.dl * s.n_docs) AS BIGINT) AS tfn_micro
        FROM matched m JOIN dls l USING (doc_id) JOIN dfs d USING (word)
        CROSS JOIN stats s
      ), term_scores AS (
        SELECT q.query_id, sc.doc_id,
               (sc.idf_micro * sc.tfn_micro) // 1000000 AS term_score
        FROM scored sc JOIN q ON sc.word = q.term
      ), per AS (
        SELECT query_id, doc_id, sum(term_score) AS score_micro,
               count(*) AS n_terms
        FROM term_scores GROUP BY query_id, doc_id
      ), lexr AS (
        SELECT query_id, doc_id, score_micro, n_terms,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score_micro DESC, doc_id) AS rank
        FROM per)"""

  def oracleSql: String = s"""$lexSql
      SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
             doc_id, CAST(score_micro AS BIGINT) AS score_micro,
             CAST(n_terms AS BIGINT) AS n_terms
      FROM lexr WHERE rank <= $K ORDER BY query_id, rank"""
}
