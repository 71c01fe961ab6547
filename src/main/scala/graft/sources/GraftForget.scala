package graft.sources

import org.apache.spark.sql.SparkSession

/** A47: RIGHT-TO-BE-FORGOTTEN across every store that learned a
  * document. A GDPR erasure is only done when the key is gone from
  * EVERY derived artifact, not just the table — a vector index or an
  * inverted index that still serves the purged text is a compliance
  * hole, and at 100 TB each store has its own cheapest forget shape.
  * One call fans the doc-id set out to each attached leg, reusing the
  * discipline each store already owns:
  *
  *   - TABLE       → A44 `morErase`: O(keys) equality tombstone,
  *                   zero table reads, forward mask (a straggler
  *                   append cannot resurrect the user);
  *   - BM25 INDEX  → `bm25Delete`: O(keys) doc tombstone; serving
  *                   masks postings AND the stats sidecar, the next
  *                   segment compaction folds it physically;
  *   - IVF INDEX   → D13 `ivfDelete`: COW rewrite of only the
  *                   affected centroid lists;
  *   - HNSW INDEX  → D13 `hnswDelete`: shard purge + routing repair;
  *   - PQ INDEX    → D13 `pqDelete`: COW rewrite of only the affected
  *                   hash buckets of the narrow code table (a purged
  *                   id can never reach the ADC shortlist, so the
  *                   rerank never fetches its embedding).
  *
  * Every leg is independently idempotent (erase tombstones dedup,
  * COW deletes of absent keys are no-ops), so re-running a forget —
  * a crashed compliance job's retry — converges. Returns one
  * (leg, action) row per store touched, the audit trail a deletion
  * request needs.
  *
  * Reference anchor: the reference is a read-only connector
  * (ArgodbMapreduceInputFormat.java:52-279); the erasure surface is
  * part of the write/lifecycle side this engine adds.
  */
object GraftForget {

  def forgetDocs(s: SparkSession, ids: Seq[Long],
      tablePath: Option[String] = None, keyCol: String = "doc_id",
      bm25Root: Option[String] = None,
      ivfIndex: Option[String] = None,
      hnswIndex: Option[String] = None,
      pqIndex: Option[String] = None): Seq[(String, String)] = {
    require(ids.nonEmpty, "[GRAFT] forgetDocs called with no keys")
    require(tablePath.nonEmpty || bm25Root.nonEmpty || ivfIndex.nonEmpty ||
      hnswIndex.nonEmpty || pqIndex.nonEmpty,
      "[GRAFT] forgetDocs called with no stores attached")
    import s.implicits._
    val out = Seq.newBuilder[(String, String)]
    tablePath.foreach { t =>
      GraftMor.morErase(s, t, ids.toDF(keyCol), Seq(keyCol))
      out += (("table", s"morErase(${ids.length} keys) at $t"))
      // honest audit line: the erase masks every ENGINE read surface
      // (morRead, GraftCatalog.table/tableAsOf/diff, the SQL catalog's
      // split-local masks, bloom lookups), but a RAW spark.read.parquet
      // of the directory bypasses sidecars entirely — the erasure is
      // physical only after morCompact, and the advisor's
      // `mor-unserved` signal stays lit until then
      out += (("table-residual",
        s"raw parquet reads of $t bypass the ${GraftMor.EqDir} mask " +
          "until morCompact folds the erasure physically"))
    }
    bm25Root.foreach { r =>
      graft.operators.Bm25.bm25Delete(s, r, ids)
      out += (("bm25", s"doc tombstone epoch at $r/_deleted"))
    }
    ivfIndex.foreach { i =>
      graft.operators.Similarity.ivfDelete(s, i, ids)
      out += (("ivf", s"affected-list COW purge at $i/lists"))
    }
    hnswIndex.foreach { i =>
      graft.operators.Hnsw.hnswDelete(s, i, ids)
      out += (("hnsw", s"shard purge + routing repair at $i"))
    }
    pqIndex.foreach { i =>
      graft.operators.Similarity.pqDelete(s, i, ids)
      out += (("pq", s"affected-bucket COW purge at $i/codes"))
    }
    out.result()
  }
}
