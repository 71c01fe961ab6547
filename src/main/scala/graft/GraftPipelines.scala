package graft

import org.apache.spark.sql.SparkSession

/** SQL reachability for the pipeline operator families — the r10
  * VERDICT's gap #3: the engine's BASE tables have been SQL-reachable
  * since A21 (the `graft` TableCatalog + `SELECT ... VERSION AS OF`),
  * and four scalar functions are SQL-injected (GraftExtensions), but
  * dedup / similarity / text / multimodal / assembly were Scala-API
  * only — a SQL-first user couldn't run near-dup dedup or BM25
  * retrieval from `spark.sql` at all.
  *
  * `registerAll` closes that: every flagship PURE read-path operator
  * registers as a temp view `graft_<query_name>` over its lazily-
  * evaluated DataFrame — SQL text can SELECT from, filter, join and
  * compose them like any table, and each evaluation plans through the
  * exact operator implementation (same plan, same scale shape; a view
  * adds nothing physical). Write-path operators (index builds, merges,
  * WAP) stay API-only by design: they are ACTIONS with side effects,
  * not relations, and a `SELECT` must never mutate state.
  *
  * Scale note: view registration is pure metadata (no job runs); the
  * cost model of each query is unchanged from SURVEY §2's per-operator
  * audit.
  */
object GraftPipelines {

  /** The pure read-path queries exposed as SQL views — one flagship
    * (or more) per family: C dedup, D similarity, E text, F
    * multimodal, H assembly, plus the B-profiling entry points a SQL
    * analyst reaches for first. Excluded by design: anything that
    * writes (dedup_incremental, sim_*_persisted, src_* actions).
    */
  val ViewQueries: Seq[String] = Seq(
    // C: dedup
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_clusters_exact", "dedup_semantic",
    "dedup_sorted_neighborhood", "dedup_source_overlap",
    "text_decontaminate",
    // D: similarity
    "sim_bruteforce_topk", "sim_filtered_topk", "sim_mmr_topk",
    "sim_hybrid_rrf", "sim_label_centroids", "sim_hash_embed_knn",
    // E: text analysis
    "text_langid", "text_quality", "text_tokens",
    "text_fingerprint_exact", "text_tfidf_top_terms",
    "text_bm25_retrieval", "text_dsir_weights", "text_vocab_coverage",
    // F: multimodal
    "mm_token_budget", "pipeline_curate_pairs",
    // H: assembly
    "pipeline_curate_corpus", "pipeline_token_budget",
    "pipeline_pack_sequences", "pipeline_cluster_split",
    "pipeline_weighted_sample", "pipeline_curriculum")

  /** Register every flagship operator result as `graft_<name>` in the
    * session's temp-view namespace, bound to the tables under `dir`.
    * Idempotent (re-registration replaces). Views are LAZY: nothing
    * executes until a SQL statement reads one.
    */
  def registerAll(s: SparkSession, dir: String): Unit =
    ViewQueries.foreach { n =>
      SparkEntry.queries(n)(s, dir).createOrReplaceTempView(s"graft_$n")
    }
}
