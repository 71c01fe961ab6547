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

  /** The pure read-path queries exposed as SQL views — the full
    * C/D/E/F/H operator surface (~60 views): every dedup family lane,
    * the in-memory ANN builds, the complete text-analysis battery,
    * the multimodal funnels, and the assembly pipeline. Excluded by
    * design: anything that writes (dedup_incremental,
    * sim_*_persisted/incremental, src_* actions) — those are API-side
    * ACTIONS, and a SELECT must never mutate.
    */
  val ViewQueries: Seq[String] = Seq(
    // C: dedup
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_ngram_jaccard_lsh",
    "dedup_clusters", "dedup_clusters_exact",
    "dedup_embedding_cosine", "dedup_embedding_cosine_lsh",
    "dedup_semantic", "dedup_substring", "dedup_substring_removal",
    "dedup_sorted_neighborhood", "dedup_sorted_neighborhood_multi",
    "dedup_source_overlap",
    "text_decontaminate", "text_decontaminate_semantic",
    "text_decontaminate_semantic_lsh",
    // D: similarity (in-memory builds only — persisted/incremental
    // index MAINTENANCE stays API-side, serving is reachable here)
    "sim_bruteforce_topk", "sim_filtered_topk", "sim_mmr_topk",
    "sim_hybrid_rrf", "sim_label_centroids", "sim_hash_embed_knn",
    "sim_ivf_topk", "sim_lsh_topk", "sim_pq_topk", "sim_hnsw_topk",
    "sim_quantize_int8", "sim_sign_quantize",
    // E: text analysis
    "text_langid", "text_quality", "text_tokens", "text_redact",
    "text_repetition", "text_fingerprint_exact", "text_tfidf_top_terms",
    "text_bm25_retrieval", "text_dsir_weights", "text_vocab_coverage",
    "text_vocab_growth", "text_zipf_slope", "text_ingest_drift",
    "text_unigram_logprob", "text_bigram_logprob",
    "text_hash_embed", "text_bpe_tokens", "text_quality_classifier",
    // F: multimodal
    "mm_binary_meta", "mm_payload_dedup", "mm_feature_extract",
    "mm_frame_sample", "mm_resize", "mm_token_budget",
    "pipeline_curate_pairs",
    // H: assembly
    "pipeline_curate_corpus", "pipeline_token_budget",
    "pipeline_pack_sequences", "pipeline_pack_sequences_bpe",
    "pipeline_pack_split", "pipeline_pack_masks",
    "pipeline_pack_efficiency",
    "pipeline_chunk_documents", "pipeline_mixture_sample",
    "pipeline_train_val_test", "pipeline_contrastive_pairs",
    "pipeline_assemble_corpus", "pipeline_cluster_split",
    "pipeline_weighted_sample", "pipeline_curriculum",
    // r11 final: the perplexity-tercile cut and the curation funnel
    // (the persisted-model form text_perplexity_model stays API-side:
    // it trains and writes an artifact, and a SELECT must never write)
    "text_perplexity_buckets", "pipeline_curation_funnel",
    // r11 final: the seeded-shuffle resume slice
    "pipeline_shuffle_resume")

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
