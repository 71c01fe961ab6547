package graft

import graft.plans.GraftDoctor

/** B73 applied to the engine itself: the read-only query surface must
  * lint clean — no cartesian products, no unpartitioned windows, no
  * interpreted UDFs — i.e. the audits VERDICTs run by hand hold as a
  * regression test. Write-side and registry-dependent queries (src_*,
  * q_mv_rewrite) are exercised elsewhere; this sweep covers the pure
  * relational/text/dedup/similarity/assembly reads.
  */
class DoctorSweepSpec extends SparkSpecBase {

  private val Pure = Seq(
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_parts", "q12_priority_by_flag",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_cnt", "q17_small_qty_revenue", "q18_large_volume_orders",
    "q19_disjunctive_quals", "q20_excess_suppliers", "q21_waiting_suppliers",
    "q22_idle_customers",
    "q_anti_customers_no_orders", "q_outer_customer_orders",
    "q_topk_revenue_orders", "q_distinct_ship_modes",
    "q_union_high_value_parties", "q_window_top_parts_per_supplier",
    "q_rollup_nation_region", "q_countd_customers_per_segment",
    "q_groupagg_priorities_per_status", "q_cube_status_priority",
    "q_grouping_sets", "q_percentile_quantity", "q_argmax_customer_per_nation",
    "q_salted_join_revenue", "q_heavy_hitters", "q_histogram_totalprice",
    "q_wordcount", "q_pivot_status_by_priority", "q_percent_rank_balance",
    "q_rolling_revenue", "q_cohort_retention", "q_funnel_conversion",
    "q_scd2_user_status", "q_markov_transitions", "q_session_paths",
    "q_basket_lift", "q_unpivot", "q_gap_fill",
    "prof_orders_columns", "prof_outliers", "prof_key_skew", "prof_correlation",
    "prof_contingency", "q_quarantine", "text_vocab_growth",
    "text_zipf_slope", "text_ingest_drift",
    "q_constraint_report", "q_stratified_sample", "q_sample_hash",
    "text_langid", "text_quality", "text_tokens", "text_redact",
    "text_repetition", "text_tfidf_top_terms", "text_vocab_coverage",
    "sim_bruteforce_topk", "sim_filtered_topk", "sim_quantize_int8",
    "sim_sign_quantize", "sim_label_centroids",
    "pipeline_chunk_documents", "pipeline_curriculum",
    "pipeline_train_val_test", "pipeline_mixture_sample",
    "pipeline_pack_sequences", "pipeline_pack_masks", "pipeline_token_budget",
    "pipeline_pack_efficiency",
    // round-10 pure read additions
    "pipeline_curate_pairs", "pipeline_cluster_split", "q_feature_snapshot",
    "mm_token_budget", "pipeline_weighted_sample")

  test("the whole read-only surface has zero high-severity lint findings") {
    val offenders = (Pure ++ ReadOnly).flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      GraftDoctor.lint(df).filter(_.severity == "high").map(f => s"$name: $f")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  /** Read-only queries beyond the high-severity Pure list, swept for
    * the repeated-uncached-subtree class specifically — the full
    * C/D/E/F/H read surface. (LSH lanes and sketch queries are
    * rows-only for VALUES but their PLANS are still lintable.)
    */
  private val ReadOnly = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_ngram_jaccard_lsh",
    "dedup_clusters", "dedup_clusters_exact",
    "dedup_embedding_cosine", "dedup_embedding_cosine_lsh",
    "dedup_semantic", "dedup_substring", "dedup_substring_removal",
    "dedup_sorted_neighborhood_multi", "dedup_source_overlap",
    "text_decontaminate", "text_decontaminate_semantic",
    "text_decontaminate_semantic_lsh",
    "sim_mmr_topk", "sim_hybrid_rrf", "sim_hash_embed_knn",
    "sim_ivf_topk", "sim_lsh_topk", "sim_pq_topk", "sim_hnsw_topk",
    "text_unigram_logprob", "text_bigram_logprob", "text_hash_embed",
    "text_bpe_tokens", "text_dsir_weights", "text_quality_classifier",
    "text_fingerprint", "text_fingerprint_exact", "text_bm25_retrieval",
    "mm_binary_meta", "mm_payload_dedup", "mm_feature_extract",
    "mm_frame_sample", "mm_resize",
    "pipeline_pack_sequences_bpe", "pipeline_contrastive_pairs",
    "pipeline_assemble_corpus", "q_wordcount",
    // round-11 final additions (the artifact-served twins train into
    // a temp dir when constructed; their SCORE plans are what's linted)
    "text_perplexity_buckets", "pipeline_curation_funnel",
    "text_perplexity_model", "text_bpe_model", "text_quality_model")

  test("the whole read-only surface is free of the repeated-uncached-subtree class") {
    // the E14/E17/H5/F7 double-tokenize bug recurred three rounds in a
    // row, and the r11 wide sweep found five MORE instances (BM25's
    // pair grain, the bigram grain, the semantic-decontamination
    // embedding grain — all now cached); this sweep over the FULL
    // read surface makes the class a permanent regression gate
    val offenders = (Pure ++ ReadOnly).flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      GraftDoctor.lint(df).filter(_.rule == "repeated-uncached-subtree")
        .map(f => s"$name: $f")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
