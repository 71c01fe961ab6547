package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every implemented operator appears in `queries`; SQL-expressible ones
  * also appear in `oracleSql` with IDENTICAL output column names and a
  * deterministic ORDER BY on both sides (see SURVEY.md §6).
  */
object SparkEntry {

  /** Flagship (driver smoke-checks rows>0 on sf0.001): the end-to-end
    * corpus-curation pass (quality gate + near-dup representative
    * selection + per-source accounting) — the composite workflow the
    * engine exists to run.
    */
  def entry(spark: SparkSession): DataFrame =
    Dedup.curateCorpus(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.A source/connector layer
    "src_schema_scan"            -> Relational.srcSchemaScan _,
    "src_typed_partition_values" -> Relational.srcTypedPartitionValues _,
    "src_partition_prune"        -> Relational.srcPartitionPrune _,
    "src_projection_pushdown"    -> Relational.srcProjectionPushdown _,
    "src_predicate_pushdown"     -> Relational.srcPredicatePushdown _,
    "src_snapshot_union"         -> Relational.srcSnapshotUnion _,
    "src_partitioned_sink"       -> Relational.srcPartitionedSink _,
    "src_bucketed_join"          -> Relational.srcBucketedJoin _,
    "src_v2_inputformat_scan"    -> Relational.srcV2InputFormatScan _,
    "src_v2_decimal_scan"        -> Relational.srcV2DecimalScan _,
    "src_v2_agg_pushdown"        -> Relational.srcV2AggPushdown _,
    "src_catalog_sql_scan"       -> Relational.srcCatalogSqlScan _,
    "src_catalog_partitioned_scan" -> Relational.srcCatalogPartitionedScan _,
    "src_jdbc_roundtrip"         -> Relational.srcJdbcRoundtrip _,
    "src_stats_table"            -> Relational.srcStatsTable _,
    "src_csv_roundtrip"          -> Relational.srcCsvRoundtrip _,
    "src_orc_roundtrip"          -> Relational.srcOrcRoundtrip _,
    "src_json_roundtrip"         -> Relational.srcJsonRoundtrip _,
    "src_schema_evolution"       -> Relational.srcSchemaEvolution _,
    "src_compaction"             -> Relational.srcCompaction _,
    "src_zorder_scan"            -> Relational.srcZorderScan _,
    "src_snapshot_diff"          -> Relational.srcSnapshotDiff _,
    "src_time_travel"            -> Relational.srcTimeTravel _,
    "src_change_feed"            -> Relational.srcChangeFeed _,
    "src_bloom_index"            -> Relational.srcBloomIndex _,
    "src_multi_table_tag"        -> Relational.srcMultiTableTag _,
    "src_vacuum"                 -> Relational.srcVacuum _,
    "src_wap_publish"            -> Relational.srcWapPublish _,
    "src_snapshot_log"           -> Relational.srcSnapshotLog _,
    "src_restore"                -> Relational.srcRestore _,
    "src_dynamic_overwrite"      -> Relational.srcDynamicOverwrite _,
    "src_merge_upsert"           -> Relational.srcMergeUpsert _,
    "src_merge_delete"           -> Relational.srcMergeDelete _,
    "src_mor_delete"             -> Relational.srcMorDelete _,
    "src_mor_erase"              -> Relational.srcMorErase _,
    "src_mor_upsert"             -> Relational.srcMorUpsert _,
    "src_mor_upsert_eq"          -> Relational.srcMorUpsertEq _,
    "src_mor_incremental_agg"    -> Relational.srcMorIncrementalAgg _,
    "src_retention_sweep"        -> Relational.srcRetentionSweep _,
    "src_mor_change_feed"        -> Relational.srcMorChangeFeed _,
    "src_mor_compact"            -> Relational.srcMorCompact _,
    "src_mor_sql_read"           -> Relational.srcMorSqlRead _,
    "src_mor_time_travel"        -> Relational.srcMorTimeTravel _,
    "src_export_material"        -> Relational.srcExportMaterial _,
    "src_mor_sql_dml"            -> Relational.srcMorSqlDml _,
    "src_sql_ddl"                -> Relational.srcSqlDdl _,
    "src_sql_alter_rewrite"      -> Relational.srcSqlAlterRewrite _,
    "src_sql_layout"             -> Relational.srcSqlLayout _,
    "src_sql_bucket_join"        -> Relational.srcSqlBucketJoin _,
    "src_sql_join_broadcast"     -> Relational.srcSqlJoinBroadcast _,
    "src_sql_layout_ts"          -> Relational.srcSqlLayoutTs _,
    "src_sql_layout_str"         -> Relational.srcSqlLayoutStr _,
    "src_sql_bucket_join_multi"  -> Relational.srcSqlBucketJoinMulti _,
    "src_incremental_agg"        -> Relational.srcIncrementalAgg _,
    // §2.B relational core
    "q1_pricing_summary"         -> Relational.q1PricingSummary _,
    "q6_forecast_revenue"        -> Relational.q6ForecastRevenue _,
    "q3_shipping_priority"       -> Relational.q3ShippingPriority _,
    "q5_local_supplier_volume"   -> Relational.q5LocalSupplierVolume _,
    "q4_order_priority"          -> Relational.q4OrderPriority _,
    "q_anti_customers_no_orders" -> Relational.qAntiCustomersNoOrders _,
    "q_outer_customer_orders"    -> Relational.qOuterCustomerOrders _,
    "q_topk_revenue_orders"      -> Relational.qTopkRevenueOrders _,
    "q_distinct_ship_modes"      -> Relational.qDistinctFlagStatus _,
    "q_union_high_value_parties" -> Relational.qUnionHighValueParties _,
    "q_window_top_parts_per_supplier" -> Relational.qWindowTopPartsPerSupplier _,
    "q_rollup_nation_region"     -> Relational.qRollupNationRegion _,
    "q_countd_customers_per_segment" -> Relational.qCountdCustomersPerSegment _,
    "q_approx_countd_parts"      -> Relational.qApproxCountdParts _,
    "q_groupagg_priorities_per_status" -> Relational.qGroupaggPrioritiesPerStatus _,
    "q10_returned_items"         -> Relational.q10ReturnedItems _,
    "q17_small_qty_revenue"      -> Relational.q17SmallQtyRevenue _,
    "q_pivot_status_by_priority" -> Relational.qPivotStatusByPriority _,
    "q7_volume_shipping"         -> Analytic.q7VolumeShipping _,
    "q8_market_share"            -> Analytic.q8MarketShare _,
    "q9_product_profit"          -> Analytic.q9ProductProfit _,
    "q_argmax_customer_per_nation" -> Analytic.qArgmaxCustomerPerNation _,
    "q_cube_status_priority"     -> Analytic.qCubeStatusPriority _,
    "q_grouping_sets"            -> Analytic.qGroupingSets _,
    "q_percentile_quantity"      -> Analytic.qPercentileQuantity _,
    "q_asof_event_order"         -> Analytic.qAsofEventOrder _,
    "q_feature_snapshot"         -> Analytic.qFeatureSnapshot _,
    "q_asof_event_order_outer"   -> Analytic.qAsofEventOrderOuter _,
    "q_salted_join_revenue"      -> Analytic.qSaltedJoinRevenue _,
    "q1_sql"                     -> Analytic.q1Sql _,
    "q_sample_hash"              -> Analytic.qSampleHash _,
    "q_stratified_sample"        -> Profiling.stratifiedSample _,
    "prof_orders_columns"        -> Profiling.profileOrders _,
    "q_range_join_events_orders" -> Analytic.qRangeJoinEventsOrders _,
    "q_range_join_native"        -> Analytic.qRangeJoinNative _,
    "q_json_props"               -> Analytic.qJsonProps _,
    "q14_promo_revenue"          -> Relational.q14PromoRevenue _,
    "q15_top_supplier"           -> Relational.q15TopSupplier _,
    "q19_disjunctive_quals"      -> Relational.q19DisjunctiveQuals _,
    "q22_idle_customers"         -> Relational.q22IdleCustomers _,
    "q_except_intersect"         -> Analytic.qExceptIntersect _,
    "q_heavy_hitters"            -> Analytic.qHeavyHitters _,
    "q_bloom_semi_join"          -> Analytic.qBloomSemiJoin _,
    "q_mv_rewrite"               -> Analytic.mvRewrite _,
    "q_unpivot"                  -> Analytic.qUnpivot _,
    "q_gap_fill"                 -> Analytic.qGapFill _,
    "q18_large_volume_orders"    -> Analytic.q18LargeVolumeOrders _,
    "q_wordcount"                -> Analytic.qWordcount _,
    "q_pivot_api"                -> Analytic.qPivotApi _,
    "q_approx_percentile"        -> Analytic.qApproxPercentile _,
    "q_hll_union"                -> Analytic.qHllUnion _,
    "q_theta_overlap"            -> Analytic.qThetaOverlap _,
    "q_rolling_revenue"          -> Analytic.qRollingRevenue _,
    "q13_customer_distribution"  -> Analytic.q13CustomerDistribution _,
    "q_histogram_totalprice"     -> Analytic.qHistogramTotalprice _,
    "q_histogram_equidepth"      -> Analytic.qHistogramEquidepth _,
    "q_histogram_equidepth_scalable" -> Analytic.qHistogramEquidepthScalable _,
    "q_percent_rank_balance"     -> Analytic.qPercentRankBalance _,
    "q_constraint_report"        -> Profiling.constraintReport _,
    "q_funnel_conversion"        -> Behavioral.qFunnelConversion _,
    "q_cohort_retention"         -> Behavioral.qCohortRetention _,
    "q_scd2_user_status"         -> Behavioral.qScd2UserStatus _,
    "q_markov_transitions"       -> Behavioral.qMarkovTransitions _,
    "q_session_paths"            -> Behavioral.qSessionPaths _,
    "q_basket_lift"              -> Affinity.qBasketLift _,
    "dedup_sorted_neighborhood"  -> Affinity.sortedNeighborhood _,
    "dedup_sorted_neighborhood_multi" -> Affinity.sortedNeighborhoodMulti _,
    "q_entity_resolution"        -> Affinity.qEntityResolution _,
    "prof_correlation"           -> Profiling.profileCorrelation _,
    "prof_outliers"              -> Profiling.robustOutliers _,
    "q_quarantine"               -> Profiling.quarantine _,
    "prof_contingency"           -> Profiling.contingency _,
    "prof_key_skew"              -> Profiling.skewProfile _,
    "q2_min_cost_supplier"       -> TpchPatterns.q2MinCostSupplier _,
    "q11_important_parts"        -> TpchPatterns.q11ImportantParts _,
    "q12_priority_by_flag"       -> TpchPatterns.q12PriorityByFlag _,
    "q16_supplier_cnt"           -> TpchPatterns.q16SupplierCnt _,
    "q20_excess_suppliers"       -> TpchPatterns.q20ExcessSuppliers _,
    "q21_waiting_suppliers"      -> TpchPatterns.q21WaitingSuppliers _,
    // §2.C deduplication
    "dedup_exact"                -> Dedup.exactDedup _,
    "dedup_minhash_lsh"          -> Dedup.minhashLsh _,
    "dedup_simhash"              -> Dedup.simhash _,
    "dedup_ngram_jaccard"        -> Dedup.ngramJaccardExact _,
    "dedup_ngram_jaccard_lsh"    -> Dedup.ngramJaccard _,
    "dedup_embedding_cosine"     -> Dedup.embeddingCosineExact _,
    "dedup_embedding_cosine_lsh" -> Dedup.embeddingCosine _,
    "dedup_clusters"             -> Dedup.nearDupClusters _,
    "dedup_clusters_exact"       -> Dedup.nearDupClustersExact _,
    "dedup_semantic"             -> SemDedup.semanticDedup _,
    "dedup_incremental"          -> Dedup.incrementalDedup _,
    "pipeline_pack_sequences"    -> Assembly.packSequences _,
    "pipeline_pack_masks"        -> Assembly.packMasks _,
    "pipeline_pack_sequences_bpe" -> Assembly.packSequencesBpe _,
    "pipeline_mixture_sample"    -> Assembly.mixtureSample _,
    "pipeline_assemble_corpus"   -> Assembly.assembleCorpus _,
    "dedup_substring"            -> Dedup.substringDedup _,
    "dedup_substring_removal"    -> Dedup.substringRemoval _,
    "text_decontaminate"         -> Dedup.decontaminate _,
    "text_decontaminate_semantic" -> Dedup.decontaminateSemantic _,
    "text_decontaminate_semantic_lsh" -> Dedup.decontaminateSemanticLsh _,
    "pipeline_curate_corpus"     -> Dedup.curateCorpus _,
    "pipeline_curation_funnel"   -> Dedup.curationFunnel _,
    // §2.D similarity search
    "sim_bruteforce_topk"        -> Similarity.bruteForceTopk _,
    "sim_filtered_topk"          -> Similarity.filteredTopk _,
    "sim_ivf_topk"               -> ((s: SparkSession, d: String) => Similarity.ivfTopk(s, d)),
    "sim_ivf_persisted"          -> ((s: SparkSession, d: String) => Similarity.ivfPersistedTopk(s, d)),
    "sim_sql_topk"               -> ((s: SparkSession, d: String) => Similarity.sqlTopk(s, d)),
    "sim_sql_pq_topk"            -> ((s: SparkSession, d: String) => Similarity.sqlPqTopk(s, d)),
    "sim_lsh_topk"               -> Similarity.lshTopk _,
    "sim_pq_topk"                -> ((s: SparkSession, d: String) => Similarity.pqTopk(s, d)),
    "sim_hnsw_topk"              -> Hnsw.hnswTopk _,
    "sim_hnsw_persisted"         -> ((s: SparkSession, d: String) => Hnsw.hnswPersistedTopk(s, d)),
    "sim_ivf_incremental"        -> ((s: SparkSession, d: String) => Similarity.ivfIncrementalTopk(s, d)),
    "sim_quantize_int8"          -> Similarity.quantizeInt8 _,
    "sim_sign_quantize"          -> Similarity.signQuantize _,
    "sim_label_centroids"        -> Similarity.labelCentroids _,
    "sim_mmr_topk"               -> Mmr.mmrTopk _,
    "text_hash_embed"            -> HashEmbed.hashEmbed _,
    "sim_hash_embed_knn"         -> HashEmbed.hashEmbedKnn _,
    // §2.E text analysis
    "text_langid"                -> TextAnalysis.langId _,
    "text_quality"               -> TextAnalysis.quality _,
    "text_tokens"                -> TextAnalysis.tokens _,
    "text_fingerprint"           -> TextAnalysis.fingerprint _,
    "text_fingerprint_exact"     -> TextAnalysis.fingerprintExact _,
    "text_unigram_logprob"       -> TextAnalysis.unigramLogprob _,
    "text_perplexity_buckets"    -> TextAnalysis.perplexityBuckets _,
    "text_perplexity_model"      -> TextAnalysis.perplexityModelServe _,
    "text_bpe_tokens"            -> BpeTokenizer.bpeTokens _,
    "text_bpe_model"             -> BpeTokenizer.bpeModelServe _,
    "text_dsir_weights"          -> TextAnalysis.dsirWeights _,
    "text_vocab_coverage"        -> ((s: SparkSession, d: String) => TextAnalysis.vocabCoverage(s, d)),
    "text_zipf_slope"            -> ((s: SparkSession, d: String) => TextAnalysis.zipfSlope(s, d)),
    "text_ingest_drift"          -> ((s: SparkSession, d: String) => TextAnalysis.ingestDrift(s, d)),
    "text_vocab_growth"          -> ((s: SparkSession, d: String) => TextAnalysis.vocabGrowth(s, d)),
    "text_bm25_retrieval"        -> Bm25.retrieve _,
    "text_quality_classifier"    -> TextAnalysis.qualityClassifier _,
    "text_quality_model"         -> TextAnalysis.qualityModelServe _,
    "sim_hybrid_rrf"             -> Hybrid.retrieve _,
    "pipeline_contrastive_pairs" -> Assembly.contrastivePairs _,
    "text_inverted_bm25"         -> Bm25.indexServedBm25 _,
    "text_bigram_logprob"        -> TextAnalysis.bigramLogprob _,
    "q_nation_pagerank"          -> Analytic.qNationPagerank _,
    "pipeline_chunk_documents"   -> Assembly.chunkDocuments _,
    "pipeline_token_budget"      -> Assembly.tokenBudgetSample _,
    "pipeline_pack_efficiency"   -> Assembly.packEfficiency _,
    "pipeline_curriculum"        -> Assembly.curriculumStages _,
    "pipeline_train_val_test"    -> Assembly.trainValTestSplit _,
    "pipeline_cluster_split"     -> Assembly.clusterSafeSplit _,
    "pipeline_weighted_sample"   -> ((s, dir) => Assembly.weightedSample(s, dir)),
    "pipeline_shuffle_resume"    -> Assembly.shuffleResume _,
    "pipeline_pack_split"        -> Assembly.packSequencesSplit _,
    "dedup_source_overlap"       -> Dedup.crossSourceOverlap _,
    "text_tfidf_top_terms"       -> TextAnalysis.tfidfTopTerms _,
    "text_redact"                -> TextAnalysis.redact _,
    "text_repetition"            -> TextAnalysis.repetition _,
    // §2.F multimodal
    "mm_binary_meta"             -> Multimodal.binaryMeta _,
    "mm_feature_extract"         -> ((s: SparkSession, d: String) => Multimodal.featureExtract(s, d)),
    "mm_frame_sample"            -> Multimodal.frameSample _,
    "mm_resize"                  -> Multimodal.resize _,
    "mm_payload_dedup"           -> Multimodal.payloadDedup _,
    "pipeline_curate_pairs"      -> Multimodal.curatePairs _,
    "mm_token_budget"            -> Multimodal.multimodalTokenBudget _,
    // §2.G streaming (batch-equivalent forms; streaming paths in specs)
    "stream_windowed_counts"     -> graft.streaming.Events.windowedCountsBatch _,
    "stream_sessionize"          -> graft.streaming.Events.sessionizeBatch _,
    "stream_session_window"      -> graft.streaming.Events.sessionWindowBatch _,
    "stream_enriched_counts"     -> graft.streaming.Events.enrichedCountsBatch _,
    "stream_click_purchase_join" -> graft.streaming.Events.clickToPurchaseBatch _,
    "stream_click_purchase_outer" -> graft.streaming.Events.clickToPurchaseOuterBatch _,
    "stream_dedup_first"         -> graft.streaming.Events.dedupFirstBatch _,
    "stream_top_users"           -> ((s: SparkSession, d: String) => graft.streaming.Events.topUsersBatch(s, d)),
    // the REAL stream runs inside (two AvailableNow runs over the
    // snapshot log; result = the resumed run's epoch diff)
    "stream_table_tail"          -> graft.streaming.TableTail.demo _,
  )

  /** DuckDB-runnable oracle SQL per query (omitted → rows-only check). */
  /** Single oracle text for both range-join forms (see the map entry
    * comment below).
    */
  private val RangeJoinOracle = """
      SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id AS user_id,
             strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_time,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time
      FROM events c JOIN events p
        ON c.event_type = 'click' AND p.event_type = 'purchase'
       AND c.user_id = p.user_id
       AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
      ORDER BY click_id, purchase_id"""

  /** Shared oracle CTE for the substring-dedup family (C8/C9): word
    * 4-gram span hashes, bit-identical to Dedup.wordGramHashes — the
    * two-level stepwise mod-P polynomial keeps every intermediate
    * exact in BIGINT in both engines (no wraparound anywhere).
    * Defines `w`(doc_id, ws), `h`(doc_id, wh), `g`(doc_id, p, gh).
    */
  /** D7 oracle halves: 32 CASE terms with literal powers of two per
    * 32-bit half (generated, like the BPE replace chain).
    */
  private def signHalfSql(lowBit: Int): String =
    (0 until 32).map(i =>
      s"CASE WHEN embedding[${lowBit + i + 1}] > 0 THEN ${1L << i} ELSE 0 END")
      .mkString("(", " + ", ")")
  private val signHiSql = signHalfSql(32)
  private val signLoSql = signHalfSql(0)

  /** The oracle-exact C6 cluster CTE chain (shared by the cluster
    * query and H11's cluster-keyed split): blocked candidate pairs,
    * Jaccard-verified edges, recursive-CTE connected components,
    * canonical id = min reachable member.
    */
  private val clusterCte = """
      WITH RECURSIVE toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
      ), sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        FROM toks WHERE len(t) >= 3
      ), ks AS (
        SELECT doc_id, unnest(list_sort(s)[1:4]) AS k FROM sh
      ), ks2 AS (
        SELECT doc_id, k,
               count(*) OVER (PARTITION BY k) AS bsz,
               lag(doc_id) OVER (PARTITION BY k ORDER BY doc_id) AS prev
        FROM ks
      ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ks2 a JOIN ks2 b
          ON a.k = b.k AND a.doc_id < b.doc_id AND a.bsz <= 64 AND b.bsz <= 64
        UNION
        SELECT DISTINCT prev AS doc_a, doc_id AS doc_b
        FROM ks2 WHERE bsz > 64 AND prev IS NOT NULL
      ), e0 AS (
        SELECT doc_a, doc_b FROM cand c
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b
        WHERE 2 * len(list_intersect(sa.s, sb.s)) >= len(list_distinct(sa.s || sb.s))
      ), e AS (
        SELECT doc_a, doc_b FROM e0
        UNION ALL SELECT doc_b, doc_a FROM e0
      ), cc AS (
        SELECT doc_id, doc_id AS reach FROM documents
        UNION
        SELECT cc.doc_id, e.doc_b AS reach FROM cc JOIN e ON e.doc_a = cc.reach
      )
      , cl AS (
        SELECT doc_id, CAST(min(reach) AS BIGINT) AS cluster
        FROM cc GROUP BY doc_id
      )"""

  private val spanHashCte = """
      WITH w AS (
        SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                   x -> length(x) > 0) AS ws
        FROM documents
      ), h AS (
        SELECT doc_id, list_transform(ws, ww -> list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, length(ww) + 1),
                     i -> CAST(ord(substr(ww, CAST(i AS INT), 1)) AS BIGINT))),
                 (acc, c) -> (acc * 257 + c) % 1000000007)) AS wh
        FROM w
      ), g AS (
        SELECT gdoc AS doc_id, u['p'] AS p, u['gh'] AS gh FROM (
          SELECT doc_id AS gdoc, unnest(list_transform(range(1, greatest(len(wh) - 2, 1)),
            p -> {'p': p, 'gh':
              ((((((wh[p] * 1000003 + wh[p+1]) % 1000000007)
                  * 1000003 + wh[p+2]) % 1000000007)
                  * 1000003 + wh[p+3]) % 1000000007)})) AS u
          FROM h)
      )"""

  /** C7's full curated-document chain (shingles → guarded blocking →
    * recursive-CTE connected components → quality + decontamination
    * gates → cluster representative), ending in `kept`(doc_id,
    * source, n_chars, n_toks, ...). Shared by the C7 accounting and
    * the H3 whole-build oracle.
    */
  private val curatedDocsCte = """
      WITH RECURSIVE toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
      ), sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        FROM toks WHERE len(t) >= 3
      ), ks AS (
        SELECT doc_id, unnest(list_sort(s)[1:4]) AS k FROM sh
      ), ks2 AS (
        SELECT doc_id, k,
               count(*) OVER (PARTITION BY k) AS bsz,
               lag(doc_id) OVER (PARTITION BY k ORDER BY doc_id) AS prev
        FROM ks
      ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ks2 a JOIN ks2 b
          ON a.k = b.k AND a.doc_id < b.doc_id AND a.bsz <= 64 AND b.bsz <= 64
        UNION
        SELECT DISTINCT prev AS doc_a, doc_id AS doc_b
        FROM ks2 WHERE bsz > 64 AND prev IS NOT NULL
      ), e0 AS (
        SELECT doc_a, doc_b FROM cand c
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b
        WHERE 2 * len(list_intersect(sa.s, sb.s)) >= len(list_distinct(sa.s || sb.s))
      ), e AS (
        SELECT doc_a, doc_b FROM e0
        UNION ALL SELECT doc_b, doc_a FROM e0
      ), cc AS (
        SELECT doc_id, doc_id AS reach FROM documents
        UNION
        SELECT cc.doc_id, e.doc_b AS reach FROM cc JOIN e ON e.doc_a = cc.reach
      ), clusters AS (
        SELECT doc_id, CAST(min(reach) AS BIGINT) AS cluster
        FROM cc GROUP BY doc_id
      ), spw AS (
        SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                   x -> length(x) > 0) AS ws
        FROM documents
      ), sph AS (
        SELECT doc_id, list_transform(ws, ww -> list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, length(ww) + 1),
                     i -> CAST(ord(substr(ww, CAST(i AS INT), 1)) AS BIGINT))),
                 (acc, c) -> (acc * 257 + c) % 1000000007)) AS wh
        FROM spw
      ), spg AS (
        SELECT doc_id, unnest(list_transform(range(1, greatest(len(wh) - 2, 1)),
          p -> ((((((wh[p] * 1000003 + wh[p+1]) % 1000000007)
                   * 1000003 + wh[p+2]) % 1000000007)
                   * 1000003 + wh[p+3]) % 1000000007))) AS gh
        FROM sph
      ), benchspans AS (
        SELECT DISTINCT gh FROM spg WHERE doc_id % 97 = 0
      ), contam AS (
        SELECT doc_id, count(*) AS n_spans,
               sum(CASE WHEN gh IN (SELECT gh FROM benchspans) THEN 1 ELSE 0 END) AS n_overlap
        FROM spg WHERE doc_id % 97 <> 0 GROUP BY doc_id
      ), clean AS (
        SELECT d.doc_id FROM documents d
        LEFT JOIN contam t ON d.doc_id = t.doc_id
        WHERE d.doc_id % 97 <> 0
          AND NOT (coalesce(t.n_spans, 0) > 0
                   AND coalesce(t.n_overlap, 0) * 10 >= t.n_spans)
      ), q AS (
        SELECT d.doc_id, d.source, d.n_chars,
               len(string_split_regex(trim(d.text), '\s+')) AS n_toks,
               len(list_distinct(string_split_regex(trim(d.text), '\s+'))) AS n_distinct
        FROM documents d
      ), survivors AS (
        SELECT q.*, c.cluster FROM q
        JOIN clusters c ON q.doc_id = c.doc_id
        JOIN clean cl ON q.doc_id = cl.doc_id
        WHERE q.n_toks >= 10 AND q.n_distinct * 10 >= q.n_toks * 3
      ), kept AS (
        SELECT * FROM (
          SELECT s.*, min(doc_id) OVER (PARTITION BY cluster) AS rep
          FROM survivors s)
        WHERE doc_id = rep)
"""

  // BPE encode replayed as literal SQL: the baked sf0.01 merge table
  // (BpeTokenizer.Sf001Merges, spec-guarded against training drift)
  // applied as nested replaces over the space-prefixed symbol string;
  // token count = space count (see BpeTokenizer.oracleEncodeSql).
  /** The A46/A49 mutation ladder's final state (delete %10==3, upsert
    * %100==0 at +1000, delete keys %100==7) — ONE oracle serving both
    * the incremental-fold and the feed-fold queries.
    */
  private val MorLadderSql: String = """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(CASE WHEN o_orderkey % 100 = 0
                                      THEN o_totalprice + 1000.0
                                      ELSE o_totalprice END
                          AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders
      WHERE o_orderkey % 10 <> 3 AND o_orderkey % 100 <> 7
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  private val BpeTokensSql: String = s"""
      WITH wds AS (
        SELECT doc_id, unnest(regexp_extract_all(text,
          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS w
        FROM documents
      ), enc AS (
        SELECT doc_id,
               ${BpeTokenizer.oracleEncodeSql("w", BpeTokenizer.Sf001Merges)} AS e
        FROM wds
      ), agg AS (
        SELECT doc_id, count(*) AS nw,
               sum(length(e) - length(replace(e, ' ', ''))) AS bt
        FROM enc GROUP BY doc_id
      )
      SELECT d.doc_id, CAST(coalesce(nw, 0) AS BIGINT) AS n_words,
             CAST(coalesce(bt, 0) AS BIGINT) AS bpe_tokens
      FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""


  // E14's NB classifier oracle, shared verbatim by E23
  // (`text_quality_model`): artifact-served scoring of the held-out
  // half must reproduce the in-query computation value-for-value.
  private val QualityClassifierSql: String = """
      WITH base AS (

        SELECT doc_id, list_filter(
          string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0) AS ws
        FROM documents
      ), labeled AS (
        SELECT doc_id, ws,
          CASE WHEN len(ws) > 0 AND
            len(list_filter(ws, x -> x IN ('the','a','of','and','in','to','is')))
              * 1000000 >= len(ws) * 60000 THEN 1 ELSE 0 END AS label,
          (doc_id * 1048573 + 11) % 1000000 < 500000 AS is_train
        FROM base
      ), pair AS (
        SELECT doc_id, label, is_train, word, count(*) AS n
        FROM (SELECT doc_id, label, is_train, unnest(ws) AS word FROM labeled)
        GROUP BY ALL
      ), wc AS (
        SELECT word,
               sum(CASE WHEN label = 1 THEN n ELSE 0 END) AS cnt1,
               sum(CASE WHEN label = 0 THEN n ELSE 0 END) AS cnt0
        FROM pair WHERE is_train GROUP BY word
      ), tot AS (
        SELECT sum(cnt1) AS tot1, sum(cnt0) AS tot0, count(*) AS v FROM wc
      ), wt AS (
        SELECT word,
               CAST(floor(ln((cnt1 + 1) / CAST(tot1 + v AS DOUBLE)) * 1000000.0) AS BIGINT)
             - CAST(floor(ln((cnt0 + 1) / CAST(tot0 + v AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_micro
        FROM wc CROSS JOIN tot
      ), priors AS (
        SELECT CAST(floor(ln(sum(label) / CAST(count(*) AS DOUBLE)) * 1000000.0) AS BIGINT)
             - CAST(floor(ln((count(*) - sum(label)) / CAST(count(*) AS DOUBLE)) * 1000000.0) AS BIGINT)
               AS prior_delta
        FROM labeled WHERE is_train
      ), perdoc AS (
        SELECT doc_id, sum(n) AS n_scored, sum(w_micro * n) AS delta_words
        FROM pair JOIN wt USING (word) WHERE NOT is_train GROUP BY doc_id
      )
      SELECT l.doc_id, CAST(l.label AS BIGINT) AS label,
             CAST(coalesce(p.n_scored, 0) AS BIGINT) AS n_scored,
             CAST(pr.prior_delta + coalesce(p.delta_words, 0) AS BIGINT) AS log_odds_micro,
             CAST(CASE WHEN pr.prior_delta + coalesce(p.delta_words, 0) > 0
                  THEN 1 ELSE 0 END AS BIGINT) AS predicted
      FROM labeled l CROSS JOIN priors pr LEFT JOIN perdoc p USING (doc_id)
      WHERE NOT l.is_train ORDER BY l.doc_id"""

  private val PerplexitySql: String = """
      WITH w AS (
        SELECT doc_id, unnest(list_filter(
          string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0)) AS word
        FROM documents
      ), c AS (
        SELECT word, count(*) AS cnt FROM w GROUP BY word
      ), t AS (
        SELECT CAST(count(*) AS DOUBLE) AS total FROM w
      ), scored AS (
        SELECT w.doc_id,
               CAST(floor(ln(c.cnt / (SELECT total FROM t)) * 1000000.0) AS BIGINT) AS lp
        FROM w JOIN c USING (word)
      ), perdoc AS (
        SELECT doc_id, count(*) AS n_words, sum(lp) AS sum_lp
        FROM scored GROUP BY doc_id
      ), base AS (
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
               CAST(floor(CAST(sum_lp AS DOUBLE) / n_words) AS BIGINT) AS avg_lp_micro
        FROM perdoc
      ), hist AS (
        SELECT avg_lp_micro AS v, count(*) AS nv FROM base GROUP BY 1
      ), cum AS (
        SELECT v, sum(nv) OVER (ORDER BY v) AS cn FROM hist
      ), tot AS (
        SELECT count(*) AS nn FROM base
      ), cuts AS (
        SELECT
          (SELECT min(v) FROM cum
           WHERE cn >= ((SELECT nn FROM tot) + 2) // 3) AS c1,
          (SELECT min(v) FROM cum
           WHERE cn >= (2 * (SELECT nn FROM tot) + 2) // 3) AS c2
      )
      SELECT b.doc_id, b.n_words, b.avg_lp_micro,
             CAST(CASE WHEN b.avg_lp_micro >= cuts.c2 THEN 0
                       WHEN b.avg_lp_micro >= cuts.c1 THEN 1
                       ELSE 2 END AS BIGINT) AS ppl_bucket
      FROM base b CROSS JOIN cuts
      ORDER BY b.doc_id"""

  def oracleSql: Map[String, String] = Map(
    "src_schema_scan" ->
      "SELECT * FROM customer ORDER BY c_custkey",

    "src_typed_partition_values" -> """
      SELECT n_nationkey, n_name,
             CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_regionkey END AS part_value
      FROM nation ORDER BY n_nationkey""",

    "src_partition_prune" -> """
      SELECT count(*) AS n, round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders WHERE o_orderpriority = '1-URGENT'""",

    "src_projection_pushdown" -> """
      SELECT l_orderkey, l_linenumber FROM lineitem
      ORDER BY l_orderkey, l_linenumber""",

    "src_predicate_pushdown" -> """
      SELECT l_orderkey, l_linenumber, l_quantity,
             strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_ts
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_quantity > 45
      ORDER BY l_orderkey, l_linenumber""",

    "src_snapshot_union" -> """
      WITH v AS (SELECT * FROM orders WHERE o_orderstatus = 'O')
      SELECT * FROM (
        SELECT 'by_year' AS part, CAST(year(o_orderdate) AS VARCHAR) AS key,
               count(*) AS n, round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
        FROM v GROUP BY 2
        UNION ALL
        SELECT 'by_priority' AS part, o_orderpriority AS key,
               count(*) AS n, round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
        FROM v GROUP BY 2)
      ORDER BY part, key""",

    "q1_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_qty,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_base_price,
             round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_disc_price,
             round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_charge,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / count(l_quantity), 6) AS avg_qty,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / count(l_extendedprice), 6) AS avg_price,
             round(CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / count(l_discount), 6) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q6_forecast_revenue" -> """
      SELECT round(coalesce(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE), 0), 2) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount >= 0.05 AND l_discount <= 0.07
        AND l_quantity < 24""",

    "q3_shipping_priority" -> """
      SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 2) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
        AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
      GROUP BY 1, 2
      ORDER BY revenue DESC, order_date, l_orderkey
      LIMIT 10""",

    "q5_local_supplier_volume" -> """
      SELECT n_name, round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 2) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""",

    "q4_order_priority" -> """
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q_anti_customers_no_orders" -> """
      SELECT c_mktsegment, count(*) AS n
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    "q_outer_customer_orders" -> """
      SELECT c_custkey, count(o_orderkey) AS n_orders,
             round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 0), 2) AS spend
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
      ORDER BY c_custkey""",

    "q_topk_revenue_orders" -> """
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 20""",

    "q_distinct_ship_modes" -> """
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus""",

    "q_union_high_value_parties" -> """
      SELECT * FROM (
        SELECT c_name AS name, c_acctbal AS bal, 'customer' AS kind
        FROM customer WHERE c_acctbal > 9000
        UNION ALL
        SELECT s_name AS name, s_acctbal AS bal, 'supplier' AS kind
        FROM supplier WHERE s_acctbal > 9000)
      ORDER BY kind, name""",

    "q_window_top_parts_per_supplier" -> """
      WITH sp AS (
        SELECT l_suppkey, l_partkey,
               CAST(floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS rev_cents
        FROM lineitem GROUP BY 1, 2)
      SELECT l_suppkey, l_partkey, rev_cents, rnk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY l_suppkey
                       ORDER BY rev_cents DESC, l_partkey) AS INT) AS rnk
        FROM sp)
      WHERE rnk <= 3
      ORDER BY l_suppkey, rnk""",

    "q_rollup_nation_region" -> """
      SELECT coalesce(r_name, 'ALL') AS r, coalesce(n_name, 'ALL') AS n,
             count(*) AS n_cust, round(CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE), 2) AS bal
      FROM nation
      JOIN region   ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY r, n""",

    "q_countd_customers_per_segment" -> """
      SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations, count(*) AS n
      FROM customer
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    "q_groupagg_priorities_per_status" -> """
      SELECT o_orderstatus,
             string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    "q10_returned_items" -> """
      SELECT c_custkey, c_name, n_name,
             round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 2) AS revenue
      FROM customer
      JOIN orders   ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON n_nationkey = c_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      GROUP BY 1, 2, 3
      ORDER BY revenue DESC, c_custkey
      LIMIT 20""",

    "q17_small_qty_revenue" -> """
      SELECT round(coalesce(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE), 0) / 7.0, 2) AS avg_yearly
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#12'
        AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""",

    "q_pivot_status_by_priority" -> """
      SELECT o_orderstatus,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
             CAST(sum(CASE WHEN o_orderpriority = '2-HIGH'   THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
             CAST(sum(CASE WHEN o_orderpriority = '5-LOW'    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
             count(*) AS n
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    "src_partitioned_sink" -> """
      SELECT count(*) AS n, round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders WHERE o_orderpriority = '1-URGENT'""",

    "src_bucketed_join" -> """
      SELECT c_mktsegment, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q7_volume_shipping" -> """
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS yr,
             round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 2) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "q8_market_share" -> """
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
             round(CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))
                        ELSE CAST(0.0 AS DECIMAL(28,6)) END) AS DOUBLE)
                   / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 6) AS mkt_share
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA'
      GROUP BY 1 ORDER BY 1""",

    "q9_product_profit" -> """
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS yr,
             round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                 - p_retailprice * 0.1 * l_quantity AS DECIMAL(28,6))) AS DOUBLE), 2) AS profit
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_type LIKE '%PROMO%'
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_argmax_customer_per_nation" -> """
      SELECT n_name, c_custkey, c_name, c_acctbal FROM (
        SELECT n_name, c_custkey, c_name, c_acctbal,
               row_number() OVER (PARTITION BY n_name
                 ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer JOIN nation ON c_nationkey = n_nationkey)
      WHERE rn = 1 ORDER BY n_name""",

    "q_cube_status_priority" -> """
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY status, priority""",

    "q_grouping_sets" -> """
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
             count(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
      ORDER BY status, yr""",

    "q_percentile_quantity" -> """
      SELECT l_returnflag,
             round(quantile_cont(l_quantity, 0.5), 4) AS p50,
             round(quantile_cont(l_quantity, 0.9), 4) AS p90,
             count(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY 1""",

    // B78: external feature as-of (<=, left join + rank replay of the
    // native as-of), self features strictly before via rn-1/lag —
    // raw doubles move untouched so they hash bit-exact
    "q_feature_snapshot" -> """
      WITH m AS (
        SELECT e.event_id, e.user_id, e.ts, e.value, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                 ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      ), f1 AS (
        SELECT event_id, user_id, ts, value, o_totalprice
        FROM m WHERE rn = 1
      ), f AS (
        SELECT event_id, user_id,
               o_totalprice AS f_last_order_price,
               CAST(row_number() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) - 1 AS BIGINT) AS f_prior_events,
               lag(value) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS f_prev_value
        FROM f1)
      SELECT event_id, user_id, f_last_order_price, f_prior_events, f_prev_value
      FROM f ORDER BY event_id""",

    "q_asof_event_order" -> """
      WITH m AS (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
               row_number() OVER (PARTITION BY e.event_id
                 ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
      SELECT event_id, user_id, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date
      FROM m WHERE rn = 1 ORDER BY event_id""",

    // B54: RANGE frame boundaries are inclusive on both sides in both
    // engines; decimal window sum is accumulation-order independent
    "q_rolling_revenue" -> """
      SELECT o_orderkey, o_custkey,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
               AS rolling_total,
             CAST(count(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_in_window
      FROM orders ORDER BY o_orderkey""",

    // B26 outer: LEFT JOIN keeps unmatched events with null order cols
    "q_asof_event_order_outer" -> """
      WITH m AS (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
               row_number() OVER (PARTITION BY e.event_id
                 ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
         AND o.o_orderstatus = 'F')
      SELECT event_id, user_id, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date
      FROM m WHERE rn = 1 ORDER BY event_id""",

    "q_salted_join_revenue" -> """
      SELECT o_orderpriority,
             round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1 ORDER BY 1""",

    "q1_sql" -> """
      SELECT l_returnflag, l_linestatus,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_qty,
             round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_disc_price,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "src_csv_roundtrip" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // Oracle reads the ORIGINAL parquet rows — full-row equality
    // proves the write→JDBC-database→partitioned-read cycle lossless.
    // A25: the footer-only stats sweep must equal the full scan.
    "src_stats_table" -> """
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
             min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "src_jdbc_roundtrip" -> """
      SELECT s_suppkey, s_name, s_nationkey, s_acctbal
      FROM supplier ORDER BY s_suppkey""",

    // Oracle computes the same aggregate from the ORIGINAL parquet —
    // equality proves the ORC write/read round trip is lossless.
    "src_orc_roundtrip" -> """
      SELECT l_returnflag, count(*) AS n,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_qty,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "src_json_roundtrip" -> """
      SELECT c_mktsegment, count(*) AS n,
             round(CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE), 2) AS total_bal,
             CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // The evolved view = union_by_name of the two epochs' projections
    // (old files surface the added column as NULL).
    "src_schema_evolution" -> """
      WITH evolved AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               NULL AS o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL BY NAME
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 1)
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pre_evolution,
             CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM evolved GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // Oracle over the ORIGINAL parquet: the z-order rewrite must be
    // lossless for any predicate.
    "src_zorder_scan" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders WHERE o_custkey BETWEEN 100 AND 199
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // Oracle over the ORIGINAL parquet: compaction must be lossless.
    "src_compaction" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A16: the increment is exactly the epoch-2 writer's rows
    "src_snapshot_diff" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders WHERE o_orderstatus = 'F'
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A26: the epoch-1 pin — post-pin 'F' arrivals must be invisible
    "src_time_travel" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders WHERE o_orderstatus = 'O'
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A31: the engine answers this via bloom-pruned file scans (the
    // query fn REQUIRES pruning happened); the oracle is the plain
    // IN-query — false positives must never surface rows.
    "src_bloom_index" -> """
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey IN (0, 4, 32, 100, 256)
      ORDER BY o_orderkey""",

    // A30: the row-level deltas the A18 mutation implies — updates as
    // delete+insert pairs (old price / bumped price), moves as a
    // delete under 'O' plus an insert under 'F', plus the 3 fresh
    // inserts; every unchanged row of the rewritten partitions must
    // cancel out of the feed.
    "src_change_feed" -> """
      WITH upd AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 100 = 0),
      mov AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderstatus = 'O' AND o_orderkey % 100 = 50)
      SELECT * FROM (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               'delete' AS change_type FROM upd
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'delete' FROM mov
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1000.0, 'insert' FROM upd
        UNION ALL
        SELECT o_orderkey, o_custkey, 'F', o_totalprice, 'insert' FROM mov
        UNION ALL
        SELECT 900000000 + range, 1, 'F', 42.5, 'insert' FROM range(3))
      ORDER BY change_type, o_orderkey, o_orderstatus""",

    // A26 introspection: per-epoch pinned row counts (footers only);
    // epoch 1 = open orders, epoch 2 = open + finalized
    "src_snapshot_log" -> """
      SELECT CAST(1 AS BIGINT) AS snapshot_id,
             (SELECT count(*) FROM orders WHERE o_orderstatus = 'O') AS n_rows
      UNION ALL
      SELECT CAST(2 AS BIGINT),
             (SELECT count(*) FROM orders WHERE o_orderstatus IN ('O', 'F'))
      ORDER BY snapshot_id""",

    // A28: after restore, a PLAIN read sees only epoch 1
    "src_restore" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders WHERE o_orderstatus = 'O'
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A27: vacuum reclaims exactly the never-published 'P' files
    "src_vacuum" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders WHERE o_orderstatus IN ('O', 'F')
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A38: the published tip after the WAP flow is base ('O') + the
    // clean batch ('F') — the blocked dirty 'P' batch never lands
    "src_wap_publish" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders WHERE o_orderstatus IN ('O', 'F')
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A17: untouched partitions + the re-derived 'F' partition
    "src_dynamic_overwrite" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders WHERE o_orderstatus <> 'F' OR o_totalprice > 100
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A18: merged table = base with the same update/move/insert
    // mutation applied in SQL (keys ≡ 0 mod 100 of 'F' bumped,
    // keys ≡ 50 mod 100 of 'O' re-statused, 3 inserts)
    "src_merge_upsert" -> """
      WITH merged AS (
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'O' AND o_orderkey % 100 = 50
                    THEN 'F' ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderstatus = 'F' AND o_orderkey % 100 = 0
                    THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice
        FROM orders
        UNION ALL
        SELECT 900000000 + range, 'F', 42.5 FROM range(3))
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A19: survivors of the delete predicate; the emptied 'P'
    // partition must contribute no group at all
    "src_merge_delete" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders
      WHERE NOT (o_orderstatus = 'P'
                 OR (o_orderstatus = 'F' AND o_orderkey % 100 = 7))
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A42: MOR delete — two overlapping tombstone epochs (predicate
    // sweep + key erasure) must hide exactly the union of both
    // predicates' rows from the merge-on-read scan
    "src_mor_delete" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders
      WHERE NOT (o_totalprice > 400000.0) AND NOT (o_orderkey % 100 = 7)
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A44: equality delete — base + the served straggler, minus every
    // row (current OR appended-later) whose custkey is in either
    // erase epoch; the erased-key straggler (custkey 97) never appears
    "src_mor_erase" -> """
      WITH base AS (
        SELECT o_custkey, o_orderstatus, o_totalprice FROM orders
        UNION ALL
        SELECT 1, 'F', 42.5)
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM base
      WHERE o_custkey % 97 <> 0 AND o_custkey % 113 <> 0
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A43: MOR upsert — two chained generations (the second batch
    // supersedes the first's appended versions on keys ≡ 0 mod 200)
    // plus three inserts
    "src_mor_upsert" -> """
      WITH merged AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 200 = 0 THEN o_totalprice + 1001.0
                    WHEN o_orderkey % 100 = 0 THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
        UNION ALL
        SELECT 900000000 + range, 'F', 42.5 FROM range(3))
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A45: sequence-numbered equality upsert — two chained
    // generations plus inserts, with keys ≡ 500 mod 1000 erased at
    // infinite sequence so even the later resurrection attempt stays
    // masked; everything else follows the last finite generation
    "src_mor_upsert_eq" -> """
      WITH merged AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 200 = 0 THEN o_totalprice + 1001.0
                    WHEN o_orderkey % 100 = 0 THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE o_orderkey % 1000 <> 500
        UNION ALL
        SELECT 900000000 + range, 'F', 42.5 FROM range(3))
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A48: retention sweep — the served state must be exactly the
    // retained corpus, however the rows left (whole-file unlink or
    // straddler tombstone)
    "src_retention_sweep" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A46: incremental maintenance under mutation — the final summary
    // must equal the full recompute over delete + upsert + delete
    "src_mor_incremental_agg" -> MorLadderSql,

    // A49: the SAME ladder, but the downstream folds the published
    // change-feed segments alone — one oracle proving increment-fold
    // (A46) and feed-fold (A49) both equal the recompute
    "src_mor_change_feed" -> MorLadderSql,

    // A42-A45 SQL serving: SELECT FROM graft.db.t on a table mutated
    // with the FULL ladder (position upsert + delete, sequence-
    // numbered eq-upsert superseding by the Iceberg-v2 rule, GDPR
    // erase at infinite sequence) must serve exactly the morRead
    // answer — every mask composes split-locally in the v2 reader.
    // %200-bumped keys end in 00 and %1000==500 keys end in 00, so
    // neither intersects the %10==3 delete; the erase wins over the
    // eq-upsert where both touch a key (erase seq = infinity).
    "src_mor_sql_read" -> """
      WITH merged AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 200 = 0 THEN o_totalprice + 1001.0
                    WHEN o_orderkey % 100 = 0 THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE o_orderkey % 1000 <> 500
        UNION ALL
        SELECT 900000000 + range, 'F', 42.5 FROM range(3))
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM merged WHERE o_orderkey % 10 <> 3
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A58: the CTAS-created table must hold exactly the predicate's
    // rows with the declared types (the gate's publish value-checked)
    "src_sql_ddl" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders WHERE o_orderkey % 2 = 0
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A61: dropping o_custkey and renaming o_totalprice→price changes
    // declaration and bytes, never a value — the aggregate matches the
    // source rows under the CTAS predicate
    "src_sql_alter_rewrite" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders WHERE o_orderkey % 2 = 0
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A62: the declared zorder layout re-clusters every inserted batch
    // physically, never a value — the band aggregate matches the
    // source rows directly
    "src_sql_layout" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders WHERE o_custkey BETWEEN 100 AND 199
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A65: the bucket layout co-locates the join physically, never a
    // value change — the SPJ aggregate matches the plain oracle join
    "src_sql_bucket_join" -> """
      SELECT c.c_mktsegment, count(*) AS n,
             round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",

    // zorder over a TIMESTAMP key is physical clustering only — the
    // scan serves exactly the source rows
    "src_sql_layout_ts" -> """
      SELECT event_type, count(*) AS n,
             round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM events WHERE user_id BETWEEN 100 AND 299
      GROUP BY event_type ORDER BY event_type""",

    // string zorder key: the table arrives clustered on the priority
    // prefix — the band filter prunes row groups, the values match
    // the raw table
    "src_sql_layout_str" -> """
      SELECT o_orderpriority, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders WHERE o_orderpriority BETWEEN '1-URGENT' AND '2-HIGH'
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // the two-column bucket layout co-locates the composite-key join
    // physically — values match the plain oracle join
    "src_sql_bucket_join_multi" -> """
      SELECT count(*) AS n,
             round(CAST(sum(CAST(q.l_quantity AS BIGINT) * CAST(p.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS total
      FROM (SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem) q
      JOIN (SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem) p
        ON q.l_orderkey = p.l_orderkey AND q.l_linenumber = p.l_linenumber""",

    // reported v2 stats auto-broadcast the nation dim (no hint) — the
    // plan changes, the values never do
    "src_sql_join_broadcast" -> """
      SELECT n.n_name, count(*) AS n_cust,
             round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE), 2) AS total_bal
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name ORDER BY n.n_name""",

    // A54: the epoch captures generation-1 mutations (delete %10=3,
    // upsert %100=0 at +1000) and NOT the post-publish delete (%10=4)
    "src_mor_time_travel" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM (
        SELECT o_orderstatus,
               CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 10 <> 3)
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A60: the materialized export carries generation-1 mutations
    // (delete %10=3, upsert %100=0 at +1000) applied, and NOT the
    // post-publish delete (%10=4) — a plain foreign read serves them
    "src_export_material" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM (
        SELECT o_orderstatus,
               CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 10 <> 3)
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A55: SQL DELETE (%10=3) + UPDATE (%100=0 at +1000) + MERGE
    // (three inserts) + a multi-clause MERGE (matched-DELETE %1000=100,
    // matched-UPDATE +7 on %1000=600, one fresh insert), all
    // merge-on-read — state matches the SQL application of the same
    // mutations
    "src_mor_sql_dml" -> """
      WITH merged AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice + 1000.0
                    ELSE o_totalprice END
               + CASE WHEN o_orderkey % 1000 = 600 THEN 7.0
                      ELSE 0.0 END AS o_totalprice
        FROM orders
        WHERE o_orderkey % 10 <> 3 AND o_orderkey % 1000 <> 100
        UNION ALL
        SELECT 900000000 + range, 'F', 42.5 FROM range(3)
        UNION ALL
        SELECT 910000000, 'F', 99.5)
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM merged
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A42 compaction: folding the vector into the affected files must
    // change where survivors live, never what they are
    "src_mor_compact" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders WHERE o_orderkey % 10 <> 3
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // A20: increment + exact-decimal merge must equal the full
    // recompute over both epochs
    "src_incremental_agg" -> """
      SELECT o_orderpriority, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders WHERE o_orderstatus IN ('O', 'F')
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // B58: ntile ties ordered by o_orderkey so both engines assign
    // identically; bounds as floor-cents (round() on arbitrary
    // doubles diverges at half-cent boundaries)
    "q_histogram_equidepth" -> """
      WITH t AS (
        SELECT o_totalprice,
               CAST(ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS bucket
        FROM orders)
      SELECT bucket, count(*) AS n,
             CAST(floor(min(o_totalprice) * 100) AS BIGINT) AS lo_cents,
             CAST(floor(max(o_totalprice) * 100) AS BIGINT) AS hi_cents
      FROM t GROUP BY bucket ORDER BY bucket""",

    // B58 scale form: quantile_cont matches Spark's percentile
    // interpolation (established by B25); bucket = 1 + #boundaries
    // strictly below the price
    "q_histogram_equidepth_scalable" -> """
      WITH b AS (
        SELECT quantile_cont(o_totalprice, 0.125) AS q1,
               quantile_cont(o_totalprice, 0.25)  AS q2,
               quantile_cont(o_totalprice, 0.375) AS q3,
               quantile_cont(o_totalprice, 0.5)   AS q4,
               quantile_cont(o_totalprice, 0.625) AS q5,
               quantile_cont(o_totalprice, 0.75)  AS q6,
               quantile_cont(o_totalprice, 0.875) AS q7
        FROM orders)
      SELECT CAST(1 + (o.o_totalprice > b.q1)::INT + (o.o_totalprice > b.q2)::INT
                    + (o.o_totalprice > b.q3)::INT + (o.o_totalprice > b.q4)::INT
                    + (o.o_totalprice > b.q5)::INT + (o.o_totalprice > b.q6)::INT
                    + (o.o_totalprice > b.q7)::INT AS INT) AS bucket,
             count(*) AS n,
             CAST(floor(min(o.o_totalprice) * 100) AS BIGINT) AS lo_cents,
             CAST(floor(max(o.o_totalprice) * 100) AS BIGINT) AS hi_cents
      FROM orders o CROSS JOIN b
      GROUP BY 1 ORDER BY bucket""",

    // B59: each constraint is one narrow aggregate; a clean corpus
    // reports zero violations on all four rules
    "q_constraint_report" -> """
      WITH r AS (
        SELECT 'orderkey_unique' AS rule,
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations
        FROM orders
        UNION ALL
        SELECT 'custkey_in_customer',
               CAST(count(*) AS BIGINT)
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'status_in_domain',
               CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'totalprice_positive',
               CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders)
      SELECT rule, violations, CAST(violations = 0 AS INT) AS pass
      FROM r ORDER BY rule""",

    // B55: greedy earliest-anchor funnel — t2/t3 minima conditioned
    // on the anchor exactly as the Spark window chain computes them
    "q_funnel_conversion" -> """
      WITH u1 AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t1
        FROM events GROUP BY user_id),
      u2 AS (
        SELECT e.user_id, min(u1.t1) AS t1,
               min(CASE WHEN e.event_type = 'click' AND e.ts >= u1.t1
                         AND e.ts <= u1.t1 + INTERVAL 24 HOUR THEN e.ts END) AS t2
        FROM events e JOIN u1 USING (user_id) GROUP BY e.user_id),
      u3 AS (
        SELECT e.user_id, min(u2.t1) AS t1, min(u2.t2) AS t2,
               min(CASE WHEN e.event_type = 'purchase' AND e.ts >= u2.t2
                         AND e.ts <= u2.t1 + INTERVAL 24 HOUR THEN e.ts END) AS t3
        FROM events e JOIN u2 USING (user_id) GROUP BY e.user_id)
      SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 3
                       WHEN t2 IS NOT NULL THEN 2
                       WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS funnel_level,
             count(*) AS users
      FROM u3 GROUP BY 1 ORDER BY funnel_level""",

    // B56: day-exact week arithmetic (no engine week-truncation)
    "q_cohort_retention" -> """
      WITH d AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               min(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS cohort_d
        FROM events)
      SELECT CAST(floor(date_diff('day', DATE '2024-01-01', cohort_d) / 7.0) AS INT) AS cohort_week,
             CAST(floor(date_diff('day', cohort_d, d) / 7.0) AS INT) AS week_offset,
             count(DISTINCT user_id) AS active_users
      FROM d GROUP BY 1, 2 ORDER BY cohort_week, week_offset""",

    // B57: SCD2 intervals; lead() runs AFTER the change filter so an
    // interval closes at the next CHANGE, not the next raw event
    "q_scd2_user_status" -> """
      WITH ch AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events),
      kept AS (
        SELECT user_id, event_type, ts, event_id FROM ch
        WHERE prev_type IS NULL OR prev_type <> event_type)
      SELECT user_id, event_type AS status,
             strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
             strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                      '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
             CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  AS INT) AS is_current
      FROM kept ORDER BY user_id, valid_from""",

    // B63: adjacent-pair extraction via lead(), probabilities as
    // exact integer micros over the per-prev row total
    "q_markov_transitions" -> """
      WITH t AS (
        SELECT event_type AS prev_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events),
      c AS (
        SELECT prev_type, next_type, count(*) AS n
        FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2)
      SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
             CAST(n * 1000000 // sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS p_micro
      FROM c ORDER BY prev_type, next_type""",

    // B64: 30-minute-gap sessions; steps truncated to 5 BEFORE the
    // path fold (matching the Spark side's bounded collect)
    "q_session_paths" -> """
      WITH g AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_no
        FROM g),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY user_id, session_no ORDER BY ts, event_id) AS step
        FROM s),
      p AS (
        SELECT user_id, session_no,
               string_agg(event_type, '>' ORDER BY step) AS path
        FROM r WHERE step <= 5 GROUP BY user_id, session_no)
      SELECT path, count(*) AS n_sessions
      FROM p GROUP BY path
      ORDER BY n_sessions DESC, path LIMIT 20""",

    // B65: pair space bounded by per-order baskets; lift in exact
    // integer micros through HUGEINT (mirrors Spark's DECIMAL(38,0))
    "q_basket_lift" -> """
      WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_ab
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
      pc AS (
        SELECT l_partkey, count(*) AS n_part FROM op GROUP BY 1),
      tot AS (
        SELECT count(DISTINCT l_orderkey) AS n_orders FROM op)
      SELECT part_a, part_b, n_ab,
             CAST(CAST(n_ab AS HUGEINT) * n_orders * 1000000
                  // (CAST(ca.n_part AS HUGEINT) * cb.n_part) AS BIGINT) AS lift_micro
      FROM pairs
      JOIN pc ca ON ca.l_partkey = part_a
      JOIN pc cb ON cb.l_partkey = part_b
      CROSS JOIN tot
      ORDER BY n_ab DESC, part_a, part_b LIMIT 50""",

    // C14: sorted-neighborhood candidates — each doc vs its w=3
    // followers in the GLOBAL (pfx, doc_id) order (the engine's range
    // partition + dense global index is exactly row_number here),
    // plain unit-cost Levenshtein in both engines
    "dedup_sorted_neighborhood" -> """
      WITH d AS (
        SELECT doc_id, substr(text, 1, 64) AS pfx FROM documents),
      r AS (
        SELECT doc_id, pfx,
               row_number() OVER (ORDER BY pfx, doc_id) AS rn
        FROM d),
      c AS (
        SELECT a.doc_id AS ida, a.pfx AS pa, b.doc_id AS idb, b.pfx AS pb
        FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 3)
      SELECT least(ida, idb) AS doc_a, greatest(ida, idb) AS doc_b,
             CAST(levenshtein(pa, pb) AS BIGINT) AS edit_dist
      FROM c WHERE levenshtein(pa, pb) <= 16
      ORDER BY doc_a, doc_b""",

    // C14b: the full multi-pass method — forward-prefix pass UNION a
    // reversed-prefix (rotated key) pass, de-duplicated
    "dedup_sorted_neighborhood_multi" -> """
      WITH d AS (
        SELECT doc_id, substr(text, 1, 64) AS pfx FROM documents),
      r1 AS (
        SELECT doc_id, pfx,
               row_number() OVER (ORDER BY pfx, doc_id) AS rn
        FROM d),
      r2 AS (
        SELECT doc_id, pfx,
               row_number() OVER (ORDER BY reverse(pfx), doc_id) AS rn
        FROM d),
      c AS (
        SELECT a.doc_id AS ida, a.pfx AS pa, b.doc_id AS idb, b.pfx AS pb
        FROM r1 a JOIN r1 b ON b.rn - a.rn BETWEEN 1 AND 3
        UNION
        SELECT a.doc_id, a.pfx, b.doc_id, b.pfx
        FROM r2 a JOIN r2 b ON b.rn - a.rn BETWEEN 1 AND 3)
      SELECT DISTINCT least(ida, idb) AS doc_a, greatest(ida, idb) AS doc_b,
             CAST(levenshtein(pa, pb) AS BIGINT) AS edit_dist
      FROM c WHERE levenshtein(pa, pb) <= 16
      ORDER BY doc_a, doc_b""",

    // C15: multi-pass SNM linkage → recursive-CTE closure → window
    // survivorship election (longest text, ties to smallest id)
    "q_entity_resolution" -> """
      WITH RECURSIVE d AS (
        SELECT doc_id, substr(text, 1, 64) AS pfx FROM documents),
      r1 AS (
        SELECT doc_id, pfx,
               row_number() OVER (ORDER BY pfx, doc_id) AS rn FROM d),
      r2 AS (
        SELECT doc_id, pfx,
               row_number() OVER (ORDER BY reverse(pfx), doc_id) AS rn FROM d),
      c AS (
        SELECT a.doc_id AS ida, a.pfx AS pa, b.doc_id AS idb, b.pfx AS pb
        FROM r1 a JOIN r1 b ON b.rn - a.rn BETWEEN 1 AND 3
        UNION
        SELECT a.doc_id, a.pfx, b.doc_id, b.pfx
        FROM r2 a JOIN r2 b ON b.rn - a.rn BETWEEN 1 AND 3),
      e0 AS (
        SELECT DISTINCT least(ida, idb) AS doc_a, greatest(ida, idb) AS doc_b
        FROM c WHERE levenshtein(pa, pb) <= 16),
      e AS (SELECT doc_a, doc_b FROM e0 UNION ALL SELECT doc_b, doc_a FROM e0),
      cc AS (
        SELECT doc_id, doc_id AS reach FROM documents
        UNION
        SELECT cc.doc_id, e.doc_b FROM cc JOIN e ON e.doc_a = cc.reach),
      cl AS (SELECT doc_id, min(reach) AS cluster FROM cc GROUP BY doc_id),
      m AS (
        SELECT cl.doc_id, cl.cluster, dd.n_chars
        FROM cl JOIN documents dd USING (doc_id)),
      rk AS (
        SELECT doc_id, cluster, n_chars,
               row_number() OVER (PARTITION BY cluster
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM m),
      g AS (
        SELECT cluster, count(*) AS n_members, sum(n_chars) AS total_chars
        FROM m GROUP BY cluster)
      SELECT CAST(g.cluster AS BIGINT) AS canonical_id,
             CAST(g.n_members AS BIGINT) AS n_members,
             r.doc_id AS rep_id,
             CAST(r.n_chars AS BIGINT) AS rep_chars,
             CAST(g.total_chars AS BIGINT) AS total_chars
      FROM g JOIN rk r ON r.cluster = g.cluster AND r.rk = 1
      WHERE g.n_members > 1
      ORDER BY canonical_id""",

    // B68: pure integer skew diagnostics — no percentile FP anywhere
    "prof_key_skew" -> """
      WITH c AS (
        SELECT l_suppkey AS k, count(*) AS cnt FROM lineitem GROUP BY 1),
      m AS (
        SELECT count(*) AS n_keys, sum(cnt) AS n_rows, max(cnt) AS top_cnt
        FROM c),
      t AS (
        SELECT min(c.k) AS top_key FROM c, m WHERE c.cnt = m.top_cnt)
      SELECT CAST(n_keys AS BIGINT) AS n_keys,
             CAST(n_rows AS BIGINT) AS n_rows,
             CAST(top_key AS BIGINT) AS top_key,
             CAST(top_cnt AS BIGINT) AS top_cnt,
             CAST((top_cnt * 1000000) // n_rows AS BIGINT) AS top_share_micro,
             CAST((n_rows * 1000000) // n_keys AS BIGINT) AS mean_cnt_micro,
             CAST((top_cnt * 1000000) // (n_rows // n_keys) AS BIGINT) AS skew_ratio_micro,
             CAST(greatest(1, (top_cnt * n_keys + n_rows - 1) // n_rows) AS BIGINT) AS suggested_salt
      FROM m, t""",

    // B67: exact HUGEINT moment sums; every post-sum op (cast, sqrt,
    // *, /) is IEEE correctly rounded, so the floored micro matches
    // Spark bit-for-bit with no ULP caveat (contrast E8's ln note)
    // B77: the full grid incl. zero cells; expected + chi2 terms
    // micro-floored via 128-bit integer division in both engines
    "prof_contingency" -> """
      WITH d AS (SELECT source, lang FROM documents),
      cells AS (SELECT source, lang, count(*) AS o FROM d GROUP BY source, lang),
      r AS (SELECT source, count(*) AS rs FROM d GROUP BY source),
      c AS (SELECT lang, count(*) AS cs FROM d GROUP BY lang),
      n AS (SELECT count(*) AS n FROM d)
      SELECT r.source, c.lang, coalesce(o, 0) AS o,
             CAST((CAST(rs AS HUGEINT) * cs * 1000000) // n AS BIGINT) AS expected_micro,
             CAST(((CAST(coalesce(o, 0) AS HUGEINT) * n - CAST(rs AS HUGEINT) * cs) *
                   (CAST(coalesce(o, 0) AS HUGEINT) * n - CAST(rs AS HUGEINT) * cs) * 1000000)
                  // (CAST(rs AS HUGEINT) * cs * n) AS BIGINT) AS chi2_contrib_micro
      FROM r CROSS JOIN c CROSS JOIN n
      LEFT JOIN cells ON cells.source = r.source AND cells.lang = c.lang
      ORDER BY r.source, c.lang""",

    // B76: the row-level quarantine manifest — concat_ws skips NULL
    // rule slots identically in both engines
    "q_quarantine" -> """
      SELECT o_orderkey,
             concat_ws(',',
               CASE WHEN o_totalprice > 400000.0 THEN 'high_value' END,
               CASE WHEN o_orderstatus = 'P' AND o_totalprice > 300000.0
                    THEN 'large_pending' END,
               CASE WHEN c_custkey IS NULL THEN 'orphan_customer' END) AS reasons,
             CAST((CASE WHEN o_totalprice > 400000.0 THEN 1 ELSE 0 END) +
                  (CASE WHEN o_orderstatus = 'P' AND o_totalprice > 300000.0
                        THEN 1 ELSE 0 END) +
                  (CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_reasons
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      WHERE o_totalprice > 400000.0
         OR (o_orderstatus = 'P' AND o_totalprice > 300000.0)
         OR c_custkey IS NULL
      ORDER BY o_orderkey""",

    // B70: medians/MAD in doubled-cents integer space — quantile_cont
    // interpolation lands on integers, the fence compare is pure
    // BIGINT in both engines (no float boundary anywhere)
    "prof_outliers" -> """
      WITH b AS (
        SELECT o_orderpriority AS p,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 2 AS c2
        FROM orders),
      med AS (
        SELECT p, CAST(quantile_cont(c2, 0.5) AS BIGINT) AS med_c2
        FROM b GROUP BY p),
      dev AS (
        SELECT b.p, abs(c2 - med_c2) AS dev_c2, med_c2
        FROM b JOIN med ON b.p = med.p),
      mad AS (
        SELECT p, CAST(quantile_cont(dev_c2 * 2, 0.5) AS BIGINT) AS mad_c4
        FROM dev GROUP BY p)
      SELECT dev.p AS o_orderpriority, count(*) AS n,
             CAST(sum(CASE WHEN dev_c2 * 20000 > mad_c4 * 44478
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             max(med_c2) AS med_c2, max(mad.mad_c4) AS mad_c4
      FROM dev JOIN mad ON dev.p = mad.p
      GROUP BY dev.p ORDER BY o_orderpriority""",

    "prof_correlation" -> """
      WITH b AS (
        SELECT CAST(CAST(l_quantity AS DECIMAL(28,2)) * 100 AS BIGINT) AS x1,
               CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100 AS BIGINT) AS x2,
               CAST(CAST(l_discount AS DECIMAL(28,2)) * 100 AS BIGINT) AS x3
        FROM lineitem),
      m AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               sum(CAST(x1 AS HUGEINT)) AS s1, sum(CAST(x2 AS HUGEINT)) AS s2,
               sum(CAST(x3 AS HUGEINT)) AS s3,
               sum(CAST(x1 AS HUGEINT) * x1) AS s11,
               sum(CAST(x2 AS HUGEINT) * x2) AS s22,
               sum(CAST(x3 AS HUGEINT) * x3) AS s33,
               sum(CAST(x1 AS HUGEINT) * x2) AS s12,
               sum(CAST(x1 AS HUGEINT) * x3) AS s13,
               sum(CAST(x2 AS HUGEINT) * x3) AS s23
        FROM b)
      SELECT col_x, col_y, corr_micro FROM (
        SELECT 'l_discount' AS col_x, 'l_extendedprice' AS col_y,
               CAST(floor(CAST(n * s23 - s3 * s2 AS DOUBLE) * 1e6 /
                 nullif(sqrt(CAST(n * s33 - s3 * s3 AS DOUBLE)) *
                        sqrt(CAST(n * s22 - s2 * s2 AS DOUBLE)), 0.0)) AS BIGINT) AS corr_micro
        FROM m
        UNION ALL
        SELECT 'l_quantity', 'l_discount',
               CAST(floor(CAST(n * s13 - s1 * s3 AS DOUBLE) * 1e6 /
                 nullif(sqrt(CAST(n * s11 - s1 * s1 AS DOUBLE)) *
                        sqrt(CAST(n * s33 - s3 * s3 AS DOUBLE)), 0.0)) AS BIGINT)
        FROM m
        UNION ALL
        SELECT 'l_quantity', 'l_extendedprice',
               CAST(floor(CAST(n * s12 - s1 * s2 AS DOUBLE) * 1e6 /
                 nullif(sqrt(CAST(n * s11 - s1 * s1 AS DOUBLE)) *
                        sqrt(CAST(n * s22 - s2 * s2 AS DOUBLE)), 0.0)) AS BIGINT)
        FROM m)
      ORDER BY col_x, col_y""",

    "src_v2_inputformat_scan" -> """
      SELECT count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders WHERE o_totalprice > 200000""",

    "src_v2_decimal_scan" -> """
      SELECT l_returnflag, count(*) AS n,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE), 2) AS sum_qty,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price,
             round(CAST(sum(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE), 6) AS sum_disc
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // The engine answers this one from parquet footer statistics
    // alone (A28 aggregate pushdown); the oracle recomputes it from
    // the rows — stats and rows must agree exactly.
    "src_v2_agg_pushdown" -> """
      SELECT o_orderpriority, count(*) AS n, count(o_custkey) AS n_cust,
             min(o_custkey) AS mn_cust,
             max(o_custkey) AS mx_cust,
             round(CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS mn_dec,
             round(CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS mx_dec
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // Identical SQL text to the Spark side modulo the catalog-qualified
    // table name (graft.<db>.orders → orders): the catalog plugin must
    // be a pure naming layer over the same rows.
    "src_catalog_sql_scan" -> """
      SELECT o_orderstatus, count(*) AS n,
             min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
             CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                        * 100.0 + 0.5) AS BIGINT) AS total_cents
      FROM orders
      WHERE o_orderkey % 3 = 0
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    "src_catalog_partitioned_scan" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                        * 100.0 + 0.5) AS BIGINT) AS total_cents
      FROM orders
      WHERE o_orderstatus IN ('F', 'O')
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    // D7: packed sign bits — sign(float) is exact, literal powers of
    // two keep the sum in safe integer range on both engines.
    "sim_sign_quantize" -> s"""
      SELECT vec_id,
             CAST($signHiSql AS BIGINT) AS sig_hi,
             CAST($signLoSql AS BIGINT) AS sig_lo,
             CAST(length(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
      FROM embeddings ORDER BY vec_id""",

    "sim_quantize_int8" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
      sc AS (SELECT vec_id, emb,
                    list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
             FROM e)
      SELECT vec_id,
             CAST(floor(scale * 1e6) AS BIGINT) AS scale_micro,
             CAST(floor(list_max(list_transform(emb,
                  x -> abs(floor(x / scale + 0.5) * scale - x))) * 1e6) AS BIGINT) AS max_err_micro
      FROM sc ORDER BY vec_id""",

    // D5: fixed-point micro quantization makes the elementwise mean
    // exact-integer on both engines; pos alignment is 1-based
    "sim_label_centroids" -> """
      WITH flat AS (
        SELECT label,
               generate_subscripts(embedding, 1) AS pos,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS xm
        FROM embeddings),
      per_dim AS (
        SELECT label, pos, count(*) AS n,
               CAST(floor(CAST(sum(xm) AS DOUBLE) / count(*)) AS BIGINT) AS c_micro
        FROM flat GROUP BY label, pos)
      SELECT label,
             CAST(max(n) AS BIGINT) AS n_vecs,
             CAST(sum(c_micro * c_micro) AS BIGINT) AS norm2_micro2,
             min(c_micro) AS min_dim,
             max(c_micro) AS max_dim,
             max(CASE WHEN pos = 1 THEN c_micro END) AS dim1_micro
      FROM per_dim GROUP BY label ORDER BY label""",

    "text_langid" -> """
      WITH t AS (
        SELECT doc_id, lang, regexp_extract_all(lower(text), '\S+') AS toks
        FROM documents),
      scored AS (
        SELECT doc_id, lang,
               list_sort([
                 struct_pack(score := CAST(length(list_filter(toks, t -> t IN ('der','die','und','das','von','zu','den','mit','ist','des','im','nicht','ein','eine','auf'))) AS INT), lang := 'de'),
                 struct_pack(score := CAST(length(list_filter(toks, t -> t IN ('the','of','and','to','in','is','that','it','was','for','with','as','his','on','be'))) AS INT), lang := 'en'),
                 struct_pack(score := CAST(length(list_filter(toks, t -> t IN ('de','la','que','el','en','y','los','del','se','las','por','un','con','una','para'))) AS INT), lang := 'es'),
                 struct_pack(score := CAST(length(list_filter(toks, t -> t IN ('de','la','le','et','les','des','en','un','du','une','que','est','dans','qui','par'))) AS INT), lang := 'fr'),
                 struct_pack(score := CAST(length(list_filter(toks, t -> t IN ('的','了','在','是','我','有','和','就','不','人','都','一','一个','上','也'))) AS INT), lang := 'zh')])[5] AS best
        FROM t)
      SELECT doc_id, lang AS labeled_lang,
             best.lang AS pred_lang, best.score AS stopword_hits
      FROM scored ORDER BY doc_id""",

    "text_redact" -> """
      WITH t AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0
                    THEN text || ' contact: user' || CAST(doc_id AS VARCHAR) || '@example.com'
                    WHEN doc_id % 7 = 0 THEN text || ' call 555-123-4567'
                    ELSE text END AS text2
        FROM documents)
      SELECT doc_id,
             CAST(length(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             CAST(length(regexp_extract_all(text2, '\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
             CAST(length(regexp_replace(regexp_replace(text2,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                  '\d{3}-\d{3}-\d{4}', '[PHONE]', 'g')) AS BIGINT) AS redacted_len
      FROM t ORDER BY doc_id""",

    // E7: the sorted-fold top count / run length / n-gram dup
    // fractions mirror as plain unnest+window SQL; micro ratios are
    // floor()ed identically on both sides.
    "text_repetition" -> """
      WITH base AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS words FROM documents),
      flat AS (
        SELECT doc_id, unnest(words) AS word, generate_subscripts(words, 1) AS pos FROM base),
      counts AS (
        SELECT doc_id, word, count(*) AS c FROM flat GROUP BY 1, 2),
      top AS (SELECT doc_id, max(c) AS top_cnt FROM counts GROUP BY 1),
      runs AS (
        SELECT doc_id, word,
               pos - row_number() OVER (PARTITION BY doc_id, word ORDER BY pos) AS grp
        FROM flat),
      runlen AS (
        SELECT doc_id, max(cnt) AS max_run FROM (
          SELECT doc_id, count(*) AS cnt FROM runs GROUP BY doc_id, word, grp)
        GROUP BY doc_id),
      grams AS (
        SELECT doc_id, len(words) AS n_words,
               [words[i] || ' ' || words[i+1] FOR i IN range(1, len(words))] AS g2,
               [words[i] || ' ' || words[i+1] || ' ' || words[i+2] FOR i IN range(1, len(words)-1)] AS g3
        FROM base)
      SELECT g.doc_id,
             CAST(g.n_words AS BIGINT) AS n_words,
             CAST(t.top_cnt AS BIGINT) AS top_word_cnt,
             CAST(r.max_run AS BIGINT) AS max_run_len,
             CAST(floor(CAST(t.top_cnt AS DOUBLE) * 1000000.0 / g.n_words) AS BIGINT) AS top_word_micro,
             CAST(floor((len(g.g2) - len(list_distinct(g.g2))) * 1000000.0 / greatest(len(g.g2), 1)) AS BIGINT) AS dup_2gram_micro,
             CAST(floor((len(g.g3) - len(list_distinct(g.g3))) * 1000000.0 / greatest(len(g.g3), 1)) AS BIGINT) AS dup_3gram_micro
      FROM grams g JOIN top t ON t.doc_id = g.doc_id
                   JOIN runlen r ON r.doc_id = g.doc_id
      ORDER BY g.doc_id""",

    "q_sample_hash" -> """
      SELECT count(*) AS n,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM lineitem
      WHERE (l_orderkey * 2654435761) % 1000 < 100""",

    // Same stratified-rate predicate as Profiling.stratifiedSample:
    // per-status permille rate, multiplicative-hash selection.
    "q_stratified_sample" -> """
      WITH t AS (
        SELECT o_orderstatus, o_totalprice,
               (o_orderkey * 2654435761) % 1000 <
                 CASE o_orderstatus WHEN 'F' THEN 50
                                    WHEN 'O' THEN 100 ELSE 200 END AS picked
        FROM orders)
      SELECT o_orderstatus, count(*) AS n_total,
             CAST(sum(CASE WHEN picked THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
             CAST(floor(sum(CASE WHEN picked THEN 1 ELSE 0 END) * 1000000.0
                  / count(*)) AS BIGINT) AS rate_micro,
             round(CAST(sum(CAST(CASE WHEN picked THEN o_totalprice ELSE 0.0 END
                  AS DECIMAL(28,6))) AS DOUBLE), 2) AS sampled_revenue
      FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // Same per-column statistics as Profiling.profileOrders, one
    // SELECT per column union'd (the oracle need not be one-pass).
    "prof_orders_columns" -> """
      SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
             CAST(count(*) - count(o_custkey) AS BIGINT) AS n_nulls,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
             CAST(min(o_custkey) AS VARCHAR) AS min_s,
             CAST(max(o_custkey) AS VARCHAR) AS max_s
      FROM orders
      UNION ALL
      SELECT 'o_orderdate', count(*),
             CAST(count(*) - count(o_orderdate) AS BIGINT),
             CAST(count(DISTINCT o_orderdate) AS BIGINT),
             strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
             strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')
      FROM orders
      UNION ALL
      SELECT 'o_orderkey', count(*),
             CAST(count(*) - count(o_orderkey) AS BIGINT),
             CAST(count(DISTINCT o_orderkey) AS BIGINT),
             CAST(min(o_orderkey) AS VARCHAR), CAST(max(o_orderkey) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', count(*),
             CAST(count(*) - count(o_orderpriority) AS BIGINT),
             CAST(count(DISTINCT o_orderpriority) AS BIGINT),
             CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus', count(*),
             CAST(count(*) - count(o_orderstatus) AS BIGINT),
             CAST(count(DISTINCT o_orderstatus) AS BIGINT),
             CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_totalprice', count(*),
             CAST(count(*) - count(o_totalprice) AS BIGINT),
             CAST(count(DISTINCT o_totalprice) AS BIGINT),
             CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
             CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
      FROM orders
      ORDER BY col_name""",

    "q13_customer_distribution" -> """
      SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""",

    "q_histogram_totalprice" -> """
      SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin, count(*) AS n
      FROM orders GROUP BY 1 ORDER BY bin""",

    "q_wordcount" -> """
      SELECT token, count(*) AS n FROM (
        SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS token
        FROM documents)
      GROUP BY token
      ORDER BY n DESC, token
      LIMIT 20""",

    "q_pivot_api" -> """
      SELECT o_orderstatus,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS "1-URGENT",
             CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS "2-HIGH",
             CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS "3-MEDIUM",
             CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS "4-NOT SPECIFIED",
             CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS "5-LOW"
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q18_large_volume_orders" -> """
      SELECT c_custkey, c_name, o_orderkey, round(o_totalprice, 2) AS total
      FROM customer JOIN orders ON o_custkey = c_custkey
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
      ORDER BY c_custkey, o_orderkey""",

    // Purchases in same-user click intervals [click_ts, click_ts+1h),
    // end-exclusive; ONE string shared by the composed (hour-bucket)
    // and native (IntervalJoinExec) forms — the shared-oracle contract
    // is the point, so it must be impossible to edit one and miss the
    // other.
    "q_range_join_events_orders" -> RangeJoinOracle,
    "q_range_join_native" -> RangeJoinOracle,

    "q_json_props" -> """
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
             CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
             CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q14_promo_revenue" -> """
      SELECT CAST(floor(
               CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                    THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                    AS DECIMAL(28,6))) AS DOUBLE) * 1000000.0 /
               CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(28,6))) AS DOUBLE)) AS BIGINT) AS promo_share_micro,
             count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'""",

    "q15_top_supplier" -> """
      WITH rev AS (
        SELECT l_suppkey,
               round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(28,6))) AS DOUBLE), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      ORDER BY s_suppkey""",

    "q19_disjunctive_quals" -> """
      SELECT round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(28,6))) AS DOUBLE), 2) AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
             AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
             AND l_quantity BETWEEN 20 AND 40)""",

    "q22_idle_customers" -> """
      SELECT c_mktsegment, count(*) AS n_customers,
             round(CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE), 2) AS total_bal
      FROM customer
      WHERE c_acctbal > (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                 / CAST(count(*) AS BIGINT)
          FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // B46-B51: the remaining six TPC-H topologies (see TpchPatterns).
    // Shared derived relation: supply cost in integer micros per
    // (partkey, suppkey) — integer so the Q2 min-equality is exact.
    "q2_min_cost_supplier" -> """
      WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) * 1000000.0
                    / CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)) AS BIGINT) AS supply_cost_micro
        FROM lineitem GROUP BY 1, 2),
      cand AS (
        SELECT p_partkey, p_name, supply_cost_micro, s_name, s_acctbal, n_name
        FROM part
        JOIN ps ON ps_partkey = p_partkey
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE' AND p_type = 'STANDARD' AND p_size <= 10)
      SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost_micro
      FROM cand
      WHERE supply_cost_micro = (SELECT min(supply_cost_micro) FROM cand c2
                                 WHERE c2.p_partkey = cand.p_partkey)
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",

    "q11_important_parts" -> """
      WITH val AS (
        SELECT l_partkey,
               CAST(floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS value_cents
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name IN ('NATION_7', 'NATION_12')
        GROUP BY l_partkey)
      SELECT l_partkey, value_cents FROM val
      WHERE value_cents > (SELECT CAST(sum(value_cents) AS DOUBLE)
                                  * (0.05 / (SELECT count(*) FROM supplier)) FROM val)
      ORDER BY value_cents DESC, l_partkey""",

    "q12_priority_by_flag" -> """
      SELECT l_returnflag,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q16_supplier_cnt" -> """
      SELECT p_brand, p_type, p_size,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        AND p_size IN (1, 14, 23, 45, 9, 19, 36, 49)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    "q20_excess_suppliers" -> """
      WITH pair AS (
        SELECT l_suppkey, l_partkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS pair_qty
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey)
      SELECT s_name, s_acctbal
      FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'ASIA'
        AND s_suppkey IN (
          SELECT l_suppkey FROM pair
          WHERE pair_qty > (SELECT CAST(sum(CAST(pair_qty AS DECIMAL(28,6))) AS DOUBLE) * 0.5
                                   / count(*) FROM pair))
      ORDER BY s_name""",

    "q21_waiting_suppliers" -> """
      WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      FROM late l1
      JOIN supplier ON s_suppkey = l1.l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM late l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey)
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""",

    "q_except_intersect" -> """
      SELECT 'both' AS op, o_custkey FROM (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
      UNION ALL
      SELECT 'f_only' AS op, o_custkey FROM (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
      ORDER BY op, o_custkey""",

    // B61: the bloom prefilter is invisible to the result — the oracle
    // is the plain equi-join aggregate.
    "q_bloom_semi_join" -> """
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
             round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus = 'F'
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // B74: the long (measure, value) form via portable UNION ALL —
    // the Spark side runs the native unpivot Expand
    "q_unpivot" -> """
      WITH m AS (
        SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_discount', l_discount FROM lineitem)
      SELECT l_returnflag, measure, count(*) AS n,
             round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6) AS total
      FROM m GROUP BY l_returnflag, measure
      ORDER BY l_returnflag, measure""",

    // B75: the day spine × priority with zero-filled counts and the
    // packed-max forward fill — identical integer arithmetic, no
    // IGNORE NULLS portability hazard
    "q_gap_fill" -> """
      WITH o AS (
        SELECT o_orderpriority AS p, CAST(o_orderdate AS DATE) AS d,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM orders),
      daily AS (
        SELECT p, d, count(*) AS n_day, sum(cents) AS rev_c
        FROM o GROUP BY p, d),
      b AS (SELECT min(d) AS d0, max(d) AS d1 FROM o),
      spine AS (
        SELECT p, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
        FROM (SELECT DISTINCT p FROM o), b),
      j AS (
        SELECT spine.p, spine.d,
               coalesce(n_day, 0) AS n,
               CASE WHEN rev_c IS NOT NULL THEN
                 date_diff('day', DATE '1990-01-01', spine.d) * 10000000000000 + rev_c
               END AS pack
        FROM spine LEFT JOIN daily ON spine.p = daily.p AND spine.d = daily.d)
      SELECT p AS o_orderpriority, strftime(d, '%Y-%m-%d') AS day,
             CAST(n AS BIGINT) AS n,
             CAST(max(pack) OVER (PARTITION BY p ORDER BY d
               ROWS UNBOUNDED PRECEDING) % 10000000000000 AS BIGINT) AS rev_ffill_cents
      FROM j ORDER BY o_orderpriority, day""",

    // A35: the tagged epochs of BOTH tables — post-tag appends to
    // either table must be invisible through the tag
    "src_multi_table_tag" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'O' AND l_linenumber = 1
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // B69: the engine answers this from the registered MV rollup (the
    // query fn REQUIRES the rewrite fired); the oracle recomputes it
    // from the base rows — rollup algebra and base scan must agree
    // exactly.
    "q_mv_rewrite" -> """
      SELECT l_returnflag, count(*) AS n,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_qty,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_price,
             min(l_quantity) AS mn_qty, max(l_quantity) AS mx_qty,
             count(l_tax) AS n_tax
      FROM lineitem WHERE l_returnflag <> 'N'
      GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_heavy_hitters" -> """
      SELECT l_suppkey, count(*) AS n
      FROM lineitem GROUP BY l_suppkey
      ORDER BY n DESC, l_suppkey LIMIT 10""",

    // G13 batch twin: the leaderboard the streaming sink converges to.
    "stream_top_users" -> """
      SELECT user_id, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id
      ORDER BY n DESC, user_id LIMIT 10""",

    "stream_enriched_counts" -> """
      SELECT c_mktsegment, count(*) AS n,
             round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "dedup_exact" -> """
      SELECT min(doc_id) AS doc_id, count(*) AS n_copies
      FROM documents GROUP BY text ORDER BY doc_id""",

    // Same token regex as text_tokens' bpe count (hash-matched there),
    // same contiguous-fill rule: a doc's sequence = its preceding
    // cumulative token count div 2048, within (source, doc-bucket).
    // H10: the doc-grain boundary manifest — same window arithmetic
    // as H1, projected instead of re-aggregated
    "pipeline_pack_masks" -> """
      WITH t AS (
        SELECT doc_id, source, doc_id // 1000 AS bucket,
               CAST(length(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS tokens
        FROM documents
      ), r AS (
        SELECT source, bucket, doc_id, tokens,
               sum(tokens) OVER (PARTITION BY source, bucket ORDER BY doc_id) AS running
        FROM t
      )
      SELECT source, CAST(bucket AS BIGINT) AS bucket,
             CAST((running - tokens) // 2048 AS BIGINT) AS seq_no,
             doc_id,
             CAST(running - tokens - ((running - tokens) // 2048) * 2048 AS BIGINT) AS offset,
             tokens
      FROM r
      ORDER BY source, bucket, seq_no, doc_id""",

    // H13: windows used by per-bucket contiguous fill vs the
    // single-stream lower bound — the padding cost of parallelism
    "pipeline_pack_efficiency" -> """
      WITH t AS (
        SELECT doc_id, source, doc_id // 1000 AS bucket,
               CAST(length(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS tokens
        FROM documents
      ), b AS (
        SELECT source, bucket, sum(tokens) AS btok, count(*) AS nd
        FROM t GROUP BY source, bucket
      )
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(sum(nd) AS BIGINT) AS n_docs,
             CAST(sum(btok) AS BIGINT) AS total_tokens,
             CAST(sum((btok + 2047) // 2048) AS BIGINT) AS n_windows,
             CAST((sum(btok) + 2047) // 2048 AS BIGINT) AS windows_lb,
             CAST(sum((btok + 2047) // 2048) - (sum(btok) + 2047) // 2048
                  AS BIGINT) AS wasted_windows,
             CAST(((sum(btok) + 2047) // 2048 * 1000000)
                  // sum((btok + 2047) // 2048) AS BIGINT) AS efficiency_micro
      FROM b GROUP BY source ORDER BY source""",

    "pipeline_pack_sequences" -> """
      WITH t AS (
        SELECT doc_id, source, doc_id // 1000 AS bucket,
               CAST(length(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS tokens
        FROM documents
      ), r AS (
        SELECT source, bucket, doc_id, tokens,
               sum(tokens) OVER (PARTITION BY source, bucket ORDER BY doc_id) AS running
        FROM t
      )
      SELECT source, CAST(bucket AS BIGINT) AS bucket,
             CAST((running - tokens) // 2048 AS BIGINT) AS seq_no,
             count(*) AS n_docs,
             CAST(sum(tokens) AS BIGINT) AS seq_tokens,
             string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS docs_csv
      FROM r GROUP BY source, bucket, (running - tokens) // 2048
      ORDER BY source, bucket, seq_no""",

    // BPE encode replayed as literal SQL: the baked sf0.01 merge table
    // (BpeTokenizer.Sf001Merges, spec-guarded against training drift)
    // applied as nested replaces over the space-prefixed symbol string;
    // token count = space count (see BpeTokenizer.oracleEncodeSql).
    // E22 (`text_bpe_model`) shares this oracle VERBATIM: encoding
    // the training corpus from the persisted merge artifact alone
    // must reproduce the scan-time counts (artifact-served ≡
    // scan-time, the E21 discipline; same SF-pinned caveat).
    "text_bpe_tokens" -> BpeTokensSql,
    "text_bpe_model" -> BpeTokensSql,

    // H1 packing over the REAL subword counts of text_bpe_tokens
    // (same contiguous-fill rule as pipeline_pack_sequences).
    "pipeline_pack_sequences_bpe" -> s"""
      WITH wds AS (
        SELECT doc_id, unnest(regexp_extract_all(text,
          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS w
        FROM documents
      ), enc AS (
        SELECT doc_id,
               ${BpeTokenizer.oracleEncodeSql("w", BpeTokenizer.Sf001Merges)} AS e
        FROM wds
      ), cnt AS (
        SELECT doc_id,
               CAST(sum(length(e) - length(replace(e, ' ', ''))) AS BIGINT) AS tokens
        FROM enc GROUP BY doc_id
      ), t AS (
        SELECT d.doc_id, d.source, d.doc_id // 1000 AS bucket,
               coalesce(tokens, 0) AS tokens
        FROM documents d LEFT JOIN cnt USING (doc_id)
      ), r AS (
        SELECT source, bucket, doc_id, tokens,
               sum(tokens) OVER (PARTITION BY source, bucket ORDER BY doc_id) AS running
        FROM t
      )
      SELECT source, CAST(bucket AS BIGINT) AS bucket,
             CAST((running - tokens) // 2048 AS BIGINT) AS seq_no,
             count(*) AS n_docs,
             CAST(sum(tokens) AS BIGINT) AS seq_tokens,
             string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS docs_csv
      FROM r GROUP BY source, bucket, CAST((running - tokens) // 2048 AS BIGINT)
      ORDER BY source, bucket, seq_no""",

    // Zipf head coverage over the same whitespace tokenize as the
    // unigram scorer; coverage is exact integer division (no FP).
    // E17: Heaps-law growth — first-bucket per word, bucket-grain
    // triangular cumulative (correlated sums), exact integers
    "text_vocab_growth" -> """
      WITH b AS (SELECT max(doc_id) AS mx FROM documents),
      t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS word
            FROM documents),
      bk AS (SELECT word,
               least(19, doc_id // (((SELECT mx + 1 FROM b) + 19) // 20)) AS bucket
             FROM t),
      tok AS (SELECT bucket, count(*) AS n_tokens FROM bk GROUP BY bucket),
      fs AS (SELECT word, min(bucket) AS fb FROM bk GROUP BY word),
      nw AS (SELECT fb, count(*) AS n_new FROM fs GROUP BY fb)
      SELECT g.bucket,
             CAST((SELECT sum(t2.n_tokens) FROM tok t2
                   WHERE t2.bucket <= g.bucket) AS BIGINT) AS cum_tokens,
             CAST((SELECT sum(nw.n_new) FROM nw
                   WHERE nw.fb <= g.bucket) AS BIGINT) AS cum_vocab
      FROM tok g ORDER BY g.bucket""",

    // E19: ingestion-ordered bucket quality stats vs the corpus-wide
    // baseline (mean of bucket means); drifted = >30% deviation
    "text_ingest_drift" -> """
      WITH st AS (
        SELECT doc_id // 50 AS bucket,
               CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS nt,
               CAST(length(list_distinct(
                 regexp_extract_all(lower(text), '\S+'))) AS BIGINT) AS nd
        FROM documents
      ), pb AS (
        SELECT bucket, count(*) AS n_docs, sum(nt) AS tokens,
               (sum(nt) * 1000000) // count(*) AS mean_tokens_micro,
               (sum(nd) * 1000000) // greatest(sum(nt), 1) AS distinct_ratio_micro
        FROM st GROUP BY bucket
      ), base AS (
        SELECT sum(mean_tokens_micro) // count(*) AS base_mean_micro FROM pb
      )
      SELECT CAST(bucket AS BIGINT) AS bucket,
             CAST(n_docs AS BIGINT) AS n_docs,
             CAST(tokens AS BIGINT) AS tokens,
             CAST(mean_tokens_micro AS BIGINT) AS mean_tokens_micro,
             CAST(distinct_ratio_micro AS BIGINT) AS distinct_ratio_micro,
             CAST(base_mean_micro AS BIGINT) AS base_mean_micro,
             CAST(CASE WHEN abs(mean_tokens_micro - base_mean_micro) * 10 >
                  base_mean_micro * 3 THEN 1 ELSE 0 END AS BIGINT) AS drifted
      FROM pb, base ORDER BY bucket""",

    // E18: least-squares slope of ln(cnt) on ln(rank) over the top-100
    // words, exact integer sums, negated so the integer division stays
    // in the engines' agreeing non-negative range; HUGEINT for the 1e6
    // rescale (Spark side runs DECIMAL(38,0)).
    "text_zipf_slope" -> """
      WITH w AS (
        SELECT unnest(list_filter(
          string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0)) AS word
        FROM documents
      ), c AS (
        SELECT word, count(*) AS cnt FROM w GROUP BY word
      ), top AS (
        SELECT cnt, row_number() OVER (ORDER BY cnt DESC, word) AS rank
        FROM c ORDER BY cnt DESC, word LIMIT 100
      ), xy AS (
        SELECT CAST(floor(ln(rank) * 1000000) AS BIGINT) AS x,
               CAST(floor(ln(cnt) * 1000000) AS BIGINT) AS y
        FROM top
      ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
               CAST(sum(x * y) AS BIGINT) AS sum_xy,
               CAST(sum(x * x) AS BIGINT) AS sum_xx
        FROM xy
      )
      SELECT n_words, sum_x, sum_y, sum_xy, sum_xx,
             CAST(((CAST(sum_x AS HUGEINT) * sum_y - CAST(n_words AS HUGEINT) * sum_xy) * 1000000)
                  // (CAST(n_words AS HUGEINT) * sum_xx - CAST(sum_x AS HUGEINT) * sum_x)
                  AS BIGINT) AS neg_slope_micro
      FROM agg""",

    "text_vocab_coverage" -> """
      WITH w AS (
        SELECT unnest(list_filter(
          string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0)) AS word
        FROM documents
      ), c AS (
        SELECT word, count(*) AS cnt FROM w GROUP BY word
      ), t AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c
      ), top AS (
        SELECT word, cnt, row_number() OVER (ORDER BY cnt DESC, word) AS rank
        FROM c ORDER BY cnt DESC, word LIMIT 50
      )
      SELECT CAST(rank AS BIGINT) AS rank, word, CAST(cnt AS BIGINT) AS cnt,
             CAST(sum(cnt) OVER (ORDER BY rank) AS BIGINT) AS cum_cnt,
             CAST((CAST(sum(cnt) OVER (ORDER BY rank) AS BIGINT) * 1000000) // total
                  AS BIGINT) AS coverage_micro
      FROM top, t ORDER BY rank""",

    // Same window geometry as Assembly.chunkDocuments: 64-word chunks
    // advancing by 56, final chunk clipped, replayed via list slicing.
    "pipeline_chunk_documents" -> """
      WITH d AS (
        SELECT doc_id,
               regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS w
        FROM documents
      ), n AS (
        SELECT doc_id, w, CAST(len(w) AS BIGINT) AS nw FROM d WHERE len(w) > 0
      ), c AS (
        SELECT doc_id, w, nw,
               unnest(range(0, 1 + (greatest(nw - 64, 0) + 55) // 56)) AS chunk_no
        FROM n
      )
      SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
             CAST(chunk_no * 56 AS BIGINT) AS chunk_start,
             CAST(least(64, nw - chunk_no * 56) AS BIGINT) AS chunk_len,
             w[CAST(chunk_no * 56 + 1 AS INT)] AS first_word,
             w[CAST(chunk_no * 56 + least(64, nw - chunk_no * 56) AS INT)] AS last_word
      FROM c ORDER BY doc_id, chunk_no""",

    "pipeline_mixture_sample" -> """
      WITH t AS (
        SELECT source,
               100000 + (CAST(substr(source, 4) AS BIGINT) % 5) * 200000 AS weight_micro,
               CASE WHEN (doc_id * 1048573 + 11) % 1000000
                         < 100000 + (CAST(substr(source, 4) AS BIGINT) % 5) * 200000
                    THEN 1 ELSE 0 END AS kept
        FROM documents
      )
      SELECT source, count(*) AS n_docs,
             CAST(sum(kept) AS BIGINT) AS n_kept,
             CAST(first(weight_micro) AS BIGINT) AS weight_micro,
             CAST(floor(sum(kept) * 1000000.0 / count(*)) AS BIGINT) AS achieved_micro
      FROM t GROUP BY source ORDER BY source""",

    "dedup_substring" -> (spanHashCte + """, rep AS (
        SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) > 1
      ), stats AS (
        SELECT doc_id AS sdoc, count(*) AS n_spans,
               sum(CASE WHEN gh IN (SELECT gh FROM rep) THEN 1 ELSE 0 END) AS n_dup
        FROM g GROUP BY doc_id
      )
      SELECT d.doc_id,
             CAST(coalesce(s.n_spans, 0) AS BIGINT) AS n_spans,
             CAST(coalesce(s.n_dup, 0) AS BIGINT) AS n_dup_spans,
             CAST(floor(coalesce(s.n_dup, 0) * 1000000.0
                        / greatest(coalesce(s.n_spans, 0), 1)) AS BIGINT) AS dup_micro
      FROM documents d LEFT JOIN stats s ON d.doc_id = s.sdoc
      ORDER BY d.doc_id"""),

    // C13: paraphrase-leak gate — nearest eval doc by hash-embedding
    // cosine (Dedup.oracleSemanticContamSql reuses E12's vector CTE).
    "text_decontaminate_semantic" -> Dedup.oracleSemanticContamSql,

    // C12: new-epoch docs (doc_id % 5 = 0) probed against the
    // historical span index (distinct spans of the rest).
    "dedup_incremental" -> (spanHashCte + """, idx AS (
        SELECT DISTINCT gh FROM g WHERE doc_id % 5 <> 0
      ), np AS (
        SELECT doc_id AS pdoc, count(*) AS n_spans,
               sum(CASE WHEN gh IN (SELECT gh FROM idx) THEN 1 ELSE 0 END) AS n_seen
        FROM g WHERE doc_id % 5 = 0 GROUP BY doc_id
      )
      SELECT d.doc_id,
             CAST(coalesce(np.n_spans, 0) AS BIGINT) AS n_spans,
             CAST(coalesce(np.n_seen, 0) AS BIGINT) AS n_seen,
             CAST(floor(coalesce(np.n_seen, 0) * 1000000.0
                        / greatest(coalesce(np.n_spans, 0), 1)) AS BIGINT) AS seen_micro,
             CAST(CASE WHEN coalesce(np.n_spans, 0) > 0
                        AND coalesce(np.n_seen, 0) * 2 >= np.n_spans
                       THEN 1 ELSE 0 END AS BIGINT) AS is_dup
      FROM documents d LEFT JOIN np ON d.doc_id = np.pdoc
      WHERE d.doc_id % 5 = 0
      ORDER BY d.doc_id"""),

    // C10: distinct (source, span-hash) sets per source, pairwise
    // shared counts + exact integer Jaccard — zero-overlap pairs kept.
    "dedup_source_overlap" -> (spanHashCte + """, ps AS (
        SELECT DISTINCT d.source, g.gh
        FROM g JOIN documents d USING (doc_id)
      ), cnt AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n FROM ps GROUP BY source
      ), sh AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM ps a JOIN ps b ON a.gh = b.gh AND a.source < b.source
        GROUP BY a.source, b.source
      )
      SELECT ca.source AS source_a, cb.source AS source_b,
             ca.n AS n_a, cb.n AS n_b,
             CAST(coalesce(sh.n_shared, 0) AS BIGINT) AS n_shared,
             CAST((coalesce(sh.n_shared, 0) * 1000000)
                  // (ca.n + cb.n - coalesce(sh.n_shared, 0)) AS BIGINT) AS jaccard_micro
      FROM cnt ca JOIN cnt cb ON ca.source < cb.source
      LEFT JOIN sh ON sh.source_a = ca.source AND sh.source_b = cb.source
      ORDER BY source_a, source_b"""),

    // F5: per-kind duplicate accounting over the md5 prefix signature
    // (md5 over UTF-8 is engine-independent).
    // F7: H3's min-budget sampling with modality token units — the
    // payload stand-in byte lengths feed the same ceil-div patch/
    // frame conversions on both sides; integer-exact throughout
    "mm_token_budget" -> """
      WITH pairs AS (
        SELECT doc_id,
               ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS cap_toks,
               CAST(length(text) AS BIGINT) AS n_bytes
        FROM documents
      ), p2 AS (
        SELECT *, CAST(CASE kind
            WHEN 'image' THEN (n_bytes + 255) // 256
            WHEN 'audio' THEN (n_bytes + 319) // 320
            ELSE (n_bytes % 5 + 1) * 64 END AS BIGINT) AS pay_toks
        FROM pairs
      ), p3 AS (SELECT *, cap_toks + pay_toks AS toks FROM p2
      ), totals AS (
        SELECT kind, sum(toks) AS total_tokens,
               sum(cap_toks) AS caption_tokens,
               sum(pay_toks) AS payload_tokens
        FROM p3 GROUP BY kind
      ), rates AS (
        SELECT kind, total_tokens, caption_tokens, payload_tokens,
               (SELECT min(total_tokens) FROM totals) AS budget,
               ((SELECT min(total_tokens) FROM totals) * 1000000) // total_tokens AS rate_micro
        FROM totals)
      SELECT p.kind,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN (p.doc_id * 1048573 + 11) % 1000000 < r.rate_micro
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(min(r.caption_tokens) AS BIGINT) AS caption_tokens,
             CAST(min(r.payload_tokens) AS BIGINT) AS payload_tokens,
             CAST(min(r.total_tokens) AS BIGINT) AS total_tokens,
             CAST(min(r.budget) AS BIGINT) AS budget_tokens,
             CAST(min(r.rate_micro) AS BIGINT) AS rate_micro,
             CAST(sum(CASE WHEN (p.doc_id * 1048573 + 11) % 1000000 < r.rate_micro
                      THEN p.toks ELSE 0 END) AS BIGINT) AS kept_tokens
      FROM p3 p JOIN rates r ON p.kind = r.kind
      GROUP BY p.kind ORDER BY p.kind""",

    // F6: pair-curation funnel — the same span-hash CTE as C8/C9,
    // md5 prefix signatures as F5, integer-exact quality gate, and
    // arg_min carrying the min-doc survivor's flags (Spark min_by).
    "pipeline_curate_pairs" -> (spanHashCte + """, benchspans AS (
        SELECT DISTINCT gh FROM g WHERE doc_id % 97 = 0
      ), spans AS (
        SELECT doc_id AS sdoc, count(*) AS n_spans,
               sum(CASE WHEN gh IN (SELECT gh FROM benchspans) THEN 1 ELSE 0 END) AS n_overlap
        FROM g WHERE doc_id % 97 <> 0 GROUP BY doc_id
      ), pairs AS (
        SELECT doc_id,
               ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
               md5(substr(text, 1, 64)) AS sig,
               n_chars,
               len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                   x -> length(x) > 0)) AS n_tokens,
               len(list_distinct(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                   x -> length(x) > 0))) AS n_distinct
        FROM documents WHERE doc_id % 97 <> 0
      ), flagged AS (
        SELECT p.*,
               (p.n_tokens >= 20 AND p.n_distinct * 2 >= p.n_tokens) AS quality_ok,
               coalesce(s.n_spans > 0 AND s.n_overlap * 10 >= s.n_spans, FALSE) AS contaminated
        FROM pairs p LEFT JOIN spans s ON p.doc_id = s.sdoc
      ), persig AS (
        SELECT kind, sig, count(*) AS n_in,
               arg_min(quality_ok, doc_id) AS q_ok,
               arg_min(contaminated, doc_id) AS contam,
               arg_min(n_chars, doc_id) AS s_chars,
               arg_min(n_tokens, doc_id) AS s_tokens
        FROM flagged GROUP BY kind, sig
      )
      SELECT kind,
             CAST(sum(n_in) AS BIGINT) AS n_pairs,
             count(*) AS n_unique,
             CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
             CAST(sum(CASE WHEN q_ok AND NOT contam THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(sum(CASE WHEN q_ok AND NOT contam THEN s_chars ELSE 0 END) AS BIGINT) AS kept_payload_bytes,
             CAST(sum(CASE WHEN q_ok AND NOT contam THEN s_tokens ELSE 0 END) AS BIGINT) AS kept_caption_tokens
      FROM persig GROUP BY kind ORDER BY kind"""),

    "mm_payload_dedup" -> """
      WITH m AS (
        SELECT doc_id,
               ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
               md5(substr(text, 1, 64)) AS sig
        FROM documents
      )
      SELECT kind, count(*) AS n,
             CAST(count(DISTINCT sig) AS BIGINT) AS n_distinct,
             CAST(count(*) - count(DISTINCT sig) AS BIGINT) AS n_dups,
             CAST(((count(*) - count(DISTINCT sig)) * 1000000) // count(*)
                  AS BIGINT) AS dup_micro
      FROM m GROUP BY kind ORDER BY kind""",

    // H1 (split form): true causal-LM packing — window occupancy per
    // doc from the token-axis interval [running-tokens, running).
    "pipeline_pack_split" -> """
      WITH t AS (
        SELECT doc_id, source, doc_id // 1000 AS bucket,
               CAST(length(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS tokens
        FROM documents
      ), r AS (
        SELECT source, bucket, doc_id, tokens,
               sum(tokens) OVER (PARTITION BY source, bucket ORDER BY doc_id) AS e
        FROM t
      ), i AS (
        SELECT source, bucket, doc_id, tokens,
               CAST(e - tokens AS BIGINT) AS s, CAST(e AS BIGINT) AS e
        FROM r WHERE tokens > 0
      ), w AS (
        SELECT source, bucket, doc_id, s, e,
               unnest(range(s // 2048, (e - 1) // 2048 + 1)) AS seq_no
        FROM i
      )
      SELECT source, CAST(bucket AS BIGINT) AS bucket,
             CAST(seq_no AS BIGINT) AS seq_no,
             count(*) AS n_docs,
             CAST(sum(least(e, (seq_no + 1) * 2048) - greatest(s, seq_no * 2048))
                  AS BIGINT) AS seq_tokens
      FROM w GROUP BY source, bucket, seq_no
      ORDER BY source, bucket, seq_no""",

    // H5: equal-token-budget mixing — smallest source's token count is
    // the budget; keep-rate in exact micro integers via the H2 hash rule.
    "pipeline_token_budget" -> """
      WITH t AS (
        SELECT doc_id, source,
               CAST(length(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS tokens
        FROM documents
      ), tot AS (
        SELECT source, CAST(sum(tokens) AS BIGINT) AS total_tokens
        FROM t GROUP BY source
      ), b AS (
        SELECT CAST(min(total_tokens) AS BIGINT) AS budget FROM tot
      ), r AS (
        SELECT source, total_tokens, budget,
               CAST((budget * 1000000) // total_tokens AS BIGINT) AS rate_micro
        FROM tot, b
      ), k AS (
        SELECT t.doc_id, t.source, t.tokens, r.total_tokens, r.budget, r.rate_micro,
               CASE WHEN (t.doc_id * 1048573 + 11) % 1000000 < r.rate_micro
                    THEN 1 ELSE 0 END AS kept
        FROM t JOIN r USING (source)
      )
      SELECT source, count(*) AS n_docs,
             CAST(sum(kept) AS BIGINT) AS n_kept,
             CAST(any_value(total_tokens) AS BIGINT) AS total_tokens,
             CAST(any_value(budget) AS BIGINT) AS budget_tokens,
             CAST(any_value(rate_micro) AS BIGINT) AS rate_micro,
             CAST(sum(kept * tokens) AS BIGINT) AS kept_tokens
      FROM k GROUP BY source ORDER BY source""",

    "dedup_substring_removal" -> (spanHashCte + """, rep AS (
        SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) > 1
      ), cov AS (
        SELECT DISTINCT doc_id AS cdoc, p + off AS idx
        FROM g CROSS JOIN (SELECT unnest(range(0, 4)) AS off)
        WHERE gh IN (SELECT gh FROM rep)
      ), covlist AS (
        SELECT cdoc, list_sort(list(idx)) AS cv FROM cov GROUP BY cdoc
      )
      SELECT w.doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST(coalesce(len(c.cv), 0) AS BIGINT) AS n_removed,
             coalesce(array_to_string(
               [ws[i] FOR i IN range(1, len(ws) + 1)
                IF NOT list_contains(coalesce(c.cv, []), i)], ' '), '') AS cleaned_text
      FROM w LEFT JOIN covlist c ON w.doc_id = c.cdoc
      ORDER BY w.doc_id"""),

    "text_decontaminate" -> (spanHashCte + """, benchspans AS (
        SELECT DISTINCT gh FROM g WHERE doc_id % 97 = 0
      ), t AS (
        SELECT doc_id AS tdoc, count(*) AS n_spans,
               sum(CASE WHEN gh IN (SELECT gh FROM benchspans) THEN 1 ELSE 0 END) AS n_overlap
        FROM g WHERE doc_id % 97 <> 0 GROUP BY doc_id
      )
      SELECT d.doc_id,
             CAST(coalesce(t.n_spans, 0) AS BIGINT) AS n_spans,
             CAST(coalesce(t.n_overlap, 0) AS BIGINT) AS n_overlap,
             CAST(floor(coalesce(t.n_overlap, 0) * 1000000.0
                        / greatest(coalesce(t.n_spans, 0), 1)) AS BIGINT) AS overlap_micro,
             CAST(CASE WHEN coalesce(t.n_spans, 0) > 0
                        AND coalesce(t.n_overlap, 0) * 10 >= t.n_spans
                  THEN 1 ELSE 0 END AS INT) AS contaminated
      FROM documents d LEFT JOIN t ON d.doc_id = t.tdoc
      WHERE d.doc_id % 97 <> 0
      ORDER BY d.doc_id"""),

    // Same sampled string-shingle pipeline as Dedup.ngramJaccardExact:
    // 1-indexed DuckDB range(1, len-1) == Spark's 0-indexed
    // sequence(0, size-3); floor-micro Jaccard is bit-identical (int
    // ratio through IEEE double).
    "dedup_ngram_jaccard" -> """
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
        WHERE mod(doc_id * 2654435761, 1000) < 100
      ), sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        FROM toks WHERE len(t) >= 3
      )
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(floor(len(list_intersect(a.s, b.s)) * 1000000.0 /
                  len(list_distinct(a.s || b.s))) AS BIGINT) AS jaccard_micro
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      ORDER BY jaccard_micro DESC, doc_a, doc_b
      LIMIT 200""",

    // Same portable pipeline as Dedup.nearDupClustersExact: lex-min
    // shingle blocking keys -> candidate pairs -> integer Jaccard
    // edge test (2*|A∩B| >= |A∪B|, no floats) -> connected
    // components, closed here by a recursive CTE enumerating
    // reachability (min reached id = cluster id).
    // Composite curation pass: quality gate + cluster representatives
    // (same CTE pipeline as dedup_clusters_exact) + per-source totals.
    // Stage 2 (decontamination) mirrors text_decontaminate's gate: the
    // span-hash CTEs are inlined because this oracle's WITH chain is
    // RECURSIVE (the connected-components fixpoint below).
    "pipeline_curate_corpus" -> (curatedDocsCte + """
      SELECT source, count(*) AS n_kept,
             CAST(sum(n_chars) AS BIGINT) AS kept_chars,
             CAST(sum(n_toks) AS BIGINT) AS kept_tokens
      FROM kept GROUP BY source ORDER BY source"""),

    // H3: the whole build — curated docs (C7's chain) → mixture keep
    // rule (H2) → contiguous packing (H1, over the curated whitespace
    // token counts) — per-source sequence accounting.
    "pipeline_assemble_corpus" -> (curatedDocsCte + """, mix AS (
        SELECT doc_id, source, doc_id // 1000 AS bucket,
               CAST(n_toks AS BIGINT) AS tokens
        FROM kept
        WHERE (doc_id * 1048573 + 11) % 1000000 <
              100000 + (CAST(substr(source, 4) AS BIGINT) % 5) * 200000
      ), packed AS (
        SELECT source, bucket, tokens,
               sum(tokens) OVER (PARTITION BY source, bucket ORDER BY doc_id) AS running
        FROM mix
      )
      SELECT source, count(*) AS n_docs,
             CAST(count(DISTINCT (bucket, (running - tokens) // 2048)) AS BIGINT) AS n_seqs,
             CAST(sum(tokens) AS BIGINT) AS total_tokens
      FROM packed GROUP BY source ORDER BY source"""),

    "dedup_clusters_exact" -> (clusterCte + """
      SELECT doc_id, cluster FROM cl ORDER BY doc_id"""),

    // C17: the C7 chain with per-stage accounting, extended with the
    // E20 perplexity cut as a final stage — the LM and cutoffs derive
    // from the stage-3 SURVIVOR corpus (fw/fc/ft mirror PerplexitySql
    // over `kept` instead of `documents`; head+middle = avg_lp >= c1)
    "pipeline_curation_funnel" -> (curatedDocsCte + """, fw AS (
        SELECT k.doc_id, unnest(list_filter(
          string_split_regex(trim(lower(d.text)), '\s+'), x -> length(x) > 0)) AS word
        FROM kept k JOIN documents d ON k.doc_id = d.doc_id
      ), fc AS (
        SELECT word, count(*) AS cnt FROM fw GROUP BY word
      ), ft AS (
        SELECT CAST(count(*) AS DOUBLE) AS total FROM fw
      ), fperdoc AS (
        SELECT fw.doc_id, count(*) AS n_words,
               sum(CAST(floor(ln(fc.cnt / (SELECT total FROM ft)) * 1000000.0) AS BIGINT)) AS sum_lp
        FROM fw JOIN fc USING (word) GROUP BY fw.doc_id
      ), fbase AS (
        SELECT doc_id, CAST(floor(CAST(sum_lp AS DOUBLE) / n_words) AS BIGINT) AS avg_lp
        FROM fperdoc
      ), fhist AS (
        SELECT avg_lp AS v, count(*) AS nv FROM fbase GROUP BY 1
      ), fcum AS (
        SELECT v, sum(nv) OVER (ORDER BY v) AS cn FROM fhist
      ), ftot AS (
        SELECT count(*) AS nn FROM fbase
      ), fcut AS (
        SELECT (SELECT min(v) FROM fcum
                WHERE cn >= ((SELECT nn FROM ftot) + 2) // 3) AS c1
      ), s4 AS (
        SELECT b.doc_id FROM fbase b CROSS JOIN fcut WHERE b.avg_lp >= fcut.c1
      )
      SELECT * FROM (
        SELECT CAST(0 AS BIGINT) AS stage_ord, 'ingested' AS stage,
               count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS n_tokens FROM q
        UNION ALL
        SELECT 1, 'quality', count(*), CAST(sum(n_toks) AS BIGINT)
        FROM q WHERE n_toks >= 10 AND n_distinct * 10 >= n_toks * 3
        UNION ALL
        SELECT 2, 'decontaminated', count(*), CAST(sum(n_toks) AS BIGINT)
        FROM q JOIN clean USING (doc_id)
        WHERE n_toks >= 10 AND n_distinct * 10 >= n_toks * 3
        UNION ALL
        SELECT 3, 'dedup', count(*), CAST(sum(n_toks) AS BIGINT) FROM kept
        UNION ALL
        SELECT 4, 'perplexity', count(*), CAST(sum(n_toks) AS BIGINT)
        FROM kept JOIN s4 USING (doc_id)
      ) ORDER BY stage_ord"""),

    // Same sampled exact-cosine pipeline as Dedup.embeddingCosineExact;
    // floor-micro keeps identical double bits identical after trunc.
    "dedup_embedding_cosine" -> """
      WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        WHERE mod(vec_id * 2654435761, 1000) < 100)
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(floor(list_dot_product(a.emb, b.emb) /
                  (sqrt(list_dot_product(a.emb, a.emb)) *
                   sqrt(list_dot_product(b.emb, b.emb))) * 1000000.0) AS BIGINT) AS cos_micro
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      ORDER BY cos_micro DESC, vec_a, vec_b
      LIMIT 200""",

    // SemDeDup (C11): baked sf0.01 k-means centroids replayed as
    // literal integer arithmetic (SemDedup.oracleSql; drift-guarded
    // by SemDedupSpec like the baked BPE merge table).
    "dedup_semantic" -> SemDedup.oracleSql(),

    // MMR diversified top-k (D8): integer micro-cosines, greedy
    // unrolled as k-1 CTE steps (Mmr.oracleSql generates them).
    "sim_mmr_topk" -> Mmr.oracleSql(),

    // Feature-hashed embeddings (E12) + kNN over them (D9): the
    // rolling word hash replays in DuckDB via list_reduce.
    "text_hash_embed" -> HashEmbed.oracleEmbedSql,
    "sim_hash_embed_knn" -> HashEmbed.oracleKnnSql,

    // D12: the same top-k, but only candidates whose document is
    // English are ever scored — the filter precedes the distance
    "sim_filtered_topk" -> """
      WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
                 FROM embeddings WHERE vec_id < 5),
           e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                 FROM embeddings JOIN documents ON vec_id = doc_id
                 WHERE lang = 'en')
      SELECT query_id, neighbor_id, cos FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               round(list_dot_product(q.q_emb, e.emb) /
                     (sqrt(list_dot_product(q.q_emb, q.q_emb)) * sqrt(list_dot_product(e.emb, e.emb))), 4) AS cos,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY list_dot_product(q.q_emb, e.emb) /
                          (sqrt(list_dot_product(q.q_emb, q.q_emb)) * sqrt(list_dot_product(e.emb, e.emb))) DESC,
                          e.vec_id) AS rn
        FROM q, e WHERE e.vec_id <> q.query_id)
      WHERE rn <= 10
      ORDER BY query_id, neighbor_id""",

    "sim_bruteforce_topk" -> """
      WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
                 FROM embeddings WHERE vec_id < 5),
           e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
      SELECT query_id, neighbor_id, cos FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               round(list_dot_product(q.q_emb, e.emb) /
                     (sqrt(list_dot_product(q.q_emb, q.q_emb)) * sqrt(list_dot_product(e.emb, e.emb))), 4) AS cos,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY list_dot_product(q.q_emb, e.emb) /
                          (sqrt(list_dot_product(q.q_emb, q.q_emb)) * sqrt(list_dot_product(e.emb, e.emb))) DESC,
                          e.vec_id) AS rn
        FROM q, e WHERE e.vec_id <> q.query_id)
      WHERE rn <= 10
      ORDER BY query_id, neighbor_id""",

    "text_quality" -> """
      SELECT doc_id,
        CAST(length(text) AS BIGINT) AS n_chars_m,
        CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        CAST(length(list_distinct(regexp_extract_all(lower(text), '\S+'))) AS BIGINT) AS n_distinct_tokens,
        CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
        CAST(length(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
        CAST(length(list_filter(regexp_extract_all(lower(text), '\S+'),
             t -> t IN ('the','a','of','and','in','to','is'))) AS BIGINT) AS n_stopwords,
        round(CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
              / greatest(CAST(length(text) AS BIGINT), 1), 6) AS punct_ratio,
        round(CAST(length(list_distinct(regexp_extract_all(lower(text), '\S+'))) AS DOUBLE)
              / greatest(CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT), 1), 6) AS distinct_ratio,
        round(CAST(length(list_filter(regexp_extract_all(lower(text), '\S+'),
              t -> t IN ('the','a','of','and','in','to','is'))) AS DOUBLE)
              / greatest(CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT), 1), 6) AS stopword_ratio
      FROM documents ORDER BY doc_id""",

    "text_tokens" -> """
      SELECT doc_id,
        CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws_tokens,
        CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens,
        CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_tokens
      FROM documents ORDER BY doc_id""",

    // Same portable winnowing pipeline as TextAnalysis.fingerprintExact:
    // 5-gram polynomial hash in exact BIGINT (max ~1.1e12, no modulus),
    // window-4 min selection, distinct fingerprint set summarized as
    // (count, min, max). DuckDB range(1,N) is exclusive == Spark
    // sequence(1,N-1) inclusive.
    "text_fingerprint_exact" -> """
      WITH h AS (
        SELECT doc_id,
          list_transform(range(1, greatest(length(text) - 3, 1)), p ->
            CAST(ord(substr(text, p, 1)) AS BIGINT) * 4362470401 +
            CAST(ord(substr(text, p + 1, 1)) AS BIGINT) * 16974593 +
            CAST(ord(substr(text, p + 2, 1)) AS BIGINT) * 66049 +
            CAST(ord(substr(text, p + 3, 1)) AS BIGINT) * 257 +
            CAST(ord(substr(text, p + 4, 1)) AS BIGINT)) AS hs
        FROM documents
      ), w AS (
        SELECT doc_id, list_distinct(
          list_transform(range(1, greatest(len(hs) - 2, 1)),
            j -> list_min(hs[j:j+3]))) AS fp
        FROM h
      )
      SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fp,
             CAST(list_min(fp) AS BIGINT) AS min_fp,
             CAST(list_max(fp) AS BIGINT) AS max_fp
      FROM w ORDER BY doc_id""",

    // Same unigram model as TextAnalysis.unigramLogprob: per-word
    // ln(corpus-frequency) floored to micro BEFORE summation (exact
    // long sums, order-independent); avg floored over the double ratio.
    // H7 split: same multiplicative-hash rule as mixture sampling,
    // mod-100 buckets -> 90/5/5, summarized per (source, split).
    // H12: A-ES weighted sampling — identical u derivation, identical
    // ln(u)/w floor-micro key, identical (key DESC, doc_id) top-k;
    // floor-after-transcendental per the E8 precedent
    // H14: keyed resume must equal offset semantics (rows 21-40 of
    // the seeded md5 order) — md5 hex is engine-identical
    "pipeline_shuffle_resume" -> Assembly.shuffleResumeOracleSql,

    "pipeline_weighted_sample" -> """
      WITH t AS (
        SELECT doc_id,
               greatest(CAST(len(list_distinct(list_filter(
                 string_split_regex(trim(lower(text)), '\s+'),
                 x -> length(x) > 0))) AS BIGINT), 1) AS weight,
               CAST(((doc_id * 1048573 + 11) % 1000000) + 1 AS DOUBLE) / 1000000.0 AS u
        FROM documents
      ), keyed AS (
        SELECT doc_id, weight,
               CAST(floor(ln(u) / weight * 1000000.0) AS BIGINT) AS key_micro
        FROM t)
      SELECT doc_id, weight, key_micro FROM keyed
      ORDER BY key_micro DESC, doc_id LIMIT 50""",

    // H11: the C6 cluster CTE keyed into H8's split rule — whole
    // near-dup clusters land in one split; n_rehomed counts the docs
    // a doc-level split would have leaked across splits
    "pipeline_cluster_split" -> (clusterCte + """
      , tk AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                    x -> length(x) > 0)) AS BIGINT) AS n_toks
        FROM documents
      ), a AS (
        SELECT cl.doc_id, cl.cluster, tk.n_toks,
          CASE WHEN (cl.cluster * 1048573 + 11) % 100 < 90 THEN 'train'
               WHEN (cl.cluster * 1048573 + 11) % 100 < 95 THEN 'val'
               ELSE 'test' END AS split,
          CASE WHEN (cl.doc_id * 1048573 + 11) % 100 < 90 THEN 'train'
               WHEN (cl.doc_id * 1048573 + 11) % 100 < 95 THEN 'val'
               ELSE 'test' END AS doc_split
        FROM cl JOIN tk ON cl.doc_id = tk.doc_id)
      SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters,
             CAST(sum(n_toks) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN doc_split <> split THEN 1 ELSE 0 END) AS BIGINT) AS n_rehomed
      FROM a GROUP BY split ORDER BY split"""),

    "pipeline_train_val_test" -> """
      WITH a AS (
        SELECT doc_id, source,
               CASE WHEN (doc_id * 1048573 + 11) % 100 < 90 THEN 'train'
                    WHEN (doc_id * 1048573 + 11) % 100 < 95 THEN 'val'
                    ELSE 'test' END AS split,
               CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                    x -> length(x) > 0)) AS BIGINT) AS n_toks
        FROM documents)
      SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS n_tokens,
             min(doc_id) AS min_doc, max(doc_id) AS max_doc
      FROM a GROUP BY source, split ORDER BY source, split""",

    // H6 curriculum staging: E8's per-doc avg log-likelihood (same CTE
    // chain) cut into per-source easy->hard quartiles via ntile — pure
    // integer rank division, no percentile interpolation.
    "pipeline_curriculum" -> """
      WITH w AS (
        SELECT doc_id, unnest(list_filter(
          string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0)) AS word
        FROM documents
      ), c AS (
        SELECT word, count(*) AS cnt FROM w GROUP BY word
      ), t AS (
        SELECT CAST(count(*) AS DOUBLE) AS total FROM w
      ), scored AS (
        SELECT w.doc_id,
               CAST(floor(ln(c.cnt / (SELECT total FROM t)) * 1000000.0) AS BIGINT) AS lp
        FROM w JOIN c USING (word)
      ), perdoc AS (
        SELECT doc_id AS pdoc, count(*) AS n_words, sum(lp) AS sum_lp
        FROM scored GROUP BY doc_id
      ), base AS (
        SELECT d.doc_id, d.source,
               CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
               CAST(floor(CAST(coalesce(p.sum_lp, 0) AS DOUBLE)
                          / greatest(coalesce(p.n_words, 0), 1)) AS BIGINT) AS avg_lp_micro
        FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.pdoc
      )
      SELECT doc_id, source, n_words, avg_lp_micro,
             CAST(ntile(4) OVER (PARTITION BY source
                                 ORDER BY avg_lp_micro DESC, doc_id) AS BIGINT) AS stage
      FROM base
      ORDER BY stage, source, doc_id""",

    "text_unigram_logprob" -> """
      WITH w AS (
        SELECT doc_id, unnest(list_filter(
          string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0)) AS word
        FROM documents
      ), c AS (
        SELECT word, count(*) AS cnt FROM w GROUP BY word
      ), t AS (
        SELECT CAST(count(*) AS DOUBLE) AS total FROM w
      ), scored AS (
        SELECT w.doc_id,
               CAST(floor(ln(c.cnt / (SELECT total FROM t)) * 1000000.0) AS BIGINT) AS lp
        FROM w JOIN c USING (word)
      ), perdoc AS (
        SELECT doc_id AS pdoc, count(*) AS n_words, sum(lp) AS sum_lp
        FROM scored GROUP BY doc_id
      )
      SELECT d.doc_id,
             CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
             CAST(coalesce(p.sum_lp, 0) AS BIGINT) AS sum_lp_micro,
             CAST(floor(CAST(coalesce(p.sum_lp, 0) AS DOUBLE)
                        / greatest(coalesce(p.n_words, 0), 1)) AS BIGINT) AS avg_lp_micro
      FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.pdoc
      ORDER BY d.doc_id""",

    // CCNet perplexity terciles (E20): the E8 per-doc score cut at
    // the k-th smallest values for k=ceil(n/3), ceil(2n/3) — the
    // oracle finds the cutoffs with a cumulative window over DISTINCT
    // score values (tiny here); the engine's coarse-histogram + fine
    // refinement provably lands on the same "min v with cum >= k"
    // values, and tie handling is by value comparison on both sides.
    // Integer ceil arithmetic ((n+2)//3) keeps `div`/`//` agreement.
    // E21 (`text_perplexity_model`) shares this oracle VERBATIM (see
    // below): scoring the training corpus from the persisted model
    // artifact must reproduce the in-corpus buckets exactly — the
    // E15/E13 index-served ≡ scan-time discipline.
    "text_perplexity_buckets" -> PerplexitySql,
    "text_perplexity_model" -> PerplexitySql,

    // BM25 retrieval (E13): same tokenization as E8; the rational
    // tf-normalization runs in HUGEINT (mirroring Spark's
    // DECIMAL(38,0)) and idf is the micro-floored ln of an exact
    // integer ratio. The oracle ranks with ONE window — the engine's
    // two-level top-k provably returns the same rows because the
    // (score desc, doc_id) order is total.
    "text_bm25_retrieval" -> Bm25.oracleSql,

    // Index-served BM25 (E15) must equal the scan-time form exactly —
    // SAME oracle — which proves the incrementally-maintained
    // postings index equals a from-scratch build.
    "text_inverted_bm25" -> Bm25.oracleSql,

    // Hybrid RRF retrieval (D10): BM25's ranked CTE + the hash-embed
    // vector chain over the same VALUES query list, fused by exact
    // integer 1000000 div (60 + rank) — rank fusion needs no score
    // calibration, which is also what keeps it engine-exact.
    "sim_hybrid_rrf" -> Hybrid.oracleSql,

    // Contrastive pair mining (H8): near-dup positives (cos >= 0.9)
    // and hardest-below-0.8 negatives over the E12 hash embeddings,
    // argmaxes tie-broken by candidate id — fully deterministic.
    "pipeline_contrastive_pairs" -> Assembly.contrastiveOracleSql,

    // Weighted PageRank (B61): exact-integer power iteration over the
    // nation trade graph, five unrolled CTEs with per-edge floors.
    "q_nation_pagerank" -> Analytic.pagerankOracleSql,

    // Bigram LM scoring (E16): E8 one Markov order up — bigram counts
    // from list zips, prefix counts re-aggregated from the model
    // table, add-one smoothing over the word-distinct vocabulary.
    "text_bigram_logprob" -> """
      WITH base AS (
        SELECT doc_id, list_filter(
          string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0) AS ws
        FROM documents
      ), bg0 AS (
        SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                 i -> ws[i] || ' ' || ws[i + 1])) AS bg
        FROM base WHERE len(ws) >= 2
      ), pdb AS (
        SELECT doc_id, bg, count(*) AS n FROM bg0 GROUP BY doc_id, bg
      ), model AS (
        SELECT bg, split_part(bg, ' ', 1) AS w1, sum(n) AS cnt_b
        FROM pdb GROUP BY bg
      ), prefix AS (
        SELECT w1, sum(cnt_b) AS cnt_p FROM model GROUP BY w1
      ), vocab AS (
        SELECT count(DISTINCT word) AS v
        FROM (SELECT unnest(ws) AS word FROM base)
      ), wt AS (
        SELECT m.bg,
               CAST(floor(ln((m.cnt_b + 1) / CAST(p.cnt_p + vocab.v AS DOUBLE))
                          * 1000000.0) AS BIGINT) AS lp
        FROM model m JOIN prefix p USING (w1) CROSS JOIN vocab
      ), perdoc AS (
        SELECT doc_id, sum(n) AS n_bigrams, sum(lp * n) AS sum_lp
        FROM pdb JOIN wt USING (bg) GROUP BY doc_id
      )
      SELECT d.doc_id,
             CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             CAST(coalesce(p.sum_lp, 0) AS BIGINT) AS sum_lp_micro,
             CAST(floor(CAST(coalesce(p.sum_lp, 0) AS DOUBLE)
                        / greatest(coalesce(p.n_bigrams, 0), 1)) AS BIGINT) AS avg_lp_micro
      FROM documents d LEFT JOIN perdoc p USING (doc_id)
      ORDER BY d.doc_id""",

    // NB quality classifier (E14): H2's hash rule splits train/test,
    // one conditional word-count pass fits both class models, priors
    // and per-word log-probs micro-floored, log-odds exact BIGINT.
    // E23 (`text_quality_model`) shares this oracle VERBATIM: scoring
    // the held-out half from the persisted weight/prior/label-rule
    // artifact alone must reproduce the in-query result (the
    // artifact-served ≡ scan-time discipline).
    "text_quality_classifier" -> QualityClassifierSql,
    "text_quality_model" -> QualityClassifierSql,

    // DSIR importance weights (E11): same tokenization as E8, one
    // conditional word-count pass for both unigram models, per-word
    // micro-floored log-ratio, top-100 raw docs by (weight, doc_id).
    "text_dsir_weights" -> """
      WITH w AS (
        SELECT doc_id,
               CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END AS is_target,
               unnest(list_filter(
                 string_split_regex(trim(lower(text)), '\s+'), x -> length(x) > 0)) AS word
        FROM documents
      ), pdw AS (
        SELECT doc_id, is_target, word, count(*) AS n FROM w GROUP BY ALL
      ), wc AS (
        SELECT word,
               sum(CASE WHEN is_target = 1 THEN n ELSE 0 END) AS cnt_t,
               sum(CASE WHEN is_target = 0 THEN n ELSE 0 END) AS cnt_r
        FROM pdw GROUP BY word
      ), tot AS (
        SELECT sum(cnt_t) AS tot_t, sum(cnt_r) AS tot_r, count(*) AS v FROM wc
      ), wt AS (
        SELECT word,
               CAST(floor(ln((cnt_t + 1) / CAST(tot_t + v AS DOUBLE)) * 1000000.0) AS BIGINT)
             - CAST(floor(ln((cnt_r + 1) / CAST(tot_r + v AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_micro
        FROM wc CROSS JOIN tot
      ), perdoc AS (
        SELECT doc_id, sum(n) AS n_words, sum(w_micro * n) AS dsir
        FROM pdw JOIN wt USING (word) GROUP BY doc_id
      ), base AS (
        SELECT d.doc_id,
               CAST(CASE WHEN d.source IN ('src0', 'src1') THEN 1 ELSE 0 END AS BIGINT) AS is_target,
               CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
               CAST(coalesce(p.dsir, 0) AS BIGINT) AS dsir_micro
        FROM documents d LEFT JOIN perdoc p USING (doc_id)
      ), sel AS (
        SELECT doc_id FROM base WHERE is_target = 0
        ORDER BY dsir_micro DESC, doc_id LIMIT 100
      )
      SELECT b.doc_id, b.is_target, b.n_words, b.dsir_micro,
             CAST(CASE WHEN s.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS selected
      FROM base b LEFT JOIN sel s USING (doc_id)
      ORDER BY b.doc_id""",

    // Same TF-IDF pipeline as TextAnalysis.tfidfTopTerms: smoothed
    // idf, floor-micro score, top-3 per doc by (score desc, term).
    "text_tfidf_top_terms" -> """
      WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        FROM documents
      ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
      ), dfreq AS (
        SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks)
        GROUP BY term
      ), n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.term,
               CAST(floor(tf.tf * ln((n.n_docs + 1) * 1.0 / (dfreq.df + 1)) * 1000000.0) AS BIGINT)
                 AS tfidf_micro
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
      ), ranked AS (
        SELECT doc_id, term, tfidf_micro,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf_micro DESC, term) AS rank
        FROM scored)
      SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tfidf_micro
      FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""",

    "mm_feature_extract" -> """
      WITH m AS (
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS nb
        FROM documents),
      b AS (
        SELECT doc_id, kind, nb,
               list_transform(range(1, nb + 1),
                 i -> (strpos('0123456789ABCDEF', hx[2*i-1]) - 1) * 16
                    + (strpos('0123456789ABCDEF', hx[2*i]) - 1)) AS bytes
        FROM m)
      SELECT doc_id, kind, CAST(nb AS BIGINT) AS n_bytes,
             CAST(CASE WHEN nb = 0 THEN 0
                  ELSE floor(CAST(list_sum(bytes) AS DOUBLE) / nb * 1e6) END AS BIGINT) AS byte_mean_micro,
             CAST(len(list_filter(bytes, x -> x // 32 = 0)) AS BIGINT) AS h0,
             CAST(len(list_filter(bytes, x -> x // 32 = 1)) AS BIGINT) AS h1,
             CAST(len(list_filter(bytes, x -> x // 32 = 2)) AS BIGINT) AS h2,
             CAST(len(list_filter(bytes, x -> x // 32 = 3)) AS BIGINT) AS h3,
             CAST(len(list_filter(bytes, x -> x // 32 = 4)) AS BIGINT) AS h4,
             CAST(len(list_filter(bytes, x -> x // 32 = 5)) AS BIGINT) AS h5,
             CAST(len(list_filter(bytes, x -> x // 32 = 6)) AS BIGINT) AS h6,
             CAST(len(list_filter(bytes, x -> x // 32 = 7)) AS BIGINT) AS h7
      FROM b ORDER BY doc_id""",

    // Same every-4th-byte downsample as Multimodal.resize; byte values
    // recomputed from the BLOB hex, mean floored at micro.
    "mm_resize" -> """
      WITH m AS (
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS nb
        FROM documents),
      r AS (
        SELECT doc_id, kind, nb, hx, range(1, nb + 1, 4) AS pos,
               list_transform(range(1, nb + 1, 4),
                 p -> (strpos('0123456789ABCDEF', hx[2*p-1]) - 1) * 16
                    + (strpos('0123456789ABCDEF', hx[2*p]) - 1)) AS rb
        FROM m WHERE nb > 0)
      SELECT doc_id, kind, CAST(nb AS BIGINT) AS n_bytes,
             CAST(len(rb) AS BIGINT) AS n_resized,
             list_aggregate(list_transform(pos[1:24],
               p -> hx[2*p-1] || hx[2*p]), 'string_agg', '') AS resized_hex24,
             CAST(floor(CAST(list_sum(rb) AS DOUBLE) * 1000000.0 / len(rb)) AS BIGINT)
               AS resized_mean_micro
      FROM r ORDER BY doc_id""",

    "mm_frame_sample" -> """
      WITH v AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS nb
        FROM documents WHERE CAST(doc_id % 3 AS INT) = 2),
      f AS (
        SELECT doc_id, CAST(unnest(range(nb % 5 + 1)) AS INT) AS frame_idx, hx, nb
        FROM v)
      SELECT doc_id, frame_idx,
             substring(hx, frame_idx * 32 + 1, 32) AS frame_hex,
             CAST(nb AS BIGINT) AS n_bytes,
             CAST(length(substring(hx, frame_idx * 32 + 1, 32)) // 2 AS BIGINT) AS frame_len
      FROM f ORDER BY doc_id, frame_idx""",

    "mm_binary_meta" -> """
      WITH m AS (
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               octet_length(encode(text)) AS n_bytes
        FROM documents)
      SELECT kind, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes
      FROM m GROUP BY kind ORDER BY kind""",

    "stream_windowed_counts" -> """
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
             count(*) AS n,
             round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
      FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",

    // the tail's RESUMED run emits exactly epoch 2's appended keys
    "stream_table_tail" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey >= 500 AND o_orderkey < 1000
      ORDER BY o_orderkey""",

    // G6: first event per (user, type, hour) — the ingestion dedup's
    // batch twin; the streaming form (dropDuplicatesWithinWatermark)
    // is spec-exercised with injected duplicates.
    "stream_dedup_first" -> """
      WITH t AS (
        SELECT user_id, event_type, date_trunc('hour', ts) AS hr, event_id,
               row_number() OVER (PARTITION BY user_id, event_type, date_trunc('hour', ts)
                                  ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id, event_type, date_trunc('hour', ts)) AS n_in_group
        FROM events)
      SELECT user_id, event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour,
             event_id AS kept_event_id, CAST(n_in_group AS BIGINT) AS n_in_group
      FROM t WHERE rn = 1
      ORDER BY user_id, event_type, hour""",

    "stream_sessionize" -> """
      WITH t AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events)
      SELECT user_id,
             CAST(sum(CASE WHEN prev_ts IS NULL
                           OR ts > prev_ts + INTERVAL 1800 SECOND
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
             count(*) AS n_events
      FROM t GROUP BY user_id ORDER BY user_id""",

    // Gaps-and-islands twin of Spark's session_window: a gap of
    // EXACTLY GapSeconds starts a new session ([ts, ts+gap) intervals
    // are end-exclusive), hence `>=` here vs `>` in stream_sessionize;
    // session end = last event + gap.
    "stream_session_window" -> """
      WITH t AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events),
      s AS (
        SELECT user_id, ts,
               sum(CASE WHEN prev_ts IS NULL
                        OR ts >= prev_ts + INTERVAL 1800 SECOND
                   THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
        FROM t)
      SELECT user_id,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             strftime(max(ts) + INTERVAL 1800 SECOND, '%Y-%m-%d %H:%M:%S') AS session_end,
             count(*) AS n_events
      FROM s GROUP BY user_id, sid
      ORDER BY user_id, session_start""",

    // Batch twin of the G5 watermarked stream-stream join: purchases
    // matched to same-user clicks within the preceding hour.
    "stream_click_purchase_join" -> """
      SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id AS user_id,
             strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_time,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time
      FROM events c JOIN events p
        ON c.event_type = 'click' AND p.event_type = 'purchase'
       AND c.user_id = p.user_id
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
      ORDER BY click_id, purchase_id""",

    // G5 outer: the range condition must live in the ON clause — a
    // WHERE would drop null-padded rows and fold this to the inner form
    "stream_click_purchase_outer" -> """
      SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id AS user_id,
             strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_time,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
      ORDER BY click_id, purchase_id""",

    // B60: integer-ratio window doubles are bit-identical across
    // engines — compared unrounded
    "q_percent_rank_balance" -> """
      SELECT c_custkey, CAST(c_nationkey AS INT) AS nation_key, c_acctbal,
             percent_rank() OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal, c_custkey) AS pct_rank,
             cume_dist() OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal, c_custkey) AS cume,
             CAST(ntile(4) OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal, c_custkey) AS INT) AS quartile
      FROM customer ORDER BY c_custkey""",
  )
}
