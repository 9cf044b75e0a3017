package graft

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central registry: query key → implementation (SURVEY §2 contract). */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map[String, Q](
    "scan_filter_project"   -> (Relational.scanFilterProject _),
    "source_events_ns"      -> (Relational.sourceEventsNs _),
    "source_json_props"     -> (Relational.sourceJsonProps _),
    "filter_complex_pred"   -> (Relational.filterComplexPred _),
    "filter_null_semantics" -> (Relational.filterNullSemantics _),
    "sink_partitioned_stats" -> (Relational.sinkPartitionedStats _),
    "join_dpp_partitioned"  -> (Relational.joinDppPartitioned _),
    "source_json_roundtrip" -> (Relational.sourceJsonRoundtrip _),
    "source_csv_roundtrip"  -> (Relational.sourceCsvRoundtrip _),
    "source_orc_roundtrip"  -> (Relational.sourceOrcRoundtrip _),
    "join_bucketed_colocated" -> (Relational.joinBucketedColocated _),
    "join_bloom_pruned"     -> (Relational.joinBloomPruned _),
    "layout_zorder_stats"   -> (Relational.layoutZorderStats _),
    // joins
    "join_inner_equi"       -> (Relational.joinInnerEqui _),
    "join_broadcast_dim"    -> (Relational.joinBroadcastDim _),
    "join_multiway_star"    -> (Relational.joinMultiwayStar _),
    "join_left_outer"       -> (Relational.joinLeftOuter _),
    "join_full_outer"       -> (Relational.joinFullOuter _),
    "join_semi"             -> (Relational.joinSemi _),
    "join_anti"             -> (Relational.joinAnti _),
    "join_cross"            -> (Relational.joinCross _),
    "join_range_binned"     -> (Relational.joinRangeBinned _),
    // sort / limit / top-k
    "sort_multi_nulls"      -> (Relational.sortMultiNulls _),
    "limit_topk"            -> (Relational.limitTopk _),
    "topk_per_group"        -> (Relational.topkPerGroup _),
    "topk_per_group_agg"    -> (Relational.topkPerGroupAgg _),
    "topk_per_group_ties"   -> (Relational.topkPerGroupTies _),
    "cte_recursive"         -> (Relational.cteRecursive _),
    "subquery_not_exists"   -> (Relational.subqueryNotExists _),
    "agg_group_by_all"      -> (Relational.aggGroupByAll _),
    "sample_hash_bucket"    -> (Relational.sampleHashBucket _),
    "sample_stratified_quota" -> (Relational.sampleStratifiedQuota _),
    "sample_weighted_mix"   -> (Relational.sampleWeightedMix _),
    // aggregations
    "agg_pricing_summary"   -> (Aggregates.aggPricingSummary _),
    "agg_count_distinct"    -> (Aggregates.aggCountDistinct _),
    "agg_multi_distinct"    -> (Aggregates.aggMultiDistinct _),
    "agg_rollup"            -> (Aggregates.aggRollup _),
    "agg_cube"              -> (Aggregates.aggCube _),
    "agg_grouping_sets"     -> (Aggregates.aggGroupingSets _),
    "agg_stats"             -> (Aggregates.aggStats _),
    "agg_regression"        -> (Aggregates.aggRegression _),
    "agg_collect_sorted"    -> (Aggregates.aggCollectSorted _),
    "agg_percentiles"       -> (Aggregates.aggPercentiles _),
    "agg_percentile_approx" -> (Aggregates.aggPercentileApprox _),
    "agg_tdigest"           -> (Aggregates.aggTdigest _),
    "agg_approx_hll"        -> (Aggregates.aggApproxHll _),
    "pivot_event_type"      -> (Aggregates.pivotEventType _),
    "agg_histogram"         -> (Aggregates.aggHistogram _),
    "agg_histogram_equidepth" -> (Aggregates.aggHistogramEquidepth _),
    "agg_string_concat"     -> (Aggregates.aggStringConcat _),
    "agg_min_max_by"        -> (Aggregates.aggMinMaxBy _),
    "agg_mode_deterministic" -> (Aggregates.aggModeDeterministic _),
    "dq_profile_table"      -> (DataQuality.dqProfileTable _),
    "scd2_change_intervals" -> (Streaming.scd2ChangeIntervals _),
    "text_ngram_topk"       -> (TextAnalysis.ngramTopk _),
    "stream_join_view_purchase" -> (Streaming.streamJoinViewPurchase _),
    "win_cumulative_distinct" -> (Streaming.winCumulativeDistinct _),
    "dq_rule_violations"    -> (DataQuality.dqRuleViolations _),
    "dq_profile_approx"     -> (DataQuality.dqProfileApprox _),
    "agg_grouping_id"       -> (Aggregates.aggGroupingId _),
    "agg_hll_sketch_union"  -> (Aggregates.aggHllSketchUnion _),
    "agg_robust_stats"      -> (Aggregates.aggRobustStats _),
    "agg_incremental_merge" -> (Aggregates.aggIncrementalMerge _),
    "win_period_over_period" -> (Aggregates.winPeriodOverPeriod _),
    "ts_gapfill_hourly"     -> (Aggregates.gapfillHourly _),
    // windows
    "win_rank_topn"         -> (Windows.winRankTopn _),
    "win_running_total"     -> (Windows.winRunningTotal _),
    "win_lead_lag"          -> (Windows.winLeadLag _),
    "win_range_frame"       -> (Windows.winRangeFrame _),
    "win_ntile_pct"         -> (Windows.winNtilePct _),
    "win_ntile_scalable"    -> (Windows.winNtileScalable _),
    "win_streak_islands"    -> (Windows.winStreakIslands _),
    "win_ratio_to_report"   -> (Windows.winRatioToReport _),
    "win_rolling_7d"        -> (Windows.winRolling7d _),
    "set_union_by_name"     -> (Relational.setUnionByName _),
    "win_first_last"        -> (Windows.winFirstLast _),
    "win_nth_value"         -> (Windows.winNthValue _),
    // set operations
    "set_union_all_distinct" -> (Relational.setUnionAllDistinct _),
    "set_intersect"         -> (Relational.setIntersect _),
    "set_except_all"        -> (Relational.setExceptAll _),
    "unpivot_measures"      -> (Relational.unpivotMeasures _),
    "explode_outer_tokens"  -> (Relational.explodeOuterTokens _),
    "fn_map_suite"          -> (Relational.fnMapSuite _),
    // subqueries / CTE
    "subquery_scalar_uncorr" -> (Relational.subqueryScalarUncorr _),
    "subquery_in"           -> (Relational.subqueryIn _),
    "join_lateral_topn"     -> (Relational.joinLateralTopn _),
    "agg_filter_clause"     -> (Relational.aggFilterClause _),
    "agg_bool"              -> (Relational.aggBool _),
    "fn_try_cast"           -> (Relational.fnTryCast _),
    "subquery_correlated"   -> (Relational.subqueryCorrelated _),
    "cte_reuse"             -> (Relational.cteReuse _),
    "param_sweep_argmin"    -> (Relational.paramSweepArgmin _),
    // scalar function suites
    "fn_string_suite"       -> (Scalars.fnStringSuite _),
    "fn_string_suite2"      -> (Scalars.fnStringSuite2 _),
    "fn_date_suite"         -> (Scalars.fnDateSuite _),
    "fn_date_extra"         -> (Scalars.fnDateExtra _),
    "arr_transform_suite"   -> (Scalars.arrTransformSuite _),
    "fn_math_suite"         -> (Scalars.fnMathSuite _),
    "fn_conditional"        -> (Scalars.fnConditional _),
    "fn_cast_decimal"       -> (Scalars.fnCastDecimal _),
    "fn_hash_md5"           -> (Scalars.fnHashMd5 _),
    "fn_bitwise_suite"      -> (Scalars.fnBitwiseSuite _),
    "fn_regexp_suite"       -> (Scalars.fnRegexpSuite _),
    "fn_json_suite"         -> (Scalars.fnJsonSuite _),
    // UDF / UDAF
    "udf_score"             -> (Scalars.udfScore _),
    "expr_score_native"     -> (Scalars.exprScoreNative _),
    "udaf_weighted_avg"     -> (Scalars.udafWeightedAvg _),
    // array / vector
    "arr_scalar_suite"      -> (VectorText.arrScalarSuite _),
    "arr_set_ops"           -> (VectorText.arrSetOps _),
    "vec_cosine_pairs"      -> (VectorText.vecCosinePairs _),
    "vec_cosine_pairs_native" -> (VectorText.vecCosinePairsNative _),
    "vec_error_metrics"     -> (VectorText.vecErrorMetrics _),
    "vec_quantize_int8"     -> (VectorText.vecQuantizeInt8 _),
    "vec_knn_topk"          -> (VectorText.vecKnnTopk _),
    "vec_centroid_by_label" -> (VectorText.vecCentroidByLabel _),
    // text
    "text_token_explode"    -> (VectorText.textTokenExplode _),
    "text_wordcount"        -> (VectorText.textWordcount _),
    "text_jaccard_pairs"    -> (VectorText.textJaccardPairs _),
    "text_exact_dedup"      -> (VectorText.textExactDedup _),
    "text_tfidf_top"        -> (VectorText.textTfidfTop _),
    "text_lang_stats"       -> (VectorText.textLangStats _),
    // dedup family
    "dedup_minhash_sig"     -> (Dedup.minhashSig _),
    "dedup_minhash_sig_agg" -> (Dedup.minhashSigAgg _),
    "join_skew_salted"      -> (Relational.joinSkewSalted _),
    "dedup_minhash_pairs"   -> (Dedup.minhashPairs _),
    "dedup_connected_components" -> (Dedup.connectedComponents _),
    "dedup_connected_components_v2" -> (Dedup.connectedComponentsStar _),
    "dedup_simhash"         -> (Dedup.simhash _),
    "dedup_cluster_canonical" -> (Dedup.clusterCanonical _),
    "text_decontaminate_overlap" -> (Dedup.decontaminateOverlap _),
    "dedup_exact_keep_first" -> (Dedup.exactKeepFirst _),
    "dedup_embedding_topk"  -> (Dedup.embeddingTopk _),
    // similarity search
    "ann_lsh_bucket"        -> (Similarity.annLshBucket _),
    "ann_ivf_topk"          -> (Similarity.annIvfTopk _),
    // text analysis
    "text_lang_id"          -> (TextAnalysis.langId _),
    "text_normalize"        -> (TextAnalysis.normalize _),
    "pipeline_corpus_curation" -> (TextAnalysis.corpusCuration _),
    "pipeline_incremental_merge" -> (TextAnalysis.incrementalMerge _),
    "pipeline_training_emit" -> (TextAnalysis.trainingEmit _),
    "text_quality_score"    -> (TextAnalysis.qualityScore _),
    "text_token_count"      -> (TextAnalysis.tokenCount _),
    "text_fingerprint"      -> (TextAnalysis.fingerprint _),
    "text_pii_redact"       -> (TextAnalysis.piiRedact _),
    "text_chunk_split"      -> (TextAnalysis.chunkSplit _),
    "text_levenshtein_pairs" -> (TextAnalysis.levenshteinPairs _),
    "text_shingle_generate" -> (TextAnalysis.shingleGenerate _),
    // multimodal
    "mm_binary_stats"       -> (Multimodal.binaryStats _),
    "mm_decode_features"    -> (Multimodal.decodeFeatures _),
    "mm_frame_sample"       -> (Multimodal.frameSample _),
    // streaming / time-series (batch semantics; stream twins in tests)
    "stream_tumbling_1h"    -> (Streaming.streamTumbling1h _),
    "stream_sliding_1h_15m" -> (Streaming.streamSliding1h15m _),
    "stream_session_30m"    -> (Streaming.streamSession30m _),
    "stream_dau_retention"  -> (Streaming.streamDauRetention _),
    "stream_funnel"         -> (Streaming.streamFunnel _),
    "stream_watermark_late" -> (Streaming.streamWatermarkLate _),
    "stream_dedup_keep_first" -> (Streaming.streamDedupKeepFirst _),
    "stream_stateful_count" -> (Streaming.streamStatefulCount _),
    "stream_stateful_count_v2" -> (Streaming.streamStatefulCountV2 _),
    "stream_session_custom" -> (Streaming.streamSessionCustom _),
    // event joins
    "join_range_funnel"     -> (Streaming.joinRangeFunnel _),
    "join_asof"             -> (Streaming.joinAsof _),
    "join_asof_forward"     -> (Streaming.joinAsofForward _),
    "join_asof_exec"        -> (Streaming.joinAsofExec _),
    // round-4 additions (SURVEY §2 rows L15, F12, E20, E21, N3, C12,
    // M36-M39)
    "ts_interval_union"     -> (Windows.tsIntervalUnion _),
    "win_pattern_match"     -> (Windows.winPatternMatch _),
    "agg_decay_halflife"    -> (Aggregates.aggDecayHalflife _),
    "agg_bitmap_distinct"   -> (Aggregates.aggBitmapDistinct _),
    "dq_anomaly_mad"        -> (DataQuality.dqAnomalyMad _),
    "join_interval_overlap" -> (Relational.joinIntervalOverlap _),
    "text_sparse_cosine_topk" -> (VectorText.sparseCosineTopk _),
    "ann_recall_at_k"       -> (Similarity.annRecallAtK _),
    "pipeline_split_train_eval" -> (TextAnalysis.splitTrainEval _),
    "text_zipf_slope"       -> (TextAnalysis.textZipfSlope _),
    // round-4 batch 2 (SURVEY §2 rows N4, L16, E22, E23, F13, C9n, C13,
    // M40, M41, J14)
    "dq_referential_integrity" -> (DataQuality.dqReferentialIntegrity _),
    "ts_downsample_ohlc"    -> (Aggregates.tsDownsampleOhlc _),
    "agg_weighted_median"   -> (Aggregates.aggWeightedMedian _),
    "agg_skew_kurtosis"     -> (Aggregates.aggSkewKurtosis _),
    "win_rolling_median"    -> (Windows.winRollingMedian _),
    "join_asof_nearest"     -> (Streaming.joinAsofNearest _),
    "join_scd2_point_in_time" -> (Streaming.joinScd2PointInTime _),
    "text_repetition_stats" -> (TextAnalysis.repetitionStats _),
    "dedup_ngram_corpus_frac" -> (Dedup.ngramCorpusFrac _),
    "arr_struct_sort"       -> (VectorText.arrStructSort _),
    // round-4 batch 3 (SURVEY §2 rows M42, L17, M43, C14, J15, I12, F14)
    "graph_triangle_knn"    -> (Similarity.graphTriangleKnn _),
    "ts_autocorr_hourly"    -> (Aggregates.tsAutocorrHourly _),
    "text_source_entropy"   -> (TextAnalysis.sourceEntropy _),
    "join_null_safe"        -> (Relational.joinNullSafe _),
    "vec_norm_stats"        -> (VectorText.vecNormStats _),
    "fn_url_suite"          -> (TextAnalysis.fnUrlSuite _),
    "win_cume_dist_pct"     -> (Windows.winCumeDistPct _),
    "dedup_semantic_clusters" -> (Dedup.semanticClusters _),
    // composite workload queries (SURVEY §2.W)
    "wk_q3_shipping_priority" -> (Workload.q3ShippingPriority _),
    "wk_q5_region_volume"   -> (Workload.q5RegionVolume _),
    "wk_q10_returns"        -> (Workload.q10Returns _),
    "pipeline_dataset_card" -> (Workload.datasetCard _),
    // round-4 batch 5 (SURVEY §2 rows E24, E25, M46, J16)
    "pivot_multi_agg"       -> (Aggregates.pivotMultiAgg _),
    "agg_corr_pairs"        -> (Aggregates.aggCorrPairs _),
    "text_keywords_per_doc" -> (TextAnalysis.keywordsPerDoc _),
    "arr_flatten_nested"    -> (VectorText.arrFlattenNested _),
    "pipeline_quality_funnel" -> (TextAnalysis.qualityFunnel _),
    "ts_hourofday_profile"  -> (Aggregates.tsHourOfDayProfile _),
    "agg_gini_revenue"      -> (Aggregates.aggGiniRevenue _),
    "mm_chunk_dedup"        -> (Multimodal.chunkDedup _),
    "join_asof_tolerance"   -> (Streaming.joinAsofTolerance _),
    "dq_distribution_drift" -> (DataQuality.dqDistributionDrift _),
    "source_parquet_schema_merge" -> (Relational.sourceParquetSchemaMerge _),
    "source_file_metadata" -> (Relational.sourceFileMetadata _),
    // round-5 batch 1: workload family completion (SURVEY §2.W)
    "wk_q4_order_priority"  -> (Workload.q4OrderPriority _),
    "wk_q7_region_trade"    -> (Workload.q7RegionTrade _),
    "wk_q8_market_share"    -> (Workload.q8MarketShare _),
    "wk_q14_promo_share"    -> (Workload.q14PromoShare _),
    "wk_q18_large_orders"   -> (Workload.q18LargeOrders _),
    "wk_q22_lapsed_customers" -> (Workload.q22LapsedCustomers _),
    // round-5 batch 2: pipeline/graph/time-series (SURVEY §2 rows M49-M52, L19)
    "pipeline_pack_sequences" -> (TextAnalysis.packSequences _),
    "pipeline_token_budget_mix" -> (TextAnalysis.tokenBudgetMix _),
    "dedup_shingle_containment" -> (Dedup.shingleContainment _),
    "graph_pagerank_knn"    -> (Similarity.pageRankKnn _),
    "ts_resample_interp_5m" -> (Aggregates.tsResampleInterp5m _),
    // round-5 batch 3: workload family tail + text source + decomposition
    "wk_q6_discount_revenue" -> (Workload.q6DiscountRevenue _),
    "wk_q13_order_count_dist" -> (Workload.q13OrderCountDist _),
    "wk_q15_top_supplier"   -> (Workload.q15TopSupplier _),
    "wk_q17_small_qty_revenue" -> (Workload.q17SmallQtyRevenue _),
    "wk_q19_brand_discounts" -> (Workload.q19BrandDiscounts _),
    "wk_q21_late_supplier"  -> (Workload.q21LateSupplier _),
    "source_text_roundtrip" -> (Relational.sourceTextRoundtrip _),
    "ts_seasonal_decompose" -> (Aggregates.tsSeasonalDecompose _),
    "wk_q12_lag_priority"   -> (Workload.q12LagPriority _),
    "pipeline_curriculum_phases" -> (TextAnalysis.curriculumPhases _),
    "vec_pca_power_iter"    -> (VectorText.vecPcaPowerIter _),
    "source_binaryfile_ingest" -> (Relational.sourceBinaryfileIngest _),
    "source_xml_roundtrip"  -> (Relational.sourceXmlRoundtrip _),
    "fn_variant_suite"      -> (Scalars.fnVariantSuite _),
    "fn_json_suite2"        -> (Scalars.fnJsonSuite2 _),
    "fn_collation_suite"    -> (Scalars.fnCollationSuite _),
    "sql_session_variables" -> (Relational.sqlSessionVariables _),
    "sql_pipe_syntax"       -> (Relational.sqlPipeSyntax _),
    "sql_execute_immediate" -> (Relational.sqlExecuteImmediate _),
    "vec_kmeans_lloyd"      -> (Similarity.vecKmeansLloyd _),
    "graph_knn_jaccard"     -> (Similarity.graphKnnJaccard _),
    "ts_changepoint_cusum"  -> (Aggregates.tsChangepointCusum _),
    "dq_benford_first_digit" -> (DataQuality.dqBenfordFirstDigit _),
    "pipeline_observe_metrics" -> (DataQuality.observeMetrics _),
    "pipeline_dataset_diff"  -> (TextAnalysis.datasetDiff _),
    "graph_degree_assortativity" -> (Similarity.graphDegreeAssortativity _),
    // round-6 batch: CDC, EWMA, Matryoshka eval, BM25, banded pHash, bloom dedup
    "stream_cdc_apply"      -> (Streaming.cdcApply _),
    "win_ewma"              -> (Windows.winEwma _),
    "vec_matryoshka_eval"   -> (Similarity.vecMatryoshkaEval _),
    "text_bm25_topk"        -> (TextAnalysis.bm25Topk _),
    "mm_phash_hamming"      -> (Multimodal.phashHamming _),
    "dedup_bloom_prefilter" -> (Dedup.bloomPrefilter _),
    "vec_ivf_stats"         -> (Similarity.vecIvfStats _),
    "text_decontaminate_13gram" -> (Dedup.decontaminate13gram _),
    "text_perplexity_proxy" -> (TextAnalysis.perplexityProxy _),
    "win_drawdown"          -> (Windows.winDrawdown _),
    "dedup_lsh_recall_eval" -> (Dedup.lshRecallEval _),
    "win_retention_cohort"  -> (Streaming.retentionCohort _),
    "pipeline_packing_efficiency" -> (TextAnalysis.packingEfficiency _),
    "dq_ks_test"            -> (DataQuality.dqKsTest _),
    // round-7 batch: the partsupp-dependent workload family over the
    // derived partsupp relation (SURVEY §2.W rows W17-W21)
    "wk_q2_min_cost_supplier" -> (Workload.q2MinCostSupplier _),
    "wk_q9_product_profit"  -> (Workload.q9ProductProfit _),
    "wk_q11_important_stock" -> (Workload.q11ImportantStock _),
    "wk_q16_supplier_cnt"   -> (Workload.q16SupplierCnt _),
    "wk_q20_excess_stock"   -> (Workload.q20ExcessStock _),
    // round-7 batch 2: hard-negative mining, n-gram novelty, weighted
    // sampling, permissive CSV ingest (SURVEY §2 rows M67-M69, A17)
    "vec_hard_negatives"    -> (Similarity.vecHardNegatives _),
    "text_novelty_frac"     -> (TextAnalysis.textNoveltyFrac _),
    "pipeline_quality_weighted_sample" -> (TextAnalysis.qualityWeightedSample _),
    "source_csv_permissive" -> (Relational.sourceCsvPermissive _),
    // round-7 batch 3: rolling anomaly z-score, reproducible epoch
    // shuffle, LSH banding-config sweep (SURVEY §2 rows N7, M70, M71)
    "dq_rolling_zscore"     -> (DataQuality.dqRollingZscore _),
    "pipeline_epoch_shuffle" -> (TextAnalysis.epochShuffle _),
    "dedup_band_tuning_sweep" -> (Dedup.bandTuningSweep _),
    "dedup_bloom_partitioned" -> (Dedup.bloomPartitioned _),
    // round-7 batch 4: PQ/ADC vector search + audit, label propagation,
    // compaction planning, magic-byte sniffing, URL dedup, profile drift
    // (SURVEY §2 rows J21, J22, M77, M79, A18, M78, N9)
    "vec_pq_adc_topk"       -> (Similarity.vecPqAdcTopk _),
    "vec_pq_error"          -> (Similarity.vecPqError _),
    "graph_label_propagation" -> (Similarity.graphLabelPropagation _),
    "pipeline_compaction_plan" -> (Relational.compactionPlan _),
    "layout_zone_map_prune" -> (Relational.layoutZoneMapPrune _),
    "mm_magic_sniff"        -> (Multimodal.magicSniff _),
    "dedup_url_canonical"   -> (Dedup.urlCanonical _),
    "dq_profile_drift"      -> (DataQuality.dqProfileDrift _),
    // round-7 batch 5: full IVF-PQ serving, two-stage re-rank, container
    // parsing, freshness SLA, token-balanced sharding, label modularity
    // (SURVEY §2 rows J23, J24, A19, N10, M80, M81)
    "ann_ivf_pq_topk"       -> (Similarity.annIvfPqTopk _),
    "vec_pq_rerank"         -> (Similarity.vecPqRerank _),
    "mm_chunk_table"        -> (Multimodal.chunkTable _),
    "dq_freshness_lag"      -> (DataQuality.dqFreshnessLag _),
    "pipeline_shard_manifest" -> (TextAnalysis.shardManifest _),
    "graph_modularity_labels" -> (Similarity.graphModularityLabels _),
    // round-7 batch 6: PQ-code dedup blocking, segment-level dedup,
    // Tukey-fence volume screen (SURVEY §2 rows M82, M83, N11)
    "dedup_pq_codes"        -> (Dedup.pqCodes _),
    "dedup_exact_substring" -> (Dedup.exactSubstring _),
    "text_paragraph_dedup"  -> (Dedup.paragraphDedup _),
    "dq_outlier_tukey"      -> (DataQuality.dqOutlierTukey _),
    // round-7 batch 7: SQL-defined functions and binary quantization
    // (SURVEY §2 rows D10, D11, J25)
    "sql_udf_scalar"        -> (Relational.sqlUdfScalar _),
    "sql_udf_table"         -> (Relational.sqlUdfTable _),
    "vec_binary_hamming_topk" -> (VectorText.vecBinaryHammingTopk _),
    // round-7 batch 8: BPE merge stats, PK uniqueness, seasonal ANOVA
    // (SURVEY §2 rows M84, N12, L24)
    "text_bpe_pair_stats"   -> (TextAnalysis.bpePairStats _),
    "dq_pk_uniqueness"      -> (DataQuality.dqPkUniqueness _),
    "ts_seasonal_anova"     -> (Aggregates.tsSeasonalAnova _),
    // round-7 batch 9: forecast baselines, media near-dup clusters,
    // vocabulary richness (SURVEY §2 rows L25, M85, M86)
    "ts_forecast_baseline_mae" -> (Aggregates.tsForecastBaselineMae _),
    "mm_phash_clusters"     -> (Multimodal.phashClusters _),
    "text_vocab_chao1"      -> (TextAnalysis.vocabChao1 _),
    // round-7 batch 10: Gopher gate battery, LOO target encoding,
    // hashing-trick features (SURVEY §2 rows M87, M89, M90)
    "text_gopher_gates"     -> (TextAnalysis.gopherGates _),
    "ml_target_encode_loo"  -> (MlFeatures.targetEncodeLoo _),
    "ml_feature_hash"       -> (MlFeatures.featureHash _),
    // round-7 batch 11: A/B t-test, scaler fit, license compliance
    // (SURVEY §2 rows N13, J26, M92)
    "dq_ab_ttest"           -> (DataQuality.dqAbTtest _),
    "ml_feature_scaler_fit" -> (MlFeatures.featureScalerFit _),
    "pipeline_license_filter" -> (TextAnalysis.licenseFilter _),
    // round-7 batch 12: anomaly persistence, dataset versioning
    // (SURVEY §2 rows N14, M93)
    "dq_incident_islands"   -> (DataQuality.dqIncidentIslands _),
    "pipeline_version_hash" -> (TextAnalysis.versionHash _),
    // round-8: hybrid retrieval fusion, full-permutation stripe audit
    // (SURVEY §2 rows J27, M95)
    "search_hybrid_rrf"     -> (Similarity.searchHybridRrf _),
    "pipeline_shuffle_stripe" -> (TextAnalysis.shuffleStripe _),
    // round-9: the standing vector-search index build (SURVEY §2 row J28)
    // — owns the IVF/PQ/kNN build cost the serving queries now read
    "index_build_vecsearch" -> (IndexStore.indexBuildVecsearch _),
    // round-9: exact heavy hitters via the mergeable Misra–Gries sketch,
    // global and per-group (SURVEY §2 rows E27, E28)
    "agg_heavy_hitters"         -> (Aggregates.aggHeavyHitters _),
    "agg_heavy_hitters_grouped" -> (Aggregates.aggHeavyHittersGrouped _),
    // round-9: the standing media near-dup index (SURVEY §2 row M96) —
    // owns the block-SimHash signature + band-join cost the phash
    // serving queries now read
    "index_build_mediasig"      -> (IndexStore.indexBuildMediasig _),
    // round-9: fixed-size eval holdout via global bottom-k on a content
    // hash (SURVEY §2 row M97)
    "pipeline_eval_holdout"     -> (TextAnalysis.evalHoldout _),
    // round-9: bounded k-core peel on the stored kNN graph (SURVEY §2
    // row M98)
    "graph_kcore_peel"          -> (Similarity.graphKcorePeel _),
    // round-9: graph-traversal ANN serving — 2-hop expansion + exact
    // re-rank over the stored kNN graph (SURVEY §2 row J29)
    "ann_graph_expand_topk"     -> (Similarity.annGraphExpandTopk _),
    // round-11: k-core to FIXPOINT on the full-corpus kNN graph — the
    // first whole-corpus graph analytic, consuming the standing
    // knn_candidates_full artifact (SURVEY §2 row M99)
    "graph_kcore_full"          -> (Similarity.graphKcoreFull _),
    // round-11: INCREMENTAL media-index maintenance — re-sign only the
    // delta slice, band-join delta×merged, reuse base pairs verbatim;
    // merged store row-identical to a full rebuild (SURVEY §2 row M100)
    "index_update_mediasig"     -> (IndexStore.indexUpdateMediasig _),
    // round-11: the full-corpus graph/serving family over the standing
    // knn_candidates_full artifact (SURVEY §2 rows M101–M103): star
    // components, PageRank without the 500-vector bound, and the kNN
    // self-join (every vector's top-3 with sims)
    "graph_cc_full"             -> (Similarity.graphCcFull _),
    "graph_pagerank_full"       -> (Similarity.pageRankFull _),
    "vec_knn_join_full"         -> (Similarity.vecKnnJoinFull _),
    // round-11: recall@8 of the full-corpus candidate scheme vs exact
    // ground truth — the new artifact ships with its measured recall
    // (SURVEY §2 row M104)
    "ann_recall_full"           -> (Similarity.annRecallFull _),
    // round-12: INCREMENTAL vector-index maintenance — reuse the base
    // snapshot's quantizer/codebook/bucket boundaries, assign + encode
    // only the delta slice, compute only the delta band of the kNN
    // shortlist; merged store row-identical to a from-scratch build under
    // the frozen routing (SURVEY §2 row M105)
    "index_update_vecsearch"    -> (IndexStore.indexUpdateVecsearch _),
    // round-12: two more bounded graph analytics migrated to the
    // full-corpus artifact (SURVEY §2 rows M106, M107) — semi-supervised
    // label propagation and Jaccard link prediction with the 500-vector
    // bound removed; the bounded twins stay as explicit oracle twins
    "graph_labelprop_full"      -> (Similarity.graphLabelPropFull _),
    "graph_jaccard_full"        -> (Similarity.graphJaccardFull _),
    // round-12: recall@10 of the ADC serving path vs exact L2 ground
    // truth — completes the eval-harness family (SURVEY §2 row J30)
    "pq_recall_at_k"            -> (Similarity.pqRecallAtK _),
    // round-12: triangle census + degree assortativity migrated to the
    // full-corpus graph (SURVEY §2 rows M108, M109)
    "graph_triangle_full"       -> (Similarity.graphTriangleFull _),
    "graph_assortativity_full"  -> (Similarity.graphAssortativityFull _),
    // round-12: label-partition modularity on the full-corpus graph
    // (SURVEY §2 row M110)
    "graph_modularity_full"     -> (Similarity.graphModularityFull _),
    // round-12: the recall/cost curve at nprobe 1..3, one probe pass
    // serving all three arms (SURVEY §2 row J31)
    "vec_ivf_recall_sweep"      -> (Similarity.vecIvfRecallSweep _),
    // round-12: per-cell drift of the frozen base quantizer vs a fresh
    // M-step on the current corpus — the rebuild-policy audit that
    // completes the incremental lifecycle (SURVEY §2 row M111)
    "vec_centroid_drift"        -> (Similarity.vecCentroidDrift _),
    // round-13: the drift audit turned into the serve/update/retrain
    // DECISION a lake deployment runs nightly — explicit thresholds over
    // drift, delta fraction, and cell population, per cell plus a
    // worst-cell-wins overall row (SURVEY §2 row M112)
    "index_policy_vecsearch"    -> (Similarity.indexPolicyVecsearch _),
    // round-13: per-query ADAPTIVE probe depth — cells probed in rank
    // order until a candidate floor is met, the knob between the J31
    // sweep's fixed-nprobe grid points (SURVEY §2 row J32)
    "vec_probe_adaptive"        -> (Similarity.vecProbeAdaptive _),
    "vec_pq_residual"           -> (Similarity.vecPqResidual _),
    "graph_bfs_distance_full"   -> (Similarity.graphBfsDistanceFull _),
    // round 13, second batch
    "agg_countmin_sketch"       -> (Aggregates.aggCountminSketch _),
    "ts_holt_linear"            -> (Aggregates.tsHoltLinear _),
    "win_event_paths"           -> (Windows.winEventPaths _),
    "dq_schema_drift"           -> (DataQuality.dqSchemaDrift _),
    "pipeline_softdedup_weights" -> (TextAnalysis.softdedupWeights _),
    "pipeline_domain_mix_kl"    -> (TextAnalysis.domainMixKl _),
    "ann_multitable_topk"       -> (Similarity.annMultitableTopk _),
    "graph_hits_full"           -> (Similarity.graphHitsFull _),
    "dedup_multi_signal"        -> (Dedup.multiSignal _),
    "vec_dim_variance_prune"    -> (VectorText.vecDimVariancePrune _),
    "win_conversion_lag"        -> (Windows.winConversionLag _),
    "text_bpe_merge_round"      -> (TextAnalysis.bpeMergeRound _),
    "graph_random_walks"        -> (Similarity.graphRandomWalks _),
    "pipeline_dedup_funnel"     -> (TextAnalysis.dedupFunnel _),
    // round 14: RFM segmentation + cohort LTV (the commerce-analytics
    // pair), KMV theta sketch with set ops, DSIR importance weights,
    // per-language OOV audit, exact rank-identity AUC, range similarity
    // search, resource-allocation link prediction
    "win_rfm_scores"            -> (Windows.winRfmScores _),
    "win_cohort_ltv"            -> (Windows.winCohortLtv _),
    "agg_theta_kmv"             -> (Aggregates.aggThetaKmv _),
    "pipeline_dsir_weights"     -> (TextAnalysis.dsirWeights _),
    "text_oov_rate"             -> (TextAnalysis.textOovRate _),
    "ml_auc_score"              -> (MlFeatures.mlAucScore _),
    "ann_range_search"          -> (Similarity.annRangeSearch _),
    "graph_resource_alloc"      -> (Similarity.graphResourceAlloc _),
    // round 14, second batch: local clustering coefficient, PR-curve
    // operating points, retrain-churn audit
    "graph_clustering_coeff"    -> (Similarity.graphClusteringCoeff _),
    "ml_pr_curve"               -> (MlFeatures.mlPrCurve _),
    "vec_retrain_churn"         -> (Similarity.vecRetrainChurn _),
    // round 15: the F5v2 two-pass range-partitioned twin of the RFM
    // segmentation — same oracle SQL as L29, no global ntile window
    "win_rfm_scores_scalable"   -> (Windows.winRfmScoresScalable _),
    // round 15: model-quality operating tables (calibration + lift) on
    // the N17 fixture, and the CCNet-style per-language rarity terciles —
    // all three ride the F5v2 two-pass rank, exact-integer hash paths
    "ml_calibration_bins"       -> (MlFeatures.mlCalibrationBins _),
    "ml_lift_deciles"           -> (MlFeatures.mlLiftDeciles _),
    "text_rarity_buckets"       -> (TextAnalysis.rarityBuckets _),
    // round 16: the DE calibration generation (the family beyond D4's
    // grid sweep) and the 2D fixed-grid stencil/image-cleaning family —
    // tailcut two-threshold clean, keep-largest-island via the star-CC
    // loop, and the 3×3 box-mean stencil primitive
    "param_sweep_de_step"       -> (Relational.paramSweepDeStep _),
    "param_sweep_saes_step"     -> (Relational.paramSweepSaesStep _),
    "grid_tailcut_clean"        -> (GridStencil.gridTailcutClean _),
    "grid_island_largest"       -> (GridStencil.gridIslandLargest _),
    "grid_stencil_smooth"       -> (GridStencil.gridStencilSmooth _),
  )
}
