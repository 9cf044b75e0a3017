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
    "join_bucketed_colocated" -> (Relational.joinBucketedColocated _),
    // joins
    "join_inner_equi"       -> (Relational.joinInnerEqui _),
    "join_broadcast_dim"    -> (Relational.joinBroadcastDim _),
    "join_multiway_star"    -> (Relational.joinMultiwayStar _),
    "join_left_outer"       -> (Relational.joinLeftOuter _),
    "join_full_outer"       -> (Relational.joinFullOuter _),
    "join_semi"             -> (Relational.joinSemi _),
    "join_anti"             -> (Relational.joinAnti _),
    "join_cross"            -> (Relational.joinCross _),
    // sort / limit / top-k
    "sort_multi_nulls"      -> (Relational.sortMultiNulls _),
    "limit_topk"            -> (Relational.limitTopk _),
    "topk_per_group"        -> (Relational.topkPerGroup _),
    "sample_hash_bucket"    -> (Relational.sampleHashBucket _),
    "sample_stratified_quota" -> (Relational.sampleStratifiedQuota _),
    // aggregations
    "agg_pricing_summary"   -> (Aggregates.aggPricingSummary _),
    "agg_count_distinct"    -> (Aggregates.aggCountDistinct _),
    "agg_multi_distinct"    -> (Aggregates.aggMultiDistinct _),
    "agg_rollup"            -> (Aggregates.aggRollup _),
    "agg_cube"              -> (Aggregates.aggCube _),
    "agg_grouping_sets"     -> (Aggregates.aggGroupingSets _),
    "agg_stats"             -> (Aggregates.aggStats _),
    "agg_collect_sorted"    -> (Aggregates.aggCollectSorted _),
    "agg_percentiles"       -> (Aggregates.aggPercentiles _),
    "agg_percentile_approx" -> (Aggregates.aggPercentileApprox _),
    "agg_tdigest"           -> (Aggregates.aggTdigest _),
    "agg_approx_hll"        -> (Aggregates.aggApproxHll _),
    "pivot_event_type"      -> (Aggregates.pivotEventType _),
    // windows
    "win_rank_topn"         -> (Windows.winRankTopn _),
    "win_running_total"     -> (Windows.winRunningTotal _),
    "win_lead_lag"          -> (Windows.winLeadLag _),
    "win_range_frame"       -> (Windows.winRangeFrame _),
    "win_ntile_pct"         -> (Windows.winNtilePct _),
    "win_ntile_scalable"    -> (Windows.winNtileScalable _),
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
    "fn_json_suite"         -> (Scalars.fnJsonSuite _),
    // UDF / UDAF
    "udf_score"             -> (Scalars.udfScore _),
    "expr_score_native"     -> (Scalars.exprScoreNative _),
    "udaf_weighted_avg"     -> (Scalars.udafWeightedAvg _),
    // array / vector
    "arr_scalar_suite"      -> (VectorText.arrScalarSuite _),
    "vec_cosine_pairs"      -> (VectorText.vecCosinePairs _),
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
    "dedup_simhash"         -> (Dedup.simhash _),
    "dedup_exact_keep_first" -> (Dedup.exactKeepFirst _),
    "dedup_embedding_topk"  -> (Dedup.embeddingTopk _),
    // similarity search
    "ann_lsh_bucket"        -> (Similarity.annLshBucket _),
    "ann_ivf_topk"          -> (Similarity.annIvfTopk _),
    // text analysis
    "text_lang_id"          -> (TextAnalysis.langId _),
    "text_normalize"        -> (TextAnalysis.normalize _),
    "text_quality_score"    -> (TextAnalysis.qualityScore _),
    "text_token_count"      -> (TextAnalysis.tokenCount _),
    "text_fingerprint"      -> (TextAnalysis.fingerprint _),
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
    "join_asof_exec"        -> (Streaming.joinAsofExec _),
  )
}
