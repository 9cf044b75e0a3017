#!/bin/bash
# Round-11 closing evidence battery: tri-SF + 8-shard full preflights,
# then the extended sf1 oracle subset. Sequential on purpose — benches
# and gates must not contend (the round-10 ambient-drift lesson).
set -x
cd /root/repo

SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/vr11_sf0001" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.001 /tmp/vr11_sf0001 > bench/PREFLIGHT_r11_sf0.001.txt 2>&1
tail -1 bench/PREFLIGHT_r11_sf0.001.txt

SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vr11_sf001" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.01 /tmp/vr11_sf001 > bench/PREFLIGHT_r11_sf0.01.txt 2>&1
tail -1 bench/PREFLIGHT_r11_sf0.01.txt

SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/vr11_sf01" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.1 /tmp/vr11_sf01 > bench/PREFLIGHT_r11_sf0.1.txt 2>&1
tail -1 bench/PREFLIGHT_r11_sf0.1.txt

SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/fixtures/sf0.1x8 /tmp/vr11_x8" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py target/fixtures/sf0.1x8 /tmp/vr11_x8 > bench/PREFLIGHT_r11_sf0.1x8.txt 2>&1
tail -1 bench/PREFLIGHT_r11_sf0.1x8.txt

# sf1 oracle subset, extended 42 -> 84 keys (VERDICT r9 #4 / r10 #5).
# The key list is RECORDED here and in the preflight header — earlier
# rounds never wrote it down.
SUBSET="dedup_minhash_sig,dedup_minhash_pairs,dedup_connected_components_v2,dedup_cluster_canonical,dedup_exact_keep_first,dedup_simhash,dedup_bloom_partitioned,dedup_semantic_clusters,text_exact_dedup,text_paragraph_dedup,ann_ivf_topk,ann_ivf_pq_topk,ann_lsh_bucket,ann_recall_at_k,ann_graph_expand_topk,vec_knn_topk,vec_pq_adc_topk,vec_pq_rerank,vec_pq_error,search_hybrid_rrf,vec_hard_negatives,vec_ivf_stats,vec_kmeans_lloyd,vec_matryoshka_eval,index_build_vecsearch,index_build_mediasig,index_update_mediasig,graph_kcore_full,graph_kcore_peel,graph_pagerank_knn,graph_triangle_knn,graph_knn_jaccard,graph_label_propagation,graph_modularity_labels,graph_degree_assortativity,wk_q2_min_cost_supplier,wk_q3_shipping_priority,wk_q4_order_priority,wk_q5_region_volume,wk_q6_discount_revenue,wk_q7_region_trade,wk_q8_market_share,wk_q9_product_profit,wk_q10_returns,wk_q11_important_stock,wk_q12_lag_priority,wk_q13_order_count_dist,wk_q14_promo_share,wk_q15_top_supplier,wk_q16_supplier_cnt,wk_q17_small_qty_revenue,wk_q18_large_orders,wk_q19_brand_discounts,wk_q20_excess_stock,wk_q21_late_supplier,wk_q22_lapsed_customers,win_rank_topn,win_running_total,win_lead_lag,win_range_frame,win_ntile_pct,win_ntile_scalable,win_nth_value,win_rolling_7d,win_ratio_to_report,win_streak_islands,win_cume_dist_pct,win_rolling_median,win_first_last,win_ewma,win_drawdown,win_pattern_match,pipeline_epoch_shuffle,pipeline_eval_holdout,pipeline_pack_sequences,pipeline_token_budget_mix,agg_heavy_hitters,agg_heavy_hitters_grouped,mm_phash_hamming,mm_phash_clusters,graph_cc_full,graph_pagerank_full,vec_knn_join_full,ann_recall_full"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/fixtures/sf1 /tmp/vr11_sf1 $SUBSET" 2>&1 | grep "\[verify\]"
{ echo "# round-11 sf1 oracle subset (84 keys, recorded for reproducibility):"
  echo "# $SUBSET"
  python3 tools/preflight.py target/fixtures/sf1 /tmp/vr11_sf1 "$SUBSET" 2>&1
} > bench/PREFLIGHT_r11_sf1_subset.txt
tail -1 bench/PREFLIGHT_r11_sf1_subset.txt

echo "ALL DONE"
