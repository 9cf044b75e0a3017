package graft

class AnalyticSpec extends SparkSpec {

  test("E11 agg_histogram: buckets in range, counts sum to table size") {
    val df = run("agg_histogram")
    assert(df.where("bucket < 0 OR bucket > 23").count() == 0)
    val total = df.selectExpr("sum(n_orders)").head().getLong(0)
    assert(total == Tables.orders(spark, sf).count())
  }

  test("L11 ts_gapfill_hourly: spine is contiguous hourly with real zero-filled gaps") {
    val df = run("ts_gapfill_hourly")
    // consecutive spine rows are exactly one hour apart
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val gaps = df
      .withColumn("prev", lag("hour", 1).over(Window.orderBy("hour")))
      .where("prev IS NOT NULL AND CAST(hour AS LONG) - CAST(prev AS LONG) <> 3600")
      .count()
    assert(gaps == 0, "spine must be a contiguous hourly grid")
    // purchases are sparse: zero-filled hours must actually occur
    assert(df.where("n = 0").count() > 0, "expected real gaps to fill")
    assert(df.where("n = 0 AND sum_value <> 0.0").count() == 0)
  }

  test("F1 win_rank_topn: at most 3 per nation, rn==rk with unique tiebreak") {
    val df = run("win_rank_topn")
    assert(df.where("rn > 3").count() == 0)
    assert(df.where("rn <> rk").count() == 0)
  }

  test("F2 win_running_total: final running total equals group sum") {
    val df = run("win_running_total")
    val bad = df.groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.expr("max(running_total) AS mx"))
      .join(
        spark.read.parquet(s"$sf/orders.parquet")
          .groupBy("o_custkey")
          .agg(org.apache.spark.sql.functions.expr(
            "cast(sum(cast(o_totalprice as decimal(12,2))) as decimal(18,2)) AS tot")),
        "o_custkey")
      .where("mx <> tot").count()
    assert(bad == 0)
  }

  test("F3 win_lead_lag: gaps non-negative, first event per user has null gap") {
    val df = run("win_lead_lag")
    assert(df.where("gap_us < 0").count() == 0)
    val users = df.select("user_id").distinct().count()
    assert(df.where("gap_us IS NULL").count() == users)
  }

  test("F4 win_range_frame: trailing sum at least current value") {
    val df = run("win_range_frame")
    assert(df.count() > 0)
    assert(df.where("sum_1h IS NULL").count() == 0)
  }

  test("F5 win_ntile_pct: quartiles 1..4, pct_rank in [0,1]") {
    val df = run("win_ntile_pct")
    assert(df.where("quartile < 1 OR quartile > 4").count() == 0)
    assert(df.where("pct_rank < 0 OR pct_rank > 1 OR cume <= 0 OR cume > 1").count() == 0)
  }

  test("E4 agg_rollup: grand total row has both grouping flags set") {
    val df = run("agg_rollup")
    assert(df.where("g_r = 1 AND g_n = 1").count() == 1)
    assert(df.where("g_r = 0 AND g_n = 1").count() == 5) // one subtotal per region
  }

  test("E5 agg_cube: 6 combos + 3 + 2 margins + 1 total = 12 rows") {
    assert(run("agg_cube").count() == 12)
  }

  test("E9 agg_approx_hll: within 5% of exact distinct count") {
    val approx = run("agg_approx_hll").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("approx_users")).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1, n * 0.05), s"$k: ${approx(k)} vs $n")
    }
  }

  test("E16 agg_hll_sketch_union: weekly union-of-daily-sketches within 5% of exact") {
    import org.apache.spark.sql.functions._
    val approx = run("agg_hll_sketch_union").collect()
      .map(r => r.get(0).toString -> r.getAs[Long]("approx_users")).toMap
    val exact = Tables.events(spark, sf)
      .select(date_trunc("week", to_date(col("ts"))).as("week"), col("user_id"))
      .groupBy("week").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.get(0).toString -> r.getAs[Long]("n")).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1, n * 0.05), s"$k: ${approx(k)} vs $n")
    }
  }

  test("agg_percentile_approx: within 1% relative error of exact percentiles") {
    val exact = run("agg_percentiles").collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("median_price"), r.getAs[Double]("p90_price"))).toMap
    run("agg_percentile_approx").collect().foreach { r =>
      val k = r.getAs[String]("l_returnflag")
      val (m, p90) = exact(k)
      assert(math.abs(r.getAs[Double]("median_price") - m) <= 0.01 * m.abs,
        s"$k median ${r.getAs[Double]("median_price")} vs exact $m")
      assert(math.abs(r.getAs[Double]("p90_price") - p90) <= 0.01 * p90.abs,
        s"$k p90 ${r.getAs[Double]("p90_price")} vs exact $p90")
    }
  }

  test("agg_tdigest: custom sketch within 2% relative error of exact percentiles") {
    val exact = run("agg_percentiles").collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("median_price"), r.getAs[Double]("p90_price"))).toMap
    run("agg_tdigest").collect().foreach { r =>
      val k = r.getAs[String]("l_returnflag")
      val (m, p90) = exact(k)
      assert(math.abs(r.getAs[Double]("q50_price") - m) <= 0.02 * m.abs,
        s"$k median ${r.getAs[Double]("q50_price")} vs exact $m")
      assert(math.abs(r.getAs[Double]("q90_price") - p90) <= 0.02 * p90.abs,
        s"$k p90 ${r.getAs[Double]("q90_price")} vs exact $p90")
    }
  }

  test("E10 pivot_event_type: row per user, columns sum to event count") {
    val df = run("pivot_event_type")
    val total = df.selectExpr("sum(view + click + purchase + signup + error)").head().getLong(0)
    assert(total == 1000) // sf0.001 events
  }

  test("N1v2 dq_profile_approx: estimates within 5% of exact; nulls identical") {
    val exact = run("dq_profile_table").collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n_nulls"), r.getAs[Long]("n_distinct")))).toMap
    val approx = run("dq_profile_approx").collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val (nn, nd) = exact(r.getAs[String]("col_name"))
      assert(r.getAs[Long]("n_nulls") == nn)
      val est = r.getAs[Long]("approx_distinct")
      assert(math.abs(est - nd) <= math.max(1, nd * 0.05),
        s"${r.getAs[String]("col_name")}: $est vs $nd")
    }
  }

  test("E10/H4 law: unpivot inverts pivot (round-trip restores the long form)") {
    import org.apache.spark.sql.functions.col
    val types = Seq("view", "click", "purchase", "signup", "error")
    val wide = run("pivot_event_type")
    val long = wide.unpivot(Array(col("user_id")),
        types.map(col).toArray, "event_type", "n")
      .where(col("n") > 0)
    val model = Tables.events(spark, sf)
      .groupBy(col("user_id"), col("event_type")).count()
    assert(long.exceptAll(model.toDF("user_id", "event_type", "n")).count() == 0 &&
      model.count() == long.count(),
      "unpivot(pivot(x)) must restore the per-(user,type) counts")
  }

  test("observe: pipeline emits audit metrics without a second pass") {
    import org.apache.spark.sql.functions._
    // production instrumentation: row counts / sums ride along the SAME
    // job via CollectMetrics — no extra scan for the audit numbers
    val obs = new org.apache.spark.sql.Observation("audit")
    val df = Tables.orders(spark, sf)
      .observe(obs, count(lit(1)).as("rows_in"),
        sum(when(col("o_totalprice") > 400000, 1L).otherwise(0L)).as("outliers"))
      .where(col("o_totalprice") <= 400000)
    val kept = df.count()
    val m = obs.get
    assert(m("rows_in").asInstanceOf[Long] == kept + m("outliers").asInstanceOf[Long],
      s"metrics $m inconsistent with kept=$kept")
  }

  test("H1/H2: distinct arm equals union of key sets; intersect is subset") {
    val dist = run("set_union_all_distinct").where("tag = 'dist'").count()
    val inter = run("set_intersect").count()
    assert(inter <= dist)
  }

  test("H3 set_except_all: except + intersect multiset sizes partition A") {
    val df = run("set_except_all")
    val nA = spark.read.parquet(s"$sf/lineitem.parquet").count()
    val byTag = df.groupBy("tag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTag("except") + byTag("intersect") == nA)
  }

  test("D1 subquery_scalar_uncorr: all above the mean") {
    val df = run("subquery_scalar_uncorr")
    val mean = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("cast(sum(cast(c_acctbal as decimal(12,2))) as double)/count(*)")
      .head().getDouble(0)
    assert(df.where(s"c_acctbal <= $mean").count() == 0)
  }

  test("D3 cte_reuse: returns the argmax supplier(s)") {
    assert(run("cte_reuse").count() >= 1)
  }

  // ── round-4 additions ──

  test("L15 ts_interval_union: covered time bounded by [one interval, n×interval]") {
    val df = run("ts_interval_union")
    val intervalUs = 30L * 60 * 1000000
    assert(df.where(s"covered_us < $intervalUs").count() == 0,
      "every user covers at least one full interval")
    assert(df.where(s"covered_us > n_events * $intervalUs").count() == 0,
      "union length cannot exceed the disjoint sum")
    assert(df.where("n_islands > n_events").count() == 0)
    // islands are maximal: total covered equals Σ islands only when
    // n_islands == n_events would every interval be disjoint
    assert(df.count() == Tables.events(spark, sf)
      .select("user_id").distinct().count())
  }

  test("F12 win_pattern_match: spans within the hour, strictly ordered") {
    val df = run("win_pattern_match")
    assert(df.where("span_us < 0 OR span_us > 3600000000").count() == 0)
    assert(df.where("end_event = start_event").count() == 0)
  }

  test("E20 agg_decay_halflife: decayed count bounded by recency arithmetic") {
    val df = run("agg_decay_halflife")
    assert(df.where("decayed_count <= 0 OR decayed_count > n_recent").count() == 0,
      "each event contributes (0, 1] to the decayed count")
    // dyadic exactness: decayed_count scaled by 2^19 must be integral
    assert(df.where(
      "decayed_count * 524288.0 <> round(decayed_count * 524288.0)").count() == 0,
      "decay sums must be exact multiples of 2^-19")
  }

  test("E21 agg_bitmap_distinct: bitmap popcounts equal literal COUNT DISTINCT") {
    val df = run("agg_bitmap_distinct")
    val direct = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n_users"))
    val joined = df.join(direct.withColumnRenamed("n_users", "expected"), "event_type")
    assert(joined.where("n_users <> expected").count() == 0)
  }

  test("N3 dq_anomaly_mad: flags are exactly the 3×MAD rule applied to the row") {
    val df = run("dq_anomaly_mad")
    assert(df.where("is_anomaly <> (abs(n_events - med) > mad * 3.0)").count() == 0)
    assert(df.select("med").distinct().count() == 1, "one global median")
  }

  test("C12 join_interval_overlap: overlap positive and bounded by the shorter interval") {
    val df = run("join_interval_overlap")
    assert(df.count() > 0, "sf0.001 must produce overlapping pairs")
    assert(df.where("overlap_us <= 0 OR overlap_us > 600000000").count() == 0,
      "overlap is strictly positive and at most the 10-min outage window")
  }

  test("M37 ann_recall_at_k: recall in [0,1] over exactly 10 ground-truth rows each") {
    val df = run("ann_recall_at_k")
    assert(df.count() == 10)
    assert(df.where("n_exact <> 10").count() == 0)
    assert(df.where("recall < 0.0 OR recall > 1.0 OR n_hit > n_exact").count() == 0)
  }

  test("M38 pipeline_split_train_eval: splits partition the corpus, train dominates") {
    val df = run("pipeline_split_train_eval")
    assert(df.count() == 3)
    val total = df.selectExpr("sum(n_docs)").head().getLong(0)
    assert(total == Tables.documents(spark, sf).count())
    val byName = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("train") > byName("val") + byName("test"),
      s"expected ~90/5/5, got $byName")
  }

  test("M36 text_sparse_cosine_topk: cosine bounded, descending, full tiebreak") {
    val df = run("text_sparse_cosine_topk")
    val rows = df.collect()
    assert(rows.length == 20)
    assert(rows.forall(r => r.getDouble(2) >= -1.0000001 && r.getDouble(2) <= 1.0000001))
    val sims = rows.map(_.getDouble(2))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "descending")
  }

  test("M39 text_zipf_slope: negative slope per language with plausible fit") {
    val df = run("text_zipf_slope")
    assert(df.count() > 0)
    assert(df.where("zipf_slope >= 0.0").count() == 0,
      "rank-frequency slope must be negative")
    assert(df.where("r2 < 0.0 OR r2 > 1.0").count() == 0)
  }

  test("N4 dq_referential_integrity: one row per FK edge, orphans bounded") {
    val df = run("dq_referential_integrity")
    assert(df.count() == 4)
    assert(df.where("orphan_rows < 0 OR orphan_rows > child_rows").count() == 0)
    val li = Tables.lineitem(spark, sf).count()
    val byRel = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byRel("lineitem->orders") == li && byRel("lineitem->part") == li,
      "left join must preserve every child row")
  }

  test("L16 ts_downsample_ohlc: bars bounded, volumes partition the stream") {
    val df = run("ts_downsample_ohlc")
    assert(df.where(
      "open < low OR open > high OR close < low OR close > high OR low > high")
      .count() == 0)
    assert(df.where("n_events < 1").count() == 0)
    val total = df.selectExpr("sum(n_events)").head().getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("E22 agg_weighted_median: half the mass on each side, exactly") {
    import org.apache.spark.sql.functions._
    val df = run("agg_weighted_median")
    assert(df.count() == 3)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"),
        round(col("l_quantity"), 0).cast("long").as("w"))
    df.collect().foreach { r =>
      val (flag, wm, tot) = (r.getString(0), r.getDouble(1), r.getLong(2))
      val below = li.where(col("l_returnflag") === flag &&
        col("l_extendedprice") < wm).agg(sum("w")).head().getLong(0)
      val atOrBelow = li.where(col("l_returnflag") === flag &&
        col("l_extendedprice") <= wm).agg(sum("w")).head().getLong(0)
      assert(below * 2 < tot, s"$flag: mass strictly below the median must be < half")
      assert(atOrBelow * 2 >= tot, s"$flag: mass at-or-below must reach half")
    }
  }

  test("E23 agg_skew_kurtosis: moment inequalities hold on exact sums") {
    val df = run("agg_skew_kurtosis")
    assert(df.count() == 3)
    assert(df.where("m2 <= 0.0").count() == 0, "variance must be positive")
    // kurtosis + 3 = m4/m2^2 >= 1 + skew^2 (Pearson's inequality)
    assert(df.where("kurtosis + 3.0 < skewness * skewness + 1.0 - 1e-9").count() == 0)
  }

  test("F13 win_rolling_median: frame sizes in [1,7], median inside value range") {
    val df = run("win_rolling_median")
    assert(df.count() == Tables.events(spark, sf).count())
    assert(df.where("n_win < 1 OR n_win > 7").count() == 0)
    assert(df.where("n_win = 1").count() > 0, "every user's first event has a 1-frame")
    val mm = Tables.events(spark, sf)
      .selectExpr("min(value) AS lo", "max(value) AS hi").head()
    assert(df.where(s"rolling_median < ${mm.getDouble(0)} OR rolling_median > ${mm.getDouble(1)}")
      .count() == 0)
  }

  test("C9n join_asof_nearest: picks the closer direction, ties backward") {
    val df = run("join_asof_nearest")
    assert(df.count() == Tables.events(spark, sf).count())
    assert(df.where("diff_us < 0").count() == 0)
    assert(df.where(
      "nearest_signup_us IS NOT NULL AND nearest_signup_us <> back_us AND nearest_signup_us <> fwd_us")
      .count() == 0)
    // when both candidates exist the pick is the true minimum distance,
    // backward on ties
    assert(df.where(
      """back_us IS NOT NULL AND fwd_us IS NOT NULL AND (
        |  (ts_us - back_us <= fwd_us - ts_us AND nearest_signup_us <> back_us) OR
        |  (ts_us - back_us >  fwd_us - ts_us AND nearest_signup_us <> fwd_us))""".stripMargin)
      .count() == 0)
  }

  test("C13 join_scd2_point_in_time: every purchase hits exactly one interval") {
    val df = run("join_scd2_point_in_time")
    val purchases = Tables.events(spark, sf).where("event_type = 'purchase'").count()
    assert(df.count() == purchases, "interval chain must cover each fact once")
    assert(df.select("event_id").distinct().count() == purchases)
    assert(df.where("ts_us < valid_from_us OR version < 1").count() == 0)
  }

  test("M40 text_repetition_stats: ratios well-formed, corpus repetition detected") {
    val df = run("text_repetition_stats")
    assert(df.count() > 0)
    assert(df.where(
      "uniq_token_frac <= 0.0 OR uniq_token_frac > 1.0 OR " +
        "top_token_frac <= 0.0 OR top_token_frac > 1.0 OR " +
        "dup_trigram_frac < 0.0 OR dup_trigram_frac >= 1.0").count() == 0)
    assert(df.where("top_token_frac * n_tok < 1.0").count() == 0)
    assert(df.where("dup_trigram_frac > 0.0").count() > 0,
      "the synthetic corpus repeats trigrams — some doc must show it")
  }

  test("M41 dedup_ngram_corpus_frac: shared bounded by total, sharing is symmetric") {
    val df = run("dedup_ngram_corpus_frac")
    assert(df.count() > 0)
    assert(df.where("n_shared < 0 OR n_shared > n_5grams").count() == 0)
    assert(df.where("shared_frac < 0.0 OR shared_frac > 1.0").count() == 0)
    // a 5-gram shared by doc A is by definition shared by some other doc:
    // at least two docs must carry a shared gram (or none do)
    val sharers = df.where("n_shared > 0").count()
    assert(sharers != 1, "sharing cannot involve exactly one document")
  }

  test("M42 graph_triangle_knn: census consistent with a 5-NN graph") {
    val r = run("graph_triangle_knn").head()
    val (nv, ne, nt) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nv > 0 && nv <= 500)
    // symmetrized 5-NN: between 5V/2 (all mutual) and 5V (no mutual) edges
    assert(ne * 2 >= nv * 5 && ne <= nv * 5, s"edges $ne out of 5-NN range for $nv vertices")
    assert(nt > 0, "clustered embeddings must close some triangles")
    // triangles cannot exceed edges * max_degree (≤ 2k = 10)
    assert(nt <= ne * 10)
  }

  test("L17 ts_autocorr_hourly: Pearson r in [-1,1] over hours-1 pairs") {
    val r = run("ts_autocorr_hourly").head()
    assert(r.getLong(0) > 0)
    val corr = r.getDouble(2)
    assert(corr >= -1.0 - 1e-12 && corr <= 1.0 + 1e-12)
  }

  test("M43 text_source_entropy: bounded by ln k, one row per language") {
    val df = run("text_source_entropy")
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(df.count() == langs)
    assert(df.where("source_entropy < 0.0 OR source_entropy > ln(k_sources) + 1e-9")
      .count() == 0, "entropy must lie in [0, ln k]")
  }

  test("C14 join_null_safe: NULL bucket pairs = product of the nullified sides") {
    val df = run("join_null_safe")
    val c3 = Tables.customer(spark, sf).where("c_nationkey = 3").count()
    val s3 = Tables.supplier(spark, sf).where("s_nationkey = 3").count()
    val nullRow = df.where("nation_key IS NULL").collect()
    assert(nullRow.length == (if (c3 * s3 > 0) 1 else 0))
    if (nullRow.nonEmpty)
      assert(nullRow.head.getLong(1) == c3 * s3,
        "NULL <=> NULL must pair every nullified customer with every nullified supplier")
    assert(df.where("nation_key = 3").count() == 0, "key 3 was nullified away")
  }

  test("J15 vec_norm_stats: min <= avg <= max within quantization tolerance") {
    val df = run("vec_norm_stats")
    val total = df.selectExpr("sum(n_vecs)").head().getLong(0)
    assert(total == Tables.embeddings(spark, sf).count())
    assert(df.where("min_norm > max_norm").count() == 0)
    assert(df.where("avg_norm < min_norm - 1e-6 OR avg_norm > max_norm + 1e-6").count() == 0)
  }

  test("I12 fn_url_suite: parser recovers every synthesized component") {
    val df = run("fn_url_suite")
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.where(
      "host IS NULL OR path IS NULL OR query IS NULL OR q_param IS NULL OR page_param IS NULL")
      .count() == 0)
    assert(df.where("host NOT LIKE 'ex%.example.com' OR path NOT LIKE '/p/%'").count() == 0)
  }

  test("F14 win_cume_dist_pct: ratio ranges and endpoints per partition") {
    val df = run("win_cume_dist_pct")
    assert(df.where("cd <= 0.0 OR cd > 1.0 OR pr < 0.0 OR pr >= 1.0 + 1e-12").count() == 0)
    // the last row of each partition has cd = 1, the first has pr = 0
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal"), col("c_custkey"))
    val marked = df.withColumn("rn", row_number().over(w))
      .withColumn("nmax", max("rn").over(Window.partitionBy("c_nationkey")))
    assert(marked.where("rn = nmax AND cd <> 1.0").count() == 0)
    assert(marked.where("rn = 1 AND pr <> 0.0").count() == 0)
  }

  test("M44 dedup_semantic_clusters: histogram of mutual-2NN components, sizes >= 2") {
    val df = run("dedup_semantic_clusters")
    assert(df.where("cluster_size < 2").count() == 0,
      "a mutual edge implies both endpoints — no singleton clusters")
    assert(df.count() > 1, "mutual-2NN must yield multiple cluster sizes")
    val clustered = df.selectExpr("sum(cluster_size * n_clusters)").head().getLong(0)
    assert(clustered <= 500, "clustered vectors bounded by the vertex cap")
  }

  test("W1 wk_q3_shipping_priority: top-10 by revenue, dates straddle the cutoff") {
    val rows = run("wk_q3_shipping_priority").collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "revenue must be descending")
    assert(rows.forall(_.getAs[java.time.LocalDateTime]("o_orderdate")
      .isBefore(java.time.LocalDateTime.of(1998, 3, 15, 0, 0))))
  }

  test("W2 wk_q5_region_volume: at most the region's nations, positive revenue") {
    val df = run("wk_q5_region_volume")
    assert(df.count() <= 5 && df.count() > 0)
    assert(df.where("revenue <= 0.0").count() == 0)
  }

  test("W3 wk_q10_returns: 20 customers, descending revenue") {
    val rows = run("wk_q10_returns").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(2))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("W4 wk_q4_order_priority: counts partition the slow-order set") {
    val rows = run("wk_q4_order_priority").collect()
    assert(rows.nonEmpty && rows.length <= 5, "at most the 5 priority buckets")
    // semi-join semantics: the bucket counts must sum to the number of
    // DISTINCT qualifying orders, not the number of slow lines
    val expected = Tables.orders(spark, sf)
      .where("o_orderdate >= '1997-01-01' and o_orderdate < '1997-04-01'")
      .join(Tables.lineitem(spark, sf),
        org.apache.spark.sql.functions.expr(
          "o_orderkey = l_orderkey and l_shipdate > o_orderdate + interval 60 days"),
        "left_semi")
      .count()
    assert(rows.map(_.getLong(1)).sum == expected)
  }

  test("W5 wk_q7_region_trade: both directions, two ship years, positive volume") {
    val rows = run("wk_q7_region_trade").collect()
    assert(rows.length <= 4, "2 directions x 2 years at most")
    assert(rows.forall(r => r.getString(0) != r.getString(1)))
    assert(rows.forall(r => r.getInt(2) == 1996 || r.getInt(2) == 1997))
    assert(rows.forall(_.getDouble(3) > 0.0))
  }

  test("W6 wk_q8_market_share: share is a proper fraction per year") {
    val rows = run("wk_q8_market_share").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
    assert(rows.forall(_.getDouble(2) > 0.0))
  }

  test("W7 wk_q14_promo_share: one row, promo a sub-share of total") {
    val r = run("wk_q14_promo_share").head()
    assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 100.0)
    assert(r.getDouble(1) <= r.getDouble(2))
  }

  test("W8 wk_q18_large_orders: every order exceeds the quantity bar, price-descending") {
    val rows = run("wk_q18_large_orders").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.forall(_.getAs[Double]("sum_qty") > 300.0))
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("W9 wk_q22_lapsed_customers: nonempty, bounded by the customer count") {
    val rows = run("wk_q22_lapsed_customers").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(2) > 0.0), "lapsed-rich balances are positive")
    assert(rows.map(_.getLong(1)).sum < Tables.customer(spark, sf).count())
  }

  test("W10 wk_q6_discount_revenue: one row, bounded by the unfiltered discount total") {
    val r = run("wk_q6_discount_revenue").head()
    assert(r.getDouble(0) > 0.0 && r.getLong(1) > 0)
    val full = Tables.lineitem(spark, sf)
      .selectExpr("cast(sum(cast(l_extendedprice as decimal(12,2)) * cast(l_discount as decimal(12,2))) as double)")
      .head().getDouble(0)
    assert(r.getDouble(0) < full)
  }

  test("W11 wk_q13_order_count_dist: buckets partition the customer base") {
    val rows = run("wk_q13_order_count_dist").collect()
    assert(rows.map(_.getLong(1)).sum == Tables.customer(spark, sf).count())
    val dist = rows.map(_.getLong(1))
    assert(dist.zip(dist.tail).forall { case (a, b) => a >= b }, "custdist descending")
  }

  test("W12 wk_q15_top_supplier: all surfaced suppliers tie at the max") {
    val rows = run("wk_q15_top_supplier").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getDouble(2)).distinct.length == 1, "= max semantics: ties all surface")
  }

  test("W13 wk_q17_small_qty_revenue: one positive row") {
    val r = run("wk_q17_small_qty_revenue").head()
    assert(r.getDouble(0) > 0.0 && r.getLong(1) > 0)
  }

  test("W14 wk_q19_brand_discounts: exactly the 46 predicate-group lines at sf0.001") {
    val r = run("wk_q19_brand_discounts").head()
    assert(r.getLong(1) == 46, "fixture-derived count pins the OR-group predicate")
    assert(r.getDouble(0) > 0.0)
  }

  test("W15 wk_q21_late_supplier: top-10 descending, every count positive") {
    val rows = run("wk_q21_late_supplier").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val ns = rows.map(_.getLong(1))
    assert(ns.forall(_ >= 1L))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("A13 source_text_roundtrip: lossless — equals the direct aggregate") {
    val rt = run("source_text_roundtrip")
    val direct = Tables.documents(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("lang"))
      .agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("text")).cast("long")).as("total_chars"),
        org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.col("doc_id")).as("first_doc"))
    assert(rt.exceptAll(direct).count() == 0 && direct.exceptAll(rt).count() == 0)
  }

  test("A14 source_binaryfile_ingest: blob roundtrip is byte-lossless") {
    import org.apache.spark.sql.functions.{col, md5, length}
    val ingested = run("source_binaryfile_ingest")
    // one row per landed object, ids exactly the bounded subset
    val direct = Tables.documents(spark, sf).where(col("doc_id") < 200)
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5(col("text").cast("binary")).as("content_md5"))
    assert(ingested.count() == direct.count())
    assert(ingested.exceptAll(direct).count() == 0 &&
      direct.exceptAll(ingested).count() == 0)
  }

  test("A15 source_xml_roundtrip: lossless — equals the direct aggregate") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val rt = run("source_xml_roundtrip")
    val direct = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(graft.ops.Cols.dec2(col("o_totalprice"))).cast("double").as("total_price"))
    assert(rt.exceptAll(direct).count() == 0 && direct.exceptAll(rt).count() == 0)
  }

  test("I14 fn_variant_suite: typed extraction is the identity on base columns") {
    import org.apache.spark.sql.functions.col
    val v = run("fn_variant_suite")
    val direct = Tables.events(spark, sf).where(col("event_id") < 1000)
      .select(col("event_id"), col("event_type").as("type_str"),
        org.apache.spark.sql.functions.get_json_object(col("props"), "$.k")
          .cast("int").as("k"),
        col("value").as("v_double"))
    val got = v.select("event_id", "type_str", "k", "v_double")
    assert(got.exceptAll(direct).count() == 0 && direct.exceptAll(got).count() == 0)
    // missing-path null flag and stable subobject schema hold on every row
    assert(v.where("NOT missing_is_null OR meta_schema <> 'OBJECT<type: STRING>'")
      .count() == 0)
  }

  test("I15 fn_json_suite2: struct and tuple extraction agree; roundtrip is canonical") {
    val j = run("fn_json_suite2")
    assert(j.where("k_struct <> k_tuple").count() == 0)
    assert(j.where("""roundtrip <> concat('{"k":', k_struct, '}')""").count() == 0)
    assert(j.where("inferred <> 'STRUCT<k: BIGINT>'").count() == 0)
  }

  test("I16 fn_collation_suite: case classes merge; counts partition correctly") {
    import org.apache.spark.sql.functions.col
    val c = run("fn_collation_suite").collect()
    assert(c.map(_.getString(0)).toSeq == Seq("f", "o", "p")) // one group per letter
    c.foreach { r =>
      val (n, nUpper, nEqF) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(nUpper > 0 && nUpper < n) // both cases genuinely present pre-merge
      assert(r.getString(3) == r.getString(0).toUpperCase) // binary min = uppercase
      // the collated equality matched the whole 'f' class and nothing else
      assert(if (r.getString(0) == "f") nEqF == n else nEqF == 0L)
    }
  }

  test("D7 sql_session_variables: the re-bound value, not the default, applies") {
    val v = run("sql_session_variables")
    assert(v.where("thresh_used <> 150000.0").count() == 0)
    val nAbove = v.agg(org.apache.spark.sql.functions.sum("n_above")).head.getLong(0)
    val direct = Tables.orders(spark, sf)
      .where(org.apache.spark.sql.functions.col("o_totalprice") > 150000.0).count()
    assert(nAbove == direct)
  }

  test("L20 ts_seasonal_decompose: full spine, trend exactly at the 25h interior") {
    val rows = run("ts_seasonal_decompose").collect()
    assert(rows.length > 25)
    // exactly the first and last 12 hours lack a full centered window
    assert(rows.count(_.isNullAt(2)) == 24, "12 leading + 12 trailing edge hours")
    assert(rows.map(_.getLong(1)).sum == Tables.events(spark, sf).count(),
      "zero-filled spine preserves the event total")
  }

  test("W16 wk_q12_lag_priority: counts partition the 1997 line set") {
    val rows = run("wk_q12_lag_priority").collect()
    assert(rows.nonEmpty && rows.length <= 3)
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val expected = Tables.lineitem(spark, sf)
      .where("l_shipdate >= '1997-01-01' and l_shipdate < '1998-01-01'")
      .count()
    assert(total == expected, "high+low over all classes must cover every line")
  }

  test("M53 pipeline_curriculum_phases: 4 balanced phases, quality descending across phases") {
    val rows = run("pipeline_curriculum_phases").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getLong(1)).sum == Tables.documents(spark, sf).count())
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, "ntile(4) balance")
    // phase 1 holds the best quality: min of each phase dominates the next
    val mins = rows.map(_.getDouble(4))
    assert(mins.zip(mins.tail).forall { case (a, b) => a >= b })
  }

  test("J17 vec_pca_power_iter: unit-bounded loadings, dominance order, positive spectrum") {
    val rows = run("vec_pca_power_iter").collect()
    assert(rows.length == 8)
    val loads = rows.map(r => math.abs(r.getDouble(1)))
    assert(loads.forall(_ <= 1.0), "components of a unit vector")
    assert(loads.zip(loads.tail).forall { case (a, b) => a >= b }, "top-8 by |loading|")
    val eig = rows.map(_.getDouble(2)).distinct
    assert(eig.length == 1 && eig.head > 0.0, "one positive Rayleigh eigenvalue")
  }

  test("M49 pipeline_pack_sequences: every doc packed exactly once, ordered disjoint spans") {
    val rows = run("pipeline_pack_sequences").collect()
    assert(rows.map(_.getLong(1)).sum == Tables.documents(spark, sf).count(),
      "n_docs must partition the corpus")
    val seqIds = rows.map(_.getLong(0))
    assert(seqIds.zip(seqIds.tail).forall { case (a, b) => a < b })
    // doc-id spans must be disjoint and increasing: packing preserves order
    val spans = rows.map(r => (r.getLong(3), r.getLong(4)))
    assert(spans.forall { case (lo, hi) => lo <= hi })
    assert(spans.zip(spans.tail).forall { case ((_, hi), (lo2, _)) => hi < lo2 })
  }

  test("M52 pipeline_token_budget_mix: every source fills under budget+overflow") {
    val rows = run("pipeline_token_budget_mix").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (taken, budget, srcTot) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(taken <= srcTot, "cannot take more than the source holds")
      assert(r.getLong(1) >= 1L, "sqrt-flattening never zeroes a source")
      // overflow bound: the last-taken doc STARTS under budget
      assert(taken < budget + srcTot, "sanity bound on overflow")
      assert(r.getDouble(5) > 0.0)
    }
  }

  test("M50 dedup_shingle_containment: planted near-dups surface at containment 1.0") {
    val rows = run("dedup_shingle_containment").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < 50, "probe side is the bounded eval set")
      assert(r.getLong(0) != r.getLong(1), "no self pairs")
      val c = r.getDouble(4)
      assert(c >= 0.05 && c <= 1.0)
      assert(r.getInt(5) <= 3)
    }
    assert(rows.exists(_.getDouble(4) > 0.5),
      "fixture plants near-dup pairs; containment must find them")
  }

  test("M51 graph_pagerank_knn: top-20 descending, ranks bounded by theory") {
    val rows = run("graph_pagerank_knn").collect()
    assert(rows.length == 20)
    val ranks = rows.map(_.getDouble(1))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    val n = Tables.embeddings(spark, sf).where("vec_id < 500").count()
    assert(ranks.forall(r => r >= 0.15 / n && r < 1.0),
      "every rank carries at least the teleport mass, none the whole graph")
  }

  test("L19 ts_resample_interp_5m: full spine, interp only in gaps, edges null") {
    val df = run("ts_resample_interp_5m")
    val rows = df.collect()
    assert(rows.length > 1)
    // actual rows carry events; interp/edge rows carry none
    assert(df.where("src = 'actual' and n = 0").count() == 0)
    assert(df.where("src <> 'actual' and n > 0").count() == 0)
    assert(df.where("src = 'edge' and value_5m is not null").count() == 0)
    assert(df.where("src = 'interp' and value_5m is null").count() == 0)
  }

  test("M45 pipeline_dataset_card: one-row card consistent with the corpus") {
    val r = run("pipeline_dataset_card").head()
    val nDocs = Tables.documents(spark, sf).count()
    assert(r.getLong(0) == nDocs)
    assert(r.getLong(4) >= r.getLong(0), "every doc has at least one token")
    assert(math.abs(r.getDouble(6) - r.getLong(3).toDouble / r.getLong(0)) == 0.0)
  }

  test("E24 pivot_multi_agg: counts partition the stream, sums null iff count 0") {
    val df = run("pivot_multi_agg")
    val total = df.selectExpr(
      "sum(view_n + click_n + purchase_n + signup_n + error_n)").head().getLong(0)
    assert(total == Tables.events(spark, sf).count())
    Seq("view", "click", "purchase", "signup", "error").foreach { t =>
      assert(df.where(s"${t}_n = 0 AND ${t}_sv IS NOT NULL").count() == 0)
      assert(df.where(s"${t}_n > 0 AND ${t}_sv IS NULL").count() == 0)
    }
  }

  test("E25 agg_corr_pairs: every Pearson r in [-1, 1], one row") {
    val r = run("agg_corr_pairs").head()
    assert(r.getLong(0) == Tables.lineitem(spark, sf).count())
    Seq(1, 2, 3).foreach { i =>
      val c = r.getDouble(i)
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12, s"corr out of range: $c")
    }
  }

  test("M46 text_keywords_per_doc: at most 3 per doc, descending tf-idf") {
    val df = run("text_keywords_per_doc")
    assert(df.where("rk < 1 OR rk > 3").count() == 0)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("doc_id").orderBy("rk")
    val bad = df.withColumn("prev", lag("tfidf", 1).over(w))
      .where("prev IS NOT NULL AND tfidf > prev").count()
    assert(bad == 0, "tf-idf must be non-increasing within a doc")
  }

  test("J16 arr_flatten_nested: flattened multiset sizes reconcile with lineitem") {
    val df = run("arr_flatten_nested")
    assert(df.where("min_price > max_price OR n_items < n_arrays").count() == 0)
    val items = df.selectExpr("sum(n_items)").head().getLong(0)
    assert(items == Tables.lineitem(spark, sf).count())
    // inner join: only orders that HAVE lineitems contribute an array
    val orders = df.selectExpr("sum(n_arrays)").head().getLong(0)
    assert(orders == Tables.lineitem(spark, sf).select("l_orderkey").distinct().count())
  }

  test("M47 pipeline_quality_funnel: stages chain — n_out feeds the next n_in") {
    val rows = run("pipeline_quality_funnel").collect()
    assert(rows.length == 4)
    assert(rows.head.getLong(2) == Tables.documents(spark, sf).count(),
      "stage 1 must see the whole corpus")
    rows.foreach { r =>
      assert(r.getLong(3) >= 0 && r.getLong(2) == r.getLong(3) + r.getLong(4),
        s"in = fail + out must hold: $r")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) == b.getLong(2), "survivors must feed the next stage")
    }
  }

  test("L18 ts_hourofday_profile: 24 shares summing to 1, exactly the max rows peak") {
    val df = run("ts_hourofday_profile")
    assert(df.count() <= 24)
    val total = df.selectExpr("sum(n_events)").head().getLong(0)
    assert(total == Tables.events(spark, sf).count())
    val shareSum = df.selectExpr("sum(share)").head().getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-9)
    val maxN = df.selectExpr("max(n_events)").head().getLong(0)
    assert(df.where(s"is_peak <> (n_events = $maxN)").count() == 0)
  }

  test("E26 agg_gini_revenue: Gini in [0, 1), zero iff all values equal") {
    val df = run("agg_gini_revenue")
    assert(df.count() == 3)
    assert(df.where("gini < 0.0 OR gini >= 1.0").count() == 0)
    // prices vary within every flag, so concentration is strictly positive
    assert(df.where("gini <= 0.0").count() == 0)
  }

  test("M48 mm_chunk_dedup: block counts match ceil(bytes/64), sharing symmetric") {
    import org.apache.spark.sql.functions._
    val df = run("mm_chunk_dedup")
    assert(df.count() == Tables.documents(spark, sf).count())
    val badCount = df.join(
        Tables.documents(spark, sf).select(col("doc_id"), col("n_chars")), "doc_id")
      .where("n_chunks <> (n_chars + 63) div 64").count()
    assert(badCount == 0, "chunk count must be ceil(n_chars / 64)")
    assert(df.where("n_shared < 0 OR n_shared > n_chunks").count() == 0)
    assert(df.where("n_shared > 0").count() != 1, "block sharing needs >= 2 docs")
  }

  test("C9t join_asof_tolerance: matches bounded by staleness, expired flagged") {
    val df = run("join_asof_tolerance")
    assert(df.count() == Tables.events(spark, sf).count())
    assert(df.where("signup_ts_us IS NOT NULL AND ts_us - signup_ts_us > 3600000000")
      .count() == 0, "no match may exceed the 1 h tolerance")
    assert(df.where("match_expired AND signup_ts_us IS NOT NULL").count() == 0)
    assert(df.where("match_expired").count() > 0,
      "a 30-day stream must have signups staler than 1 h")
  }

  test("N5 dq_distribution_drift: contingency counts reconcile, chi2 >= 0") {
    val df = run("dq_distribution_drift")
    val total = df.selectExpr("sum(n_early + n_late)").head().getLong(0)
    assert(total == Tables.events(spark, sf).count())
    assert(df.where("chi2_contrib < 0.0 OR expected_early <= 0.0").count() == 0)
    // expected_early values sum to the early grand total (chi-square law)
    val expSum = df.selectExpr("sum(expected_early)").head().getDouble(0)
    val early = df.selectExpr("sum(n_early)").head().getLong(0)
    assert(math.abs(expSum - early.toDouble) < 1e-6)
  }

  test("J14 arr_struct_sort: ends of the sorted struct array bound the group") {
    val df = run("arr_struct_sort")
    assert(df.where("min_price > max_price").count() == 0)
    assert(df.where("n_items = 1 AND min_price_line <> max_price_line").count() == 0)
    val total = df.selectExpr("sum(n_items)").head().getLong(0)
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("J18 vec_kmeans_lloyd: partition of the corpus, cohesion bounded") {
    val df = run("vec_kmeans_lloyd")
    // every vector lands in exactly one cell: sizes sum to the corpus
    val total = df.selectExpr("sum(n_vectors)").head().getLong(0)
    assert(total == Tables.embeddings(spark, sf).count())
    // mean within-cluster dot of roughly unit vectors stays in [-1, 1+eps]
    assert(df.where("mean_sim < -1.0 OR mean_sim > 1.1").count() == 0)
    assert(df.where("n_vectors <= 0").count() == 0)
  }

  test("M54 graph_knn_jaccard: scores in (0,1], common bounded by degrees") {
    val df = run("graph_knn_jaccard")
    assert(df.count() > 0)
    assert(df.where("jaccard <= 0.0 OR jaccard > 1.0").count() == 0)
    // wedge-join candidates share >= 1 neighbor by construction
    assert(df.where("n_common < 1").count() == 0)
    assert(df.where("u >= v").count() == 0, "canonical pair order")
  }

  test("M56 graph_degree_assortativity: coefficient within [-1, 1]") {
    val row = run("graph_degree_assortativity").head()
    val r = row.getDouble(row.fieldIndex("assortativity"))
    assert(r >= -1.0 && r <= 1.0)
    assert(row.getLong(row.fieldIndex("n_edges")) > 0)
  }

  test("L21 ts_changepoint_cusum: cusum consistent with exact cum/total") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = run("ts_changepoint_cusum")
    assert(df.count() == 5)
    // recompute the CUSUM from the full daily series and check the
    // reported rows agree (the top-5 cut is over |dev| in exact ints)
    val daily = Tables.events(spark, sf)
      .groupBy(expr("CAST(CAST(ts AS DATE) AS STRING)").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val n = daily.count()
    val tot = daily.selectExpr("sum(cnt)").head().getLong(0)
    val full = daily
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t", row_number().over(Window.orderBy("day")))
      .withColumn("cusum2",
        round((lit(n) * col("cum") - col("t") * lit(tot)).cast("double") / lit(n), 6))
    val bad = run("ts_changepoint_cusum").join(full, "day")
      .where("cusum <> cusum2 OR cum_events <> cum").count()
    assert(bad == 0)
  }

  test("N6 dq_benford_first_digit: digits 1-9, fractions sum to 1") {
    val df = run("dq_benford_first_digit")
    assert(df.where("digit < 1 OR digit > 9").count() == 0)
    val nTot = df.selectExpr("sum(n_orders)").head().getLong(0)
    assert(nTot == Tables.orders(spark, sf).count())
    // Benford expectation is a probability law: its nine masses sum to 1
    val expSum = df.selectExpr("sum(expected_frac)").head().getDouble(0)
    assert(math.abs(expSum - 1.0) < 1e-4)
  }

  test("N7 pipeline_observe_metrics: observed telemetry equals ground truth") {
    val r = run("pipeline_observe_metrics").head()
    val docs = Tables.documents(spark, sf)
    assert(r.getAs[Long]("n_seen") == docs.count())
    assert(r.getAs[Long]("chars_seen") ==
      docs.selectExpr("sum(n_chars)").head().getLong(0))
    // the gate only drops rows, and the kept token sum is positive
    assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_seen"))
    assert(r.getAs[Long]("n_kept") > 0 && r.getAs[Long]("tokens_kept") > 0)
    val frac = r.getAs[Double]("keep_frac")
    assert(frac > 0.0 && frac <= 1.0)
  }

  test("M55 pipeline_dataset_diff: statuses reconcile with the slice sizes") {
    val df = run("pipeline_dataset_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, sf)
    val nOld = docs.where("doc_id % 20 < 18").count()
    val nNew = docs.where("doc_id % 20 <> 0").count()
    // old = removed + changed + unchanged; new = added + changed + unchanged
    assert(df.getOrElse("removed", 0L) + df.getOrElse("changed", 0L) +
      df.getOrElse("unchanged", 0L) == nOld)
    assert(df.getOrElse("added", 0L) + df.getOrElse("changed", 0L) +
      df.getOrElse("unchanged", 0L) == nNew)
    // the simulated edit makes every surviving %7 doc 'changed'
    assert(df.getOrElse("changed", 0L) ==
      docs.where("doc_id % 20 < 18 AND doc_id % 20 <> 0 AND doc_id % 7 = 0").count())
  }
}
