package graft

class RelationalSpec extends SparkSpec {

  test("contract: every oracleSql key has a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("contract: only the declared exclusions lack an oracle (SURVEY §7.3)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("agg_approx_hll", "agg_hll_sketch_union",
      "agg_percentile_approx", "agg_tdigest", "dq_profile_approx",
      "mm_decode_features", "stream_watermark_late"),
      s"unexpected oracle-less queries: $noOracle")
  }

  test("A1 scan_filter_project: rows in range, revenue double on the wire") {
    val df = run("scan_filter_project")
    val n = df.count()
    assert(n > 0)
    // internal math is exact decimal (Cols.revenue); the wire type is DOUBLE
    // per the driver-portability protocol (VERDICT r1)
    assert(df.schema("revenue").dataType.typeName == "double")
    val dates = df.selectExpr("min(l_shipdate) AS lo", "max(l_shipdate) AS hi").head()
    assert(dates.getAs[java.time.LocalDateTime]("lo").getYear == 1996)
    assert(dates.getAs[java.time.LocalDateTime]("hi").getYear == 1996)
  }

  test("A2 source_events_ns: µs truncation of first event matches fixture") {
    val df = run("source_events_ns")
    // FIXTURES.md: events ts #0 = 2024-01-01 00:09:58.778549829 ns → …778549 µs
    val first = df.head()
    assert(first.getAs[Long]("ts_us") % 1000000 == 58778549L % 1000000)
    assert(df.count() == 1000)
  }

  test("A3 source_json_props: k is int, non-null") {
    val df = run("source_json_props")
    assert(df.where("k IS NULL").count() == 0)
    assert(df.schema("k").dataType.typeName == "integer")
  }

  test("B1 filter_complex_pred: predicate holds on every row") {
    val df = run("filter_complex_pred")
    assert(df.count() > 0)
    assert(df.where("o_orderpriority NOT IN ('1-URGENT','2-HIGH')").count() == 0)
  }

  test("B2 filter_null_semantics: n_disc + n_zero_disc == n_all") {
    val bad = run("filter_null_semantics")
      .where("n_disc + n_zero_disc <> n_all").count()
    assert(bad == 0)
  }

  test("C7 join_anti: exactly 27 childless orders at sf0.001") {
    assert(run("join_anti").count() == 27)
  }

  test("C4 join_left_outer: childless orders have n_items=0, qty_sum=0") {
    val df = run("join_left_outer")
    assert(df.where("n_items = 0").count() == 27)
    assert(df.where("n_items = 0 AND qty_sum <> 0").count() == 0)
    assert(df.count() == 1500) // all orders survive the left join
  }

  test("C6/C7 partition: semi + anti = all orders' customers") {
    val nSemi = run("join_semi").count()
    val cust = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(nSemi > 0 && nSemi <= cust)
  }

  test("C10 join_cross: 5 regions x 25 nations = 125") {
    assert(run("join_cross").count() == 125)
  }

  test("C2 join_broadcast_dim: plan uses BroadcastHashJoin") {
    val plan = run("join_broadcast_dim").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("G2 limit_topk: exactly 10 rows, descending") {
    val rows = run("limit_topk").collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("G3 topk_per_group: rn <= 2 everywhere") {
    assert(run("topk_per_group").where("rn > 2").count() == 0)
  }

  test("E1 agg_pricing_summary: 6 flag/status combos, exact decimal sum") {
    val df = run("agg_pricing_summary")
    assert(df.count() == 6)
  }

  test("salted join equals unsalted join row-for-row") {
    import org.apache.spark.sql.functions._
    val plain = Tables.lineitem(spark, sf)
      .select(when(col("l_linenumber") <= 5, 0L)
        .otherwise(col("l_orderkey") % 50).as("skew_key"), col("l_quantity"))
      .join(Tables.part(spark, sf).where(col("p_partkey") < 50)
        .select(col("p_partkey").as("skew_key"), col("p_retailprice")), Seq("skew_key"))
      .groupBy("skew_key").count()
    val salted = run("join_skew_salted").select("skew_key", "n")
    val diff = plain.withColumnRenamed("count", "n").exceptAll(salted).count()
    assert(diff == 0)
  }

  test("minhash custom aggregate equals 4-way min aggregation") {
    val a = run("dedup_minhash_sig")
    val b = run("dedup_minhash_sig_agg")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("E3 agg_multi_distinct: distinct counts bounded by dims") {
    val df = run("agg_multi_distinct")
    assert(df.where("n_parts > 200 OR n_supps > 10").count() == 0) // sf0.001 dims
  }
}
