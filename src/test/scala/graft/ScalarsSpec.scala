package graft

class ScalarsSpec extends SparkSpec {

  test("I1 fn_string_suite: trimmed round-trips, brand_num is digits") {
    val df = run("fn_string_suite")
    assert(df.where("trimmed LIKE ' %' OR trimmed LIKE '% '").count() == 0)
    assert(df.where("brand_num NOT RLIKE '^[0-9]+$'").count() == 0)
    assert(df.where("n_words < 1").count() == 0)
  }

  test("I2 fn_date_suite: dow in 1..7, quarter consistent with month") {
    val df = run("fn_date_suite")
    assert(df.where("dow < 1 OR dow > 7").count() == 0)
    assert(df.where("q <> cast((m + 2) / 3 as int)").count() == 0)
  }

  test("I3 fn_math_suite: floor <= ceil, mod in range") {
    val df = run("fn_math_suite")
    assert(df.where("floor_p > ceil_p").count() == 0)
    assert(df.where("qty_mod7 < 0 OR qty_mod7 >= 7").count() == 0)
  }

  test("I6 fn_hash_md5: 32/64 hex chars, prefix matches") {
    val df = run("fn_hash_md5")
    assert(df.where("length(h_md5) <> 32 OR length(h_sha256) <> 64").count() == 0)
    assert(df.where("substring(h_md5, 1, 2) <> prefix").count() == 0)
  }

  test("K1 udf_score: logistic in (0,1), monotone in price") {
    val df = run("udf_score")
    assert(df.where("score <= 0 OR score >= 1").count() == 0)
  }

  test("K1v2 expr_score_native: matches the UDF version, no ScalaUDF in plan") {
    val native = run("expr_score_native")
    val plan = native.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), "native expression must not plan a UDF")
    val bad = native.alias("n")
      .join(run("udf_score").alias("u"), "o_orderkey")
      .where("n.score <> u.score").count()
    assert(bad == 0, "native and UDF logistic scores must agree")
  }

  test("K1v2 GraftExtensions: injectFunction registers graft_logistic") {
    val ext = new graft.functions.GraftExtensions
    // smoke: applying the extension to a builder-created session would
    // register the function; here we verify the registry path directly.
    graft.functions.LogisticScore.register(spark)
    val r = spark.sql("SELECT round(graft_logistic(100000.0), 6) AS s").head().getDouble(0)
    assert(r == 0.5)
    assert(ext != null)
  }

  test("A10 graft_zorder16: codegen matches reference interleave; buckets are local in BOTH dims") {
    graft.functions.ZOrder16.register(spark)
    // 1. generated Java ≡ the Scala reference implementation, all rows
    val mism = Tables.lineitem(spark, sf)
      .selectExpr("l_partkey % 65536 AS a", "l_suppkey % 65536 AS b",
        "graft_zorder16(l_partkey % 65536, l_suppkey % 65536) AS z")
      .collect()
      .count(r => r.getLong(2) !=
        graft.functions.ZOrder16.interleave(r.getLong(0), r.getLong(1)))
    assert(mism == 0, "codegen'd interleave disagrees with reference")
    // 2. the point of z-order: every curve bucket spans a BOUNDED range of
    // each dimension (z>>24 fixes the top 4 partkey bits and top 4 suppkey
    // bits → spans < 2^12 and 2^12 resp. — here suppkey's domain is tiny,
    // so assert the partkey span, the pruning dimension)
    val bad = run("layout_zorder_stats")
      .where("max_part - min_part >= 4096").count()
    assert(bad == 0, "a z-bucket spans more than 2^12 partkeys")
  }

  test("K2 udaf_weighted_avg: bounded by min/max price per brand") {
    val w = run("udaf_weighted_avg")
    val bounds = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf),
        org.apache.spark.sql.functions.col("l_partkey") ===
          org.apache.spark.sql.functions.col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        org.apache.spark.sql.functions.min("l_extendedprice").as("lo"),
        org.apache.spark.sql.functions.max("l_extendedprice").as("hi"))
    val bad = w.join(bounds, "p_brand")
      .where("wavg_price < lo OR wavg_price > hi").count()
    assert(bad == 0)
  }
}
