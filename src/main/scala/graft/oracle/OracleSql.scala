package graft.oracle

/** DuckDB 1.0.0 oracle SQL, one val per query key (SURVEY §2, §5.3.6).
  *
  * Conventions:
  *  - Bare table names (the driver binds parquet to views). Fallback if the
  *    driver binds paths instead: replace `FROM <t>` with
  *    `FROM read_parquet('<sfDir>/<t>.parquet')`.
  *  - events.ts is TIMESTAMP_NS in DuckDB; every oracle goes through the
  *    `ev` CTE which truncates to µs — mirroring Tables.events exactly.
  *  - Engine-semantics deltas are encoded here in SQL, not prose:
  *    dayofweek+1 (I2), ASOF JOIN (C9), generate_subscripts (J5), islands
  *    sessions (L3), slide-offset windows (L2).
  */
object OracleSql {

  /** Shared events-normalizing CTE prefix (ns → µs truncation). */
  val EV: String =
    "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, " +
      "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, user_id, event_type, " +
      "value, props FROM events) "

  val all: Map[String, String] = Map(
    "scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS revenue,
        |l_shipdate FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |AND l_shipdate < TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin.replace("\n", " "),

    "source_events_ns" ->
      (EV + "SELECT event_id, ts_us, event_type, value FROM ev ORDER BY event_id"),

    "source_json_props" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin.replace("\n", " "),

    "filter_complex_pred" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '5-LOW')
        |AND (o_totalprice BETWEEN 50000.0 AND 150000.0 OR o_orderstatus = 'F')
        |AND o_orderpriority NOT LIKE '5-%'
        |ORDER BY o_orderkey""".stripMargin.replace("\n", " "),

    "filter_null_semantics" ->
      """SELECT l_returnflag,
        |COUNT(*) AS n_all,
        |COUNT(NULLIF(l_discount, 0.0)) AS n_disc,
        |SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS n_zero_disc,
        |CAST(SUM(CAST(COALESCE(NULLIF(l_discount, 0.0), -1.0) AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS disc_sum
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin.replace("\n", " "),

    // ── joins ──
    "join_inner_equi" ->
      """SELECT c_custkey, c_name, COUNT(*) AS n_orders,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total_spent
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin.replace("\n", " "),

    "join_broadcast_dim" ->
      """SELECT p_brand,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS revenue,
        |COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin.replace("\n", " "),

    "join_multiway_star" ->
      """SELECT n_name,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS revenue,
        |COUNT(*) AS n_items
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE r_name = 'ASIA'
        |AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin.replace("\n", " "),

    "join_left_outer" ->
      """SELECT o_orderkey, COUNT(l_linenumber) AS n_items,
        |CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(12,2))), 0) AS DECIMAL(18,2)) AS qty_sum
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin.replace("\n", " "),

    "join_full_outer" ->
      """SELECT c_custkey, s_suppkey, c_nationkey, s_nationkey
        |FROM customer FULL OUTER JOIN supplier ON c_nationkey = s_nationkey
        |ORDER BY c_custkey ASC NULLS FIRST, s_suppkey ASC NULLS FIRST""".stripMargin.replace("\n", " "),

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin.replace("\n", " "),

    "join_anti" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin.replace("\n", " "),

    "join_cross" ->
      """SELECT r_regionkey, n_nationkey, r_name || '-' || n_name AS label
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin.replace("\n", " "),

    // ── aggregations ──
    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS sum_disc_price,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DECIMAL(18,6)) AS sum_charge,
        |ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity), 6) AS avg_qty,
        |ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice), 6) AS avg_price,
        |ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_discount), 6) AS avg_disc,
        |COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("\n", " "),

    "agg_count_distinct" ->
      """SELECT n_name, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name HAVING COUNT(*) > 10
        |ORDER BY n_name""".stripMargin.replace("\n", " "),

    "agg_multi_distinct" ->
      """SELECT l_returnflag,
        |COUNT(DISTINCT l_partkey) AS n_parts,
        |COUNT(DISTINCT l_suppkey) AS n_supps,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin.replace("\n", " "),

    // ── sort / limit / top-k ──
    "sort_multi_nulls" ->
      """SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_n, o_totalprice
        |FROM orders
        |ORDER BY status_n ASC NULLS FIRST, o_totalprice DESC, o_orderkey""".stripMargin.replace("\n", " "),

    "limit_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin.replace("\n", " "),

    "topk_per_group" ->
      """SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders) t WHERE rn <= 2
        |ORDER BY o_custkey, rn""".stripMargin.replace("\n", " "),

    // ── window functions ──
    "win_rank_topn" ->
      """SELECT * FROM (SELECT c_nationkey, c_custkey, c_acctbal,
        |ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk
        |FROM customer WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)) t
        |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin.replace("\n", " "),

    "win_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey
        |ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin.replace("\n", " "),

    "win_lead_lag" ->
      (EV + """SELECT user_id, event_id, ts_us, event_type,
        |ts_us - LAG(ts_us) OVER w AS gap_us,
        |LEAD(event_type) OVER w AS next_type
        |FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, ts_us, event_id""".stripMargin.replace("\n", " ")),

    "win_range_frame" ->
      (EV + """SELECT user_id, event_id, ts_us,
        |CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts_us
        |RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS sum_1h
        |FROM ev ORDER BY user_id, ts_us, event_id""".stripMargin.replace("\n", " ")),

    "win_ntile_pct" ->
      """SELECT c_custkey, c_acctbal,
        |NTILE(4) OVER w AS quartile,
        |ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
        |ROUND(CUME_DIST() OVER w, 6) AS cume
        |FROM customer WINDOW w AS (ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin.replace("\n", " "),

    "win_first_last" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |FIRST_VALUE(c_acctbal) OVER w AS top_bal,
        |LAST_VALUE(c_acctbal) OVER w AS bottom_bal,
        |CAST(CAST(FIRST_VALUE(c_acctbal) OVER w AS DECIMAL(12,2)) - CAST(c_acctbal AS DECIMAL(12,2)) AS DECIMAL(18,2)) AS spread
        |FROM customer WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
        |ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_nationkey, c_acctbal DESC, c_custkey""".stripMargin.replace("\n", " "),

    // ── grouping analytics / stats / pivot ──
    "agg_rollup" ->
      """SELECT r_name, n_name,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS revenue,
        |COUNT(*) AS n_orders,
        |CAST(GROUPING(r_name) AS INT) AS g_r, CAST(GROUPING(n_name) AS INT) AS g_n
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin.replace("\n", " "),

    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin.replace("\n", " "),

    // NOTE: runs verbatim in BOTH Spark and DuckDB (shared text, see E6).
    "agg_grouping_sets" ->
      """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS bal_sum
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        |ORDER BY c_mktsegment ASC NULLS FIRST, c_nationkey ASC NULLS FIRST""".stripMargin.replace("\n", " "),

    "agg_stats" ->
      """SELECT l_returnflag,
        |ROUND(STDDEV_SAMP(l_extendedprice), 6) AS sd_price,
        |ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
        |ROUND(CORR(l_extendedprice, l_quantity), 6) AS corr_pq,
        |ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 6) AS cov_pq
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", " "),

    "agg_collect_sorted" ->
      """SELECT l_orderkey, list_sort(list(l_linenumber)) AS linenumbers
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin.replace("\n", " "),

    "pivot_event_type" ->
      """SELECT user_id,
        |COUNT(*) FILTER (WHERE event_type = 'view') AS "view",
        |COUNT(*) FILTER (WHERE event_type = 'click') AS "click",
        |COUNT(*) FILTER (WHERE event_type = 'purchase') AS "purchase",
        |COUNT(*) FILTER (WHERE event_type = 'signup') AS "signup",
        |COUNT(*) FILTER (WHERE event_type = 'error') AS "error"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin.replace("\n", " "),

    // ── set operations ──
    "set_union_all_distinct" ->
      """SELECT 'all' AS tag, c_nationkey AS nationkey FROM customer
        |UNION ALL SELECT 'all', s_nationkey FROM supplier
        |UNION ALL (SELECT 'dist' AS tag, nationkey FROM
        |(SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier) u)
        |ORDER BY tag, nationkey""".stripMargin.replace("\n", " "),

    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin.replace("\n", " "),

    "set_except_all" ->
      """SELECT 'except' AS tag, l_orderkey, l_linenumber FROM
        |((SELECT l_orderkey, l_linenumber FROM lineitem) EXCEPT ALL
        |(SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity > 25)) e
        |UNION ALL
        |SELECT 'intersect' AS tag, l_orderkey, l_linenumber FROM
        |((SELECT l_orderkey, l_linenumber FROM lineitem) INTERSECT ALL
        |(SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity > 25)) i
        |ORDER BY tag, l_orderkey, l_linenumber""".stripMargin.replace("\n", " "),

    // ── subqueries / CTE (shared text: runs verbatim in BOTH engines) ──
    "subquery_scalar_uncorr" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM customer)
        |ORDER BY c_custkey""".stripMargin.replace("\n", " "),

    "subquery_correlated" ->
      """SELECT p_partkey, p_brand, p_retailprice FROM part p
        |WHERE p_retailprice > (SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        |FROM part p2 WHERE p2.p_brand = p.p_brand)
        |ORDER BY p_partkey""".stripMargin.replace("\n", " "),

    "cte_reuse" ->
      """WITH rev AS (SELECT l_suppkey,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS total_rev
        |FROM lineitem GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin.replace("\n", " "),

    // ── scalar function suites ──
    "fn_string_suite" ->
      """SELECT p_partkey,
        |upper(p_name) AS up, lower(p_brand) AS lo,
        |substring(p_name, 1, 5) AS sub5,
        |trim('  ' || p_name || '  ') AS trimmed,
        |lpad(p_brand, 10, '*') AS lpadded,
        |concat_ws('/', p_name, p_type) AS joined,
        |replace(p_name, 'a', '@') AS replaced,
        |CAST(length(p_name) AS INT) AS len,
        |CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
        |regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
        |translate(p_type, 'AEIOU', 'aeiou') AS translated
        |FROM part ORDER BY p_partkey""".stripMargin.replace("\n", " "),

    "fn_date_suite" ->
      """SELECT o_orderkey, o_orderdate,
        |CAST(year(o_orderdate) AS INT) AS y,
        |CAST(month(o_orderdate) AS INT) AS m,
        |CAST(day(o_orderdate) AS INT) AS d,
        |CAST(quarter(o_orderdate) AS INT) AS q,
        |date_trunc('month', o_orderdate) AS month_start,
        |o_orderdate + INTERVAL 30 DAY AS plus30,
        |CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_2000,
        |CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow
        |FROM orders ORDER BY o_orderkey""".stripMargin.replace("\n", " "),

    "fn_math_suite" ->
      """SELECT l_orderkey, l_linenumber,
        |round(sqrt(l_extendedprice), 6) AS sqrt_p,
        |round(ln(l_extendedprice), 6) AS ln_p,
        |round(log10(l_extendedprice), 6) AS log10_p,
        |round(pow(l_quantity, 2), 6) AS qty_sq,
        |CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
        |CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
        |round(abs(l_discount - 0.05), 6) AS abs_d,
        |l_quantity % 7 AS qty_mod7,
        |CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin.replace("\n", " "),

    "fn_conditional" ->
      """SELECT o_orderkey,
        |CASE WHEN o_totalprice < 50000 THEN 'low'
        |WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END AS tier,
        |COALESCE(NULLIF(o_orderstatus, 'O'), 'X') AS status_x,
        |greatest(o_totalprice, 100000.0) AS gmax,
        |least(o_totalprice, 100000.0) AS lmin
        |FROM orders ORDER BY o_orderkey""".stripMargin.replace("\n", " "),

    "fn_cast_decimal" ->
      """SELECT o_orderkey,
        |CAST(o_totalprice AS DECIMAL(12,2)) AS price_dec,
        |CAST(o_custkey AS VARCHAR) AS cust_str,
        |CAST(TRIM('  42 ') AS INT) AS answer,
        |CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 2 AS DECIMAL(18,2)) AS doubled,
        |CAST(CAST(o_totalprice AS DECIMAL(12,2)) + CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(18,2)) AS summed
        |FROM orders ORDER BY o_orderkey""".stripMargin.replace("\n", " "),

    "fn_hash_md5" ->
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256,
        |substring(md5(text), 1, 2) AS prefix
        |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "fn_json_suite" ->
      """WITH j AS (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
        |SELECT k % 10 AS bucket, COUNT(*) AS n, MIN(k) AS min_k, MAX(k) AS max_k
        |FROM j GROUP BY bucket ORDER BY bucket""".stripMargin.replace("\n", " "),

    // ── UDF / UDAF ──
    "udf_score" ->
      """SELECT o_orderkey, o_totalprice,
        |round(1.0 / (1.0 + exp(-(o_totalprice - 100000.0) / 50000.0)), 6) AS score
        |FROM orders ORDER BY o_orderkey""".stripMargin.replace("\n", " "),

    "udaf_weighted_avg" ->
      """SELECT p_brand,
        |round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |/ CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 6) AS wavg_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin.replace("\n", " "),
  )
}
