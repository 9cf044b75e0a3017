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
  )
}
