package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core: scans/sources (SURVEY §2.A), projections/filters (§2.B),
  * joins (§2.C), sort/limit/top-k (§2.G), set ops (§2.H).
  *
  * Determinism protocol (SURVEY §5.3): every query ends in a total ORDER BY
  * whose suffix is a unique key; money math is DECIMAL(18,2) cast *before*
  * aggregation; events timestamps come only from Tables.events (ns→µs).
  */
object Relational {

  /** A1 — lineitem scan with shipdate range predicate + computed revenue.
    * Exercises parquet predicate pushdown + column pruning: the filter and
    * the 5-column projection both reach the vectorized parquet reader.
    */
  def scanFilterProject(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
             col("l_shipdate") <  lit("1997-01-01").cast("timestamp_ntz"))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        Cols.revenue.as("revenue"),
        col("l_shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** A2 — events source with ns→µs normalization (the only legal way to
    * read the ns-precision parquet; see Tables.events).
    */
  def sourceEventsNs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts_us"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  /** A3 — JSON prop extraction: `props` = `{"k": <int>}` → typed INT. */
  def sourceJsonProps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy(col("event_id"))

  /** B1 — compound boolean predicate: isin / between / like / negation. */
  def filterComplexPred(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH", "5-LOW") &&
             (col("o_totalprice").between(50000.0, 150000.0) ||
              col("o_orderstatus") === "F") &&
             !col("o_orderpriority").like("5-%"))
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderpriority"))
      .orderBy(col("o_orderkey"))

  /** B2 — 3-valued logic: NULLIF/COALESCE, null-skipping COUNT vs COUNT(*). */
  def filterNullSemantics(spark: SparkSession, sfDir: String): DataFrame = {
    val disc = nullif(col("l_discount"), lit(0.0))
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_all"),
        count(disc).as("n_disc"),
        sum(when(disc.isNull, 1).otherwise(0)).as("n_zero_disc"),
        sum(coalesce(disc, lit(-1.0)).cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("disc_sum"))
      .orderBy(col("l_returnflag"))
  }
}
