package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composite WORKLOAD queries (SURVEY §2.W): classic decision-support
  * shapes that exercise the whole optimizer path at once — selective
  * dimension filters, multi-join chains, grouped decimal aggregation,
  * ordered top-k — the way a real analytics user strings this library's
  * operators together. Each is the canonical public TPC-H query shape
  * re-expressed on this corpus with the repo's exact-decimal money
  * protocol ([[Cols]]), so every revenue sort is over exact DECIMAL
  * values (deterministic top-k, no float-order hazard).
  *
  * 100 TB: all joins are keyed equi-joins Catalyst reorders freely;
  * dimension sides (region/nation/customer-filtered) broadcast under AQE,
  * the fact-side filters (date ranges, returnflag, mktsegment) push into
  * the parquet scans, and each query ends in one keyed hash agg + bounded
  * TakeOrdered — nothing global, nothing unbounded.
  */
object Workload {

  /** W1 wk_q3_shipping_priority — the Q3 shape: revenue of unshipped
    * BUILDING-segment orders as of a cutoff, top-10 by exact decimal
    * revenue.
    */
  def q3ShippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = lit("1998-03-15").cast("timestamp_ntz")
    Tables.customer(spark, sfDir).where(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, sfDir), col("c_custkey") === col("o_custkey"))
      .where(col("o_orderdate") < cutoff)
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") > cutoff)
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(Cols.revenue).as("rev"))
      .orderBy(desc("rev"), asc("o_orderdate"), asc("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("rev").cast("double").as("revenue"),
        col("o_orderdate"), col("o_orderpriority"))
  }

  /** W2 wk_q5_region_volume — the Q5 shape: 1996 revenue by nation for
    * ASIA orders where customer and supplier share the nation (the
    * "local supplier volume" 6-table star).
    */
  def q5RegionVolume(spark: SparkSession, sfDir: String): DataFrame =
    Tables.region(spark, sfDir).where(col("r_name") === "ASIA")
      .join(Tables.nation(spark, sfDir), col("n_regionkey") === col("r_regionkey"))
      .join(Tables.supplier(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.lineitem(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
      .join(Tables.customer(spark, sfDir),
        col("c_custkey") === col("o_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(Cols.revenue).as("rev"))
      .orderBy(desc("rev"), asc("n_name"))
      .select(col("n_name"), col("rev").cast("double").as("revenue"))

  /** W3 wk_q10_returns — the Q10 shape: top-20 customers by revenue of
    * RETURNED items in 1997Q1, with their nation.
    */
  def q10Returns(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("c_custkey") === col("o_custkey"))
      .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp_ntz"))
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_returnflag") === "R")
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(Cols.revenue).as("rev"))
      .orderBy(desc("rev"), asc("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"),
        col("rev").cast("double").as("revenue"), col("c_acctbal"), col("n_name"))

  /** M45 pipeline_dataset_card — the one-scan corpus summary a dataset
    * card leads with: doc/lang/source counts, char and token totals,
    * short-doc share. Two exact count-distincts over low-cardinality
    * columns (Expand ×3 — bounded, cf. N1's documented cost model);
    * everything else folds in the same single pass. The mean is one
    * division over exact integer sums — raw double, bit-equal.
    */
  def datasetCard(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("total_chars"),
        sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"),
        count(when(col("n_chars") < 100, 1)).as("n_short"))
      .select(col("n_docs"), col("n_langs"), col("n_sources"),
        col("total_chars"), col("total_tokens"), col("n_short"),
        (col("total_chars").cast("double") / col("n_docs")).as("mean_chars"))
}
