package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregations (SURVEY §2.E): hash aggregates with partial (map-side)
  * combine, multi-distinct expansion, rollup/cube/grouping-sets, stats,
  * sorted array agg, approx sketches, pivot.
  *
  * All money math follows the exact-decimal protocol in [[Cols]]; averages
  * are one double division of an exact decimal sum, rounded to 6 dp.
  */
object Aggregates {

  /** E1 — TPC-H Q1 pricing summary: the canonical partial+final hash agg. */
  def aggPricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") <= lit("2000-12-01").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(Cols.dec2(col("l_quantity"))).cast("decimal(18,2)").as("sum_qty"),
        sum(Cols.dec2(col("l_extendedprice"))).cast("decimal(18,2)").as("sum_base_price"),
        sum(Cols.revenue).cast("decimal(18,4)").as("sum_disc_price"),
        sum(Cols.charge).cast("decimal(18,6)").as("sum_charge"),
        Cols.avg6(col("l_quantity")).as("avg_qty"),
        Cols.avg6(col("l_extendedprice")).as("avg_price"),
        Cols.avg6(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** E2 — COUNT(DISTINCT) per nation with a post-aggregation HAVING. */
  def aggCountDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .where(col("n_orders") > 10)
      .orderBy(col("n_name"))

  /** E3 — multiple DISTINCT aggregates in one group-by (Expand-based). */
  def aggMultiDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        sum(Cols.dec2(col("l_quantity"))).cast("decimal(18,2)").as("sum_qty"))
      .orderBy(col("l_returnflag"))
}
