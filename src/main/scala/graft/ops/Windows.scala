package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY §2.F). Every window ORDER BY carries a unique
  * tie-breaker (§5.3.4); frames are always explicit because default frames
  * differ across engines.
  *
  * 100 TB note: all windows except F5 partition by a key (nation / customer /
  * user), so state is bounded per key and the shuffle is a single hash
  * exchange on that key. F5 is a deliberately global window — at scale that
  * becomes a range-partitioned global sort (documented there).
  */
object Windows {

  /** F1 — ranking trio per nation, top-3 kept. */
  def winRankTopn(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .where(col("rn") <= 3)
      .orderBy(col("c_nationkey"), col("rn"))
  }

  /** F2 — running total per customer, explicit ROWS frame, exact decimal. */
  def winRunningTotal(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        Cols.dec2(col("o_totalprice")).as("price2"))
      .withColumn("running_total",
        sum(col("price2")).over(w).cast("double"))
      .drop("price2")
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** F3 — lag/lead per user: inter-event gap (exact µs long) + next type. */
  def winLeadLag(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(w))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }

  /** F4 — trailing-1h moving sum via numeric RANGE frame on epoch-µs.
    * Numeric range frames are cross-engine-safe; interval frames are not.
    */
  def winRangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        Cols.dec2(col("value")).as("value2"))
      .withColumn("sum_1h", sum(col("value2")).over(w).cast("double"))
      .drop("value2")
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }

  /** F5 — ntile / percent_rank / cume_dist over a single global window.
    * 100 TB note: an unpartitioned window is a global sort; Spark plans it
    * as one partition, so at scale this shape must be fed by a
    * range-partitioned sort or pre-bucketed quantiles (approxQuantile).
    * Kept here because the *semantics* (quartiles over the whole relation)
    * are the contract.
    */
  def winNtilePct(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .orderBy(col("c_custkey"))
  }

  /** F6 — first/last over an explicit full-partition frame; spread in
    * exact decimal.
    */
  def winFirstLast(spark: SparkSession, sfDir: String): DataFrame = {
    val wFull = Window.partitionBy(col("c_nationkey"))
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      .withColumn("top_bal", first(col("c_acctbal")).over(wFull))
      .withColumn("bottom_bal", last(col("c_acctbal")).over(wFull))
      .withColumn("spread",
        (Cols.dec2(col("top_bal")) - Cols.dec2(col("c_acctbal")))
          .cast("double"))
      .orderBy(col("c_nationkey"), desc("c_acctbal"), asc("c_custkey"))
  }
}
