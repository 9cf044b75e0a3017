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

  /** W4 wk_q4_order_priority — the Q4 shape: priority-bucket counts of
    * 1997Q1 orders having at least one SLOW line. The fixture carries no
    * commit/receipt dates, so "late" is adapted to ship lag: a line
    * shipped more than 60 days after the order date. The EXISTS compiles
    * to ONE left-semi hash join on the order key with the lag predicate
    * as a join residual — each order is emitted at most once no matter
    * how many slow lines it has, and the quarter filter pushes into the
    * orders scan before the join.
    */
  def q4OrderPriority(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp_ntz"))
      .join(Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  /** W5 wk_q7_region_trade — the Q7 shape lifted to regions: bilateral
    * shipping volume between ASIA and EUROPE (either direction) by ship
    * year, 1996–1997. Lifted because the fixture's 25 synthetic nations
    * make any single nation PAIR empty at sf0.001 — region granularity
    * keeps the two-sided-trade semantics non-degenerate at every SF.
    * Both region dims are pre-filtered to the two names, so only the
    * cross-region inequality remains as a post-join residual.
    */
  def q7RegionTrade(spark: SparkSession, sfDir: String): DataFrame = {
    val nations = Tables.nation(spark, sfDir)
    val regions = Tables.region(spark, sfDir).where(col("r_name").isin("ASIA", "EUROPE"))
    val suppNation = Tables.supplier(spark, sfDir)
      .join(nations.select(col("n_nationkey").as("sn_key"), col("n_regionkey").as("sr_key")),
        col("s_nationkey") === col("sn_key"))
      .join(regions.select(col("r_regionkey").as("sr_key2"), col("r_name").as("supp_region")),
        col("sr_key") === col("sr_key2"))
    val custNation = Tables.customer(spark, sfDir)
      .join(nations.select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cr_key")),
        col("c_nationkey") === col("cn_key"))
      .join(regions.select(col("r_regionkey").as("cr_key2"), col("r_name").as("cust_region")),
        col("cr_key") === col("cr_key2"))
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
      .join(Tables.orders(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .join(custNation, col("c_custkey") === col("o_custkey"))
      .join(suppNation, col("s_suppkey") === col("l_suppkey"))
      .where(col("supp_region") =!= col("cust_region"))
      .groupBy(col("supp_region"), col("cust_region"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(Cols.revenue).as("rev"))
      .orderBy(col("supp_region"), col("cust_region"), col("l_year"))
      .select(col("supp_region"), col("cust_region"), col("l_year"),
        col("rev").cast("double").as("revenue"))
  }

  /** W6 wk_q8_market_share — the Q8 shape: of all ECONOMY-type revenue
    * sold to ASIA customers, the share supplied by NATION_3, per order
    * year. Both the numerator and denominator are exact decimal sums; the
    * single double division happens once per year row and is rounded to
    * 6 dp (the [[Cols]] protocol for irreducible float outputs).
    */
  def q8MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val asiaNations = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val suppNation = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).where(col("p_type") === "ECONOMY"),
        col("p_partkey") === col("l_partkey"))
      .join(Tables.orders(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, sfDir), col("c_custkey") === col("o_custkey"))
      .join(asiaNations, col("c_nationkey") === col("cn_key"), "left_semi")
      .join(suppNation, col("s_suppkey") === col("l_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", Cols.revenue)
          .otherwise(lit(0).cast("decimal(18,4)"))).as("nat_rev"),
        sum(Cols.revenue).as("tot_rev"))
      .select(col("o_year"),
        (round(col("nat_rev").cast("double") / col("tot_rev").cast("double"), 6)
          + lit(0.0)).as("mkt_share"),
        col("tot_rev").cast("double").as("total_revenue"))
      .orderBy(col("o_year"))
  }

  /** W7 wk_q14_promo_share — the Q14 shape: the percentage of September
    * 1997 revenue coming from PROMO-type parts; one output row. The part
    * dim broadcasts; the month filter pushes into the lineitem scan; both
    * revenue sums are exact decimals with one rounded double division.
    */
  def q14PromoShare(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1997-09-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp_ntz"))
      .join(Tables.part(spark, sfDir), col("p_partkey") === col("l_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", Cols.revenue)
          .otherwise(lit(0).cast("decimal(18,4)"))).as("promo"),
        sum(Cols.revenue).as("total"))
      .select(
        (round(lit(100.0) * col("promo").cast("double") / col("total").cast("double"), 6)
          + lit(0.0)).as("promo_share_pct"),
        col("promo").cast("double").as("promo_revenue"),
        col("total").cast("double").as("total_revenue"))

  /** W8 wk_q18_large_orders — the Q18 shape: the top-10 largest orders by
    * total price among orders whose line quantities sum past 300, with
    * the owning customer. The HAVING pre-aggregates lineitem to one row
    * per order BEFORE any join (map-side partial agg applies), so the
    * joins only ever see the tiny survivor set; the top-k is a bounded
    * TakeOrdered. Quantities are small integers stored as doubles — their
    * sums are exact in both engines.
    */
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .where(col("sum_qty") > 300)
    Tables.orders(spark, sfDir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, sfDir), col("c_custkey") === col("o_custkey"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
  }

  /** W9 wk_q22_lapsed_customers — the Q22 shape adapted to this corpus:
    * per nation, the count and held balance of LAPSED wealthy customers —
    * above-average positive account balance but no order since 2000-06-01
    * ("no orders at all" is empty below sf0.1: every customer has early
    * orders). The above-average test is EXACT integer-domain arithmetic:
    * `bal * n_pos > total_pos` with 2-dp decimals, so no engine ever
    * rounds an average — the [[Cols]] protocol applied to a threshold.
    * The anti join runs on the date-filtered orders slice (pushed scan);
    * the 1-row threshold relation broadcasts.
    */
  def q22LapsedCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val thresh = cust.where(col("c_acctbal") > 0)
      .agg(count(lit(1)).as("n_pos"),
        sum(Cols.dec2(col("c_acctbal"))).as("tot_pos"))
    val recent = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit("2000-06-01").cast("timestamp_ntz"))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(thresh))
      .where(Cols.dec2(col("c_acctbal")) * col("n_pos") > col("tot_pos"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_lapsed"),
        sum(Cols.dec2(col("c_acctbal"))).cast("double").as("total_bal"))
      .orderBy(col("c_nationkey"))
  }
}
