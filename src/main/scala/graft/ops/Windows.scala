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

  /** F5 — ntile / percent_rank / cume_dist over the whole relation.
    *
    * PRIMARY PATH IS THE SCALABLE FORM (VERDICT r6 #3): the contract entry
    * computes through [[GlobalRank]]'s two-pass range-partitioned rank —
    * the plan a user should copy — because at 100 TB the naive
    * `Window.orderBy(...)` global window is a one-partition sort. The
    * naive form survives only as [[ntileGlobalWindowBaseline]], the
    * spec-side equality cross-check (PlanSpec proves the two forms
    * row-identical at test SF).
    */
  def winNtilePct(spark: SparkSession, sfDir: String): DataFrame =
    winNtileScalable(spark, sfDir)

  /** The textbook one-partition global-window form of F5 — SPEC-ONLY
    * baseline (not a registry entry since round 7): semantically the
    * definition of quartile/percent_rank/cume_dist, physically the shape
    * that cannot scale. PlanSpec cross-checks [[winNtilePct]] against it.
    */
  private[graft] def ntileGlobalWindowBaseline(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .orderBy(col("c_custkey"))
  }

  /** F5 v2 — the SAME quartile/percent_rank/cume_dist semantics as
    * win_ntile_pct, but computed without a single-partition global window —
    * the 100 TB path (the same exact-vs-scalable pairing as J3 vs M5/M15).
    *
    * Two-pass range-partitioned algorithm:
    *   1. `repartitionByRange` on the sort key → globally ordered partition
    *      ranges, each ranked locally in parallel.
    *   2. Per-partition row counts (one tiny row per partition) are turned
    *      into prefix offsets; global_rank = offset(part) + local_rank.
    *   3. ntile/percent_rank/cume_dist are closed-form in (global_rank, N)
    *      because the order key carries a unique tie-breaker (§5.3.4):
    *      rank == row_number, so pct = (rn-1)/(N-1), cume = rn/N, and
    *      ntile(k) gives the first N mod k buckets ceil(N/k) rows.
    *
    * The only unpartitioned windows run over the P-row partition summary —
    * bounded by partition count, not data size. Oracle: identical SQL to
    * win_ntile_pct (DuckDB computes the global window directly).
    */
  def winNtileScalable(spark: SparkSession, sfDir: String): DataFrame = {
    val parts = 8 // ≥ 2 proves the scale shape at test SF; O(cores) on a cluster
    // Two-pass rank + persist rationale: see [[GlobalRank.withGlobalRowNumber]].
    GlobalRank.withGlobalRowNumber(
      Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_acctbal")),
      parts, col("c_acctbal"), col("c_custkey"))
      .withColumn("quartile", GlobalRank.ntileExpr(4))
      .withColumn("pct_rank",
        // single-row input: (rn-1)/(N-1) = 0/0 = NaN, but PERCENT_RANK()
        // (and the shared oracle) defines it as 0 (ADVICE r2)
        when(col("n_total") === 1, 0.0)
          .otherwise(round((col("rn") - 1).cast("double") / (col("n_total") - 1), 6)))
      .withColumn("cume", round(col("rn").cast("double") / col("n_total"), 6))
      .select(col("c_custkey"), col("c_acctbal"), col("quartile"),
        col("pct_rank"), col("cume"))
      .orderBy(col("c_custkey"))
  }

  /** F7 — offset/positional window extras: nth_value over the explicit
    * full-partition frame, lag/lead with explicit defaults (no implicit
    * NULL at partition edges).
    */
  def winNthValue(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      .withColumn("second_bal", nth_value(col("c_acctbal"), 2).over(wFull))
      .withColumn("third_bal", nth_value(col("c_acctbal"), 3).over(wFull))
      .withColumn("prev2_bal", lag(col("c_acctbal"), 2, -1.0).over(w))
      .withColumn("next2_bal", lead(col("c_acctbal"), 2, -1.0).over(w))
      .orderBy(col("c_nationkey"), desc("c_acctbal"), asc("c_custkey"))
  }

  /** F11 — rolling 7-day revenue: RANGE frame over epoch-day integers on
    * the DAY-level aggregate (dimension-sized — the fact table never
    * enters a window). RANGE, not ROWS: missing days must still shrink
    * the trailing window, which a row frame would silently ignore.
    * Denominated in exact decimal; the division to double happens last.
    */
  def winRolling7d(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = graft.Tables.orders(spark, sfDir)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).as("d"))
      .agg(sum(Cols.dec2(col("o_totalprice"))).as("rev_dec"),
        count(lit(1)).as("n_orders"))
    val w7 = Window.orderBy(col("d")).rangeBetween(-6, 0)
    daily
      .withColumn("rev_7d", sum(col("rev_dec")).over(w7).cast("double"))
      .withColumn("n_7d", sum(col("n_orders")).over(w7))
      .select(col("d"), col("rev_dec").cast("double").as("revenue"),
        col("rev_7d"), col("n_7d"))
      .orderBy(col("d"))
  }

  /** F10 — ratio-to-report: each nation's revenue share within its region
    * and of the whole ledger. Both windows run over the 25-row
    * region×nation AGGREGATE — dimension-sized, so the unpartitioned
    * total window is fine at any fact-table scale (same rule as F8).
    * Shares divide as doubles after the exact decimal sums.
    */
  def winRatioToReport(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = graft.Tables.nation(spark, sfDir)
      .join(graft.Tables.region(spark, sfDir), col("n_regionkey") === col("r_regionkey"))
      .join(graft.Tables.customer(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .join(graft.Tables.orders(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      // keep the EXACT decimal sum for the window denominators: a window
      // sum over doubles is addition-order-dependent and engines differ
      .agg(sum(Cols.dec2(col("o_totalprice"))).as("rev_dec"))
    val wRegion = Window.partitionBy(col("r_name"))
    val wAll = Window.partitionBy()
    rev
      .withColumn("region_share",
        round(col("rev_dec").cast("double") / sum(col("rev_dec")).over(wRegion).cast("double"), 6))
      .withColumn("total_share",
        round(col("rev_dec").cast("double") / sum(col("rev_dec")).over(wAll).cast("double"), 6))
      .select(col("r_name"), col("n_name"), col("rev_dec").cast("double").as("revenue"),
        col("region_share"), col("total_share"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** F9 — gaps-and-islands: longest run of CONSECUTIVE order days per
    * customer. The classic `day − row_number()` island id — constant
    * within a consecutive run, distinct across gaps. Days are epoch-day
    * integers (datediff from 1970-01-01) so the arithmetic is identical
    * on every engine; the window partitions by customer (never global),
    * and both aggregations shuffle on the customer key. The production
    * shape for retention / streak features at any scale.
    */
  /** Core of F9 over any distinct (o_custkey, d) relation — separated so
    * PropertiesSpec can law-check it against a brute-force model.
    */
  private[graft] def streaksOf(days: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
    days
      .withColumn("island", col("d") - row_number().over(w))
      .groupBy(col("o_custkey"), col("island"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("o_custkey"))
      .agg(
        max(col("len")).as("max_streak"),
        sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_islands"))
      .orderBy(col("o_custkey"))
  }

  def winStreakIslands(spark: SparkSession, sfDir: String): DataFrame =
    streaksOf(Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")).as("d"))
      .distinct())

  /** L15 ts_interval_union — total COVERED time per user when every event
    * opens a 30-minute activity interval [ts_us, ts_us+30m): the classic
    * interval-union via running-max-end gaps-and-islands. A new island
    * starts exactly when an event's start exceeds the max end of all its
    * predecessors; covered time is Σ (island max end − island min start).
    *
    * 100 TB: both window passes and the island aggregate cluster on
    * user_id — per-key sorted state, nothing global; all arithmetic is
    * integer µs, so results are exact and partition-order-independent.
    */
  def tsIntervalUnion(spark: SparkSession, sfDir: String): DataFrame = {
    val lenUs = 30L * 60 * 1000000
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        (col("ts_us") + lenUs).as("end_us"))
      .withColumn("prev_max_end", max(col("end_us")).over(wPrev))
      .withColumn("new_island",
        when(col("prev_max_end").isNull || col("ts_us") > col("prev_max_end"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(wOrd))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("ts_us")).as("s"), max(col("end_us")).as("e"),
        count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"), sum(col("n")).as("n_events"),
        sum(col("e") - col("s")).as("covered_us"))
      .orderBy(col("user_id"))
  }

  /** F12 win_pattern_match — sequential pattern detection (the
    * MATCH_RECOGNIZE shape): a view IMMEDIATELY followed by a click then a
    * purchase in the same user's event stream, the whole triple within one
    * hour. Pure lead() chains over the per-user ordered window — one keyed
    * sort, no self-join, integer-µs arithmetic throughout.
    */
  def winPatternMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .withColumn("ts2", lead(col("ts_us"), 2).over(w))
      .withColumn("id2", lead(col("event_id"), 2).over(w))
      .where(col("event_type") === "view" && col("t1") === "click" &&
        col("t2") === "purchase" &&
        col("ts2") - col("ts_us") <= 3600L * 1000000)
      .select(col("user_id"), col("event_id").as("start_event"),
        col("id2").as("end_event"), col("ts_us").as("start_us"),
        (col("ts2") - col("ts_us")).as("span_us"))
      .orderBy(col("user_id"), col("start_event"))
  }

  /** F14 win_cume_dist_pct — the two normalized-rank window functions not
    * yet in the F-series: cume_dist (fraction of peers at-or-below) and
    * percent_rank ((rank-1)/(n-1)), per nation over account balance with
    * a full tiebreak. Both are exact integer-ratio divisions — rank and
    * partition counts — so cross-engine equality is structural, no
    * rounding. Same keyed-window scaling story as F1.
    */
  def winCumeDistPct(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("pr", percent_rank().over(w))
      .orderBy(col("c_nationkey"), col("c_acctbal"), col("c_custkey"))
  }

  /** F13 win_rolling_median — EXACT rolling median of `value` over each
    * user's last 7 events (ROWS 6 PRECEDING..CURRENT). Neither engine
    * windows an exact median natively at this shape, so both sides compute
    * the same element-pick formula: collect the ≤7-row frame, sort it, and
    * average the two middle elements with one fixed `(a+b)/2` IEEE op —
    * deterministic because the frame is tiny, fully ordered, and no
    * accumulation order exists. One keyed sort; frames are O(7) so state
    * per row is constant — this is the bounded-frame robust smoother a
    * 100 TB metrics stream can actually afford (contrast an unbounded
    * percentile, which cannot window).
    */
  def winRollingMedian(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(-6, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("value"))
      .withColumn("slst", array_sort(collect_list(col("value")).over(w)))
      .withColumn("n_win", size(col("slst")))
      .select(col("user_id"), col("event_id"), col("n_win"),
        ((element_at(col("slst"), (expr("(n_win - 1) div 2") + 1).cast("int")) +
          element_at(col("slst"), (expr("n_win div 2") + 1).cast("int"))) / 2.0)
          .as("rolling_median"))
      .orderBy(col("user_id"), col("event_id"))
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

  /** F13 win_ewma — exponentially weighted moving average of the daily
    * event-count series, alpha = 1/2 truncated at 30 lags. The recursion
    * y_t = alpha*x_t + (1-alpha)*y_{t-1} is unwound into its windowed form
    * y_t = sum_i w_i x_{t-i} / sum_i w_i (i = 0..30, w_i = 2^-i) and
    * computed by LAG SCATTER: each day explodes its 31 future
    * contributions (x * 2^-lag), one keyed aggregate sums them per target
    * day — no recursive state, no per-row frame re-scan, linear work at
    * any scale (the ts_gapfill explode idiom). The denominator sums the
    * same 2^-lag weights, so series edges (fewer than 31 lags available)
    * normalize correctly.
    *
    * BIT-EXACT BY CONSTRUCTION (ADVICE r6 #1): alpha = 1/2 makes every
    * weight a dyadic 2^-lag, so contributions are INTEGERIZED at scale
    * 2^30 — term = x · 2^(30-lag) is exact LONG arithmetic (the J17/J18
    * fixed-point protocol), making the per-day numerator/denominator sums
    * associative integers at ANY daily count (a float formulation would
    * go order-dependent past ~2^53/(2^30·31) ≈ 270 k events/day — NOT
    * the ~4M a hand-wave suggests). The 2^30 scale cancels in the one
    * inexact op, the final division, identical IEEE on both engines.
    * Day is emitted as an ISO string (L14/L21 canonicalization).
    */
  def winEwma(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    // collapsed series: bounded by the day span, not the event count —
    // the L21 precedent for a single ordered window over it
    val wr = daily.withColumn("rn",
      row_number().over(Window.orderBy(col("day"))))
    val contrib = wr
      .select(col("rn"), col("x"),
        explode(sequence(lit(0), lit(30))).as("lag"))
      .groupBy((col("rn") + col("lag")).as("t"))
      .agg(
        sum(col("x") * expr("shiftleft(cast(1 as bigint), 30 - lag)")).as("num_i"),
        sum(expr("shiftleft(cast(1 as bigint), 30 - lag)")).as("den_i"))
    wr.join(contrib, col("rn") === col("t"))
      .select(col("day").cast("string").as("day"),
        col("x").as("n_events"),
        (round(col("num_i").cast("double") / col("den_i").cast("double"), 6)
          + lit(0.0)).as("ewma"))
      .orderBy(col("day"))
  }

  /** F14 win_drawdown — running peak and maximum drawdown of the daily
    * net-value series (purchases add, errors subtract — a cash-flow
    * stand-in): the classic risk window pattern (cumulative sum, running
    * max, peak-minus-current). EVERYTHING stays in exact DECIMAL until
    * the output cast: daily flows are dec2 sums, the cumulative balance
    * and running peak are decimal windows over the day-collapsed series
    * (bounded by the day span — the L21 single-window precedent), and
    * drawdown is a decimal subtraction, so no float accumulation exists
    * anywhere. At 100 TB the per-day collapse is the only corpus-sized
    * aggregate; the windows run over ~10³ rows regardless of data size.
    */
  def winDrawdown(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .where(col("event_type").isin("purchase", "error"))
    val daily = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "purchase", Cols.dec2(col("value")))
        .otherwise(-Cols.dec2(col("value")))).as("flow"))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("balance", sum(col("flow")).over(wCum))
      .withColumn("peak", max(col("balance")).over(wCum))
      .select(col("day").cast("string").as("day"),
        col("flow").cast("double").as("net_flow"),
        col("balance").cast("double").as("balance"),
        col("peak").cast("double").as("peak"),
        (col("peak") - col("balance")).cast("double").as("drawdown"))
      .orderBy(col("day"))
  }

  /** L27 win_event_paths — session path mining: the top 15 three-step
    * event-type paths users walk inside a 30-minute-gap session (the
    * clickstream n-gram every product-analytics engine ships as "path
    * analysis"). Sessions are lag-islands per user (gap > 30 min starts a
    * new island — the F14 idiom on the L9 gap contract); paths are
    * lead-pairs INSIDE a session (the lead window carries the session id,
    * and a path is kept only when all three steps share it).
    *
    * Determinism: total order inside a user is (ts_us, event_id); path
    * counts are exact; ranking keys (n desc, path) — no floats anywhere.
    * Scale: two windows over the SAME (user_id → ts) shuffle (Catalyst
    * reuses the exchange), one keyed count, global top-15 via
    * TakeOrderedAndProject — never a global sort of the full path relation.
    */
  def winEventPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val wU = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val gapUs = 30L * 60L * 1000000L
    val sess = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("new_sess",
        when(col("ts_us") - lag(col("ts_us"), 1).over(wU) > gapUs, 1L)
          .otherwise(lit(0L)))
      .withColumn("sess_id", sum(col("new_sess")).over(
        wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess
      .withColumn("e2", lead(col("event_type"), 1).over(wU))
      .withColumn("s2", lead(col("sess_id"), 1).over(wU))
      .withColumn("e3", lead(col("event_type"), 2).over(wU))
      .withColumn("s3", lead(col("sess_id"), 2).over(wU))
      .where(col("s2") === col("sess_id") && col("s3") === col("sess_id"))
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("path"))
      .limit(15)
  }

  /** L28 win_conversion_lag — time-to-convert distribution: for every
    * purchase, the lag to the user's most recent PRECEDING view (the
    * running-max-when window — an as-of match without a join), summarized
    * as exact interpolated lag quantiles (the E10 percentile protocol on
    * INTEGER microseconds — interpolation is one fixed double expression
    * per quantile), conversion count, and unconverted-purchase count. The
    * product-analytics twin of the L-series funnels: those count stage
    * reach; this prices the latency between stages.
    *
    * Scale: one per-user window (running max over a keyed shuffle), then
    * a single whole-relation aggregate; at 100 TB the exact percentile
    * swaps for the E9 mergeable sketch (documented trade, same shape).
    */
  def winConversionLag(spark: SparkSession, sfDir: String): DataFrame = {
    val wU = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("last_view_us",
        max(when(col("event_type") === "view", col("ts_us"))).over(wU))
      .where(col("event_type") === "purchase")
      .select((col("ts_us") - col("last_view_us")).as("lag_us"))
      .agg(count(lit(1)).as("n_purchases"),
        count(col("lag_us")).as("n_converted"),
        (count(lit(1)) - count(col("lag_us"))).as("n_unconverted"),
        (round(expr("percentile(lag_us, 0.25)"), 6) + lit(0.0)).as("p25_lag_us"),
        (round(expr("percentile(lag_us, 0.5)"), 6) + lit(0.0)).as("p50_lag_us"),
        (round(expr("percentile(lag_us, 0.9)"), 6) + lit(0.0)).as("p90_lag_us"))
  }

  /** L29 win_rfm_scores (round 14) — the RFM (recency / frequency /
    * monetary) customer segmentation every commerce analytics stack runs:
    * per customer the last order day (integer epoch days), order count,
    * and exact-decimal lifetime spend, each scored into quintiles
    * (ntile 5 with the deterministic (metric, custkey) total order —
    * §5.3.4; score 5 = most recent / most frequent / highest spend),
    * summarized one row per populated (r, f, m) segment. Spend stays
    * exact DECIMAL through every sum; the per-segment mean is one double
    * division, 6 dp.
    *
    * 100 TB: the per-customer aggregate is one keyed shuffle; the three
    * quintile windows are GLOBAL — the deliberate F5 exception, and at
    * scale each becomes the two-pass range-partitioned global rank
    * `win_ntile_scalable` demonstrates; the segment summary is a
    * ≤125-row aggregate.
    */
  def winRfmScores(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(
        max(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"))
          .as("last_day"),
        count(lit(1)).as("n_orders"),
        sum(Cols.dec2(col("o_totalprice"))).as("spend"))
    val scored = per
      .withColumn("r_score",
        ntile(5).over(Window.orderBy(asc("last_day"), asc("o_custkey"))))
      .withColumn("f_score",
        ntile(5).over(Window.orderBy(asc("n_orders"), asc("o_custkey"))))
      .withColumn("m_score",
        ntile(5).over(Window.orderBy(asc("spend"), asc("o_custkey"))))
    scored.groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend")).cast("double").as("segment_spend"),
        (round(sum(col("spend")).cast("double") / count(lit(1)), 6) + lit(0.0))
          .as("avg_spend"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** L29 v2 win_rfm_scores_scalable (round 15, VERDICT r14 #5) — the SAME
    * (r, f, m) segment summary as [[winRfmScores]], computed without any
    * single-partition global window: each of the three quintile ranks is
    * the F5v2 two-pass range-partitioned global row_number
    * ([[GlobalRank.withGlobalRowNumber]]) with the closed-form
    * [[GlobalRank.ntileExpr]] on top, exactly the scale path the L29
    * Scaladoc names. Three metrics = three independent total orders, so
    * three range exchanges (they cannot share a partitioning — each sorts
    * the customer relation by a different key), then one keyed 3-way join
    * back on the customer key. Oracle: identical SQL to win_rfm_scores;
    * Round15Spec additionally pins exact row agreement with L29 and
    * PlanSpec gates the ranked stage on range partitioning.
    *
    * 100 TB: the per-customer aggregate is one keyed shuffle; each rank
    * pass is parallel local sort + a P-row offsets broadcast; the joins
    * are per-customer keyed shuffles; the segment summary is ≤125 rows.
    */
  def winRfmScoresScalable(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.Checkpoints.CutOps
    val parts = 8 // ≥ 2 proves the scale shape at test SF; O(cores) on a cluster
    // cut: three independent ranking passes + the final spend agg all
    // read the per-customer aggregate — materialize it once
    val per = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(
        max(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"))
          .as("last_day"),
        count(lit(1)).as("n_orders"),
        sum(Cols.dec2(col("o_totalprice"))).as("spend"))
      .lineageCut(true)
    def quintile(metric: String, out: String): DataFrame =
      GlobalRank.withGlobalRowNumber(
        per.select(col("o_custkey"), col(metric)),
        parts, col(metric), col("o_custkey"))
        .select(col("o_custkey"), GlobalRank.ntileExpr(5).as(out))
    per.select(col("o_custkey"), col("spend"))
      .join(quintile("last_day", "r_score"), Seq("o_custkey"))
      .join(quintile("n_orders", "f_score"), Seq("o_custkey"))
      .join(quintile("spend", "m_score"), Seq("o_custkey"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend")).cast("double").as("segment_spend"),
        (round(sum(col("spend")).cast("double") / count(lit(1)), 6) + lit(0.0))
          .as("avg_spend"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** L30 win_cohort_ltv (round 14) — cumulative lifetime value by
    * acquisition cohort: customers are grouped by their FIRST order month
    * (integer month index — year·12 + month−1, no DATE on the wire), and
    * each (cohort, months-since-first) cell reports the cohort's exact
    * revenue plus the running cumulative revenue per acquired customer —
    * the LTV curve growth teams read against acquisition cost. The
    * retention twin (`win_retention_cohort`) counts who comes back; this
    * prices what they spend. Ages with zero revenue are absent and the
    * cumulative runs over PRESENT rows (both engines share the
    * convention). Revenue is exact DECIMAL until the final per-customer
    * division (6 dp).
    *
    * 100 TB: two keyed aggregates (per-customer min month, per-cell sum)
    * + a per-cohort window over month-count-sized data — no global sort,
    * no skew risk beyond the cohort key itself.
    */
  def winCohortLtv(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        expr("year(o_orderdate) * 12 + (month(o_orderdate) - 1)").as("mo"),
        Cols.dec2(col("o_totalprice")).as("price2"))
    val cohort = o.groupBy(col("o_custkey")).agg(min(col("mo")).as("cohort_mo"))
    val sz = cohort.groupBy(col("cohort_mo")).agg(count(lit(1)).as("cohort_size"))
    val rev = o.join(cohort, Seq("o_custkey"))
      .groupBy(col("cohort_mo"), (col("mo") - col("cohort_mo")).as("age_mo"))
      .agg(sum(col("price2")).as("rev"))
    val wCum = Window.partitionBy(col("cohort_mo")).orderBy(col("age_mo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.join(sz, Seq("cohort_mo"))
      .withColumn("cum_rev", sum(col("rev")).over(wCum))
      .select(col("cohort_mo"), col("age_mo"), col("cohort_size"),
        col("rev").cast("double").as("rev"),
        (round(col("cum_rev").cast("double") / col("cohort_size"), 6) + lit(0.0))
          .as("ltv_per_customer"))
      .orderBy(col("cohort_mo"), col("age_mo"))
  }
}
