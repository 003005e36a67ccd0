package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General analytics queries over the TPC-H-ish driver tables — these are the bench
  * headliners (scan/agg/join shapes that dominate at 100 TB).
  *
  * Oracle-parity discipline: every aggregated measure is computed in EXACT integer space
  * (cents / basis-point-cents as BIGINT) because float sums are order-dependent and Spark
  * and DuckDB would disagree in the last ulps. Doubles only ever appear as a final single
  * division of two exact integers (associative-order-free), rounded.
  */
object AnalyticsQueries {

  private def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table with `ts` normalized to exact epoch-µs BIGINT `tsu` (see
    * [[EventTime.micros]] — the testdata's timestamp representation has varied across
    * generations) plus the listed payload columns. All downstream event-time math is
    * integer µs arithmetic, matching the oracle's `epoch_us(ts)` bit-for-bit.
    */
  private def eventsTsu(spark: SparkSession, dir: String, cols: String*): DataFrame = {
    val ev = table(spark, dir, "events")
    ev.select(EventTime.micros(ev).as("tsu") +: cols.map(col): _*)
  }

  /** money → exact integer cents (both engines: round(x*100) then integral cast).
    * `private[graft]` so the streaming RFM register shares the ONE conversion — a
    * drifted cents formula would silently break its batch-parity pin.
    */
  private[graft] def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** extended price × (1 − discount) in exact basis-point-cents. */
  private def revenueBp(price: Column, discount: Column): Column =
    cents(price) * (lit(100L) - cents(discount))

  /** Q1-style pricing summary: single-pass scan + hash agg (map-side combinable). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(revenueBp(col("l_extendedprice"), col("l_discount"))).as("sum_disc_bp"),
        count(lit(1)).as("count_order")
      )

  /** Q3-style top-N: pre-aggregate lineitem BEFORE the join (shrinks the join input from
    * |lineitem| to |orders|), then join and take a deterministic top-10.
    */
  def topRevenueOrders(spark: SparkSession, dir: String): DataFrame = {
    val byOrder = table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(revenueBp(col("l_extendedprice"), col("l_discount"))).as("revenue_bp"))
    byOrder
      .join(table(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("revenue_bp"))
      .orderBy(col("revenue_bp").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** Q10-style returned-item report: revenue lost to returns per customer (top 20 by
    * lost bp, customer tie-break). The return-flag filter pushes into the lineitem
    * scan (PushedFilters), the nation side broadcasts; exact bp integers throughout.
    */
  def returnedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val lost = table(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revenueBp(col("l_extendedprice"), col("l_discount")).as("rev"))
    val custNation = table(spark, dir, "customer")
      .join(broadcast(table(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"))
    lost
      .join(table(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(col("rev")).as("lost_bp"), count(lit(1)).as("n_returned_items"))
      .orderBy(col("lost_bp").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** Q5-style star join: lineitem→orders→customer→nation→region. The dimension chain is
    * broadcast (region/nation/customer are tiny next to the fact tables).
    */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), revenueBp(col("l_extendedprice"), col("l_discount")).as("rev"))
    val dims = table(spark, dir, "customer")
      .join(broadcast(table(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(table(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    val ord = table(spark, dir, "orders")
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("n_name"), col("r_name"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("rev")).as("revenue_bp"), count(lit(1)).as("n_items"))
  }

  /** Per-user churn rollup: activity span, distinct active days, and a churned flag
    * (no event in the trailing 72 h of the corpus window). All integer µs arithmetic
    * against a 1-row broadcast corpus-end — one map-side-combinable aggregation.
    */
  def churnRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsTsu(spark, dir, "user_id")
      .withColumn("day", expr("tsu DIV 86400000000"))
      .localCheckpoint(true) // two consumers: the corpus-end agg and the rollup scan
    val end = ev.agg(max(col("tsu")).as("end_us"))
    ev.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("day")).as("n_active_days"),
        max(col("tsu")).as("last_seen_us"))
      .crossJoin(broadcast(end))
      .select(
        col("user_id"), col("n_events"), col("n_active_days"), col("last_seen_us"),
        (col("last_seen_us") < col("end_us") - lit(259200000000L)).cast("int").as("churned"))
  }

  /** Q8-style market share: each nation's fraction of its region-year revenue.
    * Revenue stays in exact basis-point integers through the aggregation and the
    * region-year window total; the share is one final double division rounded to 6
    * digits (the order-free-ratio discipline).
    *
    * Scale shape: same broadcast star as [[regionRevenue]] (all dimension sides
    * broadcast, one fact shuffle on the group keys), plus one window over the
    * (region, year) groups — 5 regions × a few years of rows, trivial state.
    */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("r_name"), col("o_year"))
    val li = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), revenueBp(col("l_extendedprice"), col("l_discount")).as("rev"))
    val dims = table(spark, dir, "customer")
      .join(broadcast(table(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(table(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    val ord = table(spark, dir, "orders")
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("n_name"), col("r_name"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("r_name"), col("n_name"), col("o_year"))
      .agg(sum(col("rev")).as("revenue_bp"))
      .withColumn("share",
        round(col("revenue_bp").cast("double") /
          sum(col("revenue_bp")).over(w).cast("double"), 6))
  }

  /** Q2/Q9-style supplier-side star: lineitem→supplier→nation + lineitem→part, volume
    * and revenue per (nation, part brand). Both dimension sides broadcast.
    */
  def brandNationVolume(spark: SparkSession, dir: String): DataFrame = {
    val supNation = broadcast(
      table(spark, dir, "supplier")
        .join(broadcast(table(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name")))
    val parts = broadcast(table(spark, dir, "part").select(col("p_partkey"), col("p_brand")))
    table(spark, dir, "lineitem")
      .select(
        col("l_suppkey"), col("l_partkey"), col("l_quantity"),
        revenueBp(col("l_extendedprice"), col("l_discount")).as("rev"))
      .join(supNation, col("l_suppkey") === col("s_suppkey"))
      .join(parts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("n_name"), col("p_brand"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(col("rev")).as("revenue_bp"),
        count(lit(1)).as("n_items")
      )
  }

  /** Event-time sessionization: a session breaks on a >1h gap in the user's stream.
    * All session math is exact integer µs arithmetic, hash-matching DuckDB's
    * `epoch_us`.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("tsu").asc, col("event_id").asc)
    eventsTsu(spark, dir, "user_id", "event_id")
      .withColumn("prev", lag(col("tsu"), 1).over(w))
      .withColumn(
        "brk",
        when(col("prev").isNull || col("tsu") - col("prev") > 3600000000L, 1L).otherwise(0L)
      )
      .groupBy(col("user_id"))
      .agg(
        sum(col("brk")).as("n_sessions"),
        (max(col("tsu")) - min(col("tsu"))).as("span_us")
      )
  }

  /** Per-session rollup: sessions are maximal runs with ≤ 1 h gaps (the ev2 break
    * rule), numbered per user by a running sum of break flags; each session reports
    * its event count and exact µs duration. This is the session-level detail under
    * ev2's per-user rollup — the table session-length and dwell-time distributions
    * are computed from.
    *
    * Scale shape: one window sort per user partition (the canonical sessionization
    * shape — state never leaves the user's partition), then a map-side-combinable
    * hash-agg on (user, session).
    */
  def sessionStats(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("tsu").asc, col("event_id").asc)
    eventsTsu(spark, dir, "user_id", "event_id")
      .withColumn("prev", lag(col("tsu"), 1).over(w))
      .withColumn(
        "brk",
        when(col("prev").isNull || col("tsu") - col("prev") > 3600000000L, 1L).otherwise(0L)
      )
      .withColumn("session_idx", sum(col("brk")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("tsu")) - min(col("tsu"))).as("duration_us")
      )
  }

  /** Hourly rollup by integer bucket (µs DIV 1h) × event type. */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame =
    eventsTsu(spark, dir, "event_type", "value")
      .groupBy(expr("tsu DIV 3600000000").as("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))

  /** Semi-structured extraction: JSON `props` column → typed aggregate per user. The
    * path is extracted ONCE in a projection before the groupBy — as three separate
    * aggregate inputs the parse would run per aggregate per row.
    */
  def propsExtract(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .select(col("user_id"), get_json_object(col("props"), "$.k").as("k"))
      .groupBy(col("user_id"))
      .agg(
        sum(col("k").cast("long")).as("sum_k"),
        max(col("k").cast("long")).as("max_k"),
        countDistinct(col("k")).as("n_distinct_k")
      )

  /** Hourly heavy hitters: the top-3 users by event count in every hour (tie-break
    * user_id asc) — the per-window top-k monitoring query of an event pipeline.
    *
    * Scale shape: pre-aggregate to (hour, user) counts first (map-side-combinable; the
    * row count entering the window is |active users per hour|, not |events|), then
    * rank inside each hour — windows are bounded by per-hour cardinality, never a
    * global sort.
    */
  def hourlyTopUsers(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val counts = eventsTsu(spark, dir, "user_id")
      .groupBy(expr("tsu DIV 3600000000").as("hour_bucket"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hour_bucket"))
      .orderBy(col("n_events").desc, col("user_id").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("hour_bucket"), col("rank"), col("user_id"), col("n_events"))
  }

  /** Hour-over-hour retention: for each hour, how many active users are still active
    * in the next hour — the cohort/stickiness primitive of event analytics.
    * Exact-integer counts, one final division.
    *
    * Scale shape: dedupe to (hour, user) pairs first (map-side-combinable distinct),
    * then ONE self equi-join on (hour+1, user) — |active pairs| rows, never events².
    */
  def hourlyRetention(spark: SparkSession, dir: String): DataFrame = {
    val active = eventsTsu(spark, dir, "user_id")
      .select(expr("tsu DIV 3600000000").as("hour_bucket"), col("user_id"))
      .distinct()
    val next = active.select((col("hour_bucket") - 1).as("hour_bucket"), col("user_id"),
      lit(1L).as("retained"))
    active.join(next, Seq("hour_bucket", "user_id"), "left_outer")
      .groupBy(col("hour_bucket"))
      .agg(
        count(lit(1)).as("n_active"),
        sum(coalesce(col("retained"), lit(0L))).as("n_retained"))
      .withColumn("retention",
        round(col("n_retained").cast("double") / col("n_active").cast("double"), 6))
  }

  /** Hourly anomaly scores: each hour's event count z-scored against the trailing
    * 24 hours (RANGE window on the integer hour bucket, so gaps in the hour sequence
    * shrink the baseline instead of silently stretching it). Baseline sums are exact
    * integers (Σn, Σn², count) — the mean/variance floats are one fixed IEEE sequence
    * per row, so the oracle reproduces them bit-for-bit. Hours with under 12 baseline
    * points are suppressed (z needs a baseline before it means anything).
    *
    * Scale: one shuffle to hourly grain (map-side combined), then a window over the
    * TINY hourly relation — the raw event stream never reaches the window.
    */
  def hourlyAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = eventsTsu(spark, dir)
      .groupBy(expr("tsu DIV 3600000000").as("hour_bucket"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("hour_bucket")).rangeBetween(-24, -1)
    val withBase = hourly.select(
      col("hour_bucket"),
      col("n"),
      sum(col("n")).over(w).as("base_n"),
      sum(col("n") * col("n")).over(w).as("base_sq"),
      count(lit(1)).over(w).as("base_cnt"))
    // fixed float sequence (mirrored verbatim in the oracle): mean, then
    // var = E[x²] − mean², clamped at 0 against cancellation
    val mean = col("base_n").cast("double") / col("base_cnt").cast("double")
    val variance = greatest(
      col("base_sq").cast("double") / col("base_cnt").cast("double") - mean * mean,
      lit(0.0))
    withBase
      .filter(col("base_cnt") >= 12)
      .select(
        col("hour_bucket"),
        col("n"),
        round(mean, 4).as("base_mean"),
        when(variance > 0.0, round((col("n").cast("double") - mean) / sqrt(variance), 4))
          .otherwise(lit(0.0))
          .as("z"))
  }

  /** Q6-style selective revenue: a two-predicate scan + one global sum. The point at
    * 100 TB is the SCAN, not the agg: both predicates and the 3-column projection
    * must reach the parquet reader (PlanSpec pins PushedFilters + ReadSchema), so the
    * query reads a fraction of the table instead of all of it.
    */
  def selectiveRevenue(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_quantity") < 25 && col("l_discount") >= 0.05)
      .agg(
        sum(revenueBp(col("l_extendedprice"), col("l_discount"))).as("revenue_bp"),
        count(lit(1)).as("n_items"))

  /** Event-type pivot: per-user counts spread into one column per event type — the
    * wide-format export every BI/feature-store handoff wants. The type list is
    * PINNED (not discovered with an extra collect pass): a 100 TB pivot must know its
    * columns up front, and unknown types land in nothing rather than silently adding
    * columns the downstream schema contract doesn't have.
    *
    * Formulated as conditional sums rather than `.pivot()`: Dataset.pivot plans a
    * pre-aggregation on (user, type) plus a pivotfirst pass — TWO shuffles — where
    * the conditional aggregation is ONE map-side-combinable shuffle on the user key
    * (PlanSpec pins this).
    */
  def eventTypePivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val aggs = types.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
    table(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Region→nation revenue ROLLUP: subtotals per region and a grand total in one
    * aggregation pass (Spark plans grouping sets as a single Expand + hash agg — no
    * re-scan per level). `grouping()` flags distinguish subtotal rows from data rows
    * because a NULL dimension value would be ambiguous. Exact basis-point-cents.
    */
  def regionRevenueRollup(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), revenueBp(col("l_extendedprice"), col("l_discount")).as("rev"))
    val dims = table(spark, dir, "customer")
      .join(broadcast(table(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(table(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    val ord = table(spark, dir, "orders")
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("n_name"), col("r_name"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        sum(col("rev")).as("revenue_bp"),
        count(lit(1)).as("n_items"),
        grouping(col("r_name")).cast("int").as("g_region"),
        grouping(col("n_name")).cast("int").as("g_nation"))
  }

  /** As-of join — the time-series operator Spark has no built-in for: each `leftType`
    * event is matched to the user's most recent `rightType` event at-or-before it
    * (ties at the same timestamp broken by max event id). Composed as tagged-union +
    * one ordered window with last(ignoreNulls) — the standard Spark-native as-of
    * shape: ONE shuffle on the join key, no range join, no per-row subquery. At 100 TB
    * this is a single (user_id)-partitioned sort, skew-safe under AQE; the oracle
    * mirrors the semantics with an explicit max-ts/max-id formulation.
    */
  def asofJoin(
      spark: SparkSession,
      dir: String,
      leftType: String = "purchase",
      rightType: String = "click"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = eventsTsu(spark, dir, "event_id", "user_id", "event_type")
      .filter(col("event_type").isin(leftType, rightType))
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        col("tsu").as("ts_us"),
        // right rows sort BEFORE left rows at the same timestamp: at-or-before
        when(col("event_type") === rightType, lit(0)).otherwise(lit(1)).as("side"))
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("r_ts",
        last(when(col("side") === 0, col("ts_us")), ignoreNulls = true).over(w))
      .withColumn("r_id",
        last(when(col("side") === 0, col("event_id")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(
        col("event_id"),
        col("user_id"),
        col("ts_us"),
        col("r_ts").as("click_ts_us"),
        col("r_id").as("click_event_id"),
        (col("ts_us") - col("r_ts")).as("gap_us"))
  }

  /** Last-touch conversion attribution — the marketing-analytics rollup over the
    * event stream: each purchase is credited to the LATEST preceding touch event
    * (click/view/signup) by the same user within a lookback window, and conversions
    * aggregate per attributed channel (purchases with no in-window touch land in
    * 'none'). The multi-channel, windowed generalization of [[asofJoin]] (which
    * reports per-pair rows for ONE right type, unbounded).
    *
    * Semantics pinned for oracle parity: "latest" is argmax by (ts, event_id) over
    * eligible touches — a touch at the purchase's exact timestamp counts (at-or-
    * before), and same-timestamp touches tie-break to the highest event id. The
    * lookback filter applies after the argmax, which is equivalent to filtering
    * before it (the latest touch minimizes the gap). All gap math is exact integer
    * µs; the only float is one final ratio per channel.
    *
    * Scale shape: one window sort per user partition (state never leaves the user's
    * partition — the ev2 sessionize shape), then a map-side-combinable hash-agg on
    * the ≤|touch types|+2 channel keys. No joins at all.
    */
  def attribution(
      spark: SparkSession,
      dir: String,
      lookbackUs: Long = 86400000000L,
      touchTypes: Seq[String] = Seq("click", "view", "signup")
  ): DataFrame =
    attributionOf(
      eventsTsu(spark, dir, "event_id", "user_id", "event_type", "value")
        .withColumnRenamed("tsu", "ts_us"),
      lookbackUs, touchTypes)

  /** Kernel of [[attribution]] over a (event_id, user_id, event_type, ts_us, value)
    * relation — exposed so the streaming twin's parity test can run the batch fold
    * on the identical rows.
    */
  def attributionOf(
      events: DataFrame,
      lookbackUs: Long = 86400000000L,
      touchTypes: Seq[String] = Seq("click", "view", "signup")
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tagged = events
      .filter(col("event_type").isin(touchTypes :+ "purchase": _*))
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        col("ts_us"), col("value"),
        // touches sort BEFORE purchases at the same timestamp: at-or-before
        when(col("event_type") === "purchase", lit(1)).otherwise(lit(0)).as("side"))
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("t_ts",
        last(when(col("side") === 0, col("ts_us")), ignoreNulls = true).over(w))
      .withColumn("t_type",
        last(when(col("side") === 0, col("event_type")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .withColumn("channel",
        when(col("t_ts").isNull || col("ts_us") - col("t_ts") > lookbackUs, lit("none"))
          .otherwise(col("t_type")))
      .withColumn("gap_us",
        when(col("channel") === "none", lit(null)).otherwise(col("ts_us") - col("t_ts")))
      .groupBy(col("channel"))
      .agg(
        count(lit(1)).as("n_conversions"),
        sum(cents(col("value"))).as("value_cents"),
        coalesce(sum(col("gap_us")), lit(0L)).as("sum_gap_us"))
      .withColumn("avg_gap_us",
        when(col("channel") === "none", lit(0.0))
          .otherwise(round(col("sum_gap_us").cast("double") /
            col("n_conversions").cast("double"), 6)))
  }

  /** Ordered conversion funnel: first signup, then the first click at-or-after it,
    * then the first purchase at-or-after that — per user, with nulls where the chain
    * breaks. Three stage-aggregations on the user key (each map-side combinable);
    * the event stream is scanned once and reused via an eager materialization.
    */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsTsu(spark, dir, "user_id", "event_type")
      .withColumnRenamed("tsu", "ts_us")
      .localCheckpoint(true) // three stage consumers
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("signup_ts"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("ts_us") >= col("signup_ts"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("click_ts"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id")
      .filter(col("ts_us") >= col("click_ts"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("purchase_ts"))
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("signup_ts"), col("click_ts"), col("purchase_ts"))
  }

  /** Q4-style order-priority check: orders in a one-year window that have at least one
    * line shipped more than 60 days after the order date, counted per priority.
    *
    * Scale shape: the EXISTS is a left-semi join — the lineitem side is pre-filtered
    * to late lines only and projected to the single join column before the shuffle,
    * so the semi-join input is a fraction of |lineitem|, and the date predicate on
    * orders reaches the parquet scan.
    */
  def latePriorityOrders(spark: SparkSession, dir: String): DataFrame = {
    // order/lineitem dates are µs-precision TIMESTAMP_NTZ — comparisons and the +60d
    // offset are exact integer µs under the hood in both engines
    val ord = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp_ntz"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
    val late = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(ord.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"))
    ord.join(late, ord("o_orderkey") === late("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** Rolling active users: per day, the distinct users active that day and over the
    * trailing 7 days (inclusive) — the DAU/WAU primitive of event analytics.
    *
    * Scale shape: the event stream collapses to distinct (day, user) pairs FIRST
    * (map-side-combinable distinct, |users|×|days| rows at most); the trailing window
    * is then a bounded self equi-join on the day offset (7 rows per pair), never a
    * rolling distinct over raw events.
    */
  def rollingActiveUsers(spark: SparkSession, dir: String): DataFrame = {
    val daily = eventsTsu(spark, dir, "user_id")
      .select(expr("tsu DIV 86400000000").as("day_bucket"), col("user_id"))
      .distinct()
      .localCheckpoint(true) // two consumers: the DAU agg and the trailing join
    val dau = daily.groupBy(col("day_bucket")).agg(count(lit(1)).as("n_dau"))
    val offsets = spark.range(0, 7).select(col("id").as("off"))
    val wau = daily
      .join(broadcast(offsets))
      .select((col("day_bucket") + col("off")).as("day_bucket"), col("user_id"))
      .distinct()
      .groupBy(col("day_bucket")).agg(count(lit(1)).as("n_wau"))
    // only days that actually occur in the data (the +off fanout manufactures
    // trailing buckets past the last day)
    dau.join(wau, Seq("day_bucket"))
      .select(col("day_bucket"), col("n_dau"), col("n_wau"))
  }

  /** Cohort retention matrix: users grouped by first-seen day (the cohort), each
    * cohort's active-user count at every day offset — the triangle heatmap behind
    * every retention dashboard, generalizing [[hourlyRetention]]'s one-step form.
    *
    * Scale shape: the event stream collapses to distinct (day, user) pairs FIRST
    * (map-side-combinable distinct — at most |users|·|days| rows); the cohort
    * assignment is one user-keyed min-aggregation joined back on the user key; the
    * matrix is a (cohort, offset)-keyed count over those pairs; cohort sizes are a
    * |days|-sized relation joined broadcast. Raw events never reach a join.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val daily = eventsTsu(spark, dir, "user_id")
      .select(expr("tsu DIV 86400000000").as("day_bucket"), col("user_id"))
      .distinct()
      .localCheckpoint(true) // two consumers: cohort assignment and the activity join
    val cohort = daily.groupBy(col("user_id")).agg(min(col("day_bucket")).as("cohort_day"))
    val sizes = cohort.groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_size"))
    daily
      .join(cohort, "user_id")
      .groupBy(col("cohort_day"), (col("day_bucket") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active")) // (day,user) pairs are distinct ⇒ count = distinct users
      .join(broadcast(sizes), "cohort_day")
      .select(
        col("cohort_day"), col("day_offset"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size").cast("double"), 6)
          .as("retention"))
  }

  /** q10 — the TPC-H Q21 "waiting suppliers" SHAPE on this schema: suppliers who
    * were the SOLE late shipper (l_shipdate more than 60 days past o_orderdate)
    * in orders served by several suppliers — the classic
    * exists/not-exists-composition plan, expressed in its scalable relational
    * form: the "no other late supplier" predicate is a per-order late-supplier
    * COUNT (one partition-keyed window over the deduped late set), not a
    * correlated self-join, so nothing touches the fact table twice at the same
    * grain.
    *
    * Scale shape: the multi-supplier order set is one map-side-combinable
    * distinct-agg on lineitem alone (no orders join needed for it); the late set
    * is one fact×orders equi-join; the supplier dimension broadcasts; the final
    * top-10 is a TakeOrdered. Deterministic: date arithmetic is exact µs, ties
    * break (numwait desc, s_name asc, s_suppkey asc).
    */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame =
    waitingSuppliersOf(
      table(spark, dir, "lineitem"),
      table(spark, dir, "orders"),
      table(spark, dir, "supplier"))

  /** The q10 kernel over explicit relations — split out so a planted-order test
    * can cross-validate the sole-late logic directly.
    */
  private[graft] def waitingSuppliersOf(
      lineitem: DataFrame, orders: DataFrame, supplier: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = lineitem.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val multi = li.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("nsupp"))
      .filter(col("nsupp") > 1)
      .select(col("l_orderkey"))
    val late = li
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"))
      .distinct()
    val sole = late
      .withColumn("n_late", count(lit(1)).over(Window.partitionBy(col("l_orderkey"))))
      .filter(col("n_late") === 1)
      .join(multi, "l_orderkey")
    sole.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(
        broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      // the s_suppkey third key makes the claimed total order real even if two
      // suppliers ever share a name; projected away after the limit
      .orderBy(col("numwait").desc, col("s_name").asc, col("s_suppkey").asc)
      .limit(10)
      .select(col("s_name"), col("numwait"))
  }

  /** q11 — the TPC-H Q17 small-quantity-order shape: revenue from lineitems of one
    * brand's parts whose quantity sits below 20% of that PART's average quantity —
    * the correlated-scalar-subquery plan, decorrelated into its scalable form: one
    * per-part (count, quantity-sum) aggregate equi-joined back onto the brand's
    * lineitems. The fractional-average comparison is EXACT integer
    * cross-multiplication — `qty < sum/cnt/5 ⟺ 5·qty·cnt < sum` with quantities
    * cast to exact longs — so no float average can disagree between engines.
    *
    * Scale shape: the brand's part keys broadcast onto the fact scan; the per-part
    * stats relation is brand-parts-sized and equi-joins back (AQE broadcasts it
    * when it fits); one final scalar agg.
    */
  def smallQuantityRevenue(
      spark: SparkSession,
      dir: String,
      brand: String = "Brand#1"
  ): DataFrame = {
    val li = table(spark, dir, "lineitem").select(
      col("l_partkey"),
      col("l_quantity").cast("long").as("qty"),
      cents(col("l_extendedprice")).as("price_cents"))
    val brandParts = broadcast(
      table(spark, dir, "part").filter(col("p_brand") === brand).select(col("p_partkey")))
    val f = li.join(brandParts, col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("qty"), col("price_cents"))
      .localCheckpoint(true) // two consumers: the per-part stats and the row filter
    val stats = f.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("qty")).as("sumq"))
    f.join(stats, "l_partkey")
      .filter(lit(5L) * col("qty") * col("cnt") < col("sumq"))
      .agg(
        sum(col("price_cents")).as("revenue_cents"),
        count(lit(1)).as("n_items"))
  }

  /** q12 — the TPC-H Q22 idle-rich-customer shape: customers whose balance exceeds
    * the average POSITIVE balance and who placed no order in the trailing 30 days
    * of the order history, rolled up per market segment — the
    * scalar-subquery-threshold + NOT EXISTS plan: both scalars (the balance
    * threshold and the history horizon) ride in as one broadcast row each, the
    * threshold compares by exact integer cross-multiplication
    * (`bal > sum/cnt ⟺ bal·cnt > sum` in cents), and the no-recent-order
    * predicate is a left-anti join against the distinct recently-active keys.
    * (Q22's literal "never ordered" test is vacuous on this synthetic data —
    * every customer has orders — so the recency window carries the same plan
    * shape with a non-degenerate answer.)
    */
  def idleRichCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), cents(col("c_acctbal")).as("bal_cents"))
      .localCheckpoint(true) // two consumers: the threshold agg and the main scan
    val thr = cust.filter(col("bal_cents") > 0)
      .agg(count(lit(1)).as("cnt_pos"), sum(col("bal_cents")).as("sum_pos"))
    val orders = table(spark, dir, "orders").select(col("o_custkey"), col("o_orderdate"))
    val horizon = orders.agg(max(col("o_orderdate")).as("max_date"))
    val recent = orders.crossJoin(broadcast(horizon))
      .filter(col("o_orderdate") > col("max_date") - expr("INTERVAL 30 DAYS"))
      .select(col("o_custkey"))
      .distinct()
    cust.crossJoin(broadcast(thr))
      .filter(col("bal_cents") * col("cnt_pos") > col("sum_pos"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), sum(col("bal_cents")).as("total_cents"))
  }

  /** q13 — the TPC-H Q13 customer-distribution shape: how many customers placed
    * exactly k orders, INCLUDING k = 0 — the left-outer-join + double-aggregation
    * plan (per-customer order counts with absent customers kept as zero, then the
    * count-of-counts histogram). The zero-order band is precisely what an inner
    * join silently loses; on this engine it is also the q12 idle set's superset.
    *
    * Scale shape: one equi-join per-customer count (map-side combinable), then a
    * histogram over the count domain — the second agg's input is customer-sized
    * and its output is the tiny distinct-count domain.
    */
  def customerOrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val perCust = table(spark, dir, "customer").select(col("c_custkey"))
      .join(table(spark, dir, "orders").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("n_orders"))
    perCust.groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** q14 — the TPC-H Q14 promotion-effect shape: what fraction of a shipping
    * window's revenue came from PROMO-type parts. One conditional sum over the
    * window's lineitems joined to the part dimension; the share is a single
    * final division of two exact basis-point-cent integers, micro-quantized, so
    * the promoted/total split can never drift between engines.
    *
    * Scale shape: the shipdate window is phrased as a RAW-column timestamp range
    * (never `year(col)` — a function over the column would block parquet
    * predicate pushdown), so it prunes the fact scan at the footer; the part
    * dimension joins by key — at warehouse scale the (partkey, p_type)
    * projection broadcasts (or AQE picks it); ONE scalar aggregate, no window,
    * no shuffle beyond the join.
    */
  def promoRevenue(
      spark: SparkSession,
      dir: String,
      yearFrom: Int = 1996,
      yearTo: Int = 1997
  ): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(s"$yearFrom-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit(s"${yearTo + 1}-01-01").cast("timestamp_ntz"))
      .select(col("l_partkey"),
        revenueBp(col("l_extendedprice"), col("l_discount")).as("rev_bp"))
    val pt = table(spark, dir, "part").select(col("p_partkey"), col("p_type"))
    li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev_bp")).otherwise(0L)).as("promo_bp"),
        sum(col("rev_bp")).as("total_bp"))
      .select(
        col("promo_bp"), col("total_bp"),
        floor(lit(1000000.0) * col("promo_bp").cast("double") / col("total_bp").cast("double")
          + lit(0.5)).cast("long").as("promo_share_micro"))
  }

  /** q18 — the TPC-H Q18 large-volume-customer shape: orders whose total quantity
    * exceeds a threshold, with their customer — the group-HAVING-then-join plan.
    * The having-filtered per-order aggregate runs FIRST (map-side combinable,
    * output is the tiny qualifying set), and only qualifying orders touch the
    * orders/customer dimensions — the order the optimizer cannot derive if the
    * query is phrased as a correlated IN-subquery over the raw fact table.
    *
    * Scale shape: one fact-table aggregate; the qualifying set is broadcast-sized
    * by construction (it is the > threshold tail), so it broadcasts into the
    * orders scan, and the resulting qualified-orders relation — still tiny —
    * broadcasts into the customer scan (the CUSTOMER dimension itself is never
    * broadcast: at warehouse scale it is data-sized); top-k is a TakeOrdered,
    * never a global sort.
    */
  def largeVolumeCustomers(
      spark: SparkSession,
      dir: String,
      minQty: Long = 250L,
      k: Int = 20
  ): DataFrame = {
    val qualifying = table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    val orders = table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), cents(col("o_totalprice")).as("total_cents"))
    val cust = table(spark, dir, "customer").select(col("c_custkey"), col("c_name"))
    val qualifiedOrders = orders
      .join(broadcast(qualifying), col("o_orderkey") === col("l_orderkey"))
    cust.join(broadcast(qualifiedOrders), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("total_cents"), col("sum_qty"))
      .orderBy(col("total_cents").desc, col("o_orderkey").asc)
      .limit(k)
  }

  /** q19 — the TPC-H Q19 disjunctive-predicate shape: revenue from lineitems
    * matching ANY of three (brand, size-band, quantity-band) conjunctions — the
    * plan where a naive OR across join inputs blocks predicate pushdown. Phrased
    * so each side's derivable conjuncts still prune: the part scan keeps only the
    * three brands (the OR's union of part predicates), the fact scan keeps only
    * the union quantity range, and the residual disjunction evaluates post-join
    * on the shrunken inputs.
    *
    * Scale shape: both scans carry pushed range predicates (the disjunction's
    * per-side envelope); the filtered part side broadcasts; ONE scalar agg.
    */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      // the union envelope of the three bands, on the RAW column so it pushes
      // down to the scan (filtering the post-cast alias would not)
      .filter(col("l_quantity").between(1, 30))
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        revenueBp(col("l_extendedprice"), col("l_discount")).as("rev_bp"))
    val pt = table(spark, dir, "part")
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val arm1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
      col("qty").between(1L, 11L)
    val arm2 = col("p_brand") === "Brand#2" && col("p_size").between(1, 20) &&
      col("qty").between(10L, 20L)
    val arm3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 30) &&
      col("qty").between(20L, 30L)
    li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .filter(arm1 || arm2 || arm3)
      .agg(sum(col("rev_bp")).as("revenue_bp"), count(lit(1)).as("n_items"))
  }

  /** q17 — the TPC-H Q2 minimum-cost-supplier shape: for every part in a filtered
    * family, the supplier(s) achieving the minimum observed unit price — the
    * correlated-argmin-subquery plan, decorrelated. Instead of re-scanning the
    * fact table per part (the literal correlated phrasing), the fact side reduces
    * ONCE to per-(part, supplier) minima, and the per-part argmin is a window over
    * that already-reduced relation; ties keep every achieving supplier (Q2's
    * semantics). Unit price is micro-quantized cents-per-unit, so min and equality
    * are exact-integer comparisons.
    *
    * Scale shape: the part-family filter pushes to the part scan and broadcasts
    * into the fact scan; ONE map-side-combinable aggregate reduces the fact table
    * to |parts in family| × |suppliers-per-part| rows; the argmin window partitions
    * per part over that reduced relation (never the fact table); supplier/nation
    * dims broadcast.
    */
  def minCostSupplier(
      spark: SparkSession,
      dir: String,
      pType: String = "SMALL",
      maxSize: Int = 25
  ): DataFrame = {
    val pp = table(spark, dir, "part")
      .filter(col("p_type") === pType && col("p_size") < maxSize)
      .select(col("p_partkey"), col("p_brand"))
    val u = table(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        floor(lit(10000.0) * cents(col("l_extendedprice")).cast("double")
          / col("l_quantity").cast("long").cast("double") + lit(0.5))
          .cast("long").as("unit_mc"))
      .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
    val perSupp = u.groupBy(col("p_partkey"), col("p_brand"), col("l_suppkey"))
      .agg(min(col("unit_mc")).as("supp_min"))
    val w = Window.partitionBy(col("p_partkey"))
    val winners = perSupp
      .withColumn("part_min", min(col("supp_min")).over(w))
      .filter(col("supp_min") === col("part_min"))
    val sup = table(spark, dir, "supplier").select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
    val nat = table(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))
    winners
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_name"), col("n_name"),
        col("supp_min").as("min_unit_microcents"))
  }

  /** q15 — the TPC-H Q15 top-supplier shape: the supplier(s) whose windowed revenue
    * equals the GLOBAL maximum — the aggregate-of-aggregate self-reference (the
    * original phrases it as a view referenced twice). The per-supplier revenue
    * relation materializes ONCE (supplier-count rows, eager checkpoint), the 1-row
    * max broadcasts back, and the equality filter is exact-integer on basis-point
    * cents — ties surface every achieving supplier rather than an arbitrary one.
    *
    * Scale shape: one fact-table aggregate (shipdate range pushed to the scan),
    * then everything downstream operates on |suppliers| rows; no second fact scan
    * (the naive view-twice phrasing re-aggregates the fact table for the max).
    */
  def topSupplier(
      spark: SparkSession,
      dir: String,
      from: String = "1996-01-01",
      until: String = "1996-04-01"
  ): DataFrame = {
    val rev = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(from).cast("timestamp_ntz") &&
        col("l_shipdate") < lit(until).cast("timestamp_ntz"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revenueBp(col("l_extendedprice"), col("l_discount"))).as("rev_bp"))
      .localCheckpoint(true)
    val mx = rev.agg(max(col("rev_bp")).as("max_rev"))
    val sup = table(spark, dir, "supplier").select(col("s_suppkey"), col("s_name"))
    rev.crossJoin(broadcast(mx))
      .filter(col("rev_bp") === col("max_rev"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("rev_bp"))
  }

  /** q16 — the TPC-H Q16 supplier-variety shape: how many DISTINCT suppliers serve
    * each (brand, size) segment, excluding a supplier blacklist — the
    * NOT-IN-subquery + count-distinct plan. The blacklist compiles to a broadcast
    * LEFT ANTI join (never a per-row subquery), the brand exclusion pushes to the
    * part scan, and the distinct count is Spark's standard two-phase
    * partial-distinct aggregate.
    *
    * Scale shape: the anti join's build side is the blacklist (tiny by
    * construction — it is an exception list); part broadcasts; the count-distinct
    * shuffles (brand, size, suppkey) once — never the raw fact rows twice.
    */
  def supplierVariety(
      spark: SparkSession,
      dir: String,
      excludeBrands: Seq[String] = Seq("Brand#1", "Brand#2"),
      minAcctbal: Double = 1000.0
  ): DataFrame = {
    val excl = table(spark, dir, "supplier")
      .filter(col("s_acctbal") < minAcctbal).select(col("s_suppkey"))
    val pt = table(spark, dir, "part")
      .filter(!col("p_brand").isin(excludeBrands: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    table(spark, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** q20 — the TPC-H Q20 nested-semi-join shape: suppliers who shipped MORE than a
    * threshold quantity of any part in a filtered family — the
    * IN-(IN-(aggregate-HAVING)) chain, flattened to one pass: part-family filter →
    * per-(supplier, part) quantity aggregate with the HAVING threshold → LEFT SEMI
    * into the supplier dimension. Each nesting level is one relation, no level
    * re-scans the fact table.
    *
    * Scale shape: the family filter broadcasts into the fact scan; the qualifying
    * aggregate is map-side combinable and its output (qualifying suppliers) is
    * exception-sized, so it broadcasts as the semi-join's build side; nation
    * broadcasts for the name.
    */
  def excessShippers(
      spark: SparkSession,
      dir: String,
      pType: String = "ECONOMY",
      minQty: Long = 80L
  ): DataFrame = {
    val pt = table(spark, dir, "part")
      .filter(col("p_type") === pType).select(col("p_partkey"))
    val qualifying = table(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
      .select(col("l_suppkey"))
    val sup = table(spark, dir, "supplier")
    val nat = table(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))
    sup.join(broadcast(qualifying), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
  }

  /** q21 — the TPC-H Q9 product-profit shape: per (supplier nation, order year),
    * the summed profit of every lineitem — revenue minus cost — with the cost leg
    * adapted to this schema (no partsupp table: the part's retail price stands in
    * for supply cost, `cost = retail_cents · qty`, scaled to basis-point cents so
    * profit subtracts in ONE exact integer unit). The widest star join in the
    * suite: fact → orders (year) → part (cost) → supplier → nation.
    *
    * Scale shape: the per-row profit expression evaluates BEFORE aggregation
    * (map-side combinable — the aggregate state is |nations|·|years| rows); part,
    * supplier, and nation broadcast; orders joins by key (both sides data-sized —
    * AQE's call); no window, no second fact pass.
    */
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("qty"),
        revenueBp(col("l_extendedprice"), col("l_discount")).as("rev_bp"))
    val ord = table(spark, dir, "orders")
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val pt = table(spark, dir, "part")
      .select(col("p_partkey"), cents(col("p_retailprice")).as("retail_cents"))
    val sup = table(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val nat = table(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(col("rev_bp") - col("retail_cents") * col("qty") * lit(100L)).as("profit_bp"))
  }

  /** ev18 — inter-event gap quantiles per event type: EXACT p50/p90/p99 of the
    * seconds between a user's consecutive events, attributed to the LATER event's
    * type — the quantile evidence behind ev2's sessionization gap parameter (a
    * 1-hour break rule should sit far in the tail of the within-session gap
    * distribution; this query is how that choice gets audited instead of guessed).
    *
    * Determinism: the per-user order is (tsu, event_id) — the ev2 convention, so
    * equal-timestamp events cannot reorder between engines; gaps quantize to whole
    * seconds by integer division before anything aggregates.
    *
    * Scale shape: one lag window per USER partition (state never leaves the
    * partition), then the t17 cumulated-histogram discipline — the quantile
    * windows run over the per-(type, gap-second) HISTOGRAM, a relation bounded by
    * the discrete gap domain per type, never the event count; thresholds compare
    * `cum·100 ≥ p·total` in integers.
    */
  /** ev19 — ORDERED conversion funnel (view → click → purchase): how many users
    * progress through each step IN TIME ORDER — the product-analytics staple a
    * per-type count can't answer (a user who purchased before ever viewing is
    * not a conversion). First-touch semantics: step 1 anchors at the user's
    * FIRST view; step k at the first step-k event STRICTLY AFTER the anchored
    * step k−1 (strict `>` so equal-timestamp events never count as progress in
    * either engine). One row per step: users reaching it and the exact summed
    * µs from the previous step (integer arithmetic end-to-end — avg is the
    * consumer's division).
    *
    * Scale shape: three user-keyed min-aggregations chained by equi-joins (each
    * map-side combinable, the anchor relations are one row per qualifying
    * user); no windows, no per-user event sorting — the funnel never holds more
    * than (user, anchor-ts) state per step.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame =
    funnelOf(eventsTsu(spark, dir, "user_id", "event_type"))

  /** Kernel form of [[funnel]] over an explicit (user_id, event_type, tsu)
    * relation — the streaming twin's batch-parity pin feeds stream prefixes.
    */
  private[graft] def funnelOf(events: DataFrame): DataFrame = {
    val (v, c, p) = funnelStages(events)
    def stepRow(step: Int, name: String, df: DataFrame, gap: Column): DataFrame =
      df.agg(count(lit(1)).as("n_users"), coalesce(sum(gap), lit(0L)).as("sum_gap_us"))
        .select(lit(step).as("step"), lit(name).as("event_type"),
          col("n_users"), col("sum_gap_us"))
    stepRow(1, "view", v, lit(0L))
      .unionByName(stepRow(2, "click", c, col("t2") - col("t1")))
      .unionByName(stepRow(3, "purchase", p, col("t3") - col("t2")))
  }

  /** The ev19 per-user funnel anchors, shared by the conversion counts
    * (funnelOf) and the stage-latency quantiles (funnelLatencyOf): first view
    * t1, first strictly-later click t2, first strictly-later purchase t3.
    */
  private def funnelStages(events: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val ev = events.localCheckpoint(true)
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tsu")).as("t1"))
      .localCheckpoint(true)
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("tsu") > col("t1"))
      .groupBy(col("user_id"), col("t1")).agg(min(col("tsu")).as("t2"))
      .localCheckpoint(true)
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("tsu") > col("t2"))
      .groupBy(col("user_id"), col("t2")).agg(min(col("tsu")).as("t3"))
    (v, c, p)
  }

  /** ev24 — funnel conversion rates with WILSON 95% intervals: the ev19
    * counts upgraded to the statistic a decision is actually made on (a 40%
    * conversion over 10 users and over 10,000 users are different facts; the
    * interval says which). Wilson score (the standard small-n-safe binomial
    * interval) at z = 1.96, computed in ONE fixed double sequence from the
    * exact step counts and micro-quantized — the ev7/t44 float discipline.
    * A zero-denominator stage reports explicit zeros.
    *
    * Scale shape: the ev19 anchor sets (per-user min-timestamp chains), three
    * 1-row counts, and a constant-size result — nothing new touches event
    * volume.
    *
    * CROSS-ENGINE FLOAT CONTRACT (do not "simplify" the constants): every
    * constant below is COMPOSED from the literal 1.96 with the same operation
    * sequence the DuckDB mirror writes textually (`1.96*1.96/2`,
    * `1.96*1.96/4` — AnalyticsOracles "ev24_funnel_wilson"). Scala folds
    * `z*z/2.0` at compile time and DuckDB folds `1.96*1.96/2` at plan time,
    * but both fold the SAME double ops over the SAME parsed IEEE-754 value of
    * 1.96, so the folded doubles are bit-identical and the micro-quantized
    * hash matches at every scale factor. Replacing either side with a
    * pre-folded decimal literal (e.g. `3.8416`, which is a DIFFERENT double
    * than 1.96*1.96) breaks the contract silently.
    * RoundFifteenPropertySpec re-derives a Wilson row in plain Scala doubles
    * to pin this.
    */
  def funnelWilson(spark: SparkSession, dir: String): DataFrame =
    funnelWilsonOf(eventsTsu(spark, dir, "user_id", "event_type"))

  private[graft] def funnelWilsonOf(events: DataFrame): DataFrame = {
    val (v, c, p) = funnelStages(events)
    def cnt(df: DataFrame, name: String) = df.agg(count(lit(1)).as(name))
    val counts = cnt(v, "n_view").crossJoin(cnt(c, "n_click")).crossJoin(cnt(p, "n_buy"))
    def wilson(step: String, xCol: String, nCol: String) = {
      val x = col(xCol).cast("double")
      val n = col(nCol).cast("double")
      val z = 1.96
      val z2 = z * z
      val denom = n + lit(z2)
      val center = (x + lit(z2 / 2.0)) / denom
      val half = (lit(z) / denom) * sqrt(x * (n - x) / n + lit(z2 / 4.0))
      def micro(cc: Column) = floor(lit(1000000.0) * cc + lit(0.5)).cast("long")
      struct(
        lit(step).as("step"),
        col(nCol).as("n_prev"),
        col(xCol).as("n_conv"),
        when(col(nCol) === 0L, 0L)
          .otherwise(expr(s"(2 * 1000000 * $xCol + $nCol) DIV (2 * $nCol)").cast("long"))
          .as("rate_micro"),
        when(col(nCol) === 0L, 0L).otherwise(micro(center - half)).as("wilson_low_micro"),
        when(col(nCol) === 0L, 0L).otherwise(micro(center + half)).as("wilson_high_micro"))
    }
    counts
      .select(explode(array(
        wilson("view_to_click", "n_click", "n_view"),
        wilson("click_to_purchase", "n_buy", "n_click"))).as("s"))
      .select(col("s.step"), col("s.n_prev"), col("s.n_conv"), col("s.rate_micro"),
        col("s.wilson_low_micro"), col("s.wilson_high_micro"))
  }

  /** ev26 — A/B LIFT: the two-proportion experiment readout over a
    * deterministic hash split. Every user with a `view` event is "exposed" and
    * lands in arm 0 (control) or arm 1 (variant) by md5-parity of their id
    * (the t07 salted-hash-split idiom — at serving time the assignment is a
    * pure function of the id, reproducible on any engine, no coordination);
    * a user CONVERTS when a `purchase` follows their first view (the ev19
    * step-2 semantics). One row reports both arms' exact counts, the half-up
    * integer conversion rates, the absolute and relative lift, the pooled
    * two-proportion z statistic, and a significance verdict at |z| ≥ 1.96.
    *
    * Cross-engine float contract (the ev24 discipline): z is ONE double
    * expression over exact integer counts — pooled p̂ = (x₀+x₁)/(n₀+n₁),
    * z = (p₁−p₀)/sqrt(p̂·(1−p̂)·(1/n₀+1/n₁)) — written with the same operation
    * sequence on both engines and micro-quantized once; the 1.96 gate compares
    * in micro space (|z_micro| ≥ 1960000), so the verdict is an exact integer
    * compare.
    *
    * Scale shape: two map-side-combinable per-user aggregates (first view,
    * first later purchase — the ev19 kernel), one groupBy().agg() conditional
    * fold to a single row; no window, no data-sized join. The arm column never
    * shuffles alone — it rides the user-keyed aggregate.
    */
  def abLift(spark: SparkSession, dir: String): DataFrame =
    abLiftOf(eventsTsu(spark, dir, "user_id", "event_type"))

  private[graft] def abLiftOf(events: DataFrame): DataFrame = {
    val firstView = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tsu")).as("t1"))
    val converted = events.filter(col("event_type") === "purchase")
      .join(firstView, Seq("user_id"))
      .filter(col("tsu") > col("t1"))
      .select(col("user_id")).distinct()
      .withColumn("conv", lit(1L))
    val arm = (conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
      .cast("long") % 2L).as("arm")
    val perUser = firstView.join(converted, Seq("user_id"), "left")
      .select(arm, coalesce(col("conv"), lit(0L)).as("conv"))
    val counts = perUser.agg(
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_control"),
      sum(when(col("arm") === 0L, col("conv")).otherwise(0L)).as("conv_control"),
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_variant"),
      sum(when(col("arm") === 1L, col("conv")).otherwise(0L)).as("conv_variant"))
    def rate(x: String, n: String): Column =
      when(col(n) === 0L, 0L)
        .otherwise(expr(s"(2 * 1000000 * $x + $n) DIV (2 * $n)").cast("long"))
    val n0 = col("n_control").cast("double")
    val n1 = col("n_variant").cast("double")
    val x0 = col("conv_control").cast("double")
    val x1 = col("conv_variant").cast("double")
    val pHat = (x0 + x1) / (n0 + n1)
    val z = (x1 / n1 - x0 / n0) / sqrt(pHat * (lit(1.0) - pHat) * (lit(1.0) / n0 + lit(1.0) / n1))
    val zMicro = when(
      col("n_control") === 0L || col("n_variant") === 0L ||
        col("conv_control") + col("conv_variant") === 0L ||
        col("conv_control") + col("conv_variant") === col("n_control") + col("n_variant"),
      0L).otherwise(floor(lit(1000000.0) * z + lit(0.5)).cast("long"))
    counts.select(
      col("n_control"), col("conv_control"), col("n_variant"), col("conv_variant"),
      rate("conv_control", "n_control").as("rate_control_micro"),
      rate("conv_variant", "n_variant").as("rate_variant_micro"),
      (rate("conv_variant", "n_variant") - rate("conv_control", "n_control"))
        .as("lift_micro"),
      zMicro.as("z_micro"),
      (abs(zMicro) >= 1960000L).cast("int").as("significant"))
  }

  /** ev27 — HOUR-OF-DAY PERIODICITY per event type: the 24-bin diurnal profile
    * and a chi-square uniformity statistic — the standard screen for scheduled
    * traffic (a cron-driven `error` type spikes one bin; organic `view` traffic
    * spreads). Hours come from pure integer arithmetic on epoch micros
    * (`(tsu div 3600µs) mod 24` — timezone-free, identical on both engines).
    *
    * Chi-square against uniform reduces EXACTLY: with E = n/24,
    * Σ_h (O_h − E)²/E  =  (24·ΣO_h² − n²) / n — so the numerator is one exact
    * BIGINT per type (zero-count hours contribute 0 to ΣO² and the algebra
    * already accounts for them) and the single double division is the only
    * float op, micro-quantized once (overflow bound: n² stays in BIGINT up to
    * n ≈ 3·10⁹ events per type; beyond that move the numerator to decimal —
    * the g62/s33 documented-bound convention). The peak bin is an argmax with
    * the smallest-hour tie-break, read off one `max(struct(o, 23−hour))`
    * aggregate — no window.
    *
    * Scale shape: one map-side-combinable groupBy(type, hour) → a 24·|types|
    * relation, then one groupBy(type) fold; no window, no join, no data-sized
    * state.
    */
  def hourProfile(spark: SparkSession, dir: String): DataFrame =
    hourProfileOf(eventsTsu(spark, dir, "event_type"))

  private[graft] def hourProfileOf(events: DataFrame): DataFrame = {
    val perHour = events
      .groupBy(col("event_type"), expr("(tsu DIV 3600000000) % 24").as("hour"))
      .agg(count(lit(1)).as("o"))
    perHour.groupBy(col("event_type"))
      .agg(
        sum(col("o")).as("n_events"),
        count(lit(1)).as("n_hours_active"),
        sum(col("o") * col("o")).as("s2"),
        max(struct(col("o").as("o"), (lit(23L) - col("hour")).as("nh"))).as("pk"))
      .select(
        col("event_type"), col("n_events"), col("n_hours_active"),
        (lit(23L) - col("pk.nh")).as("peak_hour"),
        expr("(2 * 1000000 * pk.o + n_events) DIV (2 * n_events)").cast("long")
          .as("peak_share_micro"),
        floor((lit(1000000.0)
          * (lit(24L) * col("s2") - col("n_events") * col("n_events")).cast("double"))
          / col("n_events").cast("double") + lit(0.5)).cast("long").as("chi2_micro"))
  }

  /** ev28 — GINI concentration of events over users, per event type: the scalar
    * inequality coefficient behind ev17's decile curve ("is `purchase` traffic
    * spread or whale-driven?"), computed per type so the per-user sampling-cap
    * decision can differ by type. G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) with users
    * ranked by count ascending — ties contribute the same Σ i·xᵢ under any
    * tie order, so the statistic is deterministic without a tie-break column.
    *
    * Scale shape: the per-user counts reduce to a groupBy(type, count)
    * HISTOGRAM (catalog-sized: |types| × |distinct counts|, hundreds of rows at
    * any corpus size); the rank-sum folds per tied block as
    * v·(m·C + m(m+1)/2) where C = users with strictly smaller counts — so the
    * only window runs over the histogram, never over users. The oracle mirrors
    * the PLAIN per-user rank window, proving the histogram reduction exact
    * (the dc24 discipline). All sums are exact BIGINTs; the one double division
    * is micro-quantized once (overflow bound: Σ i·xᵢ ≤ n·total stays in BIGINT
    * up to n·total ≈ 9·10¹⁸ — the g62/s33 documented-bound convention; beyond
    * that move the rank-sum to decimal).
    */
  def giniConcentration(spark: SparkSession, dir: String): DataFrame =
    giniConcentrationOf(table(spark, dir, "events").select(col("event_type"), col("user_id")))

  private[graft] def giniConcentrationOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = events
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    val hist = perUser
      .groupBy(col("event_type"), col("cnt"))
      .agg(count(lit(1)).as("m"))
    val below = Window.partitionBy(col("event_type")).orderBy(col("cnt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("c_below", coalesce(sum(col("m")).over(below), lit(0L)))
      .groupBy(col("event_type"))
      .agg(
        sum(col("m")).as("n_users"),
        sum(col("cnt") * col("m")).as("total_events"),
        sum(expr("cnt * (m * c_below + (m * (m + 1)) DIV 2)")).as("s"))
      .select(
        col("event_type"), col("n_users"), col("total_events"),
        floor(lit(1000000.0)
          * (lit(2L) * col("s") - (col("n_users") + 1L) * col("total_events")).cast("double")
          / (col("n_users").cast("double") * col("total_events").cast("double"))
          + lit(0.5)).cast("long").as("gini_micro"))
  }

  /** ev29 — BOT-DETECTION battery: the per-user behavioral screen every event
    * pipeline runs before its data feeds anything downstream (m08's bit-battery
    * discipline applied to users). Three published automation signatures, each a
    * reason bit so the verdict is auditable:
    *
    *   - bit 0 — machine speed: the whole history inside one microsecond
    *     (span 0) or ≥ `rateMaxPerHour` events/hour over the active span
    *   - bit 1 — metronome regularity: squared coefficient of variation of the
    *     inter-event gaps ≤ `cv2MaxMicro` (humans are bursty, CV² ≈ 1+;
    *     schedulers sit near 0). CV² = (n_g·Σg² − S²)/S² over whole-second
    *     gaps — exact integers, one double division, micro-quantized
    *   - bit 2 — single-window automation: peak hour holds ≥ `peakShareMinMicro`
    *     of the user's events (the ev27 share idiom per user)
    *
    * Gaps quantize to whole seconds BEFORE squaring so Σg² stays in BIGINT
    * (bound: n_g·Σg² ≤ 9·10¹⁸ holds to ~10⁴ events over a month-long span — the
    * g62/s33 documented-bound convention; µs gaps would overflow at one large
    * gap). Gap aggregates are invariant under tie order (equal timestamps
    * permute equal values), so no tie-break column is needed for cross-engine
    * determinism. Users with < 3 events carry too little signal and are not
    * scored.
    *
    * Scale shape: one lag window per user ordered by event time (state bounded
    * by a user's history, the ev2/ev12 shape) + map-side-combinable
    * (user, hour) and per-user folds; no join wider than the user catalog.
    */
  def botBattery(
      spark: SparkSession,
      dir: String,
      rateMaxPerHour: Long = 120L,
      cv2MaxMicro: Long = 100000L,
      peakShareMinMicro: Long = 500000L
  ): DataFrame =
    botBatteryOf(eventsTsu(spark, dir, "user_id"), rateMaxPerHour, cv2MaxMicro, peakShareMinMicro)

  private[graft] def botBatteryOf(
      events: DataFrame,
      rateMaxPerHour: Long = 120L,
      cv2MaxMicro: Long = 100000L,
      peakShareMinMicro: Long = 500000L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("tsu").asc)
    val stats = events
      .select(col("user_id"), col("tsu"))
      .withColumn("gap_us", col("tsu") - lag(col("tsu"), 1).over(byUser))
      // DIV, not double `/`+cast: exact integer semantics independent of
      // magnitude (the repo's integer-division discipline — `/` matches the
      // oracle's `//` only while quotients sit well inside double precision)
      .withColumn("gs", expr("gap_us DIV 1000000"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("tsu")) - min(col("tsu"))).as("span_us"),
        sum(col("gs")).as("s"),
        sum(col("gs") * col("gs")).as("s2"),
        count(col("gs")).as("ng"))
      .filter(col("n_events") >= 3)
    val peak = events
      .groupBy(col("user_id"), expr("(tsu DIV 3600000000) % 24").as("hour"))
      .agg(count(lit(1)).as("o"))
      .groupBy(col("user_id"))
      .agg(sum(col("o")).as("n"), max(col("o")).as("mo"))
      .select(col("user_id"),
        expr("(2 * 1000000 * mo + n) DIV (2 * n)").cast("long").as("peak_share_micro"))
    val scored = stats.join(peak, Seq("user_id"))
      .select(
        col("user_id"), col("n_events"), col("span_us"),
        when(col("span_us") > 0,
          expr("(n_events * 3600000000) DIV span_us").cast("long"))
          .otherwise(lit(-1L)).as("rate_per_hour"),
        when(col("s") > 0,
          floor(lit(1000000.0) * (col("ng") * col("s2") - col("s") * col("s")).cast("double")
            / (col("s").cast("double") * col("s").cast("double")) + lit(0.5)).cast("long"))
          .otherwise(lit(0L)).as("cv2_micro"),
        col("s"),
        col("peak_share_micro"))
    scored
      .withColumn("reasons",
        (when(col("span_us") === 0 || col("rate_per_hour") >= rateMaxPerHour, lit(1L))
          .otherwise(lit(0L))
          + when(col("s") > 0 && col("cv2_micro") <= cv2MaxMicro, lit(2L)).otherwise(lit(0L))
          + when(col("peak_share_micro") >= peakShareMinMicro, lit(4L)).otherwise(lit(0L)))
          .as("reasons"))
      .select(
        col("user_id"), col("n_events"), col("span_us"), col("rate_per_hour"),
        col("cv2_micro"), col("peak_share_micro"), col("reasons"),
        (col("reasons") =!= 0L).cast("int").as("bot"))
  }

  /** ev30 — CUSUM changepoint detection per event type (Page's test): the screen
    * for SUSTAINED level shifts that ev7's trailing z-score is blind to (a +20%
    * step forever never spikes any single hour, but its drift accumulates). The
    * recursion S_t = max(0, S_{t−1} + x_t − μ − k) is not window-expressible as
    * written, but the classical identity S_t = Z_t − min_{0≤j≤t} Z_j (Z =
    * running sum of deviations, Z₀ = 0 — the EMPTY prefix must stay in the min
    * or a first-hour spike reads 0; the max(0,·) reset IS subtracting the
    * running minimum) turns it into TWO plain prefix windows — cumsum and
    * running min clamped at 0 — so both engines compute it exactly, in
    * integers, with no recursion. The identity itself is pinned against a
    * literal sequential Page recursion in RoundFifteenPropertySpec.
    *
    * Frame: the GLOBAL hour grid [min, max] of the corpus, zero-filled per type
    * (a quiet hour accumulates negative drift; skipping it would hide the very
    * shift being hunted). Reference μ = the type's own mean hourly count
    * (half-up micro), slack k = μ/2, alarm at S ≥ 5μ — the standard
    * "five mean-units" tuning, all pinned foldable-integer arithmetic.
    *
    * Scale shape: one map-side-combinable (type, hour) count, a broadcast 1-row
    * hour-bounds relation, a catalog-sized grid (|types| × corpus hour span —
    * time-bounded, never event-bounded), and per-type windows over that grid
    * only. Overflow: |Z| ≤ span·10⁶·max-hourly-count stays in BIGINT to ~10⁹
    * event-hours per type (the g62/s33 documented-bound convention).
    */
  def cusumChangepoint(
      spark: SparkSession,
      dir: String,
      slackDenom: Long = 2L,
      alarmFactor: Long = 5L
  ): DataFrame =
    cusumChangepointOf(eventsTsu(spark, dir, "event_type"), slackDenom, alarmFactor)

  private[graft] def cusumChangepointOf(
      events: DataFrame,
      slackDenom: Long = 2L,
      alarmFactor: Long = 5L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hours = events.select(col("event_type"), expr("tsu DIV 3600000000").as("h"))
    val counts = hours.groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("o"))
      .localCheckpoint(true) // catalog-sized; feeds the grid join and the per-type means
    val bounds = counts.agg(min(col("h")).as("hmin"), max(col("h")).as("hmax"))
    val means = counts.groupBy(col("event_type"))
      .agg(sum(col("o")).as("total_events"))
    val grid = means
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), col("total_events"), col("hmin"), col("hmax"),
        explode(sequence(col("hmin"), col("hmax"))).as("h"))
      .join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("total_events"), col("hmin"), col("hmax"), col("h"),
        coalesce(col("o"), lit(0L)).as("o"))
      .withColumn("n_hours", col("hmax") - col("hmin") + 1L)
      .withColumn("mean_micro",
        expr("(2 * 1000000 * total_events + n_hours) DIV (2 * n_hours)").cast("long"))
      .withColumn("dev",
        // DIV, not double `/`+cast: exact slack independent of magnitude (the
        // integer-division discipline; mean_micro is non-negative so floor =
        // truncation here, matching the oracle's `//` at every scale)
        lit(1000000L) * col("o") - col("mean_micro")
          - expr(s"mean_micro DIV ${slackDenom}L"))
    val byHour = Window.partitionBy(col("event_type")).orderBy(col("h").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    grid
      .withColumn("z", sum(col("dev")).over(byHour))
      // the running min must include the EMPTY prefix Z₀ = 0 (a first-hour
      // spike has nothing below it to subtract), hence the least(·, 0) clamp
      .withColumn("cusum", col("z") - least(min(col("z")).over(byHour), lit(0L)))
      .groupBy(col("event_type"))
      .agg(
        max(col("n_hours")).as("n_hours"),
        max(col("total_events")).as("total_events"),
        max(col("mean_micro")).as("mean_micro"),
        max(col("hmax")).as("hmax"),
        // peak = max cusum, smallest-hour tie-break (the ev27 argmax idiom)
        max(struct(col("cusum").as("c"), (col("hmax") - col("h")).as("nh"))).as("pk"))
      .select(
        col("event_type"), col("n_hours"), col("total_events"), col("mean_micro"),
        col("pk.c").as("max_cusum_micro"),
        (col("hmax") - col("pk.nh")).as("peak_hour_index"),
        (col("pk.c") >= col("mean_micro") * alarmFactor).cast("int").as("alarm"))
  }

  /** ev31 — TOP EVENT PATHS: the most-travelled three-step sequences
    * (t₁ → t₂ → t₃) across user histories — the path-mining readout product
    * analytics runs to DISCOVER funnels before wiring them into ev19's fixed
    * stages. Steps must be consecutive events of one user with each hop inside
    * the ev2 session gap (≤ 1 h), so a path never spans a session boundary.
    * Order within a user is (event time, event id) — the explicit tie-break
    * MATTERS here (unlike ev29's gap aggregates, consecutive triples are not
    * permutation-invariant), so both engines walk the identical sequence.
    *
    * Scale shape: two `lead`s over the per-user window (state = one user's
    * history, the ev2 shape) → a map-side-combinable path count (≤ |types|³
    * rows, catalog-sized) → the top-k rank window over that catalog only.
    */
  def topEventPaths(
      spark: SparkSession,
      dir: String,
      k: Int = 20,
      sessionGapUs: Long = 3600000000L
  ): DataFrame =
    topEventPathsOf(eventsTsu(spark, dir, "user_id", "event_id", "event_type"), k, sessionGapUs)

  private[graft] def topEventPathsOf(
      events: DataFrame,
      k: Int = 20,
      sessionGapUs: Long = 3600000000L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu").asc, col("event_id").asc)
    val paths = events
      .select(col("user_id"), col("event_id"), col("tsu"), col("event_type").as("t1"))
      .withColumn("t2", lead(col("t1"), 1).over(byUser))
      .withColumn("t3", lead(col("t1"), 2).over(byUser))
      .withColumn("ts2", lead(col("tsu"), 1).over(byUser))
      .withColumn("ts3", lead(col("tsu"), 2).over(byUser))
      .filter(col("t3").isNotNull
        && col("ts2") - col("tsu") <= sessionGapUs
        && col("ts3") - col("ts2") <= sessionGapUs)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n_paths"))
    val byCount = Window.orderBy(
      col("n_paths").desc, col("t1").asc, col("t2").asc, col("t3").asc)
    // the global window runs over the ≤|types|³ path catalog, never event rows
    paths
      .withColumn("rank", row_number().over(byCount).cast("long"))
      .filter(col("rank") <= k)
  }

  /** ev20 — funnel STAGE LATENCIES: exact p50/p90/p99 of the per-user
    * conversion delays (first view → first later click, that click → first
    * later purchase), in whole seconds — the time-to-convert telemetry read
    * next to ev19's conversion counts. Quantiles are the ev18 histogram fold
    * (exact, |distinct gap|-sized state, never row-sized), shared via
    * [[exactQuantiles]].
    */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame =
    funnelLatencyOf(eventsTsu(spark, dir, "user_id", "event_type"))

  private[graft] def funnelLatencyOf(events: DataFrame): DataFrame = {
    val (_, c, p) = funnelStages(events)
    val gaps = c.select(lit("view_to_click").as("stage"),
        expr("(t2 - t1) DIV 1000000").as("gap_s"))
      .unionByName(p.select(lit("click_to_purchase").as("stage"),
        expr("(t3 - t2) DIV 1000000").as("gap_s")))
    exactQuantiles(gaps, "stage", "gap_s", "n_conv")
  }

  def gapQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsu").asc, col("event_id").asc)
    val gaps = eventsTsu(spark, dir, "user_id", "event_id", "event_type")
      .withColumn("prev", lag(col("tsu"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), expr("(tsu - prev) DIV 1000000").as("gap_s"))
    exactQuantiles(gaps, "event_type", "gap_s", "n_gaps")
  }

  /** ev21 — first-order Markov transition matrix over each user's time-ordered
    * event stream: for every (from_type → to_type) step, the step count and the
    * per-from-type transition rate — the "what follows what" relation behind
    * next-action prediction, funnel design, and bot detection (a user class
    * whose transition row is a spike is scripted traffic).
    *
    * Determinism: steps are ordered by (tsu, event_id) — the ev12 tie-break —
    * and the rate is ONE final division of exact longs in the shared
    * `(2·10⁶·n + d) div (2·d)` half-up integer form, so both engines compute
    * identical micro rates with no float in the pipeline at all.
    *
    * Scale shape: the lead() window is per-user (partition-bounded — events
    * shuffle once on user_id, the same key every per-user op here shares),
    * then ONE map-side-combinable groupBy collapses the corpus to a
    * |types|² matrix; the from-type marginal is a window over that
    * catalog-sized relation, never over events. No driver-side state.
    */
  def typeTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsu").asc, col("event_id").asc)
    val steps = eventsTsu(spark, dir, "user_id", "event_id", "event_type")
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("event_type").as("from_type"), col("to_type"))
    val matrix = steps.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_steps"))
    matrix
      .withColumn("from_total",
        sum(col("n_steps")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n_steps"),
        expr("(2 * 1000000 * n_steps + from_total) DIV (2 * from_total)")
          .cast("long").as("rate_micro"))
  }

  /** ev22 — per-type TRANSITION ENTROPY over the ev21 matrix: for each
    * from_type, Shannon entropy (nats) of its next-event distribution plus the
    * out-degree and step mass — the sequel to ev21 a monitoring pipeline
    * actually alerts on: a type whose entropy collapses has turned into a
    * scripted hop (one dominant successor), a type whose entropy jumps lost
    * its funnel.
    *
    * Determinism (the t45 ln discipline): each (from, to) contributes
    * floor(10⁶ · (n/N) · ln(N/n) + ½) — micro-quantized per ROW from the same
    * double sequence in both engines — then an EXACT integer sum per
    * from_type; the one-successor case is exactly 0 (ln 1).
    *
    * Scale shape: reuses ev21's scale shape (per-user window + |types|²
    * rollup); the entropy fold is a map + groupBy over the catalog-sized
    * matrix.
    */
  def transitionEntropy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsu").asc, col("event_id").asc)
    val matrix = eventsTsu(spark, dir, "user_id", "event_id", "event_type")
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_steps"))
      .withColumn("from_total",
        sum(col("n_steps")).over(Window.partitionBy(col("from_type"))))
    matrix
      .select(col("from_type"), col("from_total"),
        floor(lit(1000000.0)
          * (col("n_steps").cast("double") / col("from_total").cast("double"))
          * log(col("from_total").cast("double") / col("n_steps").cast("double"))
          + lit(0.5)).cast("long").as("term_micro"))
      .groupBy(col("from_type"))
      .agg(
        count(lit(1)).as("n_out_types"),
        max(col("from_total")).as("n_steps_total"),
        sum(col("term_micro")).as("entropy_micro"))
  }

  /** ev23 — the STATIONARY distribution of the ev21 transition matrix by
    * bounded power iteration: where the event traffic settles if users keep
    * walking the observed matrix — PageRank's question asked of event types
    * (the steady-state load forecast per surface). v₀ is uniform over the
    * type catalog; round r is one exact integer matrix-vector product
    * vₜ ← Σ_f v_f · rate(f→t) div 10⁶, grid-completed so a type with no
    * inbound step keeps an explicit 0. Types with no OUTGOING steps absorb
    * mass out of the system each round (substochastic leak, the
    * teleport-free PageRank caveat) — reported, not hidden: Σv is in the
    * output via the share each row carries of it.
    *
    * Determinism: rates are ev21's half-up integers; each round is an exact
    * BIGINT dot product followed by ONE floor division — no float ever.
    * OVERFLOW BOUND (documented, not silent — the g62/s33 convention): each
    * product v·rate_micro ≤ 10⁶·10⁶ = 10¹², and the per-type sum adds at most
    * |types| of them, so the int64 ceiling (~9.2·10¹⁸) holds up to ~9·10⁶
    * distinct event types — far past any real event-type catalog. Past that,
    * Spark's LongType sum would wrap silently while DuckDB's SUM(BIGINT)
    * promotes to int128 and diverges; the knob is the same as s33's: cast the
    * product to DecimalType(38,0) on both sides.
    *
    * Scale shape: the matrix and the vector are |types|-sized (catalog
    * relations, broadcast joins); rounds iterate driver-side over
    * checkpointed k-row state — nothing here ever touches event volume after
    * the one ev21 rollup.
    */
  def markovStationary(spark: SparkSession, dir: String, rounds: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsu").asc, col("event_id").asc)
    val matrix = eventsTsu(spark, dir, "user_id", "event_id", "event_type")
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_steps"))
      .withColumn("from_total",
        sum(col("n_steps")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"),
        expr("(2 * 1000000 * n_steps + from_total) DIV (2 * from_total)")
          .cast("long").as("rate_micro"))
      .localCheckpoint(true) // the loop-invariant matrix
    val types = table(spark, dir, "events")
      .select(col("event_type").as("ty")).distinct()
      .localCheckpoint(true) // v0 + the per-round grid
    val n = types.count()
    var v = types.select(col("ty"),
      lit((2L * 1000000L + n) / (2L * n)).as("v"))
    for (_ <- 1 to rounds) {
      val stepped = v.join(matrix, col("ty") === col("from_type"))
        .groupBy(col("to_type").as("ty2"))
        .agg(expr("CAST(sum(v * rate_micro) DIV 1000000 AS LONG)").as("v2"))
      v = types.join(stepped, col("ty") === col("ty2"), "left")
        .select(col("ty"), coalesce(col("v2"), lit(0L)).as("v"))
        .localCheckpoint(true)
    }
    v.select(col("ty").as("event_type"), col("v").as("stationary_micro"))
  }

  /** The ev18 EXACT quantile fold over an explicit (key, value) relation:
    * integer-bucket histogram → cumulative mass per key → smallest value whose
    * cumulative count reaches p% — exact at any scale because the state is
    * |distinct values|-sized, never row-sized. Shared by ev18 and ev20.
    */
  private def exactQuantiles(
      vals: DataFrame,
      keyCol: String,
      valCol: String,
      nName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = vals.groupBy(col(keyCol), col(valCol)).agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy(col(keyCol)).orderBy(col(valCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col(keyCol))
    def q(p: Int): Column =
      min(when(col("cum") * 100 >= lit(p.toLong) * col("total"), col(valCol))).as(s"p${p}_s")
    hist
      .select(
        col(keyCol), col(valCol),
        sum(col("c")).over(cumW).as("cum"),
        sum(col("c")).over(totW).as("total"))
      .groupBy(col(keyCol))
      .agg(max(col("total")).as(nName), q(50), q(90), q(99))
  }

  /** Per-user event profile: scan + hash agg with a distinct-agg. */
  def userEventStats(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        sum(cents(col("value"))).as("value_cents"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event")
      )

  /** Exact global `row_number` WITHOUT a single-partition window — the extreme-
    * cardinality rank path [[rfm]] and [[activityPareto]] dispatch to. A range
    * exchange on the full sort order (tie-break included) puts partition i's rows
    * strictly before partition i+1's under that order, so
    * `global rank = rows-in-earlier-partitions + local rank`: the sort stays one
    * task PER RANGE, the offset census collapses to one bounded count per range
    * partition (numParts rows — sized by the CLUSTER, not the data — the repo's
    * bounded-collect discipline), and the offsets broadcast back onto the ranked
    * rows, so NO single-partition exchange touches a data-sized relation anywhere
    * in the plan (pinned in PlanSpec). The stamped partition id is checkpointed so
    * the census and the rank join consume ONE materialized assignment —
    * `spark_partition_id` is non-deterministic and must never be recomputed across
    * separate jobs. Ranks are exact and unique for any total order regardless of
    * where the range boundaries fall, so output is deterministic even though the
    * boundary sampling is not.
    */
  private[graft] def distributedRank(
      df: DataFrame,
      rankName: String,
      orderCols: Seq[Column],
      numParts: Int = 0
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the three scratch columns are reserved: a caller relation already carrying
    // one would silently corrupt the census join and lose its column to the final
    // drop — fail loudly instead (the helper is meant to be reused by future
    // extreme-cardinality rank sites)
    val reserved = Seq("__pid", "__lrk", "__off")
    val clash = df.columns.filter(c => reserved.contains(c) || c == rankName)
    require(clash.isEmpty,
      s"distributedRank: input already carries reserved/output column(s) ${clash.mkString(", ")}")
    val sp = df.sparkSession
    import sp.implicits._
    // numParts <= 0 → the session's shuffle parallelism: the extreme-cardinality
    // regime this function exists for must scale its range count with the CLUSTER,
    // not a constant (reviewed r10: a fixed 32 re-creates big tasks at 1e9 rows)
    val parts = if (numParts > 0) numParts else sp.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(parts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__pc"))
      .as[(Int, Long)].collect().sortBy(_._1) // bounded: one row per range partition
    val offsets = counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2).dropRight(1))
      .toSeq.toDF("__pid", "__off")
    parted
      .withColumn("__lrk",
        row_number().over(Window.partitionBy(col("__pid")).orderBy(orderCols: _*)).cast("long"))
      .join(broadcast(offsets), "__pid")
      .withColumn(rankName, col("__off") + col("__lrk"))
      .drop("__pid", "__lrk", "__off")
  }

  /** RFM segmentation: each user bucketed 1–5 (1 = best) on Recency (last event),
    * Frequency (event count), and Monetary (exact cents), plus the combined
    * three-digit RFM code — the standard audience-quality cut.
    *
    * Buckets are EXACT quintiles by rank: b = 1 + ((rank−1)·5) DIV n with
    * deterministic user_id tie-breaks, written as the same integer formula in the
    * oracle (no `ntile`, whose remainder convention this avoids, and no approximate
    * percentiles). The ranked relation is the PER-USER aggregate — events-table-sized
    * input, user-count-sized ranking problem. Below `maxGlobalWindowUsers` the three
    * ranks are plain global windows (bounded output, one task each); above it the
    * SAME exact ranks come from [[distributedRank]]'s repartitionByRange +
    * per-partition-offset form, with bucket arithmetic unchanged — the user count
    * the dispatch already paid for replaces the global count window in both
    * branches. Branch outputs are identical row-for-row (dispatch-identity pinned
    * in RoundTenOpsSpec).
    */
  def rfm(
      spark: SparkSession,
      dir: String,
      maxGlobalWindowUsers: Long = 2000000L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = eventsTsu(spark, dir, "user_id", "value")
      .groupBy(col("user_id"))
      .agg(
        max(col("tsu")).as("recency_us"),
        count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("monetary_cents"))
      .localCheckpoint(true) // two jobs: the dispatch count and the ranked chain
    val nUsers = perUser.count()
    val orders = Seq(
      "r_rank" -> Seq(col("recency_us").desc, col("user_id").asc),
      "f_rank" -> Seq(col("n_events").desc, col("user_id").asc),
      "m_rank" -> Seq(col("monetary_cents").desc, col("user_id").asc))
    val ranked =
      if (nUsers <= maxGlobalWindowUsers)
        orders.foldLeft(perUser) { case (acc, (name, ord)) =>
          acc.withColumn(name, row_number().over(Window.orderBy(ord: _*)).cast("long"))
        }
      else
        orders.foldLeft(perUser) { case (acc, (name, ord)) =>
          distributedRank(acc, name, ord)
        }
    ranked
      .withColumn("n_users", lit(nUsers))
      .select(
        col("user_id"), col("recency_us"), col("n_events"), col("monetary_cents"),
        expr("CAST(1 + (r_rank - 1) * 5 DIV n_users AS BIGINT)").as("r_bucket"),
        expr("CAST(1 + (f_rank - 1) * 5 DIV n_users AS BIGINT)").as("f_bucket"),
        expr("CAST(1 + (m_rank - 1) * 5 DIV n_users AS BIGINT)").as("m_bucket"))
      .withColumn("rfm_code",
        (col("r_bucket") * 100 + col("f_bucket") * 10 + col("m_bucket")).cast("long"))
  }

  /** Activity Pareto curve: users ranked by event count, cut into EXACT deciles
    * (1 = most active), each reporting its user count, event total, share of all
    * events, and the cumulative share — the concentration diagnostic ("the top 10%
    * of users generate X% of traffic") that decides whether per-user sampling caps
    * are worth building. Shares are micro-quantized from exact integer event counts.
    *
    * Scale shape: the ranked relation is the per-user AGGREGATE; the corpus totals
    * ride in as one broadcast row; the decile rollup is a 10-row hash agg and the
    * cumulative window runs over those 10 rows only. Same rank dispatch as [[rfm]]:
    * below `maxGlobalWindowUsers` the rank is one bounded-output global window;
    * above it [[distributedRank]] produces the identical exact ranks with the sort
    * distributed across range partitions (dispatch-identity pinned in
    * RoundTenOpsSpec).
    */
  def activityPareto(
      spark: SparkSession,
      dir: String,
      maxGlobalWindowUsers: Long = 2000000L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = table(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .localCheckpoint(true) // three consumers: dispatch count, totals row, ranked chain
    val rankOrder = Seq(col("n_events").desc, col("user_id").asc)
    val ranked =
      if (per.count() <= maxGlobalWindowUsers)
        per.withColumn("rank", row_number().over(Window.orderBy(rankOrder: _*)).cast("long"))
      else
        distributedRank(per, "rank", rankOrder)
    val totals = per.agg(
      sum(col("n_events")).as("total_events"),
      count(lit(1)).as("n_users_total"))
    ranked
      .crossJoin(broadcast(totals))
      .select(
        expr("CAST(1 + (rank - 1) * 10 DIV n_users_total AS BIGINT)").as("decile"),
        col("n_events"), col("total_events"))
      .groupBy(col("decile"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("n_events")).as("decile_events"),
        max(col("total_events")).as("total_events"))
      .withColumn("cum_events",
        sum(col("decile_events")).over(
          Window.orderBy(col("decile").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(
        col("decile"), col("n_users"), col("decile_events"),
        floor(lit(1000000.0) * col("decile_events").cast("double") /
          col("total_events").cast("double") + lit(0.5)).cast("long").as("share_micro"),
        floor(lit(1000000.0) * col("cum_events").cast("double") /
          col("total_events").cast("double") + lit(0.5)).cast("long").as("cum_share_micro"))
  }

  /** ev25 — KAPLAN–MEIER survival + NELSON–AALEN cumulative hazard over SESSION
    * durations: sessions are the ev2/ev12 maximal ≤1h-gap runs, each observed for
    * `duration = last − first` event time (bucketed to whole minutes — the curve's
    * time axis); a session whose last event falls within one session gap of the
    * corpus end is right-CENSORED (it may still be open — ending it at the window
    * edge would bias short), every other session genuinely ended. The curve is the
    * product-limit estimator Ŝ(t) = Π_{t'≤t} (1 − d/n) over durations with at least
    * one ended session, with the deaths-before-censoring convention (n_t counts
    * every session with duration ≥ t). This is THE dwell-time curve behind "how
    * long does a session last", with proper censoring — [[sessionStats]]'s detail
    * rolled into the estimator those distributions feed.
    *
    * Cross-engine float contract (the ev17/ev24 discipline, one step further): the
    * running product is NEVER accumulated in floats. Each step contributes
    * `ln_micro = ⌊10⁶·ln((n−d)/n) + ½⌋` — ONE ln on the identical exact-rational
    * double in both engines — and the accumulation is an exact BIGINT window sum of
    * those micro terms; Ŝ surfaces as one final `exp(cum/10⁶)`. The Nelson–Aalen
    * hazard Ĥ(t) = Σ d/n accumulates the same way (per-row micro term, integer
    * cumsum). A step that extinguishes the curve (d = n, ln 0 undefined) emits a
    * NULL term and a sticky zero flag instead — survival reads 0 from there on.
    *
    * Scale shape: sessionization is the canonical per-user-partition window sort
    * (state never leaves the user's partition) + one map-side-combinable hash-agg;
    * the corpus end rides in as a broadcast 1-row max; all cumulative windows run
    * over the DISTINCT-DURATION relation (minutes within the gap bound — a catalog,
    * not a fact table), so the unpartitioned windows are bounded regardless of
    * corpus size.
    */
  def survivalCurve(spark: SparkSession, dir: String, censorUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsu").asc, col("event_id").asc)
    val sessions = eventsTsu(spark, dir, "user_id", "event_id")
      .withColumn("prev", lag(col("tsu"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("tsu") - col("prev") > 3600000000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg((max(col("tsu")) - min(col("tsu"))).as("duration_us"), max(col("tsu")).as("last_tsu"))
    val corpusEnd = sessions.agg(max(col("last_tsu")).as("corpus_last"))
    val obs = sessions.crossJoin(broadcast(corpusEnd))
      .select(
        expr("duration_us DIV 60000000").as("t"),
        when(col("last_tsu") >= col("corpus_last") - lit(censorUs), 1L).otherwise(0L)
          .as("censored"))
    survivalCurveOf(obs)
  }

  /** The ev25 estimator kernel over explicit per-subject observations
    * `(t, censored ∈ {0,1})` — the planted-lifetime test and the monotonicity law
    * enter here.
    */
  private[graft] def survivalCurveOf(obs: DataFrame): DataFrame = {
    val byT = obs
      .groupBy(col("t"))
      .agg(
        sum(lit(1L) - col("censored")).as("n_events"),
        sum(col("censored")).as("n_censored"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_risk", sum(col("n_events") + col("n_censored")).over(wDesc))
      .filter(col("n_events") > 0) // KM steps only at event times (both engines filter here)
      .withColumn("ln_micro",
        when(col("n_events") === col("n_risk"), lit(null).cast("long"))
          .otherwise(floor(lit(1000000.0) *
            log((col("n_risk") - col("n_events")).cast("double") / col("n_risk").cast("double"))
            + lit(0.5)).cast("long")))
      .withColumn("haz_micro",
        floor(lit(1000000.0) * col("n_events").cast("double") / col("n_risk").cast("double")
          + lit(0.5)).cast("long"))
      .withColumn("cum_ln", sum(col("ln_micro")).over(wAsc))
      .withColumn("dead", max(when(col("ln_micro").isNull, 1).otherwise(0)).over(wAsc))
      .select(
        col("t").as("duration_days"),
        col("n_risk"), col("n_events"), col("n_censored"),
        when(col("dead") === 1, lit(0L))
          .otherwise(floor(lit(1000000.0) * exp(col("cum_ln").cast("double") / lit(1000000.0))
            + lit(0.5)).cast("long"))
          .as("survival_micro"),
        sum(col("haz_micro")).over(wAsc).as("cum_hazard_micro"))
  }

  /** ev32 — the FIRST-OCCURRENCE PRECEDENCE matrix: for every ordered event-type
    * pair (a, b), among users who exhibit BOTH types, how often a's first
    * occurrence precedes b's — the funnel-ordering diagnostic ("do users see
    * onboarding before purchase?") that general sequential-pattern mining
    * (PrefixSpan, Pei et al. 2001) answers with combinatorial per-user
    * candidate fans. First-occurrence semantics make it state-bounded: one
    * (user, type) row per user per type (|types| is a catalog), pairs fan
    * |types|² per user, counts roll up map-side. Precedence is strict on
    * (tsu, event_id) — the ev21 ordering key — so equal-timestamp ties break
    * deterministically and precede(a,b) + precede(b,a) = n_both exactly
    * (antisymmetry, property-pinned).
    */
  def typePrecedence(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("tsu").asc, col("event_id").asc)
    val firsts = eventsTsu(spark, dir, "user_id", "event_id", "event_type")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("tsu"), col("event_id"))
      .localCheckpoint(true) // both sides of the per-user pair join read it
    firsts.as("a")
      .join(firsts.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") =!= col("b.event_type"))
      .select(
        col("a.event_type").as("from_type"), col("b.event_type").as("to_type"),
        when(col("a.tsu") < col("b.tsu") ||
          (col("a.tsu") === col("b.tsu") && col("a.event_id") < col("b.event_id")), 1L)
          .otherwise(0L).as("prec"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_both"), sum(col("prec")).as("n_precede"))
      .select(col("from_type"), col("to_type"), col("n_both"), col("n_precede"),
        expr("(2 * 1000000 * n_precede + n_both) DIV (2 * n_both)")
          .cast("long").as("precede_micro"))
  }

  /** ev33 — the precedence matrix ACTUATED into a funnel (the d26→d28
    * measure-then-actuate discipline applied to stage ordering): among all
    * ordered 3-chains of distinct types, pick the one the ev32 matrix
    * supports with the most pairwise first-occurrence precedence evidence —
    * score = n_precede(s1,s2) + n_precede(s2,s3) + n_precede(s1,s3), the
    * pairwise likelihood of the linear order s1<s2<s3; ties break
    * (s1,s2,s3) ascending — then run the ev19 first-touch funnel OVER THE
    * CHOSEN CHAIN. Stage predicates are a relational join against the
    * broadcast 1-row decision, never a collected literal, so the DuckDB
    * oracle replays decision AND funnel in one statement (the t42/t56 gated
    * actuation discipline); the chain and its score ride every output row.
    *
    * Scale shape: the decision side fans the |types|²-row matrix to a
    * |types|³-row triple relation — type catalogs are tiny by construction,
    * so the global rank window is plan-sized, never event-sized; the funnel
    * side is ev19's chained per-user min-aggregations unchanged plus one
    * broadcast 1-row join per stage.
    */
  def precedenceFunnel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prec = typePrecedence(spark, dir).localCheckpoint(true)
    val trip = prec.as("ab")
      .join(prec.as("bc"), col("ab.to_type") === col("bc.from_type"))
      .join(prec.as("ac"),
        col("ac.from_type") === col("ab.from_type") &&
          col("ac.to_type") === col("bc.to_type"))
      .filter(col("ab.from_type") =!= col("bc.to_type"))
      .select(col("ab.from_type").as("s1"), col("ab.to_type").as("s2"),
        col("bc.to_type").as("s3"),
        (col("ab.n_precede") + col("bc.n_precede") + col("ac.n_precede")).as("score"))
    val wT = Window.orderBy(col("score").desc, col("s1").asc, col("s2").asc, col("s3").asc)
    val decision = trip.withColumn("rk", row_number().over(wT)).filter(col("rk") === 1)
      .select(col("s1"), col("s2"), col("s3"), col("score"))
      .localCheckpoint(true) // 1 row — every stage and every output row reads it
    val ev = eventsTsu(spark, dir, "user_id", "event_type").localCheckpoint(true)
    val d = broadcast(decision)
    val v = ev.join(d, col("event_type") === col("s1"))
      .groupBy(col("user_id")).agg(min(col("tsu")).as("t1"))
      .localCheckpoint(true)
    val c = ev.join(d, col("event_type") === col("s2"))
      .join(v, Seq("user_id")).filter(col("tsu") > col("t1"))
      .groupBy(col("user_id"), col("t1")).agg(min(col("tsu")).as("t2"))
      .localCheckpoint(true)
    val p = ev.join(d, col("event_type") === col("s3"))
      .join(c, Seq("user_id")).filter(col("tsu") > col("t2"))
      .groupBy(col("user_id"), col("t2")).agg(min(col("tsu")).as("t3"))
    def stepRow(step: Int, typeCol: String, df: DataFrame, gap: Column): DataFrame =
      df.agg(count(lit(1)).as("n_users"), coalesce(sum(gap), lit(0L)).as("sum_gap_us"))
        .crossJoin(d)
        .select(lit(step).as("step"), col(typeCol).as("event_type"),
          col("n_users"), col("sum_gap_us"), col("score"))
    stepRow(1, "s1", v, lit(0L))
      .unionByName(stepRow(2, "s2", c, col("t2") - col("t1")))
      .unionByName(stepRow(3, "s3", p, col("t3") - col("t2")))
  }
}
