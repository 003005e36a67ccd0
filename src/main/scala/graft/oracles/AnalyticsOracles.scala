package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Layout, Multimodal, Sampling, Similarity, Sketches, TextStats}

/** TPC-H-shaped relational analytics (q*) and event-stream analytics (ev*): this family's slice of [[SparkEntry.queries]] and
  * [[SparkEntry.oracleSql]] — the driver contract is unchanged, SparkEntry
  * concatenates the families. Shared pinned parameters and SQL fragments come
  * from [[OracleFragments]].
  */
private[graft] object AnalyticsOracles extends OracleFragments {

  val queries: Map[String, Q] = Map[String, Q](
    // --- general analytics (bench headliners) ---
    "q01_pricing_summary"    -> (AnalyticsQueries.pricingSummary _),
    "q03_top_revenue_orders" -> (AnalyticsQueries.topRevenueOrders _),
    "q05_region_revenue"     -> (AnalyticsQueries.regionRevenue _),
    "q06_revenue_rollup"     -> (AnalyticsQueries.regionRevenueRollup _),
    "q07_selective_revenue"  -> (AnalyticsQueries.selectiveRevenue _),
    "q02_brand_nation_volume" -> (AnalyticsQueries.brandNationVolume _),
    "ev1_user_event_stats"   -> (AnalyticsQueries.userEventStats _),
    "ev2_sessionize"         -> (AnalyticsQueries.sessionize _),
    "ev3_hourly_rollup"      -> (AnalyticsQueries.hourlyRollup _),
    "ev4_props_extract"      -> (AnalyticsQueries.propsExtract _),
    "ev5_hourly_top_users"   -> ((s: SparkSession, dir: String) =>
      AnalyticsQueries.hourlyTopUsers(s, dir, k = 3)),
    "ev6_hourly_retention"   -> (AnalyticsQueries.hourlyRetention _),
    "ev7_hourly_anomaly"     -> (AnalyticsQueries.hourlyAnomaly _),
    "ev8_asof_join"          -> ((s: SparkSession, dir: String) =>
      AnalyticsQueries.asofJoin(s, dir)),
    "ev9_funnel_stages"      -> (AnalyticsQueries.funnelStages _),
    "ev10_type_pivot"        -> (AnalyticsQueries.eventTypePivot _),
    "ev11_rolling_actives"   -> (AnalyticsQueries.rollingActiveUsers _),
    "q04_late_priority"      -> (AnalyticsQueries.latePriorityOrders _),
    "ev12_session_stats"     -> (AnalyticsQueries.sessionStats _),
    "q08_market_share"       -> (AnalyticsQueries.marketShare _),
    "ev13_churn"             -> (AnalyticsQueries.churnRollup _),
    "q09_returned_revenue"   -> (AnalyticsQueries.returnedRevenue _),
    "ev14_cohort_retention" -> (AnalyticsQueries.cohortRetention _),
    "ev15_attribution" -> ((s: SparkSession, dir: String) =>
      AnalyticsQueries.attribution(s, dir, lookbackUs = AttributionLookbackUs)),
    "ev16_rfm" -> ((s: SparkSession, d: String) => AnalyticsQueries.rfm(s, d)),
    "ev17_activity_pareto" -> ((s: SparkSession, d: String) => AnalyticsQueries.activityPareto(s, d)),
    "ev18_gap_quantiles" -> (AnalyticsQueries.gapQuantiles _),
    "ev19_funnel" -> (AnalyticsQueries.funnel _),
    "ev20_funnel_latency" -> (AnalyticsQueries.funnelLatency _),
    "ev21_type_transitions" -> (AnalyticsQueries.typeTransitions _),
    "ev22_transition_entropy" -> (AnalyticsQueries.transitionEntropy _),
    "ev23_markov_stationary" -> ((s: SparkSession, d: String) =>
      AnalyticsQueries.markovStationary(s, d, rounds = MarkovRounds)),
    "ev24_funnel_wilson" -> (AnalyticsQueries.funnelWilson _),
    "ev25_survival" -> ((s: SparkSession, d: String) =>
      AnalyticsQueries.survivalCurve(s, d, censorUs = KmCensorUs)),
    "ev26_ab_lift" -> (AnalyticsQueries.abLift _),
    "ev27_hour_profile" -> (AnalyticsQueries.hourProfile _),
    "ev28_gini" -> (AnalyticsQueries.giniConcentration _),
    "ev29_bot_battery" -> ((s: SparkSession, dir: String) =>
      AnalyticsQueries.botBattery(s, dir)),
    "ev30_cusum" -> ((s: SparkSession, dir: String) =>
      AnalyticsQueries.cusumChangepoint(s, dir)),
    // first-occurrence precedence matrix: among users with both types, how
    // often a's first occurrence precedes b's (strict (tsu, event_id) order) —
    // the state-bounded funnel-ordering alternative to sequential-pattern
    // mining's combinatorial candidate fan
    "ev32_type_precedence" -> (AnalyticsQueries.typePrecedence _),
    "ev33_precedence_funnel" -> (AnalyticsQueries.precedenceFunnel _),
    "ev31_top_paths" -> ((s: SparkSession, dir: String) =>
      AnalyticsQueries.topEventPaths(s, dir)),
    "q10_waiting_suppliers" -> (AnalyticsQueries.waitingSuppliers _),
    "q11_small_qty_revenue" -> ((s: SparkSession, d: String) =>
      AnalyticsQueries.smallQuantityRevenue(s, d)),
    "q12_idle_rich_customers" -> (AnalyticsQueries.idleRichCustomers _),
    "q13_custdist" -> (AnalyticsQueries.customerOrderDistribution _),
    "q14_promo_share" -> ((s: SparkSession, d: String) =>
      AnalyticsQueries.promoRevenue(s, d)),
    "q18_large_volume" -> ((s: SparkSession, d: String) =>
      AnalyticsQueries.largeVolumeCustomers(s, d)),
    "q19_disjunctive_revenue" -> (AnalyticsQueries.disjunctiveRevenue _),
    "q17_min_cost_supplier" -> ((s: SparkSession, d: String) =>
      AnalyticsQueries.minCostSupplier(s, d)),
    "q15_top_supplier" -> ((s: SparkSession, d: String) =>
      AnalyticsQueries.topSupplier(s, d)),
    "q16_supplier_variety" -> ((s: SparkSession, d: String) =>
      AnalyticsQueries.supplierVariety(s, d)),
    "q20_excess_shippers" -> ((s: SparkSession, d: String) =>
      AnalyticsQueries.excessShippers(s, d)),
    "q21_product_profit" -> (AnalyticsQueries.productProfit _),
  )

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
         |  CAST(SUM($revBp) AS BIGINT) AS sum_disc_bp,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q03_top_revenue_orders" ->
      s"""WITH rev AS (
         |  SELECT l_orderkey, CAST(SUM($revBp) AS BIGINT) AS revenue_bp
         |  FROM lineitem GROUP BY l_orderkey)
         |SELECT o_orderkey, o_custkey, revenue_bp
         |FROM rev JOIN orders ON l_orderkey = o_orderkey
         |ORDER BY revenue_bp DESC, o_orderkey LIMIT 10""".stripMargin,
    "q05_region_revenue" ->
      s"""SELECT r_name, n_name, CAST(SUM($revBp) AS BIGINT) AS revenue_bp, COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name""".stripMargin,

    // region→nation revenue ROLLUP with grouping flags — mirror of
    // AnalyticsQueries.regionRevenueRollup (one grouping-sets aggregation)
    "q06_revenue_rollup" ->
      s"""SELECT r_name, n_name, CAST(SUM($revBp) AS BIGINT) AS revenue_bp, COUNT(*) AS n_items,
         |  CAST(GROUPING(r_name) AS INTEGER) AS g_region,
         |  CAST(GROUPING(n_name) AS INTEGER) AS g_nation
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    // Q6-style selective revenue (pushed predicates + pruned scan) — mirror of
    // AnalyticsQueries.selectiveRevenue
    "q07_selective_revenue" ->
      s"""SELECT CAST(SUM($revBp) AS BIGINT) AS revenue_bp, COUNT(*) AS n_items
         |FROM lineitem WHERE l_quantity < 25 AND l_discount >= 0.05""".stripMargin,

    // per-user event-type pivot (pinned type list) — mirror of
    // AnalyticsQueries.eventTypePivot
    "ev10_type_pivot" ->
      s"""SELECT user_id,
         |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
         |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
         |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
         |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
         |FROM events GROUP BY user_id""".stripMargin,
    "q02_brand_nation_volume" ->
      s"""SELECT n_name, p_brand,
         |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         |  CAST(SUM($revBp) AS BIGINT) AS revenue_bp,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN part ON l_partkey = p_partkey
         |GROUP BY n_name, p_brand""".stripMargin,
    "ev1_user_event_stats" ->
      s"""SELECT user_id, COUNT(*) AS n_events,
         |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
         |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
         |  MIN(event_id) AS first_event, MAX(event_id) AS last_event
         |FROM events GROUP BY user_id""".stripMargin,
    "ev2_sessionize" ->
      s"""WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
         |s AS (SELECT user_id, tsu,
         |        CASE WHEN prev IS NULL OR tsu - prev > 3600000000 THEN 1 ELSE 0 END AS brk
         |      FROM (SELECT user_id, tsu,
         |              lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev
         |            FROM t))
         |SELECT user_id, CAST(SUM(brk) AS BIGINT) AS n_sessions,
         |       CAST(MAX(tsu) - MIN(tsu) AS BIGINT) AS span_us
         |FROM s GROUP BY user_id""".stripMargin,

    // inter-event gap quantiles per type: per-user (tsu, event_id)-ordered lag,
    // whole-second gaps, then the t17 cumulated-histogram exact quantiles —
    // mirror of AnalyticsQueries.gapQuantiles
    // first-touch ordered funnel: step k anchors at the first step-k event
    // strictly after the anchored step k-1 — mirror of AnalyticsQueries.funnel
    "ev19_funnel" ->
      s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events),
         |v AS (SELECT user_id, MIN(tsu) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT ev.user_id, v.t1, MIN(ev.tsu) AS t2
         |      FROM ev JOIN v USING (user_id)
         |      WHERE ev.event_type = 'click' AND ev.tsu > v.t1 GROUP BY 1, 2),
         |p AS (SELECT ev.user_id, c.t2, MIN(ev.tsu) AS t3
         |      FROM ev JOIN c USING (user_id)
         |      WHERE ev.event_type = 'purchase' AND ev.tsu > c.t2 GROUP BY 1, 2)
         |SELECT 1 AS step, 'view' AS event_type, COUNT(*) AS n_users,
         |       CAST(0 AS BIGINT) AS sum_gap_us FROM v
         |UNION ALL SELECT 2, 'click', COUNT(*),
         |       CAST(COALESCE(SUM(t2 - t1), 0) AS BIGINT) FROM c
         |UNION ALL SELECT 3, 'purchase', COUNT(*),
         |       CAST(COALESCE(SUM(t3 - t2), 0) AS BIGINT) FROM p""".stripMargin,

    // per-(user, type) first occurrence by (tsu, event_id), |types|²-per-user
    // pair fan, strict-precedence counts — mirror of AnalyticsQueries.typePrecedence
    "ev32_type_precedence" ->
      s"""WITH t AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu FROM events),
         |f AS (SELECT user_id, event_type, tsu, event_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY user_id, event_type
         |      ORDER BY tsu, event_id) AS rn FROM t)
         |  WHERE rn = 1),
         |p AS (SELECT a.event_type AS from_type, b.event_type AS to_type,
         |        CASE WHEN a.tsu < b.tsu OR (a.tsu = b.tsu AND a.event_id < b.event_id)
         |             THEN 1 ELSE 0 END AS prec
         |      FROM f a JOIN f b ON a.user_id = b.user_id
         |                       AND a.event_type <> b.event_type)
         |SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_both,
         |  CAST(SUM(prec) AS BIGINT) AS n_precede,
         |  CAST((2 * 1000000 * CAST(SUM(prec) AS BIGINT) + COUNT(*)) // (2 * COUNT(*))
         |    AS BIGINT) AS precede_micro
         |FROM p GROUP BY 1, 2""".stripMargin,

    // the ev32 matrix actuated: max-evidence ordered 3-chain (pairwise
    // precedence sum, lexicographic ties) picked relationally, then the ev19
    // funnel joined against the 1-row decision — mirror of
    // AnalyticsQueries.precedenceFunnel (the gated-actuation discipline)
    "ev33_precedence_funnel" ->
      s"""WITH t AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu FROM events),
         |f AS (SELECT user_id, event_type, tsu, event_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY user_id, event_type
         |      ORDER BY tsu, event_id) AS rn FROM t)
         |  WHERE rn = 1),
         |pr AS (SELECT a.event_type AS from_type, b.event_type AS to_type,
         |        CASE WHEN a.tsu < b.tsu OR (a.tsu = b.tsu AND a.event_id < b.event_id)
         |             THEN 1 ELSE 0 END AS prec
         |      FROM f a JOIN f b ON a.user_id = b.user_id
         |                       AND a.event_type <> b.event_type),
         |pm AS (SELECT from_type, to_type, CAST(SUM(prec) AS BIGINT) AS n_precede
         |       FROM pr GROUP BY 1, 2),
         |tri AS (SELECT ab.from_type AS s1, ab.to_type AS s2, bc.to_type AS s3,
         |          ab.n_precede + bc.n_precede + ac.n_precede AS score
         |        FROM pm ab
         |        JOIN pm bc ON ab.to_type = bc.from_type
         |        JOIN pm ac ON ac.from_type = ab.from_type AND ac.to_type = bc.to_type
         |        WHERE ab.from_type <> bc.to_type),
         |dec AS (SELECT s1, s2, s3, score FROM (
         |    SELECT *, row_number() OVER (ORDER BY score DESC, s1, s2, s3) AS rk FROM tri)
         |  WHERE rk = 1),
         |ev AS (SELECT user_id, event_type, tsu FROM t),
         |v AS (SELECT user_id, MIN(tsu) AS t1
         |      FROM ev JOIN dec ON ev.event_type = dec.s1 GROUP BY 1),
         |c AS (SELECT ev.user_id, v.t1, MIN(ev.tsu) AS t2
         |      FROM ev JOIN dec ON ev.event_type = dec.s2
         |      JOIN v USING (user_id) WHERE ev.tsu > v.t1 GROUP BY 1, 2),
         |pp AS (SELECT ev.user_id, c.t2, MIN(ev.tsu) AS t3
         |      FROM ev JOIN dec ON ev.event_type = dec.s3
         |      JOIN c USING (user_id) WHERE ev.tsu > c.t2 GROUP BY 1, 2)
         |SELECT 1 AS step, d.s1 AS event_type, x.n_users, x.sum_gap_us, d.score
         |FROM dec d CROSS JOIN
         |  (SELECT COUNT(*) AS n_users, CAST(0 AS BIGINT) AS sum_gap_us FROM v) x
         |UNION ALL SELECT 2, d.s2, x.n_users, x.sum_gap_us, d.score
         |FROM dec d CROSS JOIN
         |  (SELECT COUNT(*) AS n_users,
         |          CAST(COALESCE(SUM(t2 - t1), 0) AS BIGINT) AS sum_gap_us FROM c) x
         |UNION ALL SELECT 3, d.s3, x.n_users, x.sum_gap_us, d.score
         |FROM dec d CROSS JOIN
         |  (SELECT COUNT(*) AS n_users,
         |          CAST(COALESCE(SUM(t3 - t2), 0) AS BIGINT) AS sum_gap_us FROM pp) x""".stripMargin,

    // first-order Markov transition matrix: per-user (tsu, event_id)-ordered
    // lead() steps, |types|² counts, per-from-type rate in the shared half-up
    // integer micro form — mirror of AnalyticsQueries.typeTransitions
    "ev21_type_transitions" ->
      s"""WITH t AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu FROM events),
         |p AS (SELECT event_type AS from_type,
         |        lead(event_type) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS to_type
         |      FROM t),
         |c AS (SELECT from_type, to_type, COUNT(*) AS n_steps
         |      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
         |SELECT from_type, to_type, CAST(n_steps AS BIGINT) AS n_steps,
         |  CAST((2 * 1000000 * n_steps + ft) // (2 * ft) AS BIGINT) AS rate_micro
         |FROM (SELECT *, CAST(SUM(n_steps) OVER (PARTITION BY from_type) AS BIGINT) AS ft
         |      FROM c)""".stripMargin,

    // ev19's step counts with Wilson 95% bounds — one fixed double sequence
    // from exact counts (literal constants written as the same expressions
    // both engines fold identically) — mirror of AnalyticsQueries.funnelWilson
    "ev24_funnel_wilson" -> {
      def w(x: String, n: String) =
        s"""CAST(CASE WHEN $n = 0 THEN 0
           |     ELSE (2 * 1000000 * $x + $n) // (2 * $n) END AS BIGINT) AS rate_micro,
           |  CAST(CASE WHEN $n = 0 THEN 0
           |     ELSE floor(1000000.0 * (($x::DOUBLE + 1.96*1.96/2) / ($n::DOUBLE + 1.96*1.96)
           |       - (1.96 / ($n::DOUBLE + 1.96*1.96))
           |         * sqrt($x::DOUBLE * ($n::DOUBLE - $x::DOUBLE) / $n::DOUBLE + 1.96*1.96/4))
           |       + 0.5) END AS BIGINT) AS wilson_low_micro,
           |  CAST(CASE WHEN $n = 0 THEN 0
           |     ELSE floor(1000000.0 * (($x::DOUBLE + 1.96*1.96/2) / ($n::DOUBLE + 1.96*1.96)
           |       + (1.96 / ($n::DOUBLE + 1.96*1.96))
           |         * sqrt($x::DOUBLE * ($n::DOUBLE - $x::DOUBLE) / $n::DOUBLE + 1.96*1.96/4))
           |       + 0.5) END AS BIGINT) AS wilson_high_micro""".stripMargin
      s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events),
         |v AS (SELECT user_id, MIN(tsu) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT ev.user_id, v.t1, MIN(ev.tsu) AS t2
         |      FROM ev JOIN v USING (user_id)
         |      WHERE ev.event_type = 'click' AND ev.tsu > v.t1 GROUP BY 1, 2),
         |p AS (SELECT ev.user_id, c.t2, MIN(ev.tsu) AS t3
         |      FROM ev JOIN c USING (user_id)
         |      WHERE ev.event_type = 'purchase' AND ev.tsu > c.t2 GROUP BY 1, 2),
         |nn AS (SELECT (SELECT COUNT(*) FROM v) AS n_view,
         |              (SELECT COUNT(*) FROM c) AS n_click,
         |              (SELECT COUNT(*) FROM p) AS n_buy)
         |SELECT 'view_to_click' AS step, CAST(n_view AS BIGINT) AS n_prev,
         |  CAST(n_click AS BIGINT) AS n_conv,
         |  ${w("n_click", "n_view")}
         |FROM nn
         |UNION ALL
         |SELECT 'click_to_purchase', CAST(n_click AS BIGINT), CAST(n_buy AS BIGINT),
         |  ${w("n_buy", "n_click")}
         |FROM nn""".stripMargin
    },

    // two-proportion A/B readout: md5-parity arm split over view-exposed users,
    // conversion = purchase after first view (ev19 step-2 semantics), pooled z
    // as ONE double sequence over exact counts (the ev24 foldable-constant
    // convention), half-up integer rates — mirror of AnalyticsQueries.abLift
    "ev26_ab_lift" -> {
      def rate(x: String, n: String) =
        s"CAST(CASE WHEN $n = 0 THEN 0 ELSE (2 * 1000000 * $x + $n) // (2 * $n) END AS BIGINT)"
      val pHat = "(conv_control + conv_variant)::DOUBLE / (n_control + n_variant)::DOUBLE"
      s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events),
         |v AS (SELECT user_id, MIN(tsu) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
         |cv AS (SELECT DISTINCT ev.user_id
         |       FROM ev JOIN v USING (user_id)
         |       WHERE ev.event_type = 'purchase' AND ev.tsu > v.t1),
         |pu AS (SELECT
         |         ('0x' || substr(md5(CAST(v.user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm,
         |         CASE WHEN cv.user_id IS NULL THEN 0 ELSE 1 END AS conv
         |       FROM v LEFT JOIN cv ON cv.user_id = v.user_id),
         |cnt AS (SELECT
         |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
         |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_control,
         |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_variant,
         |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_variant
         |  FROM pu),
         |z AS (SELECT *,
         |    CAST(CASE WHEN n_control = 0 OR n_variant = 0
         |           OR conv_control + conv_variant = 0
         |           OR conv_control + conv_variant = n_control + n_variant THEN 0
         |      ELSE floor(1000000.0 * (
         |        (conv_variant::DOUBLE / n_variant::DOUBLE
         |          - conv_control::DOUBLE / n_control::DOUBLE)
         |        / sqrt($pHat * (1.0 - $pHat)
         |            * (1.0 / n_control::DOUBLE + 1.0 / n_variant::DOUBLE))) + 0.5)
         |      END AS BIGINT) AS z_micro
         |  FROM cnt)
         |SELECT n_control, conv_control, n_variant, conv_variant,
         |  ${rate("conv_control", "n_control")} AS rate_control_micro,
         |  ${rate("conv_variant", "n_variant")} AS rate_variant_micro,
         |  ${rate("conv_variant", "n_variant")} - ${rate("conv_control", "n_control")}
         |    AS lift_micro,
         |  z_micro,
         |  CAST(CASE WHEN abs(z_micro) >= 1960000 THEN 1 ELSE 0 END AS INTEGER) AS significant
         |FROM z""".stripMargin
    },

    // 24-bin diurnal profile per type: integer epoch-hour bins, exact-integer
    // chi-square numerator (24·ΣO² − n²) with ONE double division, argmax peak
    // with smallest-hour tie-break — mirror of AnalyticsQueries.hourProfile
    "ev27_hour_profile" ->
      """WITH t AS (SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour FROM events),
        |a AS (SELECT event_type, hour, COUNT(*) AS o FROM t GROUP BY 1, 2),
        |g AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS n_events,
        |        CAST(COUNT(*) AS BIGINT) AS n_hours_active,
        |        CAST(SUM(o * o) AS BIGINT) AS s2,
        |        CAST(MAX(o) AS BIGINT) AS max_o
        |      FROM a GROUP BY 1),
        |pk AS (SELECT a.event_type, CAST(MIN(a.hour) AS BIGINT) AS peak_hour
        |       FROM a JOIN g USING (event_type) WHERE a.o = g.max_o GROUP BY 1)
        |SELECT g.event_type, n_events, n_hours_active, peak_hour,
        |  CAST((2 * 1000000 * max_o + n_events) // (2 * n_events) AS BIGINT)
        |    AS peak_share_micro,
        |  CAST(floor((1000000.0 * (24 * s2 - n_events * n_events)) / n_events::DOUBLE + 0.5)
        |    AS BIGINT) AS chi2_micro
        |FROM g JOIN pk USING (event_type)""".stripMargin,

    // per-type Gini over per-user event counts, the PLAIN per-user rank window
    // (proving the Spark side's histogram rank-sum reduction exact — the dc24
    // discipline); ties ranked arbitrarily contribute the same Σ i·x —
    // mirror of AnalyticsQueries.giniConcentration
    "ev28_gini" ->
      """WITH pu AS (SELECT event_type, user_id, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |rk AS (SELECT event_type, cnt,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cnt, user_id) AS i
        |  FROM pu),
        |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(cnt) AS BIGINT) AS total_events,
        |    CAST(SUM(i * cnt) AS BIGINT) AS s
        |  FROM rk GROUP BY 1)
        |SELECT event_type, n_users, total_events,
        |  CAST(floor(1000000.0 * CAST(2 * s - (n_users + 1) * total_events AS BIGINT)
        |    / (CAST(n_users AS DOUBLE) * CAST(total_events AS DOUBLE)) + 0.5)
        |    AS BIGINT) AS gini_micro
        |FROM g""".stripMargin,

    // per-user automation screen: lag-window whole-second gaps (tie order
    // cannot change the aggregates — equal timestamps permute equal gaps),
    // exact CV² and rate, ev27's peak-share idiom, m08-style reason bits —
    // mirror of AnalyticsQueries.botBattery defaults (120/h, 0.1, 0.5)
    "ev29_bot_battery" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
        |g AS (SELECT user_id, tsu,
        |    (tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu)) // 1000000 AS gs
        |  FROM e),
        |st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(max(tsu) - min(tsu) AS BIGINT) AS span_us,
        |    CAST(sum(gs) AS BIGINT) AS s, CAST(sum(gs * gs) AS BIGINT) AS s2,
        |    CAST(count(gs) AS BIGINT) AS ng
        |  FROM g GROUP BY 1 HAVING count(*) >= 3),
        |h AS (SELECT user_id, (tsu // 3600000000) % 24 AS hour, count(*) AS o
        |  FROM e GROUP BY 1, 2),
        |pk AS (SELECT user_id,
        |    CAST((2 * 1000000 * max(o) + sum(o)) // (2 * sum(o)) AS BIGINT) AS peak_share_micro
        |  FROM h GROUP BY 1),
        |sc AS (SELECT st.user_id, n_events, span_us,
        |    CAST(CASE WHEN span_us > 0 THEN (n_events * 3600000000) // span_us
        |         ELSE -1 END AS BIGINT) AS rate_per_hour,
        |    CAST(CASE WHEN s > 0 THEN floor(1000000.0 * CAST(ng * s2 - s * s AS BIGINT)
        |           / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) + 0.5)
        |         ELSE 0 END AS BIGINT) AS cv2_micro,
        |    s, peak_share_micro
        |  FROM st JOIN pk USING (user_id)),
        |rs AS (SELECT *,
        |    CAST(CASE WHEN span_us = 0 OR rate_per_hour >= 120 THEN 1 ELSE 0 END
        |      + CASE WHEN s > 0 AND cv2_micro <= 100000 THEN 2 ELSE 0 END
        |      + CASE WHEN peak_share_micro >= 500000 THEN 4 ELSE 0 END AS BIGINT) AS reasons
        |  FROM sc)
        |SELECT user_id, n_events, span_us, rate_per_hour, cv2_micro, peak_share_micro,
        |  reasons, CAST(CASE WHEN reasons <> 0 THEN 1 ELSE 0 END AS INTEGER) AS bot
        |FROM rs""".stripMargin,

    // Page's CUSUM per type via the cumsum − running-min identity (the max(0,·)
    // reset IS subtracting the running minimum), zero-filled global hour grid,
    // μ half-up micro, slack μ//2, alarm at 5μ — mirror of
    // AnalyticsQueries.cusumChangepoint defaults
    "ev30_cusum" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events),
        |c AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS o FROM e GROUP BY 1, 2),
        |b AS (SELECT min(h) AS hmin, max(h) AS hmax FROM c),
        |m AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS total_events FROM c GROUP BY 1),
        |gr AS (SELECT unnest(generate_series((SELECT hmin FROM b), (SELECT hmax FROM b))) AS h),
        |g AS (SELECT m.event_type, m.total_events, gr.h,
        |    (SELECT hmax FROM b) - (SELECT hmin FROM b) + 1 AS n_hours,
        |    (SELECT hmax FROM b) AS hmax
        |  FROM m CROSS JOIN gr),
        |gx AS (SELECT g.*, COALESCE(c.o, 0) AS o,
        |    CAST((2 * 1000000 * total_events + n_hours) // (2 * n_hours) AS BIGINT) AS mean_micro
        |  FROM g LEFT JOIN c ON c.event_type = g.event_type AND c.h = g.h),
        |d AS (SELECT *, 1000000 * o - mean_micro - mean_micro // 2 AS dev FROM gx),
        |z AS (SELECT *, CAST(SUM(dev) OVER (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS z FROM d),
        |cs AS (SELECT *, z - least(CAST(MIN(z) OVER (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 0) AS cusum FROM z),
        |mx AS (SELECT event_type, CAST(max(cusum) AS BIGINT) AS mc FROM cs GROUP BY 1),
        |pk AS (SELECT cs.event_type, CAST(min(cs.h) AS BIGINT) AS peak_hour_index
        |  FROM cs JOIN mx ON cs.event_type = mx.event_type AND cs.cusum = mx.mc
        |  GROUP BY 1),
        |st AS (SELECT DISTINCT event_type, CAST(n_hours AS BIGINT) AS n_hours,
        |    total_events, mean_micro FROM cs)
        |SELECT st.event_type, n_hours, total_events, mean_micro,
        |  mc AS max_cusum_micro, peak_hour_index,
        |  CAST(CASE WHEN mc >= mean_micro * 5 THEN 1 ELSE 0 END AS INTEGER) AS alarm
        |FROM st JOIN mx ON st.event_type = mx.event_type
        |JOIN pk ON st.event_type = pk.event_type""".stripMargin,

    // consecutive (tsu, event_id)-ordered triples per user, each hop within the
    // 1 h session gap, counted and top-20 ranked with the lexicographic
    // tie-break — mirror of AnalyticsQueries.topEventPaths defaults
    "ev31_top_paths" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu, event_type FROM events),
        |w AS (SELECT user_id, tsu, event_type AS t1,
        |    lead(event_type, 1) OVER u AS t2, lead(event_type, 2) OVER u AS t3,
        |    lead(tsu, 1) OVER u AS ts2, lead(tsu, 2) OVER u AS ts3
        |  FROM e WINDOW u AS (PARTITION BY user_id ORDER BY tsu, event_id)),
        |p AS (SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n_paths
        |  FROM w
        |  WHERE t3 IS NOT NULL AND ts2 - tsu <= 3600000000 AND ts3 - ts2 <= 3600000000
        |  GROUP BY 1, 2, 3),
        |r AS (SELECT *, row_number() OVER (ORDER BY n_paths DESC, t1, t2, t3) AS rank
        |  FROM p)
        |SELECT t1, t2, t3, n_paths, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 20""".stripMargin,

    // bounded power iteration over the ev21 matrix: uniform v0 over the type
    // catalog, each round one exact BIGINT matrix-vector product + floor div,
    // grid-completed — mirror of AnalyticsQueries.markovStationary
    "ev23_markov_stationary" -> {
      def round(r: Int) =
        s"""s$r AS (SELECT m.to_type AS ty, CAST(SUM(v.v * m.rate_micro) // 1000000 AS BIGINT) AS v
           |       FROM v${r - 1} v JOIN m ON m.from_type = v.ty GROUP BY 1),
           |v$r AS (SELECT ty.ty, COALESCE(s$r.v, 0) AS v FROM ty LEFT JOIN s$r USING (ty))"""
          .stripMargin
      s"""WITH t AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu FROM events),
         |p AS (SELECT event_type AS from_type,
         |        lead(event_type) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS to_type
         |      FROM t),
         |c AS (SELECT from_type, to_type, COUNT(*) AS n_steps
         |      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |m AS (SELECT from_type, to_type,
         |        CAST((2 * 1000000 * n_steps + ft) // (2 * ft) AS BIGINT) AS rate_micro
         |      FROM (SELECT *, CAST(SUM(n_steps) OVER (PARTITION BY from_type) AS BIGINT) AS ft
         |            FROM c)),
         |ty AS (SELECT DISTINCT event_type AS ty FROM events),
         |nn AS (SELECT COUNT(*) AS n FROM ty),
         |v0 AS (SELECT ty, CAST((2 * 1000000 + n) // (2 * n) AS BIGINT) AS v
         |       FROM ty CROSS JOIN nn),
         |${(1 to MarkovRounds).map(round).mkString(",\n")}
         |SELECT ty AS event_type, v AS stationary_micro FROM v$MarkovRounds""".stripMargin
    },

    // per-from-type Shannon entropy of the ev21 matrix: per-row micro-quantized
    // (n/N)·ln(N/n) terms (the t45 ln discipline), exact integer sum — mirror
    // of AnalyticsQueries.transitionEntropy
    "ev22_transition_entropy" ->
      s"""WITH t AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu FROM events),
         |p AS (SELECT event_type AS from_type,
         |        lead(event_type) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS to_type
         |      FROM t),
         |c AS (SELECT from_type, to_type, COUNT(*) AS n_steps
         |      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |m AS (SELECT *, CAST(SUM(n_steps) OVER (PARTITION BY from_type) AS BIGINT) AS ft
         |      FROM c)
         |SELECT from_type, COUNT(*) AS n_out_types,
         |  CAST(MAX(ft) AS BIGINT) AS n_steps_total,
         |  CAST(SUM(CAST(floor(1000000.0 * (n_steps::DOUBLE / ft::DOUBLE)
         |      * ln(ft::DOUBLE / n_steps::DOUBLE) + 0.5) AS BIGINT)) AS BIGINT)
         |    AS entropy_micro
         |FROM m GROUP BY from_type""".stripMargin,

    // the ev19 anchors' conversion delays through the ev18 exact-quantile fold
    // — mirror of AnalyticsQueries.funnelLatency
    "ev20_funnel_latency" ->
      s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events),
         |v AS (SELECT user_id, MIN(tsu) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT ev.user_id, v.t1, MIN(ev.tsu) AS t2
         |      FROM ev JOIN v USING (user_id)
         |      WHERE ev.event_type = 'click' AND ev.tsu > v.t1 GROUP BY 1, 2),
         |p AS (SELECT ev.user_id, c.t2, MIN(ev.tsu) AS t3
         |      FROM ev JOIN c USING (user_id)
         |      WHERE ev.event_type = 'purchase' AND ev.tsu > c.t2 GROUP BY 1, 2),
         |g AS (SELECT 'view_to_click' AS stage, (t2 - t1) // 1000000 AS gap_s FROM c
         |      UNION ALL
         |      SELECT 'click_to_purchase', (t3 - t2) // 1000000 FROM p),
         |h AS (SELECT stage, gap_s, COUNT(*) AS c FROM g GROUP BY 1, 2),
         |cm AS (SELECT stage, gap_s,
         |         SUM(c) OVER (PARTITION BY stage ORDER BY gap_s
         |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         SUM(c) OVER (PARTITION BY stage) AS total
         |       FROM h)
         |SELECT stage, CAST(MAX(total) AS BIGINT) AS n_conv,
         |  MIN(CASE WHEN cum * 100 >= 50 * total THEN gap_s END) AS p50_s,
         |  MIN(CASE WHEN cum * 100 >= 90 * total THEN gap_s END) AS p90_s,
         |  MIN(CASE WHEN cum * 100 >= 99 * total THEN gap_s END) AS p99_s
         |FROM cm GROUP BY stage""".stripMargin,

    "ev18_gap_quantiles" ->
      s"""WITH t AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu FROM events),
         |g AS (SELECT event_type, (tsu - prev) // 1000000 AS gap_s
         |      FROM (SELECT event_type, tsu,
         |              lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev
         |            FROM t)
         |      WHERE prev IS NOT NULL),
         |h AS (SELECT event_type, gap_s, COUNT(*) AS c FROM g GROUP BY 1, 2),
         |cm AS (SELECT event_type, gap_s,
         |         SUM(c) OVER (PARTITION BY event_type ORDER BY gap_s
         |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         SUM(c) OVER (PARTITION BY event_type) AS total
         |       FROM h)
         |SELECT event_type, CAST(MAX(total) AS BIGINT) AS n_gaps,
         |  MIN(CASE WHEN cum * 100 >= 50 * total THEN gap_s END) AS p50_s,
         |  MIN(CASE WHEN cum * 100 >= 90 * total THEN gap_s END) AS p90_s,
         |  MIN(CASE WHEN cum * 100 >= 99 * total THEN gap_s END) AS p99_s
         |FROM cm GROUP BY event_type""".stripMargin,
    "ev3_hourly_rollup" ->
      s"""SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
         |  COUNT(*) AS n,
         |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         |FROM events GROUP BY 1, 2""".stripMargin,

    // per-hour top-3 users by event count — mirror of AnalyticsQueries.hourlyTopUsers
    "ev5_hourly_top_users" ->
      s"""SELECT hour_bucket, CAST(rank AS INTEGER) AS rank, user_id, n_events FROM (
         |  SELECT hour_bucket, user_id, n_events,
         |         row_number() OVER (PARTITION BY hour_bucket
         |                            ORDER BY n_events DESC, user_id) AS rank
         |  FROM (SELECT epoch_us(ts) // 3600000000 AS hour_bucket, user_id,
         |               COUNT(*) AS n_events
         |        FROM events GROUP BY 1, 2))
         |WHERE rank <= 3""".stripMargin,

    // hour-over-hour user retention — mirror of AnalyticsQueries.hourlyRetention
    "ev6_hourly_retention" ->
      s"""WITH a AS (SELECT DISTINCT epoch_us(ts) // 3600000000 AS hour_bucket, user_id
         |           FROM events),
         |n AS (SELECT hour_bucket - 1 AS hour_bucket, user_id, 1 AS retained FROM a)
         |SELECT a.hour_bucket, COUNT(*) AS n_active,
         |  CAST(SUM(COALESCE(n.retained, 0)) AS BIGINT) AS n_retained,
         |  round(CAST(SUM(COALESCE(n.retained, 0)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         |    AS retention
         |FROM a LEFT JOIN n USING (hour_bucket, user_id)
         |GROUP BY a.hour_bucket""".stripMargin,
    "ev4_props_extract" ->
      s"""SELECT user_id,
         |  CAST(SUM(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         |  CAST(MAX(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS max_k,
         |  CAST(COUNT(DISTINCT json_extract_string(props, '$$.k')) AS BIGINT) AS n_distinct_k
         |FROM events GROUP BY user_id""".stripMargin,

    // as-of join: each purchase matched to the user's most recent click at-or-before
    // it (ties: max click event id) — mirror of AnalyticsQueries.asofJoin, formulated
    // here as explicit max-ts/max-id instead of the engine's tagged-union window
    "ev8_asof_join" ->
      s"""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
         |           WHERE event_type = 'purchase'),
         |c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
         |      WHERE event_type = 'click'),
         |m AS (SELECT p.event_id, p.user_id, p.ts_us, max(c.ts_us) AS click_ts_us
         |      FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts_us <= p.ts_us
         |      GROUP BY 1, 2, 3)
         |SELECT m.event_id, m.user_id, m.ts_us, m.click_ts_us,
         |  (SELECT max(c2.event_id) FROM c c2
         |   WHERE c2.user_id = m.user_id AND c2.ts_us = m.click_ts_us) AS click_event_id,
         |  m.ts_us - m.click_ts_us AS gap_us
         |FROM m""".stripMargin,

    // ordered signup→click→purchase funnel with at-or-after stage gating — mirror of
    // AnalyticsQueries.funnelStages
    "ev9_funnel_stages" ->
      s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         |s1 AS (SELECT user_id, min(ts_us) AS signup_ts FROM ev
         |       WHERE event_type = 'signup' GROUP BY 1),
         |s2 AS (SELECT ev.user_id, min(ts_us) AS click_ts FROM ev JOIN s1 USING (user_id)
         |       WHERE event_type = 'click' AND ts_us >= signup_ts GROUP BY 1),
         |s3 AS (SELECT ev.user_id, min(ts_us) AS purchase_ts FROM ev JOIN s2 USING (user_id)
         |       WHERE event_type = 'purchase' AND ts_us >= click_ts GROUP BY 1)
         |SELECT s1.user_id, signup_ts, click_ts, purchase_ts
         |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin,

    // per-user churn rollup: activity span vs the corpus end, integer µs — mirror of
    // AnalyticsQueries.churnRollup
    "ev13_churn" ->
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS tsu, epoch_us(ts) // 86400000000 AS day
         |            FROM events),
         |endv AS (SELECT MAX(tsu) AS end_us FROM ev)
         |SELECT user_id, COUNT(*) AS n_events,
         |       CAST(COUNT(DISTINCT day) AS BIGINT) AS n_active_days,
         |       CAST(MAX(tsu) AS BIGINT) AS last_seen_us,
         |       CAST(CASE WHEN MAX(tsu) < (SELECT end_us FROM endv) - 259200000000
         |                 THEN 1 ELSE 0 END AS INTEGER) AS churned
         |FROM ev GROUP BY user_id""".stripMargin,

    // Q10-style returned-item revenue per customer, top-20 by lost bp — mirror of
    // AnalyticsQueries.returnedRevenue
    // Q17 small-quantity shape: the correlated avg decorrelated to per-part stats,
    // the 20%-of-average compare as exact integer cross-multiplication — mirror of
    // AnalyticsQueries.smallQuantityRevenue('Brand#1')
    "q11_small_qty_revenue" ->
      """WITH li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |                   CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_cents
        |            FROM lineitem),
        |bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'),
        |f AS (SELECT li.* FROM li JOIN bp ON p_partkey = l_partkey),
        |st AS (SELECT l_partkey, COUNT(*) AS cnt, CAST(SUM(qty) AS BIGINT) AS sumq
        |       FROM f GROUP BY 1)
        |SELECT CAST(SUM(price_cents) AS BIGINT) AS revenue_cents, COUNT(*) AS n_items
        |FROM f JOIN st USING (l_partkey)
        |WHERE 5 * qty * cnt < sumq""".stripMargin,

    // Q22 idle-rich shape: scalar positive-average threshold (exact cents
    // cross-multiplication) + no-RECENT-order NOT EXISTS as anti-join — mirror of
    // AnalyticsQueries.idleRichCustomers (the literal never-ordered test is
    // vacuous on this data; the 30-day recency window keeps the plan shape with a
    // non-degenerate answer)
    "q12_idle_rich_customers" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |                  CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
        |           FROM customer),
        |thr AS (SELECT COUNT(*) AS cnt_pos, CAST(SUM(bal_cents) AS BIGINT) AS sum_pos
        |        FROM c WHERE bal_cents > 0),
        |rich AS (SELECT c.* FROM c, thr WHERE bal_cents * cnt_pos > sum_pos),
        |mx AS (SELECT max(o_orderdate) AS max_date FROM orders),
        |recent AS (SELECT DISTINCT o_custkey FROM orders, mx
        |           WHERE o_orderdate > max_date - INTERVAL 30 DAY),
        |idle AS (SELECT rich.* FROM rich
        |         WHERE NOT EXISTS (SELECT 1 FROM recent WHERE o_custkey = rich.c_custkey))
        |SELECT c_mktsegment, COUNT(*) AS n_customers,
        |       CAST(SUM(bal_cents) AS BIGINT) AS total_cents
        |FROM idle GROUP BY 1""".stripMargin,

    // Q14 promotion-effect shape: PROMO vs total revenue in a shipdate window,
    // share as one micro-quantized division of exact bp integers — mirror of
    // AnalyticsQueries.promoRevenue(1996..1997)
    "q14_promo_share" ->
      s"""WITH f AS (SELECT l_partkey, CAST($revBp AS BIGINT) AS rev_bp
         |           FROM lineitem
         |           WHERE year(l_shipdate) BETWEEN 1996 AND 1997),
         |j AS (SELECT rev_bp, p_type FROM f JOIN part ON p_partkey = l_partkey),
         |s AS (SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_bp ELSE 0 END) AS BIGINT) AS promo_bp,
         |             CAST(SUM(rev_bp) AS BIGINT) AS total_bp
         |      FROM j)
         |SELECT promo_bp, total_bp,
         |  CAST(floor(1000000.0 * promo_bp::DOUBLE / total_bp::DOUBLE + 0.5) AS BIGINT)
         |    AS promo_share_micro
         |FROM s""".stripMargin,

    // Q18 large-volume shape: having-filtered per-order quantity sums joined back
    // to orders/customer, top-20 by order value — mirror of
    // AnalyticsQueries.largeVolumeCustomers(minQty = 250, k = 20)
    "q18_large_volume" ->
      """WITH q AS (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |           FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
        |SELECT c_name, c_custkey, o_orderkey,
        |       CAST(round(o_totalprice * 100, 0) AS BIGINT) AS total_cents, sum_qty
        |FROM q
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY total_cents DESC, o_orderkey LIMIT 20""".stripMargin,

    // Q19 disjunctive-predicate shape: three (brand, size-band, qty-band) arms
    // OR'd post-join, each side pre-pruned to the disjunction's envelope — mirror
    // of AnalyticsQueries.disjunctiveRevenue
    "q19_disjunctive_revenue" ->
      s"""WITH li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         |                   CAST($revBp AS BIGINT) AS rev_bp
         |            FROM lineitem WHERE l_quantity BETWEEN 1 AND 30),
         |pt AS (SELECT p_partkey, p_brand, p_size FROM part
         |       WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3'))
         |SELECT CAST(SUM(rev_bp) AS BIGINT) AS revenue_bp, COUNT(*) AS n_items
         |FROM li JOIN pt ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND qty BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND qty BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND qty BETWEEN 20 AND 30)""".stripMargin,

    // Q2 min-cost-supplier shape: per-(part, supplier) unit-price minima, per-part
    // argmin window over the reduced relation, ties kept — mirror of
    // AnalyticsQueries.minCostSupplier(SMALL, size < 25)
    "q17_min_cost_supplier" ->
      """WITH pp AS (SELECT p_partkey, p_brand FROM part
        |            WHERE p_type = 'SMALL' AND p_size < 25),
        |u AS (SELECT p_partkey, p_brand, l_suppkey,
        |        CAST(floor(10000.0 * CAST(round(l_extendedprice * 100) AS BIGINT)::DOUBLE
        |          / CAST(l_quantity AS BIGINT)::DOUBLE + 0.5) AS BIGINT) AS unit_mc
        |      FROM lineitem JOIN pp ON p_partkey = l_partkey),
        |ps AS (SELECT p_partkey, p_brand, l_suppkey, MIN(unit_mc) AS supp_min
        |       FROM u GROUP BY 1, 2, 3),
        |w AS (SELECT *, MIN(supp_min) OVER (PARTITION BY p_partkey) AS part_min FROM ps)
        |SELECT p_partkey, p_brand, s_name, n_name, supp_min AS min_unit_microcents
        |FROM w
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE supp_min = part_min""".stripMargin,

    // Q15 top-supplier shape: per-supplier windowed revenue vs its own global max,
    // exact bp integers, ties kept — mirror of AnalyticsQueries.topSupplier
    "q15_top_supplier" ->
      s"""WITH r AS (SELECT l_suppkey, CAST(SUM($revBp) AS BIGINT) AS rev_bp
         |           FROM lineitem
         |           WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
         |           GROUP BY 1)
         |SELECT s_suppkey, s_name, rev_bp
         |FROM r JOIN supplier ON s_suppkey = l_suppkey
         |WHERE rev_bp = (SELECT MAX(rev_bp) FROM r)""".stripMargin,

    // Q16 supplier-variety shape: distinct suppliers per (brand, size) minus the
    // blacklist (NOT IN -> anti join), two brands excluded — mirror of
    // AnalyticsQueries.supplierVariety
    "q16_supplier_variety" ->
      """SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
        |GROUP BY 1, 2""".stripMargin,

    // Q20 nested-semi shape: family filter -> per-(supplier, part) qty HAVING ->
    // semi into supplier — mirror of AnalyticsQueries.excessShippers(ECONOMY, > 80)
    "q20_excess_shippers" ->
      """WITH q AS (SELECT l_suppkey, l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
        |           FROM lineitem JOIN part ON p_partkey = l_partkey
        |           WHERE p_type = 'ECONOMY'
        |           GROUP BY 1, 2 HAVING SUM(CAST(l_quantity AS BIGINT)) > 80)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM q)""".stripMargin,

    // Q9 product-profit shape: exact bp profit (revenue minus retail-cost leg) per
    // (supplier nation, order year) — mirror of AnalyticsQueries.productProfit
    "q21_product_profit" ->
      s"""SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |  CAST(SUM($revBp
         |    - CAST(round(p_retailprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT) * 100)
         |    AS BIGINT) AS profit_bp
         |FROM lineitem
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN part ON p_partkey = l_partkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN nation ON n_nationkey = s_nationkey
         |GROUP BY 1, 2""".stripMargin,

    // Q13 custdist shape: left-outer per-customer order counts (zero band kept),
    // then the count-of-counts histogram — mirror of
    // AnalyticsQueries.customerOrderDistribution
    "q13_custdist" ->
      """WITH pc AS (SELECT c_custkey, COUNT(o_custkey) AS n_orders
        |            FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |            GROUP BY 1)
        |SELECT CAST(n_orders AS BIGINT) AS n_orders, COUNT(*) AS n_customers
        |FROM pc GROUP BY 1""".stripMargin,

    // Q21 "waiting suppliers" shape: sole late shipper in multi-supplier orders,
    // the exists/not-exists composition in count form — mirror of
    // AnalyticsQueries.waitingSuppliers
    "q10_waiting_suppliers" ->
      """WITH li AS (SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem),
        |multi AS (SELECT l_orderkey FROM li GROUP BY 1 HAVING COUNT(DISTINCT l_suppkey) > 1),
        |late AS (SELECT DISTINCT l_orderkey, l_suppkey
        |         FROM li JOIN orders ON o_orderkey = l_orderkey
        |         WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
        |sole AS (SELECT l_orderkey, l_suppkey FROM (
        |    SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS n_late FROM late)
        |  WHERE n_late = 1),
        |w AS (SELECT l_suppkey, COUNT(*) AS numwait
        |      FROM sole JOIN multi USING (l_orderkey) GROUP BY 1)
        |SELECT s_name, numwait FROM (
        |  SELECT s_name, CAST(numwait AS BIGINT) AS numwait, s_suppkey
        |  FROM w JOIN supplier ON s_suppkey = l_suppkey
        |  ORDER BY numwait DESC, s_name, s_suppkey LIMIT 10)""".stripMargin,
    "q09_returned_revenue" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  CAST(SUM($revBp) AS BIGINT) AS lost_bp,
         |  COUNT(*) AS n_returned_items
         |FROM lineitem
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |JOIN nation ON n_nationkey = c_nationkey
         |WHERE l_returnflag = 'R'
         |GROUP BY 1, 2, 3
         |ORDER BY lost_bp DESC, c_custkey LIMIT 20""".stripMargin,

    // Q8-style nation market share of region-year revenue: exact bp integers through
    // the window total, one rounded division — mirror of AnalyticsQueries.marketShare
    "q08_market_share" ->
      s"""WITH rev AS (
         |  SELECT r_name, n_name, year(o_orderdate) AS o_year,
         |         CAST(SUM($revBp) AS BIGINT) AS revenue_bp
         |  FROM lineitem
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation ON n_nationkey = c_nationkey
         |  JOIN region ON r_regionkey = n_regionkey
         |  GROUP BY 1, 2, 3)
         |SELECT r_name, n_name, o_year, revenue_bp,
         |  round(revenue_bp::DOUBLE
         |        / CAST(SUM(revenue_bp) OVER (PARTITION BY r_name, o_year) AS BIGINT)::DOUBLE,
         |        6) AS share
         |FROM rev""".stripMargin,

    // per-session event counts and exact µs durations (ev2's break rule, running-sum
    // session numbering) — mirror of AnalyticsQueries.sessionStats
    "ev12_session_stats" ->
      s"""WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
         |b AS (SELECT user_id, event_id, tsu,
         |        CASE WHEN prev IS NULL OR tsu - prev > 3600000000 THEN 1 ELSE 0 END AS brk
         |      FROM (SELECT user_id, tsu, event_id,
         |              lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev
         |            FROM t)),
         |s AS (SELECT user_id, tsu,
         |        CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu, event_id
         |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |          AS session_idx
         |      FROM b)
         |SELECT user_id, session_idx, COUNT(*) AS n_events,
         |       CAST(MAX(tsu) - MIN(tsu) AS BIGINT) AS duration_us
         |FROM s GROUP BY 1, 2""".stripMargin,

    // hourly event-count z-scores vs the trailing-24h RANGE window — mirror of
    // AnalyticsQueries.hourlyAnomaly (fixed float sequence: mean, E[x²]−mean², sqrt)
    "ev7_hourly_anomaly" ->
      s"""WITH hourly AS (SELECT epoch_us(ts) // 3600000000 AS hour_bucket, COUNT(*) AS n
         |                FROM events GROUP BY 1),
         |wb AS (SELECT hour_bucket, n,
         |         CAST(sum(n) OVER w AS BIGINT) AS base_n,
         |         CAST(sum(n * n) OVER w AS BIGINT) AS base_sq,
         |         count(*) OVER w AS base_cnt
         |       FROM hourly
         |       WINDOW w AS (ORDER BY hour_bucket RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
         |SELECT hour_bucket, n,
         |  round(base_n::DOUBLE / base_cnt::DOUBLE, 4) AS base_mean,
         |  CASE WHEN greatest(base_sq::DOUBLE / base_cnt::DOUBLE
         |                     - (base_n::DOUBLE / base_cnt::DOUBLE) * (base_n::DOUBLE / base_cnt::DOUBLE),
         |                     0.0::DOUBLE) > 0.0
         |       THEN round((n::DOUBLE - base_n::DOUBLE / base_cnt::DOUBLE)
         |                  / sqrt(greatest(base_sq::DOUBLE / base_cnt::DOUBLE
         |                                  - (base_n::DOUBLE / base_cnt::DOUBLE) * (base_n::DOUBLE / base_cnt::DOUBLE),
         |                                  0.0::DOUBLE)), 4)
         |       ELSE 0.0::DOUBLE END AS z
         |FROM wb WHERE base_cnt >= 12""".stripMargin,

    // Q4-style late-order priority counts: EXISTS a line shipped >60 days after the
    // order date, one-year order window — mirror of AnalyticsQueries.latePriorityOrders
    // (exact epoch-µs arithmetic; 9131/9496 = epoch-days of 1995-01-01/1996-01-01)
    "q04_late_priority" ->
      """WITH ord AS (SELECT o_orderkey, o_orderpriority, o_orderdate
        |             FROM orders
        |             WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |               AND o_orderdate <  TIMESTAMP '1996-01-01')
        |SELECT o_orderpriority, count(*) AS n_orders FROM ord
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = ord.o_orderkey
        |                AND l.l_shipdate > ord.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1""".stripMargin,

    // DAU + trailing-7-day WAU per day bucket — mirror of
    // AnalyticsQueries.rollingActiveUsers (distinct (day, user) first, then a bounded
    // 7-offset fanout; only days that occur in the data survive the join)
    "ev11_rolling_actives" ->
      """WITH daily AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day_bucket, user_id
        |               FROM events),
        |dau AS (SELECT day_bucket, count(*) AS n_dau FROM daily GROUP BY 1),
        |fan AS (SELECT DISTINCT day_bucket + off AS day_bucket, user_id
        |        FROM daily, (SELECT unnest(generate_series(0, 6)) AS off)),
        |wau AS (SELECT day_bucket, count(*) AS n_wau FROM fan GROUP BY 1)
        |SELECT day_bucket, n_dau, n_wau FROM dau JOIN wau USING (day_bucket)""".stripMargin,

    // cohort retention matrix: first-seen-day cohorts × day-offset active counts over
    // distinct (day, user) pairs — mirror of AnalyticsQueries.cohortRetention
    "ev14_cohort_retention" ->
      """WITH daily AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day_bucket, user_id
        |               FROM events),
        |coh AS (SELECT user_id, MIN(day_bucket) AS cohort_day FROM daily GROUP BY 1),
        |sz AS (SELECT cohort_day, COUNT(*) AS cohort_size FROM coh GROUP BY 1),
        |act AS (SELECT cohort_day, day_bucket - cohort_day AS day_offset,
        |               COUNT(*) AS n_active
        |        FROM daily JOIN coh USING (user_id) GROUP BY 1, 2)
        |SELECT cohort_day, day_offset, CAST(n_active AS BIGINT) AS n_active,
        |  CAST(cohort_size AS BIGINT) AS cohort_size,
        |  round(n_active::DOUBLE / cohort_size::DOUBLE, 6) AS retention
        |FROM act JOIN sz USING (cohort_day)""".stripMargin,

    // last-touch attribution: latest preceding touch per purchase (argmax by ts then
    // event_id, at-or-before ties), 24h lookback applied after the argmax, channel
    // rollup in exact integer cents/µs — mirror of AnalyticsQueries.attribution
    "ev15_attribution" ->
      s"""WITH t AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
         |           WHERE event_type IN ('click', 'view', 'signup')),
         |p AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events
         |      WHERE event_type = 'purchase'),
         |m AS (SELECT p.event_id, p.user_id, p.ts_us, p.value, max(t.ts_us) AS t_ts
         |      FROM p LEFT JOIN t ON t.user_id = p.user_id AND t.ts_us <= p.ts_us
         |      GROUP BY 1, 2, 3, 4),
         |a AS (SELECT m.*,
         |        (SELECT max(t2.event_id) FROM t t2
         |         WHERE t2.user_id = m.user_id AND t2.ts_us = m.t_ts) AS t_id
         |      FROM m),
         |b AS (SELECT a.*,
         |        (SELECT t3.event_type FROM t t3 WHERE t3.event_id = a.t_id) AS t_type
         |      FROM a),
         |c AS (SELECT
         |        CASE WHEN t_ts IS NULL OR ts_us - t_ts > $AttributionLookbackUs
         |             THEN 'none' ELSE t_type END AS channel,
         |        CASE WHEN t_ts IS NULL OR ts_us - t_ts > $AttributionLookbackUs
         |             THEN NULL ELSE ts_us - t_ts END AS gap_us,
         |        value
         |      FROM b)
         |SELECT channel, COUNT(*) AS n_conversions,
         |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
         |  CAST(COALESCE(SUM(gap_us), 0) AS BIGINT) AS sum_gap_us,
         |  CASE WHEN channel = 'none' THEN 0.0::DOUBLE
         |       ELSE round(COALESCE(SUM(gap_us), 0)::DOUBLE / COUNT(*)::DOUBLE, 6)
         |  END AS avg_gap_us
         |FROM c GROUP BY 1""".stripMargin,

    // RFM segmentation: per-user recency/frequency/monetary, exact quintile buckets
    // 1 + ((rank-1)*5) DIV n with user_id tie-breaks — mirror of AnalyticsQueries.rfm
    "ev16_rfm" ->
      """WITH per AS (SELECT user_id, MAX(epoch_us(ts)) AS recency_us,
        |               COUNT(*) AS n_events,
        |               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |                 AS monetary_cents
        |             FROM events GROUP BY 1),
        |r AS (SELECT *,
        |        row_number() OVER (ORDER BY recency_us DESC, user_id) AS r_rank,
        |        row_number() OVER (ORDER BY n_events DESC, user_id) AS f_rank,
        |        row_number() OVER (ORDER BY monetary_cents DESC, user_id) AS m_rank,
        |        COUNT(*) OVER () AS n_users
        |      FROM per),
        |b AS (SELECT user_id, recency_us, CAST(n_events AS BIGINT) AS n_events,
        |        monetary_cents,
        |        CAST(1 + ((r_rank - 1) * 5) // n_users AS BIGINT) AS r_bucket,
        |        CAST(1 + ((f_rank - 1) * 5) // n_users AS BIGINT) AS f_bucket,
        |        CAST(1 + ((m_rank - 1) * 5) // n_users AS BIGINT) AS m_bucket
        |      FROM r)
        |SELECT *, CAST(r_bucket * 100 + f_bucket * 10 + m_bucket AS BIGINT) AS rfm_code
        |FROM b""".stripMargin,

    // activity Pareto: exact decile cut of the per-user activity ranks, integer event
    // totals, micro-quantized shares, 10-row cumulative window — mirror of
    // AnalyticsQueries.activityPareto
    // ev25 — Kaplan–Meier / Nelson–Aalen mirror of AnalyticsQueries.survivalCurve:
    // identical per-row micro ln/hazard terms (ONE libm call on the same exact-
    // rational double per row), exact BIGINT cumulative sums, one final exp —
    // never a float accumulation (see the survivalCurve scaladoc float contract).
    "ev25_survival" ->
      s"""WITH t0 AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
         |s AS (SELECT *, CASE WHEN lag(tsu) OVER w IS NULL OR tsu - lag(tsu) OVER w > 3600000000
         |                     THEN 1 ELSE 0 END AS brk
         |      FROM t0 WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
         |g AS (SELECT user_id, tsu,
         |        SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu, event_id
         |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
         |      FROM s),
         |sess AS (SELECT user_id, session_idx, MAX(tsu) - MIN(tsu) AS duration_us,
         |                MAX(tsu) AS last_tsu
         |         FROM g GROUP BY 1, 2),
         |mx AS (SELECT MAX(last_tsu) AS corpus_last FROM sess),
         |byt AS (SELECT duration_us // 60000000 AS t,
         |          CAST(SUM(CASE WHEN last_tsu >= corpus_last - ${KmCensorUs} THEN 0 ELSE 1 END) AS BIGINT) AS n_events,
         |          CAST(SUM(CASE WHEN last_tsu >= corpus_last - ${KmCensorUs} THEN 1 ELSE 0 END) AS BIGINT) AS n_censored
         |        FROM sess, mx GROUP BY 1),
         |risk AS (SELECT *, CAST(SUM(n_events + n_censored) OVER (ORDER BY t DESC
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
         |         FROM byt),
         |term AS (SELECT t, n_risk, n_events, n_censored,
         |           CASE WHEN n_events = n_risk THEN NULL
         |                ELSE CAST(floor(1000000.0 *
         |                  ln((n_risk - n_events)::DOUBLE / n_risk::DOUBLE) + 0.5) AS BIGINT)
         |           END AS ln_micro,
         |           CAST(floor(1000000.0 * n_events::DOUBLE / n_risk::DOUBLE + 0.5) AS BIGINT)
         |             AS haz_micro
         |         FROM risk WHERE n_events > 0),
         |cum AS (SELECT *,
         |          CAST(SUM(ln_micro) OVER w AS BIGINT) AS cum_ln,
         |          MAX(CASE WHEN ln_micro IS NULL THEN 1 ELSE 0 END) OVER w AS dead,
         |          CAST(SUM(haz_micro) OVER w AS BIGINT) AS cum_hazard_micro
         |        FROM term
         |        WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT t AS duration_days, n_risk, n_events, n_censored,
         |  CASE WHEN dead = 1 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(floor(1000000.0 * exp(cum_ln::DOUBLE / 1000000.0) + 0.5) AS BIGINT)
         |  END AS survival_micro,
         |  cum_hazard_micro
         |FROM cum""".stripMargin,
    "ev17_activity_pareto" ->
      """WITH per AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total_events,
        |               COUNT(*) AS n_users_total FROM per),
        |rk AS (SELECT n_events,
        |         row_number() OVER (ORDER BY n_events DESC, user_id) AS rank
        |       FROM per),
        |dec AS (SELECT CAST(1 + ((rank - 1) * 10) // n_users_total AS BIGINT) AS decile,
        |          n_events, total_events
        |        FROM rk CROSS JOIN tot),
        |agg AS (SELECT decile, COUNT(*) AS n_users,
        |          CAST(SUM(n_events) AS BIGINT) AS decile_events,
        |          MAX(total_events) AS total_events
        |        FROM dec GROUP BY 1),
        |cum AS (SELECT *, CAST(SUM(decile_events) OVER (ORDER BY decile
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS cum_events FROM agg)
        |SELECT decile, CAST(n_users AS BIGINT) AS n_users, decile_events,
        |  CAST(floor(1000000.0 * decile_events::DOUBLE / total_events::DOUBLE + 0.5)
        |    AS BIGINT) AS share_micro,
        |  CAST(floor(1000000.0 * cum_events::DOUBLE / total_events::DOUBLE + 0.5)
        |    AS BIGINT) AS cum_share_micro
        |FROM cum""".stripMargin,
  )
}
