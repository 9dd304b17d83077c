package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.util.Portable._

/** Event-time operators: as-of join, sessionization, time bucketing.
  *
  * The as-of join is the one operator here Spark lacks natively; the
  * classic scalable formulation is used (SURVEY.md §2 q21): tag and
  * UNION both sides, shuffle ONCE on the key, then carry the most
  * recent right-side row forward with a last_value(ignoreNulls)
  * running window. This is a single exchange + sort — no per-key
  * collect, no broadcast of an unbounded side, no range cross-join —
  * and it scales to arbitrarily large sides (each partition streams).
  */
object Temporal {

  /** q21: for each purchase event, the most recent click of the same
    * user at-or-before the purchase time (ASOF LEFT JOIN semantics).
    */
  def q21(t: Tables): DataFrame = {
    val ev = t.events
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))

    // tag 0 = click (sorts before an equal-ts purchase → inclusive >=).
    // No pre-dedup pass: ordering equal-ts clicks by click_id makes
    // last_value(ignoreNulls) pick the max-event_id click — identical
    // to deduping on (user_id, ts) first, but ONE shuffle instead of
    // two (the dedup window needed its own (user_id, ts) exchange).
    val tagged = clicks
      .select(col("user_id"), col("ts"), lit(0).as("tag"),
        lit(null).cast("long").as("event_id"),
        col("click_id"), col("ts").as("click_ts"), col("click_value"))
      .unionByName(purchases
        .select(col("user_id"), col("ts"), lit(1).as("tag"), col("event_id"),
          lit(null).cast("long").as("click_id"),
          lit(null).cast("timestamp").as("click_ts"),
          lit(null).cast("double").as("click_value")))

    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("click_id").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("m_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("m_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .withColumn("m_click_value", last(col("click_value"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("m_click_id").as("click_id"), col("m_click_ts").as("click_ts"),
        col("m_click_value").as("click_value"))
      .orderBy(col("event_id"))
  }

  /** q22: gap-based sessionization (30-min inactivity gap) via
    * lag → break flag → running sum; one shuffle on user_id.
    */
  def q22(t: Tables): DataFrame =
    sessions(t).orderBy(col("user_id"), col("session_id"))

  /** q22's session frame WITHOUT the presentation sort — the form
    * composing operators (q102) consume, so they never inherit a
    * wasted global ordering exchange.
    */
  private[graft] def sessions(t: Tables): DataFrame = {
    val w  = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(w)
    val brk = when(prev.isNull, 1)
      .when(unix_micros(col("ts")) - unix_micros(prev) > 1800000000L, 1)
      .otherwise(0)
    t.events
      .withColumn("brk", brk)
      .withColumn("session_id", sum(col("brk")).over(wc).cast("int"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        decSum(col("value")).as("total_value"))
  }

  /** q23: 5-minute tumbling event-time buckets (batch mirror of the
    * streaming pipeline in graft.streaming). Bucketing is pure
    * arithmetic on µs-since-epoch → map-side, then one agg shuffle.
    */
  /** q93: hourly regular-grid resample of the event series per user
    * with forward fill ([[graft.api.Ops.GraftDataFrameOps.resampleLocf]])
    * — every hour from a user's first to last event exists in the
    * output, empty hours carry the last observed hourly total forward
    * and are flagged `is_gap`. The alignment primitive q23's
    * existing-buckets-only aggregation can't express.
    */
  def q93(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events.resampleLocf("user_id", "ts", col("value"), 3600000000L)
      .orderBy(col("user_id"), col("bucket_start"))
  }

  /** q97: conversion funnel ([[graft.api.Ops.GraftDataFrameOps.funnel]])
    * — users progressing signup → view → click → purchase in order,
    * greedy-earliest completion per step. One filtered min-agg per
    * step, key-partitioned joins, no event-list materialization.
    */
  def q97(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events
      .funnel("user_id", "ts", "event_type",
        Seq("signup", "view", "click", "purchase"))
      .orderBy(col("step"))
  }

  /** q105: TIME-BOUNDED conversion funnel — the product-analytics
    * form of q97: every step must land within ONE HOUR of its step-1
    * anchor. The earliest signup is no longer a safe anchor (a later
    * signup starts a later deadline), so every signup anchors a
    * candidate chain — see [[graft.api.Ops.GraftDataFrameOps.funnel]].
    * The one-hour bound leaves the purchase step EMPTY at this SF,
    * exercising the always-emit-every-step contract (n_users = 0)
    * through the oracle gate.
    */
  def q105(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events
      .funnel("user_id", "ts", "event_type",
        Seq("signup", "view", "click", "purchase"), withinUs = Some(3600000000L))
      .orderBy(col("step"))
  }

  /** q102: interval-overlap join
    * ([[graft.api.Ops.GraftDataFrameOps.intervalJoin]]) — which users'
    * activity windows were CONCURRENT: q22's sessions padded by 30
    * minutes, self-joined on time overlap across DIFFERENT users
    * (wid = user·10⁵ + session, so the cross-user filter is a key
    * comparison). Two-sided owner-bucket equi-join + exact refine —
    * never the nested loop a naive overlap predicate plans.
    * bucketUs = 15 min — HALF the `Ops.intervalStats` p95-span
    * suggestion (r18, VERDICT r17 next #5): the output is
    * bucket-independent (owner-bucket dedup), so the width is a pure
    * performance knob, and with most sessions spanning exactly the
    * 30-minute pad the cost here is candidate DENSITY per bucket, not
    * coverage — measured solo medians at sf0.1/32c: 30 min 4.60 s,
    * 15 min 4.12 s, 10 min 4.23 s, 5 min 5.28 s (explode volume takes
    * over below ~10 min). The candidate count falls ~2× at 15 min
    * while the covered-bucket explode grows only ~1.5×.
    */
  def q102(t: Tables): DataFrame = {
    import graft.api.Ops._
    // materialized ONCE (r17 optimization round, guide §2.4): the
    // self interval-join references each side's start-only AND
    // covered-bucket renderings, so the sessionize chain (events
    // window + session aggregate) rendered FOUR times in one plan —
    // ReuseExchange dedupes only the shuffle write, every consumer
    // still re-runs the window + aggregate above it. One node-sized
    // break makes the bucket join the only remaining cost (the
    // candidate-bound audit shape). Values unchanged.
    val win = graft.api.Ops.lineageBreaker(None)(sessions(t).select(
      (col("user_id") * 100000L + col("session_id")).as("wid"),
      col("session_start").as("ws"),
      (col("session_end") + expr("INTERVAL 30 MINUTES")).as("we")))
    win.intervalJoin(win, "wid", "ws", "we", "wid", "ws", "we",
        bucketUs = 900000000L)
      .filter(expr("a_id div 100000 < b_id div 100000"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** q103: HOPPING (sliding) event-time windows — 10-minute windows
    * every 5 minutes via Spark's native `window()` generator (each
    * event lands in windowSize/hop = 2 windows; the explode is
    * map-side, the agg map-combinable — q23's tumbling shape with
    * overlap). The batch mirror of the streaming hopping-window agg.
    */
  def q103(t: Tables): DataFrame =
    t.events
      .groupBy(window(col("ts"), "600 seconds", "300 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** q104: cohort retention — users grouped by first-activity week,
    * distinct active users per (cohort, week offset): THE
    * retention-matrix query of product analytics. Two aggs (first
    * activity per user, distinct (user, week)) + one map-side offset
    * computation — no window over raw events, no per-user lists.
    */
  def q104(t: Tables): DataFrame = {
    val firstWeek = t.events.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val active = t.events
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    active.join(firstWeek, Seq("user_id"))
      .withColumn("week_offset",
        expr("(unix_micros(week) - unix_micros(cohort_week)) div 604800000000"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** q117: exact trailing EWMA over each user's event values
    * ([[graft.api.Ops.GraftDataFrameOps.ewmaTrailing]]) — the
    * time-series smoothing operator under the integer-exactness
    * discipline: α = 1/2 truncated at 16 terms, all arithmetic in
    * BIGINT (power-of-two weights), so the smoothed series replays
    * bit-for-bit in the oracle. One key-partitioned window sort.
    */
  def q117(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events.ewmaTrailing("user_id", "ts", "event_id", col("value"), lags = 16)
      .select(col("event_id"), col("user_id"),
        col("ewma_num"), col("ewma_denom"), col("ewma_millicents"))
      .orderBy(col("event_id"))
  }

  /** q118: per-user ordered event paths + regex pattern gate
    * ([[graft.api.Ops.GraftDataFrameOps.eventPaths]]) — journey
    * analytics: every user's full event-type sequence as one
    * `>`-joined string in strict (ts, event_id) order, gated by a
    * signup-then-eventually-purchase pattern. The path build is the
    * deterministic array_sort(struct) re-assembly; the oracle
    * replays it with ordered string_agg.
    */
  def q118(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events.eventPaths("user_id", "ts", "event_id", "event_type",
      "(^|>)signup(>[a-z]+)*>purchase(>|$)")
      .orderBy(col("user_id"))
  }

  /** q120: exact time-weighted average value per user
    * ([[graft.api.Ops.GraftDataFrameOps.twapPerKey]]) — each event's
    * value holds until the user's next event and weighs by that
    * interval in µs; num/denom are exact BIGINT sums, millicents the
    * exact floor quotient via the overflow-free division identity.
    * One window sort + one groupBy, both on user_id.
    */
  def q120(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events.twapPerKey("user_id", "ts", "event_id", col("value"))
      .orderBy(col("user_id"))
  }

  /** q121: first-order Markov transition matrix over user event
    * sequences ([[graft.api.Ops.GraftDataFrameOps.transitionMatrix]])
    * — global (src → dst) consecutive-pair counts, per-src totals and
    * exact-integer probabilities. The aggregate view of q118's paths:
    * one key-partitioned window sort + one map-combinable pair
    * groupBy; the totals window runs on the |types|² pair frame.
    */
  def q121(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events.transitionMatrix("user_id", "ts", "event_id", "event_type")
      .orderBy(col("src"), col("dst"))
  }

  /** q122: calendar-day activity streaks per user
    * ([[graft.api.Ops.GraftDataFrameOps.activityStreaks]]) — distinct
    * active days, maximal consecutive-day runs, the longest run and
    * its (earliest, deterministic) start date, by the date−row_number
    * island invariant on exact DATE arithmetic.
    */
  def q122(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events.activityStreaks("user_id", "ts")
      .orderBy(col("user_id"))
  }

  /** q146: Kaplan–Meier churn curve per market segment
    * ([[graft.api.Ops.GraftDataFrameOps.survivalCurve]]) — each
    * user's PURCHASE-activity span in days is the duration (the
    * all-events span is degenerate in this corpus — everyone browses
    * to the last day; purchase spans vary); users whose last purchase
    * sits 7+ days before the corpus's last day CHURNED (event), the
    * rest are right-censored at observation end — the estimand naive
    * retention curves get wrong. Segment dimension broadcasts
    * (q134), the global max day is ONE q48-shaped scalar row.
    */
  def q146(t: Tables): DataFrame = {
    import graft.api.Ops._
    val perUser = t.events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("first_d"),
        max(to_date(col("ts"))).as("last_d"))
    val mx = t.events.agg(max(to_date(col("ts"))).as("mx"))
    perUser.crossJoin(broadcast(mx))
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .withColumn("dur", datediff(col("last_d"), col("first_d")))
      .withColumn("ev", col("last_d") <= date_sub(col("mx"), 7))
      .survivalCurve("c_mktsegment", col("dur"), col("ev"))
      .orderBy(col("c_mktsegment"), col("duration"))
  }

  /** q147: per-user interval coverage
    * ([[graft.api.Ops.GraftDataFrameOps.intervalCoverage]]) — each
    * event opens a deterministic synthetic activity interval
    * (1..7 minutes by event-id hash — the q138 precedent; testdata
    * carries no durations) and the user's overlapping intervals merge
    * into islands: raw/merged counts, exact covered µs, span, and
    * the uptime ratio. The gaps-and-islands classic as ONE window
    * sort.
    */
  def q147(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("en", col("us") + (col("event_id") % 7 + 1) * 60000000L)
      .intervalCoverage("user_id", col("us"), col("en"))
      .orderBy(col("user_id"))
  }

  /** q149: daily count ↔ daily spend cross-correlation per event type
    * ([[graft.api.Ops.GraftDataFrameOps.xcorrByGroup]]) — Pearson r
    * at leads and lags −2..2 between the day census's event count and
    * its exact cents total: "does volume lead spend". The day census
    * collapses the corpus first (the q135 argument); one window sort
    * carries every shift.
    */
  def q149(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"),
        sum((graft.util.Portable.dec(col("value")) * 100).cast("long")).as("y"))
      .xcorrByGroup("event_type", col("day"), col("x"), col("y"), maxLag = 2)
      .orderBy(col("event_type"), col("lag_k"))
  }

  /** q150: seasonal-naive weekly backtest per event type
    * ([[graft.api.Ops.GraftDataFrameOps.forecastScore]]) — predicted
    * = the same weekday's cents total one week earlier (lag 7 over
    * the day census), scored with MAE/bias/MAPE/sMAPE. Closes the
    * forecasting loop: q127 trains baselines, q128 screens anomalies,
    * q150 says how good the prediction actually was.
    */
  def q150(t: Tables): DataFrame = {
    import graft.api.Ops._
    val d = t.events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum((graft.util.Portable.dec(col("value")) * 100).cast("long"))
        .as("actual"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    d.withColumn("predicted", lag(col("actual"), 7).over(w))
      .filter(col("predicted").isNotNull)
      .forecastScore("event_type", col("actual"), col("predicted"))
      .orderBy(col("event_type"))
  }

  /** q151: weekly purchase-cohort LTV grid
    * ([[graft.api.Ops.GraftDataFrameOps.cohortLtv]]) — users cohort
    * by the week of their first purchase; per (cohort, age-week):
    * active buyers, exact cents, cumulative cents and LTV per cohort
    * user. The acquisition-payback readout q104's retention matrix
    * doesn't price.
    */
  def q151(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events.filter(col("event_type") === "purchase")
      .cohortLtv("user_id", "ts", col("value"), bucketDays = 7,
        anchor = "2024-01-01")
      .orderBy(col("cohort"), col("age"))
  }

  /** q152: conversion-latency distribution per channel
    * ([[graft.api.Ops.GraftDataFrameOps.conversionLatency]]) — the
    * q139 crediting re-read as "how long after a click/view do
    * purchases land": exact counts, fixed-shape mean, rank-selected
    * exact median and p90 gaps. The number that sizes attribution
    * windows.
    */
  def q152(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events.conversionLatency("user_id", "ts", "event_id", "event_type",
        "purchase", Seq("click", "view"), windowUs = 7L * 24 * 3600 * 1000000L)
      .orderBy(col("channel"))
  }

  /** q153: daily new-vs-returning users
    * ([[graft.api.Ops.GraftDataFrameOps.newVsReturning]]) — of each
    * day's actives, first-timers vs returners and the returning
    * share; the acquisition/retention split beside q141's actives.
    */
  def q153(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events.newVsReturning("user_id", "ts")
      .orderBy(col("day"))
  }

  /** q141: rolling 7-day distinct active users per calendar day
    * ([[graft.api.Ops.GraftDataFrameOps.rollingActives]]) — DAU and
    * trailing-WAU from one (user, day) census: the census collapses
    * the corpus first, a bounded ×7 contribution explode and one
    * distinct-count per target day finish. Exact integers.
    */
  def q141(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events.rollingActives("user_id", "ts", windowDays = 7)
      .orderBy(col("day"))
  }

  /** q127: hour-of-day seasonal baseline + exact residuals over event
    * values ([[graft.api.Ops.GraftDataFrameOps.seasonalResiduals]]) —
    * the per-(type, hour) mean held as an exact rational, residuals
    * in millicents; the anomaly-detector input that replays
    * bit-for-bit. One (type, hour) aggregate + one broadcast-friendly
    * join back, no window.
    */
  def q127(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events.seasonalResiduals("event_type", "ts", col("value"))
      .select(col("event_id"), col("event_type"), col("hour_of_day"),
        col("seasonal_num"), col("seasonal_denom"),
        col("seasonal_millicents"), col("residual_millicents"))
      .orderBy(col("event_id"))
  }

  /** q128: exact CUSUM change-point statistic per user
    * ([[graft.api.Ops.GraftDataFrameOps.cusumPerKey]]) — n·(running
    * cents sum) − k·(key total), the division-free mean-adjusted
    * cumulative sum whose extremum marks a level shift; flagged
    * against a $200 threshold. One key-partitioned window sort + one
    * key-stats join.
    */
  def q128(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events.cusumPerKey("user_id", "ts", "event_id", col("value"),
        thresholdCents = 20000L)
      .select(col("event_id"), col("user_id"), col("k"),
        col("cusum_scaled"), col("flag"))
      .orderBy(col("event_id"))
  }

  /** q166: per-user spend changepoint
    * ([[graft.api.Ops.changepointPerKey]]) — WHERE each user's event
    * value series shifts level: q128's division-free CUSUM statistic
    * argmax'd per key (earliest-index ties), with both segment means
    * as exact floor-divided millicents (r13).
    */
  def q166(t: Tables): DataFrame =
    graft.api.Ops.changepointPerKey(t.events, "user_id", "ts",
        "event_id", col("value"))
      .orderBy(col("user_id"))

  /** q175: funnel-completion A/B test per market segment
    * ([[graft.api.Ops.GraftDataFrameOps.funnelCompleters]] composed
    * with [[graft.api.Ops.GraftDataFrameOps.abTest]]) — conversion =
    * finishing the FULL signup→view→click→purchase funnel (q97's
    * earliest-completion semantics), arms by user parity, one pooled
    * z per segment; "did the variant move the WHOLE funnel, not just
    * one step" (r13).
    */
  def q175(t: Tables): DataFrame = {
    import graft.api.Ops._
    val done = t.events.funnelCompleters("user_id", "ts", "event_type",
        Seq("signup", "view", "click", "purchase"))
      .withColumn("__done", lit(true))
    t.events
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .join(done, Seq("user_id"), "left")
      .abTest("c_mktsegment", col("user_id"),
        when(col("user_id") % 2 === 0, "A").otherwise("B"),
        coalesce(col("__done"), lit(false)), "A", "B")
      .orderBy(col("c_mktsegment"))
  }

  /** q176: Brown double-exponential level/trend forecast per user
    * ([[graft.api.Ops.GraftDataFrameOps.holtTrailing]]) — the EWMA
    * smoothed TWICE with the same power-of-two Long weights; level
    * 2s₁−s₂, trend s₁−s₂, 3-step forecast — exact integers
    * end-to-end (r13).
    */
  def q176(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events.holtTrailing("user_id", "ts", "event_id", col("value"),
        lags = 8, horizon = 3)
      .select(col("event_id"), col("user_id"), col("s1_millicents"),
        col("s2_millicents"), col("level_millicents"),
        col("trend_millicents"), col("forecast_millicents"))
      .orderBy(col("event_id"))
  }

  /** q135: exact autocorrelation of the daily event-count series per
    * event type ([[graft.api.Ops.GraftDataFrameOps.acfByGroup]]) —
    * lags 1..3 over the per-day census (exact longs in, the q119
    * fixed double shape out). One day census + one type-partitioned
    * window computing all three lags.
    */
  def q135(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .acfByGroup("event_type", col("day"), col("x"), maxLag = 3)
      .orderBy(col("event_type"), col("lag_k"))
  }

  /** q139: last-touch channel attribution of purchases
    * ([[graft.api.Ops.GraftDataFrameOps.lastTouchAttribution]]) —
    * each purchase credits the user's latest click/view within 7
    * days (else the "direct" bucket); the per-channel readout:
    * conversions, exact revenue cents, total touch-to-convert
    * latency. One per-user window sort + one map-combinable census.
    */
  def q139(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.events
      .lastTouchAttribution("user_id", "ts", "event_id", "event_type",
        convType = "purchase", touchTypes = Seq("click", "view"),
        windowUs = 604800000000L)
      .withColumn("__cents", (dec(col("value")) * 100).cast("long"))
      .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("__cents")).as("revenue_cents"),
        sum(col("touch_gap_us")).as("latency_us_total"))
      .orderBy(col("channel"))
  }

  def q23(t: Tables): DataFrame =
    t.events
      .withColumn("bucket_start",
        expr("timestamp_micros((unix_micros(ts) div 300000000) * 300000000)"))
      .groupBy(col("bucket_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        decSum(col("value")).as("total_value"))
      .orderBy(col("bucket_start"), col("event_type"))
}
