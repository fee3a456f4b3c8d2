package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream analytics in batch mode over the `events` fixture — the
  * [EXT] windowing surface (SURVEY §2.11/§7.8). Structured Streaming runs
  * the same logical aggregations incrementally (graft.streaming); these
  * batch declarations double as their correctness oracles.
  *
  * Time arithmetic is done in epoch MICROSECONDS (exact integers) so gap
  * and bucket comparisons are bit-identical across engines — second-level
  * `unix_timestamp` truncation would disagree with DuckDB's fractional
  * `epoch()` on sub-second boundaries.
  *
  * Scale: tumbling/sliding are single-shuffle hash aggregates keyed by
  * (bucket, type); sessionization shuffles once on user_id and uses a
  * running-sum window — the standard gaps-and-islands plan.
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def cents(c: org.apache.spark.sql.Column) = Money.cents(c)
  private val centsSql = Money.centsSql("value")

  /** E1: tumbling 1-hour windows × event_type. */
  val e1: Q = (s, d) =>
    ev(s, d).groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
      .orderBy("window_start", "event_type")
  val e1Sql: String =
    s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
       |       CAST(count(*) AS BIGINT) AS n, CAST(sum($centsSql) AS BIGINT) AS sum_value_c
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** E2: sliding windows, 1 h length / 30 min slide — every event lands in
    * two buckets (start = floor-to-30min and that minus 30 min). */
  val e2: Q = (s, d) => {
    val start30 = timestamp_seconds(
      floor(unix_micros(col("ts")) / lit(1800000000L)).cast("long") * 1800L)
    ev(s, d)
      .select(col("value"),
        explode(array(start30, start30 - expr("INTERVAL 30 MINUTES"))).as("window_start"))
      .groupBy("window_start")
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
      .orderBy("window_start")
  }
  val e2Sql: String =
    s"""SELECT window_start, CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum($centsSql) AS BIGINT) AS sum_value_c
       |FROM (
       |  SELECT value, TIMESTAMP '1970-01-01 00:00:00'
       |                + (CAST(floor(epoch_us(ts) / 1800000000) AS BIGINT) * 1800 - offs)
       |                  * INTERVAL 1 SECOND AS window_start
       |  FROM events CROSS JOIN (SELECT unnest([0, 1800]) AS offs))
       |GROUP BY window_start ORDER BY window_start""".stripMargin

  /** E3: session windows per user, 10-minute inactivity gap — classic
    * gaps-and-islands (lag → new-session flag → running sum → agg). */
  /** Gap-based sessionization of ANY event frame: tags each row with a
    * per-key `session_id` (1..k in time order; a new session starts when
    * the gap to the previous event exceeds `gapUs`, strict >). One shuffle
    * on the key — the library entry point
    * ([[graft.api.GraftApi.sessionize]]). `tieCol` breaks equal-timestamp
    * ordering deterministically. */
  private[graft] def sessionizeOf(events: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    val us = unix_micros(col(tsCol))
    val newSession =
      when(lag(us, 1).over(w).isNull || us - lag(us, 1).over(w) > gapUs, 1L)
        .otherwise(0L)
    events.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  val e3: Q = (s, d) =>
    sessionizeOf(
      ev(s, d).select(col("user_id"), col("ts"), col("event_id"), col("value")),
      "user_id", "ts", "event_id", 600000000L)
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), sum(cents(col("value"))).as("sum_value_c"))
      .orderBy("user_id", "session_id")
  val e3Sql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, ts, event_id, value,
       |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 600000000
       |              THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |numbered AS (
       |  SELECT user_id, ts, value,
       |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM flagged)
       |SELECT user_id, session_id,
       |       CAST(min(ts) AS TIMESTAMP) AS session_start,
       |       CAST(max(ts) AS TIMESTAMP) AS session_end,
       |       CAST(count(*) AS BIGINT) AS n_events, CAST(sum($centsSql) AS BIGINT) AS sum_value_c
       |FROM numbered GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  /** E4: JSON property extraction from the `props` column + aggregation. */
  val e4: Q = (s, d) =>
    ev(s, d)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"), col("event_type"))
      .groupBy(expr("k % 10").as("k_mod"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("k_mod", "event_type")
  val e4Sql: String =
    """SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS BIGINT) AS k_mod,
      |       event_type, CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** E5: top event per user by value (dedup-style argmax via row_number). */
  val e5: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    ev(s, d).withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_id"), cents(col("value")).as("value_c"))
      .orderBy("user_id")
  }
  val e5Sql: String =
    s"""SELECT user_id, event_id, $centsSql AS value_c FROM (
       |  SELECT user_id, event_id, value,
       |         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
       |  FROM events)
       |WHERE rk = 1 ORDER BY user_id""".stripMargin

  /** E6: range join via BANDING — pairs of same-user events within 60 s of
    * each other. The naive plan is a theta join (O(n²) candidate space, a
    * BroadcastNestedLoop at scale); banding each event into its 60-s bucket
    * and joining (user, bucket±1) keeps it an equi-join shuffle, with the
    * exact |Δt| ≤ 60 s predicate applied after. The scalable range-join
    * pattern for any tolerance join. */
  val e6: Q = (s, d) => {
    val base = ev(s, d).select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("t_us"))
    val bucketed = base.withColumn("bkt", expr("t_us div 60000000"))
    // probe side explodes into its own and both neighbor buckets
    val probes = base.select(col("user_id"), col("event_id").as("id_b"), col("t_us").as("t_b"),
      explode(expr("array(t_us div 60000000 - 1, t_us div 60000000, t_us div 60000000 + 1)")).as("bkt"))
    // no distinct needed: a row has exactly ONE bucket and the three
    // probe buckets are distinct, so each (id_a, id_b) pair joins at most
    // once — a dedup here would be a wasted full shuffle of the pair set
    bucketed.join(probes, Seq("user_id", "bkt"))
      .filter(col("event_id") < col("id_b") &&
        abs(col("t_us") - col("t_b")) <= 60000000L)
      .select(col("user_id"), col("event_id").as("id_a"), col("id_b"))
      .groupBy("user_id").agg(count(lit(1)).as("n_close_pairs"))
      .orderBy("user_id")
  }
  val e6Sql: String =
    """SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_close_pairs
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000
      |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin

  /** E7: funnel — users progressing signup → later click → later purchase;
    * stage timestamps via staged conditional-min aggregations (exact
    * epoch-µs), one row of stage counts out. */
  val e7: Q = (s, d) => {
    val base = ev(s, d).select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("t_us"))
    val s1 = base.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("t_us")).as("t_signup"))
    val s2 = base.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("t_us") >= col("t_signup"))
      .groupBy("user_id").agg(min(col("t_us")).as("t_click"))
    val s3 = base.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("t_us") >= col("t_click"))
      .groupBy("user_id").agg(min(col("t_us")).as("t_purchase"))
    s1.agg(count(lit(1)).as("n_signup"))
      .crossJoin(s2.agg(count(lit(1)).as("n_click_after_signup")))
      .crossJoin(s3.agg(count(lit(1)).as("n_purchase_after_click")))
  }
  val e7Sql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t_signup FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s1.t_signup
      |  GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s2.t_click
      |  GROUP BY e.user_id)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_signup,
      |       (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click_after_signup,
      |       (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase_after_click""".stripMargin

  /** E8: schema-ful JSON decode — `from_json` with an explicit struct
    * schema (vs e4's path extraction): one parse per row into a typed
    * struct, the plan a production pipeline uses so the parsed fields are
    * columnar and prunable downstream. */
  val e8: Q = (s, d) =>
    ev(s, d)
      .select(from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).as("p"),
        col("event_type"))
      .select(col("p.k").as("k"), col("event_type"))
      .filter(col("k").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
      .orderBy("event_type")
  val e8Sql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(k) AS BIGINT) AS sum_k, CAST(max(k) AS BIGINT) AS max_k
      |FROM (SELECT event_type,
      |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      |WHERE k IS NOT NULL GROUP BY event_type ORDER BY event_type""".stripMargin

  /** E9: cohort retention — users bucketed by the epoch-week of their
    * FIRST event (cohort), then distinct active users per (cohort,
    * weeks-since-cohort) offset: the classic retention triangle. Two
    * shuffles total: the per-user min-week aggregate and the final
    * (cohort, offset) distinct-count — both partial-aggregated; the
    * distinct-(user, week) projection collapses map-side first. Epoch-week
    * integer buckets (µs div week) keep the math bit-identical to DuckDB,
    * where ISO week truncation would diverge on locale rules. */
  val e9: Q = (s, d) => {
    val weekUs = 7L * 86400L * 1000000L
    val uw = ev(s, d)
      .select(col("user_id"), expr(s"unix_micros(ts) div $weekUs").as("week"))
      .distinct()
    val cohort = uw.groupBy("user_id").agg(min("week").as("cohort_week"))
    uw.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }
  val e9Sql: String = {
    val weekUs = 7L * 86400L * 1000000L
    s"""WITH uw AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $weekUs AS week FROM events),
       |cohort AS (
       |  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id)
       |SELECT c.cohort_week, u.week - c.cohort_week AS week_offset,
       |       CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_users
       |FROM uw u JOIN cohort c USING (user_id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** E10: time-series resample + gap fill — the feature-engineering step
    * that turns an irregular event stream into a dense per-type hourly
    * series. Hour buckets are exact integers (`unix_micros div 3600e6`);
    * each type's grid comes from `sequence(min_h, max_h)` exploded off a
    * 5-row span aggregate (never a driver loop); missing hours join NULL
    * and fill by last-observation-carried-forward (`last(..., ignoreNulls)`
    * over an unbounded-preceding window — per-type partitions, so the
    * sort is shard-local). Money is summed in exact cents; the leading
    * grid point always has data (the span STARTS at an observed hour), so
    * LOCF never emits NULL. */
  private[graft] def resampleLocfOf(events: DataFrame, keyCol: String,
      tsCol: String, valueCentsCol: org.apache.spark.sql.Column,
      bucketUs: Long): DataFrame = {
    val agg = events
      .select(col(keyCol), expr(s"unix_micros($tsCol) div $bucketUs").as("h"),
        valueCentsCol.as("vc"))
      .groupBy(keyCol, "h")
      .agg(count(lit(1)).as("n"), sum("vc").as("sum_c"))
    val grid = agg.groupBy(keyCol).agg(min("h").as("h0"), max("h").as("h1"))
      .select(col(keyCol), explode(expr("sequence(h0, h1)")).as("h"))
    val w = Window.partitionBy(keyCol).orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq(keyCol, "h"), "left")
      .select(col(keyCol), col("h"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("sum_c"), ignoreNulls = true).over(w).as("sum_c_locf"),
        col("n").isNull.as("is_gap"))
  }

  val e10: Q = (s, d) =>
    resampleLocfOf(ev(s, d), "event_type", "ts", cents(col("value")),
      3600L * 1000000L)
      .orderBy("event_type", "h")
  val e10Sql: String =
    s"""WITH agg AS (
       |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
       |         CAST(count(*) AS BIGINT) AS n, CAST(sum($centsSql) AS BIGINT) AS sum_c
       |  FROM events GROUP BY 1, 2),
       |grid AS (
       |  SELECT event_type, unnest(range(h0, h1 + 1)) AS h
       |  FROM (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM agg GROUP BY 1)),
       |j AS (
       |  SELECT g.event_type, g.h, a.n, a.sum_c
       |  FROM grid g LEFT JOIN agg a ON g.event_type = a.event_type AND g.h = a.h)
       |SELECT event_type, h, CAST(coalesce(n, 0) AS BIGINT) AS n_events,
       |       CAST(last_value(sum_c IGNORE NULLS) OVER (
       |         PARTITION BY event_type ORDER BY h
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |         AS sum_c_locf,
       |       n IS NULL AS is_gap
       |FROM j ORDER BY event_type, h""".stripMargin

  /** W6: cumulative distinct users per day — the growth-accounting window
    * every analytics stack needs, written WITHOUT a quadratic
    * distinct-over-growing-frame: a user counts on their FIRST day only
    * (min(day) per user — one hash aggregate), days roll up new-user
    * counts, and a running sum over the ~day-count-sized aggregate gives
    * the cumulative curve. The only per-row shuffle keys on user_id; the
    * ordered window runs over day rows, never events. */
  val w6: Q = (s, d) => {
    val firstDay = ev(s, d)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("user_id").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new_users"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    firstDay
      .withColumn("cum_users", sum("n_new_users").over(w))
      .orderBy("day")
  }
  val w6Sql: String =
    """WITH fd AS (
      |  SELECT user_id, min(epoch_us(ts) // 86400000000) AS day
      |  FROM events GROUP BY user_id),
      |daily AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new_users FROM fd GROUP BY day)
      |SELECT day, n_new_users,
      |       CAST(sum(n_new_users) OVER (ORDER BY day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
      |FROM daily ORDER BY day""".stripMargin

  /** E11: first/last-touch conversion attribution — the marketing-
    * analytics face of the gaps-and-islands idiom. Each purchase closes
    * an attribution group: every event carries the count of purchases
    * STRICTLY BEFORE it in the user's (ts, event_id) order, so touches
    * (click/view) share a group key with exactly the purchase that
    * follows them; within the group the first/last touch are exact
    * struct-ordered min/max (no ts-tie ambiguity — event_id breaks
    * ties), and a group with no touch attributes to `direct`. Output is
    * the 3-row per-channel table both models side by side: conversions
    * and exact purchase cents under first-touch vs last-touch.
    *
    * Scale: one shuffle on user_id for the running-purchase-count
    * window, one map-side-combined aggregate per (user, group) — both
    * shard-local per user — then a channel-bounded (≤ #event_types + 1
    * rows) final aggregate. No self-join of events against events, which
    * is how attribution is usually (quadratically) written. */
  private[graft] def attributionOf(events: DataFrame): DataFrame = {
    val touch = col("event_type").isin("click", "view")
    val typed = events.select(col("user_id"), col("event_id"),
      expr("unix_micros(ts)").as("us"), col("event_type"),
      cents(col("value")).as("vc"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val g = typed
      .withColumn("pgrp", coalesce(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(w),
        lit(0L)))
      .groupBy("user_id", "pgrp")
      .agg(sum(when(col("event_type") === "purchase", col("vc"))).as("purchase_c"),
        min(when(touch, struct(col("us"), col("event_id"),
          col("event_type").as("ch")))).as("firstt"),
        max(when(touch, struct(col("us"), col("event_id"),
          col("event_type").as("ch")))).as("lastt"))
      .filter(col("purchase_c").isNotNull)
    // both models off ONE pass over the conversion groups: explode each
    // group into its (model, channel) credits, then a channel-bounded
    // conditional aggregate — joining separate first/last frames would
    // re-run the event scan + window twice
    g.select(explode(array(
        struct(lit(0).as("m"),
          coalesce(col("firstt.ch"), lit("direct")).as("channel"),
          col("purchase_c")),
        struct(lit(1).as("m"),
          coalesce(col("lastt.ch"), lit("direct")).as("channel"),
          col("purchase_c")))).as("x"))
      .groupBy(col("x.channel").as("channel"))
      .agg(sum(when(col("x.m") === 0, 1L).otherwise(0L)).as("n_first"),
        sum(when(col("x.m") === 0, col("x.purchase_c")).otherwise(0L)).as("cents_first"),
        sum(when(col("x.m") === 1, 1L).otherwise(0L)).as("n_last"),
        sum(when(col("x.m") === 1, col("x.purchase_c")).otherwise(0L)).as("cents_last"))
      .orderBy("channel")
  }

  val e11: Q = (s, d) => attributionOf(ev(s, d))
  val e11Sql: String =
    s"""WITH t AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
       |         $centsSql AS vc,
       |         coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pgrp
       |  FROM events),
       |g AS (
       |  SELECT user_id, pgrp,
       |         sum(CASE WHEN event_type = 'purchase' THEN vc END) AS purchase_c,
       |         min(CASE WHEN event_type IN ('click', 'view')
       |             THEN {'us': us, 'eid': event_id, 'ch': event_type} END) AS firstt,
       |         max(CASE WHEN event_type IN ('click', 'view')
       |             THEN {'us': us, 'eid': event_id, 'ch': event_type} END) AS lastt
       |  FROM t GROUP BY 1, 2
       |  HAVING sum(CASE WHEN event_type = 'purchase' THEN vc END) IS NOT NULL),
       |x AS (
       |  SELECT unnest([
       |    {'m': 0, 'channel': coalesce(firstt.ch, 'direct'), 'pc': purchase_c},
       |    {'m': 1, 'channel': coalesce(lastt.ch, 'direct'), 'pc': purchase_c}],
       |    recursive := true)
       |  FROM g)
       |SELECT channel,
       |       CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
       |       CAST(sum(CASE WHEN m = 0 THEN pc ELSE 0 END) AS BIGINT) AS cents_first,
       |       CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_last,
       |       CAST(sum(CASE WHEN m = 1 THEN pc ELSE 0 END) AS BIGINT) AS cents_last
       |FROM x GROUP BY channel ORDER BY channel""".stripMargin

  /** E12: RFM segmentation — the classic buyer-base audit: per
    * purchasing user, Recency (last purchase time), Frequency (purchase
    * count) and Monetary (exact purchase cents), each cut into exact
    * quartiles, then the 4×4×4 segment table (users + cents per
    * segment). Quartiles ascend with the metric (4 = most recent / most
    * frequent / highest spend) and come from a GLOBAL rank — computed
    * with [[PrefixSum.prefixRank]] (range-partition + local window +
    * broadcast offsets), NOT a single-partition `ntile()` window, so no
    * one-reducer sort exists even with billions of buyers. Ranks are
    * tie-broken to a total order ((metric, companion metric, user_id)),
    * so quartile cuts are deterministic in both engines:
    * q = 4·(rank−1) div n + 1.
    *
    * Scale: one shuffle on user_id for the per-user fold, three range
    * exchanges for the ranks (each over the user-bounded frame, each
    * collecting one row PER PARTITION), and a ≤64-row final aggregate. */
  /** Per-buyer (last_us, freq, cents) fold — each column is a mergeable
    * monoid (max / sum / sum), which is what lets the streaming twin
    * (st22) maintain the buyer table per micro-batch and stay
    * bit-identical to batch. */
  private[graft] def rfmPerUserOf(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(max(expr("unix_micros(ts)")).as("last_us"),
        count(lit(1)).as("freq"),
        sum(cents(col("value"))).as("cents"))

  /** Quartile scoring + segment cut shared by e12 and st22. */
  private[graft] def rfmSegmentsFromPerUser(per: DataFrame): DataFrame = {
    def quart(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
        out: String): DataFrame = {
      val r = PrefixSum.prefixRank(df, order)
      r.df.withColumn(out, expr(s"(4 * (g_rank - 1)) div ${r.nRows}L + 1"))
        .drop("g_rank")
    }
    val scored = quart(quart(quart(per,
      Seq(col("last_us"), col("user_id")), "r_q"),
      Seq(col("freq"), col("cents"), col("user_id")), "f_q"),
      Seq(col("cents"), col("freq"), col("user_id")), "m_q")
    scored.groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_users"), sum("cents").as("sum_cents"))
      .orderBy("r_q", "f_q", "m_q")
  }

  private[graft] def rfmSegmentsOf(events: DataFrame): DataFrame =
    rfmSegmentsFromPerUser(rfmPerUserOf(events))

  val e12: Q = (s, d) => rfmSegmentsOf(ev(s, d))
  val e12Sql: String =
    s"""WITH per AS (
       |  SELECT user_id, max(epoch_us(ts)) AS last_us,
       |         CAST(count(*) AS BIGINT) AS freq,
       |         CAST(sum($centsSql) AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per),
       |rk AS (
       |  SELECT user_id, cents,
       |         CAST(row_number() OVER (ORDER BY last_us, user_id) AS BIGINT) AS rr,
       |         CAST(row_number() OVER (ORDER BY freq, cents, user_id) AS BIGINT) AS fr,
       |         CAST(row_number() OVER (ORDER BY cents, freq, user_id) AS BIGINT) AS mr
       |  FROM per)
       |SELECT (4 * (rr - 1)) // n.n + 1 AS r_q,
       |       (4 * (fr - 1)) // n.n + 1 AS f_q,
       |       (4 * (mr - 1)) // n.n + 1 AS m_q,
       |       CAST(count(*) AS BIGINT) AS n_users,
       |       CAST(sum(cents) AS BIGINT) AS sum_cents
       |FROM rk CROSS JOIN n
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---- E13: time-weighted average (TWAP) per event type ----

  /** E13: the time-weighted average of a stepwise-held signal — the
    * finance/metrics TWAP: each event's value HOLDS until the next
    * event of the same key, so the average weights each value by its
    * holding duration, Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_last − t_first), immune
    * to burst-sampling bias that poisons the naive mean (a sensor that
    * reports 100× more often while idle drags the plain mean to the
    * idle value; TWAP doesn't move). The last event holds nothing
    * (standard right-open convention); keys with a degenerate span
    * (one event, or all at one instant) emit NULL (the voc3
    * convention).
    *
    * Exactness: values in exact cents (Money.cents), durations in
    * integer µs off the st19 total-order contract (ts, then the tie
    * column); the cents×µs products wrap int64 (~10¹¹·10¹³) so the
    * weighted sum rides DECIMAL(38,0)/HUGEINT (the eval2 class), and
    * the single final division sign-splits (refund-negative values).
    *
    * Scale: one lead() window per key (key-partitioned — the e10/st24
    * per-type contract: key domains are bounded; a per-(key, day)
    * variant bounds partitions for unbounded histories) + two
    * map-side-combinable aggregates. Library entry point:
    * [[graft.api.GraftApi.twap]]. */
  private[graft] def twapOf(events: DataFrame, keyCol: String, tsCol: String,
      valueCentsCol: org.apache.spark.sql.Column, tieCol: String = "event_id"): DataFrame = {
    val base = events.select(col(keyCol).as("k"),
      expr(s"unix_micros($tsCol)").as("us"), col(tieCol).as("tie"), valueCentsCol.as("vc"))
    val w = Window.partitionBy("k").orderBy("us", "tie")
    val seg = base.withColumn("dur", lead(col("us"), 1).over(w) - col("us"))
      .filter(col("dur").isNotNull)
    val spans = base.groupBy("k")
      .agg(count(lit(1)).as("n_events"), min("us").as("t0"), max("us").as("t1"))
    val wsum = seg.groupBy("k").agg(sum(expr("CAST(vc AS DECIMAL(38,0)) * dur")).as("wsum"))
    spans.join(wsum, Seq("k"), "left")
      .select(col("k").as(keyCol), col("n_events"),
        (col("t1") - col("t0")).as("span_us"),
        expr("CASE WHEN t1 = t0 THEN CAST(NULL AS BIGINT) " +
          "WHEN wsum >= 0 THEN CAST(wsum div (t1 - t0) AS BIGINT) " +
          "ELSE -CAST((-wsum) div (t1 - t0) AS BIGINT) END").as("twap_c"))
      .orderBy(keyCol)
  }

  val e13: Q = (s, d) => twapOf(ev(s, d), "event_type", "ts", cents(col("value")))
  val e13Sql: String =
    s"""WITH base AS (
       |  SELECT event_type AS k, epoch_us(ts) AS us, event_id AS tie, $centsSql AS vc
       |  FROM events),
       |seg AS (
       |  SELECT k, vc, lead(us) OVER (PARTITION BY k ORDER BY us, tie) - us AS dur
       |  FROM base),
       |sp AS (
       |  SELECT k, CAST(count(*) AS BIGINT) AS n_events,
       |         min(us) AS t0, max(us) AS t1
       |  FROM base GROUP BY k),
       |ws AS (
       |  SELECT k, CAST(sum(CAST(vc AS HUGEINT) * dur) AS HUGEINT) AS wsum
       |  FROM seg WHERE dur IS NOT NULL GROUP BY k)
       |SELECT sp.k AS event_type, n_events, CAST(t1 - t0 AS BIGINT) AS span_us,
       |       CASE WHEN t1 = t0 THEN CAST(NULL AS BIGINT)
       |            WHEN wsum >= 0 THEN CAST(wsum // (t1 - t0) AS BIGINT)
       |            ELSE -CAST((-wsum) // (t1 - t0) AS BIGINT) END AS twap_c
       |FROM sp LEFT JOIN ws USING (k) ORDER BY event_type""".stripMargin

  // ---- W7: exact weighted median per group ----

  /** W7: the exact LOWER WEIGHTED MEDIAN of a value column per group,
    * weighted by an integer mass column — the robust "typical price
    * weighted by volume" statistic (a plain median over rows answers
    * "typical LINE"; weighting by quantity answers "typical UNIT",
    * which is what pricing/capacity decisions want). Median = the
    * smallest value whose cumulative weight reaches half the group's
    * total (2·cw ≥ W — integer form, no halving division).
    *
    * Exactness: value-level weight sums, one cumulative window, one
    * min — all integers. Scale: the cumulative window runs on the
    * VALUE-LEVEL frame (distinct values per group — value-domain-
    * bounded, the dq2/mix3 class), partitioned by the group key; the
    * corpus is touched once by the value aggregation. Library entry
    * point: [[graft.api.GraftApi.weightedMedian]]. */
  private[graft] def weightedMedianOf(rows: DataFrame, keyCol: String,
      valCol: String, wCol: String): DataFrame = {
    val vals = rows.groupBy(col(keyCol).as("k"), col(valCol).as("v"))
      .agg(sum(col(wCol).cast("long")).as("w"))
    val win = Window.partitionBy("k").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vals.withColumn("cw", sum("w").over(win))
      .withColumn("wt", sum("w").over(Window.partitionBy("k")))
      .groupBy("k")
      .agg(count(lit(1)).as("n_values"), max("wt").as("w_total"),
        min(when(col("cw") * 2 >= col("wt"), col("v"))).as("wmedian"))
      .select(col("k").as(keyCol), col("n_values"), col("w_total"), col("wmedian"))
      .orderBy(keyCol)
  }

  val w7: Q = (s, d) =>
    weightedMedianOf(
      Tables.lineitem(s, d).select(col("l_returnflag"),
        Money.cents(col("l_extendedprice")).as("price_c"),
        col("l_quantity").cast("long").as("qty")),
      "l_returnflag", "price_c", "qty")
  val w7Sql: String =
    s"""WITH rows_ AS (
       |  SELECT l_returnflag AS k, ${Money.centsSql("l_extendedprice")} AS v,
       |         CAST(l_quantity AS BIGINT) AS w
       |  FROM lineitem),
       |vals AS (SELECT k, v, CAST(sum(w) AS BIGINT) AS w FROM rows_ GROUP BY k, v),
       |c AS (
       |  SELECT k, v, w,
       |         sum(w) OVER (PARTITION BY k ORDER BY v
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
       |         sum(w) OVER (PARTITION BY k) AS wt
       |  FROM vals)
       |SELECT k AS l_returnflag, CAST(count(*) AS BIGINT) AS n_values,
       |       CAST(max(wt) AS BIGINT) AS w_total,
       |       CAST(min(CASE WHEN cw * 2 >= wt THEN v END) AS BIGINT) AS wmedian
       |FROM c GROUP BY k ORDER BY l_returnflag""".stripMargin

  // ---- E14: inter-event gap dispersion (Poisson / burstiness audit) ----

  /** E14: dispersion of the inter-event gaps per key — the arrival-
    * process health check behind rate-based alerting and capacity
    * planning: a Poisson stream has squared coefficient of variation
    * CoV² = 1; CoV² ≫ 1 means bursty arrivals (retry storms, batched
    * uploads wearing an "events" label), CoV² ≪ 1 means a scheduler's
    * heartbeat pretending to be organic traffic. Gaps come from the
    * same total-order lead() as e13 (ts, then event_id); the statistics
    * are the exact integer sufficient pair (Σdt, Σdt²) and both
    * emissions are single sign-free integral divisions:
    * mean_us = Σdt div n, cov2_e6 = 10⁶·(n·Σdt² − (Σdt)²) div (Σdt)²
    * (≥ 0 by Cauchy–Schwarz; DECIMAL(38,0)/HUGEINT products — µs² wraps
    * int64 immediately); NULL when a key has no gaps or a zero span
    * (the voc3 convention).
    *
    * Scale: one key-partitioned lead() window (the e10/e13 bounded-key
    * contract) + one map-side-combined aggregate. Library entry point:
    * [[graft.api.GraftApi.gapDispersion]]. */
  private[graft] def gapDispersionOf(events: DataFrame, keyCol: String,
      tsCol: String, tieCol: String = "event_id"): DataFrame = {
    val base = events.select(col(keyCol).as("k"),
      expr(s"unix_micros($tsCol)").as("us"), col(tieCol).as("tie"))
    val w = Window.partitionBy("k").orderBy("us", "tie")
    val gaps = base.withColumn("dt", lead(col("us"), 1).over(w) - col("us"))
      .filter(col("dt").isNotNull)
    base.groupBy("k").agg(count(lit(1)).as("n_events"))
      .join(gaps.groupBy("k").agg(count(lit(1)).as("n_gaps"),
        sum(expr("CAST(dt AS DECIMAL(38,0))")).as("sdt"),
        sum(expr("CAST(dt AS DECIMAL(38,0)) * dt")).as("sdt2")), Seq("k"), "left")
      .select(col("k").as(keyCol), col("n_events"),
        coalesce(col("n_gaps"), lit(0L)).as("n_gaps"),
        expr("CASE WHEN n_gaps IS NULL OR n_gaps = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(sdt div n_gaps AS BIGINT) END").as("mean_gap_us"),
        expr("CASE WHEN n_gaps IS NULL OR n_gaps = 0 OR sdt = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST((n_gaps * sdt2 - sdt * sdt) * 1000000 div (sdt * sdt) AS BIGINT) END")
          .as("cov2_e6"))
      .orderBy(keyCol)
  }

  val e14: Q = (s, d) => gapDispersionOf(ev(s, d), "event_type", "ts")
  val e14Sql: String =
    """WITH base AS (
      |  SELECT event_type AS k, epoch_us(ts) AS us, event_id AS tie FROM events),
      |gaps AS (
      |  SELECT k, lead(us) OVER (PARTITION BY k ORDER BY us, tie) - us AS dt
      |  FROM base),
      |ne AS (SELECT k, CAST(count(*) AS BIGINT) AS n_events FROM base GROUP BY k),
      |gs AS (
      |  SELECT k, CAST(count(*) AS BIGINT) AS n_gaps,
      |         CAST(sum(CAST(dt AS HUGEINT)) AS HUGEINT) AS sdt,
      |         CAST(sum(CAST(dt AS HUGEINT) * dt) AS HUGEINT) AS sdt2
      |  FROM gaps WHERE dt IS NOT NULL GROUP BY k)
      |SELECT ne.k AS event_type, n_events,
      |       coalesce(n_gaps, 0) AS n_gaps,
      |       CASE WHEN n_gaps IS NULL OR n_gaps = 0 THEN CAST(NULL AS BIGINT)
      |            ELSE CAST(sdt // n_gaps AS BIGINT) END AS mean_gap_us,
      |       CASE WHEN n_gaps IS NULL OR n_gaps = 0 OR sdt = 0 THEN CAST(NULL AS BIGINT)
      |            ELSE CAST((n_gaps * sdt2 - sdt * sdt) * 1000000 // (sdt * sdt) AS BIGINT) END AS cov2_e6
      |FROM ne LEFT JOIN gs USING (k) ORDER BY event_type""".stripMargin

  /** E15: OHLC bars — per (1-hour bucket × event_type), the candlestick
    * aggregate: open/close = value of the chronologically first/last
    * event (ties on ts broken by event_id so both engines pick the same
    * row), high/low extremes, event count, and turnover — all in exact
    * cents. Open/close are min/max over (ts, event_id, vc) STRUCTS:
    * lexicographic struct ordering turns "first/last per group" into a
    * pure MONOID, so the whole bar is ONE hash aggregate — no window, no
    * sort exchange, and the identical one-scan shape replays
    * incrementally in the streaming twin (st29). Scale: one shuffle
    * keyed by (bucket, type); per-group state is two structs + four
    * longs regardless of corpus size; partial aggregation halves the
    * exchange on the map side. */
  val e15: Q = (s, d) =>
    ev(s, d)
      .select(date_trunc("hour", col("ts")).as("window_start"), col("event_type"),
        col("ts"), col("event_id"), cents(col("value")).as("vc"))
      .groupBy("window_start", "event_type")
      .agg(
        min(struct(col("ts"), col("event_id"), col("vc"))).getField("vc").as("open_c"),
        max(struct(col("ts"), col("event_id"), col("vc"))).getField("vc").as("close_c"),
        max("vc").as("high_c"), min("vc").as("low_c"),
        count(lit(1)).as("n"), sum("vc").as("turnover_c"))
      .orderBy("window_start", "event_type")
  val e15Sql: String =
    s"""WITH b AS (
       |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
       |         ts, event_id, $centsSql AS vc FROM events),
       |r AS (
       |  SELECT *,
       |         row_number() OVER (PARTITION BY window_start, event_type
       |                            ORDER BY ts, event_id) AS rf,
       |         row_number() OVER (PARTITION BY window_start, event_type
       |                            ORDER BY ts DESC, event_id DESC) AS rl
       |  FROM b)
       |SELECT window_start, event_type,
       |       CAST(max(CASE WHEN rf = 1 THEN vc END) AS BIGINT) AS open_c,
       |       CAST(max(CASE WHEN rl = 1 THEN vc END) AS BIGINT) AS close_c,
       |       CAST(max(vc) AS BIGINT) AS high_c, CAST(min(vc) AS BIGINT) AS low_c,
       |       CAST(count(*) AS BIGINT) AS n, CAST(sum(vc) AS BIGINT) AS turnover_c
       |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** E16: burst-window detection — per event type, the hourly buckets
    * whose event count sits more than two standard deviations ABOVE
    * that type's own present-hour baseline (retry storms, scraper
    * bursts, flash crowds — the temporal complement of dq2's
    * value-domain outliers). Entirely exact: with S = Σc, Q = Σc²,
    * n = #present hours, the flag is dev := c·n − S > 0 and
    * dev² > 4·(n·Q − S²), and the reported z² is the exact integral
    * hundredths dev²·100 div (n·Q − S²) — no float σ anywhere, so both
    * engines flag the identical window SET. The baseline covers hours
    * the type APPEARED in (absent hours are not zero-filled; a fully
    * regular feed flags nothing since every dev = 0).
    *
    * Scale: one corpus shuffle into (type × hour) counts; the baseline
    * is a per-type fold of that value-domain-bounded frame and joins
    * back broadcast-small. Exactness bound (round-14 advice): dev scales
    * as c·n (count × present hours, not count alone), and the reported
    * z² computes dev²·100 in DECIMAL(38,0)/HUGEINT — exact while
    * c·n < ~3·10¹⁷ (e.g. 10¹³ events/hour over a decade of hourly
    * buckets); past that the product overflows LOUDLY (Spark ANSI and
    * DuckDB both raise — never a silently dropped window). Library
    * entry point: [[graft.api.GraftApi.burstWindows]]. */
  /** The (hour-bucket × type) count table e16 screens — an additive
    * monoid, which is what lets the streaming twin (st30) maintain it
    * incrementally by summed per-batch deltas. */
  private[graft] def hourlyCountsOf(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("c"))

  /** The burst cut over a merged counts table — shared by e16 and the
    * streaming st30 so their flag sets are the same code path. */
  private[graft] def burstsFromCounts(counts: DataFrame): DataFrame = {
    val stats = counts.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c").as("sc"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("sq"))
    counts.join(broadcast(stats), Seq("event_type"))
      .withColumn("dev", expr("CAST(c AS DECIMAL(38,0)) * n - sc"))
      .withColumn("var_n2", expr("n * sq - CAST(sc AS DECIMAL(38,0)) * sc"))
      .filter(col("var_n2") > 0 && col("dev") > 0 &&
        expr("dev * dev > 4 * var_n2"))
      .select(col("event_type"), col("window_start"), col("c").as("n_events"),
        expr("CAST(dev * dev * 100 div var_n2 AS BIGINT)").as("z2_e2"))
      .orderBy("event_type", "window_start")
  }

  private[graft] def burstWindowsOf(events: DataFrame): DataFrame =
    burstsFromCounts(hourlyCountsOf(events))

  val e16: Q = (s, d) => burstWindowsOf(ev(s, d))
  val e16Sql: String =
    """WITH c AS (
      |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
      |         event_type, CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |         CAST(sum(c) AS HUGEINT) AS sc,
      |         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sq
      |  FROM c GROUP BY 1)
      |SELECT c.event_type, c.window_start, c.c AS n_events,
      |       CAST((CAST(c.c AS HUGEINT) * n - sc) * (CAST(c.c AS HUGEINT) * n - sc) * 100
      |            // (n * sq - sc * sc) AS BIGINT) AS z2_e2
      |FROM c JOIN s USING (event_type)
      |WHERE n * sq - sc * sc > 0
      |  AND CAST(c.c AS HUGEINT) * n - sc > 0
      |  AND (CAST(c.c AS HUGEINT) * n - sc) * (CAST(c.c AS HUGEINT) * n - sc)
      |      > 4 * (n * sq - sc * sc)
      |ORDER BY c.event_type, c.window_start""".stripMargin

  val queries: Map[String, Q] = Map(
    "e16_burst_windows" -> e16,
    "e15_ohlc_bars" -> e15,
    "e14_gap_dispersion" -> e14,
    "w7_weighted_median" -> w7,
    "e13_twap" -> e13,
    "e11_attribution" -> e11,
    "e12_rfm" -> e12,
    "w6_cumulative_distinct" -> w6,
    "e10_resample_locf" -> e10,
    "e1_tumbling_window" -> e1,
    "e2_sliding_window" -> e2,
    "e3_session_windows" -> e3,
    "e4_json_extract" -> e4,
    "e5_argmax_per_user" -> e5,
    "e6_banded_range_join" -> e6,
    "e7_funnel_stages" -> e7,
    "e8_from_json_struct" -> e8,
    "e9_cohort_retention" -> e9,
  )

  val oracle: Map[String, String] = Map(
    "e16_burst_windows" -> e16Sql,
    "e15_ohlc_bars" -> e15Sql,
    "e11_attribution" -> e11Sql,
    "e12_rfm" -> e12Sql,
    "e13_twap" -> e13Sql,
    "e14_gap_dispersion" -> e14Sql,
    "w7_weighted_median" -> w7Sql,
    "w6_cumulative_distinct" -> w6Sql,
    "e10_resample_locf" -> e10Sql,
    "e1_tumbling_window" -> e1Sql,
    "e2_sliding_window" -> e2Sql,
    "e3_session_windows" -> e3Sql,
    "e4_json_extract" -> e4Sql,
    "e5_argmax_per_user" -> e5Sql,
    "e6_banded_range_join" -> e6Sql,
    "e7_funnel_stages" -> e7Sql,
    "e8_from_json_struct" -> e8Sql,
    "e9_cohort_retention" -> e9Sql,
  )
}
