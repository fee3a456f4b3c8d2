package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** [EXT] As-of join — for each `purchase` event, the most recent prior (or
  * simultaneous) `click` by the same user. Spark has no native as-of join;
  * per the preference order (SURVEY §7.2 / prompt) this is COMPOSED from
  * built-ins rather than a custom SparkPlan: interleave both sides in one
  * union, then `last(value, ignoreNulls)` over a per-user window ordered by
  * (ts, side). That is ONE shuffle on user_id — the same cost profile as a
  * hand-written sort-merge as-of, with codegen and AQE for free. DuckDB's
  * native `ASOF LEFT JOIN` is the oracle (inclusive `>=` semantics, matched
  * by ordering the click side before the purchase side at equal ts).
  *
  * Scale: no join explosion (never materializes candidate pairs), state is
  * a single running value per user within each sorted partition — the plan
  * survives arbitrarily many events per user.
  */
object AsOf {
  type Q = (SparkSession, String) => DataFrame

  private def cents(c: org.apache.spark.sql.Column) = Money.cents(c)

  /** Generic inclusive as-of join — for each left row, the latest right
    * row with right.ts <= left.ts sharing `keyCol`. Attaches
    * `asof_<tsCol>` and `asof_<valueCol>` (NULL when no prior right row);
    * all left columns pass through. One shuffle on the key, no candidate
    * pairs. Rows of the RIGHT side at identical (key, ts) should be
    * pre-deduplicated for a deterministic pick. The library entry point
    * ([[graft.api.GraftApi.asofJoin]]); `valueCol` must not collide with
    * a left column name. */
  private[graft] def asofJoinOf(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, valueCol: String): DataFrame = {
    val lu = left.withColumn("__side", lit(1))
    val ru = right.select(col(keyCol), col(tsCol), col(valueCol))
      .withColumn("__side", lit(0))
    val w = Window.partitionBy(keyCol).orderBy(tsCol, "__side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lu.unionByName(ru, allowMissingColumns = true)
      .withColumn("__asof", last(when(col("__side") === 0,
        struct(col(tsCol).as("t"), col(valueCol).as("v"))),
        ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((left.columns.map(col) :+
        col("__asof.t").as(s"asof_$tsCol") :+
        col("__asof.v").as(s"asof_$valueCol")).toIndexedSeq: _*)
  }

  val af1: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val us = unix_micros(col("ts"))
    // dedupe clicks at equal (user, ts): keep the max event_id — makes the
    // as-of pick deterministic in both engines. The generic asofJoinOf
    // selects the as-of row by the SIDE flag packed into one struct —
    // keying on value-nullness would skip a click whose value is genuinely
    // NULL and pair an older click's value with the newer click's time.
    val clickW = Window.partitionBy("user_id", "ts").orderBy(col("event_id").desc)
    val clicks = ev.filter(col("event_type") === "click")
      .withColumn("rk", row_number().over(clickW)).filter(col("rk") === 1)
      .select(col("user_id"), us.as("t_us"), cents(col("value")).as("click_value_c"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), us.as("t_us"))
    asofJoinOf(purchases, clicks, "user_id", "t_us", "click_value_c")
      .select(col("purchase_id"), col("user_id"),
        col("asof_click_value_c"),
        (col("t_us") - col("asof_t_us")).as("gap_us"))
      .orderBy("purchase_id")
  }
  val af1Sql: String =
    """WITH clicks AS (
      |  SELECT user_id, epoch_us(ts) AS t_us, CAST(round(value * 100) AS BIGINT) AS click_value_c
      |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rk
      |        FROM events WHERE event_type = 'click')
      |  WHERE rk = 1),
      |purchases AS (
      |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS t_us
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id, p.user_id,
      |       c.click_value_c AS asof_click_value_c,
      |       p.t_us - c.t_us AS gap_us
      |FROM purchases p
      |ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.t_us >= c.t_us
      |ORDER BY p.purchase_id""".stripMargin

  // ---- AF2: nearest as-of join (both directions, bounded tolerance) ----

  /** Generic NEAREST as-of join — for each left row, the right row
    * sharing `keyCol` whose `tsCol` is closest in EITHER direction,
    * within `tolerance` (same unit as `tsCol`); ties prefer the
    * backward (≤) match, the pandas `merge_asof(direction='nearest')`
    * semantics. Composed like [[asofJoinOf]]: one interleaved union,
    * then TWO running-value frames over the same per-key sort — `last`
    * over the preceding frame (latest right ≤ t) and `first` over the
    * following frame (earliest right > t; same-ts rights sort before
    * the left row, so the frames partition cleanly at equality). Still
    * ONE shuffle on the key and no candidate pairs — the naive form is
    * a |left|×|right-within-tolerance| interval join (the oracle
    * replays exactly that as an independent check). Left rows with no
    * right row inside the tolerance are DROPPED (matched semantics).
    * Right rows must be pre-deduplicated at (key, ts). Attaches
    * `nearest_<valueCol>`, `dir` (0 = backward, 1 = forward) and
    * `adiff` (absolute distance); the library entry point is
    * [[graft.api.GraftApi.asofNearest]]. */
  private[graft] def asofNearestOf(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, valueCol: String,
      tolerance: Long): DataFrame = {
    val lu = left.withColumn("__side", lit(1))
    val ru = right.select(col(keyCol), col(tsCol), col(valueCol))
      .withColumn("__side", lit(0))
    val ord = Window.partitionBy(keyCol).orderBy(col(tsCol), col("__side"))
    val wB = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rstruct = when(col("__side") === 0,
      struct(col(tsCol).as("t"), col(valueCol).as("v")))
    val bd = col(tsCol) - col("__back.t")
    val fd = col("__fwd.t") - col(tsCol)
    val bOk = col("__back").isNotNull && bd <= tolerance
    val fOk = col("__fwd").isNotNull && fd <= tolerance
    lu.unionByName(ru, allowMissingColumns = true)
      .withColumn("__back", last(rstruct, ignoreNulls = true).over(wB))
      .withColumn("__fwd", first(rstruct, ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
      .withColumn("__pick",
        when(bOk && (!fOk || bd <= fd), struct(col("__back.v").as("v"), lit(0).as("dir"), bd.as("adiff")))
          .otherwise(when(fOk, struct(col("__fwd.v").as("v"), lit(1).as("dir"), fd.as("adiff")))))
      .filter(col("__pick").isNotNull)
      .select((left.columns.map(col) :+
        col("__pick.v").as(s"nearest_$valueCol") :+
        col("__pick.dir").as("dir") :+
        col("__pick.adiff").as("adiff")).toIndexedSeq: _*)
  }

  /** AF2: each purchase paired with its nearest click (either
    * direction) by the same user within ±1 hour — the sensor/quote
    * alignment shape (`merge_asof(direction='nearest')`) that af1's
    * backward-only form cannot express. Clicks are deduplicated at
    * (user, ts) exactly as af1 so the nearest pick is deterministic;
    * the oracle is an INDEPENDENT formulation (tolerance-bounded
    * interval join + rank by distance), not a window replay. */
  val af2: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val us = unix_micros(col("ts"))
    val clickW = Window.partitionBy("user_id", "ts").orderBy(col("event_id").desc)
    val clicks = ev.filter(col("event_type") === "click")
      .withColumn("rk", row_number().over(clickW)).filter(col("rk") === 1)
      .select(col("user_id"), us.as("t_us"), cents(col("value")).as("click_value_c"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), us.as("t_us"))
    asofNearestOf(purchases, clicks, "user_id", "t_us", "click_value_c",
        tolerance = 3600000000L)
      .select(col("purchase_id"), col("user_id"),
        col("nearest_click_value_c"), col("dir"), col("adiff").as("adiff_us"))
      .orderBy("purchase_id")
  }
  val af2Sql: String =
    """WITH clicks AS (
      |  SELECT user_id, epoch_us(ts) AS t_us, CAST(round(value * 100) AS BIGINT) AS click_value_c
      |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rk
      |        FROM events WHERE event_type = 'click')
      |  WHERE rk = 1),
      |purchases AS (
      |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS t_us
      |  FROM events WHERE event_type = 'purchase'),
      |cand AS (
      |  SELECT p.purchase_id, p.user_id, c.click_value_c,
      |         CASE WHEN c.t_us <= p.t_us THEN 0 ELSE 1 END AS dir,
      |         abs(p.t_us - c.t_us) AS adiff_us
      |  FROM purchases p JOIN clicks c
      |    ON c.user_id = p.user_id AND abs(p.t_us - c.t_us) <= 3600000000),
      |pick AS (
      |  SELECT *, row_number() OVER (PARTITION BY purchase_id ORDER BY adiff_us, dir) AS rn
      |  FROM cand)
      |SELECT purchase_id, user_id, click_value_c AS nearest_click_value_c,
      |       CAST(dir AS INTEGER) AS dir, adiff_us
      |FROM pick WHERE rn = 1 ORDER BY purchase_id""".stripMargin

  // ---- RJ1: interval (range) join via time-bucket blocking ----

  /** Generic bucketed range join: each left row (with integer point
    * column `ptCol`) joins every interval row with s ≤ pt < e. Naively
    * this is a theta join Spark can only plan as a nested-loop; blocking
    * on fixed-width buckets turns it into an EQUI-join: intervals
    * explode to the buckets they cover (⌈len/W⌉ + 1 rows), points map to
    * exactly one bucket, and the range predicate refines inside the join
    * condition. With interval length ≲ W each interval lands in ≤ 2
    * buckets, so the join input is ~2·|intervals| build rows — the
    * shape that keeps a MILLION-interval table joinable at 100 TB
    * (bucket equi-keys shuffle/broadcast like any other key; no
    * nested-loop, no cartesian). The library entry point
    * ([[graft.api.GraftApi.rangeJoin]]). */
  private[graft] def rangeJoinOf(points: DataFrame, intervals: DataFrame,
      ptCol: String, sCol: String, eCol: String, bucketW: Long): DataFrame = {
    val iv = intervals.withColumn("__b",
      explode(expr(s"sequence($sCol div ${bucketW}L, ($eCol - 1) div ${bucketW}L)")))
    points.withColumn("__b", expr(s"$ptCol div ${bucketW}L"))
      .join(iv, Seq("__b"))
      .filter(col(ptCol) >= col(sCol) && col(ptCol) < col(eCol))
      .drop("__b")
  }

  /** RJ1: events × overlapping promo windows. Ten deterministic
    * 1.5·W-long windows tile the event span (W = span/10), so every
    * window overlaps its successor and an event can match 1–2 windows —
    * a genuine interval join, not a partition. The span bounds come from
    * ONE 1-row aggregate collect (the cl1 centroid-literal contract), so
    * the interval table and bucket width are plan-time literals; the
    * oracle recomputes identical integers from the same parquet. */
  val rj1: Q = (s, d) => {
    val ev = Tables.events(s, d).select(
      col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"),
      cents(col("value")).as("v_c"))
    val Array(tmin, tmax) = ev.agg(min("t_us"), max("t_us")).head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val w = math.max((tmax - tmin) / 10L, 1L)
    val iv = s.range(0, 10).toDF("interval_id")
      .select(col("interval_id"),
        (lit(tmin) + col("interval_id") * w).as("s_us"),
        (lit(tmin) + col("interval_id") * w + lit(3L * w / 2L)).as("e_us"))
    rangeJoinOf(ev, broadcast(iv), "t_us", "s_us", "e_us", bucketW = w)
      .groupBy("interval_id", "s_us", "e_us")
      .agg(count(lit(1)).as("n_events"), sum("v_c").as("sum_value_c"))
      .orderBy("interval_id")
  }
  val rj1Sql: String =
    """WITH b AS (
      |  SELECT min(epoch_us(ts)) AS tmin,
      |         greatest((max(epoch_us(ts)) - min(epoch_us(ts))) // 10, 1) AS w
      |  FROM events),
      |iv AS (
      |  SELECT k AS interval_id, tmin + k * w AS s_us,
      |         tmin + k * w + (3 * w // 2) AS e_us
      |  FROM (SELECT unnest(range(0, 10)) AS k) CROSS JOIN b)
      |SELECT iv.interval_id, iv.s_us, iv.e_us,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
      |FROM events e JOIN iv
      |  ON epoch_us(e.ts) >= iv.s_us AND epoch_us(e.ts) < iv.e_us
      |GROUP BY iv.interval_id, iv.s_us, iv.e_us
      |ORDER BY iv.interval_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "af1_asof_join" -> af1,
    "af2_asof_nearest" -> af2,
    "rj1_range_join_bucketed" -> rj1)
  val oracle: Map[String, String] = Map(
    "af1_asof_join" -> af1Sql,
    "af2_asof_nearest" -> af2Sql,
    "rj1_range_join_bucketed" -> rj1Sql)
}
