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
      .select(left.columns.map(col) :+
        col("__asof.t").as(s"asof_$tsCol") :+
        col("__asof.v").as(s"asof_$valueCol"): _*)
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

  val queries: Map[String, Q] = Map("af1_asof_join" -> af1)
  val oracle: Map[String, String] = Map("af1_asof_join" -> af1Sql)
}
