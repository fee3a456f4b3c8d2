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

  val af1: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val us = unix_micros(col("ts"))
    // dedupe clicks at equal (user, ts): keep the max event_id — makes the
    // as-of pick deterministic in both engines
    val clickW = Window.partitionBy("user_id", "ts").orderBy(col("event_id").desc)
    val clicks = ev.filter(col("event_type") === "click")
      .withColumn("rk", row_number().over(clickW)).filter(col("rk") === 1)
      .select(col("user_id"), us.as("t_us"), lit(0).as("side"),
        lit(null).cast("long").as("purchase_id"), cents(col("value")).as("click_value_c"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), us.as("t_us"), lit(1).as("side"),
        col("event_id").as("purchase_id"), lit(null).cast("long").as("click_value_c"))
    val w = Window.partitionBy("user_id").orderBy("t_us", "side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the as-of row is selected by the SIDE flag packed into one struct —
    // keying on value-nullness would skip a click whose value is genuinely
    // NULL and pair an older click's value with the newer click's time
    clicks.unionAll(purchases)
      .withColumn("asof_click", last(when(col("side") === 0,
        struct(col("t_us").as("t"), col("click_value_c").as("v"))),
        ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("purchase_id"), col("user_id"),
        col("asof_click.v").as("asof_click_value_c"),
        (col("t_us") - col("asof_click.t")).as("gap_us"))
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
