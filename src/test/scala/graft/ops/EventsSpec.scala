package graft.ops

import graft.SparkSpec

/** Behavioral checks for the batch event-analytics surface beyond the
  * oracle gate — currently the attribution model (e11), whose
  * gaps-and-islands group semantics deserve a hand-traced fixture. */
class EventsSpec extends SparkSpec {

  test("e11 attribution groups close at each purchase and credit the right touches") {
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.functions._
    // user 1: click, view, purchase $10   -> first=click, last=view
    // user 2: purchase $5 (no touch)      -> direct under both models
    //         then view, purchase $7      -> view under both models
    val ev = Seq(
      (1L, 1L, "2024-01-01 00:00:01", "click", 0.0),
      (2L, 1L, "2024-01-01 00:00:02", "view", 0.0),
      (3L, 1L, "2024-01-01 00:00:03", "purchase", 10.0),
      (4L, 2L, "2024-01-01 00:00:01", "purchase", 5.0),
      (5L, 2L, "2024-01-01 00:00:02", "view", 0.0),
      (6L, 2L, "2024-01-01 00:00:03", "purchase", 7.0),
      // trailing touch with no purchase after it: attributed to nothing
      (7L, 2L, "2024-01-01 00:00:04", "click", 0.0)
    ).toDF("event_id", "user_id", "ts_s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Events.attributionOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      ("click", 1L, 1000L, 0L, 0L),
      ("direct", 1L, 500L, 1L, 500L),
      ("view", 1L, 700L, 2L, 1700L)))
  }

  test("e11 total attributed cents equals total purchase cents under both models") {
    val rows = Events.e11(spark, sfDir).collect()
    val firstC = rows.map(_.getLong(2)).sum
    val lastC = rows.map(_.getLong(4)).sum
    assert(firstC === lastC, "both models must conserve purchase mass")
    assert(rows.map(_.getLong(1)).sum === rows.map(_.getLong(3)).sum)
    assert(firstC > 0)
  }
}
