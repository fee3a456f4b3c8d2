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

  test("e16 bursts: a 10x hour flags with exact z2, the steady type stays silent") {
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.functions._
    // type x: five 1-event hours + one 10-event hour
    //   S=15, n=6, Q=105; dev(10)=45, n2var=405; z2 = 2025/405 = 5.00
    // type y: perfectly uniform — every dev = 0, nothing flags
    val rows =
      (0 to 4).map(h => (f"2024-01-01 0$h:10:00", "x")) ++
      (1 to 10).map(m => (f"2024-01-01 05:$m%02d:00", "x")) ++
      (0 to 3).map(h => (f"2024-01-01 0$h:20:00", "y"))
    val ev = rows.zipWithIndex
      .map { case ((t, ty), i) => (i.toLong, t, ty, 0.0) }
      .toDF("event_id", "ts_s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Events.burstWindowsOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("x", 10L, 500L)))
  }

  test("e15 OHLC: ts ties break on event_id, extremes and turnover are exact") {
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.functions._
    // one bar, same-second open tie: event 1 vs 2 at 00:00:01 -> open
    // must be event 1's value; close is the last ts (00:59:59)
    val ev = Seq(
      (2L, "2024-01-01 00:00:01", "x", 5.00),
      (1L, "2024-01-01 00:00:01", "x", 3.00),
      (3L, "2024-01-01 00:30:00", "x", 9.50),
      (4L, "2024-01-01 00:59:59", "x", 0.25),
      (5L, "2024-01-01 01:00:00", "x", 7.00) // next bar
    ).toDF("event_id", "ts_s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val bars = ev.select(
        date_trunc("hour", col("ts")).as("window_start"), col("event_type"),
        col("ts"), col("event_id"), Money.cents(col("value")).as("vc"))
      .groupBy("window_start", "event_type")
      .agg(
        min(struct(col("ts"), col("event_id"), col("vc"))).getField("vc").as("open_c"),
        max(struct(col("ts"), col("event_id"), col("vc"))).getField("vc").as("close_c"),
        max("vc").as("high_c"), min("vc").as("low_c"),
        count(lit(1)).as("n"), sum("vc").as("turnover_c"))
      .orderBy("window_start")
      .collect()
    assert(bars.length === 2)
    val b0 = bars(0)
    assert(b0.getLong(2) === 300L, "open = tie-broken first event (id 1)")
    assert(b0.getLong(3) === 25L, "close = last event in the bar")
    assert(b0.getLong(4) === 950L && b0.getLong(5) === 25L)
    assert(b0.getLong(6) === 4L && b0.getLong(7) === 300L + 500L + 950L + 25L)
    assert(bars(1).getLong(2) === 700L && bars(1).getLong(3) === 700L)
  }

  test("e15 fixture bars conserve e1's totals (same buckets, same mass)") {
    val ohlc = Events.e15(spark, sfDir).collect()
    val e1r = Events.e1(spark, sfDir).collect()
    assert(ohlc.length === e1r.length, "identical (bucket, type) grid")
    assert(ohlc.map(_.getLong(7)).sum === e1r.map(_.getLong(3)).sum)
    ohlc.foreach { r =>
      val (open, close, high, low) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(low <= open && open <= high && low <= close && close <= high)
    }
  }

  test("e11 total attributed cents equals total purchase cents under both models") {
    val rows = Events.e11(spark, sfDir).collect()
    val firstC = rows.map(_.getLong(2)).sum
    val lastC = rows.map(_.getLong(4)).sum
    assert(firstC === lastC, "both models must conserve purchase mass")
    assert(rows.map(_.getLong(1)).sum === rows.map(_.getLong(3)).sum)
    assert(firstC > 0)
  }

  test("w7 weighted median: volume-weighting moves the median; plain rows degenerate to it") {
    import spark.implicits._
    // values (10, 20, 30) with weights (1, 1, 10): half the mass is 6,
    // reached first at v = 30 — the unweighted median would say 20
    val rows = Seq(("a", 10L, 1L), ("a", 20L, 1L), ("a", 30L, 10L),
      // key b: uniform weights -> the lower median of (1,2,3,4) is 2
      ("b", 1L, 1L), ("b", 2L, 1L), ("b", 3L, 1L), ("b", 4L, 1L),
      // duplicate values merge their mass before the cut
      ("c", 5L, 1L), ("c", 5L, 1L), ("c", 9L, 1L))
      .toDF("k", "v", "w")
    val got = graft.api.GraftApi.weightedMedian(rows, "k", "v", "w").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("a") === ((3L, 12L, 30L)))
    assert(got("b") === ((4L, 4L, 2L)))
    assert(got("c") === ((2L, 3L, 5L)))
  }

  test("e14 gap dispersion: heartbeat = 0, bursty hand case, gapless key is NULL") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import spark.implicits._
    val ev = Seq(
      // key h: perfectly regular 10us heartbeat -> cov2 exactly 0
      ("h", 0L, 1L), ("h", 10L, 2L), ("h", 20L, 3L), ("h", 30L, 4L),
      // key b: gaps (1, 1, 28) -> cov2 = (3*786 - 900)*1e6/900 = 1620000
      ("b", 0L, 5L), ("b", 1L, 6L), ("b", 2L, 7L), ("b", 30L, 8L),
      // key s: a single event has no gaps
      ("s", 5L, 9L))
      .toDF("k", "usv", "event_id")
      .withColumn("ts", timestamp_micros(col("usv")))
    val got = graft.api.GraftApi.gapDispersion(ev, "k", "ts").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(got("h") === ((4L, 3L, 10L, 0L)))
    assert(got("b") === ((4L, 3L, 10L, 1620000L)))
    assert(got("s") === ((1L, 0L, -1L, -1L)))
  }

  test("e13 TWAP weights by holding time, signs split, degenerate span is NULL") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import spark.implicits._
    val us = 1000000L
    val ev = Seq(
      // key a: 100c held 10s, 200c held 20s, 50c tail (unweighted)
      ("a", 0L * us, 1L, 100L), ("a", 10L * us, 2L, 200L), ("a", 30L * us, 3L, 50L),
      // key b: negative values exercise the sign-split path
      ("b", 0L * us, 4L, -100L), ("b", 10L * us, 5L, -300L), ("b", 20L * us, 6L, 0L),
      // key c: a single event -> span 0 -> NULL
      ("c", 5L * us, 7L, 42L))
      .toDF("k", "usv", "event_id", "vc")
      .withColumn("ts", timestamp_micros(col("usv")))
    val got = graft.api.GraftApi.twap(ev, "k", "ts", col("vc")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MinValue else r.getLong(3))).toMap
    // a: (100*10e6 + 200*20e6) div 30e6 = 166 (naive mean would be 116)
    assert(got("a") === ((3L, 30L * us, 166L)))
    // b: (-100*10e6 - 300*10e6) div 20e6 = -200 exactly
    assert(got("b") === ((3L, 20L * us, -200L)))
    assert(got("c") === ((1L, 0L, Long.MinValue)))
  }

  test("e12 RFM quartiles follow the aligned hand fixture") {
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.functions._
    // user k (1..4) makes k purchases, each later and larger than user
    // k-1's — recency/frequency/monetary ranks all align, so user k sits
    // in segment (k,k,k) exactly: q = 4*(rank-1) div 4 + 1 = rank
    val ev = (1 to 4).flatMap { k =>
      (1 to k).map(i => (k * 10L + i, k.toLong,
        f"2024-01-0$k%d 00:0$i%d:00", "purchase", k * 1.0))
    }.toDF("event_id", "user_id", "ts_s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Events.rfmSegmentsOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === (1 to 4).map(k =>
      (k.toLong, k.toLong, k.toLong, 1L, k.toLong * k * 100L)))
  }

  test("e12 segment table conserves users and cents over the fixture") {
    val rows = Events.e12(spark, sfDir).collect()
    val users = rows.map(_.getLong(3)).sum
    import org.apache.spark.sql.functions._
    val per = graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .agg(countDistinct("user_id"), sum(expr("CAST(round(value * 100) AS BIGINT)")))
      .head()
    assert(users === per.getLong(0), "every purchasing user lands in one segment")
    assert(rows.map(_.getLong(4)).sum === per.getLong(1), "cents conserve")
    rows.foreach(r => Seq(0, 1, 2).foreach(i =>
      assert(r.getLong(i) >= 1L && r.getLong(i) <= 4L)))
  }
}
