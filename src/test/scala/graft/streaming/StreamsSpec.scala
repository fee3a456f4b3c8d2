package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Incremental Structured Streaming semantics that the bounded
  * AvailableNow verification queries can't exercise: multi-batch state
  * accumulation and watermark-based late-data dropping. */
class StreamsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("tumbling window aggregates accumulate across batches (update mode)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      .select(col("window.start").as("ws"), col("n"), col("s"))
    val q = agg.writeStream.format("memory").queryName("tumb_test")
      .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData((ts(1), 1.0), (ts(2), 2.0))
      q.processAllAvailable()
      input.addData((ts(3), 4.0))
      q.processAllAvailable()
      val rows = sp.table("tumb_test").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      // update mode re-emits the window; the LAST emission has the full count
      val last = rows.maxBy(_._2)
      assert(last._2 === 3L && last._3 === 7.0)
    } finally q.stop()
  }

  test("watermark drops events later than the delay (append mode)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData((ts(1), 1.0), (ts(2), 1.0)) // window [00:00,00:10)
      q.processAllAvailable()
      input.addData((ts(30), 1.0)) // advances watermark to 00:25 → closes first window
      q.processAllAvailable()
      input.addData((ts(3), 1.0)) // LATE: behind watermark, must be dropped
      q.processAllAvailable()
      input.addData((ts(50), 1.0)) // advance again so nothing else closes early
      q.processAllAvailable()
      val first = sp.table("wm_test").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1)))
        .filter(_._1 == ts(0))
      assert(first.toSeq === Seq((ts(0), 2L)), "late event must not be counted")
    } finally q.stop()
  }

  test("stream-stream join equals the batch theta join on the bounded fixture") {
    import org.apache.spark.sql.functions._
    val streamed = Streams.st5(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = graft.Tables.events(spark, sfDir)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("c_eid"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_eid"))
    val batch = c.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") && col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .select("user_id", "c_eid", "p_eid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("sessionize splits on gaps > 10 minutes and aggregates within") {
    val evs = Iterator(
      Streams.Ev(1L, minuteUs(0), 100),
      Streams.Ev(1L, minuteUs(5), 200),
      Streams.Ev(1L, minuteUs(30), 300), // 25-min gap → new session
      Streams.Ev(1L, minuteUs(35), 400))
    val out = Streams.sessionize(1L, evs).toSeq
    assert(out.map(s => (s.session_id, s.n_events, s.sum_value_c)) ===
      Seq((1L, 2L, 300L), (2L, 2L, 700L)))
    assert(out.head.session_end_us === minuteUs(5))
    assert(out(1).session_start_us === minuteUs(30))
  }

  test("sessionize: exactly-10-minute gap does NOT split (strict >)") {
    val evs = Iterator(Streams.Ev(2L, 0L, 1), Streams.Ev(2L, 600000000L, 1))
    assert(Streams.sessionize(2L, evs).size === 1)
  }

  private def minuteUs(m: Int): Long = m * 60L * 1000000L
}
