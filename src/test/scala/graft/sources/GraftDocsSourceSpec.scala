package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom DSv2 source must actually push work down, not just accept
  * options: range predicates narrow the generated interval before any
  * row exists, and unprojected columns are never generated. */
class GraftDocsSourceSpec extends SparkSpec {

  private def load(rows: Long = 10000L) =
    spark.read.format("graft.sources.GraftDocsSource")
      .option("rows", rows.toString).load()

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("doc_id range predicates reach the source (interval narrowed pre-generation)") {
    val df = load().filter(col("doc_id") >= 2000 && col("doc_id") < 2100)
    val p = planOf(df)
    assert(p.contains("range=[2000,2100)"),
      s"pushFilters must narrow the generated interval:\n${p.take(600)}")
    assert(df.count() === 100)
  }

  test("column pruning reaches the reader (text never generated for id-only reads)") {
    val df = load().select("doc_id")
    val p = planOf(df)
    assert(p.contains("cols=doc_id") && !p.contains("cols=doc_id,lang"),
      s"pruneColumns must drop unread columns:\n${p.take(600)}")
    assert(df.count() === 10000)
  }

  test("equality pushdown collapses to a single-row interval") {
    val df = load().filter(col("doc_id") === 42L)
    assert(planOf(df).contains("range=[42,43)"))
    val r = df.head()
    assert(r.getLong(0) === 42L && r.getString(1) === "en")
    assert(r.getString(2).startsWith("doc 42 "))
  }

  test("scan parallelizes: more than one input partition for a wide range") {
    val df = load()
    val scans = df.rdd.getNumPartitions
    assert(scans > 1, s"wide interval must split into multiple partitions, got $scans")
    assert(df.count() === 10000)
  }

  test("contradictory bounds yield an empty scan, not an error") {
    val df = load().filter(col("doc_id") > 5000L && col("doc_id") < 100L)
    assert(df.count() === 0)
  }

  test("grouped count/min/max pushes down completely (no aggregate node, 3 closed-form rows)") {
    val df = load(100000L)
      .filter(col("doc_id") >= 1000 && col("doc_id") < 90000)
      .groupBy("lang").agg(count(lit(1)).as("n"), min("doc_id").as("mn"), max("doc_id").as("mx"))
    val p = planOf(df)
    assert(p.contains("aggPushed=lang:count+min+max"),
      s"aggregation must reach the source:\n${p.take(900)}")
    assert(!p.contains("HashAggregate"),
      s"complete pushdown must drop Spark's aggregate node:\n${p.take(900)}")
    assert(p.contains("range=[1000,90000)"), "filter pushdown must compose with agg pushdown")
    val rows = df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // lang = i % 3 -> en:0, de:1, fr:2 over [1000, 90000)
    assert(rows === Map(
      "en" -> ((29666L, 1002L, 89997L)),
      "de" -> ((29667L, 1000L, 89998L)),
      "fr" -> ((29667L, 1001L, 89999L))))
  }

  test("global aggregate pushes down; empty interval yields the SQL empty-agg row") {
    val g = load(100000L).agg(count(lit(1)).as("n"), min("doc_id").as("mn"), max("doc_id").as("mx"))
    assert(planOf(g).contains("aggPushed=count+min+max"))
    assert(g.head() === org.apache.spark.sql.Row(100000L, 0L, 99999L))
    val e = load(100000L).filter(col("doc_id") > 5000L && col("doc_id") < 100L)
      .agg(count(lit(1)).as("n"), min("doc_id").as("mn"))
    val r = e.head()
    assert(r.getLong(0) === 0L && r.isNullAt(1),
      "empty-interval global aggregate must be (0, NULL)")
  }

  test("unsupported aggregates fall back to a normal generated-row scan") {
    val df = load(1000L).groupBy("lang").agg(sum("doc_id").as("s"))
    val p = planOf(df)
    assert(!p.contains("aggPushed"), "sum is not pushable; source must decline")
    assert(p.contains("HashAggregate"), "Spark must aggregate above the row scan")
    val viaRows = load(1000L).collect().groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(0)).sum).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === viaRows)
  }

  test("micro-batch stream drains in bounded batches and equals the batch read") {
    val stream = spark.readStream.format("graft.sources.GraftDocsSource")
      .option("rows", "2000").option("streamBatchRows", "500").load()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_src2_spec").toString
    val q = stream.writeStream.format("memory").queryName("src2spec")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 4, s"admission control must split 2000 rows at 500/batch, saw $dataBatches")
    assert(q.recentProgress.filter(_.numInputRows > 0).forall(_.numInputRows <= 500),
      "no micro-batch may exceed the admission-control cap")
    val streamed = spark.table("src2spec").orderBy("doc_id").collect().toSeq
    val batch = load(2000L).orderBy("doc_id").collect().toSeq
    assert(streamed === batch, "streamed rows must be bit-identical to the batch read")
  }
}
