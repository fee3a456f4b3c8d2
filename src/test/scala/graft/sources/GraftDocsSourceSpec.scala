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
