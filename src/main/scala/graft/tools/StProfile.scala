package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Scratch profiler for the st12 replay shape: prints per-micro-batch
  * progress JSON (addBatch/getBatch/stateOperator commit times) so the
  * sf1 streaming cost can be attributed instead of guessed. Not part of
  * the registry; invoked manually. */
object StProfile {
  case class BandRow(doc_id: Long, bucket: String)
  case class PairOut(id_a: Long, id_b: Long)

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sp = spark
    import sp.implicits._

    // mirror Streams.stagedNeardupSrc's round-9 shape: 4 chunks ×
    // NeardupFilesPerBatch files so the band-key scan parallelizes
    val fpb = 32
    val dir = java.nio.file.Files.createTempDirectory("graft_stprof").toString
    val t0 = System.nanoTime()
    graft.ops.Dedup.corpus(spark, d)
      .repartitionByRange(4 * fpb, col("doc_id"))
      .write.mode("overwrite").parquet(dir)
    println(f"[prof] staging: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val schema = spark.read.parquet(dir).schema
    val banded = graft.ops.Dedup.minhashBandKeysOf(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", fpb.toString).parquet(dir))
      .as[BandRow]
    val pairs = banded.groupByKey(_.bucket)
      .flatMapGroupsWithState[Seq[Long], PairOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[BandRow], state: GroupState[Seq[Long]]) =>
          val seen = state.getOption.getOrElse(Seq.empty)
          val incoming = it.map(_.doc_id).toSeq.distinct.sorted
          val out = scala.collection.mutable.ArrayBuffer.empty[PairOut]
          var acc = seen
          incoming.foreach { id =>
            if (!acc.contains(id)) {
              acc.foreach(o => out += PairOut(math.min(o, id), math.max(o, id)))
              acc = acc :+ id
            }
          }
          state.update(acc)
          out.iterator
      }
    val t1 = System.nanoTime()
    val q = pairs.toDF().writeStream
      .format("memory").queryName("stprof_out")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_stprof_ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    println(f"[prof] stream drain: ${(System.nanoTime() - t1) / 1e9}%.1f s, " +
      s"rows=${spark.table("stprof_out").count()}")
    q.recentProgress.foreach(p => println("[prof] " + p.json))
    spark.stop()
  }
}
