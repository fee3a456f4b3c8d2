package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-16 verdict #7: a LONG st32 soak — the sf1 oracle artifact
  * verifies st32's FINAL state; this tool verifies the loop's SHAPE by
  * running the same admission pipeline over ≥20 micro-batches at sf1 and
  * timing every batch. If any state or lineage grew with generation
  * count (the classic streaming leak: per-batch work absorbing the
  * merged-state read chain, an unpersisted frame re-deriving history,
  * checkpoint lineage accumulation), per-batch wall time would slope UP
  * across 20 generations; a healthy loop is flat (slope ≈ 0) because the
  * stored band index is probed, not rebuilt, and per-lang state is a
  * constant-size monoid (langs × 4 longs) re-written per generation.
  *
  * Differences from the registry st32 entry: the document feed is staged
  * into `nBatches` range files (vs 4) so the soak sees 20+ generations;
  * everything else — injectShellsKeeping, the static incremental index,
  * admissionDeltaAgainst, the gen-dir monoid merge — is the registry
  * code path itself.
  *
  * Prints per-batch wall seconds and an OLS slope over batches 2..N
  * (batch 0 pays JIT + index-probe warmup, batch 1 first state read).
  * Usage: runMain graft.tools.SoakSt32 /tmp/sf1 20 <outMd> */
object SoakSt32 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(20)
    val outMd = args.lift(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // stage the document feed into nBatches ascending doc_id range files
    val srcDir = Files.createTempDirectory("graft_soak_st32_src").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .repartitionByRange(nBatches, col("doc_id"))
      .write.mode("overwrite").parquet(srcDir)
    val physical = spark.read.parquet(s"$dir/documents.parquet").schema

    val statRoot = Files.createTempDirectory("graft_soak_st32_stats").toString
    def gens(): Seq[(Long, String)] = {
      val fs = Option(new java.io.File(statRoot).listFiles()).getOrElse(Array.empty)
      fs.filter(_.getName.startsWith("gen_")).toSeq
        .map(f => (f.getName.stripPrefix("gen_").toLong, f.getAbsolutePath))
    }
    val ckpt = Files.createTempDirectory("graft_soak_ckpt_st32").toString
    val (cappedBands, oldSets, freeIdx) = graft.ops.Dedup.incrementalIndexOf(
      graft.ops.Dedup.corpus(spark, dir).filter(col("doc_id") % 3 =!= 0))
    val times = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STATE_PARTITIONS", "8"))
    try {
      val src = spark.readStream.schema(physical)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = src.writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          val t0 = System.nanoTime()
          val sess = batch.sparkSession
          graft.ops.Pinned.scoped(sess) {
            val newBatch = graft.ops.Dedup.injectShellsKeeping(
                batch.toDF().select(col("doc_id"), col("text"), col("lang")),
                Seq("lang"))
              .filter(col("doc_id") % 3 === 0)
            val delta = graft.ops.Pipeline.admissionDeltaAgainst(
              cappedBands, oldSets, graft.ops.Pipeline.arrivedFrom(newBatch))
            val prior = gens().filter(_._1 < batchId).sortBy(-_._1).headOption
            val merged = prior match {
              case None => delta
              case Some((_, path)) =>
                sess.read.parquet(path).unionAll(delta).groupBy("lang")
                  .agg(sum("n_arrived").as("n_arrived"),
                    sum("n_nondup").as("n_nondup"),
                    sum("n_admitted").as("n_admitted"),
                    sum("toks_admitted").as("toks_admitted"))
            }
            merged.write.mode("overwrite").parquet(s"$statRoot/gen_$batchId")
          }
          val sec = (System.nanoTime() - t0) / 1e9
          times += ((batchId, sec))
          println(f"[soak] batch $batchId%2d: $sec%6.2f s")
          (): Unit
        }
        .start()
      q.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", before)
      freeIdx()
    }
    require(times.size >= nBatches - 1, s"expected ~$nBatches batches, saw ${times.size}")

    // OLS slope over the steady-state window (drop the 2 warmup batches)
    val steady = times.sortBy(_._1).drop(2).map { case (b, t) => (b.toDouble, t) }
    val n = steady.size.toDouble
    val mx = steady.map(_._1).sum / n
    val my = steady.map(_._2).sum / n
    val slope = steady.map { case (x, y) => (x - mx) * (y - my) }.sum /
      steady.map { case (x, _) => (x - mx) * (x - mx) }.sum
    val my3first = steady.take(3).map(_._2).sum / 3
    val my3last = steady.takeRight(3).map(_._2).sum / 3
    println(f"[soak] steady-state batches ${steady.head._1.toLong}..${steady.last._1.toLong}: " +
      f"mean $my%5.2f s, OLS slope $slope%+8.5f s/batch, " +
      f"first-3 mean $my3first%5.2f s vs last-3 mean $my3last%5.2f s")
    val finalState = spark.read.parquet(gens().maxBy(_._1)._2)
      .orderBy("lang").collect().map(_.toSeq.mkString(", "))
    println(s"[soak] final admission state (${finalState.length} langs):")
    finalState.foreach(r => println(s"[soak]   $r"))
    outMd.foreach { p =>
      val md = new StringBuilder
      md ++= s"### st32 soak at $dir — $nBatches micro-batches (round 16)\n\n"
      md ++= "| batch | wall (s) |\n|---|---|\n"
      times.sortBy(_._1).foreach { case (b, t) => md ++= f"| $b | $t%.2f |\n" }
      md ++= f"\nSteady-state (batch ≥ 2) mean $my%.2f s; OLS slope $slope%+.5f s/batch; "
      md ++= f"first-3 mean $my3first%.2f s vs last-3 mean $my3last%.2f s.\n"
      Files.writeString(java.nio.file.Paths.get(p), md.toString)
      println(s"[soak] wrote $p")
    }
    spark.stop()
  }
}
