package graft.tools

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Round-16 measurement tool (optimization guide §1): runs every registry
  * query once and records its execution SHAPE — jobs launched, stages,
  * tasks, shuffle bytes written, input bytes, wall seconds — so
  * optimization effort targets the measured cost driver (exchange count,
  * per-round driver-loop jobs, task-count floors) instead of the guessed
  * one. Not part of the registry; invoked manually:
  *   sbt "runMain graft.tools.ProfileRegistry [namePrefix,...]"
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_PROFILE_OUT (default plans/r16/profile.tsv). */
object ProfileRegistry {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = sys.env.getOrElse("SPARK_GRAFT_PROFILE_OUT", "plans/r16/profile.tsv")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufWrite = new AtomicLong(0L)
    val inBytes = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        shufWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        inBytes.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.bytesRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val only = args.headOption.map(_.split(",").toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    val sb = new StringBuilder
    sb.append("name\tsec\tjobs\tstages\ttasks\tshuffle_mb\tinput_mb\trows\n")
    names.foreach { name =>
      spark.catalog.clearCache()
      graft.ops.Pinned.releaseAll(spark)
      jobs.set(0); stages.set(0); tasks.set(0); shufWrite.set(0L); inBytes.set(0L)
      val t0 = System.nanoTime()
      val rows =
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(150)
      val line = f"$name\t$sec%.3f\t${jobs.get}\t${stages.get}\t${tasks.get}\t${shufWrite.get / 1e6}%.2f\t${inBytes.get / 1e6}%.2f\t$rows"
      println(s"[profile] $line")
      sb.append(line).append('\n')
    }
    spark.stop()
    val p = Paths.get(out).toAbsolutePath
    Files.createDirectories(p.getParent)
    Files.writeString(p, sb.toString)
    println(s"[profile] wrote $p")
  }
}
