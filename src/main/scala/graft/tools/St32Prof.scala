package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-16 scratch profiler: runs one registry query with a job listener
  * printing each job's wall time, task count and callsite, so the job
  * budget of a driver-loop/streaming query can be attributed line by
  * line. Not part of the registry; invoked manually:
  *   sbt "runMain graft.tools.St32Prof <query_name> [sfDir]" */
object St32Prof {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("st32_stream_admission")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new ConcurrentHashMap[Int, (Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description"))
            .orElse(Option(j.properties.getProperty("callSite.short"))).getOrElse("?")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.get(j.jobId)).foreach { case (t0, desc) =>
          println(f"[jobs] #${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  ${desc.take(110)}")
        }
      }
    }
    // warm once so JIT/codegen noise doesn't dominate the attribution
    SparkEntryRun(spark, d, name)
    spark.catalog.clearCache(); graft.ops.Pinned.releaseAll(spark)
    println("[jobs] ===== warm run =====")
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    SparkEntryRun(spark, d, name)
    println(f"[jobs] TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
  private def SparkEntryRun(s: SparkSession, d: String, name: String): Unit = {
    val n = graft.SparkEntry.queries(name)(s, d).count()
    println(s"[jobs] rows=$n")
  }
}
