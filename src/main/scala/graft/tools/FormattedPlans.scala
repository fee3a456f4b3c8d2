package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Round-16 plan-evidence dumper: writes `.explain("formatted")` output of
  * registry queries to files (plans/r16/<name>_<suffix>.txt) so before/
  * after plan claims in OPTIMIZATION_r16.md are checkable artifacts.
  * Usage:
  *   sbt "runMain graft.tools.FormattedPlans <suffix> name1,name2,..."
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_PLANS_DIR (default plans/r16).
  *
  * NOTE: for queries whose builder runs driver-side loops/actions (graph
  * iterations, ML fits, streaming drains) the dumped plan is the FINAL
  * frame's — the loop bodies' plans are not reachable from outside; the
  * wall-second cost of construction is still paid here. */
object FormattedPlans {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = Paths.get(sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r16"))
    Files.createDirectories(dir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[plans] $name: not in registry")
        case Some(fn) =>
          spark.catalog.clearCache()
          graft.ops.Pinned.releaseAll(spark)
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
            Files.writeString(dir.resolve(s"${name}_$suffix.txt"), txt)
            println(s"[plans] wrote ${name}_$suffix.txt (${txt.linesIterator.size} lines)")
          } catch {
            case e: Throwable => println(s"[plans] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
