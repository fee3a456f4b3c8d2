package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev plan probe: prints the AQE-finalized executed plan of registry
  * queries (the evidence PLANS.md excerpts come from). Usage:
  *   sbt "runMain graft.tools.PlanDump sel1_dsir_topk t18_char_entropy"
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[plan] $name: not in registry")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          df.collect() // materialize so AQE finalizes
          println(s"\n===== $name =====")
          println(df.queryExecution.executedPlan.toString.linesIterator.take(60).mkString("\n"))
      }
    }
    spark.stop()
  }
}
